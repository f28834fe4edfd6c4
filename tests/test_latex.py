"""LaTeX -> SLT parser (M3): twin-file parity + construct coverage.

The strongest check: the reference bundles the same formulas as both
``.tex`` and LaTeXML-produced ``.mml`` files; our native LaTeX parser and
our MathML parser must produce IDENTICAL SLT serializations for each twin
pair (the reference itself could not process the .tex files — they are
log1.txt's "problem files" because latexmlmath was broken in its env too).
"""

import os

import pytest

from tangent_ray.tokenize.latex import LaTeXError, latex_to_slt
from tangent_ray.tokenize.slt import parse_slt, slt_tuples

TD = "/root/reference/tangent_code/tangent/testing/test_data"

TWINS = [
    ("matrix/1_3_matrix.tex", "matrix/1_3_matrix.mml"),
    ("matrix/3_1_matrix.tex", "matrix/3_1_matrix.mml"),
    ("matrix/simple_matrix.tex", "matrix/2_2_matrix.mml"),
    ("other/frac.tex", "other/frac.mml"),
]


@pytest.mark.skipif(not os.path.isdir(TD), reason="reference test data absent")
@pytest.mark.parametrize("tex,mml", TWINS)
def test_latex_matches_mathml_twin(tex, mml):
    from tangent_ray.tokenize.mathml import MATHML_SPAN_RE, mathml_to_slt

    got = latex_to_slt(open(os.path.join(TD, tex)).read()).serialize()
    src = open(os.path.join(TD, mml), encoding="utf-8").read()
    want = mathml_to_slt(MATHML_SPAN_RE.findall(src)[0]).serialize()
    assert got == want


@pytest.mark.parametrize(
    "src,slt",
    [
        (r"x+1", "[V!x[+[N!1]]]"),
        (r"x^2", "[V!x,a[N!2]]"),
        # edge slots serialize in build_str order: a before b
        (r"x_i^2", "[V!x,a[N!2],b[V!i]]"),
        (r"\frac{x}{y}", "[F!,o[V!x],u[V!y]]"),
        (r"\sqrt{x}", "[R!,w[V!x]]"),
        (r"\sqrt[3]{x+1}", "[R!,c[N!3],w[V!x[+[N!1]]]]"),
        # operator base takes over/under; symbol base above/below
        (r"\sum_{i=1}^{n} x_i", "[∑[V!x,b[V!i]],o[V!n],u[V!i[=[N!1]]]]"),
        (r"\alpha\le\beta", "[V!α[≤[V!β]]]"),
        (r"\sin x", "[V!sin[V!x]]"),
        (r"12.5 + 3", "[N!12.5[+[N!3]]]"),
        # clean() escaping of structural characters
        (r"\begin{bmatrix}1\end{bmatrix}",
         "[M!&lsqb;&rsqb;1x1,w[M!1x1,w[N!1]]]"),
    ],
)
def test_latex_constructs(src, slt):
    assert latex_to_slt(src).serialize() == slt


def test_latex_output_round_trips_and_expands():
    for src in (r"\frac{a+b}{c^2}", r"\begin{pmatrix}x & y \\ 1 & 0\end{pmatrix}"):
        s = latex_to_slt(src).serialize()
        root = parse_slt(s)  # round-trip verified inside
        assert slt_tuples(root, window=2, eol="small")


def test_latex_errors():
    with pytest.raises(LaTeXError):
        latex_to_slt(r"\frac{x}{y")  # unterminated group
    with pytest.raises(LaTeXError):
        latex_to_slt(r"\begin{tikzpicture}x\end{tikzpicture}")  # unsupported env
    with pytest.raises(LaTeXError):
        latex_to_slt("")
    # truncated inputs raise LaTeXError, never a raw IndexError
    for src in (r"\sqrt[3", r"\begin{array}[t", r"\begin{array}{cc",
                r"\begin{alignat}{2"):
        with pytest.raises(LaTeXError):
            latex_to_slt(src)
    # \text captures a FLAT brace group; nested braces fail loudly instead
    # of indexing text content as math identifiers
    with pytest.raises(LaTeXError):
        latex_to_slt(r"\text{a{b}}")


def test_latex_alignat_column_arg_skipped():
    # the {2} layout argument is not a math token
    got = latex_to_slt(r"\begin{alignat}{2}x &= 1\end{alignat}").serialize()
    assert got == "[M!1x2,w[V!x,e[=[N!1]]]]"
    assert latex_to_slt(r"\begin{alignat*}{2}y\end{alignat*}").serialize() == \
        "[M!1x1,w[V!y]]"


def test_latex_phi_convention():
    # symbol-vs-letter split mirrors the epsilon pair: \phi is the straight
    # PHI SYMBOL (U+03D5), \varphi the loopy GREEK SMALL LETTER PHI (U+03C6)
    assert latex_to_slt(r"\phi").serialize() == "[V!ϕ]"
    assert latex_to_slt(r"\varphi").serialize() == "[V!φ]"
    assert latex_to_slt(r"\epsilon").serialize() == "[V!ϵ]"
    assert latex_to_slt(r"\varepsilon").serialize() == "[V!ε]"


# Every construct pairs a LaTeX source with the Presentation MathML
# LaTeXML would emit for it; both paths must serialize to the SAME SLT —
# the repo's internal-consistency bar for M3 (the reference's own
# latexmlmath was broken, so there is no external golden output to replay).
MATHML_PARITY = [
    (r"\hat{x}", "<math><mover><mi>x</mi><mo>^</mo></mover></math>"),
    (r"\bar{y}+1",
     "<math><mover><mi>y</mi><mo>¯</mo></mover><mo>+</mo><mn>1</mn></math>"),
    (r"\vec{v}\cdot\vec{w}",
     "<math><mover><mi>v</mi><mo>→</mo></mover><mo>⋅</mo>"
     "<mover><mi>w</mi><mo>→</mo></mover></math>"),
    (r"\underline{z}", "<math><munder><mi>z</mi><mo>¯</mo></munder></math>"),
    (r"\overbrace{a+b}",
     "<math><mover><mrow><mi>a</mi><mo>+</mo><mi>b</mi></mrow>"
     "<mo>⏞</mo></mover></math>"),
    (r"\binom{n}{k}",
     "<math><mrow><mo>(</mo><mfrac><mi>n</mi><mi>k</mi></mfrac><mo>)</mo></mrow></math>"),
    (r"\dfrac{a}{b}", "<math><mfrac><mi>a</mi><mi>b</mi></mfrac></math>"),
    (r"\text{speed limit}", "<math><mtext>speed limit</mtext></math>"),
    (r"\operatorname{argmax}_x f",
     "<math><msub><mi>argmax</mi><mi>x</mi></msub><mi>f</mi></math>"),
    (r"\mathbb{R}^n", "<math><msup><mi>ℝ</mi><mi>n</mi></msup></math>"),
    (r"\mathcal{L}(x)",
     "<math><mi>ℒ</mi><mo>(</mo><mi>x</mi><mo>)</mo></math>"),
    (r"\mathfrak{g}", "<math><mi>\U0001d524</mi></math>"),
    (r"\mathrm{max}", "<math><mi>max</mi></math>"),
    (r"f'(x)",
     "<math><msup><mi>f</mi><mo>′</mo></msup><mo>(</mo><mi>x</mi><mo>)</mo></math>"),
    (r"f''", "<math><msup><mi>f</mi><mo>′′</mo></msup></math>"),
    (r"a\,b", '<math><mi>a</mi><mspace width="0.2em"/><mi>b</mi></math>'),
    (r"x \bmod 2", "<math><mi>x</mi><mo>mod</mo><mn>2</mn></math>"),
    (r"\{x\}", "<math><mo>{</mo><mi>x</mi><mo>}</mo></math>"),
    (r"\begin{cases}x & y \\ 1 & 0\end{cases}",
     "<math><mrow><mo>{</mo><mtable><mtr><mtd><mi>x</mi></mtd><mtd><mi>y</mi>"
     "</mtd></mtr><mtr><mtd><mn>1</mn></mtd><mtd><mn>0</mn></mtd></mtr>"
     "</mtable></mrow></math>"),
    (r"\begin{array}{cc}a & b\end{array}",
     "<math><mtable><mtr><mtd><mi>a</mi></mtd><mtd><mi>b</mi></mtd></mtr></mtable></math>"),
    (r"\begin{aligned}x &= 1 \\ y &= 2\end{aligned}",
     "<math><mtable><mtr><mtd><mi>x</mi></mtd><mtd><mo>=</mo><mn>1</mn></mtd>"
     "</mtr><mtr><mtd><mi>y</mi></mtd><mtd><mo>=</mo><mn>2</mn></mtd></mtr>"
     "</mtable></math>"),
]


@pytest.mark.parametrize("tex,mml", MATHML_PARITY)
def test_latex_mathml_parity(tex, mml):
    from tangent_ray.tokenize.mathml import mathml_to_slt

    assert latex_to_slt(tex).serialize() == mathml_to_slt(mml).serialize()


@pytest.mark.parametrize(
    "src,slt",
    [
        # \sum\limits_{i}: \limits is dropped at tokenize time so the
        # script still binds to the sum (over/under for an operator base)
        (r"\sum\limits_{i=1}^{n} i", "[∑[V!i],o[V!n],u[V!i[=[N!1]]]]"),
        # null delimiters emit nothing
        (r"\left. x \right.", "[V!x]"),
        # spacing commands vanish from chains like mspace does
        (r"a \quad b", "[V!a[V!b]]"),
        # letter-like command symbols are identifiers
        (r"\ell_2", "[V!ℓ,b[N!2]]"),
        (r"\hbar\omega", "[V!ℏ[V!ω]]"),
    ],
)
def test_latex_layout_commands(src, slt):
    assert latex_to_slt(src).serialize() == slt
