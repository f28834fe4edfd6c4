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
        latex_to_slt(r"\begin{aligned}x\end{aligned}")  # unsupported env
    with pytest.raises(LaTeXError):
        latex_to_slt("")
