"""MathML -> SLT conversion fixtures (shapes mirror the reference's bundled
test corpus categories: scripts, fractions, radicals, matrices,
multiscripts, wildcards, errors)."""

import pytest

from tangent_ray.tokenize.mathml import MathMLError, clean, mathml_to_slt


def slt(x):
    return mathml_to_slt(x).serialize()


def test_simple_row():
    assert slt("<math><mi>x</mi><mo>+</mo><mn>2</mn></math>") == "[V!x[+[N!2]]]"


def test_sup_symbol_base_uses_above():
    assert slt("<math><msup><mi>b</mi><mn>2</mn></msup></math>") == "[V!b,a[N!2]]"


def test_sub_symbol_base_uses_below():
    assert slt("<math><msub><mi>x</mi><mi>i</mi></msub></math>") == "[V!x,b[V!i]]"


def test_sum_operator_base_uses_under_over():
    s = slt(
        "<math><munderover><mo>&#x2211;</mo><mi>i</mi><mi>n</mi></munderover></math>"
    )
    assert s == "[∑,o[V!n],u[V!i]]"


def test_msubsup_operator_split():
    # operator base -> under/over even via msubsup (reference FWT rule)
    s = slt("<math><msubsup><mo>&#x222B;</mo><mn>0</mn><mn>1</mn></msubsup></math>")
    assert s == "[∫,o[N!1],u[N!0]]"


def test_frac_sqrt_root():
    assert slt("<math><mfrac><mn>1</mn><mi>y</mi></mfrac></math>") == "[F!,o[N!1],u[V!y]]"
    assert slt("<math><msqrt><mi>z</mi></msqrt></math>") == "[R!,w[V!z]]"
    assert (
        slt("<math><mroot><mi>x</mi><mn>3</mn></mroot></math>")
        == "[R!,c[N!3],w[V!x]]"
    )


def test_parenthesized_row_becomes_fenced_matrix():
    s = slt(
        "<math><mrow><mo>(</mo><mi>p</mi><mo>,</mo><mi>q</mi><mo>)</mo></mrow></math>"
    )
    assert s == "[M!()1x2,w[V!p,e[V!q]]]"


def test_simple_parens_group():
    s = slt("<math><mrow><mo>(</mo><mi>a</mi><mo>+</mo><mi>b</mi><mo>)</mo></mrow></math>")
    assert s == "[M!()1x1,w[V!a[+[V!b]]]]"


def test_mfenced():
    s = slt("<math><mfenced><mi>u</mi><mi>v</mi></mfenced></math>")
    assert s == "[M!()1x2,w[V!u,e[V!v]]]"


def test_mtable():
    s = slt(
        "<math><mtable>"
        "<mtr><mtd><mi>a</mi></mtd><mtd><mi>b</mi></mtd></mtr>"
        "<mtr><mtd><mi>c</mi></mtd><mtd><mi>d</mi></mtd></mtr>"
        "</mtable></math>"
    )
    assert s == "[M!2x2,w[V!a,e[V!b,e[V!c,e[V!d]]]]]"


def test_script_on_row_base_wraps_in_matrix():
    # base with a next-chain must be wrapped so the script attaches to the
    # group, not the last symbol (reference make_matrix([base]) rule)
    s = slt(
        "<math><msup><mrow><mi>x</mi><mo>+</mo><mi>y</mi></mrow><mn>2</mn></msup></math>"
    )
    assert s == "[M!1x1,a[N!2],w[V!x[+[V!y]]]]"


def test_mtext_and_invisible_ops():
    assert slt("<math><mtext>iff</mtext></math>") == "[T!iff]"
    # invisible times (U+2062) vanishes into W! and is dropped from the row
    s = slt("<math><mi>a</mi><mo>&#x2062;</mo><mi>b</mi></math>")
    assert s == "[V!a[V!b]]"


def test_clean_escaping():
    assert clean("a,b") == "a&comma;b"
    assert clean("[x]") == "&lsqb;x&rsqb;"
    assert clean("wh?y") == "wh&quest;y"


def test_wildcard_qvar():
    s = slt('<math><mws:qvar xmlns:mws="x" name="v"/><mo>=</mo><mn>1</mn></math>')
    assert s == "[?v[=[N!1]]]"


def test_merror():
    assert slt("<math><merror><mtext>bad</mtext></merror></math>") == "[E!bad]"


def test_namespaced_input():
    s = slt(
        '<math xmlns="http://www.w3.org/1998/Math/MathML">'
        "<m:mi xmlns:m='x'>q</m:mi></math>".replace("m:", "m:")
    )
    assert s == "[V!q]"


def test_annotation_presentation_preferred():
    s = slt(
        "<math><semantics>"
        "<apply><plus/><ci>a</ci><ci>b</ci></apply>"
        '<annotation-xml encoding="MathML-Presentation">'
        "<mi>a</mi><mo>+</mo><mi>b</mi></annotation-xml>"
        "</semantics></math>"
    )
    assert s == "[V!a[+[V!b]]]"


def test_mmultiscripts_prescripts():
    s = slt(
        "<math><mmultiscripts><mi>C</mi><mi>k</mi><none/>"
        "<mprescripts/><none/><mi>n</mi></mmultiscripts></math>"
    )
    assert s == "[V!C,b[V!k],c[V!n]]"


def test_unknown_tag_raises():
    with pytest.raises(MathMLError):
        slt("<math><notreal>x</notreal></math>")


def test_roundtrip_through_tuple_generator():
    from tangent_ray.tokenize.slt import parse_slt, slt_tuples

    s = slt("<math><msub><mi>x</mi><mi>i</mi></msub><mo>=</mo><mfrac><mn>1</mn><mi>n</mi></mfrac></math>")
    root = parse_slt(s)  # canonical string parses + round-trips
    tups = slt_tuples(root, window=1, eol="none")
    assert ("V!x", "=", "n", "-") in tups
    assert ("F!", "N!1", "o", "nn") in tups


def test_tokenizer_mathml_equals_slt_spans():
    """A <math> span must index byte-identically to its $SLT$ twin
    (same tuple terms, tfs, dl)."""
    import pyarrow as pa

    from tangent_ray.config import EngineConfig
    from tangent_ray.sources.corpus import TranscriptsCorpus
    from tangent_ray.tokenize.batch import TokenizeBatch

    mathml = (
        "<math><mi>x</mi><mo>=</mo><mfrac><mn>1</mn><mi>p</mi></mfrac></math>"
    )
    slt = "$[V!x[=[F!,o[N!1],u[V!p]]]]$"

    def corpus_of(fragment):
        return pa.table(
            {
                "conv_id": ["c1"],
                "turn_idx": pa.array([0], type=pa.int32()),
                "role": ["assistant"],
                "text": [f"hello world {fragment} bye"],
                "tool": [""],
                "ts": pa.array([0], type=pa.timestamp("us")),
            }
        )

    cfg = EngineConfig(window=2, eol="small", stem=True, math=True)
    tok = TokenizeBatch(cfg, TranscriptsCorpus())
    a = tok(corpus_of(mathml)).sort_by("term").to_pydict()
    b = tok(corpus_of(slt)).sort_by("term").to_pydict()
    assert a == b
    assert any(k == 1 for k in a["kind"])  # math tuples present


def test_query_parser_mathml():
    from collections import Counter

    from tangent_ray.config import EngineConfig
    from tangent_ray.tokenize.slt import parse_slt, slt_tuples, tuple_term

    class FakeScorer:
        cfg = EngineConfig(window=2, eol="small", stem=True, math=True)

    from tangent_ray.query.scorer import QueryScorer

    parse_query = QueryScorer.parse_query
    terms, bag, qtc, nf = parse_query(
        FakeScorer(), "solve <math><msqrt><mi>z</mi></msqrt></math> now"
    )
    root = parse_slt("[R!,w[V!z]]")
    want = Counter(
        tuple_term(fr, to, rel) for fr, to, rel, _ in slt_tuples(root, 2, "small")
    )
    assert bag == want
    assert nf == 1 and qtc == sum(want.values())
    assert "solv" in terms or "solve" in terms
