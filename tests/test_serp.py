"""S15 HTML SERP + the SLT -> MathML inverse renderer.

The strongest check is the round trip: for every SLT in the fixture query
vocabulary AND every reference-bundled .mml file our parser accepts, the
rendered MathML must parse back (via tokenize.mathml) to the identical
SLT serialization.
"""

import glob
import os

import pytest

from tangent_ray.eval.serp import render_serp, slt_to_mathml, write_serp
from tangent_ray.tokenize.mathml import MathMLError, mathml_to_slt

SLTS = [
    "[V!x]",
    "[V!x[+[N!1]]]",
    "[V!x[=[F!,o[N!1],u[V!p]]]]",          # fraction
    "[R!,w[V!z]]",                           # sqrt
    "[R!,c[N!3],w[V!z]]",                    # cube root
    "[V!x,b[N!3]]",                          # subscript
    "[V!x,a[N!2]]",                          # superscript
    "[V!x,a[N!2],b[V!i]]",                   # subsup
    "[V!x[+[V!p,a[N!2]]]]",
    "[?v[=[?w]]]",                           # wildcards
    "[M!2x2,w[N!1,e[N!2,e[N!3,e[N!4]]]]]",   # bare 2x2 matrix
    "[M!()1x2,w[V!a,e[V!b]]]",               # fenced row
    "[T!sin[V!x]]",                          # text token
]


@pytest.mark.parametrize("slt", SLTS)
def test_mathml_round_trip(slt):
    xml = slt_to_mathml(slt)
    back = mathml_to_slt(xml).serialize()
    assert back == slt


def test_round_trip_reference_mml_corpus():
    """Every reference .mml our parser accepts must survive
    SLT -> MathML -> SLT unchanged."""
    td = "/root/reference/tangent_code/tangent/testing/test_data"
    if not os.path.isdir(td):
        pytest.skip("reference test data absent")
    files = sorted(glob.glob(os.path.join(td, "**", "*.mml"), recursive=True))
    assert files
    checked = 0
    for f in files:
        with open(f, encoding="utf-8", errors="replace") as fh:
            xml = fh.read()
        try:
            slt = mathml_to_slt(xml).serialize()
        except (MathMLError, Exception):
            continue
        back = mathml_to_slt(slt_to_mathml(slt)).serialize()
        assert back == slt, f
        checked += 1
    assert checked >= 5  # the bundled corpus must actually exercise this


def test_render_and_write_serp(tmp_path):
    import pyarrow as pa

    results = pa.Table.from_pylist(
        [
            {"query_id": "q1", "rank": 1, "dockey": "conv1:0", "score": 2.5,
             "slt": "[V!x[+[N!1]]]"},
            {"query_id": "q1", "rank": 2, "dockey": "conv2:3", "score": 1.0,
             "slt": "[V!y]"},
            {"query_id": "q2", "rank": 1, "docid": 42, "score": 0.5},
        ]
    )
    queries = pa.Table.from_pylist(
        [
            {"query_id": "q1", "text": "find $[V!x[+[N!1]]]$ here"},
            {"query_id": "q2", "text": "plain text query"},
        ]
    )
    paths = write_serp(results, queries, str(tmp_path))
    assert [os.path.basename(p) for p in paths] == ["serp_q1.html", "serp_q2.html"]
    page = open(paths[0]).read()
    assert "<math" in page and "<mfrac" not in page and "<msub" not in page
    assert "conv1:0" in page and "conv2:3" in page
    # the query's $...$ span rendered as MathML, not shown raw
    assert "$[V!x" not in page
    # malformed SLT falls back to escaped text instead of raising
    html = render_serp("q3", "x", [{"rank": 1, "docid": 1, "score": 0,
                                    "slt": "[broken"}])
    assert "[broken" in html


def test_serp_with_snippets(tmp_path):
    import pyarrow as pa

    from tangent_ray.eval.serp import _escape_highlighted

    results = pa.Table.from_pylist(
        [{"query_id": "q1", "rank": 1, "docid": 7, "score": 1.0}]
    )
    queries = pa.Table.from_pylist([{"query_id": "q1", "text": "merge"}])
    snippets = pa.Table.from_pylist(
        [
            {
                "query_id": "q1",
                "docid": 7,
                "highlighted": "a <b>raw</b> <em>merge</em> & more",
            }
        ]
    )
    paths = write_serp(results, queries, str(tmp_path), snippets=snippets)
    page = open(paths[0]).read()
    # highlight survives, document markup is escaped
    assert "<em>merge</em>" in page
    assert "&lt;b&gt;raw&lt;/b&gt;" in page and "&amp; more" in page
    assert 'class="snippet"' in page
    # rows without a snippet render unchanged
    assert _escape_highlighted("plain") == "plain"
