"""Hand-computed symbol-pair tuple fixtures.

Expected tuples follow the authoritative C++ expansion semantics
(``ExprNode::tuples`` / ``parseExpr``, reference mathindexmid.h:33-75):
window counts edges, EOL tuples are ``(sym, "0!", "n")`` for nodes without an
n-child, gated small=height<=1, locations are root paths (root edge label is
'-') run-length encoded at length >= 6.
"""

import pytest

from tangent_ray.tokenize.slt import (
    SLTParseError,
    parse_slt,
    runl,
    slt_tuples,
    tuple_term,
    parse_tuple_term,
    is_tuple_term,
)

SUP = "[V!a[+[V!b,a[N!2]]]]"  # a + b^2
FRAC = "[V!x[=[F!,o[N!1],u[V!y]]]]"  # x = 1/y


def test_roundtrip():
    for s in [SUP, FRAC, "[V!x]", "[R!,w[V!z]]", "[V!f[M!()1x1,w[V!t]]]"]:
        assert parse_slt(s).serialize() == s


def test_parse_errors():
    for s in ["", "V!x", "[V!x", "[[V!x]]", "[V!x,]junk"]:
        with pytest.raises(SLTParseError):
            parse_slt(s)


def test_runl():
    assert runl("nn") == "nn"
    assert runl("nnnnn") == "nnnnn"  # < 6 chars: unchanged
    assert runl("nnnnnn") == "6n"
    assert runl("nanana") == "1n1a1n1a1n1a"
    assert runl("nnnaab") == "3n2a1b"


def test_sup_w1_none():
    t = slt_tuples(parse_slt(SUP), window=1, eol="none")
    assert t == [
        ("V!a", "+", "n", "-"),
        ("+", "V!b", "n", "n"),
        ("V!b", "N!2", "a", "nn"),
    ]


def test_sup_w2_none():
    t = slt_tuples(parse_slt(SUP), window=2, eol="none")
    assert t == [
        ("V!a", "+", "n", "-"),
        ("V!a", "V!b", "nn", "-"),
        ("+", "V!b", "n", "n"),
        ("+", "N!2", "na", "n"),
        ("V!b", "N!2", "a", "nn"),
    ]


def test_sup_w0_unbounded():
    t = slt_tuples(parse_slt(SUP), window=0, eol="none")
    # w=0 means unbounded (reference maps 0 -> INT_MAX, mathindex.cpp:385)
    assert ("V!a", "N!2", "nna", "-") in t
    assert len(t) == 6


def test_sup_eol_all():
    t = slt_tuples(parse_slt(SUP), window=1, eol="all")
    assert t == [
        ("V!a", "+", "n", "-"),
        ("+", "V!b", "n", "n"),
        ("V!b", "N!2", "a", "nn"),
        ("V!b", "0!", "n", "nn"),
        ("N!2", "0!", "n", "nna"),
    ]


def test_sup_eol_small_is_gated_by_height():
    # SUP has height > 1 -> "small" emits no EOL tuples
    assert slt_tuples(parse_slt(SUP), window=1, eol="small") == slt_tuples(
        parse_slt(SUP), window=1, eol="none"
    )
    # single symbol: height 0 -> EOL emitted, root loc is "-"
    assert slt_tuples(parse_slt("[V!x]"), window=1, eol="small") == [
        ("V!x", "0!", "n", "-")
    ]
    # height exactly 1: x_i (subscript only)
    t = slt_tuples(parse_slt("[V!x,b[V!i]]"), window=1, eol="small")
    assert t == [
        ("V!x", "V!i", "b", "-"),
        ("V!x", "0!", "n", "-"),
        ("V!i", "0!", "n", "b"),
    ]


def test_frac_w1():
    t = slt_tuples(parse_slt(FRAC), window=1, eol="none")
    assert t == [
        ("V!x", "=", "n", "-"),
        ("=", "F!", "n", "n"),
        ("F!", "N!1", "o", "nn"),
        ("F!", "V!y", "u", "nn"),
    ]


def test_error_nodes_skipped():
    # E! under a 'w' edge is not emitted as a pair target; E! emits no EOL
    t = slt_tuples(parse_slt("[R!,w[E!]]"), window=1, eol="all")
    assert ("R!", "E!", "w", "-") not in t
    assert t == [("R!", "0!", "n", "-")]


def test_runl_applied_to_deep_locs():
    deep = "[V!a[V!b[V!c[V!d[V!e[V!f[V!g[V!h]]]]]]]]"
    t = slt_tuples(parse_slt(deep), window=1, eol="none")
    # V!g's anchor is 6 'n' edges below the root (root resets loc) -> "6n"
    assert t[-1] == ("V!g", "V!h", "n", "6n")
    assert t[-2] == ("V!f", "V!g", "n", "nnnnn")


def test_tuple_term_roundtrip():
    term = tuple_term("V!a", "N!2", "na")
    assert is_tuple_term(term)
    assert not is_tuple_term("hello42")
    assert parse_tuple_term(term) == ("V!a", "N!2", "na")


def test_tuple_term_sanitizes_separator():
    """A stray \\x1f in a symbol (possible via the raw $...$ SLT path) must
    not break tuple-term injectivity or the wildcard-lexicon parser."""
    from tangent_ray.tokenize.slt import parse_tuple_term, tuple_term

    t = tuple_term("V!a\x1fb", "N!1", "n")
    fr, to, rel = parse_tuple_term(t)
    assert (fr, to, rel) == ("V!a b", "N!1", "n")
    assert t.count("\x1f") == 2
