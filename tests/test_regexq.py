"""Regexp term queries ``/pat/`` (Lucene RegexpQuery): full-match
expansion over the indexed vocabulary scored as a blended synonym group,
with ``^boost`` and ``-/pat/`` negation. Differential: expansion vs a
python ``re.fullmatch`` scan of the corpus vocabulary, score identity vs
the equivalent explicit ``{a,b}`` group, and the full-expansion negation
rule."""

from __future__ import annotations

import dataclasses
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG
from tangent_ray.index.build import build_index
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import DocumentsCorpus

DOCS = [
    "table tables tablet stable tabulate",
    "hash hashes hashing rehash",
    "join joins joined joining jointly",
    "table hash join",
    "tablet stable retable",
    "join table join table",
    "nothing relevant here",
    "tabs tab tables",
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("regexq")
    src = str(root / "docs")
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(DOCS) + 1), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        ),
        os.path.join(src, "d.parquet"),
    )
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    return out


def _vocab_df():
    df: dict[str, set] = {}
    for i, d in enumerate(DOCS):
        for t in set(d.split()):
            df.setdefault(t, set()).add(i)
    return {t: len(s) for t, s in df.items()}


def _expand_oracle(pat: str, cap: int) -> list[str]:
    df = _vocab_df()
    rx = re.compile(pat)
    cand = [t for t in df if rx.fullmatch(t)]
    cand.sort(key=lambda t: (-df[t], t))
    return sorted(cand[:cap])


def test_expand_regexp_matches_re(idx):
    r = QueryScorer(idx).reader
    for pat in [
        "tables?", "tab.*", "hash(es|ing)?", ".*ing", "jo.n", "t.b",
        "tabl.t", "x+", "tab{1,2}.*",
    ]:
        for cap in (2, 100):
            assert sorted(r.expand_regexp(pat, cap)) == _expand_oracle(
                pat, cap
            ), (pat, cap)


def test_scored_as_synonym_group(idx):
    sc = QueryScorer(idx)
    d1, s1 = sc.score_query("/tables?/ hash", "text", 100)
    d2, s2 = sc.score_query("{table,tables} hash", "text", 100)
    assert d1.tolist() == d2.tolist()
    assert s1.tolist() == s2.tolist()
    # boost applies to the whole expansion
    d3, s3 = sc.score_query("/tables?/^2 hash", "text", 100)
    d4, s4 = sc.score_query("{table,tables}^2 hash", "text", 100)
    assert d3.tolist() == d4.tolist() and s3.tolist() == s4.tolist()


def test_expansion_cap_rank_rule(idx):
    """The cap keeps the most frequent terms (df desc, term asc) — the
    Lucene MultiTermQuery rewrite rule shared with prefix/wildcard."""
    sc = QueryScorer(idx)
    sc.prefix_max_expansions = 2
    d1, s1 = sc.score_query("/tab.*/", "text", 100)
    caps = _expand_oracle("tab.*", 2)
    d2, s2 = sc.score_query("{" + ",".join(caps) + "}", "text", 100)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()


def test_negated_regexp_excludes_full_match_set(idx):
    sc = QueryScorer(idx)
    sc.prefix_max_expansions = 1  # negation must IGNORE the cap
    d, _ = sc.score_query("join -/tab.*/", "text", 100)
    banned = {
        i + 1
        for i, doc in enumerate(DOCS)
        if any(re.fullmatch("tab.*", t) for t in doc.split())
    }
    kept = {i + 1 for i, doc in enumerate(DOCS) if "join" in doc.split()}
    assert set(d.tolist()) == kept - banned and len(d)


def test_no_match_and_leading_metachar(idx):
    sc = QueryScorer(idx)
    d, s = sc.score_query("/zz.*/ hash", "text", 100)
    d2, s2 = sc.score_query("hash", "text", 100)
    assert d.tolist() == d2.tolist() and s.tolist() == s2.tolist()
    # leading metachar: whole-vocab scan still correct
    d3, _ = sc.score_query("/.*ing/", "text", 100)
    exp = {
        i + 1
        for i, doc in enumerate(DOCS)
        if any(re.fullmatch(".*ing", t) for t in doc.split())
    }
    assert set(d3.tolist()) == exp


def test_toplevel_alternation_not_prefix_narrowed(idx):
    """``tab.*|join`` has a top-level branch: the literal-prefix fast path
    must not silently drop the 'join' side (full-vocab fullmatch rule)."""
    sc = QueryScorer(idx)
    got = sorted(sc.reader.expand_regexp("tab.*|join", 1000))
    assert got == _expand_oracle("tab.*|join", 1000)
    assert "join" in got and "table" in got
    # grouped alternation AFTER the prefix keeps the narrowing sound
    got2 = sorted(sc.reader.expand_regexp("tab(le|s)", 1000))
    assert got2 == _expand_oracle("tab(le|s)", 1000)
    # escaped pipe is a literal, not an alternation (no vocab hit, but
    # the expansion must not crash or mis-narrow)
    assert sc.reader.expand_regexp(r"tab\|le", 1000) == _expand_oracle(
        r"tab\|le", 1000
    )
    # negation of an alternation excludes BOTH branches
    d, _ = sc.score_query("hash -/tab.*|join/", "text", 100)
    banned = {
        i + 1
        for i, doc in enumerate(DOCS)
        if any(re.fullmatch("tab.*|join", t) for t in doc.split())
    }
    kept = {i + 1 for i, doc in enumerate(DOCS) if "hash" in doc.split()}
    assert set(d.tolist()) == kept - banned and len(d)


def test_negated_regexp_case_insensitive(idx):
    """``-/Tab.*/`` lowercases before expansion — excludes like -/tab.*/."""
    sc = QueryScorer(idx)
    d1, s1 = sc.score_query("join -/Tab.*/", "text", 100)
    d2, s2 = sc.score_query("join -/tab.*/", "text", 100)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
