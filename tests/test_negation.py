"""Boolean NOT (-term exclusion) queries: exact exclusion semantics on
every scoring path, score preservation for survivors, WAND parity, math
spans untouched, hyphenated words not treated as negation, DuckDB twin."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG, EngineConfig
from tangent_ray.index.build import build_index
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import DocumentsCorpus

DOCS = [
    "alpha beta gamma",         # 0: has beta -> excluded by -beta
    "alpha gamma gamma",        # 1: survives
    "alpha alpha beta",         # 2: excluded
    "alpha delta",              # 3: survives
    "gamma beta",               # 4: no alpha, has beta
    "state-of-the-art alpha",   # 5: hyphenated words are NOT negations
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    import dataclasses

    root = tmp_path_factory.mktemp("neg")
    src = str(root / "docs")
    os.makedirs(src)
    tab = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS, pa.string()),
        }
    )
    pq.write_table(tab, os.path.join(src, "d.parquet"))
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=2),
                DocumentsCorpus())
    return out


def _duck_excluded(term):
    con = duckdb.connect()
    con.register(
        "docs",
        pa.table({"doc_id": pa.array(range(len(DOCS)), pa.int64()),
                  "text": pa.array(DOCS, pa.string())}),
    )
    return set(
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM (
              SELECT doc_id, unnest(string_split_regex(lower(text),
                     '[^a-z0-9]+')) AS tok FROM docs
            ) WHERE tok = '{term}' GROUP BY 1
            """
        ).fetchall()
    )


def test_not_excludes_and_preserves_scores(idx):
    s = QueryScorer(idx)
    d_plain, sc_plain = s.score_query("alpha", "text", 100)
    d_neg, sc_neg = s.score_query("alpha -beta", "text", 100)
    excluded = _duck_excluded("beta")
    assert not (set(d_neg.tolist()) & excluded)
    # survivors keep their exact plain-query scores (NOT filters, never
    # rescores — the df/idf of 'alpha' is unchanged)
    keep = ~np.isin(d_plain, list(excluded))
    assert (d_neg == d_plain[keep]).all()
    assert (sc_neg == sc_plain[keep]).all()
    assert s.last_stats["excluded_docs"] == len(excluded)


def test_multiple_negations_and_unknown_term(idx):
    s = QueryScorer(idx)
    d, _ = s.score_query("alpha -beta -delta", "text", 100)
    bad = _duck_excluded("beta") | _duck_excluded("delta")
    assert set(d.tolist()) == {1, 5}
    assert not (set(d.tolist()) & bad)
    # unknown excluded term: no-op
    d2, _ = s.score_query("alpha -zzznotaword", "text", 100)
    dp, _ = s.score_query("alpha", "text", 100)
    assert (d2 == dp).all()


def test_hyphenated_words_are_not_negations(idx):
    s = QueryScorer(idx)
    # "state-of-the-art" must not exclude docs containing 'of'/'the'/'art'
    d, _ = s.score_query("state-of-the-art alpha", "text", 100)
    assert 5 in d.tolist()
    assert s.last_stats.get("excluded_docs", 0) == 0


def test_wand_parity_under_negation(idx):
    taat = QueryScorer(idx)
    wand = QueryScorer(idx)
    wand.wand_min_postings = 1
    wand.wand_drive_ratio = 0
    wand.wand_bailout_ratio = 0
    for q in ("alpha gamma -beta", "alpha -delta", "gamma alpha -beta -delta"):
        for k in (1, 2, 10):
            d1, s1 = taat.score_query(q, "text", k)
            d2, s2 = wand.score_query(q, "text", k)
            assert (d1 == d2).all(), (q, k)
            assert (s1 == s2).all(), (q, k)


def test_negation_with_math_span(ray_session, tmp_path):
    """-terms inside $...$ math spans are formula syntax, not negation."""
    import dataclasses

    src = str(tmp_path / "docs")
    os.makedirs(src)
    tab = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["alpha $[V!x[-[N!1]]]$ beta", "alpha plain"], pa.string()
            ),
        }
    )
    pq.write_table(tab, os.path.join(src, "d.parquet"))
    out = str(tmp_path / "idx")
    cfg = dataclasses.replace(
        EngineConfig(stem=False, math=True, window=1, eol="none"), partitions=1
    )
    build_index(src, out, cfg, DocumentsCorpus())
    s = QueryScorer(out)
    # the math span survives negation-stripping verbatim
    cleaned, negs = s._split_negations("alpha $[V!x[-[N!1]]]$ -beta")
    assert "$[V!x[-[N!1]]]$" in cleaned and negs == ["beta"]
    d, _ = s.score_query("alpha $[V!x[-[N!1]]]$ -beta", "mixed", 10)
    assert d.tolist() == [1]  # doc 0 contains beta -> excluded
