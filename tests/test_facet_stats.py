"""``facet_stats``: the Elasticsearch ``stats`` aggregation (count / min /
max / sum / avg of a numeric metadata column) over a text query's FULL
candidate set, vs a DuckDB corpus twin; null handling, the
candidate-path interplay (negation, mm), and the text-column guard."""

from __future__ import annotations

import dataclasses
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG
from tangent_ray.index.build import build_index
from tangent_ray.query.facets import FacetCounter, build_facet_sidecar, facet_stats
from tangent_ray.sources.corpus import DocumentsCorpus

ROWS = [
    (0, "alpha beta", 120, "en"),
    (1, "alpha gamma", 80, "en"),
    (2, "beta beta beta", 300, "de"),
    (3, "alpha alpha", None, "de"),   # null numeric: excluded from stats
    (4, "gamma delta", 55, "fr"),
    (5, "alpha beta gamma", 10, "en"),
    (6, "unrelated words only", 999, "en"),
]


def _tab():
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "text": pa.array([r[1] for r in ROWS], pa.string()),
            "n_chars": pa.array([r[2] for r in ROWS], pa.int64()),
            "lang": pa.array([r[3] for r in ROWS], pa.string()),
        }
    )


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("fstats")
    src = str(root / "docs")
    os.makedirs(src)
    t = _tab()
    pq.write_table(t.slice(0, 4), os.path.join(src, "a.parquet"))
    pq.write_table(t.slice(4), os.path.join(src, "b.parquet"))
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=2),
                DocumentsCorpus())
    build_facet_sidecar(out, ["n_chars", "lang"])
    return out


def _duck(where_terms, extra=""):
    con = duckdb.connect()
    con.register("docs", _tab())
    terms = ", ".join(f"'{t}'" for t in where_terms)
    return con.execute(
        f"""
        WITH cand AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id, unnest(string_split_regex(lower(text),
                   '[^a-z0-9]+')) AS tok FROM docs
          ) WHERE tok IN ({terms})
        )
        SELECT count(d.n_chars)::BIGINT, min(d.n_chars)::DOUBLE,
               max(d.n_chars)::DOUBLE, coalesce(sum(d.n_chars), 0)::DOUBLE,
               avg(d.n_chars)::DOUBLE
        FROM docs d JOIN cand USING (doc_id) {extra}
        """
    ).fetchone()


def _got(t: pa.Table):
    r = t.to_pylist()[0]
    return (r["n_docs"], r["vmin"], r["vmax"], r["vsum"], r["vavg"])


def test_stats_match_duckdb(idx):
    for q, terms in (
        ("alpha", ["alpha"]),
        ("alpha beta", ["alpha", "beta"]),
        ("gamma", ["gamma"]),
        ("delta", ["delta"]),
    ):
        assert _got(facet_stats(idx, q, "n_chars")) == _duck(terms), q


def test_stats_through_scoring_path(idx):
    """Negations and #mm flow through (the candidate set is score_query's)."""
    got = _got(facet_stats(idx, "alpha -gamma", "n_chars"))
    con = duckdb.connect()
    con.register("docs", _tab())
    exp = con.execute(
        """
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(text),
                 '[^a-z0-9]+')) AS tok FROM docs
        ),
        cand AS (
          SELECT DISTINCT doc_id FROM toks WHERE tok = 'alpha'
          AND doc_id NOT IN (SELECT doc_id FROM toks WHERE tok = 'gamma')
        )
        SELECT count(d.n_chars)::BIGINT, min(d.n_chars)::DOUBLE,
               max(d.n_chars)::DOUBLE, coalesce(sum(d.n_chars), 0)::DOUBLE,
               avg(d.n_chars)::DOUBLE
        FROM docs d JOIN cand USING (doc_id)
        """
    ).fetchone()
    assert got == exp
    got_mm = _got(facet_stats(idx, "alpha beta gamma #mm:3", "n_chars"))
    assert got_mm == (1, 10.0, 10.0, 10.0, 10.0)  # only doc 5


def test_stats_empty_and_guard(idx):
    got = _got(facet_stats(idx, "zzz", "n_chars"))
    assert got == (0, None, None, 0.0, None)
    with pytest.raises(Exception):
        facet_stats(idx, "alpha", "lang")  # text column: loud, not garbage
    with pytest.raises(KeyError):
        FacetCounter(idx).stats(pa.array([0]).to_numpy(), "nope")


def test_sorted_search_matches_duckdb(idx):
    """sorted_search: candidates ordered by a numeric column (nulls
    dropped), twin = ORDER BY d.n_chars, doc_id."""
    from tangent_ray.query.facets import sorted_search

    con = duckdb.connect()
    con.register("docs", _tab())
    for asc in (True, False):
        got = sorted_search(idx, "alpha beta", "n_chars", k=4,
                            ascending=asc)
        exp = con.execute(
            f"""
            WITH cand AS (
              SELECT DISTINCT doc_id FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text),
                       '[^a-z0-9]+')) AS tok FROM docs
              ) WHERE tok IN ('alpha', 'beta')
            )
            SELECT d.doc_id, d.n_chars::DOUBLE
            FROM docs d JOIN cand USING (doc_id)
            WHERE d.n_chars IS NOT NULL
            ORDER BY d.n_chars {'ASC' if asc else 'DESC'}, d.doc_id
            LIMIT 4
            """
        ).fetchall()
        assert got["docid"].to_pylist() == [r[0] for r in exp], asc
        assert got["sort_value"].to_pylist() == [r[1] for r in exp], asc
        assert got["rank"].to_pylist() == list(range(1, len(exp) + 1))


def test_sorted_search_full_syntax(idx):
    from tangent_ray.query.facets import sorted_search

    got = sorted_search(idx, "alpha -gamma", "n_chars", k=10)
    # alpha docs {0,1,3,5} minus gamma docs {1,5}, minus null n_chars (3)
    assert got["docid"].to_pylist() == [0]
    with pytest.raises(Exception):
        sorted_search(idx, "alpha", "lang")  # text column: loud
