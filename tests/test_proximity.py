"""Proximity search (terms within a window): three-way differential —
sidecar path vs index-free scan vs DuckDB positions join (2 terms) and a
brute-force minimal-cover oracle (k terms) — plus seeded fuzz."""

from __future__ import annotations

import itertools
import random
import re

import duckdb
import pyarrow as pa
import pytest

from tangent_ray.index.positions import (
    build_position_index,
    proximity_scan,
    proximity_search,
)


def _table(docs):
    return pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _brute(docs, query, window, k):
    terms = sorted(set(_toks(query)))
    rows = []
    for doc_id, text in enumerate(docs):
        toks = _toks(text)
        occs = [[i for i, x in enumerate(toks) if x == t] for t in terms]
        if any(not o for o in occs):
            continue
        best = min(max(c) - min(c) for c in itertools.product(*occs))
        if best <= window:
            rows.append((doc_id, best))
    rows.sort(key=lambda r: (r[1], r[0]))
    return rows[:k]


def _duck_2term(tab, t1, t2, window, k):
    con = duckdb.connect()
    con.register("documents", tab)
    sql = f"""
        WITH raw AS (
          SELECT doc_id, ts[i] AS term, i
          FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS ts
                FROM documents),
               LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
        ), tok AS (
          SELECT doc_id, term,
                 row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos
          FROM raw WHERE term <> ''
        )
        SELECT a.doc_id AS docid, min(abs(a.pos - b.pos))::BIGINT AS min_span
        FROM tok a JOIN tok b USING (doc_id)
        WHERE a.term = '{t1}' AND b.term = '{t2}'
        GROUP BY 1 HAVING min(abs(a.pos - b.pos)) <= {window}
        ORDER BY 2, 1 LIMIT {k}
    """
    return [tuple(r) for r in con.execute(sql).fetchall()]


def _rows(t: pa.Table):
    return list(zip(t["docid"].to_pylist(), t["min_span"].to_pylist()))


DOCS = [
    "alpha beta gamma delta",                      # alpha..gamma span 2
    "alpha x x x x gamma",                         # span 5
    "gamma alpha",                                 # span 1 (order-free)
    "alpha beta alpha gamma alpha",                # best span 1 (pos 2,3)
    "beta delta epsilon",                          # missing terms
    "",                                            # empty doc
    "alpha " + "pad " * 30 + "gamma",              # far apart (span 31)
    "zeta alpha gamma zeta alpha pad gamma alpha", # multiple pairings
]


@pytest.fixture(scope="module")
def sidecar(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("prox") / "pos")
    build_position_index(ray.data.from_arrow(_table(DOCS)).repartition(3), out,
                         num_shards=4)
    return out


def test_two_term_matches_duckdb_and_scan(sidecar, ray_session):
    import ray.data

    ds = ray.data.from_arrow(_table(DOCS)).repartition(3)
    for window in (1, 2, 5, 100):
        got = _rows(proximity_search(sidecar, "alpha gamma", window, k=10))
        assert got == _duck_2term(_table(DOCS), "alpha", "gamma", window, 10)
        assert got == _rows(proximity_scan(ds, "alpha gamma", window, k=10))
        assert got == _brute(DOCS, "alpha gamma", window, 10)


def test_three_term_minimal_cover(sidecar, ray_session):
    import ray.data

    ds = ray.data.from_arrow(_table(DOCS)).repartition(2)
    for window in (2, 3, 50):
        got = _rows(proximity_search(sidecar, "alpha beta gamma", window, k=10))
        assert got == _brute(DOCS, "alpha beta gamma", window, 10)
        assert got == _rows(proximity_scan(ds, "alpha beta gamma", window, k=10))


def test_single_term_and_duplicates(sidecar):
    # one distinct term -> span 0 per containing doc, docid-asc order;
    # duplicate query terms collapse ("alpha alpha" == "alpha")
    got = _rows(proximity_search(sidecar, "alpha", 0, k=3))
    assert got == [(0, 0), (1, 0), (2, 0)]
    assert got == _rows(proximity_search(sidecar, "alpha alpha", 0, k=3))


def test_no_match_and_empty(sidecar):
    assert _rows(proximity_search(sidecar, "alpha nosuchword", 100, k=5)) == []
    with pytest.raises(ValueError):
        proximity_search(sidecar, "!!!", 1)


def test_topk_cut_is_global(sidecar):
    full = _rows(proximity_search(sidecar, "alpha gamma", 100, k=100))
    for k in (1, 2, 3):
        assert _rows(proximity_search(sidecar, "alpha gamma", 100, k=k)) == full[:k]


def test_fuzz_differential(ray_session, tmp_path):
    import ray.data

    rng = random.Random(42)
    words = ["aa", "bb", "cc", "dd", "ee"]
    docs = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 25)))
        for _ in range(60)
    ]
    tab = _table(docs)
    out = str(tmp_path / "pos")
    build_position_index(
        ray.data.from_arrow(tab).repartition(4), out, num_shards=4
    )
    for trial in range(12):
        n_terms = rng.choice([2, 2, 3, 4])
        q = " ".join(rng.sample(words, n_terms))
        window = rng.choice([0, 1, 2, 4, 10])
        got = _rows(proximity_search(out, q, window, k=20))
        assert got == _brute(docs, q, window, 20), (trial, q, window)
        if n_terms == 2:
            t1, t2 = sorted(set(_toks(q)))
            assert got == _duck_2term(tab, t1, t2, window, 20)
