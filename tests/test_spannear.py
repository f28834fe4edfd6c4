"""Ordered span-near ("a b"~slop, inOrder): four-way differential —
sidecar path vs index-free scan vs brute-force ordered-window oracle vs a
DuckDB ordered positions join — plus repeated-term phrases and seeded
fuzz against the brute oracle."""

from __future__ import annotations

import itertools
import random
import re

import duckdb
import pyarrow as pa
import pytest

from tangent_ray.index.positions import (
    build_position_index,
    span_near_scan,
    span_near_search,
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


def _brute(docs, phrase, slop, k):
    """min over ordered position tuples of (last - first - (n-1))."""
    terms = _toks(phrase)
    rows = []
    for doc_id, text in enumerate(docs):
        toks = _toks(text)
        occs = [[i for i, x in enumerate(toks) if x == t] for t in terms]
        if any(not o for o in occs):
            continue
        best = None
        for combo in itertools.product(*occs):
            if all(b > a for a, b in zip(combo, combo[1:])):
                s = combo[-1] - combo[0] - (len(terms) - 1)
                best = s if best is None else min(best, s)
        if best is not None and best <= slop:
            rows.append((doc_id, best))
    rows.sort(key=lambda r: (r[1], r[0]))
    return rows[:k]


def _duck_2term_ordered(tab, t1, t2, slop, k):
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
        SELECT a.doc_id AS docid, min(b.pos - a.pos - 1)::BIGINT AS min_slop
        FROM tok a JOIN tok b USING (doc_id)
        WHERE a.term = '{t1}' AND b.term = '{t2}' AND b.pos > a.pos
        GROUP BY 1 HAVING min(b.pos - a.pos - 1) <= {slop}
        ORDER BY 2, 1 LIMIT {k}
    """
    return [tuple(r) for r in con.execute(sql).fetchall()]


def _rows(t: pa.Table):
    return list(zip(t["docid"].to_pylist(), t["min_span"].to_pylist()))


DOCS = [
    "alpha beta gamma delta",                      # alpha->gamma slop 1
    "gamma x alpha x gamma",                       # ordered pair slop 1
    "gamma alpha",                                 # WRONG order only
    "alpha beta alpha gamma alpha",                # best ordered slop 0
    "beta delta epsilon",                          # missing terms
    "",                                            # empty doc
    "alpha " + "pad " * 30 + "gamma",              # slop 30
    "alpha alpha gamma",                           # repeated first term
]


@pytest.fixture(scope="module")
def sidecar(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("spannear") / "pos")
    build_position_index(ray.data.from_arrow(_table(DOCS)).repartition(3), out,
                         num_shards=4)
    return out


def test_two_term_ordered_vs_all_oracles(sidecar, ray_session):
    import ray.data

    ds = ray.data.from_arrow(_table(DOCS)).repartition(3)
    for slop in (0, 1, 5, 100):
        got = _rows(span_near_search(sidecar, "alpha gamma", slop, k=10))
        assert got == _duck_2term_ordered(_table(DOCS), "alpha", "gamma",
                                          slop, 10)
        assert got == _rows(span_near_scan(ds, "alpha gamma", slop, k=10))
        assert got == _brute(DOCS, "alpha gamma", slop, 10)


def test_order_matters(sidecar):
    # doc 2 is "gamma alpha": matches the reversed phrase only
    assert dict(_rows(span_near_search(sidecar, "alpha gamma", 100))).get(2) \
        is None
    assert dict(_rows(span_near_search(sidecar, "gamma alpha", 100))).get(2) \
        == 0


def test_slop_zero_is_exact_phrase(sidecar):
    # "alpha beta"~0 == adjacent in order
    got = _rows(span_near_search(sidecar, "alpha beta", 0, k=10))
    assert got == [(0, 0), (3, 0)]


def test_three_term_and_repeats(sidecar, ray_session):
    import ray.data

    ds = ray.data.from_arrow(_table(DOCS)).repartition(2)
    for phrase in ("alpha beta gamma", "alpha alpha gamma", "alpha gamma gamma"):
        for slop in (0, 1, 2, 50):
            got = _rows(span_near_search(sidecar, phrase, slop, k=10))
            assert got == _brute(DOCS, phrase, slop, 10), (phrase, slop)
            assert got == _rows(span_near_scan(ds, phrase, slop, k=10))


def test_no_match_and_single_term(sidecar):
    assert _rows(span_near_search(sidecar, "alpha nosuchword", 100, k=5)) == []
    got = _rows(span_near_search(sidecar, "alpha", 0, k=3))
    assert got == [(0, 0), (1, 0), (2, 0)]


def test_fuzz_vs_brute(ray_session, tmp_path):
    import ray.data

    rng = random.Random(20260819)
    vocab = ["a", "b", "c", "d"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        for _ in range(40)
    ]
    out = str(tmp_path / "pos")
    build_position_index(ray.data.from_arrow(_table(docs)).repartition(4), out,
                         num_shards=3)
    for _ in range(25):
        n = rng.randint(1, 3)
        phrase = " ".join(rng.choice(vocab) for _ in range(n))
        slop = rng.choice([0, 1, 2, 4, 10])
        got = _rows(span_near_search(out, phrase, slop, k=50))
        assert got == _brute(docs, phrase, slop, 50), (phrase, slop)
