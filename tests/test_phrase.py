"""Positional sidecar + exact phrase search: three-way differential
(sidecar path vs index-free scan vs DuckDB positions self-join), repeated
terms, overlap counting, sharding, and seeded fuzz."""

from __future__ import annotations

import random
import re

import duckdb
import pyarrow as pa
import pytest

from tangent_ray.index.positions import (
    build_position_index,
    phrase_count_scan,
    phrase_search,
)


def _table(docs):
    return pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )


def _brute_topk(docs, phrase, k):
    terms = [t for t in re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    rows = []
    for doc_id, text in enumerate(docs):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        n = sum(
            1
            for i in range(len(toks) - len(terms) + 1)
            if toks[i : i + len(terms)] == terms
        )
        if n:
            rows.append((doc_id, n))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def _duck_topk(tab, phrase, k):
    terms = [t for t in re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    con = duckdb.connect()
    con.register("documents", tab)
    joins, conds = [], [f"t0.term = '{terms[0]}'"]
    for i in range(1, len(terms)):
        joins.append(
            f"JOIN tok t{i} ON t{i}.doc_id = t0.doc_id "
            f"AND t{i}.pos = t0.pos + {i}"
        )
        conds.append(f"t{i}.term = '{terms[i]}'")
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
        SELECT t0.doc_id AS docid, count(*)::BIGINT AS n_occurrences
        FROM tok t0 {' '.join(joins)}
        WHERE {' AND '.join(conds)}
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT {k}
    """
    return [tuple(r) for r in con.execute(sql).fetchall()]


def _rows(t: pa.Table):
    return list(zip(t["docid"].to_pylist(), t["n_occurrences"].to_pylist()))


DOCS = [
    "the cat sat on the mat the cat sat again",
    "cat sat cat sat cat sat",
    "the the the the",
    "a lone cat",
    "",
    "sat the cat",
]


@pytest.fixture()
def sidecar(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_arrow(_table(DOCS)).repartition(3)
    out = str(tmp_path / "posidx")
    build_position_index(ds, out, num_shards=4)
    return out


@pytest.mark.parametrize(
    "phrase",
    ["cat sat", "the cat sat", "the the", "the the the", "cat", "dog house"],
)
def test_three_way_differential(ray_session, sidecar, phrase):
    import ray.data

    want = _brute_topk(DOCS, phrase, 10)
    assert _duck_topk(_table(DOCS), phrase, 10) == want
    got_idx = _rows(phrase_search(sidecar, phrase, k=10))
    ds = ray.data.from_arrow(_table(DOCS)).repartition(3)
    got_scan = _rows(phrase_count_scan(ds, phrase, k=10))
    assert got_idx == want
    assert got_scan == want


def test_overlapping_occurrences_counted(ray_session, sidecar):
    # "the the the the" contains 3 (overlapping) "the the" occurrences —
    # the positions-join convention
    got = dict(_rows(phrase_search(sidecar, "the the", k=10)))
    assert got[2] == 3


def test_topk_cut_and_tie_order(ray_session, sidecar):
    got = _rows(phrase_search(sidecar, "cat sat", k=1))
    assert got == [(1, 3)]  # doc 1 has 3, doc 0 has 2


def test_empty_phrase_raises(ray_session, sidecar):
    with pytest.raises(ValueError):
        phrase_search(sidecar, "  !!  ")


def test_fuzz_random_corpora(ray_session, tmp_path):
    import ray.data

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    for case in range(6):
        docs = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            for _ in range(rng.randint(1, 40))
        ]
        tab = _table(docs)
        ds = ray.data.from_arrow(tab).repartition(4)
        out = str(tmp_path / f"px{case}")
        build_position_index(ds, out, num_shards=8)
        for _ in range(4):
            phrase = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 3))
            )
            want = _brute_topk(docs, phrase, 10)
            assert _rows(phrase_search(out, phrase, k=10)) == want, (
                case, phrase)
            assert _rows(phrase_count_scan(ds, phrase, k=10)) == want, (
                case, phrase)


def test_postings_decode_sorted_and_complete(ray_session, tmp_path):
    """Decoded positional postings reconstruct the corpus exactly: every
    (term, doc) once, docids ascending per term, positions ascending per
    doc, and per-doc position totals equal the doc's token count."""
    import ray.data

    from tangent_ray.index.positions import PositionsReader

    ds = ray.data.from_arrow(_table(DOCS)).repartition(2)
    out = str(tmp_path / "px_chk")
    build_position_index(ds, out, num_shards=4)
    reader = PositionsReader(out)
    per_doc_total: dict[int, int] = {}
    seen_pairs = set()
    for term in reader.lookup:
        docids, counts, flat = reader.term_postings(term)
        d64 = docids.astype("int64")
        assert (d64[1:] > d64[:-1]).all(), term  # ascending, unique
        off = 0
        for d, c in zip(d64.tolist(), counts.tolist()):
            assert (term, d) not in seen_pairs
            seen_pairs.add((term, d))
            plist = flat[off : off + c].tolist()
            assert plist == sorted(set(plist)), (term, d)
            per_doc_total[d] = per_doc_total.get(d, 0) + c
            off += c
    for doc_id, text in enumerate(DOCS):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if toks:
            assert per_doc_total[doc_id] == len(toks)


def test_search_after_pagination(ray_session, sidecar):
    """Phrase-family search_after cursors page the exact total order —
    k-row pages concatenate to the one-shot full ranking (ES search_after
    semantics, mirroring the BM25 path's cursor rule)."""
    from tangent_ray.index.positions import (
        proximity_search,
        span_near_search,
    )

    full = phrase_search(sidecar, "the", k=10_000)
    assert full.num_rows >= 3
    pages, cur = [], None
    while True:
        pg = phrase_search(sidecar, "the", k=2, search_after=cur)
        if not pg.num_rows:
            break
        pages.append(pg)
        cur = (pg["n_occurrences"][-1].as_py(), pg["docid"][-1].as_py())
    assert pa.concat_tables(pages).equals(full)

    full = span_near_search(sidecar, "the cat", slop=3, k=10_000)
    pages, cur = [], None
    while True:
        pg = span_near_search(sidecar, "the cat", slop=3, k=1,
                              search_after=cur)
        if not pg.num_rows:
            break
        pages.append(pg)
        cur = (pg["min_span"][-1].as_py(), pg["docid"][-1].as_py())
    assert pa.concat_tables(pages).equals(full)

    full = proximity_search(sidecar, "cat sat", window=5, k=10_000)
    pages, cur = [], None
    while True:
        pg = proximity_search(sidecar, "cat sat", window=5, k=1,
                              search_after=cur)
        if not pg.num_rows:
            break
        pages.append(pg)
        cur = (pg["min_span"][-1].as_py(), pg["docid"][-1].as_py())
    assert pa.concat_tables(pages).equals(full)
