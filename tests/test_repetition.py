"""Repetition signals (ops/textstats.repetition_stats): hand-computed
fixtures + an exact DuckDB twin over the real driver corpus sample.

The twin is the correctness definition: every fraction is reproduced
bit-for-bit by SQL over the same table (shared tokenizer definition,
shared round-to-6), the same convention as the driver's oracle gate.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.ops.textstats import repetition_batch, repetition_stats

REPETITION_SQL = """
WITH l0 AS (
  SELECT doc_id, u.line
  FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM documents) d,
       LATERAL (SELECT unnest(ls) AS line) u
  WHERE u.line <> ''
),
lg AS (
  SELECT doc_id, line, count(*) AS c, length(line) AS len
  FROM l0 GROUP BY doc_id, line
),
ls AS (
  SELECT doc_id,
         sum(c) AS n_lines,
         sum(c * len) AS line_chars,
         sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_lines,
         sum(CASE WHEN c >= 2 THEN c * len ELSE 0 END) AS dup_line_chars
  FROM lg GROUP BY doc_id
),
tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'), x -> x <> '') AS ts
  FROM documents
),
tc AS (SELECT doc_id, len(ts) AS n_tokens FROM tk),
g2 AS (
  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g, count(*) AS c
  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) gi
  GROUP BY doc_id, g
),
g2s AS (SELECT doc_id, max(c) AS top2 FROM g2 GROUP BY doc_id),
g3 AS (
  SELECT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS g,
         count(*) AS c
  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) gi
  GROUP BY doc_id, g
),
g3s AS (
  SELECT doc_id, max(c) AS top3,
         sum(CASE WHEN c >= 2 THEN 3 * c ELSE 0 END) AS dup3
  FROM g3 GROUP BY doc_id
)
SELECT tc.doc_id,
       coalesce(ls.n_lines, 0)::BIGINT AS n_lines,
       tc.n_tokens::BIGINT AS n_tokens,
       round(coalesce(ls.dup_lines / nullif(ls.n_lines, 0), 0), 6)
           AS dup_line_frac,
       round(coalesce(ls.dup_line_chars / nullif(ls.line_chars, 0), 0), 6)
           AS dup_line_char_frac,
       round(coalesce(least(coalesce(2 * g2s.top2, 0), tc.n_tokens)
                      / nullif(tc.n_tokens, 0), 0), 6) AS top2gram_frac,
       round(coalesce(least(coalesce(3 * g3s.top3, 0), tc.n_tokens)
                      / nullif(tc.n_tokens, 0), 0), 6) AS top3gram_frac,
       round(coalesce(least(coalesce(g3s.dup3, 0), tc.n_tokens)
                      / nullif(tc.n_tokens, 0), 0), 6) AS dup3gram_frac
FROM tc
LEFT JOIN ls USING (doc_id)
LEFT JOIN g2s USING (doc_id)
LEFT JOIN g3s USING (doc_id)
ORDER BY tc.doc_id
"""

COLS = ["doc_id", "n_lines", "n_tokens", "dup_line_frac",
        "dup_line_char_frac", "top2gram_frac", "top3gram_frac",
        "dup3gram_frac"]


def _doc_table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def _twin(tbl: pa.Table) -> pa.Table:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(REPETITION_SQL).arrow()


def test_repetition_hand_computed():
    b = _doc_table([
        "aa bb\naa bb\ncc",          # 2 of 3 lines duplicated
        "x y x y x y",               # top 2-gram "x y" occurs 3x of 5 grams
        "one two three four",        # no repetition at all
        "",                          # empty doc
    ])
    out = repetition_batch(b)
    r = {c: out[c].to_pylist() for c in out.column_names}
    assert r["n_lines"] == [3, 1, 1, 0]
    assert r["n_tokens"] == [5, 6, 4, 0]
    # doc0: lines 'aa bb' x2 + 'cc' -> 2/3 dup lines; chars (5+5)/(5+5+2)
    assert r["dup_line_frac"][0] == pytest.approx(round(2 / 3, 6))
    assert r["dup_line_char_frac"][0] == pytest.approx(round(10 / 12, 6))
    # doc1: "x y" 2-gram occurs 3x -> 2*3/6 = 1.0
    assert r["top2gram_frac"][1] == 1.0
    # doc1 3-grams: (x y x) x2, (y x y) x2 -> top3 = 2 -> 6/6; dup3 = 12 capped
    assert r["top3gram_frac"][1] == 1.0
    assert r["dup3gram_frac"][1] == 1.0
    # doc2: all fractions 0 except top-n-gram of an all-distinct doc
    assert r["dup_line_frac"][2] == 0.0
    assert r["top2gram_frac"][2] == pytest.approx(round(2 / 4, 6))
    assert r["dup3gram_frac"][2] == 0.0
    # doc3 (empty): everything 0
    assert all(r[c][3] == 0 for c in COLS[1:])


def test_repetition_matches_duckdb_twin_fixtures():
    b = _doc_table([
        "the cat\nthe cat\nthe cat\nsat",
        "a b c a b c a b c d",
        "line one\nline two\nline one\n\n\nline two",
        "Mixed CASE tokens mixed case TOKENS",
        "x x x x",  # top 2-gram (x,x) occurs 3x of 4 tokens: capped at 1.0
        "",
        "solo",
    ])
    want = _twin(b)
    got = repetition_batch(b).select(COLS)
    assert got.to_pydict() == want.select(COLS).to_pydict()


def test_repetition_matches_duckdb_twin_real_corpus(ray_session):
    """Dataset surface over the REAL sf0.001 documents table vs the twin."""
    import ray

    path = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    got = (
        repetition_stats(ds)
        .to_arrow_refs()
    )
    got = pa.concat_tables([t for t in ray.get(got) if t.num_rows])
    got = got.sort_by("doc_id").select(COLS)
    want = _twin(pq.read_table(path, columns=["doc_id", "text"])).select(COLS)
    assert got.num_rows == want.num_rows
    for c in COLS:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        assert np.array_equal(g, w), f"column {c} diverges"
