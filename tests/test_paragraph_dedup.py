"""Paragraph-level cross-document dedup (ops/dedup.paragraph_dedup):
hand-computed fixtures + an exact DuckDB twin over the real corpus sample.

The twin defines correctness: a paragraph (blank-line split) is kept only
at its minimum (doc_id, para_idx) occurrence across the whole input, which
SQL expresses as row_number() over (PARTITION BY paragraph text).
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tangent_ray.ops.dedup import paragraph_dedup, paragraph_hash_batch

PARAGRAPH_DEDUP_SQL = """
WITH p0 AS (
  SELECT doc_id, ps[i] AS para, i AS para_idx
  FROM (SELECT doc_id,
               string_split(coalesce(text, ''), chr(10) || chr(10)) AS ps
        FROM documents) d,
       LATERAL (SELECT unnest(generate_series(1, len(ps))) AS i) gi
  WHERE ps[i] <> ''
)
SELECT doc_id, para_idx,
       (row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx) = 1)
           AS keep
FROM p0
ORDER BY doc_id, para_idx
"""

COLS = ["doc_id", "para_idx", "keep"]


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def _twin(tbl: pa.Table) -> pa.Table:
    con = duckdb.connect()
    con.register("documents", tbl)
    out = con.execute(PARAGRAPH_DEDUP_SQL).arrow()
    return out.set_column(1, "para_idx", out["para_idx"].cast(pa.int64()))


def _run(tbl: pa.Table, **kw) -> pa.Table:
    import ray
    import ray.data

    ds = ray.data.from_arrow(tbl)
    refs = paragraph_dedup(ds, **kw).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    got = pa.concat_tables([t.select(COLS) for t in tabs])
    order = np.lexsort(
        (
            got["para_idx"].to_numpy(zero_copy_only=False),
            got["doc_id"].to_numpy(zero_copy_only=False),
        )
    )
    return got.take(pa.array(order))


def test_paragraph_hash_batch_explode_and_index():
    b = _docs(
        [
            "alpha\n\nbeta\n\n\n\ngamma",  # empty 3rd split: idx 1,2,4
            "",  # no paragraphs
            "solo",
        ]
    )
    out = paragraph_hash_batch(b)
    assert out["doc_id"].to_pylist() == [0, 0, 0, 2]
    assert out["para_idx"].to_pylist() == [1, 2, 4, 1]
    # identical text -> identical 128-bit key, distinct text -> distinct
    b2 = _docs(["beta", "Beta"])
    o2 = paragraph_hash_batch(b2)
    alpha_beta = out.filter(pa.compute.equal(out["para_idx"], 2))
    assert o2["phash"][0] == alpha_beta["phash"][0]
    assert o2["phash2"][0] == alpha_beta["phash2"][0]
    assert o2["phash"][0] != o2["phash"][1]


def test_paragraph_dedup_hand_computed(ray_session):
    texts = [
        "intro\n\nshared boilerplate\n\nbody zero",
        "shared boilerplate\n\nbody one",
        "body one\n\nshared boilerplate",
        "",
    ]
    got = _run(_docs(texts))
    rows = {
        (d, i): k
        for d, i, k in zip(
            got["doc_id"].to_pylist(),
            got["para_idx"].to_pylist(),
            got["keep"].to_pylist(),
        )
    }
    # doc0 owns everything it contains
    assert rows[(0, 1)] and rows[(0, 2)] and rows[(0, 3)]
    # doc1: boilerplate already seen in doc0; "body one" is new here
    assert not rows[(1, 1)]
    assert rows[(1, 2)]
    # doc2: both paragraphs are repeats
    assert not rows[(2, 1)] and not rows[(2, 2)]
    assert len(rows) == 7


def test_paragraph_dedup_matches_duckdb_twin(ray_session):
    texts = [
        "a\n\nb\n\nc",
        "b\n\na",
        "c\n\nc\n\nc",  # in-doc repeats: only the first kept
        "\n\n\n\nd",  # leading empties shift para_idx
        "d",
    ]
    tbl = _docs(texts)
    got = _run(tbl, shards=7)
    want = _twin(tbl)
    assert got.to_pydict() == want.select(COLS).to_pydict()


def test_paragraph_dedup_matches_duckdb_twin_real_corpus(ray_session):
    import ray
    import ray.data

    path = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    refs = paragraph_dedup(ds).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    got = pa.concat_tables([t.select(COLS) for t in tabs])
    order = np.lexsort(
        (
            got["para_idx"].to_numpy(zero_copy_only=False),
            got["doc_id"].to_numpy(zero_copy_only=False),
        )
    )
    got = got.take(pa.array(order))
    want = _twin(pq.read_table(path, columns=["doc_id", "text"]))
    assert got.num_rows == want.num_rows
    for c in COLS:
        assert got[c].to_pylist() == want[c].to_pylist(), f"column {c}"
