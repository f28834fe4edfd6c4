"""Deterministic fixed-size uniform sample (ops/curation.uniform_sample):
exact DuckDB twin, min-wise stability under corpus growth, and block-split
independence."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tangent_ray.ops.curation import SAMPLE_KEY_HEX, uniform_sample

SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(concat('0x', substr(md5('u:' || doc_id::VARCHAR), 1,
                                {SAMPLE_KEY_HEX})) AS BIGINT) AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT {{k}}
"""


def _twin(tbl, k):
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(SAMPLE_SQL.format(k=k)).arrow()


def _run(ds_in, k):
    out = uniform_sample(ds_in, k)
    t = pa.table(
        {
            "doc_id": pa.array(
                [r["doc_id"] for r in out.take_all()], type=pa.int64()
            ),
        }
    )
    return t


def test_uniform_sample_matches_duckdb_twin(ray_session):
    import ray
    import ray.data

    path = "/root/testdata/sf0.001/documents.parquet"
    tbl = pq.read_table(path, columns=["doc_id"])
    for k in (1, 17, 100):
        got = _run(ray.data.read_parquet(path, columns=["doc_id"]), k)
        want = _twin(tbl, k)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist(), k


def test_uniform_sample_minwise_stability_and_splits(ray_session):
    import ray
    import ray.data

    ids = np.arange(0, 5000, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    k = 50
    one_block = _run(ray.data.from_arrow(tbl), k)["doc_id"].to_pylist()
    many = ray.data.from_arrow(tbl).repartition(13)
    split = _run(many, k)["doc_id"].to_pylist()
    assert one_block == split  # block layout never changes the sample
    # growth: adding docs only ever replaces members with better keys —
    # the old sample contains the new one's survivors
    bigger = pa.table(
        {"doc_id": pa.array(np.arange(0, 9000, dtype=np.int64))}
    )
    grown = _run(ray.data.from_arrow(bigger), k)["doc_id"].to_pylist()
    assert set(grown) & set(one_block) == set(grown) - set(range(5000, 9000))
    # and the survivors keep their relative order
    survivors = [d for d in grown if d < 5000]
    assert survivors == [d for d in one_block if d in set(survivors)]
