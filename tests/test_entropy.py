"""Per-doc unigram token entropy (ops/textstats.token_entropy): hand
values + exact DuckDB twin over fixtures, fuzz corpora, and the real
corpus sample."""

import duckdb
import math
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.ops.textstats import token_entropy, token_entropy_batch

ENTROPY_SQL = """
WITH tk AS (
  SELECT doc_id, u.t
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(coalesce(text, '')),
                                              '[^a-z0-9]+'),
                           x -> x <> '') AS ts
        FROM documents) d,
       LATERAL (SELECT unnest(ts) AS t) u
),
c AS (SELECT doc_id, t, count(*)::DOUBLE AS c FROM tk GROUP BY doc_id, t),
n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id),
h AS (
  SELECT c.doc_id,
         -sum((c.c / n.n) * log2(c.c / n.n)) AS ent
  FROM c JOIN n USING (doc_id) GROUP BY c.doc_id
)
SELECT d.doc_id,
       coalesce(n.n, 0)::BIGINT AS n_tokens,
       round(coalesce(h.ent, 0), 6) AS token_entropy
FROM documents d
LEFT JOIN n USING (doc_id)
LEFT JOIN h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""

COLS = ["doc_id", "n_tokens", "token_entropy"]


def _twin(tbl):
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(ENTROPY_SQL).arrow().select(COLS)


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_entropy_hand_values():
    out = token_entropy_batch(_docs([
        "a a a a",          # 0 bits
        "a b a b",          # 1 bit
        "a b c d",          # 2 bits
        "",                 # empty -> 0
        "x x y",            # H(1/3, 2/3)
    ]))
    e = out["token_entropy"].to_pylist()
    assert e[0] == 0.0 and e[1] == 1.0 and e[2] == 2.0 and e[3] == 0.0
    want = -(1 / 3) * math.log2(1 / 3) - (2 / 3) * math.log2(2 / 3)
    assert e[4] == pytest.approx(round(want, 6))


def test_entropy_matches_duckdb_twin():
    from tests.test_fuzz_curation import _corpus

    for seed in range(4):
        tbl = _corpus(seed + 400)
        got = token_entropy_batch(tbl).select(COLS)
        want = _twin(tbl)
        g = got["token_entropy"].to_numpy()
        w = want["token_entropy"].to_numpy()
        assert got["n_tokens"].to_pylist() == want["n_tokens"].to_pylist()
        # both round the same float sum; allow 1ulp-at-6-decimals slack for
        # summation-order differences
        assert np.allclose(g, w, atol=1.1e-6), f"seed {seed}"


def test_entropy_real_corpus(ray_session):
    import ray
    import ray.data

    path = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    tabs = [t for t in ray.get(token_entropy(ds).to_arrow_refs())
            if t.num_rows]
    got = pa.concat_tables([t.select(COLS) for t in tabs])
    order = np.argsort(got["doc_id"].to_numpy(zero_copy_only=False))
    got = got.take(pa.array(order))
    want = _twin(pq.read_table(path, columns=["doc_id", "text"]))
    assert got["n_tokens"].to_pylist() == want["n_tokens"].to_pylist()
    assert np.allclose(
        got["token_entropy"].to_numpy(), want["token_entropy"].to_numpy(),
        atol=1.1e-6,
    )
