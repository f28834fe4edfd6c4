"""Source-mix resampling (ops/curation.source_mix_resample): multiplier
math unit tests + an exact DuckDB twin over fixtures and the real corpus.

The twin shares the multiplier definition (`mix_multipliers` is called on
DuckDB-computed totals) and replays the epoch expansion + fractional-epoch
md5 Bernoulli in SQL, the same convention as the stratified-sample twin.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.ops.curation import (
    SAMPLE_BUCKETS,
    mix_multipliers,
    sample_threshold,
    source_mix_resample,
)

COLS = ["doc_id", "source", "epoch", "n_tok"]

TOK_SQL = """
  SELECT doc_id, source,
         len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                            '[^a-z0-9]+'),
                         x -> x <> ''))::BIGINT AS n_tok
  FROM documents
"""


def _twin(tbl: pa.Table, weights, total_tokens=None, max_epochs=10.0):
    con = duckdb.connect()
    con.register("documents", tbl)
    totals = {
        s: int(t)
        for s, t in con.execute(
            f"SELECT source, sum(n_tok) FROM ({TOK_SQL}) GROUP BY source"
        ).fetchall()
    }
    mult = mix_multipliers(totals, weights, total_tokens, max_epochs)
    k = {s: int(np.floor(m)) for s, m in mult.items()}
    thr = {s: sample_threshold(m - k[s]) for s, m in mult.items()}
    k_cases = " ".join(f"WHEN '{s}' THEN {v}" for s, v in sorted(k.items()))
    t_cases = " ".join(f"WHEN '{s}' THEN {v}" for s, v in sorted(thr.items()))
    kmax = max(k.values(), default=0)
    sql = f"""
    WITH dl AS ({TOK_SQL}),
    ks AS (
      SELECT *, CASE source {k_cases} ELSE 0 END AS k,
                CASE source {t_cases} ELSE 0 END AS thr
      FROM dl
    ),
    e AS (
      SELECT *, unnest(generate_series(0, {kmax})) AS epoch FROM ks
    )
    SELECT doc_id, source, epoch::BIGINT AS epoch, n_tok
    FROM e
    WHERE epoch < k
       OR (epoch = k AND thr > 0
           AND CAST(concat('0x', substr(md5('e' || k::VARCHAR || ':'
                                            || doc_id::VARCHAR), 1, 8))
                    AS BIGINT) % {SAMPLE_BUCKETS} < thr)
    ORDER BY doc_id, epoch
    """
    return con.execute(sql).arrow().select(COLS)


def _run(tbl: pa.Table, weights, **kw) -> pa.Table:
    import ray
    import ray.data

    ds = ray.data.from_arrow(tbl)
    refs = source_mix_resample(ds, weights, **kw).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    if not tabs:
        return pa.table({c: [] for c in COLS})
    got = pa.concat_tables([t.select(COLS) for t in tabs])
    order = np.lexsort(
        (
            got["epoch"].to_numpy(zero_copy_only=False),
            got["doc_id"].to_numpy(zero_copy_only=False),
        )
    )
    return got.take(pa.array(order))


def test_mix_multipliers_math():
    totals = {"web": 900, "code": 100}
    # equal target halves at constant size: web 500/900, code 500/100
    m = mix_multipliers(totals, {"web": 1.0, "code": 1.0})
    assert m["web"] == pytest.approx(500 / 900)
    assert m["code"] == pytest.approx(5.0)
    # explicit budget scales linearly
    m2 = mix_multipliers(totals, {"web": 1.0, "code": 1.0}, total_tokens=2000)
    assert m2["code"] == pytest.approx(10.0)
    # cap binds
    m3 = mix_multipliers(totals, {"web": 1.0, "code": 1.0}, max_epochs=3.0)
    assert m3["code"] == 3.0
    # absent source is dropped; zero-token source never divides by zero
    m4 = mix_multipliers({"web": 900, "empty": 0}, {"web": 1.0})
    assert m4["empty"] == 0.0
    with pytest.raises(ValueError):
        mix_multipliers(totals, {})


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "source": pa.array([r[1] for r in rows], type=pa.string()),
            "text": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )


def test_resample_upsamples_and_downsamples(ray_session):
    # source a: 10 docs x 8 tokens; source b: 2 docs x 4 tokens
    rows = [(i, "a", "t " * 8) for i in range(10)]
    rows += [(100 + i, "b", "u " * 4) for i in range(2)]
    tbl = _docs(rows)
    got = _run(tbl, {"a": 1.0, "b": 1.0})
    src = np.array(got["source"].to_pylist())
    n_tok = got["n_tok"].to_numpy()
    # b is upsampled ~5.5x (44 target / 8 actual), a downsampled ~0.55x:
    # realized token shares should straddle the 50/50 target
    tok_a = int(n_tok[src == "a"].sum())
    tok_b = int(n_tok[src == "b"].sum())
    assert tok_b >= 4 * 2 * 5  # at least 5 full epochs of b
    assert tok_a < 80  # strictly fewer than one full epoch of a
    # epochs are dense 0..max per kept doc
    for d in set(got["doc_id"].to_pylist()):
        eps = [e for i, e in zip(got["doc_id"].to_pylist(),
                                 got["epoch"].to_pylist()) if i == d]
        assert eps == list(range(len(eps)))


def test_resample_matches_duckdb_twin_fixtures(ray_session):
    rows = [(i, "web", f"w{i} " * (5 + i % 7)) for i in range(40)]
    rows += [(200 + i, "code", f"c{i} x y" * (1 + i % 3)) for i in range(9)]
    rows += [(300, "junk", "z z z"), (301, "empty", "")]
    tbl = _docs(rows)
    weights = {"web": 1.0, "code": 2.0, "junk": 0.0}
    got = _run(tbl, weights, max_epochs=6.0)
    want = _twin(tbl, weights, max_epochs=6.0)
    assert got.to_pydict() == want.to_pydict()


def test_resample_matches_duckdb_twin_real_corpus(ray_session):
    import ray
    import ray.data

    path = "/root/testdata/sf0.001/documents.parquet"
    tbl = pq.read_table(path, columns=["doc_id", "source", "text"])
    weights = {s: 1.0 for s in set(tbl["source"].to_pylist())}
    # drop one real source entirely, upweight another
    drop = sorted(weights)[0]
    boost = sorted(weights)[-1]
    weights[drop] = 0.0
    weights[boost] = 4.0
    ds = ray.data.read_parquet(path, columns=["doc_id", "source", "text"])
    refs = source_mix_resample(ds, weights, max_epochs=8.0).to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t.num_rows]
    got = pa.concat_tables([t.select(COLS) for t in tabs])
    order = np.lexsort(
        (
            got["epoch"].to_numpy(zero_copy_only=False),
            got["doc_id"].to_numpy(zero_copy_only=False),
        )
    )
    got = got.take(pa.array(order))
    want = _twin(tbl, weights, max_epochs=8.0)
    assert got.num_rows == want.num_rows
    assert got.to_pydict() == want.to_pydict()
    assert drop not in set(got["source"].to_pylist())
