"""Time-travel joins Ray Data lacks as built-ins: keyed as-of join and
interval range join, both as compositions of ONE hash-shard shuffle plus a
fully-vectorized in-shard pass (the custom-operator pattern this repo uses
for sessionization).

Partitioning assumptions (documented per the custom-operator contract):
- ``asof_join`` co-locates all rows of a key on one shard (fixed key-hash
  shards, like `ops.streaming.sessionize`); a single key's history must fit
  one worker's heap.
- ``range_count`` replicates each interval to every time bucket it covers
  and co-shuffles points by bucket; replication factor is
  ``interval_len / bucket_us + 1``, so pick ``bucket_us`` near the typical
  interval length.

Both have exact DuckDB twins (`ASOF JOIN` / `BETWEEN` join) in
``pipelines/entry_queries.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.util import DEFAULT_SHARDS, shard_column


def _ts_i8(col) -> np.ndarray:
    a = col.to_numpy(zero_copy_only=False)
    return a.astype("datetime64[us]").astype(np.int64)


def asof_join(left_ds, right_ds, key_col: str = "user_id",
              ts_col: str = "ts", id_col: str = "event_id",
              shards: int = DEFAULT_SHARDS):
    """For each left row, the LATEST right row of the same key with
    ``right.ts <= left.ts`` (inclusive; ties on right ts resolved to the
    max right id — mirroring the SQL twin's pre-dedup).

    Shape: side-tag both inputs, union, ONE key-hash shuffle, then one
    lexsort + forward-fill per shard: sort (key, ts, side, id) with rights
    before lefts at equal ts, carry the running maximum right row index
    forward, and null out fills that crossed a key boundary. No per-key
    Python — a shard handles all its keys in one pass.

    Returns (left id, key, left ts, right id?, right ts?, lag_us?).
    """

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_col: batch[key_col],
                    "ts": batch[ts_col],
                    "id": batch[id_col],
                    "side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int8),
                        type=pa.int8(),
                    ),
                }
            )

        return f

    both = (
        left_ds.map_batches(tag(1), batch_format="pyarrow")
        .union(right_ds.map_batches(tag(0), batch_format="pyarrow"))
        .map_batches(
            lambda b: shard_column(b, [key_col], shards),
            batch_format="pyarrow",
        )
    )

    def per_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                key_col: pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "matched_id": pa.array([], type=pa.int64()),
                "matched_ts": pa.array([], type=pa.timestamp("us")),
                "lag_us": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        key = g[key_col].to_numpy(zero_copy_only=False)
        ts = _ts_i8(g["ts"])
        ids = g["id"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, side, ts, key))
        key, ts, ids, side = key[order], ts[order], ids[order], side[order]
        n = len(key)
        ridx = np.where(side == 0, np.arange(n), -1)
        filled = np.maximum.accumulate(ridx)
        is_left = side == 1
        if not is_left.any():
            return empty
        m = filled[is_left]
        lkey, lts, lids = key[is_left], ts[is_left], ids[is_left]
        # a fill that crossed into another key's run is not a match
        valid = (m >= 0) & (key[np.maximum(m, 0)] == lkey)
        mid = np.where(valid, ids[np.maximum(m, 0)], 0)
        mts = np.where(valid, ts[np.maximum(m, 0)], 0)
        vmask = pa.array(valid)
        return pa.table(
            {
                id_col: pa.array(lids.astype(np.int64), type=pa.int64()),
                key_col: pa.array(lkey.astype(np.int64), type=pa.int64()),
                "ts": pa.array(lts.astype("datetime64[us]"), type=pa.timestamp("us")),
                "matched_id": pc.if_else(
                    vmask, pa.array(mid.astype(np.int64)), pa.scalar(None, pa.int64())
                ),
                "matched_ts": pc.if_else(
                    vmask,
                    pa.array(mts.astype("datetime64[us]"), type=pa.timestamp("us")),
                    pa.scalar(None, pa.timestamp("us")),
                ),
                "lag_us": pc.if_else(
                    vmask, pa.array((lts - mts).astype(np.int64)), pa.scalar(None, pa.int64())
                ),
            }
        )

    return both.groupby("shard").map_groups(per_shard, batch_format="pyarrow")


def range_count(points_ds, intervals_ds, ts_col: str = "ts",
                id_col: str = "event_id", lo_col: str = "lo",
                hi_col: str = "hi", bucket_us: int = 3_600_000_000):
    """For each point, the number of intervals with ``lo <= ts <= hi``
    (inclusive), across ALL keys — the scalable interval-containment join.

    Each interval is replicated to every ``bucket_us`` time bucket it
    covers (vectorized repeat), points land in exactly one bucket, and one
    bucket-hash shuffle co-locates them. In-shard the replicas' bounds are
    CLAMPED to their bucket, which makes clamped bounds globally ordered by
    (bucket, bound) — so one sort + two ``searchsorted`` calls answer every
    point in the shard at once, replicas in other buckets cancelling to
    zero. No per-bucket Python.
    """

    def explode(batch: pa.Table) -> pa.Table:
        lo = _ts_i8(batch[lo_col])
        hi = _ts_i8(batch[hi_col])
        b_lo, b_hi = lo // bucket_us, hi // bucket_us
        reps = (b_hi - b_lo + 1).astype(np.int64)
        bucket = np.repeat(b_lo, reps)
        # offset within each interval's run of buckets
        off = np.arange(len(bucket)) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        bucket = bucket + off
        lo_r = np.repeat(lo, reps)
        hi_r = np.repeat(hi, reps)
        # clamp to the bucket -> bounds become globally (bucket, bound)-sorted
        lo_c = np.maximum(lo_r, bucket * bucket_us)
        hi_c = np.minimum(hi_r, (bucket + 1) * bucket_us - 1)
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.int64()),
                "lo_c": pa.array(lo_c, type=pa.int64()),
                "hi_c": pa.array(hi_c, type=pa.int64()),
                "pid": pa.array(np.full(len(bucket), -1), type=pa.int64()),
                "t": pa.array(np.zeros(len(bucket), dtype=np.int64), type=pa.int64()),
            }
        )

    def tag_points(batch: pa.Table) -> pa.Table:
        t = _ts_i8(batch[ts_col])
        n = len(t)
        return pa.table(
            {
                "bucket": pa.array(t // bucket_us, type=pa.int64()),
                "lo_c": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
                "hi_c": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
                "pid": batch[id_col],
                "t": pa.array(t, type=pa.int64()),
            }
        )

    both = (
        intervals_ds.map_batches(explode, batch_format="pyarrow")
        .union(points_ds.map_batches(tag_points, batch_format="pyarrow"))
        .map_batches(
            lambda b: shard_column(b, ["bucket"]), batch_format="pyarrow"
        )
    )

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_active": pa.array([], type=pa.int64()),
                }
            )
        pid = g["pid"].to_numpy(zero_copy_only=False)
        is_pt = pid >= 0
        t = g["t"].to_numpy(zero_copy_only=False)[is_pt]
        # clamped bounds order globally because buckets are disjoint ranges
        los = np.sort(g["lo_c"].to_numpy(zero_copy_only=False)[~is_pt])
        his = np.sort(g["hi_c"].to_numpy(zero_copy_only=False)[~is_pt])
        n_active = (
            np.searchsorted(los, t, side="right")
            - np.searchsorted(his, t, side="left")
        )
        return pa.table(
            {
                id_col: pa.array(pid[is_pt].astype(np.int64), type=pa.int64()),
                "n_active": pa.array(n_active.astype(np.int64), type=pa.int64()),
            }
        )

    return both.groupby("shard").map_groups(per_shard, batch_format="pyarrow")
