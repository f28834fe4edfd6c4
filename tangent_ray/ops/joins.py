"""Distributed joins as first-class operators: generic hash equi-join
(broadcast and shard-shuffle paths), keyed as-of join, and interval range
join — each a composition of at most ONE hash-shard shuffle plus a
fully-vectorized in-shard pass (the custom-operator pattern this repo uses
for sessionization).

Partitioning assumptions (documented per the custom-operator contract):
- ``broadcast_join`` materializes the RIGHT side (``ray.put`` once, read
  once per actor) — dimension tables only; the left side streams and never
  shuffles.
- ``hash_join`` co-locates all rows of a key on one shard via fixed
  key-hash shards; one shard's rows (both sides) must fit a worker's heap
  — raise ``shards`` for bigger inputs, and pre-aggregate or salt if one
  key dominates. The in-shard probe is Arrow's Acero hash join (C++), so
  SQL semantics (null keys never match, duplicate keys multiply) hold by
  construction.
- ``asof_join`` co-locates all rows of a key on one shard (like
  `ops.streaming.sessionize`); a single key's history must fit one
  worker's heap.
- ``range_count`` replicates each interval to every time bucket it covers
  and co-shuffles points by bucket; replication factor is
  ``interval_len / bucket_us + 1``, so pick ``bucket_us`` near the typical
  interval length.

All have exact DuckDB twins (`JOIN` / `ASOF JOIN` / `BETWEEN` join) in
``pipelines/entry_queries.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.util import DEFAULT_SHARDS, shard_column


def _ts_i8(col, what: str) -> np.ndarray:
    """Timestamp column -> int64 microseconds, REJECTING nulls: a NaT
    converts to INT64_MIN, which would make a null-ts right row the
    'earliest' event of its key in ``asof_join`` (emitted as a valid match
    with wrapped ``lag_us``) and give ``range_count`` an astronomical
    replication factor. Same contract as ``ops.streaming._ts_us_strict``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(f"{what}: null timestamps unsupported (filter first)")
    a = col.to_numpy(zero_copy_only=False)
    return a.astype("datetime64[us]").astype(np.int64)


_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "semi": "left semi",
    "anti": "left anti",
    "outer": "full outer",
}


def _right_renames(left_names, right_names, on, suffix: str) -> dict[str, str]:
    """Rename map for right non-key columns that collide with left names."""
    ren = {}
    for name in right_names:
        if name in on:
            continue
        if name in left_names:
            new = name + suffix
            if new in left_names or new in right_names:
                raise ValueError(f"join: cannot disambiguate column {name!r}")
            ren[name] = new
    return ren


def _check_key_types(l_types, r_types, on) -> None:
    for k in on:
        if l_types[k] != r_types[k]:
            raise ValueError(
                f"join: key {k!r} types differ ({l_types[k]} vs {r_types[k]})"
            )


class _BroadcastJoin:
    """Actor stage: per-batch Acero hash join against a broadcast table."""

    def __init__(self, right_ref, on, join_type: str):
        import ray

        self.right = (
            ray.get(right_ref) if not isinstance(right_ref, pa.Table) else right_ref
        )
        self.on, self.join_type = list(on), join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.right, keys=self.on, join_type=self.join_type)


def broadcast_join(left_ds, right, on, how: str = "inner", suffix: str = "_r"):
    """Equi-join a streaming left side against a DIMENSION-sized right side.

    ``right`` is a ``pa.Table`` or a (small) Dataset that is materialized
    here, ``ray.put`` once, deserialized once per actor, and probed per
    batch with Arrow's C++ hash join — the left side never shuffles, which
    is the correct plan whenever the right side fits a worker's heap.
    ``how`` is ``inner``, ``left``, ``semi`` or ``anti`` (NOT ``outer``:
    the right table is probed once per batch, so unmatched right rows
    would be emitted once per batch — use ``hash_join`` for full outer).
    """
    import ray

    from tangent_ray.util import actor_pool

    if how == "outer":
        raise ValueError("broadcast_join: use hash_join for how='outer'")
    join_type = _JOIN_TYPES[how]
    if not isinstance(right, pa.Table):
        # A Dataset can contain zero-row blocks whose Arrow schema has NO
        # columns (Ray emits them when a read splits finer than the data);
        # concat_tables rejects the schema mismatch. Drop empty blocks and
        # cast survivors to the Dataset schema; an all-empty right side
        # becomes a typed empty table.
        rs = right.schema()
        pa_schema = pa.schema(list(zip(rs.names, rs.types)))
        tabs = [t for t in ray.get(right.to_arrow_refs()) if t.num_rows]
        right = (
            pa.concat_tables([t.select(pa_schema.names).cast(pa_schema) for t in tabs])
            if tabs
            else pa_schema.empty_table()
        )
    on = [on] if isinstance(on, str) else list(on)
    ls = left_ds.schema()
    _check_key_types(
        dict(zip(ls.names, ls.types)),
        {f.name: f.type for f in right.schema}, on,
    )
    ren = _right_renames(set(ls.names) - set(on), right.schema.names, on, suffix)
    if ren:
        right = right.rename_columns([ren.get(n, n) for n in right.schema.names])
    ref = ray.put(right)
    return left_ds.map_batches(
        _BroadcastJoin,
        fn_constructor_args=(ref, on, join_type),
        batch_format="pyarrow",
        concurrency=actor_pool(),
    )


def hash_join(left_ds, right_ds, on, how: str = "inner",
              shards: int = DEFAULT_SHARDS, suffix: str = "_r"):
    """Generic distributed equi-join: ONE key-hash shuffle, Acero in-shard.

    Both sides are padded to a common (union) schema with a side tag,
    unioned, hash-sharded on the key columns so every row of a key lands on
    one shard, and each shard runs a single C++ hash join over its two
    sides. ``how`` is ``inner``, ``left``, ``outer`` (full), ``semi`` or
    ``anti`` (semi/anti emit LEFT columns only); right non-key columns
    that collide with left names get ``suffix``. Key columns must have
    equal types on both sides (cast upstream — this operator does not
    coerce). Per-shard joins compose correctly for every mode because the
    key-hash co-location is total: a key's rows from BOTH sides land on
    exactly one shard.
    """
    join_type = _JOIN_TYPES[how]
    on = [on] if isinstance(on, str) else list(on)
    ls, rs = left_ds.schema(), right_ds.schema()
    l_types = dict(zip(ls.names, ls.types))
    r_types = dict(zip(rs.names, rs.types))
    _check_key_types(l_types, r_types, on)
    _SIDE, _SHARD = "__side", "__shard"
    for internal in (_SIDE, _SHARD):
        if internal in ls.names or internal in rs.names:
            raise ValueError(f"join: column name {internal!r} is reserved")
    ren = _right_renames(set(ls.names) - set(on), rs.names, on, suffix)
    l_extra = [n for n in ls.names if n not in on]
    r_extra = [ren.get(n, n) for n in rs.names if n not in on]
    union_fields = (
        [(k, l_types[k]) for k in on]
        + [(n, l_types[n]) for n in l_extra]
        + [(ren.get(n, n), r_types[n]) for n in rs.names if n not in on]
        + [(_SIDE, pa.int8())]
    )
    union_schema = pa.schema(union_fields)
    out_names = on + l_extra if how in ("semi", "anti") else on + l_extra + r_extra

    def pad(side: int, rename: dict[str, str]):
        def f(batch: pa.Table) -> pa.Table:
            cols = {rename.get(n, n): batch[n] for n in batch.schema.names}
            n_rows = batch.num_rows
            arrays = [
                cols[f.name] if f.name in cols
                else pa.nulls(n_rows, type=f.type)
                for f in union_schema
                if f.name != _SIDE
            ]
            arrays.append(
                pa.array(np.full(n_rows, side, dtype=np.int8), type=pa.int8())
            )
            return shard_column(
                pa.table(dict(zip([f.name for f in union_schema], arrays))),
                on, shards, name=_SHARD,
            )

        return f

    both = left_ds.map_batches(pad(0, {}), batch_format="pyarrow").union(
        right_ds.map_batches(pad(1, ren), batch_format="pyarrow")
    )

    empty_out = pa.table(
        {n: pa.nulls(0, type=dict(union_fields)[n]) for n in out_names}
    )

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty_out
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        is_l = side == 0
        left = pa.table(
            {n: g[n].filter(pa.array(is_l)) for n in on + l_extra}
        )
        right = pa.table(
            {n: g[n].filter(pa.array(~is_l)) for n in on + r_extra}
        )
        if left.num_rows == 0 and how != "outer":
            return empty_out
        if right.num_rows == 0 and how in ("inner", "semi"):
            return empty_out
        # anti/left/outer handle an empty side in Acero directly (anti with
        # empty right returns all lefts; left/outer emit null right cols)
        return left.join(right, keys=on, join_type=join_type).select(out_names)

    return both.groupby(_SHARD).map_groups(per_shard, batch_format="pyarrow")


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
    Integer key/id columns only (validated upfront; the generic
    ``hash_join`` handles string keys).
    """
    for ds_, what in ((left_ds, "left"), (right_ds, "right")):
        s = ds_.schema()
        types = dict(zip(s.names, s.types))
        for c in (key_col, id_col):
            if not pa.types.is_integer(types[c]):
                raise ValueError(
                    f"asof_join: {what} {c!r} must be integer, got {types[c]}"
                )
    # tag() projects the roles onto internal names ts/id/side (+shard): a
    # key or id column NAMED like one of them would silently collapse in
    # the dict literal
    if key_col in ("ts", "id", "side", "shard") or id_col in ("ts", "side", "shard"):
        raise ValueError("asof_join: key/id column collides with an internal name")

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
        ts = _ts_i8(g["ts"], "asof_join")
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
        lo = _ts_i8(batch[lo_col], "range_count")
        hi = _ts_i8(batch[hi_col], "range_count")
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
        n_rep = len(bucket)
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.int64()),
                "lo_c": pa.array(lo_c, type=pa.int64()),
                "hi_c": pa.array(hi_c, type=pa.int64()),
                "pid": pa.array(np.zeros(n_rep, dtype=np.int64), type=pa.int64()),
                "t": pa.array(np.zeros(n_rep, dtype=np.int64), type=pa.int64()),
                # explicit side flag — a pid sentinel (-1) silently dropped
                # points whose real id was negative
                "pt": pa.array(np.zeros(n_rep, dtype=np.int8), type=pa.int8()),
            }
        )

    def tag_points(batch: pa.Table) -> pa.Table:
        t = _ts_i8(batch[ts_col], "range_count")
        n = len(t)
        return pa.table(
            {
                "bucket": pa.array(t // bucket_us, type=pa.int64()),
                "lo_c": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
                "hi_c": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
                "pid": batch[id_col],
                "t": pa.array(t, type=pa.int64()),
                "pt": pa.array(np.ones(n, dtype=np.int8), type=pa.int8()),
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
        is_pt = g["pt"].to_numpy(zero_copy_only=False) == 1
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
