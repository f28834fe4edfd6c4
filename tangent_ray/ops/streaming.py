"""Stream-shaped aggregates over the ``events`` table.

Ray Data is a batch engine; the reference's stream semantics (stateful
D/E/T/Q command stream, ``mathindex.cpp:377-403``) map to bounded pipelines.
Tumbling windows are implemented as a *pre-aggregated* groupby: each batch
emits one partial row per (key, window) — the combiner — and the final
groupby sums the tiny partials (SURVEY §2.9; ordering assumption: none, the
window key is derived from the event timestamp, not arrival order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.util import DEFAULT_SHARDS, round_half_away, shard_column


def _ts_us_strict(col, what: str) -> np.ndarray:
    """Timestamp column -> int64 microseconds, REJECTING nulls (a null ts
    would surface as NaT -> int64 min and silently fabricate year-1677
    windows/sessions with wrapped gap arithmetic)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(f"{what}: null timestamps unsupported (filter first)")
    return col.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)


def _window_agg(t: pa.Table, key_col: str) -> pa.Table:
    """The one (key, window) pre-aggregation contract shared by tumbling and
    hopping partials: Arrow sum/count (null values skipped, matching the
    DuckDB twins), names ``n``/``sum_value``."""
    agg = t.group_by([key_col, "window_start"]).aggregate(
        [("v", "sum"), ("v", "count")]
    )
    return pa.table(
        {
            key_col: agg[key_col],
            "window_start": agg["window_start"],
            "n": pc.cast(agg["v_count"], pa.int64()),
            "sum_value": agg["v_sum"],
        }
    )


def tumbling_window_partial(
    batch: pa.Table,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
) -> pa.Table:
    win = pc.floor_temporal(batch[ts_col], unit=unit)
    t = pa.table(
        {
            key_col: batch[key_col],
            "window_start": win,
            "v": batch[value_col],
        }
    )
    return _window_agg(t, key_col)


def _fold_window_partials(partial, key_col: str):
    """Built-in Sum aggregates over the tiny partial rows — (key, window)
    group counts are O(keys x windows), so the fold must not run Python
    per group — then one vectorized rounding map."""
    from ray.data.aggregate import Sum

    agg = partial.groupby([key_col, "window_start"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col],
                "window_start": batch["window_start"],
                "n": pc.cast(batch["n"], pa.int64()),
                "sum_value": pa.array(
                    round_half_away(
                        batch["sum_value"].to_numpy(zero_copy_only=False), 6
                    ),
                    type=pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=65536)


def tumbling_window(ds, key_col="event_type", ts_col="ts", value_col="value", unit="hour"):
    """(key, window_start, n, sum_value) with sum_value rounded to 6."""
    partial = ds.map_batches(
        lambda b: tumbling_window_partial(b, key_col, ts_col, value_col, unit),
        batch_format="pyarrow",
    )
    return _fold_window_partials(partial, key_col)


def hopping_window(ds, key_col="event_type", ts_col="ts", value_col="value",
                   size_hours: int = 2, hop_hours: int = 1):
    """Overlapping (hopping) windows: size ``size_hours`` advancing by
    ``hop_hours`` — each event lands in ``size/hop`` windows.

    Same combiner shape as :func:`tumbling_window`: the per-batch partial
    explodes each event into its windows VECTORIZED (one repeat + offset
    subtraction, no per-event Python), pre-aggregates, and the final
    groupby folds tiny partial rows only. ``size`` must be a multiple of
    ``hop``."""
    assert size_hours % hop_hours == 0
    k = size_hours // hop_hours
    hop_us = hop_hours * 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        base_us = _ts_us_strict(batch[ts_col], "hopping_window")
        n = len(base_us)
        base_us = (base_us // hop_us) * hop_us  # floor to the hop grid
        # window starts: base - j*hop for j in 0..k-1
        starts = (
            np.repeat(base_us, k)
            - np.tile(np.arange(k, dtype=np.int64) * hop_us, n)
        )
        # Arrow take (not a numpy round-trip): key/value keep their exact
        # Arrow types and nulls — an object-array rebuild inferred a
        # null-typed key column on empty batches and poisoned Arrow's
        # null-skipping sum with NaN
        rep = batch.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), k)))
        t = pa.table(
            {
                key_col: rep[key_col],
                "window_start": pa.array(
                    starts.astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "v": rep[value_col],
            }
        )
        return _window_agg(t, key_col)

    part = ds.map_batches(partial, batch_format="pyarrow")
    return _fold_window_partials(part, key_col)


def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30, shards: int = DEFAULT_SHARDS):
    """Gap-based session windows per key: a new session starts whenever the
    gap to the previous event of the same key exceeds ``gap_minutes``.

    One shuffle — but over FIXED hash shards of the key space, not one
    group per key (key groups are O(users), and per-group Python calls
    were measured at ~0.5 ms each): every shard processes ALL of its keys
    in one vectorized pass — lexsort by (key, ts), boundary mask (new key
    OR gap), cumsum session ids, reduceat-style segment extraction. Emits
    one row per session: (key, session_idx, start, end, n_events). The
    partitioning assumption is per-key locality, which the shard hash
    preserves.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def add_shard(batch: pa.Table) -> pa.Table:
        # null keys have no session identity — drop them (the previous
        # pandas-groupby implementation dropped them implicitly)
        batch = batch.filter(pc.is_valid(batch[key_col]))
        return shard_column(batch, [key_col], shards)

    def per_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], type=g[key_col].type),
                "session_idx": pa.array([], type=pa.int64()),
                "session_start": pa.array([], type=pa.timestamp("us")),
                "session_end": pa.array([], type=pa.timestamp("us")),
                "n_events": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        ts = _ts_us_strict(g[ts_col], "sessionize")
        order = np.lexsort((ts, codes))
        u, t = codes[order], ts[order]
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        new = new_user | np.concatenate([[True], (t[1:] - t[:-1]) > gap_us])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(t))
        sid = np.cumsum(new) - 1
        uidx_row = np.cumsum(new_user) - 1
        first_sid_of_user = sid[np.flatnonzero(new_user)]
        sess_uidx = uidx_row[starts]
        session_idx = sid[starts] - first_sid_of_user[sess_uidx]
        return pa.table(
            {
                key_col: pc.take(enc.dictionary, pa.array(u[starts])),
                "session_idx": pa.array(session_idx, type=pa.int64()),
                "session_start": pa.array(
                    t[starts].astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "session_end": pa.array(
                    t[ends - 1].astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "n_events": pa.array(ends - starts, type=pa.int64()),
            }
        )

    sharded = ds.map_batches(add_shard, batch_format="pyarrow")
    return sharded.groupby("shard").map_groups(per_shard, batch_format="pyarrow")


def top_n_per_group(ds, group_col: str, order_col: str, n: int,
                    id_col: str = "event_id", ascending: bool = False,
                    shards: int = DEFAULT_SHARDS):
    """Top-``n`` rows of every group by ``order_col`` — the per-group-top-k
    primitive ("5 best documents per source") as ONE group-hash shard
    shuffle plus a vectorized in-shard rank: each shard lexsorts ALL its
    groups at once by (group, value, id) and keeps rank <= n, no per-group
    Python. Ties break on ``id_col`` ascending, so results are
    deterministic and the ``row_number() OVER (PARTITION BY ... ORDER BY
    ...)`` SQL twin reproduces them exactly. Emits (group, id, value,
    rank). Partitioning assumption: one shard's rows fit a worker's heap
    (raise ``shards`` for bigger inputs)."""

    def add_shard(batch: pa.Table) -> pa.Table:
        return shard_column(
            pa.table(
                {
                    group_col: batch[group_col],
                    id_col: batch[id_col],
                    "v": batch[order_col],
                }
            ),
            [group_col], shards,
        )

    def per_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: pa.array([], type=g[group_col].type),
                id_col: pa.array([], type=g[id_col].type),
                order_col: pa.array([], type=g["v"].type),
                "rank": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        keys = g[group_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vcol = g["v"]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        if vcol.null_count:
            # a null order value surfaces as NaN after to_numpy and would
            # rank nondeterministically vs the row_number() SQL twin
            raise ValueError("top_n_per_group: null order_col unsupported (filter first)")
        v = vcol.to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        if ascending:
            vkey = v
        elif np.issubdtype(v.dtype, np.integer):
            # ~v = -v-1 is monotone decreasing with NO overflow (negating
            # INT64_MIN wraps to itself and would rank the minimum first)
            vkey = ~v
        else:
            vkey = -v
        order = np.lexsort((ids, vkey, codes))
        sc = codes[order]
        new = np.concatenate([[True], sc[1:] != sc[:-1]])
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        rank = np.arange(len(sc)) - starts[run_id] + 1
        keep = rank <= n
        sel = order[keep]
        return pa.table(
            {
                group_col: pc.take(keys, pa.array(sel)),
                id_col: pc.take(g[id_col], pa.array(sel)),
                order_col: pc.take(g["v"], pa.array(sel)),
                "rank": pa.array(rank[keep], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(per_shard, batch_format="pyarrow")
    )
