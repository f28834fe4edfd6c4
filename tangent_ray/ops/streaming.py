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

from tangent_ray.util import round_half_away


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


def tumbling_window(ds, key_col="event_type", ts_col="ts", value_col="value", unit="hour"):
    """(key, window_start, n, sum_value) with sum_value rounded to 6."""
    import pandas as pd

    partial = ds.map_batches(
        lambda b: tumbling_window_partial(b, key_col, ts_col, value_col, unit),
        batch_format="pyarrow",
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "window_start": [g["window_start"].iloc[0]],
                "n": [np.int64(g["n"].sum())],
                "sum_value": [float(round_half_away(g["sum_value"].sum(), 6))],
            }
        )

    return partial.groupby([key_col, "window_start"]).map_groups(
        final, batch_format="pandas"
    )


def hopping_window(ds, key_col="event_type", ts_col="ts", value_col="value",
                   size_hours: int = 2, hop_hours: int = 1):
    """Overlapping (hopping) windows: size ``size_hours`` advancing by
    ``hop_hours`` — each event lands in ``size/hop`` windows.

    Same combiner shape as :func:`tumbling_window`: the per-batch partial
    explodes each event into its windows VECTORIZED (one repeat + offset
    subtraction, no per-event Python), pre-aggregates, and the final
    groupby folds tiny partial rows only. ``size`` must be a multiple of
    ``hop``."""
    import pandas as pd

    assert size_hours % hop_hours == 0
    k = size_hours // hop_hours
    hop_us = hop_hours * 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        base = pc.floor_temporal(batch[ts_col], multiple=hop_hours, unit="hour")
        base_us = base.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        n = len(base_us)
        # window starts: base - j*hop for j in 0..k-1
        starts = (
            np.repeat(base_us, k)
            - np.tile(np.arange(k, dtype=np.int64) * hop_us, n)
        )
        t = pa.table(
            {
                key_col: pa.array(
                    np.repeat(batch[key_col].to_numpy(zero_copy_only=False), k)
                ),
                "window_start": pa.array(
                    starts.astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "v": pa.array(
                    np.repeat(batch[value_col].to_numpy(zero_copy_only=False), k)
                ),
            }
        )
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

    part = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "window_start": [g["window_start"].iloc[0]],
                "n": [np.int64(g["n"].sum())],
                "sum_value": [float(round_half_away(g["sum_value"].sum(), 6))],
            }
        )

    return part.groupby([key_col, "window_start"]).map_groups(
        final, batch_format="pandas"
    )


def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30):
    """Gap-based session windows per key: a new session starts whenever the
    gap to the previous event of the same key exceeds ``gap_minutes``.

    One shuffle (groupby key); within a group everything is vectorized
    (sort -> diff -> boundary cumsum). Emits one row per session:
    (key, session_idx, start, end, n_events). The partitioning assumption is
    per-key locality — a key's events must co-locate, which the groupby
    provides; skewed keys are bounded by per-user event counts, not corpus
    size.
    """
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col].astype("int64").to_numpy()
        new = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new) - 1
        out = (
            pd.DataFrame({"sid": sid, "ts": ts})
            .groupby("sid")
            .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                 n_events=("ts", "size"))
            .reset_index()
        )
        out[key_col] = g[key_col].iloc[0]
        out["session_idx"] = out["sid"].astype(np.int64)
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        return out[[key_col, "session_idx", "session_start", "session_end", "n_events"]]

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
