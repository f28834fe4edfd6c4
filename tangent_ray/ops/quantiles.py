"""Distributed exact order statistics WITHOUT a global sort.

``kth_value`` finds the exact k-th smallest of an int64 column by
iterative histogram refinement: each round is ONE streaming ``map_batches``
pass emitting a per-batch 65,536-bucket bincount over the current
candidate range plus a below-range count, and a driver-side reduce of
those tiny partials narrows the range by 16 bits. At most 4 rounds cover
the full int64 domain, and the final round's buckets are exact values —
no row ever leaves its batch, so the op is indifferent to duplicates,
skew, and corpus size (a sort-based k-th would shuffle everything).

This is the primitive behind "keep the top decile by quality score" /
"p99 latency" pipeline stages; ``quantile_values`` maps quantiles to ranks
with the explicit rule ``k = ceil(q * n)`` (1-indexed k-th smallest), which
the DuckDB twin reproduces as ``ORDER BY col LIMIT 1 OFFSET k-1``.

Float columns should be scaled to fixed-point first (the repo convention —
see ``ops/lm.py``'s 1e-6-unit log-probs) so exactness is trivial.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_BUCKETS = 1 << 16


def _range_and_count(ds, col: str) -> tuple[int, int, int]:
    """(min, max, n) of an int64 column in one streaming pass."""

    def part(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(v):
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {"lo": pa.array([int(v.min())], pa.int64()),
             "hi": pa.array([int(v.max())], pa.int64()),
             "n": pa.array([len(v)], pa.int64())}
        )

    rows = ds.map_batches(part, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError(f"kth_value: empty dataset / column {col!r}")
    return (
        min(r["lo"] for r in rows),
        max(r["hi"] for r in rows),
        sum(r["n"] for r in rows),
    )


def kth_value(ds, col: str, k: int) -> int:
    """Exact k-th smallest (1-indexed) of int64 column ``col``.

    <= 4 streaming histogram passes + one min/max pass; nothing
    row-shaped ever reaches the driver. ``ds`` is consumed up to 5 times —
    materialize upstream if it is compute-heavy to produce.
    """
    lo, hi, n = _range_and_count(ds, col)
    if not 1 <= k <= n:
        raise ValueError(f"kth_value: k={k} outside [1, {n}]")

    # invariant: k stays the GLOBAL rank; each pass counts `below` (values
    # under the current range) fresh, so the in-range target rank is
    # k - below and no rank bookkeeping carries between rounds
    while True:
        span = hi - lo + 1
        width = max(1, math.ceil(span / _BUCKETS))
        nb = math.ceil(span / width)
        clo, chi, cwidth, cnb = lo, hi, width, nb  # closure snapshots

        def hist_part(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            in_r = (v >= clo) & (v <= chi)
            below = int((v < clo).sum())
            h = np.bincount((v[in_r] - clo) // cwidth, minlength=cnb)
            return pa.table(
                {
                    "below": pa.array([below], pa.int64()),
                    "hist": pa.array([h.astype(np.int64)], pa.list_(pa.int64())),
                }
            )

        rows = ds.map_batches(hist_part, batch_format="pyarrow").take_all()
        below = sum(r["below"] for r in rows)
        h = np.zeros(nb, dtype=np.int64)
        for r in rows:
            h += np.asarray(r["hist"], dtype=np.int64)
        cum = np.cumsum(h)
        b = int(np.searchsorted(cum, k - below, side="left"))
        if width == 1:
            return lo + b
        lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)


def quantile_values(ds, col: str, qs: list[float]) -> list[dict]:
    """Exact quantile thresholds by the ``k = ceil(q*n)`` rule, plus the
    count of rows at-or-above each threshold (one extra streaming pass).

    Returns one dict per quantile: {"q", "k", "value", "n_ge"}.
    """
    _, _, n = _range_and_count(ds, col)
    out = []
    for q in qs:
        k = max(1, min(n, math.ceil(q * n)))
        v = kth_value(ds, col, k)

        def ge_part(batch: pa.Table, thr=v) -> pa.Table:
            x = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"c": pa.array([int((x >= thr).sum())], pa.int64())})

        n_ge = sum(
            r["c"]
            for r in ds.map_batches(ge_part, batch_format="pyarrow").take_all()
        )
        out.append({"q": q, "k": k, "value": v, "n_ge": n_ge})
    return out
