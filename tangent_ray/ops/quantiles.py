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


def _col_i8(batch: pa.Table, col: str) -> np.ndarray:
    """int64 values of ``col``, REJECTING nulls (to_numpy would surface a
    null as NaN -> INT64_MIN and silently rank it smallest)."""
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if c.null_count:
        raise ValueError(f"kth_value: column {col!r} contains nulls (filter first)")
    return c.to_numpy(zero_copy_only=False).astype(np.int64)


def _range_and_count(ds, col: str) -> tuple[int, int, int]:
    """(min, max, n) of an int64 column in one streaming pass."""

    def part(batch: pa.Table) -> pa.Table:
        v = _col_i8(batch, col)
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


def kth_value(ds, col: str, k: int,
              bounds: tuple[int, int, int] | None = None) -> int:
    """Exact k-th smallest (1-indexed) of int64 column ``col``.

    <= 4 streaming histogram passes + one min/max pass; nothing
    row-shaped ever reaches the driver. ``ds`` is consumed up to 5 times —
    materialize upstream if it is compute-heavy to produce. Pass
    ``bounds`` = (min, max, n) to skip the min/max pass when already known
    (``quantile_values`` does, once for all its quantiles).
    """
    lo, hi, n = bounds if bounds is not None else _range_and_count(ds, col)
    if not 1 <= k <= n:
        raise ValueError(f"kth_value: k={k} outside [1, {n}]")

    # invariant: k stays the GLOBAL rank; each pass counts `below` (values
    # under the current range) fresh, so the in-range target rank is
    # k - below and no rank bookkeeping carries between rounds
    while True:
        span = hi - lo + 1
        # integer ceil: math.ceil(a / b) goes through float64 and loses
        # exactness for spans near 2^63 (full signed-hash domain)
        width = max(1, -(-span // _BUCKETS))
        nb = -(-span // width)
        clo, chi, cwidth, cnb = lo, hi, width, nb  # closure snapshots

        def hist_part(batch: pa.Table) -> pa.Table:
            v = _col_i8(batch, col)
            in_r = (v >= clo) & (v <= chi)
            below = int((v < clo).sum())
            # bucket math in uint64: for v >= clo the two's-complement
            # difference is the exact mathematical one even when the full
            # span exceeds int64 (e.g. a signed-hash column spanning
            # nearly the whole int64 domain)
            with np.errstate(over="ignore"):
                diff = v[in_r].astype(np.uint64) - np.uint64(clo & 0xFFFFFFFFFFFFFFFF)
                bucket = (diff // np.uint64(cwidth)).astype(np.int64)
            h = np.bincount(bucket, minlength=cnb)
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
    bounds = _range_and_count(ds, col)
    n = bounds[2]
    out = []
    for q in qs:
        k = max(1, min(n, math.ceil(q * n)))
        v = kth_value(ds, col, k, bounds=bounds)

        def ge_part(batch: pa.Table, thr=v) -> pa.Table:
            x = _col_i8(batch, col)
            return pa.table({"c": pa.array([int((x >= thr).sum())], pa.int64())})

        n_ge = sum(
            r["c"]
            for r in ds.map_batches(ge_part, batch_format="pyarrow").take_all()
        )
        out.append({"q": q, "k": k, "value": v, "n_ge": n_ge})
    return out
