"""kth_value / quantile_values: randomized vs np.sort, duplicates,
negatives, multi-block, and the ceil(q*n) rank rule."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from tangent_ray.ops.quantiles import kth_value, quantile_values


def _ds(vals, blocks=3):
    t = pa.table({"x": pa.array(vals, type=pa.int64())})
    n = len(vals)
    cut = max(1, n // blocks)
    parts = [t.slice(i, cut) for i in range(0, n, cut)]
    d = ray.data.from_arrow(parts[0])
    for p in parts[1:]:
        d = d.union(ray.data.from_arrow(p))
    return d


def test_kth_value_randomized(ray_session):
    rng = np.random.default_rng(11)
    for trial in range(3):
        # wide range (forces >1 refinement round), duplicates, negatives
        vals = rng.integers(-(10**12), 10**12, 300)
        vals[::7] = vals[0]  # dup cluster
        s = np.sort(vals)
        for k in (1, 2, 150, 299, 300):
            assert kth_value(_ds(vals.tolist()), "x", k) == s[k - 1], (trial, k)


def test_kth_value_narrow_range_duplicates(ray_session):
    vals = [5] * 100 + [7] * 50 + [3] * 25
    s = sorted(vals)
    for k in (1, 25, 26, 125, 126, 175):
        assert kth_value(_ds(vals), "x", k) == s[k - 1]


def test_kth_value_bounds(ray_session):
    import pytest

    with pytest.raises(ValueError, match="outside"):
        kth_value(_ds([1, 2, 3]), "x", 4)
    with pytest.raises(ValueError, match="outside"):
        kth_value(_ds([1, 2, 3]), "x", 0)


def test_quantile_values_rule(ray_session):
    vals = list(range(1, 101))  # 1..100
    out = quantile_values(_ds(vals), "x", [0.5, 0.9, 0.99])
    by_q = {r["q"]: r for r in out}
    assert by_q[0.5]["k"] == 50 and by_q[0.5]["value"] == 50
    assert by_q[0.9]["k"] == 90 and by_q[0.9]["value"] == 90
    assert by_q[0.99]["k"] == 99 and by_q[0.99]["value"] == 99
    assert by_q[0.9]["n_ge"] == 11  # 90..100
    # matches the documented rule exactly
    for r in out:
        assert r["k"] == max(1, min(100, math.ceil(r["q"] * 100)))


def test_kth_value_full_int64_span(ray_session):
    # span > 2^63: the uint64 bucket math must not wrap
    vals = [-(2**62), -17, 0, 23, 2**62]
    s = sorted(vals)
    for k in range(1, 6):
        assert kth_value(_ds(vals, blocks=2), "x", k) == s[k - 1]


def test_kth_value_rejects_nulls(ray_session):
    import pytest

    t = pa.table({"x": pa.array([1, None, 3], type=pa.int64())})
    with pytest.raises(Exception, match="nulls"):
        kth_value(ray.data.from_arrow(t), "x", 1)
