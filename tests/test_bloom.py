"""Distributed Bloom filter (ops/bloom): no false negatives ever, FP rate
near theory, tree-reduce equivalence to a single-partial build, and the
filter_by_bloom streaming surface."""

import numpy as np
import pyarrow as pa
import pytest

from tangent_ray.ops.bloom import (
    _partial_bitset,
    bloom_contains,
    build_bloom,
    filter_by_bloom,
)


def test_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(5)
    members = rng.choice(2**62, size=20_000, replace=False).astype(np.int64)
    bits_log2, k = 18, 4  # 262144 bits for 20k ids: m/n ~ 13 -> ~1% FP
    bs = _partial_bitset(members, bits_log2, k)
    assert bloom_contains(bs, members, k).all()  # NO false negatives
    probe = rng.choice(2**62, size=50_000, replace=False).astype(np.int64)
    probe = np.setdiff1d(probe, members)
    fp = bloom_contains(bs, probe, k).mean()
    n, m = len(members), 1 << bits_log2
    theory = (1 - np.exp(-k * n / m)) ** k
    assert fp < 3 * theory + 0.005, (fp, theory)


def test_partial_or_is_union():
    a = np.arange(0, 500, dtype=np.int64)
    b = np.arange(400, 900, dtype=np.int64)
    bs = np.bitwise_or(_partial_bitset(a, 16, 3), _partial_bitset(b, 16, 3))
    assert bloom_contains(bs, np.arange(0, 900, dtype=np.int64), 3).all()


def test_build_bloom_tree_reduce(ray_session):
    import ray
    import ray.data

    ids = np.arange(0, 30_000, 3, dtype=np.int64)  # 10k members
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    ).repartition(7)  # odd block count exercises the tree's carry branch
    ref = build_bloom(ds, "doc_id", bits_log2=18, k=4)
    bloom = ray.get(ref)
    assert bloom["k"] == 4
    # identical to the single-shot build over all ids
    single = _partial_bitset(ids, 18, 4)
    assert np.array_equal(bloom["bits"], single)
    assert bloom_contains(bloom, ids).all()


def test_build_bloom_empty_and_bad_k(ray_session):
    import ray
    import ray.data

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], type=pa.int64())})
    )
    bloom = ray.get(build_bloom(empty, "doc_id", bits_log2=12))
    assert not bloom["bits"].any()
    # probe-side guards
    with pytest.raises(ValueError, match="explicit k"):
        bloom_contains(bloom["bits"], np.arange(3))
    with pytest.raises(ValueError, match="k must be"):
        bloom_contains(bloom["bits"], np.arange(3), k=99)
    with pytest.raises(ValueError):
        build_bloom(empty, "doc_id", k=99)


def test_filter_by_bloom_streams(ray_session):
    import ray
    import ray.data

    members = np.arange(1000, 2000, dtype=np.int64)
    small = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(members, type=pa.int64())})
    )
    ref = build_bloom(small, "doc_id", bits_log2=16, k=4)
    big = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(5000), type=pa.int64()),
                  "payload": pa.array([f"p{i}" for i in range(5000)])})
    )
    hits = filter_by_bloom(big, ref, "doc_id").take_all()
    hit_ids = {r["doc_id"] for r in hits}
    assert set(members) <= hit_ids  # every member survives
    assert len(hit_ids) < 1200  # FPs are rare at this sizing
    misses = filter_by_bloom(big, ref, "doc_id", keep_hits=False).take_all()
    assert {r["doc_id"] for r in misses}.isdisjoint(set(members))
    assert len(misses) + len(hits) == 5000
