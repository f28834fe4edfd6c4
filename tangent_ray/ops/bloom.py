"""Distributed Bloom filter over an int64 id column.

The scale primitive behind "broadcast a small side's id-set and stream the
big side through a membership filter" when the small side no longer fits a
Python set: a packed bitset of 2^b bits costs 2^b / 8 bytes however many
ids it holds (2^30 bits = 128 MB holds ~100 M ids at ~1% FP with k=4).

Build: every block maps to a PARTIAL bitset (ids are hashed k ways and
their bits set locally), partials OR-combine in a binary tree of Ray tasks
— log2(blocks) depth, never more than two bitsets per task, the driver
receives exactly ONE bitset. Probe: ``ray.put`` the bitset once, test k
vectorized probes per row inside ``map_batches``.

False negatives are impossible (every inserted id's bits are set before
the OR-tree, and OR only adds bits); false positives pass the filter and
cost only wasted downstream work — callers must treat membership as
"maybe", e.g. `apply_span_cuts`-style prefilters re-verify by key later.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: splitmix64-derived odd multipliers, one per probe
_SEEDS = (
    0x9E3779B97F4A7C15,
    0xBF58476D1CE4E5B9,
    0x94D049BB133111EB,
    0xC2B2AE3D27D4EB4F,
    0xD6E8FEB86659FD93,
    0xA0761D6478BD642F,
)

MAX_PROBES = len(_SEEDS)


def _bit_positions(ids: np.ndarray, bits_log2: int, k: int) -> np.ndarray:
    """(k, n) bit positions for int64 ids: k independent splitmix mixes,
    top ``bits_log2`` bits of each (the low bits of a multiplicative mix
    are weaker)."""
    x = ids.astype(np.uint64)
    out = np.empty((k, len(ids)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            z = x * np.uint64(_SEEDS[i])
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[i] = (z ^ (z >> np.uint64(31))) >> np.uint64(64 - bits_log2)
    return out


def _partial_bitset(ids: np.ndarray, bits_log2: int, k: int) -> np.ndarray:
    """Packed uint64 bitset (2^bits_log2 bits) with the ids' bits set."""
    words = np.zeros(1 << (bits_log2 - 6), dtype=np.uint64)
    if len(ids):
        pos = _bit_positions(ids, bits_log2, k).ravel()
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_contains(bloom, ids: np.ndarray, k: int | None = None) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (FP possible),
    False = definitely absent. ``bloom`` is either the ``build_bloom``
    result dict (k travels WITH the bitset — probing with a different k
    than the build would silently produce false negatives) or a raw packed
    bitset plus an explicit ``k``."""
    if isinstance(bloom, dict):
        bitset, k = bloom["bits"], bloom["k"]
    else:
        bitset = bloom
        if k is None:
            raise ValueError("bloom_contains: raw bitset needs explicit k")
    if not 1 <= k <= MAX_PROBES:
        raise ValueError(f"bloom_contains: k must be in [1, {MAX_PROBES}]")
    bits_log2 = int(np.log2(len(bitset))) + 6
    if len(ids) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bit_positions(np.asarray(ids, dtype=np.int64), bits_log2, k)
    hit = np.ones(pos.shape[1], dtype=bool)
    for i in range(k):
        w = bitset[(pos[i] >> np.uint64(6)).astype(np.int64)]
        hit &= (w >> (pos[i] & np.uint64(63))) & np.uint64(1) != 0
    return hit


def build_bloom(ds, col: str, bits_log2: int = 27, k: int = 4):
    """Build the filter over ``ds[col]`` (int64) and return an ObjectRef to
    ``{"bits": packed bitset, "k": k}`` — k travels with the bitset so a
    probe can never use a mismatched probe count (pass the ref to
    ``bloom_contains`` after one ``ray.get`` per actor, or keep it as a
    ref for ``map_batches`` closures).

    Per-block partials OR-combine pairwise in a tree of Ray tasks: depth
    log2(n_blocks), peak two bitsets per task — the full id list never
    lands anywhere, and the driver never holds more than the final bitset
    ref. Size guidance: bits ~ 13x the expected distinct ids gives ~1% FP
    at k=4; FP rate ~ (1 - e^{-kn/m})^k."""
    import ray

    if not 1 <= k <= MAX_PROBES:
        raise ValueError(f"k must be in [1, {MAX_PROBES}]")

    # partials as raw Ray tasks over the Dataset's blocks — one of the few
    # places the Dataset API genuinely can't express the semantics (an
    # OR-reduce of fixed-size binary state across blocks)
    blocks = ds.select_columns([col]).to_arrow_refs()

    @ray.remote
    def partial(block: pa.Table) -> np.ndarray:
        # a Dataset can contain zero-row blocks whose schema has NO
        # columns (same Ray quirk broadcast_join guards against)
        if block.num_rows == 0 or col not in block.schema.names:
            return np.zeros(1 << (bits_log2 - 6), dtype=np.uint64)
        ids = block[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return _partial_bitset(ids, bits_log2, k)

    @ray.remote
    def combine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.bitwise_or(a, b)

    @ray.remote
    def wrap(bits: np.ndarray) -> dict:
        return {"bits": bits, "k": k}

    refs = [partial.remote(b) for b in blocks]
    if not refs:
        return ray.put(
            {"bits": np.zeros(1 << (bits_log2 - 6), dtype=np.uint64), "k": k}
        )
    while len(refs) > 1:
        nxt = [
            combine.remote(refs[i], refs[i + 1])
            for i in range(0, len(refs) - 1, 2)
        ]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    return wrap.remote(refs[0])


def filter_by_bloom(ds, bloom_ref, col: str, keep_hits: bool = True):
    """Stream ``ds`` through the membership filter: keep rows whose id is
    (maybe) in the filter (``keep_hits=True``) or definitely NOT in it
    (``keep_hits=False``). The bitset (with its build-time k) ships to
    each worker once via the object store, not per batch."""
    import ray

    class _Probe:
        def __init__(self, ref):
            self.bloom = ray.get(ref) if not isinstance(ref, dict) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            hit = bloom_contains(self.bloom, ids)
            return batch.filter(pa.array(hit if keep_hits else ~hit))

    from tangent_ray.util import actor_pool

    return ds.map_batches(
        _Probe, fn_constructor_args=(bloom_ref,),
        batch_format="pyarrow", concurrency=actor_pool(),
    )
