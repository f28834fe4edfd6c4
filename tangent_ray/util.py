"""Small shared utilities."""

from __future__ import annotations

import numpy as np


def round_half_away(x, digits: int):
    """Round half away from zero — DuckDB's ``round()`` semantics.

    numpy/pyarrow default to round-half-even, which disagrees with DuckDB on
    exact .5 boundaries (e.g. 0.8203125 at 6 digits); every float column that
    is hash-compared against oracle SQL must round THIS way.
    """
    p = 10.0 ** digits
    a = np.asarray(x, dtype=np.float64)
    return np.sign(a) * np.floor(np.abs(a) * p + 0.5) / p


def actor_pool(frac: float = 1.0, floor: int = 2) -> tuple[int, int]:
    """Autoscaling ``(1, max)`` actor-pool bound sized to the CLUSTER, not a
    constant: ``max = cluster_cpus * frac`` (min ``floor``). A hard-coded
    cap like ``(1, 4)`` starves a 32-core node to 4 busy cores — measured
    4x on the MinHash signature stage; this keeps stateful stages scaled to
    whatever the job actually runs on."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", floor))
    except Exception:
        cpus = floor
    return (1, max(floor, int(cpus * frac)))


def tune_allocator() -> bool:
    """Serve large allocations from the reusable heap instead of fresh mmaps.

    glibc malloc mmaps any allocation over ~128 KB and unmaps it on free, so
    every large numpy temporary pays first-touch page faults — on VMs without
    transparent huge pages that caps effective bandwidth near 0.5 GB/s
    (measured here; ~7 GB/s once pages are reused). Raising M_MMAP_THRESHOLD
    keeps big buffers on the heap high-water mark, where pages are reused
    across temporaries. Called at package import, so every Ray worker that
    deserializes our batch functions gets it. No-op off glibc.

    The threshold is 64 MB, NOT unbounded: with a 1 GB threshold a
    long-lived worker that runs several different heavy operators
    accumulates a fragmented multi-GB arena and each later large allocation
    pays free-list/coalescing churn — measured 47-82 s for a 1 M-doc
    SimHash pass that runs 18 s in a fresh heap. 64 MB keeps the reuse win
    for normal batch temporaries (a 16 k-row batch's biggest buffers are
    single-digit MB) while letting truly huge buffers go back to mmap,
    which bounds arena growth; the same SimHash pass is then 18 s
    regardless of what ran before it in the session.
    """
    import ctypes
    import sys

    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        return bool(libc.mallopt(M_MMAP_THRESHOLD, 64 << 20))
    except Exception:
        return False


def stabilize_lazy_imports() -> None:
    """Make Ray Data's lazy fsspec-http probe thread-safe in this env.

    ``ray.data``'s path resolution lazily runs ``from
    fsspec.implementations.http import HTTPFileSystem`` and treats
    ``ModuleNotFoundError`` (aiohttp absent here) as "not an http fs". When
    two Dataset executions run concurrently (e.g. the docmap sidecar thread
    pipelined with the main build job), the failing import can race and one
    thread observes a partially-initialized module — surfacing as a plain
    ``ImportError`` that Ray does NOT catch. Pre-seed a sentinel module with
    an ``HTTPFileSystem`` class nothing is ever an instance of, so the
    probe is deterministic and False. No-op when aiohttp is installed.
    """
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return  # real module imports fine; nothing to do
    except ModuleNotFoundError:
        pass
    except ImportError:
        return  # partially initialized by another thread; leave it alone
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel: isinstance() is always False
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def sorted_lookup(sorted_keys: np.ndarray, values: np.ndarray):
    """Membership of ``values`` in a sorted 1-D array: ``(hit, pos)`` where
    ``hit[i]`` is True iff ``values[i]`` occurs and ``pos[i]`` is its index
    (clamped in-range everywhere, so ``sorted_keys[pos]`` never faults).

    The ONE shared 'broadcast sorted-set probe' idiom (LM model lookup,
    decontamination filter, df table) — searchsorted + clamp + equality."""
    pos = np.searchsorted(sorted_keys, values)
    if not len(sorted_keys):
        return np.zeros(len(values), dtype=bool), pos
    pos_c = np.minimum(pos, len(sorted_keys) - 1)
    hit = (pos < len(sorted_keys)) & (sorted_keys[pos_c] == values)
    return hit, pos_c


def distributed_topk(agg, k: int, key_col: str, cnt_col: str):
    """Exact top-k of an aggregated (key, cnt) Dataset WITHOUT a driver-side
    vocabulary pull — the one shared 'bounded exact top-k' idiom (heavy-
    hitters exact fallback, BPE ``top_m`` cap).

    Each block keeps only its local top-k under the (cnt desc, key asc)
    total order; post-aggregation a key is exactly one row globally, so any
    row cut from a block has >= k strictly-preceding rows and cannot be in
    the global top-k. Driver input is bounded by k x blocks, not vocab
    size. Returns a pa.Table sorted by that order (length <= k), or None
    when the Dataset is empty (callers own their empty schema)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    keys = [(cnt_col, "descending"), (key_col, "ascending")]

    def block_topk(b):
        if b.num_rows <= k:
            return b
        return b.take(pc.sort_indices(b, sort_keys=keys).slice(0, k))

    tabs = [
        t
        for t in ray.get(
            agg.map_batches(block_topk, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tabs:
        return None
    merged = pa.concat_tables(tabs).combine_chunks()
    return merged.take(pc.sort_indices(merged, sort_keys=keys).slice(0, k))


#: default shard count for bucket-key shuffles. Sizing rule: one shard's
#: rows materialize as ONE in-memory table in a map_groups task, so pick
#: shards ~ total_rows / rows-per-worker-heap (and >= cluster cores for
#: parallelism). 256 keeps test-scale overhead negligible while bounding a
#: shard to 1/256 of the input; pass an explicit value at larger scale.
DEFAULT_SHARDS = 256


def shard_column(batch, cols, shards: int = DEFAULT_SHARDS,
                 name: str = "shard"):
    """Append an int32 shard column: fixed-key vectorized hash of ``cols``.

    The ONE shared definition of 'hash these key columns into a bounded
    shard id' — a fixed-key C-loop siphash per column, folded FNV-style
    across columns. Deterministic across processes and runs.

    Integer/boolean columns are canonicalized to null-filled int64 BEFORE
    hashing (nulls then overwritten with a fixed hash): an Arrow int64
    batch surfaces as float64 numpy when it contains a null and int64
    when it does not, and ``pd.util.hash_array`` hashes the BIT PATTERN —
    without the canonical cast, the same key value routes to different
    shards depending on whether its batch happened to carry a null.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    _NULL_H = np.uint64(0x9E3779B97F4A7C15)
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_integer(col.type) or pa.types.is_boolean(col.type):
                filled = pc.fill_null(pc.cast(col, pa.int64()), 0)
                hc = pd.util.hash_array(
                    filled.to_numpy(zero_copy_only=False)
                ).astype(np.uint64)
                if col.null_count:
                    hc[pc.is_null(col).to_numpy(zero_copy_only=False)] = _NULL_H
            else:
                hc = pd.util.hash_array(
                    col.to_numpy(zero_copy_only=False)
                ).astype(np.uint64)
            h = h * np.uint64(0x100000001B3) ^ hc
    return batch.append_column(
        name, pa.array((h % shards).astype(np.int32), type=pa.int32())
    )
