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


def tune_allocator() -> bool:
    """Serve large allocations from the reusable heap instead of fresh mmaps.

    glibc malloc mmaps any allocation over ~128 KB and unmaps it on free, so
    every large numpy temporary pays first-touch page faults — on VMs without
    transparent huge pages that caps effective bandwidth near 0.5 GB/s
    (measured here; ~7 GB/s once pages are reused). Raising M_MMAP_THRESHOLD
    keeps big buffers on the heap high-water mark, where pages are reused
    across temporaries. Called at package import, so every Ray worker that
    deserializes our batch functions gets it. No-op off glibc.
    """
    import ctypes
    import sys

    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        return bool(libc.mallopt(M_MMAP_THRESHOLD, 1 << 30))
    except Exception:
        return False
