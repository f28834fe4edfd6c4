"""A10/K5: expression tuple-count stats + reordering (mathindex.cpp:81-114).

The histogram-based rank statistics must equal the C++'s sort-based ones
exactly (same index arithmetic), and the dense relabeling must order ids by
the od key (mid-quartile first, rarest last).
"""

import numpy as np
import pytest

from tangent_ray.index.reorder import (
    reorder_key,
    reorder_stats,
    tc_histogram,
)


def _cpp_reorder_stats(tcs, breaks=20):
    """Direct transcription of the reference's sort-based arithmetic."""
    e = np.sort(np.asarray(tcs))
    s = len(e)
    q1 = int(e[int(0.25 * (s - 1))])
    q2 = int(e[int(0.5 * (s - 1))])
    distexpr = [1] + [i * (s - 1) // breaks + 1 for i in range(1, breaks + 1)]
    disttc = [int(e[i * (s - 1) // breaks]) for i in range(0, breaks + 1)]
    return q1, q2, distexpr, disttc


@pytest.mark.parametrize("seed,n", [(0, 7), (1, 100), (2, 1001)])
def test_histogram_stats_equal_sort_based(seed, n):
    rng = np.random.RandomState(seed)
    tcs = rng.geometric(0.2, size=n) + 1  # skewed small ints like tuple counts
    hist = np.bincount(tcs)
    got = reorder_stats(hist)
    q1, q2, distexpr, disttc = _cpp_reorder_stats(tcs)
    assert got["n_exprs"] == n
    assert (got["q1"], got["q2"]) == (q1, q2)
    assert got["distexpr"] == distexpr
    assert got["disttc"] == disttc


def test_reorder_key_piecewise():
    # q1=2, q2=5: tc in (2,5] -> tc-q1 (1..3); tc<=2 -> q2+1-tc (4,5); tc>5 -> tc
    od = reorder_key(np.array([1, 2, 3, 4, 5, 6, 9]), q1=2, q2=5)
    assert od.tolist() == [5, 4, 1, 2, 3, 6, 9]
    # mid-quartile expressions sort before both the rarest and the largest
    assert max(od[2:5]) < min(od[[0, 1, 5, 6]])


def test_expr_counts_and_assignment_pipeline(ray_session, tmp_path):
    import ray.data

    from tangent_ray.config import EngineConfig
    from tangent_ray.fixtures import write_transcripts
    from tangent_ray.index.reorder import expr_tuple_counts, reorder_assignment

    files = write_transcripts(str(tmp_path / "corpus"), 20)
    cfg = EngineConfig()
    ds = ray.data.read_parquet(files, columns=["text"])
    counts = expr_tuple_counts(ds, cfg).materialize()
    rows = counts.take_all()
    assert len(rows) > 5  # fixture corpus has a formula vocabulary
    # distinct by construction
    assert len({r["ehash"] for r in rows}) == len(rows)
    assert all(r["tc"] >= 1 for r in rows)

    hist = tc_histogram(counts)
    stats = reorder_stats(hist)
    assert stats["n_exprs"] == len(rows)
    assert stats["q1"] <= stats["q2"] <= hist.size - 1

    assigned = reorder_assignment(counts, stats["q1"], stats["q2"]).take_all()
    ids = sorted(r["new_id"] for r in assigned)
    assert ids == list(range(len(rows)))  # dense permutation
    # ids ascend with od
    by_id = sorted(assigned, key=lambda r: r["new_id"])
    ods = [r["od"] for r in by_id]
    assert ods == sorted(ods)
