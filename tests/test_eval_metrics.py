"""Hand-computed MRR / recall / nDCG values."""

import math

import pyarrow as pa

from tangent_ray.eval.metrics import mean_reciprocal_rank, ndcg_at_k, recall_at_k

RESULTS = [
    {"query_id": "q1", "rank": 1, "docid": 11},
    {"query_id": "q1", "rank": 2, "docid": 12},
    {"query_id": "q1", "rank": 3, "docid": 13},
    {"query_id": "q2", "rank": 1, "docid": 21},
    {"query_id": "q2", "rank": 2, "docid": 22},
    {"query_id": "q3", "rank": 1, "docid": 31},
]


def test_mrr():
    mean, per = mean_reciprocal_rank(
        RESULTS, {"q1": {12}, "q2": {22}, "q3": {99}}
    )
    assert per == {"q1": 0.5, "q2": 0.5, "q3": 0.0}
    assert abs(mean - 1 / 3) < 1e-12


def test_mrr_k_truncation():
    _, per = mean_reciprocal_rank(RESULTS, {"q1": {13}}, k=2)
    assert per == {"q1": 0.0}


def test_recall():
    mean, per = recall_at_k(RESULTS, {"q1": {11, 13, 99}, "q2": {21}})
    assert abs(per["q1"] - 2 / 3) < 1e-12
    assert per["q2"] == 1.0
    assert abs(mean - (2 / 3 + 1.0) / 2) < 1e-12


def test_ndcg():
    gains = {"q1": {11: 3.0, 12: 0.0, 13: 2.0, 99: 1.0}}
    _, per = ndcg_at_k(RESULTS, gains, k=3)
    dcg = 3.0 / math.log2(2) + 0.0 + 2.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 2.0 / math.log2(3) + 1.0 / math.log2(4)
    assert abs(per["q1"] - dcg / idcg) < 1e-12


def test_ndcg_perfect_is_one():
    gains = {"q2": {21: 2.0, 22: 1.0}}
    _, per = ndcg_at_k(RESULTS, gains, k=2)
    assert abs(per["q2"] - 1.0) < 1e-12


def test_sessionize(ray_session):
    """Gap-based sessionization: hand-built event stream."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tangent_ray.ops.streaming import sessionize

    base = 1_700_000_000_000_000  # us
    mins = 60 * 1_000_000
    rows = {
        "user_id": [1, 1, 1, 1, 2, 2],
        "ts": pa.array(
            np.array(
                [base, base + 10 * mins, base + 50 * mins, base + 55 * mins,
                 base, base + 31 * mins],
                dtype="int64",
            ),
            type=pa.timestamp("us"),
        ),
    }
    got = sessionize(
        ray.data.from_arrow(pa.table(rows)), gap_minutes=30
    ).take_all()
    per = {}
    for r in got:
        per[(r["user_id"], r["session_idx"])] = r["n_events"]
    # user 1: events at 0,10 | 50,55  -> 2 sessions of 2
    # user 2: 0 | 31 -> 2 sessions of 1 (31 > 30-minute gap)
    assert per == {(1, 0): 2, (1, 1): 2, (2, 0): 1, (2, 1): 1}


def test_hopping_window_preserves_null_values_and_key_types(ray_session):
    # a null value must be SKIPPED by the window sum (Arrow/DuckDB
    # semantics), not poison it to NaN via a numpy round-trip
    import numpy as np
    import ray.data

    from tangent_ray.ops.streaming import hopping_window

    t = pa.table(
        {
            "event_type": pa.array(["a", "a", "a"]),
            "ts": pa.array(
                np.array([0, 1, 2], dtype="datetime64[h]").astype("datetime64[us]"),
                type=pa.timestamp("us"),
            ),
            "value": pa.array([1.0, None, 2.0], type=pa.float64()),
        }
    )
    got = {
        (r["window_start"].isoformat(), r["n"]): r["sum_value"]
        for r in hopping_window(
            ray.data.from_arrow(t), size_hours=2, hop_hours=1
        ).take_all()
    }
    # window starting at hour 1 covers hours 1 (null) and 2 -> n counts
    # non-null only, sum skips the null
    assert got[("1970-01-01T01:00:00", 1)] == 2.0


def test_sessionize_null_ts_raises(ray_session):
    import pytest
    import ray.data

    from tangent_ray.ops.streaming import sessionize

    t = pa.table(
        {
            "user_id": pa.array([1, 1], type=pa.int64()),
            "ts": pa.array([0, None], type=pa.timestamp("us")),
        }
    )
    with pytest.raises(Exception, match="null timestamps"):
        sessionize(ray.data.from_arrow(t)).take_all()


def test_top_n_per_group_vs_bruteforce(ray_session):
    import numpy as np
    import ray.data

    from tangent_ray.ops.streaming import top_n_per_group

    rng = np.random.default_rng(5)
    n = 200
    t = pa.table(
        {
            "grp": pa.array([f"g{int(x)}" for x in rng.integers(0, 6, n)]),
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "value": pa.array(rng.integers(0, 20, n).astype("float64")),
        }
    )
    out = top_n_per_group(
        ray.data.from_arrow(t), "grp", "value", 3, id_col="event_id", shards=8
    ).to_pandas()
    # brute force: sort by (grp, -value, id), rank within group
    import pandas as pd

    df = t.to_pandas().sort_values(
        ["grp", "value", "event_id"], ascending=[True, False, True]
    )
    df["rank"] = df.groupby("grp").cumcount() + 1
    want = df[df["rank"] <= 3].reset_index(drop=True)
    got = out.sort_values(["grp", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["grp", "event_id", "value", "rank"]],
        want[["grp", "event_id", "value", "rank"]],
        check_dtype=False,
    )


def test_top_n_per_group_int64_min_and_null_rejection(ray_session):
    import numpy as np
    import pytest
    import ray.data

    from tangent_ray.ops.streaming import top_n_per_group

    lo = np.iinfo(np.int64).min
    t = pa.table(
        {
            "grp": pa.array(["g", "g", "g"]),
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            # -INT64_MIN wraps to itself: the old negation key ranked the
            # MINIMUM value first on descending order
            "value": pa.array([lo, 5, 7], type=pa.int64()),
        }
    )
    out = top_n_per_group(
        ray.data.from_arrow(t), "grp", "value", 2, id_col="event_id", shards=2
    ).to_pandas().sort_values("rank")
    assert out["event_id"].tolist() == [3, 2]  # 7, 5 — NOT INT64_MIN first

    with_null = pa.table(
        {
            "grp": pa.array(["g", "g"]),
            "event_id": pa.array([1, 2], type=pa.int64()),
            "value": pa.array([1, None], type=pa.int64()),
        }
    )
    with pytest.raises(Exception, match="null order_col"):
        top_n_per_group(
            ray.data.from_arrow(with_null), "grp", "value", 1,
            id_col="event_id", shards=2,
        ).take_all()
