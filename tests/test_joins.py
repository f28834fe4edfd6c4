"""Unit tests for ops/joins.py: keyed as-of join and interval range join,
hand cases plus randomized brute-force comparison."""

import numpy as np
import pyarrow as pa
import ray.data

from tangent_ray.ops.joins import asof_join, range_count


def _ts(us):
    return pa.array(np.asarray(us, dtype="datetime64[us]"), type=pa.timestamp("us"))


def _events(ids, keys, ts_us):
    return pa.table(
        {
            "event_id": pa.array(ids, type=pa.int64()),
            "user_id": pa.array(keys, type=pa.int64()),
            "ts": _ts(ts_us),
        }
    )


def test_asof_join_hand_case(ray_session):
    # key 1: rights at 10, 20 (two ids at 20 -> max wins); lefts at 5, 20, 30
    # key 2: no rights at all
    left = _events([100, 101, 102, 103], [1, 1, 1, 2], [5, 20, 30, 50])
    right = _events([7, 8, 9, 6], [1, 1, 1, 1], [10, 20, 20, 25])
    out = (
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right), shards=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [100, 101, 102, 103]
    got = {
        int(r.event_id): (None if r.matched_id != r.matched_id else int(r.matched_id))
        for r in out.itertuples()
    }
    assert got[100] is None  # left before any right
    assert got[101] == 9  # inclusive tie at ts=20, max id of the two rights
    assert got[102] == 6  # latest right <= 30 is ts=25
    assert got[103] is None  # key 2 has no rights (no cross-key leak)
    lag = out.set_index("event_id")["lag_us"]
    assert lag[102] == 5


def test_asof_join_matches_bruteforce(ray_session):
    rng = np.random.RandomState(7)
    n_l, n_r = 300, 200
    lk = rng.randint(0, 12, n_l)
    rk = rng.randint(0, 12, n_r)
    lt = rng.randint(0, 10_000, n_l)
    rt = rng.randint(0, 10_000, n_r)
    left = _events(np.arange(n_l), lk, lt)
    right = _events(np.arange(1000, 1000 + n_r), rk, rt)
    out = (
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right), shards=8)
        .to_pandas()
        .set_index("event_id")
    )
    assert len(out) == n_l
    for i in range(n_l):
        cand = [
            (rt[j], 1000 + j) for j in range(n_r) if rk[j] == lk[i] and rt[j] <= lt[i]
        ]
        want = max(cand)[1] if cand else None
        got = out.loc[i, "matched_id"]
        got = None if got != got else int(got)
        assert got == want, (i, got, want)


def test_range_count_hand_case(ray_session):
    # bucket width 100us; intervals: [50, 250] spans 3 buckets, [90, 95], [300, 300]
    pts = _events([0, 1, 2, 3, 4], [0] * 5, [40, 92, 170, 250, 301])
    iv = pa.table(
        {
            "lo": _ts([50, 90, 300]),
            "hi": _ts([250, 95, 300]),
        }
    )
    out = (
        range_count(
            ray.data.from_arrow(pts), ray.data.from_arrow(iv), bucket_us=100
        )
        .to_pandas()
        .set_index("event_id")["n_active"]
    )
    assert out[0] == 0  # before everything
    assert out[1] == 2  # inside both [50,250] and [90,95]
    assert out[2] == 1  # middle bucket of the spanning interval
    assert out[3] == 1  # inclusive upper bound
    assert out[4] == 0  # 301 > 300


def test_range_count_matches_bruteforce(ray_session):
    rng = np.random.RandomState(11)
    n_p, n_i = 400, 120
    pt = rng.randint(0, 50_000, n_p)
    lo = rng.randint(0, 50_000, n_i)
    ln = rng.randint(0, 3_000, n_i)
    hi = lo + ln
    pts = _events(np.arange(n_p), np.zeros(n_p, dtype=int), pt)
    iv = pa.table({"lo": _ts(lo), "hi": _ts(hi)})
    out = (
        range_count(
            ray.data.from_arrow(pts), ray.data.from_arrow(iv), bucket_us=1_000
        )
        .to_pandas()
        .set_index("event_id")["n_active"]
    )
    want = ((lo[None, :] <= pt[:, None]) & (pt[:, None] <= hi[None, :])).sum(axis=1)
    assert len(out) == n_p
    for i in range(n_p):
        assert out[i] == want[i], (i, out[i], want[i])


# ---------------------------------------------------------------------------
# generic hash equi-join


def _l_tbl():
    return pa.table(
        {
            "k": pa.array([1, 2, 2, 3, None], type=pa.int64()),
            "a": pa.array(["p", "q", "r", "s", "t"]),
            "v": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
        }
    )


def _r_tbl():
    return pa.table(
        {
            "k": pa.array([2, 2, 4, None], type=pa.int64()),
            "v": pa.array([7, 8, 9, 6], type=pa.int64()),  # collides with left
            "w": pa.array(["x", "y", "z", "u"]),
        }
    )


def _rows(ds):
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return sorted(
        tuple(None if x != x else x for x in row)
        for row in df[cols].itertuples(index=False)
    )


def _duck_rows(sql):
    import duckdb

    l, r = _l_tbl(), _r_tbl()  # noqa: F841 — replacement-scanned
    df = duckdb.sql(sql).df()
    cols = sorted(df.columns)
    return sorted(
        tuple(None if x != x else (int(x) if isinstance(x, float) else x) for x in row)
        for row in df[cols].itertuples(index=False)
    )


def test_hash_join_inner_matches_duckdb(ray_session):
    from tangent_ray.ops.joins import hash_join

    out = hash_join(
        ray.data.from_arrow(_l_tbl()), ray.data.from_arrow(_r_tbl()),
        on="k", how="inner", shards=4,
    )
    want = _duck_rows(
        "SELECT l.k, l.a, l.v, r.v AS v_r, r.w FROM l JOIN r USING (k)"
    )
    assert _rows(out) == want


def test_hash_join_left_matches_duckdb(ray_session):
    from tangent_ray.ops.joins import hash_join

    out = hash_join(
        ray.data.from_arrow(_l_tbl()), ray.data.from_arrow(_r_tbl()),
        on="k", how="left", shards=4,
    )
    want = _duck_rows(
        "SELECT l.k, l.a, l.v, r.v AS v_r, r.w FROM l LEFT JOIN r USING (k)"
    )
    assert _rows(out) == want


def test_broadcast_join_matches_shuffle_join(ray_session):
    from tangent_ray.ops.joins import broadcast_join, hash_join

    for how in ("inner", "left"):
        bc = broadcast_join(ray.data.from_arrow(_l_tbl()), _r_tbl(), on="k", how=how)
        sh = hash_join(
            ray.data.from_arrow(_l_tbl()), ray.data.from_arrow(_r_tbl()),
            on="k", how=how, shards=4,
        )
        assert _rows(bc) == _rows(sh)


def test_hash_join_key_type_mismatch_raises(ray_session):
    import pytest

    from tangent_ray.ops.joins import hash_join

    r32 = pa.table({"k": pa.array([1], type=pa.int32()), "w": pa.array(["x"])})
    with pytest.raises(ValueError, match="types differ"):
        hash_join(ray.data.from_arrow(_l_tbl()), ray.data.from_arrow(r32), on="k")


def test_hash_join_string_keys_multi_shard(ray_session):
    # every key in its own shard region; dup left x dup right multiplicity
    from tangent_ray.ops.joins import hash_join

    left = pa.table(
        {"k": pa.array([f"k{i % 7}" for i in range(40)]),
         "i": pa.array(list(range(40)), type=pa.int64())}
    )
    right = pa.table(
        {"k": pa.array([f"k{i % 5}" for i in range(15)]),
         "j": pa.array(list(range(15)), type=pa.int64())}
    )
    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), on="k", shards=8
    ).to_pandas()
    # brute force
    import itertools

    want = sorted(
        (lk, i, j)
        for (lk, i), (rk, j) in itertools.product(
            zip(left["k"].to_pylist(), left["i"].to_pylist()),
            zip(right["k"].to_pylist(), right["j"].to_pylist()),
        )
        if lk == rk
    )
    got = sorted(zip(out["k"], out["i"], out["j"]))
    assert got == want


def test_hash_join_null_in_one_block_only(ray_session):
    # regression: an int key batch WITH a null surfaces as float64 numpy,
    # a null-free batch as int64 — shard_column must canonicalize so the
    # same key value routes to the same shard either way
    from tangent_ray.ops.joins import hash_join

    blk_a = pa.table({"k": pa.array([2, None], type=pa.int64()),
                      "a": pa.array(["x", "y"])})
    blk_b = pa.table({"k": pa.array([2], type=pa.int64()),
                      "a": pa.array(["z"])})
    left = ray.data.from_arrow(blk_a).union(ray.data.from_arrow(blk_b))
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2], type=pa.int64()), "b": pa.array([7])})
    )
    out = hash_join(left, right, on="k", how="inner", shards=16).to_pandas()
    assert sorted(out["a"]) == ["x", "z"]


def test_hash_join_reserved_column_raises(ray_session):
    import pytest

    from tangent_ray.ops.joins import hash_join

    bad = pa.table({"k": pa.array([1], type=pa.int64()),
                    "__side": pa.array([0], type=pa.int8())})
    with pytest.raises(ValueError, match="reserved"):
        hash_join(ray.data.from_arrow(bad), ray.data.from_arrow(_r_tbl()), on="k")


def test_hash_join_randomized_vs_duckdb(ray_session):
    # seeded differential fuzz: dup keys, null keys, skewed keys, random
    # block splits, both join types, vs DuckDB on the same tables
    import duckdb

    from tangent_ray.ops.joins import hash_join

    rng = np.random.default_rng(7)
    for trial in range(4):
        nl, nr = int(rng.integers(1, 60)), int(rng.integers(1, 40))
        lk = rng.integers(0, 12, nl).astype(object)
        rk = rng.integers(0, 12, nr).astype(object)
        lk[rng.random(nl) < 0.15] = None
        rk[rng.random(nr) < 0.15] = None
        lt = pa.table(
            {"k": pa.array(lk.tolist(), type=pa.int64()),
             "a": pa.array(rng.integers(0, 1000, nl), type=pa.int64())}
        )
        rt = pa.table(
            {"k": pa.array(rk.tolist(), type=pa.int64()),
             "b": pa.array(rng.integers(0, 1000, nr), type=pa.int64())}
        )
        cut = int(rng.integers(0, nl + 1))
        left = ray.data.from_arrow(lt.slice(0, cut)).union(
            ray.data.from_arrow(lt.slice(cut))
        )
        def canon(df):
            rows = [
                tuple(None if v != v else int(v) for v in row)
                for row in df[["k", "a", "b"]].itertuples(index=False)
            ]
            return sorted(
                rows,
                key=lambda t: tuple((v is None, v or 0) for v in t),
            )

        for how, sql in (
            ("inner", "SELECT * FROM lt JOIN rt USING (k)"),
            ("left", "SELECT * FROM rt RIGHT JOIN lt USING (k)"),
        ):
            got = canon(
                hash_join(
                    left, ray.data.from_arrow(rt), on="k", how=how, shards=7
                ).to_pandas()
            )
            want = canon(duckdb.sql(sql).df())
            assert got == want, (trial, how)


def test_range_count_negative_point_ids(ray_session):
    # a point with a negative id must still be counted (the old pid>=0
    # sentinel classification silently dropped it)
    from tangent_ray.ops.joins import range_count

    points = pa.table(
        {"event_id": pa.array([-5, 7], type=pa.int64()),
         "ts": _ts([100, 100])}
    )
    intervals = pa.table({"lo": _ts([50]), "hi": _ts([150])})
    out = {r["event_id"]: r["n_active"]
           for r in range_count(
               ray.data.from_arrow(points), ray.data.from_arrow(intervals),
               bucket_us=1000,
           ).take_all()}
    assert out == {-5: 1, 7: 1}


def test_asof_join_rejects_string_key(ray_session):
    import pytest

    from tangent_ray.ops.joins import asof_join

    t = pa.table(
        {"event_id": pa.array([1], type=pa.int64()),
         "user_id": pa.array(["u1"]),
         "ts": _ts([5])}
    )
    with pytest.raises(ValueError, match="must be integer"):
        asof_join(ray.data.from_arrow(t), ray.data.from_arrow(t))


def test_broadcast_join_right_with_empty_schemaless_block(ray_session):
    # the driver's 25-row nation table materialized as 26 blocks, the last
    # one zero-row with a ZERO-COLUMN schema — concat_tables used to raise
    # ArrowInvalid (CORRECTNESS_r02 customer_nation_bc)
    from tangent_ray.ops.joins import broadcast_join, hash_join

    right = ray.data.from_arrow([_r_tbl(), pa.table({})])
    for how in ("inner", "left"):
        bc = broadcast_join(
            ray.data.from_arrow(_l_tbl()), right, on="k", how=how
        )
        sh = hash_join(
            ray.data.from_arrow(_l_tbl()), ray.data.from_arrow(_r_tbl()),
            on="k", how=how, shards=4,
        )
        assert _rows(bc) == _rows(sh)


def test_broadcast_join_entirely_empty_right(ray_session):
    from tangent_ray.ops.joins import broadcast_join

    empty_right = ray.data.from_arrow(_r_tbl().slice(0, 0))
    inner = broadcast_join(
        ray.data.from_arrow(_l_tbl()), empty_right, on="k", how="inner"
    )
    assert inner.count() == 0
    left = broadcast_join(
        ray.data.from_arrow(_l_tbl()), empty_right, on="k", how="left"
    )
    rows = _rows(left)
    assert len(rows) == _l_tbl().num_rows
    # every right column is null on a left join against nothing
    df = left.to_pandas()
    assert df["v_r"].isna().all() and df["w"].isna().all()


def test_asof_join_rejects_null_ts(ray_session):
    import pytest

    from tangent_ray.ops.joins import asof_join

    left = _events([1], [1], [5])
    right = pa.table(
        {
            "event_id": pa.array([2], type=pa.int64()),
            "user_id": pa.array([1], type=pa.int64()),
            "ts": pa.array([None], type=pa.timestamp("us")),
        }
    )
    with pytest.raises(ValueError, match="null timestamps"):
        asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right), shards=2
        ).materialize()


def test_range_count_rejects_null_bounds(ray_session):
    import pytest

    from tangent_ray.ops.joins import range_count

    points = pa.table(
        {"event_id": pa.array([1], type=pa.int64()), "ts": _ts([100])}
    )
    intervals = pa.table(
        {"lo": pa.array([None], type=pa.timestamp("us")), "hi": _ts([150])}
    )
    # Ray may wrap the remote ValueError in RayTaskError/UserCodeException
    with pytest.raises(Exception, match="null timestamps"):
        range_count(
            ray.data.from_arrow(points), ray.data.from_arrow(intervals),
            bucket_us=1000,
        ).materialize()


def test_hash_join_semi_anti_outer_match_duckdb(ray_session):
    from tangent_ray.ops.joins import hash_join

    cases = (
        ("semi", "SELECT l.k, l.a, l.v FROM l SEMI JOIN r USING (k)"),
        ("anti", "SELECT l.k, l.a, l.v FROM l ANTI JOIN r USING (k)"),
        ("outer",
         "SELECT TRUE AS m, coalesce(l.k, r.k) AS k, "
         "l.a, l.v, r.v AS v_r, r.w FROM l FULL JOIN r ON l.k = r.k"),
    )
    for how, sql in cases:
        out = hash_join(
            ray.data.from_arrow(_l_tbl()), ray.data.from_arrow(_r_tbl()),
            on="k", how=how, shards=4,
        )
        def nkey(rows):
            return sorted(
                rows,
                key=lambda t: tuple((v is None, str(type(v)), v or 0)
                                    for v in t),
            )

        if how == "outer":
            # engine emits ONE k column; DuckDB's FULL JOIN keeps two —
            # the twin coalesces them plus a constant-true marker column
            # to keep the arity equal for the sorted-row comparison
            import duckdb

            df = out.to_pandas()
            df.insert(0, "m", True)
            got = [
                tuple(None if x != x else x for x in row)
                for row in df[sorted(df.columns)].itertuples(index=False)
            ]
            l, r = _l_tbl(), _r_tbl()  # noqa: F841
            wdf = duckdb.sql(sql).df()
            want = [
                tuple(
                    None if x != x
                    else (int(x) if isinstance(x, float) else x)
                    for x in row
                )
                for row in wdf[sorted(wdf.columns)].itertuples(index=False)
            ]
            assert nkey(got) == nkey(want)
        else:
            assert _rows(out) == _duck_rows(sql)


def test_hash_join_semi_anti_empty_right(ray_session):
    from tangent_ray.ops.joins import hash_join

    empty_r = ray.data.from_arrow(_r_tbl().slice(0, 0))
    semi = hash_join(ray.data.from_arrow(_l_tbl()), empty_r, on="k",
                     how="semi", shards=4)
    assert semi.count() == 0
    anti = hash_join(ray.data.from_arrow(_l_tbl()), empty_r, on="k",
                     how="anti", shards=4)
    assert _rows(anti) == sorted(
        tuple(None if x != x else x for x in row)
        for row in _l_tbl().to_pandas()[sorted(_l_tbl().column_names)]
        .itertuples(index=False)
    )


def test_broadcast_join_semi_anti(ray_session):
    from tangent_ray.ops.joins import broadcast_join, hash_join

    import pytest

    for how in ("semi", "anti"):
        bc = broadcast_join(
            ray.data.from_arrow(_l_tbl()), _r_tbl(), on="k", how=how
        )
        sh = hash_join(
            ray.data.from_arrow(_l_tbl()), ray.data.from_arrow(_r_tbl()),
            on="k", how=how, shards=4,
        )
        assert _rows(bc) == _rows(sh)
    with pytest.raises(ValueError, match="outer"):
        broadcast_join(
            ray.data.from_arrow(_l_tbl()), _r_tbl(), on="k", how="outer"
        )


def test_hash_join_semi_anti_outer_fuzz_vs_duckdb(ray_session):
    import duckdb

    from tangent_ray.ops.joins import hash_join

    rng = np.random.default_rng(13)
    for trial in range(3):
        nl, nr = int(rng.integers(1, 50)), int(rng.integers(1, 35))
        lk = rng.integers(0, 10, nl).astype(object)
        rk = rng.integers(0, 10, nr).astype(object)
        lk[rng.random(nl) < 0.15] = None
        rk[rng.random(nr) < 0.15] = None
        lt = pa.table(
            {"k": pa.array(lk.tolist(), type=pa.int64()),
             "a": pa.array(rng.integers(0, 999, nl), type=pa.int64())}
        )
        rt = pa.table(
            {"k": pa.array(rk.tolist(), type=pa.int64()),
             "b": pa.array(rng.integers(0, 999, nr), type=pa.int64())}
        )
        left = ray.data.from_arrow(lt)
        for how, sql, cols in (
            ("semi", "SELECT * FROM lt SEMI JOIN rt USING (k)", ["k", "a"]),
            ("anti", "SELECT * FROM lt ANTI JOIN rt USING (k)", ["k", "a"]),
            ("outer",
             "SELECT coalesce(lt.k, rt.k) AS k, a, b FROM lt "
             "FULL JOIN rt ON lt.k = rt.k", ["k", "a", "b"]),
        ):
            got = hash_join(
                left, ray.data.from_arrow(rt), on="k", how=how, shards=5
            ).to_pandas()
            want = duckdb.sql(sql).df()

            def canon(df):
                rows = [
                    tuple(None if v != v else int(v) for v in row)
                    for row in df[cols].itertuples(index=False)
                ]
                return sorted(
                    rows, key=lambda t: tuple((v is None, v or 0) for v in t)
                )

            assert canon(got) == canon(want), (trial, how)
