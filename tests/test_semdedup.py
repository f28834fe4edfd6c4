"""K-means clustering + semantic dedup (ops/ann.kmeans_cluster,
semantic_dedup): nearest-centroid property, first-wins keep rule vs a
brute-force in-cluster oracle, and a drive over the real embeddings table."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tangent_ray.ops.ann import (
    _normalize,
    _to_matrix,
    ivf_centroids,
    kmeans_cluster,
    semantic_dedup,
)


def _vec_table(vecs, ids=None):
    n = len(vecs)
    ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids)
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def _collect(ds_out, cols):
    import ray

    tabs = [t for t in ray.get(ds_out.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables([x.select(cols) for x in tabs])
    order = np.argsort(t[cols[0]].to_numpy(zero_copy_only=False))
    return t.take(pa.array(order))


def test_kmeans_cluster_nearest_centroid(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    # 3 well-separated blobs in 8-d
    centers = rng.normal(size=(3, 8)) * 10
    vecs = np.concatenate(
        [c + rng.normal(scale=0.1, size=(40, 8)) for c in centers]
    )
    tbl = _vec_table(vecs)
    ds = ray.data.from_arrow(tbl)
    out = _collect(
        kmeans_cluster(ds, k=3, iters=4), ["vec_id", "cluster", "sim"]
    )
    assert out.num_rows == 120
    cl = out["cluster"].to_numpy(zero_copy_only=False)
    sim = out["sim"].to_numpy(zero_copy_only=False)
    # every assignment is the argmax against the SAME centroids the op used
    cents = _normalize(ivf_centroids(ds, 3, iters=4))
    m = _normalize(_to_matrix(tbl["embedding"]))
    sims = m @ cents.T
    assert np.array_equal(cl, np.argmax(sims, axis=1).astype(np.int32))
    assert np.allclose(sim, sims[np.arange(120), cl])
    # blobs of one center share a cluster, different centers differ
    for b in range(3):
        assert len(set(cl[b * 40 : (b + 1) * 40])) == 1
    assert len(set(cl)) == 3


def _brute_semdedup(tbl, cents, threshold):
    """Oracle: same assignment, then per cluster first-wins by id over the
    exact cosine matrix."""
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    m = _normalize(_to_matrix(tbl["embedding"]))
    cl = np.argmax(m @ _normalize(cents).T, axis=1)
    keep, max_sim = {}, {}
    for c in np.unique(cl):
        sel = np.flatnonzero(cl == c)
        sel = sel[np.argsort(ids[sel])]
        for j, r in enumerate(sel):
            earlier = m[sel[:j]] @ m[r]
            max_sim[ids[r]] = float(earlier.max()) if j else -1.0
            keep[ids[r]] = max_sim[ids[r]] < threshold
    return keep, max_sim, {int(i): int(c) for i, c in zip(ids, cl)}


def test_semantic_dedup_matches_bruteforce(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    base = rng.normal(size=(30, 16))
    vecs = [base[i] for i in range(30)]
    # 10 near-copies of the first 10 vectors (tiny noise -> cosine ~ 1)
    for i in range(10):
        vecs.append(base[i] + rng.normal(scale=1e-3, size=16))
    tbl = _vec_table(np.array(vecs))
    ds = ray.data.from_arrow(tbl)
    out = _collect(
        semantic_dedup(ds, k=4, threshold=0.95, iters=2),
        ["vec_id", "cluster", "keep", "max_sim"],
    )
    assert out.num_rows == 40
    cents = ivf_centroids(ds, 4, iters=2)
    want_keep, want_sim, want_cl = _brute_semdedup(tbl, cents, 0.95)
    for i, c, kp, ms in zip(
        out["vec_id"].to_pylist(),
        out["cluster"].to_pylist(),
        out["keep"].to_pylist(),
        out["max_sim"].to_pylist(),
    ):
        assert c == want_cl[i]
        assert kp == want_keep[i], f"vec {i}"
        assert abs(ms - want_sim[i]) < 1e-9
    # the near-copies that share a cluster with their original are dropped
    dropped = {
        i for i, kp in zip(out["vec_id"].to_pylist(),
                           out["keep"].to_pylist()) if not kp
    }
    same_cluster_copies = {
        30 + i for i in range(10) if want_cl[30 + i] == want_cl[i]
    }
    assert same_cluster_copies <= dropped


def test_semantic_dedup_real_embeddings(ray_session):
    import ray.data

    path = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    out = _collect(
        semantic_dedup(ds, k=8, threshold=0.99),
        ["vec_id", "cluster", "keep", "max_sim"],
    )
    n = pq.read_metadata(path).num_rows
    assert out.num_rows == n
    # each cluster's minimum id is always kept (first-wins invariant)
    cl = out["cluster"].to_numpy(zero_copy_only=False)
    ids = out["vec_id"].to_numpy(zero_copy_only=False)
    keep = out["keep"].to_numpy(zero_copy_only=False)
    for c in np.unique(cl):
        sel = cl == c
        assert keep[sel][np.argmin(ids[sel])]
