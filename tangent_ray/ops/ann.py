"""Similarity search over an embedding column (``list<float>``).

- ``knn_cosine``: brute-force cosine top-k — the query matrix is broadcast
  once (``ray.put``) and every batch does one float64 matmul against it;
  per-batch partial top-k rows are merged with one tiny final selection.
  Scales linearly with corpus size and is the exact baseline.
- ``lsh_knn``: random-hyperplane LSH bucketing as the approximate scale
  path — signatures per batch, candidates via ``groupby(bucket)``, exact
  rescoring only within buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return m / nrm


class BruteForceKNN:
    """map_batches stage: emits per-batch partial top-k (qid, vec_id, score)."""

    def __init__(self, query_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))  # (nq, d)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]))  # (n, d)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.q @ m.T  # (nq, n)
        k = min(self.k, sims.shape[1])
        out_q: list[int] = []
        out_id: list[int] = []
        out_s: list[float] = []
        for qi in range(sims.shape[0]):
            s = sims[qi]
            if len(s) > k:
                part = np.argpartition(-s, k - 1)[:k]
            else:
                part = np.arange(len(s))
            out_q.extend([qi] * len(part))
            out_id.extend(ids[part].tolist())
            out_s.extend(s[part].tolist())
        return pa.table(
            {
                "qid": pa.array(out_q, type=pa.int32()),
                self.id_col: pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def knn_cosine(ds, query_vecs: np.ndarray, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               concurrency: int | tuple[int, int] = (1, 4)):
    """Exact cosine top-k of each query vector; result (qid, id, score desc).

    Final merge happens on the tiny partial-top-k table (k rows per query per
    batch), sorted (score desc, id asc) — deterministic tie order."""
    import pandas as pd
    import ray

    ref = ray.put(np.asarray(query_vecs, dtype=np.float64))
    partial = ds.map_batches(
        BruteForceKNN,
        fn_constructor_args=(ref, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g

    return partial.groupby("qid").map_groups(final, batch_format="pandas")


class HyperplaneLSH:
    """Random-hyperplane signatures: (id, bucket) rows for ANN bucketing."""

    def __init__(self, n_planes: int = 12, dim: int = 64,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.RandomState(42)
        self.planes = rng.standard_normal((dim, n_planes))
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[self.vec_col])
        bits = (m @ self.planes) > 0
        bucket = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "bucket": pa.array(bucket.astype(np.int64), type=pa.int64()),
            }
        )


class PairFinder:
    """map_batches stage for exact near-dup: each batch's rows are compared
    against the full broadcast matrix; a pair (a, b) is emitted once under
    the a < b convention."""

    def __init__(self, full_ref, threshold: float, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        import ray

        ids, mat = ray.get(full_ref) if not isinstance(full_ref, tuple) else full_ref
        self.full_ids = np.asarray(ids, dtype=np.int64)
        self.full = _normalize(np.asarray(mat, dtype=np.float64))
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ self.full.T  # (n_batch, N)
        hit_r, hit_c = np.nonzero(
            (sims >= self.threshold) & (ids[:, None] < self.full_ids[None, :])
        )
        return pa.table(
            {
                "doc_a": pa.array(ids[hit_r], type=pa.int64()),
                "doc_b": pa.array(self.full_ids[hit_c], type=pa.int64()),
                "score": pa.array(sims[hit_r, hit_c], type=pa.float64()),
            }
        )


def near_dup_pairs(ds, threshold: float = 0.4, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Exact embedding-cosine near-duplicate pairs (cosine >= threshold).

    The full normalized matrix is broadcast once (``ray.put``) and every
    batch does one matmul against it — O(N^2 / P) work, the exact baseline.
    At corpus scale the broadcast side must fit worker memory; beyond that
    the LSH-bucketed (``HyperplaneLSH``) or IVF (``ivf_knn``) variants are
    the approximate scale path (bucket-local exact rescoring only).
    """
    import ray

    rows = ds.take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    ref = ray.put((ids, mat))
    return ds.map_batches(
        PairFinder,
        fn_constructor_args=(ref, threshold, id_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


class IVFAssign:
    """Assign each vector to its nearest coarse centroid (one matmul per batch)."""

    def __init__(self, centroids_ref, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        c = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.centroids = _normalize(np.asarray(c, dtype=np.float64))
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]))
        cluster = np.argmax(m @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(cluster, type=pa.int32()))


def ivf_centroids(ds, nlist: int, id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Deterministic coarse centroids: evenly-spaced vectors by sorted id
    (a seeded quantizer; full k-means is a drop-in upgrade)."""
    rows = sorted(ds.take_all(), key=lambda r: r[id_col])
    step = max(1, len(rows) // nlist)
    picks = rows[::step][:nlist]
    return np.array([r[vec_col] for r in picks], dtype=np.float64)


def ivf_knn(ds, query_vecs: np.ndarray, k: int = 10, nlist: int = 16, nprobe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF-style ANN: coarse-quantize into ``nlist`` clusters, probe the
    ``nprobe`` clusters nearest to each query, exact cosine rescoring only
    inside the probed clusters. The scale path for ``knn_cosine``: work
    drops from O(N) to O(N * nprobe / nlist) per query at some recall cost.
    """
    import ray

    cents = _normalize(ivf_centroids(ds, nlist, id_col, vec_col))
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = np.unique(probes)
    ref = ray.put(cents)
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_args=(ref, id_col, vec_col),
        batch_format="pyarrow", concurrency=(1, 4),
    ).filter(lambda r: r["cluster"] in set(wanted.tolist()))
    return knn_cosine(assigned, query_vecs, k=k, id_col=id_col, vec_col=vec_col)


def lsh_knn(ds, query_vecs: np.ndarray, k: int = 10, n_planes: int = 12,
            probe_hamming: int = 1, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Hyperplane-LSH bucketed ANN: rows are hashed to sign-pattern buckets
    (one matmul per batch), and only buckets within ``probe_hamming`` bit
    flips of a query's bucket are exactly rescored (multi-probe LSH).

    Work per query drops from O(N) to the probed buckets' share
    (~ sum_{i<=h} C(p,i) / 2^p of the corpus, uniform case) at some recall
    cost; ``knn_cosine`` is the exact baseline, ``ivf_knn`` the coarse-
    quantizer alternative.
    """
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    dim = q.shape[1]
    hasher = HyperplaneLSH(n_planes=n_planes, dim=dim, id_col=id_col, vec_col=vec_col)
    qbits = (q @ hasher.planes) > 0
    qbuckets = qbits @ (1 << np.arange(n_planes, dtype=np.int64))
    probes: set[int] = set(int(b) for b in qbuckets)
    if probe_hamming >= 1:
        for b in list(probes):
            for i in range(n_planes):
                probes.add(b ^ (1 << i))
    if probe_hamming >= 2:
        for b in list(probes):
            for i in range(n_planes):
                probes.add(b ^ (1 << i))

    planes = hasher.planes

    def in_probed(batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[vec_col]))
        bits = (m @ planes) > 0
        bucket = bits @ (1 << np.arange(n_planes, dtype=np.int64))
        keep = np.isin(bucket, np.fromiter(probes, dtype=np.int64))
        return batch.filter(pa.array(keep))

    cand = ds.map_batches(in_probed, batch_format="pyarrow", zero_copy_batch=True)
    return knn_cosine(cand, query_vecs, k=k, id_col=id_col, vec_col=vec_col)
