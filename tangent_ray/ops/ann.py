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

import os

import numpy as np
import pyarrow as pa

from tangent_ray.util import actor_pool


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # flatten() silently drops null lists, which would misalign every
        # row after the null against its id — fail loudly instead
        raise ValueError("embedding column contains null entries")
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    if n and len(flat) % n:
        raise ValueError("embedding lists are ragged (unequal lengths)")
    return flat.reshape(n, -1)


def _topk_ids(sims: np.ndarray, k: int) -> np.ndarray:
    """Per-row top-k column indices of ``sims``, ties broken by LOWEST
    column index (callers pre-sort columns by ascending id, making batch
    partial top-k deterministic under any block layout — an argpartition
    would drop arbitrary members of a tie crossing the k boundary)."""
    n = sims.shape[1]
    if n <= k:
        return np.broadcast_to(np.arange(n), (sims.shape[0], n))
    return np.argsort(-sims, axis=1, kind="stable")[:, :k]


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
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # id-ascending column order makes the stable top-k tie rule
        # (score desc, id asc) exact per batch, not just at the final merge
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        sims = self.q @ m.T  # (nq, n)
        nq = sims.shape[0]
        part = _topk_ids(sims, self.k)
        qidx = np.repeat(np.arange(nq, dtype=np.int32), part.shape[1])
        flat = part.ravel()
        return pa.table(
            {
                "qid": pa.array(qidx, type=pa.int32()),
                self.id_col: pa.array(ids[flat], type=pa.int64()),
                "score": pa.array(
                    sims[np.repeat(np.arange(nq), part.shape[1]), flat],
                    type=pa.float64(),
                ),
            }
        )


def _final_topk(partial, k: int, id_col: str):
    """Merge per-batch partial top-k rows: global (score desc, id asc) per
    qid with dense ranks — the tiny final selection shared by every kNN
    variant."""
    import pandas as pd

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g

    return partial.groupby("qid").map_groups(final, batch_format="pandas")


def knn_cosine(ds, query_vecs: np.ndarray, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               concurrency: int | tuple[int, int] | None = None):
    """Exact cosine top-k of each query vector; result (qid, id, score desc).

    Final merge happens on the tiny partial-top-k table (k rows per query per
    batch), sorted (score desc, id asc) — deterministic tie order."""
    import ray

    ref = ray.put(np.asarray(query_vecs, dtype=np.float64))
    partial = ds.map_batches(
        BruteForceKNN,
        fn_constructor_args=(ref, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool(),
    )
    return _final_topk(partial, k, id_col)


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


def near_dup_pairs(ds, threshold: float = 0.4, id_col: str = "vec_id",
                   vec_col: str = "embedding", n_blocks: int = 4):
    """Exact embedding-cosine near-duplicate pairs (cosine >= threshold).

    Block-pair join — nothing materializes on the driver and no worker ever
    holds the full matrix: each row is hash-assigned to one of ``n_blocks``
    blocks and replicated into the ``n_blocks`` (block_i <= block_j) group
    tasks its block participates in; each group computes ONE cross (or
    within-block upper-triangle) matmul. Total compute stays O(N^2) (it is
    an exact all-pairs), but per-task memory is O((N/n_blocks)^2) and the
    only shuffle is the pair-key groupby (x n_blocks replication). Size
    ``n_blocks`` so one block's matrix fits a worker; the LSH-bucketed
    (``HyperplaneLSH``) or IVF variants remain the sub-quadratic
    approximate path.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = ((ids * np.int64(2654435761)) % np.int64(2**31)) % n_blocks
        keys: list[np.ndarray] = []
        idx: list[np.ndarray] = []
        blks: list[np.ndarray] = []
        for g in range(n_blocks):
            lo = np.minimum(blk, g)
            hi = np.maximum(blk, g)
            keys.append(lo * n_blocks + hi)
            idx.append(np.arange(len(ids), dtype=np.int64))
            blks.append(blk)
        take = np.concatenate(idx)
        rep = batch.take(pa.array(take))
        return rep.append_column(
            "pair_key", pa.array(np.concatenate(keys), type=pa.int32())
        ).append_column("blk", pa.array(np.concatenate(blks), type=pa.int32()))

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def group_pairs(g: pa.Table) -> pa.Table:
        key = int(g["pair_key"][0].as_py())
        bi, bj = key // n_blocks, key % n_blocks
        # the two blocks arrive deduplicated per (row, group): a row of
        # block b appears here exactly once
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = g["blk"].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(g[vec_col]))
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        if bi == bj:
            # within-block: each row arrives exactly once (its g==b replica);
            # unique is defensive against upstream duplicate ids
            _, first = np.unique(ids, return_index=True)
            ids, m = ids[first], m[first]
            if len(ids) < 2:
                return empty
            sims = m @ m.T
            r, c = np.nonzero(
                (sims >= threshold) & (ids[:, None] < ids[None, :])
            )
        else:
            li = blk == bi
            lj = blk == bj
            if not li.any() or not lj.any():
                return empty
            ia, ma = ids[li], m[li]
            ib, mb = ids[lj], m[lj]
            sims = ma @ mb.T
            r, c = np.nonzero(sims >= threshold)
            a_ids, b_ids = ia[r], ib[c]
            s = sims[r, c]
            lo = np.minimum(a_ids, b_ids)
            hi = np.maximum(a_ids, b_ids)
            return pa.table(
                {
                    "doc_a": pa.array(lo, type=pa.int64()),
                    "doc_b": pa.array(hi, type=pa.int64()),
                    "score": pa.array(s, type=pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(ids[r], type=pa.int64()),
                "doc_b": pa.array(ids[c], type=pa.int64()),
                "score": pa.array(sims[r, c], type=pa.float64()),
            }
        )

    return exploded.groupby("pair_key").map_groups(
        group_pairs, batch_format="pyarrow"
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


def ivf_centroids(ds, nlist: int, id_col: str = "vec_id",
                  vec_col: str = "embedding", iters: int = 1,
                  oversample: int = 8) -> np.ndarray:
    """Coarse centroids without materializing the dataset on the driver.

    1. Deterministic hash sample: each batch keeps rows whose id-hash falls
       under ``nlist * oversample / N`` — only O(nlist) sampled vectors ever
       reach the driver, whatever N is.
    2. ``iters`` distributed Lloyd steps: assignment + per-cluster partial
       (sum, count) inside ``map_batches``; the driver reduces the tiny
       (n_batches x nlist)-row partial table into new means. This is real
       distributed k-means — each step is one streaming pass.
    """
    import ray

    n = ds.count()
    if n == 0:
        raise ValueError("ivf_centroids: empty dataset")
    target = nlist * oversample

    def sample_at(thresh: np.uint64):
        def sample(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            # splitmix64-style mix, deterministic across processes
            h = ids * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
            with np.errstate(over="ignore"):
                h *= np.uint64(0xBF58476D1CE4E5B9)
            keep = (h >> np.uint64(1)) < thresh
            return batch.filter(pa.array(keep))

        return sample

    # widen the hash sample on under-selection instead of materializing the
    # dataset — the driver only ever holds O(target) sampled rows
    frac = min(1.0, target / n)
    rows: list = []
    while True:
        thresh = np.uint64(min(1.0, frac) * 2**63)
        cand = ds.map_batches(
            sample_at(thresh), batch_format="pyarrow", zero_copy_batch=True
        )
        rows = sorted(cand.take_all(), key=lambda r: r[id_col])  # O(target)
        if len(rows) >= nlist or frac >= 1.0:
            break
        frac = min(1.0, frac * 8)
    step = max(1, len(rows) // nlist)
    cents = np.array(
        [r[vec_col] for r in rows[::step][:nlist]], dtype=np.float64
    )

    for _ in range(iters):
        ref = ray.put(_normalize(cents))

        class _PartialMeans:
            def __init__(self, cref):
                self.cents = ray.get(cref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                m = _to_matrix(batch[vec_col])
                a = np.argmax(_normalize(m) @ self.cents.T, axis=1)
                k, d = self.cents.shape
                sums = np.zeros((k, d))
                np.add.at(sums, a, m)
                counts = np.bincount(a, minlength=k)
                nz = counts > 0
                return pa.table(
                    {
                        "cluster": pa.array(
                            np.flatnonzero(nz).astype(np.int32), type=pa.int32()
                        ),
                        "count": pa.array(counts[nz], type=pa.int64()),
                        "vsum": pa.array(
                            sums[nz].tolist(), type=pa.list_(pa.float64())
                        ),
                    }
                )

        parts = ds.map_batches(
            _PartialMeans, fn_constructor_args=(ref,),
            batch_format="pyarrow", concurrency=actor_pool(),
        ).take_all()  # <= n_batches * nlist tiny rows
        k, d = cents.shape
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["vsum"])
            counts[r["cluster"]] += r["count"]
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz, None]
    return cents


def ivf_knn(ds, query_vecs: np.ndarray, k: int = 10, nlist: int = 16, nprobe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            centroids: np.ndarray | None = None):
    """IVF-style ANN: coarse-quantize into ``nlist`` clusters, probe the
    ``nprobe`` clusters nearest to each query, exact cosine rescoring only
    inside the probed clusters. The scale path for ``knn_cosine``: work
    drops from O(N) to O(N * nprobe / nlist) PER QUERY at some recall cost
    — the cluster groupby scores each cluster against only the queries
    that probe it (a shared filter-then-score-everything plan would decay
    to O(N) per query as soon as many queries' probe sets cover all
    clusters). Pass prebuilt ``centroids`` (from :func:`ivf_centroids`,
    built ONCE per corpus) for serving — training them per call costs
    extra dataset passes that a resident path must not pay.
    """
    import ray

    import pyarrow.compute as pc

    cents = _normalize(
        centroids
        if centroids is not None
        else ivf_centroids(ds, nlist, id_col, vec_col)
    )
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = pa.array(np.unique(probes).astype(np.int32), type=pa.int32())
    # cluster -> qids probing it (tiny: nq * nprobe entries, shipped in the
    # group fn's closure alongside the query matrix ref)
    probe_map = {
        int(c): np.flatnonzero((probes == c).any(axis=1)).astype(np.int32)
        for c in np.unique(probes)
    }
    cref = ray.put(cents)
    qref = ray.put(q)
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_args=(cref, id_col, vec_col),
        batch_format="pyarrow", concurrency=actor_pool(),
    ).map_batches(
        # vectorized probed-cluster filter (no per-row Python lambda):
        # a row probed by ANY query must be read, so the union filter is
        # the I/O-optimal candidate cut
        lambda b: b.filter(pc.is_in(b["cluster"], value_set=wanted)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def per_cluster(g: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        c = int(g["cluster"][0].as_py())
        qids = probe_map.get(c)
        empty = pa.table(
            {
                "qid": pa.array([], type=pa.int32()),
                id_col: pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        if qids is None or not len(qids) or g.num_rows == 0:
            return empty
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _normalize(_to_matrix(g[vec_col]))[order]
        sims = qm[qids] @ m.T
        part = _topk_ids(sims, k)
        flat = part.ravel()
        return pa.table(
            {
                "qid": pa.array(
                    np.repeat(qids, part.shape[1]), type=pa.int32()
                ),
                id_col: pa.array(ids[flat], type=pa.int64()),
                "score": pa.array(
                    sims[
                        np.repeat(np.arange(len(qids)), part.shape[1]), flat
                    ],
                    type=pa.float64(),
                ),
            }
        )

    partial = assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow"
    )
    return _final_topk(partial, k, id_col)


def build_ivf_index(ds, out_dir: str, nlist: int = 64, iters: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    centroids: np.ndarray | None = None,
                    recall_sample: int = 32, recall_k: int = 10) -> dict:
    """Persist a cluster-partitioned IVF index: ONE assignment pass writes
    the corpus as Parquet partitioned by ``cluster=K/`` dirs, plus the
    centroid matrix and a manifest.

    This is the resident-serving counterpart of :func:`ivf_knn` (which
    re-shuffles the corpus by cluster on EVERY call — right for one-off
    batch jobs, wrong at query rates): the cluster partitioning is paid
    once at build, and :class:`IVFReader` then touches only the probed
    clusters' files per query — O(N·nprobe/nlist) bytes, no job, no
    shuffle. The same build-once/serve-many split as the BM25 index and
    the positional postings.

    Recall guardrail: ``recall_sample`` corpus vectors (deterministic —
    the dataset's first rows) are probed against the brute ground truth
    (nprobe = nlist) at build time, and the MEASURED recall@``recall_k``
    per nprobe lands in the manifest as ``recall_curve`` — operators pick
    nprobe from data, not folklore (``IVFReader.min_nprobe``). Pass
    ``recall_sample=0`` to skip."""
    import json

    import ray

    cents = _normalize(
        centroids
        if centroids is not None
        else ivf_centroids(ds, nlist, id_col, vec_col, iters=iters)
    )
    cref = ray.put(cents)
    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(
        IVFAssign, fn_constructor_args=(cref, id_col, vec_col),
        batch_format="pyarrow", concurrency=actor_pool(),
    ).write_parquet(os.path.join(out_dir, "clusters"),
                    partition_cols=["cluster"])
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    manifest = {
        "nlist": int(cents.shape[0]), "dim": int(cents.shape[1]),
        "id_col": id_col, "vec_col": vec_col,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if recall_sample > 0:
        manifest.update(_measure_recall(ds, out_dir, vec_col,
                                        recall_sample, recall_k))
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def _measure_recall(ds, out_dir: str, vec_col: str, n_sample: int,
                    k: int) -> dict:
    """Sampled recall@k per nprobe against the brute (nprobe=nlist)
    ground truth, measured on the JUST-BUILT index. Cost: one exact scan
    of the index for ``n_sample`` queries plus the nprobe sweep over the
    reader's (cached) clusters — build-time only."""
    # deterministic sample: the dataset's first n rows
    rows = ds.limit(n_sample).select_columns([vec_col]).take_all()
    qv = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    reader = IVFReader(out_dir)
    nlist = reader.centroids.shape[0]
    truth = reader.search(qv, k=k, nprobe=nlist)
    id_col = reader.manifest["id_col"]

    def per_query_sets(t):
        out: dict[int, set] = {}
        for q_, i_ in zip(t["qid"].to_pylist(), t[id_col].to_pylist()):
            out.setdefault(q_, set()).add(i_)
        return out

    tsets = per_query_sets(truth)
    curve: dict[str, float] = {}
    p = 1
    probes: list[int] = []
    while p < nlist:
        probes.append(p)
        p *= 2
    probes.append(nlist)
    for p in probes:
        rsets = per_query_sets(reader.search(qv, k=k, nprobe=p))
        recalls = [
            len(rsets.get(q_, set()) & ts) / max(1, len(ts))
            for q_, ts in tsets.items()
        ]
        curve[str(p)] = round(float(np.mean(recalls)) if recalls else 1.0, 4)
    return {
        "recall_curve": curve,
        "recall_k": int(k),
        "recall_sample": int(len(qv)),
    }


class IVFReader:
    """Resident IVF serving: centroids in memory, per-cluster (ids, unit
    matrix) loaded lazily from the partitioned files and cached. A query
    batch probes ``nprobe`` clusters per query and runs one matmul per
    probed cluster over the UNION of the queries probing it — N queries
    share the cluster loads and the matmuls (the batching lever)."""

    MAX_RESIDENT = 64  # cluster matrices kept hot

    def __init__(self, index_dir: str):
        import json

        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        self._root = os.path.join(index_dir, "clusters")
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _cluster(self, c: int) -> tuple[np.ndarray, np.ndarray]:
        got = self._cache.get(c)
        if got is not None:
            return got
        import pyarrow.parquet as pq

        d = os.path.join(self._root, f"cluster={c}")
        if not os.path.isdir(d):
            out = (np.empty(0, np.int64), np.empty((0, 0)))
        else:
            id_col = self.manifest["id_col"]
            t = pq.read_table(d, columns=[id_col, self.manifest["vec_col"]])
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _normalize(_to_matrix(t[self.manifest["vec_col"]]))
            order = np.argsort(ids, kind="stable")  # the tie rule's order
            out = (ids[order], m[order])
        if len(self._cache) < self.MAX_RESIDENT:
            self._cache[c] = out
        return out

    def min_nprobe(self, target_recall: float = 0.9) -> int:
        """Smallest nprobe whose BUILD-MEASURED recall@k (the manifest's
        ``recall_curve``) meets ``target_recall`` — data-driven probe
        sizing instead of folklore. Falls back to probing every cluster
        when the index was built without a recall sample or no measured
        point reaches the target."""
        curve = self.manifest.get("recall_curve") or {}
        best = None
        for p_str, r in curve.items():
            p = int(p_str)
            if r >= target_recall and (best is None or p < best):
                best = p
        return best if best is not None else self.centroids.shape[0]

    def search(self, query_vecs: np.ndarray, k: int = 10,
               nprobe: int = 8) -> pa.Table:
        """(qid, id, score, rank) — per-query exact cosine over the probed
        clusters, (score desc, id asc) ties, dense ranks."""
        q = _normalize(np.atleast_2d(np.asarray(query_vecs, np.float64)))
        nprobe = min(nprobe, self.centroids.shape[0])
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        id_col = self.manifest["id_col"]
        # cluster -> probing queries, so each loaded cluster is scored once
        by_cluster: dict[int, list[int]] = {}
        for qi, row in enumerate(probes):
            for c in row:
                by_cluster.setdefault(int(c), []).append(qi)
        parts_ids: list[list[np.ndarray]] = [[] for _ in range(len(q))]
        parts_scores: list[list[np.ndarray]] = [[] for _ in range(len(q))]
        for c, qis in by_cluster.items():
            ids, m = self._cluster(c)
            if not len(ids):
                continue
            sims = q[qis] @ m.T
            part = _topk_ids(sims, k)
            for r, qi in enumerate(qis):
                parts_ids[qi].append(ids[part[r]])
                parts_scores[qi].append(sims[r][part[r]])
        out_q: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        for qi in range(len(q)):
            if not parts_ids[qi]:
                continue
            ids = np.concatenate(parts_ids[qi])
            scores = np.concatenate(parts_scores[qi])
            order = np.lexsort((ids, -scores))[:k]
            out_q.append(np.full(len(order), qi, np.int32))
            out_i.append(ids[order])
            out_s.append(scores[order])
            out_r.append(np.arange(1, len(order) + 1, dtype=np.int32))
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], pa.int32()),
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int32()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int32()),
                id_col: pa.array(np.concatenate(out_i), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
                "rank": pa.array(np.concatenate(out_r), pa.int32()),
            }
        )


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
    # each pass expands the frontier by one bit flip -> Hamming radius grows
    # by exactly 1 per iteration (probe_hamming is honored for any radius)
    for _ in range(probe_hamming):
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


# ---------------------------------------------------------------------------
# K-means corpus clustering + semantic dedup (SemDeDup)


def kmeans_cluster(ds, k: int, iters: int = 3, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Cluster every vector: (id, cluster, sim) with ``sim`` the cosine to
    its own centroid — the corpus-partitioning primitive for
    cluster-scoped curation (SemDeDup, density filtering, topic caps).
    Centroids come from the distributed sample+Lloyd of ``ivf_centroids``
    (never materializes the dataset); assignment is one broadcast matmul
    per batch. No shuffle at all — the output streams."""
    import ray

    cents = _normalize(ivf_centroids(ds, k, id_col, vec_col, iters=iters))
    cref = ray.put(cents)

    class _Assign(IVFAssign):
        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(batch[self.vec_col]))
            sims = m @ self.centroids.T
            cluster = np.argmax(sims, axis=1).astype(np.int32)
            return pa.table(
                {
                    self.id_col: batch[self.id_col],
                    "cluster": pa.array(cluster, type=pa.int32()),
                    "sim": pa.array(
                        sims[np.arange(len(cluster)), cluster],
                        type=pa.float64(),
                    ),
                }
            )

    return ds.map_batches(
        _Assign, fn_constructor_args=(cref, id_col, vec_col),
        batch_format="pyarrow", concurrency=actor_pool(),
    )


def semantic_dedup(ds, k: int = 16, threshold: float = 0.95, iters: int = 3,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Semantic dedup (Abbas et al. 2023, SemDeDup, arXiv:2303.09540):
    k-means-cluster the embeddings, then WITHIN each cluster drop every
    vector that has an earlier (smaller-id) vector at cosine >=
    ``threshold`` — first-wins, the same keep rule as every dedup op here.
    Returns (id, cluster, keep, max_sim) for every vector, ``max_sim`` the
    cosine to the nearest EARLIER in-cluster vector (null-equivalent -1.0
    for each cluster's first).

    Cross-cluster near-dups are invisible by construction — that is
    SemDeDup's published accuracy/cost trade, not an implementation gap.
    Scale note: one payload-rate shuffle (vectors move to their cluster
    group) + an O(m^2 / k) in-cluster matmul; pick k so m/k vectors fit a
    worker (the paper uses k ~ sqrt(N))."""
    import ray

    cents = _normalize(ivf_centroids(ds, k, id_col, vec_col, iters=iters))
    cref = ray.put(cents)
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_args=(cref, id_col, vec_col),
        batch_format="pyarrow", concurrency=actor_pool(),
    )

    def per_cluster(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int32()),
                "keep": pa.array([], type=pa.bool_()),
                "max_sim": pa.array([], type=pa.float64()),
            }
        )
        if g.num_rows == 0:
            return empty
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _normalize(_to_matrix(g[vec_col]))[order]
        sims = m @ m.T
        # max cosine to any EARLIER (smaller-id) vector: strict lower
        # triangle only (upper + diagonal forced below any cosine, so the
        # first row reports -1). Masked in row CHUNKS — np.triu_indices(m)
        # would allocate two O(m^2) int64 arrays, tripling the peak beyond
        # the sims matrix itself
        n_rows = len(ids)
        col = np.arange(n_rows)
        for st in range(0, n_rows, 1024):
            en = min(st + 1024, n_rows)
            blk = sims[st:en]
            blk[col[None, :] >= np.arange(st, en)[:, None]] = -1.0
        max_sim = sims.max(axis=1)
        keep = max_sim < threshold
        cl = np.full(len(ids), int(g["cluster"][0].as_py()), dtype=np.int32)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "cluster": pa.array(cl, type=pa.int32()),
                "keep": pa.array(keep, type=pa.bool_()),
                "max_sim": pa.array(max_sim, type=pa.float64()),
            }
        )

    return assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow"
    )
