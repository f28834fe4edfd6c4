"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked result lists.

The production hybrid-search staple (Cormack/Clarke/Buettcher 2009, the
formula Elasticsearch/OpenSearch/Vespa ship): each leg (BM25 text top-k,
embedding-cosine ANN top-k, ...) contributes ``1 / (c + rank)`` per
document, legs are summed, and the fused (score desc, id asc) top-k wins.
Rank-based, so the legs' incomparable score scales never need calibrating.

Scale shape: fusion touches only the legs' top-``depth`` rows (k·legs
driver-side rows), never the corpora — the legs themselves run their own
distributed paths. The ANN leg defaults to IVF (``ops.ann.ivf_knn`` with
prebuilt centroids — O(N·nprobe/nlist) per query); exact brute-force
(``knn_cosine``, O(N) matmul per query) is the explicit ``ann="brute"``
opt-in for oracle twins and recall evaluation. For query batches use
:func:`hybrid_search_batch`: N queries share ONE ANN job (one centroid
assignment pass, one per-cluster matmul fan-out) instead of N dataset
jobs — at serving rates the per-job overhead dominates, so batching is
the difference between seconds and milliseconds per query."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rrf_fuse(
    legs: list[np.ndarray], k: int = 10, c: int = 60
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse ranked id arrays (position = rank-1) into the RRF top-k.

    Returns (ids, rrf_scores) sorted (score desc, id asc). An id may
    appear in any subset of legs; each appearance adds ``1/(c + rank)``.
    """
    from tangent_ray.query.scorer import _accumulate, _topk

    ids_l: list[np.ndarray] = []
    contrib_l: list[np.ndarray] = []
    for leg in legs:
        leg = np.asarray(leg, dtype=np.int64)
        ids_l.append(leg)
        contrib_l.append(1.0 / (c + np.arange(1, len(leg) + 1, dtype=np.float64)))
    # same per-id sum + (score desc, id asc) cut as the BM25 path
    return _topk(*_accumulate(ids_l, contrib_l), k)


def _ann_rank_lists(
    emb_ds,
    query_vecs: np.ndarray,
    depth: int,
    ann: str,
    centroids: np.ndarray | None,
    nlist: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> list[np.ndarray]:
    """Per-query ranked id arrays from ONE ANN job over all queries."""
    import ray

    from tangent_ray.ops.ann import ivf_knn, knn_cosine

    q = np.asarray(query_vecs, dtype=np.float64)
    if q.ndim == 1:
        q = q[None, :]
    if hasattr(ann, "search"):  # resident ops.ann.IVFReader — NO job
        t = ann.search(q, k=depth, nprobe=nprobe)
    else:
        if ann == "brute":
            out = knn_cosine(
                emb_ds, q, k=depth, id_col=id_col, vec_col=vec_col
            )
        elif ann == "ivf":
            out = ivf_knn(
                emb_ds, q, k=depth, nlist=nlist, nprobe=nprobe,
                id_col=id_col, vec_col=vec_col, centroids=centroids,
            )
        else:
            raise ValueError(
                f"unknown ann leg {ann!r} (use 'ivf', 'brute', or an "
                "IVFReader)"
            )
        parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        if not parts:
            return [np.empty(0, np.int64) for _ in range(len(q))]
        t = pa.concat_tables(parts).combine_chunks()
    qids = t["qid"].to_numpy(zero_copy_only=False).astype(np.int64)
    ranks = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    legs: list[np.ndarray] = []
    for qi in range(len(q)):
        m = qids == qi
        legs.append(ids[m][np.argsort(ranks[m], kind="stable")])
    return legs


def _fuse_one(
    d: np.ndarray, a: np.ndarray, k: int, c: int
) -> pa.Table:
    ids, scores = rrf_fuse([d, a], k=k, c=c)
    rank_of_d = {int(x): i + 1 for i, x in enumerate(d.tolist())}
    rank_of_a = {int(x): i + 1 for i, x in enumerate(a.tolist())}
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int32)),
            "docid": pa.array(ids, type=pa.int64()),
            "rrf_score": pa.array(scores, type=pa.float64()),
            "bm25_rank": pa.array(
                [rank_of_d.get(int(x), 0) for x in ids], type=pa.int32()
            ),
            "ann_rank": pa.array(
                [rank_of_a.get(int(x), 0) for x in ids], type=pa.int32()
            ),
        }
    )


def hybrid_search(
    scorer,
    text: str,
    emb_ds,
    query_vec: np.ndarray,
    k: int = 10,
    depth: int = 50,
    c: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ann: str = "ivf",
    centroids: np.ndarray | None = None,
    nlist: int = 64,
    nprobe: int = 8,
) -> pa.Table:
    """BM25 ∪ embedding-cosine hybrid top-k via RRF.

    ``scorer`` is a resident :class:`~tangent_ray.query.scorer.QueryScorer`
    over the text index; ``emb_ds`` a Dataset of document embeddings whose
    ``id_col`` shares the document id space of the index (one embedding
    per document). Each leg retrieves its own top-``depth``; fusion sees
    only those rows. The ANN leg is IVF by default — pass prebuilt
    ``centroids`` (``ops.ann.ivf_centroids``, built once per corpus) for
    serving, else they are trained on this call; ``ann="brute"`` opts into
    the exact O(N)-per-query matmul leg. Returns (rank, docid, rrf_score,
    bm25_rank, ann_rank) — 0 marks "not in that leg's top-depth"."""
    d, _ = scorer.score_query(text, "text", depth)
    legs = _ann_rank_lists(
        emb_ds, query_vec, depth, ann, centroids, nlist, nprobe,
        id_col, vec_col,
    )
    return _fuse_one(d, legs[0], k, c)


def hybrid_search_batch(
    scorer,
    texts: list[str],
    query_vecs: np.ndarray,
    emb_ds,
    k: int = 10,
    depth: int = 50,
    c: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ann: str = "ivf",
    centroids: np.ndarray | None = None,
    nlist: int = 64,
    nprobe: int = 8,
) -> pa.Table:
    """N hybrid queries through ONE ANN job: the BM25 legs run against the
    resident scorer (ms each, no job), the ANN legs share one centroid-
    assignment pass + per-cluster matmul fan-out. Per-query results are
    identical to N separate :func:`hybrid_search` calls with the same leg
    settings. Returns the per-query fused tables stacked with a leading
    ``qid`` column."""
    q = np.asarray(query_vecs, dtype=np.float64)
    if q.ndim == 1:
        q = q[None, :]
    if len(texts) != len(q):
        raise ValueError("texts and query_vecs must align")
    ann_legs = _ann_rank_lists(
        emb_ds, q, depth, ann, centroids, nlist, nprobe, id_col, vec_col
    )
    parts: list[pa.Table] = []
    for qi, text in enumerate(texts):
        d, _ = scorer.score_query(text, "text", depth)
        t = _fuse_one(d, ann_legs[qi], k, c)
        parts.append(
            t.add_column(0, "qid", pa.array(np.full(t.num_rows, qi, np.int32)))
        )
    return pa.concat_tables(parts)
