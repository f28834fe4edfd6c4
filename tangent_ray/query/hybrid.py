"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked result lists.

The production hybrid-search staple (Cormack/Clarke/Buettcher 2009, the
formula Elasticsearch/OpenSearch/Vespa ship): each leg (BM25 text top-k,
embedding-cosine ANN top-k, ...) contributes ``1 / (c + rank)`` per
document, legs are summed, and the fused (score desc, id asc) top-k wins.
Rank-based, so the legs' incomparable score scales never need calibrating.

Scale shape: fusion touches only the legs' top-``depth`` rows (k·legs
driver-side rows), never the corpora — the legs themselves run their own
distributed paths (BM25 actor pool / `ops.ann.knn_cosine` broadcast
matmul)."""

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
) -> pa.Table:
    """BM25 ∪ embedding-cosine hybrid top-k via RRF.

    ``scorer`` is a resident :class:`~tangent_ray.query.scorer.QueryScorer`
    over the text index; ``emb_ds`` a Dataset of document embeddings whose
    ``id_col`` shares the document id space of the index (one embedding
    per document). Each leg retrieves its own top-``depth``; fusion sees
    only those rows. Returns (rank, docid, rrf_score, bm25_rank,
    ann_rank) — 0 marks "not in that leg's top-depth"."""
    from tangent_ray.ops.ann import knn_cosine

    d, _ = scorer.score_query(text, "text", depth)
    ann = knn_cosine(
        emb_ds, np.asarray(query_vec, dtype=np.float64)[None, :], k=depth,
        id_col=id_col, vec_col=vec_col,
    )
    if isinstance(ann, pa.Table):
        ann_t = ann
    else:  # a Dataset of k rows carrying explicit dense ranks
        import ray

        parts = [t for t in ray.get(ann.to_arrow_refs()) if t.num_rows]
        ann_t = (
            pa.concat_tables(parts) if parts
            else pa.table(
                {id_col: pa.array([], pa.int64()),
                 "rank": pa.array([], pa.int32())}
            )
        )
    if "rank" in ann_t.column_names and ann_t.num_rows:
        ann_t = ann_t.sort_by("rank")
    a = ann_t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
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
