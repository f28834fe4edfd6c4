"""More-like-this: find documents similar to a given document's text.

The Lucene MoreLikeThis recipe: pick the source document's most
interesting terms by tf·idf (idf the engine's own BM25 idf, so "interest"
and scoring agree), form an OR query of the top ``max_query_terms``, score
it with the ordinary BM25 path, and drop the source document itself from
the results. Everything reuses the resident scorer — term selection costs
one tokenize + ``global_df`` probes, scoring touches only the selected
terms' postings.

Deterministic: term selection ties break (weight desc, term asc); results
carry the scorer's (score desc, docid asc) order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tangent_ray.query.scorer import QueryScorer, _bm25_idf, _topk
from tangent_ray.tokenize.text import tokenize_text


def mlt_terms(
    scorer: QueryScorer, text: str, max_query_terms: int = 25
) -> list[str]:
    """The source text's top terms by ``tf * idf`` against the index
    (ties: weight desc, term asc), excluding terms absent from the corpus
    (df 0 — they cannot contribute to any match)."""
    _, terms, tfs, _, _ = tokenize_text(
        pa.array([text], type=pa.string()), stem=scorer.cfg.stem
    )
    r = scorer.reader
    scored: list[tuple[float, str]] = []
    for term, tf in zip(terms.to_pylist(), tfs):
        df = r.global_df(term)
        if df == 0:
            continue
        scored.append((float(tf) * float(_bm25_idf(r.N, df)), term))
    scored.sort(key=lambda wt: (-wt[0], wt[1]))
    return [t for _, t in scored[:max_query_terms]]


def more_like_this(
    scorer: QueryScorer,
    text: str,
    k: int = 10,
    max_query_terms: int = 25,
    exclude_docids: tuple[int, ...] = (),
) -> pa.Table:
    """Top-k documents most similar to ``text``; ``exclude_docids`` (the
    source document) never appear. Returns (rank, docid, score)."""
    sel = sorted(mlt_terms(scorer, text, max_query_terms))
    scorer.last_stats = {"postings": 0, "terms": 0, "candidates": 0}
    d, s = scorer._score_bm25(sel, None)
    dead = scorer.reader.tombstones
    if dead.size and len(d):
        from tangent_ray.util import sorted_lookup

        hit, _ = sorted_lookup(dead, d)
        if hit.any():
            d, s = d[~hit], s[~hit]
    if exclude_docids and len(d):
        drop = np.isin(d, np.asarray(sorted(exclude_docids), dtype=np.int64))
        d, s = d[~drop], s[~drop]
    d, s = _topk(d, s, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(d) + 1, dtype=np.int32)),
            "docid": pa.array(d.astype(np.int64), type=pa.int64()),
            "score": pa.array(s, type=pa.float64()),
        }
    )
