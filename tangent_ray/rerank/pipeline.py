"""Search + MSS rerank pipeline (the reference's two-stage retrieval).

Stage 1 is the core engine (tuple f-measure top-k from the inverted index,
``query/scorer.py``); stage 2 re-scores the top-k candidates' formulas with
MSS and re-sorts documents by their best expression's score vector — the
reference flow ``rerank_results.py`` + per-doc best-candidate fusion
(``comp_query.py:207-235``; doc sort ``ranking/query.py:307-332``).

Scale shape: stage 1 is the index lookup (actor pool); stage 2 touches only
``topk`` docs per query, so candidate texts are fetched with one filtered
column-pruned scan (candidate docid set broadcast into the filter) and the
MSS scoring itself is a small driver/actor computation — no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.rerank.mss import mss_score

RERANK_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("rank", pa.int32()),
        ("docid", pa.int64()),
        ("dockey", pa.string()),
        ("mss_h", pa.float64()),
        ("mss_unmatched", pa.int64()),
        ("mss_exact", pa.int64()),
        ("core_score", pa.float64()),
    ]
)


def candidate_slts(corpus_files: list[str], docids: set[int]) -> dict[int, list[str]]:
    """SLT spans of the candidate docs: one pruned scan, filter broadcast."""
    import ray.data

    from tangent_ray.config import EngineConfig
    from tangent_ray.sources.corpus import TranscriptsCorpus
    from tangent_ray.tokenize.batch import TokenizeBatch

    corpus = TranscriptsCorpus()
    wanted = np.fromiter(docids, dtype=np.int64)
    tok = TokenizeBatch(EngineConfig(), corpus)

    def fetch(batch: pa.Table) -> pa.Table:
        ids = corpus.docids(batch)
        mask = np.isin(ids, wanted)
        if not mask.any():
            return pa.table({"docid": pa.array([], pa.int64()), "slt": pa.array([], pa.string())})
        out_ids: list[int] = []
        out_slt: list[str] = []
        texts = corpus.texts(batch)
        for i in np.flatnonzero(mask):
            for slt in tok._spans_of(texts[i].as_py()):
                if slt is not None:
                    out_ids.append(int(ids[i]))
                    out_slt.append(slt)
        return pa.table(
            {"docid": pa.array(out_ids, pa.int64()), "slt": pa.array(out_slt, pa.string())}
        )

    got = (
        ray.data.read_parquet(corpus_files, columns=list(corpus.columns))
        .map_batches(fetch, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    by_doc: dict[int, list[str]] = {}
    for row in got:
        by_doc.setdefault(row["docid"], []).append(row["slt"])
    return by_doc


def combine_math(
    query_exprs: list[str],
    per_doc_candidates: dict[int, list[str]],
    how: str = "mss",
    size_norm: bool = False,
) -> dict[int, tuple]:
    """Per-document fusion of multi-expression math scores (the reference's
    ``combine_math`` — ``comp_query.py:176-256``).

    For every query expression the document's BEST candidate under the
    ``how`` metric is kept; the document's combined score vector is the
    per-expression weighted sum (weights uniform, or node-count-based with
    ``size_norm`` — ``comp_query.py:180-196``). ``how`` selects from the
    rerank metric registry (core bypass scores 1.0 per matched expression,
    like the reference's original-score passthrough normalized upstream).
    """
    from tangent_ray.rerank.metrics import METRICS

    if size_norm and query_exprs:
        qlens = [e.count("[") for e in query_exprs]
        total = float(sum(qlens)) or 1.0
        weights = [l / total for l in qlens]
    else:
        weights = [1.0 / max(1, len(query_exprs))] * len(query_exprs)

    if how == "core":
        def score(q: str, c: str) -> tuple:
            return (1.0,) if q == c else (0.0,)
    else:
        score = METRICS[how]

    out: dict[int, tuple] = {}
    for docid, cands in per_doc_candidates.items():
        allscore: list[float] | None = None
        for w, q in zip(weights, query_exprs):
            best: tuple | None = None
            for c in cands:
                s = score(q, c)
                if best is None or s > best:
                    best = s
            if best is None:
                continue
            if allscore is None:
                allscore = [0.0] * len(best)
            for j, v in enumerate(best):
                allscore[j] += float(v) * w
        out[docid] = tuple(allscore) if allscore else (0.0,)
    return out


def combine_math_text(
    math_scores: dict[int, tuple],
    text_scores: dict[int, float],
    n_math_exprs: int,
    n_keywords: int,
    mweight: float | None = None,
) -> dict[int, tuple]:
    """Fuse math-combined and normalized text scores per document
    (``comp_query.py:258-291``): final[0] = w*math[0] + (1-w)*text with the
    dynamic weight ``#exprs/(#exprs+#keywords)`` unless given; the remaining
    math score components ride along for lexicographic tie-breaks."""
    if mweight is None:
        total = n_math_exprs + n_keywords
        mweight = (n_math_exprs / total) if total else 0.0
    out: dict[int, tuple] = {}
    for docid in set(math_scores) | set(text_scores):
        m = math_scores.get(docid, (0.0,))
        t = text_scores.get(docid, 0.0)
        out[docid] = (mweight * m[0] + (1 - mweight) * t,) + tuple(m[1:])
    return out


def rerank_search(
    queries,
    index_dir: str,
    corpus_files: list[str],
    *,
    topk: int = 100,
    concurrency: int | tuple[int, int] = 2,
    metric: str = "mss",
) -> pa.Table:
    """Two-stage retrieval: core top-k then similarity rerank of formula
    queries under any registry ``metric`` (v00..v11; default MSS/v04).

    ``queries``: pyarrow Table / list of dicts with (query_id, kind, text).
    Only formula fragments take part in the rerank; text-only queries pass
    through with their core ranking (the reference reranks math results
    only). For non-MSS metrics the score vector's first component lands in
    ``mss_h`` and integer components 2-3 (when present) in the unmatched /
    exact columns — the lexicographic doc ordering is always the metric's.
    """
    from tangent_ray.query.scorer import search
    from tangent_ray.tokenize.batch import _MATH_RE

    if isinstance(queries, list):
        queries = pa.Table.from_pylist(queries)
    core = search(queries, index_dir, concurrency=concurrency, topk=topk)
    res = pa.Table.from_pylist(core.take_all())
    if res.num_rows == 0:
        return RERANK_SCHEMA.empty_table()

    # query_id -> first formula span (reference reranks per query expression)
    q_slt: dict[str, str] = {}
    for row in queries.to_pylist():
        spans = _MATH_RE.findall(row["text"])
        if not spans and "<math" in row["text"]:
            from tangent_ray.tokenize.mathml import (
                MATHML_SPAN_RE,
                MathMLError,
                mathml_to_slt,
            )

            for m in MATHML_SPAN_RE.findall(row["text"]):
                try:
                    spans.append(mathml_to_slt(m).serialize())
                    break
                except MathMLError:
                    pass
        if spans:
            q_slt[row["query_id"]] = spans[0]

    cand_ids = {
        r["docid"] for r in res.to_pylist() if r["query_id"] in q_slt
    }
    by_doc = candidate_slts(corpus_files, cand_ids) if cand_ids else {}

    out: list[dict] = []
    for qid in pc.unique(res["query_id"]).to_pylist():
        rows = res.filter(pc.equal(res["query_id"], qid)).to_pylist()
        slt = q_slt.get(qid)
        if slt is None:
            for r in rows:  # text query: core order passes through
                out.append(
                    dict(query_id=qid, rank=r["rank"], docid=r["docid"],
                         dockey=r["dockey"], mss_h=0.0, mss_unmatched=0,
                         mss_exact=0, core_score=r["score"])
                )
            continue
        if metric in ("mss", "v04"):
            score_fn = mss_score
        else:
            from tangent_ray.rerank.metrics import METRICS

            score_fn = lambda q, c: METRICS[metric](q, c)  # noqa: E731
        scored = []
        for r in rows:
            best: tuple | None = None
            for cand in by_doc.get(r["docid"], ()):  # best expression per doc
                s = score_fn(slt, cand)
                if best is None or s > best:
                    best = s
            scored.append((best if best is not None else (0.0,), r))
        scored.sort(
            key=lambda t: (tuple(-float(x) for x in t[0]), t[1]["docid"])
        )
        for i, (s, r) in enumerate(scored):
            s3 = (tuple(s) + (0, 0, 0))[:3]
            out.append(
                dict(query_id=qid, rank=i + 1, docid=r["docid"],
                     dockey=r["dockey"], mss_h=float(s3[0]),
                     mss_unmatched=int(s3[1]), mss_exact=int(s3[2]),
                     core_score=r["score"])
            )
    return pa.Table.from_pylist(out, schema=RERANK_SCHEMA)
