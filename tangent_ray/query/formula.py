"""Formula-browsing search: one result row per matched EXPRESSION instance.

The reference's Task_FormulaBrowsing output is ``R docID position expression
score`` per formula instance (``mathindex.cpp:161-168`` output / qresult per
exprID expanded through ``subExprDoc``), while the transcripts serving path
returns doc-level rows. This module provides the expression-level layer:

- scoring is the EXACT core semantics ``F = 2*cc/(exprtc+querytc)``
  validated against the reference's published golden outputs
  (``tangent_ray/eval/golden.py`` — 28,822/28,822 concrete scores match);
- the Ray shape is a streaming ``map_batches`` sweep: each batch extracts
  its docs' math spans, scores DISTINCT expressions once against the
  broadcast query tuple bag, and emits only matching (expr, score, docid,
  pos) rows; the driver keeps the per-query top-k EXPRESSIONS and their
  instances — a partial-top-k merge like the kNN path, no shuffle.

Ties inside the top-k heap follow (score desc, expression asc); the
reference's heap breaks ties by exprID (corpus insertion order), which is
not reproducible across partitionings, so the lexicographic order is the
documented deterministic choice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("rank", pa.int32()),
        ("docid", pa.int64()),
        ("pos", pa.int32()),
        ("expr", pa.string()),
        ("score", pa.float64()),
    ]
)


class FormulaScorer:
    """map_batches stage: per-batch partial results for ALL queries.

    Query tuple bags are built once per actor in ``__init__`` (broadcast via
    constructor args); per batch, each distinct expression is expanded and
    scored once, whatever its instance count.
    """

    def __init__(self, queries: list[tuple[str, str]], window: int, eol: str,
                 corpus_json: str = "transcripts"):
        from tangent_ray.config import EngineConfig
        from tangent_ray.eval.golden import query_tuple_bag
        from tangent_ray.sources.corpus import corpus_from_json
        from tangent_ray.tokenize.batch import TokenizeBatch

        self.window = window
        self.eol = eol
        self.bags = [
            (qid, query_tuple_bag(expr, window, eol)) for qid, expr in queries
        ]
        self.corpus = corpus_from_json(corpus_json)
        self.tok = TokenizeBatch(EngineConfig(window=window, eol=eol), self.corpus)
        self._score_cache: dict[str, list[float]] = {}

    def _scores_of(self, expr: str) -> list[float]:
        got = self._score_cache.get(expr)
        if got is None:
            from tangent_ray.eval.golden import replay_score

            got = [
                replay_score(pls, var, qtc, expr, self.window, self.eol)
                for _qid, (pls, var, qtc) in self.bags
            ]
            self._score_cache[expr] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = self.corpus.docids(batch)
        texts = self.corpus.texts(batch)
        out = {k: [] for k in ("query_id", "docid", "pos", "expr", "score")}
        for i in range(len(ids)):
            txt = texts[i].as_py()
            if txt is None:
                continue
            for pos, slt in enumerate(self.tok._spans_of(txt)):
                if slt is None:
                    continue
                scores = self._scores_of(slt)
                for (qid, _bag), s in zip(self.bags, scores):
                    if s > 0.0:
                        out["query_id"].append(qid)
                        out["docid"].append(int(ids[i]))
                        out["pos"].append(pos)
                        out["expr"].append(slt)
                        out["score"].append(s)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.string()),
                "docid": pa.array(out["docid"], type=pa.int64()),
                "pos": pa.array(out["pos"], type=pa.int32()),
                "expr": pa.array(out["expr"], type=pa.string()),
                "score": pa.array(out["score"], type=pa.float64()),
            }
        )


def formula_search(
    queries: dict[str, str],
    corpus_files: list[str],
    *,
    window: int = 2,
    eol: str = "small",
    topk: int = 20,
    corpus_json: str = "transcripts",
    concurrency: int | tuple[int, int] | None = None,
) -> pa.Table:
    """Top-k expressions per query, one row per (docid, pos) instance.

    ``queries``: query_id -> SLT string (wildcards supported — the replay
    scorer implements the reference's ANY/IND wildcard semantics)."""
    import ray.data

    from tangent_ray.sources.corpus import corpus_from_json
    from tangent_ray.util import actor_pool

    if concurrency is None:
        # cluster-sized autoscaling pool — a hard (1, 4) cap starved the
        # corpus sweep to 4 busy cores on a 32-core node
        concurrency = actor_pool()
    corpus = corpus_from_json(corpus_json)
    ds = ray.data.read_parquet(corpus_files, columns=list(corpus.columns))
    partial = ds.map_batches(
        FormulaScorer,
        fn_constructor_args=(sorted(queries.items()), window, eol, corpus_json),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def batch_expr_topk(batch: pa.Table) -> pa.Table:
        """Batch-local expression top-k cut (exact): an expression's score
        is a pure function of (query, expr), so cutting every batch by the
        SAME total order (score desc, expr asc) can only drop expressions
        that have >= topk strictly-preceding expressions globally — never a
        member of the global top-k. Keeps the driver merge bounded to
        O(batches x queries x topk) expression groups instead of every
        matching instance in the corpus (a broad wildcard matches nearly
        everything)."""
        if batch.num_rows == 0:
            return batch
        import pyarrow.compute as pc

        def _enc(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.dictionary_encode(col)

        qenc, eenc = _enc(batch["query_id"]), _enc(batch["expr"])
        qc = qenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ec = eenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # lexicographic rank of each distinct expr; Arrow sorts strings by
        # UTF-8 bytes == code-point order, matching the driver merge's
        # Python sort, so the tie order is the SAME total order
        d_order = pc.sort_indices(eenc.dictionary).to_numpy(zero_copy_only=False)
        erank = np.empty(len(d_order), dtype=np.int64)
        erank[d_order] = np.arange(len(d_order))
        er = erank[ec]
        combo = qc * len(d_order) + er
        scores = batch["score"].to_numpy(zero_copy_only=False)
        # one row per DISTINCT (query, expr): score is a pure function of
        # the pair, so any representative instance carries it
        ukey, uidx = np.unique(combo, return_index=True)
        o = np.lexsort((er[uidx], -scores[uidx], qc[uidx]))
        sq = qc[uidx][o]
        new = np.concatenate([[True], sq[1:] != sq[:-1]])
        rank = np.arange(len(sq)) - np.flatnonzero(new)[np.cumsum(new) - 1]
        kept = ukey[o[rank < topk]]
        return batch.filter(pa.array(np.isin(combo, kept)))

    rows = partial.map_batches(
        batch_expr_topk, batch_format="pyarrow"
    ).take_all()

    out: dict[str, list] = {k: [] for k in RESULT_SCHEMA.names}
    # per query: rank EXPRESSIONS (score desc, expr asc), keep topk, then
    # emit every instance of the kept expressions
    by_q: dict[str, dict[str, tuple[float, list[tuple[int, int]]]]] = {}
    for r in rows:
        exprs = by_q.setdefault(r["query_id"], {})
        score, insts = exprs.get(r["expr"], (r["score"], []))
        insts.append((r["docid"], r["pos"]))
        exprs[r["expr"]] = (score, insts)
    for qid in sorted(by_q):
        ranked = sorted(
            by_q[qid].items(), key=lambda kv: (-kv[1][0], kv[0])
        )[:topk]
        for rank, (expr, (score, insts)) in enumerate(ranked, 1):
            for docid, pos in sorted(insts):
                out["query_id"].append(qid)
                out["rank"].append(rank)
                out["docid"].append(docid)
                out["pos"].append(pos)
                out["expr"].append(expr)
                out["score"].append(score)
    return pa.Table.from_pydict(out, schema=RESULT_SCHEMA)
