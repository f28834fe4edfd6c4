"""Expression tuple-count statistics + expression reordering (A10 + K5).

The reference's ``reorder`` pass (``mathindex.cpp:81-114``) sorts the
per-unique-expression tuple counts, reports the quartiles ``q1``/``q2`` and
a 20-bucket distribution (A10), then relabels expression IDs so the
mid-frequency quartile ``(q1, q2]`` comes first and the rarest come last
(K5): ``od = tc - q1`` if ``q1 < tc <= q2``, ``q2 + 1 - tc`` if
``tc <= q1``, else ``tc``.

Ray-native shape: tuple counts are SMALL integers, so the full sorted-order
statistics come from an exact count histogram — each batch contributes a
``bincount`` partial, the driver folds the tiny (tc -> n) table, and any
rank statistic (the C++ ``e[i].tc`` at sorted index ``i``) reads off the
cumulative counts. No global sort, no driver materialization of the
expressions. The relabeling itself is likewise a histogram-offset dense
rank: a broadcast cumulative histogram of ``od`` gives each group its base
offset and a per-group stable sort assigns ids inside it — one groupby
instead of a global sort.

(Our engine's postings stay in docid order — the (conv_id, turn_idx)
invariant — so the reordered ids are an auxiliary expression-dictionary
layout, not a postings rewrite; the reference applies it to its exprID
space for skip-bound locality, SURVEY §2.6 K5 note.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.config import EngineConfig

#: per-worker-process tokenizer cache (same pattern as build.tokenize_task)
_SPAN_TOK_CACHE: dict = {}


def _span_tokenizer(cfg_json: str):
    tok = _SPAN_TOK_CACHE.get(cfg_json)
    if tok is None:
        from tangent_ray.sources.corpus import DocumentsCorpus
        from tangent_ray.tokenize.batch import TokenizeBatch

        tok = TokenizeBatch(EngineConfig.from_json(cfg_json), DocumentsCorpus())
        _SPAN_TOK_CACHE[cfg_json] = tok
    return tok


def expr_tuple_counts(ds, cfg: EngineConfig | None = None, text_col: str = "text"):
    """Unique math expressions of a corpus with their tuple counts.

    Returns a Dataset of (ehash:int64, tc:int32) — one row per distinct
    expression (SLT string), ``tc`` its symbol-pair tuple count under
    ``cfg``'s window/EOL settings (the reference's ``exprTC`` array,
    ``mathindexbase.h:38-43``). Expressions are deduplicated by a 64-bit
    content hash via one aggregate; the SLT text itself never shuffles.
    """
    from ray.data.aggregate import Min

    cfg = cfg or EngineConfig()
    window, eol = cfg.window, cfg.eol

    cfg_json = cfg.to_json()

    def spans(batch: pa.Table) -> pa.Table:
        import hashlib

        from tangent_ray.tokenize.slt import parse_slt, slt_tuples

        tok = _span_tokenizer(cfg_json)

        def text_hash64(s: str) -> int:
            d = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
            return int.from_bytes(d, "big") & ((1 << 63) - 1)
        ehash: list[int] = []
        tcs: list[int] = []
        col = batch[text_col]
        for i in range(len(col)):
            for slt in tok._spans_of(col[i].as_py()):
                if slt is None:
                    continue
                try:
                    n = len(slt_tuples(parse_slt(slt), window=window, eol=eol))
                except ValueError:
                    continue
                ehash.append(text_hash64(slt))
                tcs.append(n)
        return pa.table(
            {
                "ehash": pa.array(ehash, type=pa.int64()),
                "tc": pa.array(tcs, type=pa.int32()),
            }
        )

    per_span = ds.map_batches(spans, batch_format="pyarrow")
    # tc is a function of the expression, so Min==the value; one aggregate
    # doubles as the distinct()
    return per_span.groupby("ehash").aggregate(Min("tc", alias_name="tc"))


def tc_histogram(counts) -> np.ndarray:
    """Exact (tc -> n_expressions) histogram of an (ehash, tc) Dataset.

    Per-batch ``bincount`` partials; the driver folds rows whose length is
    ``max(tc)+1`` — bounded by the largest expression, not the corpus."""
    def partial(batch: pa.Table) -> pa.Table:
        h = np.bincount(batch["tc"].to_numpy(zero_copy_only=False))
        return pa.table({"hist": pa.array([h.astype(np.int64)], type=pa.list_(pa.int64()))})

    rows = counts.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return np.zeros(1, dtype=np.int64)
    size = max(len(r["hist"]) for r in rows)
    out = np.zeros(size, dtype=np.int64)
    for r in rows:
        h = np.asarray(r["hist"], dtype=np.int64)
        out[: len(h)] += h
    return out


def _tc_at_rank(cum: np.ndarray, i: int) -> int:
    """tc value at sorted index ``i`` (ascending) from cumulative counts."""
    return int(np.searchsorted(cum, i, side="right"))


def reorder_stats(hist: np.ndarray, breaks: int = 20) -> dict:
    """A10: quartiles + ``breaks``-bucket distribution of the tuple-count
    order statistics, with the reference's exact index arithmetic
    (``mathindex.cpp:92-99``: ``q1 = e[0.25*(s-1)].tc``,
    ``distexpr[i] = i*(s-1)/breaks + 1``, ``disttc[i] = e[i*(s-1)/breaks].tc``)."""
    s = int(hist.sum())
    if s == 0:
        return {"n_exprs": 0, "q1": 0, "q2": 0, "distexpr": [], "disttc": []}
    cum = np.cumsum(hist)
    q1 = _tc_at_rank(cum, int(0.25 * (s - 1)))
    q2 = _tc_at_rank(cum, int(0.5 * (s - 1)))
    distexpr = [1] + [i * (s - 1) // breaks + 1 for i in range(1, breaks + 1)]
    disttc = [_tc_at_rank(cum, i * (s - 1) // breaks) for i in range(0, breaks + 1)]
    return {"n_exprs": s, "q1": q1, "q2": q2, "distexpr": distexpr, "disttc": disttc}


def reorder_key(tc: np.ndarray, q1: int, q2: int) -> np.ndarray:
    """K5 ordering key ``od`` (vectorized): mid-quartile first, rarest last."""
    tc = np.asarray(tc, dtype=np.int64)
    od = tc.copy()
    mid = (tc > q1) & (tc <= q2)
    low = tc <= q1
    od[mid] = tc[mid] - q1
    od[low] = q2 + 1 - tc[low]
    return od


def reorder_assignment(counts, q1: int, q2: int):
    """K5: dense new ids in ``od`` order without a global sort.

    A broadcast cumulative histogram of ``od`` gives every od-group its
    base offset; each group stable-sorts by (tc, ehash) internally. Returns
    a Dataset of (ehash, tc, od, new_id) — ``new_id`` is a permutation of
    ``0..n-1`` matching the reference's ``qsort`` by ``od``.
    """
    import ray
    import ray.data  # noqa: F401

    # materialize once: the od-histogram pass and the final groupby both
    # consume this table, and without pinning the blocks the second
    # consumer would re-run the (corpus-scale) upstream count pipeline
    counts = counts.materialize()

    def with_od(batch: pa.Table) -> pa.Table:
        od = reorder_key(batch["tc"].to_numpy(zero_copy_only=False), q1, q2)
        return batch.append_column("od", pa.array(od, type=pa.int64()))

    keyed = counts.map_batches(with_od, batch_format="pyarrow")

    # tiny exact histogram of od -> base offsets (od values are bounded by
    # max tc, same as tc_histogram)
    def od_part(batch: pa.Table) -> pa.Table:
        h = np.bincount(batch["od"].to_numpy(zero_copy_only=False))
        return pa.table({"hist": pa.array([h.astype(np.int64)], type=pa.list_(pa.int64()))})

    rows = keyed.map_batches(od_part, batch_format="pyarrow").take_all()
    size = max((len(r["hist"]) for r in rows), default=1)
    oh = np.zeros(size, dtype=np.int64)
    for r in rows:
        h = np.asarray(r["hist"], dtype=np.int64)
        oh[: len(h)] += h
    base = np.concatenate([[0], np.cumsum(oh)[:-1]])
    base_ref = ray.put(base)

    def assign(g: pa.Table) -> pa.Table:
        b = ray.get(base_ref)
        od = int(g["od"][0].as_py())
        tc = g["tc"].to_numpy(zero_copy_only=False)
        eh = g["ehash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eh, tc))  # deterministic within the od group
        new_id = np.empty(len(order), dtype=np.int64)
        new_id[order] = b[od] + np.arange(len(order))
        return g.append_column("new_id", pa.array(new_id, type=pa.int64()))

    return keyed.groupby("od").map_groups(assign, batch_format="pyarrow")
