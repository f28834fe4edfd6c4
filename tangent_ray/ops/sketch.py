"""Heavy-hitter (top-k most frequent token) detection WITHOUT a shuffle.

The classic way to find the k most frequent tokens is a full
``groupby(token)`` — an all-to-all exchange of every token type. This
operator instead runs two streaming passes and certifies exactness:

1. **Candidate pass** — each batch emits its local top-``m`` token hashes
   with counts, plus one residual row: the LARGEST count among tokens it
   did NOT emit. A token missing from a batch's top-m has at most that
   residual count there, so ``sum(residuals)`` upper-bounds the total
   count of ANY token that never made a local top-m.
2. **Verification pass** — the exact corpus counts of the (bounded,
   driver-merged) candidate set via a broadcast membership filter —
   again no shuffle, counts fold per batch.

If the k-th candidate's exact count is >= the residual bound, the top-k
is PROVEN exact (any non-candidate is bounded below it) and the result
is identical to the full groupby — the DuckDB twin checks this literally.
On pathological distributions where certification fails (near-uniform
frequencies), the operator falls back to the exact hash-groupby path and
logs it — never a silently-approximate answer.

Candidates travel as token STRINGS (the candidate set is bounded by
``batches x m``, never corpus-sized), so the output is directly
human-readable and SQL-twinnable.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from tangent_ray.tokenize.text import split_tokens

logger = logging.getLogger(__name__)


def _batch_counts(batch: pa.Table, text_col: str):
    """(dictionary array of unique tokens, per-unique counts) of one batch."""
    import pyarrow.compute as pc

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    _parents, tokens, _ = split_tokens(texts)
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if not len(tokens):
        return None, None
    d = pc.dictionary_encode(tokens)
    counts = np.bincount(
        d.indices.to_numpy(zero_copy_only=False), minlength=len(d.dictionary)
    ).astype(np.int64)
    return d.dictionary, counts


def heavy_hitters(ds, k: int = 20, m: int = 4096, text_col: str = "text"):
    """EXACT top-``k`` most frequent tokens, certified shuffle-free when
    possible. Returns a ``pa.Table`` (term, cnt, rank) — count desc, term
    asc on ties. ``m`` is the per-batch candidate width; raise it if the
    certification fallback triggers on heavy-tailed data.
    """

    def cand_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uniq, counts = _batch_counts(batch, text_col)
        empty = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "resid": pa.array([], type=pa.int64()),
            }
        )
        if uniq is None:
            return empty
        if len(counts) > m:
            top = np.argpartition(-counts, m - 1)[:m]
            resid = int(-np.partition(-counts, m)[m])
        else:
            top = np.arange(len(counts))
            resid = 0
        t = pa.table(
            {
                "term": pc.take(uniq, pa.array(top)),
                "resid": pa.array(np.zeros(len(top), np.int64), type=pa.int64()),
            }
        )
        # one extra row carries this batch's residual (term null), so the
        # candidate set AND the bound come out of the same single pass
        return pa.concat_tables(
            [t, pa.table(
                {"term": pa.array([None], type=pa.string()),
                 "resid": pa.array([resid], type=pa.int64())}
            )]
        )

    parts = ds.map_batches(cand_part, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table(
            {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64())}
        )
    import collections

    cand_set = {r["term"] for r in parts if r["term"] is not None}
    resid_bound = sum(r["resid"] for r in parts if r["term"] is None)

    cand_terms = pa.array(sorted(cand_set), type=pa.string())
    import ray

    cand_ref = ray.put(cand_terms)

    def verify_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cand = ray.get(cand_ref)
        uniq, counts = _batch_counts(batch, text_col)
        if uniq is None:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        keep = pc.is_in(uniq, value_set=cand).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "term": uniq.filter(pa.array(keep)),
                "cnt": pa.array(counts[keep], type=pa.int64()),
            }
        )

    exact: dict[str, int] = collections.defaultdict(int)
    for r in ds.map_batches(verify_part, batch_format="pyarrow").take_all():
        exact[r["term"]] += r["cnt"]

    ranked = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    # certified iff (a) every batch emitted ALL its tokens (resid 0: the
    # candidate counts are simply complete — covers corpora with fewer
    # than k distinct tokens and the empty corpus), or (b) the k-th
    # candidate STRICTLY beats the residual bound: at exactly the bound a
    # non-candidate could tie and win the (count desc, term asc) tie rule
    certified = resid_bound == 0 or (
        len(ranked) == k and ranked[-1][1] > resid_bound
    )
    if not certified:
        logger.warning(
            "heavy_hitters: certification failed (kth=%s < residual bound %d) "
            "— falling back to the exact groupby path",
            ranked[-1][1] if ranked else None, resid_bound,
        )
        return _exact_topk(ds, k, text_col)
    return pa.table(
        {
            "term": pa.array([t for t, _ in ranked], type=pa.string()),
            "cnt": pa.array([c for _, c in ranked], type=pa.int64()),
            "rank": pa.array(
                np.arange(1, len(ranked) + 1, dtype=np.int64), type=pa.int64()
            ),
        }
    )


def _exact_topk(ds, k: int, text_col: str) -> pa.Table:
    """Exact fallback: full (term, count) groupby — the shuffle the sketch
    exists to avoid, used only when certification fails. The driver never
    sees the vocabulary: ``distributed_topk`` keeps only each block's local
    top-k by the SAME (count desc, term asc) total order, so driver input
    is bounded by k x blocks, not vocab size (certification fails exactly
    when the vocabulary is near-uniform, i.e. huge)."""
    from ray.data.aggregate import Sum

    from tangent_ray.util import distributed_topk

    def part(batch: pa.Table) -> pa.Table:
        uniq, counts = _batch_counts(batch, text_col)
        if uniq is None:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {"term": uniq, "cnt": pa.array(counts, type=pa.int64())}
        )

    agg = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    top = distributed_topk(agg, k, key_col="term", cnt_col="cnt")
    if top is None:
        top = pa.table(
            {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    return top.select(["term", "cnt"]).append_column(
        "rank",
        pa.array(np.arange(1, top.num_rows + 1, dtype=np.int64), type=pa.int64()),
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-token estimation


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Max leading-zero-rank register array (2^p uint8) of uint64 hashes:
    register index = top p bits, rank = leading zeros of the remaining
    64-p bits + 1 — the standard HLL decomposition, fully vectorized."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(hashes):
        return regs
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = position of the highest set bit from the top: 64 - floor(log2)
    # via float64 exponent extraction (exact for the top bit position)
    top = 64 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
    rank = np.clip(top, 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction — deterministic given the registers."""
    m = float(len(regs))
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(e)


def distinct_tokens_hll(ds, p: int = 14, text_col: str = "text") -> float:
    """Approximate distinct-token count in ONE streaming pass and
    O(2^p) bytes total state — registers merge by elementwise max, so
    per-batch partials fold on the driver without any shuffle (the exact
    distinct count needs a vocabulary-sized groupby; this needs 16 KiB).
    Standard error ~ 1.04/sqrt(2^p) (~0.8% at p=14). Deterministic:
    same corpus -> same estimate (md5-based hashes, no RNG)."""
    from tangent_ray.tokenize.text import md5_u64

    def part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _parents, tokens, _ = split_tokens(texts)
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        if len(tokens):
            d = pc.dictionary_encode(tokens)
            h = md5_u64(d.dictionary)  # md5 once per unique batch token
        else:
            h = np.empty(0, dtype=np.uint64)
        regs = _hll_registers(h, p)
        return pa.table(
            {"regs": pa.array([regs.astype(np.int64)], pa.list_(pa.int64()))}
        )

    merged = np.zeros(1 << p, dtype=np.uint8)
    for r in ds.map_batches(part, batch_format="pyarrow").take_all():
        np.maximum(merged, np.asarray(r["regs"], dtype=np.uint8), out=merged)
    return hll_estimate(merged)
