"""Count-based n-gram language-model scoring — the classic "perplexity
filter" stage of a web-scale training-data pipeline (score every document
under a smoothed bigram LM; drop the tails).

Shape (Ray-Data-first, one pass + one small shuffle):

1. ``bigram_count_partial`` — per-batch map: tokenize, form adjacent
   in-doc bigrams, and PRE-AGGREGATE to one row per unique bigram (plus one
   row per unique token, for the vocabulary size) before anything shuffles.
   Rows carry 64-bit md5 hashes, never strings, so the shuffle payload is
   24 B/type regardless of token length.
2. ONE ``groupby(["kind", "bkey"])`` sum — the only wide step. Its output
   is model-sized (bigram TYPES, not tokens).
3. ``train_bigram_lm`` folds the aggregate into a broadcastable model:
   sorted bigram-key array -> fixed-point log-prob, add-one smoothing
   ``lp = ln((c12 + 1) / (c1 + V))``. ``min_count`` / ``top_m`` prune the
   long tail so the broadcast stays bounded at corpus scale (dropped types
   are LOGGED, and scoring backs off to the unigram context exactly as for
   any unseen bigram, so pruning degrades gracefully).
4. ``LMScore`` — stateful actor stage: ``ray.put`` model read once per
   actor, per-batch vectorized ``searchsorted`` lookup, per-doc integer
   sums.

Log-probs are FIXED-POINT integers (``round(lp * 1e6)``), so per-document
sums are exact and order-independent — the DuckDB oracle twin
(``pipelines/entry_queries.py``) reproduces every value bit-for-bit, which a
float sum could not guarantee across engines.

This extends the reference's text path (Porter/BM25 — it has no LM stage)
with the curation operator large-scale pipelines pair with BM25 stats;
tuple semantics and tokenization are shared with the index build
(``tokenize/text.py``).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from tangent_ray.tokenize.text import md5_u64, split_tokens
from tangent_ray.util import actor_pool, round_half_away

logger = logging.getLogger(__name__)

_KIND_BIGRAM = 0
_KIND_TOKEN = 1
_KIND_CONTEXT = 2  # per-context totals c1 (emitted by the shard reduce)
_KIND_DROPPED = 3  # per-shard pruned-type count (for the driver log line)

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _bigram_key(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    # 64-bit key for the (w1, w2) pair from the two token hashes:
    # splitmix64 finalizer over an asymmetric combine. Purely numeric —
    # md5 over the JOINED STRING cost one Python hashlib call per unique
    # bigram, and bigram types ~ bigram occurrences on high-entropy
    # corpora, so that was O(tokens) Python per batch. The key never
    # leaves the engine (the SQL twin groups on the strings themselves);
    # it only needs determinism + collision resistance (64-bit birthday:
    # ~1e-6 at 10^7 types, and a collision only perturbs two counts).
    with np.errstate(over="ignore"):
        z = (h1 * _C1) ^ ((h2 << np.uint64(32)) | (h2 >> np.uint64(32)))
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def _adjacent(parents: np.ndarray):
    """Mask over positions [0, n-2]: token i and i+1 belong to the same doc.
    ``split_tokens`` output is ordered (row, pos), so adjacency in the flat
    stream + equal parent == adjacent in the document."""
    return parents[1:] == parents[:-1]


def bigram_count_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial counts: (kind, bkey, h1, cnt) rows.

    kind 0: one row per unique in-doc bigram in the batch — ``bkey`` =
    ``_bigram_key(md5_u64(w1), md5_u64(w2))``, ``h1`` = md5_u64(w1),
    ``cnt`` = occurrences.
    kind 1: one row per unique token (vocabulary support), cnt = 1.
    """
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, tokens, _pos = split_tokens(texts)
    empty = pa.table(
        {
            "kind": pa.array([], type=pa.int8()),
            "bkey": pa.array([], type=pa.int64()),
            "h1": pa.array([], type=pa.int64()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )
    if len(parents) == 0:
        return empty
    th = md5_u64(tokens)
    adj = _adjacent(parents)
    out_kind = [np.full(0, 0, np.int8)]
    out_bkey = [np.empty(0, np.uint64)]
    out_h1 = [np.empty(0, np.uint64)]
    out_cnt = [np.empty(0, np.int64)]
    if adj.any():
        h1 = th[:-1][adj]
        bkey = _bigram_key(h1, th[1:][adj])
        # pre-aggregate within the batch: one row per unique bigram
        ub, first, cnt = np.unique(bkey, return_index=True, return_counts=True)
        out_kind.append(np.full(len(ub), _KIND_BIGRAM, np.int8))
        out_bkey.append(ub)
        out_h1.append(h1[first])  # same bigram -> same w1 -> same h1
        out_cnt.append(cnt.astype(np.int64))
    ut = np.unique(th)
    out_kind.append(np.full(len(ut), _KIND_TOKEN, np.int8))
    out_bkey.append(ut)
    out_h1.append(ut)
    out_cnt.append(np.ones(len(ut), np.int64))
    # int64 bit-views: Ray's shuffle round-trips int64 natively (uint64
    # falls back to pickled object columns); viewed back after the groupby.
    return pa.table(
        {
            "kind": pa.array(np.concatenate(out_kind), type=pa.int8()),
            "bkey": pa.array(np.concatenate(out_bkey).view(np.int64), type=pa.int64()),
            "h1": pa.array(np.concatenate(out_h1).view(np.int64), type=pa.int64()),
            "cnt": pa.array(np.concatenate(out_cnt), type=pa.int64()),
        }
    )


class BigramLM:
    """Broadcastable model: sorted key arrays + fixed-point log-probs."""

    __slots__ = ("b_keys", "b_lp", "u_keys", "u_c1", "v", "lp_floor")

    def __init__(self, b_keys, b_lp, u_keys, u_c1, v: int):
        self.b_keys = b_keys  # sorted uint64 bigram hash keys
        self.b_lp = b_lp  # int64 fixed-point lp (1e-6 units)
        self.u_keys = u_keys  # sorted uint64 w1 hashes with any context count
        self.u_c1 = u_c1  # int64 total bigram occurrences with this w1
        self.v = v  # vocabulary size (distinct tokens)
        # unseen w1: lp = ln(1 / V)
        self.lp_floor = _lp_e6(np.array([1.0]), np.array([float(v)]))[0]


def _lp_e6(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Fixed-point add-one log-prob: round(ln(num/den) * 1e6), half away
    from zero (= DuckDB ``round(x)``)."""
    return round_half_away(np.log(num / den) * 1e6, 0).astype(np.int64)


def _train_shard(g: pa.Table, min_count: int) -> pa.Table:
    """Reduce ONE h1-shard of partial rows to final model rows.

    Sharding is by ``h1`` (the w1 hash; ``bkey`` is a function of (h1, h2),
    so equal bkeys share a shard too). That means this group holds EVERY
    partial row of every bigram type whose context is a w1 in the shard:
    global per-bigram counts, complete context totals ``c1``, and the
    ``min_count`` prune are all final here — only model-sized rows leave
    the shuffle, and the driver's fold is a concat, not an aggregation.
    """
    kind = g["kind"].to_numpy(zero_copy_only=False)
    bkey = g["bkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    h1 = g["h1"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_b = kind == _KIND_BIGRAM
    out_kind, out_bkey, out_h1, out_cnt = [], [], [], []
    if is_b.any():
        ub, first, inv = np.unique(
            bkey[is_b], return_index=True, return_inverse=True
        )
        c12 = np.zeros(len(ub), np.int64)
        np.add.at(c12, inv, cnt[is_b])
        uh1 = h1[is_b][first]  # same bigram -> same w1 -> same h1
        # complete context totals (BEFORE pruning: pruned mass still
        # shapes the add-one denominator at scoring time)
        ku, kinv = np.unique(uh1, return_inverse=True)
        c1 = np.zeros(len(ku), np.int64)
        np.add.at(c1, kinv, c12)
        keep = c12 >= min_count
        out_kind += [
            np.full(int(keep.sum()), _KIND_BIGRAM, np.int8),
            np.full(len(ku), _KIND_CONTEXT, np.int8),
            np.full(1, _KIND_DROPPED, np.int8),
        ]
        out_bkey += [ub[keep], ku, np.zeros(1, np.int64)]
        out_h1 += [uh1[keep], ku, np.zeros(1, np.int64)]
        out_cnt += [c12[keep], c1, np.array([int((~keep).sum())], np.int64)]
    n_tok = int(np.unique(bkey[~is_b]).size)
    if n_tok:  # token hashes shard by themselves (h1 == bkey): exact count
        out_kind.append(np.full(1, _KIND_TOKEN, np.int8))
        out_bkey.append(np.zeros(1, np.int64))
        out_h1.append(np.zeros(1, np.int64))
        out_cnt.append(np.array([n_tok], np.int64))
    if not out_kind:
        out_kind = [np.empty(0, np.int8)]
        out_bkey = out_h1 = [np.empty(0, np.int64)]
        out_cnt = [np.empty(0, np.int64)]
    return pa.table(
        {
            "kind": pa.array(np.concatenate(out_kind), type=pa.int8()),
            "bkey": pa.array(np.concatenate(out_bkey), type=pa.int64()),
            "h1": pa.array(np.concatenate(out_h1), type=pa.int64()),
            "cnt": pa.array(np.concatenate(out_cnt), type=pa.int64()),
        }
    )


def train_bigram_lm(ds, text_col: str = "text", min_count: int = 1,
                    top_m: int | None = None,
                    shards: int | None = None) -> BigramLM:
    """One streaming pass + one model-sized shard shuffle -> broadcastable LM.

    The wide step is a ``groupby(shard-of-h1)`` over pre-aggregated hash
    rows with all real aggregation done vectorized inside ``_train_shard``
    (Ray's row-hash aggregate over millions of bigram-type groups is ~50x
    slower than 256 numpy reduces). ``min_count``/``top_m`` bound the model
    for 100 TB corpora (bigram TYPES grow with corpus size; the broadcast
    must not). Pruned types are logged and handled by the unigram backoff
    at scoring time.
    """
    from tangent_ray.util import DEFAULT_SHARDS, shard_column

    nsh = shards or DEFAULT_SHARDS
    parts = ds.map_batches(
        lambda b: bigram_count_partial(b, text_col=text_col),
        batch_format="pyarrow",
    )
    red = (
        parts.map_batches(
            lambda b: shard_column(b, ["h1"], nsh), batch_format="pyarrow"
        )
        .groupby("shard")
        .map_groups(
            lambda g: _train_shard(g, min_count), batch_format="pyarrow"
        )
    )
    # model-sized result: one (pruned) row per bigram type + context totals
    tables = [
        pa.Table.from_pydict(b) if isinstance(b, dict) else b
        for b in red.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    if not tables or not sum(t.num_rows for t in tables):
        raise ValueError("train_bigram_lm: corpus has no tokens")
    t = pa.concat_tables(tables)
    kind = t["kind"].to_numpy(zero_copy_only=False)
    bkey = t["bkey"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    h1 = t["h1"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)

    v = int(cnt[kind == _KIND_TOKEN].sum())
    is_b = kind == _KIND_BIGRAM
    bk, bh1, bc = bkey[is_b], h1[is_b], cnt[is_b]
    is_c = kind == _KIND_CONTEXT
    corder = np.argsort(bkey[is_c])
    u_keys, u_c1 = bkey[is_c][corder], cnt[is_c][corder]

    keep = np.ones(len(bc), dtype=bool)
    if top_m is not None and len(bc) > top_m:
        # HARD bound (top_m exists to bound the broadcast): bigrams above
        # the threshold count all stay; ties AT the threshold are broken
        # deterministically by key so exactly top_m survive
        thresh = np.partition(bc, len(bc) - top_m)[len(bc) - top_m]
        keep = bc > thresh
        need = top_m - int(keep.sum())
        if need > 0:
            tied = np.flatnonzero(bc == thresh)
            keep[tied[np.argsort(bk[tied], kind="stable")[:need]]] = True
    dropped = int(cnt[kind == _KIND_DROPPED].sum()) + int(len(bc) - keep.sum())
    if dropped:
        logger.info(
            "train_bigram_lm: pruned %d bigram types (kept %d; min_count=%d, top_m=%s)",
            dropped, int(keep.sum()), min_count, top_m,
        )
    bk, bh1, bc = bk[keep], bh1[keep], bc[keep]

    c1_of = u_c1[np.searchsorted(u_keys, bh1)]
    lp = _lp_e6(bc + 1.0, c1_of + float(v))
    order = np.argsort(bk)
    return BigramLM(bk[order], lp[order], u_keys, u_c1, v)


class LMScore:
    """Actor stage: score each document under a broadcast ``BigramLM``.

    Output: (id, n_bigrams, sum_lp_e6) — fixed-point integer sum of
    per-bigram log-probs (1e-6 units; perplexity = exp(-sum/(n*1e6))).
    Unseen bigram -> add-one backoff ln(1/(c1+V)); unseen context ->
    ln(1/V). Model deserialized ONCE per actor from the object store.
    """

    def __init__(self, model_ref, text_col: str = "text", id_col: str = "doc_id"):
        import ray

        self.m: BigramLM = ray.get(model_ref) if not isinstance(model_ref, BigramLM) else model_ref
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.m
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parents, tokens, _pos = split_tokens(texts)
        n_rows = batch.num_rows
        n_big = np.zeros(n_rows, dtype=np.int64)
        sums = np.zeros(n_rows, dtype=np.int64)
        if len(parents):
            adj = _adjacent(parents)
            if adj.any():
                from tangent_ray.util import sorted_lookup

                th = md5_u64(tokens)
                h1a = th[:-1][adj]
                bkey = _bigram_key(h1a, th[1:][adj])
                bp = parents[:-1][adj]  # doc row of each bigram
                hit, pos_c = sorted_lookup(m.b_keys, bkey)
                lp = np.empty(len(bkey), dtype=np.int64)
                lp[hit] = m.b_lp[pos_c[hit]]
                if (~hit).any():
                    h1 = h1a[~hit]
                    uhit, up_c = sorted_lookup(m.u_keys, h1)
                    miss_lp = np.full(len(h1), m.lp_floor, dtype=np.int64)
                    if uhit.any():
                        c1 = m.u_c1[up_c[uhit]].astype(np.float64)
                        miss_lp[uhit] = _lp_e6(np.ones(uhit.sum()), c1 + float(m.v))
                    lp[~hit] = miss_lp
                np.add.at(n_big, bp, 1)
                np.add.at(sums, bp, lp)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_bigrams": pa.array(n_big, type=pa.int64()),
                "sum_lp_e6": pa.array(sums, type=pa.int64()),
            }
        )


def lm_score(ds, model: BigramLM, text_col: str = "text", id_col: str = "doc_id"):
    """Score ``ds`` under ``model`` (broadcast once via ``ray.put``)."""
    import ray

    ref = ray.put(model)
    return ds.map_batches(
        LMScore,
        fn_constructor_args=(ref, text_col, id_col),
        batch_format="pyarrow",
        concurrency=actor_pool(),
    )
