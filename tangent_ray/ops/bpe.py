"""BPE tokenizer training at corpus scale — the "train your own tokenizer"
stage of a web-scale LLM data pipeline (Sennrich et al. 2016, the public
byte-pair-encoding algorithm every modern subword tokenizer descends from).

Shape (Ray-Data-first, the classic counting/merging asymmetry):

1. ``word_counts`` — the ONLY corpus-sized work. Per-batch map: tokenize
   with the engine-shared ``split_tokens`` (lowercase, non-word split — the
   same pre-tokenizer the index build and every textstats op use), then
   PRE-AGGREGATE to one (word, cnt) row per unique word before anything
   shuffles; one ``groupby(word)`` sum; ``min_freq`` pruning applied
   DISTRIBUTED (a ``map_batches`` filter on the aggregated Dataset — the
   driver never sees the raw vocabulary); optional exact ``top_m`` cap via
   per-block partial top-k + a bounded driver merge (post-groupby a word is
   exactly one row globally, so any row cut from a block has >= m
   strictly-preceding rows under the same total order and cannot be in the
   global top-m — the ``ops/sketch.py`` fallback argument).
2. ``train_bpe`` — the merge loop runs on the DRIVER over the pruned
   word-TYPE dictionary, never the corpus. This is how production
   tokenizer trainers work (HF tokenizers / SentencePiece train from word
   counts in memory); BPE's merge choice is a global argmax per round, so
   a distributed loop would pay one all-to-all per merge — thousands of
   shuffles for a real vocab. The word-type table after ``min_freq`` /
   ``top_m`` is model-sized (same documented constraint as
   ``ops/lm.py``'s driver-side model fold). The loop itself is the exact
   classic algorithm with INCREMENTAL pair-count maintenance: a
   pair -> {word} inverted index means each merge touches only the words
   that contain the winning pair, not the whole dictionary.
3. ``BPEEncode`` — stateful actor stage: merge ranks ``ray.put`` once,
   deserialized once per actor in ``__init__``; per-batch encode with a
   per-actor word -> pieces cache, so the greedy merge walk runs once per
   unique word per actor, and per-occurrence output is a numpy gather.

Determinism: the merge winner is ``(count desc, pair lexicographic asc)``
— a total order, so training is bit-reproducible across runs and engines.
Ties in real corpora are common at the low-count tail; an unordered-dict
argmax would make the learned vocab depend on hash iteration order.

The reference has no tokenizer-training stage (its text path is
Porter+BM25, ``text/porter.py``); this is part of the LLM-curation
extension set, validated by a differential pytest oracle against an
independent recount-from-scratch reference implementation.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.tokenize.text import split_tokens
from tangent_ray.util import actor_pool, distributed_topk

logger = logging.getLogger(__name__)

#: marks the end of a word so "t h e </w>" and "t h e m" learn different
#: merges — the published BPE convention.
EOW = "</w>"


# ---------------------------------------------------------------------------
# stage 1: corpus -> word-type dictionary (the only corpus-sized work)
# ---------------------------------------------------------------------------


def _word_count_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """One (word, cnt) row per unique word of the batch (pre-aggregation —
    this is what keeps the shuffle word-TYPE-sized, not token-sized)."""
    _, tokens, _ = split_tokens(batch[text_col])
    if len(tokens) == 0:
        return pa.table(
            {"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    vc = tokens.value_counts()
    return pa.table(
        {"word": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
    )


def word_counts(ds, text_col: str = "text", min_freq: int = 1,
                top_m: int | None = None):
    """Corpus -> Dataset of (word, cnt), pruned to ``cnt >= min_freq``.

    ``top_m`` additionally caps to the m most frequent words by
    ``(cnt desc, word asc)`` — exact (see module docstring) — and returns a
    driver-side ``pa.Table`` instead of a Dataset, since the cap's purpose
    is to bound what the trainer materializes.
    """
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(
            lambda b: _word_count_partial(b, text_col), batch_format="pyarrow"
        )
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    if min_freq > 1:
        # distributed prune: the driver must only ever see the surviving
        # types (at 100 TB the raw vocab long tail is billions of rows)
        agg = agg.map_batches(
            lambda b: b.filter(pc.greater_equal(b["cnt"], min_freq)),
            batch_format="pyarrow",
        )
    if top_m is None:
        return agg
    top = distributed_topk(agg, top_m, key_col="word", cnt_col="cnt")
    if top is None:
        return pa.table(
            {"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    return top


# ---------------------------------------------------------------------------
# stage 2: driver-side exact merge loop over the word-type dictionary
# ---------------------------------------------------------------------------


def _pairs_of(sym: list[str]):
    return zip(sym, sym[1:])


def train_bpe(word_freqs: pa.Table, num_merges: int, min_pair_freq: int = 2):
    """Learn ``num_merges`` BPE merges from a (word, cnt) table.

    Returns ``(merges, vocab)``: ``merges`` is a list of (left, right)
    pairs in learned rank order; ``vocab`` the sorted final symbol set
    (single characters + ``EOW`` + every merged token). Stops early when
    no pair reaches ``min_pair_freq`` (merging singleton pairs memorizes
    the corpus).

    Exact incremental algorithm: global pair counts plus a pair -> {word
    index} inverted index; each round re-derives only the words containing
    the winning pair (subtract their old pair multiset, apply the merge,
    add the new one). Equivalent to the naive recount-every-round trainer
    — pytest proves this differentially — but O(touched words) per merge.
    """
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, c in zip(word_freqs["word"].to_pylist(), word_freqs["cnt"].to_pylist()):
        if not w:
            continue
        words.append(list(w) + [EOW])
        freqs.append(int(c))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, (sym, f) in enumerate(zip(words, freqs)):
        for p in _pairs_of(sym):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(i)

    def _apply_merge(sym: list[str], a: str, b: str, ab: str) -> list[str]:
        out: list[str] = []
        j, n = 0, len(sym)
        while j < n:
            if j + 1 < n and sym[j] == a and sym[j + 1] == b:
                out.append(ab)
                j += 2
            else:
                out.append(sym[j])
                j += 1
        return out

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        best_c = 0
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None or best_c < min_pair_freq:
            break
        a, b = best
        ab = a + b
        touched = pair_words.get(best, set())
        for i in sorted(touched):
            sym, f = words[i], freqs[i]
            for p in _pairs_of(sym):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        del pair_words[p]
            sym = _apply_merge(sym, a, b, ab)
            words[i] = sym
            for p in _pairs_of(sym):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(i)
        merges.append(best)

    vocab: set[str] = {EOW}
    for sym in words:
        vocab.update(sym)
    for a, b in merges:
        vocab.add(a + b)  # ranks below min_pair_freq still name the token
    return merges, sorted(vocab)


def train_bpe_naive(word_freqs: pa.Table, num_merges: int,
                    min_pair_freq: int = 2):
    """Independent reference trainer: recounts EVERY pair from scratch each
    round (the textbook O(merges x dictionary) formulation). Exists so the
    incremental trainer has a differential oracle; never use at scale."""
    words = [
        (list(w) + [EOW], int(c))
        for w, c in zip(
            word_freqs["word"].to_pylist(), word_freqs["cnt"].to_pylist()
        )
        if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in words:
            for p in _pairs_of(sym):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < min_pair_freq:
            break
        a, b = best
        ab = a + b
        nxt = []
        for sym, f in words:
            out: list[str] = []
            j, n = 0, len(sym)
            while j < n:
                if j + 1 < n and sym[j] == a and sym[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            nxt.append((out, f))
        words = nxt
        merges.append(best)
    vocab: set[str] = {EOW}
    for sym, _ in words:
        vocab.update(sym)
    for a, b in merges:
        vocab.add(a + b)
    return merges, sorted(vocab)


# ---------------------------------------------------------------------------
# stage 3: encode (stateful actor stage, per-actor word cache)
# ---------------------------------------------------------------------------


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Greedy BPE encode of one word: repeatedly merge the present pair
    with the LOWEST learned rank until none applies (the published
    inference rule — merge order, not left-to-right scan order)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_j = None, -1
        for j in range(len(sym) - 1):
            r = ranks.get((sym[j], sym[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        a, b = sym[best_j], sym[best_j + 1]
        ab = a + b
        # merge every occurrence of this pair in one pass (same rank)
        out: list[str] = []
        j, n = 0, len(sym)
        while j < n:
            if j + 1 < n and sym[j] == a and sym[j + 1] == b:
                out.append(ab)
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return tuple(sym)


class BPEEncode:
    """Actor stage: per-doc BPE piece counts under a trained merge table.

    ``merges_ref`` is ``ray.put`` of the merges list — deserialized once
    per actor, never re-shipped per batch. The word -> piece-count cache
    persists across batches, so the Python merge walk runs once per unique
    word per actor; per-occurrence work is a numpy gather + bincount.

    Output: input columns ``id_col`` plus ``n_words``, ``n_pieces``,
    ``pieces_per_word`` (the compression-rate signal pipelines gate on —
    a doc whose pieces/word is near the character count is junk the
    tokenizer cannot compress).
    """

    #: word-cache entry cap per actor. The cache persists for the actor's
    #: lifetime; unbounded it grows with every unique word ever seen —
    #: billions on a web corpus. Word frequency is Zipfian, so evicting the
    #: oldest half when full keeps a near-identical hit rate at bounded RSS.
    CACHE_CAP = 1 << 20

    def __init__(self, merges_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        merges = (
            ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        )
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.id_col, self.text_col = id_col, text_col
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, tokens, _ = split_tokens(batch[self.text_col])
        n_rows = batch.num_rows
        n_words = np.zeros(n_rows, dtype=np.int64)
        n_pieces = np.zeros(n_rows, dtype=np.int64)
        if len(tokens) > 0:
            dict_arr = tokens.dictionary_encode()
            uniq = dict_arr.dictionary.to_pylist()
            codes = dict_arr.indices.to_numpy(zero_copy_only=False)
            per_uniq = np.empty(len(uniq), dtype=np.int64)
            cache = self._cache
            if len(cache) >= self.CACHE_CAP:
                # FIFO-evict the oldest half (dict preserves insertion
                # order); hot Zipf-head words re-enter within a batch
                for w in list(cache)[: len(cache) // 2]:
                    del cache[w]
            for k, w in enumerate(uniq):
                c = cache.get(w)
                if c is None:
                    c = len(encode_word(w, self.ranks))
                    cache[w] = c
                per_uniq[k] = c
            np.add.at(n_words, parents, 1)
            np.add.at(n_pieces, parents, per_uniq[codes])
        ppw = n_pieces / np.maximum(n_words, 1)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_words": pa.array(n_words, pa.int64()),
                "n_pieces": pa.array(n_pieces, pa.int64()),
                "pieces_per_word": pa.array(ppw, pa.float64()),
            }
        )


def bpe_encode_stats(ds, merges, id_col: str = "doc_id",
                     text_col: str = "text",
                     concurrency: int | tuple[int, int] | None = None):
    """Corpus -> per-doc BPE piece-count stats under trained ``merges``."""
    import ray

    if concurrency is None:
        concurrency = actor_pool()
    ref = ray.put(list(merges))
    return ds.map_batches(
        BPEEncode,
        fn_constructor_kwargs={
            "merges_ref": ref, "id_col": id_col, "text_col": text_col
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def train_bpe_pipeline(ds, num_merges: int = 64, min_freq: int = 1,
                       top_m: int | None = None, min_pair_freq: int = 2,
                       text_col: str = "text"):
    """End-to-end: corpus Dataset -> (merges, vocab). The distributed part
    is ``word_counts``; the merge loop folds the bounded dictionary.

    The dictionary the driver folds is only bounded when ``min_freq > 1``
    or ``top_m`` prunes it — with both at their defaults the FULL raw
    vocabulary (billions of types on a web corpus) lands on the driver, so
    that combination is warned against and belongs only in tests."""
    if min_freq <= 1 and top_m is None:
        logger.warning(
            "train_bpe_pipeline: min_freq=1 with no top_m materializes the "
            "entire raw vocabulary on the driver — set min_freq>1 and/or "
            "top_m for any corpus-scale run"
        )
    wc = word_counts(ds, text_col=text_col, min_freq=min_freq, top_m=top_m)
    if not isinstance(wc, pa.Table):
        tabs = [t for t in _collect_refs(wc) if t.num_rows]
        wc = (
            pa.concat_tables(tabs)
            if tabs
            else pa.table(
                {"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        )
    return train_bpe(wc, num_merges, min_pair_freq=min_pair_freq)


def _collect_refs(ds) -> list[pa.Table]:
    import ray

    return ray.get(ds.to_arrow_refs())
