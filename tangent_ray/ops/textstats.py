"""Text-analysis operators for large-scale training-data pipelines.

All are vectorized ``map_batches`` stages over Arrow batches: token counting,
quality scoring (length/alpha/stopword ratios), n-gram-heuristic language ID,
and rolling-hash document fingerprints. These extend the reference's text
path (Porter + Solr keywords) with the operations a 100 TB corpus pipeline
needs; each has a ``queries()`` entry over the ``documents`` test table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.tokenize.text import split_tokens
from tangent_ray.util import round_half_away

# tiny public stopword lists (top function words) per language — enough for
# an n-gram/stopword-overlap heuristic, not a real model.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "que", "de", "por"},
}


def quality_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, n_words, alpha_ratio) — shared definition with the DuckDB oracle:
    n_words = non-empty ``[^a-z0-9]+`` splits of lower(text); alpha_ratio =
    |[A-Za-z] chars| / |chars| rounded to 6."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, _tokens, _ = split_tokens(texts)
    n_words = np.zeros(len(texts), dtype=np.int64)
    if len(parents):
        np.add.at(n_words, parents, 1)
    total = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    alpha = pc.utf8_length(
        pc.replace_substring_regex(texts, "[^A-Za-z]", "")
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    ratio = round_half_away(np.divide(alpha, total, out=np.zeros_like(alpha), where=total > 0), 6)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(n_words, type=pa.int64()),
            "alpha_ratio": pa.array(ratio, type=pa.float64()),
        }
    )


def token_count_partial(batch: pa.Table, group_col: str = "source", text_col: str = "text") -> pa.Table:
    """Partial per-batch aggregate (pre-aggregation before the tiny groupby):
    one row per group value per batch."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, _tokens, _ = split_tokens(texts)
    per_row = np.zeros(len(texts), dtype=np.int64)
    if len(parents):
        np.add.at(per_row, parents, 1)
    t = pa.table({group_col: batch[group_col], "tok": pa.array(per_row)})
    agg = t.group_by([group_col]).aggregate([("tok", "sum"), ("tok", "count")])
    return pa.table(
        {
            group_col: agg[group_col],
            "total_tokens": agg["tok_sum"],
            "n_docs": agg["tok_count"],
        }
    )


def lexical_stats_batch(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Repetition quality signals per doc (the Gopher/C4-style filters):
    word count, distinct words, type-token ratio and top-word fraction.

    Fully vectorized: tokens dictionary-encode to int codes, (doc, code)
    pairs fuse into one int64 key, and ``np.unique`` + ``np.add.at`` /
    ``np.maximum.at`` produce the per-doc distinct and max counts — no
    Python per-doc loop. Docs with zero words are dropped (the ratios are
    undefined; the DuckDB twin's groupby drops them identically)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, tokens, _pos = split_tokens(texts)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "n_words": pa.array([], type=pa.int64()),
            "distinct_words": pa.array([], type=pa.int64()),
            "type_token_ratio": pa.array([], type=pa.float64()),
            "top_word_fraction": pa.array([], type=pa.float64()),
        }
    )
    if not len(parents):
        return empty
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    codes = pc.dictionary_encode(tokens).indices.to_numpy(zero_copy_only=False)
    key = parents.astype(np.int64) * (int(codes.max()) + 1) + codes
    pair, pair_counts = np.unique(key, return_counts=True)
    pair_parent = (pair // (int(codes.max()) + 1)).astype(np.int64)

    n_docs = len(texts)
    n_words = np.zeros(n_docs, dtype=np.int64)
    np.add.at(n_words, parents, 1)
    distinct = np.zeros(n_docs, dtype=np.int64)
    np.add.at(distinct, pair_parent, 1)
    top = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(top, pair_parent, pair_counts)

    keep = n_words > 0
    nw = n_words[keep].astype(np.float64)
    return pa.table(
        {
            id_col: pa.array(ids[keep], type=pa.int64()),
            "n_words": pa.array(n_words[keep], type=pa.int64()),
            "distinct_words": pa.array(distinct[keep], type=pa.int64()),
            "type_token_ratio": pa.array(
                round_half_away(distinct[keep] / nw, 6), type=pa.float64()
            ),
            "top_word_fraction": pa.array(
                round_half_away(top[keep] / nw, 6), type=pa.float64()
            ),
        }
    )


#: GPT-2-style pre-tokenizer pattern (public BPE convention: contraction
#: suffixes, space-prefixed word/number/punctuation runs, whitespace runs),
#: ASCII-restricted so the RE2 semantics are portable. Counting uses
#: Arrow's RE2 (``pc.count_substring_regex``) — the same engine DuckDB's
#: ``regexp_extract_all`` uses, so the oracle twin is exact by construction.
#: the punctuation class must NOT exclude the apostrophe (GPT-2's doesn't):
#: alternation is leftmost-first, so contraction suffixes still win when
#: they apply, while a bare quote counts as punctuation instead of
#: silently matching nothing
BPE_TOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ \\tA-Za-z0-9]+|[ \\t]+"
)


def bpe_token_count_partial(batch: pa.Table, group_col: str = "source",
                            text_col: str = "text") -> pa.Table:
    """BPE-ish regex token counts per group (per-batch partial, one
    vectorized RE2 pass — the 'how many BPE tokens is this corpus' stage of
    a training-data pipeline, to first order and without a merges table)."""
    texts = batch[text_col]
    # null text counts as a 0-token document (Arrow's count aggregate
    # skips nulls, which would silently drop the doc from n_docs while
    # the SQL twin's count(*) keeps it)
    counts = pc.fill_null(pc.count_substring_regex(texts, BPE_TOKEN_RE), 0)
    t = pa.table({group_col: batch[group_col], "tok": counts})
    agg = t.group_by([group_col]).aggregate([("tok", "sum"), ("tok", "count")])
    return pa.table(
        {
            group_col: agg[group_col],
            "total_tokens": pc.cast(agg["tok_sum"], pa.int64()),
            "n_docs": pc.cast(agg["tok_count"], pa.int64()),
        }
    )


class LangId:
    """Stopword-overlap language scorer (stateful stage: sets compiled once).

    Emits the argmax language among the stopword tables, 'und' (undetermined)
    when nothing matches — a deliberately simple, deterministic heuristic.
    """

    def __init__(self):
        # Arrow value-set arrays built ONCE (the whole point of the actor)
        self.langs = sorted(_STOPWORDS)
        self.value_sets = {
            lang: pa.array(sorted(_STOPWORDS[lang])) for lang in self.langs
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parents, tokens, _ = split_tokens(texts)
        langs = self.langs
        counts = np.zeros((len(texts), len(langs)), dtype=np.int32)
        for li, lang in enumerate(langs):
            # vectorized set membership (Arrow kernel, no per-token Python)
            hits = pc.is_in(
                tokens, value_set=self.value_sets[lang]
            ).to_numpy(zero_copy_only=False)
            np.add.at(counts[:, li], parents[hits], 1)
        best = counts.argmax(axis=1)
        none = counts.max(axis=1) == 0
        pred = np.array(langs, dtype=object)[best]
        pred[none] = "und"
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(pred.tolist(), type=pa.string()),
            }
        )


def fingerprint_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit rolling-hash document fingerprint (deterministic, unsalted):
    polynomial rolling hash over the token stream."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, tokens, pos = split_tokens(texts)
    from tangent_ray.tokenize.text import md5_u64

    # engine-independent token hash (md5 bytes [8:16], little-endian =
    # DuckDB md5_number_lower) hashed once per UNIQUE token per batch —
    # fingerprints must be reproducible across engines and versions, and
    # the DuckDB oracle twin recomputes them exactly
    tok_h = md5_u64(tokens)
    out = np.zeros(len(texts), dtype=np.uint64)
    B = np.uint64(1000003)
    if len(parents):
        # Horner expanded: H(doc) = sum_i h_i * B^(L-i) (pos is 1-based),
        # arithmetic mod 2^64 — identical to the sequential out*B + h_i
        # rolling but one vectorized pass (position-weighted products +
        # reduceat per doc run).
        lens = np.zeros(len(texts), dtype=np.int64)
        np.add.at(lens, parents, 1)
        exp = lens[parents] - pos.astype(np.int64)  # L - pos in [0, L-1]
        max_e = int(exp.max())
        pows = np.empty(max_e + 1, dtype=np.uint64)
        pows[0] = np.uint64(1)
        with np.errstate(over="ignore"):
            np.multiply.accumulate(np.full(max_e, B, dtype=np.uint64),
                                   out=pows[1:])
            contrib = tok_h * pows[exp]
            starts = np.flatnonzero(
                np.concatenate([[True], parents[1:] != parents[:-1]])
            )
            sums = np.add.reduceat(contrib, starts)
        out[parents[starts]] = sums
    return pa.table(
        {
            id_col: batch[id_col],
            "fingerprint": pa.array(out.astype(np.int64), type=pa.int64()),
        }
    )


def df_count_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch document-frequency partial: one ``kind=0`` (token-hash,
    df) row per unique token — df = number of batch docs containing it —
    plus one ``kind=1`` row carrying the batch's DOC COUNT, so the corpus
    size rides the same shuffle instead of costing a separate full pass.
    Docs never span input batches (one row = one doc), so summing partials
    over a ``groupby(["kind","th"])`` gives the exact corpus df and N —
    the only shuffle of the TF-IDF pipeline, at ~17 B/token-type."""
    from tangent_ray.tokenize.text import _md5_u64_unique

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, tokens, _ = split_tokens(texts)
    nd_row = (
        [np.int8(1)], [np.int64(0)], [np.int64(batch.num_rows)]
    )
    if not len(parents):
        return pa.table(
            {"kind": pa.array(nd_row[0], type=pa.int8()),
             "th": pa.array(nd_row[1], type=pa.int64()),
             "df": pa.array(nd_row[2], type=pa.int64())}
        )
    # distinct (doc, token) pairs via a fused int key over dictionary codes
    # (np.unique(axis=0) row-sorts through a void view — ~10x slower)
    d = pc.dictionary_encode(tokens)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nv = len(d.dictionary)
    pair_codes = np.unique(parents.astype(np.int64) * nv + codes) % nv
    df_per_code = np.bincount(pair_codes, minlength=nv).astype(np.int64)
    # the dictionary is already unique: hash it directly (md5_u64 would
    # re-dictionary-encode and identity-gather the whole vocabulary)
    th = _md5_u64_unique(d.dictionary).view(np.int64)
    return pa.table(
        {
            "kind": pa.array(
                np.concatenate([np.zeros(nv, np.int8), nd_row[0]]),
                type=pa.int8(),
            ),
            "th": pa.array(np.concatenate([th, nd_row[1]]), type=pa.int64()),
            "df": pa.array(
                np.concatenate([df_per_code, nd_row[2]]), type=pa.int64()
            ),
        }
    )


class TfIdfTopK:
    """Actor stage: top-k TF-IDF keywords per document against a broadcast
    document-frequency table (sorted hash keys -> df) — the classic
    keyword-extraction / topic-tagging stage of a corpus pipeline.

    score = tf * (ln((N+1)/(df+1)) + 1) (smooth idf). Ties break on the
    term string ascending, so ranks are fully deterministic and the DuckDB
    twin reproduces them exactly. Strings never shuffle: the df table is
    hash-keyed, term strings ride the local batch straight to the output."""

    def __init__(self, df_ref, n_docs: int, k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id"):
        import ray

        keys, dfs = ray.get(df_ref) if not isinstance(df_ref, tuple) else df_ref
        self.keys, self.dfs = keys, dfs  # sorted uint64, int64
        self.n, self.k = float(n_docs), k
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tangent_ray.tokenize.text import _md5_u64_unique

        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parents, tokens, _ = split_tokens(texts)
        empty = pa.table(
            {
                self.id_col: pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "score_e6": pa.array([], type=pa.int64()),
            }
        )
        if not len(parents):
            return empty
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        d = pc.dictionary_encode(tokens)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary.to_numpy(zero_copy_only=False)  # object strings
        nv = len(vocab)
        # distinct (doc, token) pairs + tf, one fused-key unique
        key = parents.astype(np.int64) * nv + codes
        pair, tf = np.unique(key, return_counts=True)
        p_parent = pair // nv
        p_code = (pair % nv).astype(np.int64)
        # df lookup on the broadcast table (md5 once per unique batch token)
        from tangent_ray.util import sorted_lookup

        th = _md5_u64_unique(d.dictionary)
        hit, pos_c = sorted_lookup(self.keys, th)
        df = np.zeros(nv, dtype=np.int64)
        df[hit] = self.dfs[pos_c[hit]]
        idf = np.log((self.n + 1.0) / (df + 1.0)) + 1.0
        score = tf * idf[p_code]
        # rank of each term string for the deterministic tie-break
        str_rank = np.empty(nv, dtype=np.int64)
        str_rank[np.argsort(vocab, kind="stable")] = np.arange(nv)
        order = np.lexsort((str_rank[p_code], -score, p_parent))
        sp, ss, st, sc = p_parent[order], score[order], tf[order], p_code[order]
        starts = np.flatnonzero(np.concatenate([[True], sp[1:] != sp[:-1]]))
        run_id = np.cumsum(np.concatenate([[0], (sp[1:] != sp[:-1]).astype(np.int64)]))
        rank = np.arange(len(sp)) - starts[run_id] + 1
        keep = rank <= self.k

        return pa.table(
            {
                self.id_col: pa.array(ids[sp[keep]], type=pa.int64()),
                "term": pa.array(vocab[sc[keep]].tolist(), type=pa.string()),
                "tf": pa.array(st[keep].astype(np.int64), type=pa.int64()),
                "rank": pa.array(rank[keep], type=pa.int64()),
                "score_e6": pa.array(
                    round_half_away(ss[keep] * 1e6, 0).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )


def tfidf_keywords(ds, k: int = 5, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 1):
    """Top-k TF-IDF keywords per doc: ONE df groupby (hash rows, ~17 B/type),
    broadcast the vocabulary-sized df table, then a stateless-read scoring
    pass. ``min_df`` prunes the broadcast's long tail at corpus scale; a
    pruned term then scores with df=0, INFLATING its idf by up to
    ln((df+1)/1) relative to the exact run — acceptable for keyword
    extraction (rare terms are usually wanted anyway) but not exact, which
    is why the oracle-twinned default is ``min_df=1``."""
    import ray
    from ray.data.aggregate import Sum

    from tangent_ray.util import actor_pool

    agg = (
        ds.map_batches(
            lambda b: df_count_partial(b, text_col=text_col),
            batch_format="pyarrow",
        )
        .groupby(["kind", "th"])
        .aggregate(Sum("df", alias_name="df"))
    )
    if min_df > 1:
        # prune BEFORE collecting: at 100 TB the raw vocabulary (typos,
        # hex strings, code tokens) is billions of rows, and the long tail
        # is exactly what min_df drops — the driver must only ever see the
        # pruned table. kind=1 (doc-count) rows always pass.
        agg = agg.map_batches(
            lambda b: b.filter(
                pc.or_(pc.equal(b["kind"], 1), pc.greater_equal(b["df"], min_df))
            ),
            batch_format="pyarrow",
        )
    t = agg.take_all()
    # kind=1 rows fold to the corpus doc count — same shuffle, no extra
    # ds.count() pass over a possibly compute-heavy upstream pipeline
    n_docs = sum(r["df"] for r in t if r["kind"] == 1)
    keys = np.array(
        [r["th"] for r in t if r["kind"] == 0], dtype=np.int64
    ).view(np.uint64)
    dfs = np.array([r["df"] for r in t if r["kind"] == 0], dtype=np.int64)
    order = np.argsort(keys)
    ref = ray.put((keys[order], dfs[order]))
    return ds.map_batches(
        TfIdfTopK,
        fn_constructor_args=(ref, n_docs, k, text_col, id_col),
        batch_format="pyarrow",
        concurrency=actor_pool(),
    )


SPLIT_BUCKETS = 1000
SPLIT_TEST, SPLIT_VAL = 10, 60  # bucket < 10 -> test; < 60 -> val; else train


def split_assign_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic train/val/test assignment by id hash (the standard
    holdout-split op of a training-data pipeline): bucket =
    ``int(md5(str(id))[:8], 16) % 1000``, test < 1%, val < 6%, train rest.

    Stable across runs, machines and engines (md5 of the DECIMAL id
    string — the DuckDB twin computes the identical bucket). Hashing
    touches only the id column — metadata-rate, not payload-rate."""
    from tangent_ray.tokenize.text import md5_bucket

    ids = batch[id_col].to_numpy(zero_copy_only=False)
    buckets = md5_bucket(ids, SPLIT_BUCKETS)
    split = np.where(
        buckets < SPLIT_TEST, "test", np.where(buckets < SPLIT_VAL, "val", "train")
    )
    return pa.table(
        {
            id_col: pa.array(ids.astype(np.int64), type=pa.int64()),
            "bucket": pa.array(buckets, type=pa.int64()),
            "split": pa.array(split.tolist(), type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters)


def _gram_keys(th: np.ndarray, parents: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """64-bit keys of in-doc token n-grams (n=2 or 3) from per-token hashes:
    chained splitmix combine (same kernel family as the bigram LM). Returns
    (keys, gram_parents)."""
    from tangent_ray.ops.lm import _bigram_key

    if len(th) < n:
        return np.empty(0, np.uint64), np.empty(0, parents.dtype)
    same = parents[n - 1:] == parents[: len(parents) - n + 1]
    key = th[: len(th) - n + 1]
    for i in range(1, n):
        key = _bigram_key(key, th[i : len(th) - n + 1 + i])
    return key[same], parents[: len(parents) - n + 1][same]


def _split_lines(texts) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Non-empty LF-split lines of a string array: (line_parents, lines,
    line_lengths) — the ONE line definition shared by the repetition
    signals and the Gopher gate (so the expensive split runs once when
    they compose)."""
    lists = pc.split_pattern(pc.coalesce(texts, ""), "\n")
    flat = pc.list_flatten(lists)
    lparents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    lparents = lparents[keep]
    lines = flat.filter(pa.array(keep))
    llen = pc.utf8_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    return lparents, lines, llen


def repetition_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id", *, _tok=None,
                     _lines=None) -> pa.Table:
    """Per-document repetition signals (the Gopher/RefinedWeb family):

    - ``dup_line_frac``      — fraction of non-empty lines (split on LF)
                                belonging to a line value that occurs >=2
                                times in the document (every member counts);
    - ``dup_line_char_frac`` — same numerator weighted by line length, over
                                total non-empty-line characters;
    - ``top2gram_frac``      — min(1, occurrences of the most frequent
                                token 2-gram x 2 / n_tokens) — overlapping
                                occurrences each count, hence the cap;
    - ``top3gram_frac``      — min(1, most frequent 3-gram x 3 / n_tokens);
    - ``dup3gram_frac``      — min(1, tokens covered by 3-gram TYPES that
                                occur >=2 times / n_tokens) — overlapping
                                occurrences are each counted, hence the cap.

    Tokenization is the shared ``[^a-z0-9]+``-on-lower definition, so the
    DuckDB twin (``tests/test_repetition.py``) reproduces every value
    exactly. One vectorized pass per batch: lines via one Arrow
    ``split_pattern`` + per-(row, line-hash) run counting on a lexsorted
    key, n-grams via zero-copy shifted views of the flat token-hash array.
    No shuffle — pure map, scale-safe at any corpus size.
    """
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = batch.num_rows
    from tangent_ray.tokenize.text import md5_u64

    # --- line stats (``_tok``/``_lines`` let a composing caller — the
    # Gopher gate — reuse its own tokenize/line-split instead of re-paying
    # the two most expensive passes) ----------------------------------------
    lparents, lines, llen = _lines if _lines is not None else _split_lines(texts)
    # EXACT line identity: per-batch dictionary codes, not a hash — equal
    # codes iff equal strings (the n-gram keys below do use 64-bit hash
    # combines; at ~1e6 grams/batch the in-batch birthday odds are ~3e-8,
    # the same accepted trade as every hash-keyed op in this package)
    lh = pc.dictionary_encode(lines).indices.to_numpy(zero_copy_only=False)

    n_lines = np.zeros(n_rows, np.int64)
    line_chars = np.zeros(n_rows, np.int64)
    dup_lines = np.zeros(n_rows, np.int64)
    dup_line_chars = np.zeros(n_rows, np.int64)
    if len(lparents):
        np.add.at(n_lines, lparents, 1)
        np.add.at(line_chars, lparents, llen)
        # group by (row, line hash): lexsort, then run counting
        order = np.lexsort((lh, lparents))
        sp, sh, sl = lparents[order], lh[order], llen[order]
        bound = np.concatenate(
            [[True], (sp[1:] != sp[:-1]) | (sh[1:] != sh[:-1])]
        )
        starts = np.flatnonzero(bound)
        lengths = np.diff(np.concatenate([starts, [len(sp)]]))
        dup = lengths >= 2
        if dup.any():
            np.add.at(dup_lines, sp[starts[dup]], lengths[dup])
            np.add.at(
                dup_line_chars, sp[starts[dup]], lengths[dup] * sl[starts[dup]]
            )

    # --- n-gram stats -------------------------------------------------------
    parents, tokens = _tok if _tok is not None else split_tokens(texts)[:2]
    th = md5_u64(tokens)
    n_tokens = np.zeros(n_rows, np.int64)
    if len(parents):
        np.add.at(n_tokens, parents, 1)

    def _gram_stats(n: int) -> tuple[np.ndarray, np.ndarray]:
        """(max run per row, tokens-in-dup-types per row) for n-grams."""
        top = np.zeros(n_rows, np.int64)
        dup_tok = np.zeros(n_rows, np.int64)
        keys, gp = _gram_keys(th, parents, n)
        if len(keys):
            order = np.lexsort((keys, gp))
            sp, sk = gp[order], keys[order]
            bound = np.concatenate(
                [[True], (sp[1:] != sp[:-1]) | (sk[1:] != sk[:-1])]
            )
            starts = np.flatnonzero(bound)
            lengths = np.diff(np.concatenate([starts, [len(sp)]]))
            np.maximum.at(top, sp[starts], lengths)
            dup = lengths >= 2
            if dup.any():
                np.add.at(dup_tok, sp[starts[dup]], lengths[dup] * n)
        return top, dup_tok

    top2, _ = _gram_stats(2)
    top3, dup3 = _gram_stats(3)

    def _frac(num, den):
        return round_half_away(
            np.divide(
                num.astype(np.float64),
                den.astype(np.float64),
                out=np.zeros(n_rows, np.float64),
                where=den > 0,
            ),
            6,
        )

    return pa.table(
        {
            id_col: batch[id_col],
            "n_lines": pa.array(n_lines, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "dup_line_frac": pa.array(_frac(dup_lines, n_lines), type=pa.float64()),
            "dup_line_char_frac": pa.array(
                _frac(dup_line_chars, line_chars), type=pa.float64()
            ),
            "top2gram_frac": pa.array(
                _frac(np.minimum(top2 * 2, n_tokens), n_tokens),
                type=pa.float64(),
            ),
            "top3gram_frac": pa.array(
                _frac(np.minimum(top3 * 3, n_tokens), n_tokens),
                type=pa.float64(),
            ),
            "dup3gram_frac": pa.array(
                _frac(np.minimum(dup3, n_tokens), n_tokens), type=pa.float64()
            ),
        }
    )


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset-level repetition signals: stateless vectorized map, no
    shuffle."""
    return ds.map_batches(
        lambda b: repetition_batch(b, text_col, id_col), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Composed Gopher quality filter (Rae et al. 2021, Table A1)

#: the 8 Gopher "stop words" — a document must contain >= 2 DISTINCT ones
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: rule bit positions in ``fail_mask`` (a set bit = the rule REJECTED the
#: doc). Doc-shape thresholds (bits 0-5) are the published Gopher values;
#: the repetition caps (bits 6-10) are ADAPTED to this package's five
#: signals — Gopher's n-gram rules are CHARACTER fractions over 2..10-gram
#: families, these are token-count fractions over the 2/3-gram signals
#: repetition_batch computes (bit 10 reuses Gopher's 0.16 from its top-
#: 4-gram rule as the dup-3-gram cap), tokenization the shared [^a-z0-9]+
GOPHER_RULES = (
    "word_count",          # bit 0: n_words outside [50, 100000]
    "mean_word_len",       # bit 1: mean token length outside [3, 10]
    "symbol_ratio",        # bit 2: (# + ellipsis) / n_words > 0.1
    "bullet_ellipsis",     # bit 3: >90% bullet-start or >30% ellipsis-end lines
    "alpha_words",         # bit 4: <80% of words contain a letter
    "stopwords",           # bit 5: <2 distinct Gopher stop words
    "dup_line",            # bit 6: dup_line_frac > 0.30
    "dup_line_char",       # bit 7: dup_line_char_frac > 0.20
    "top2gram",            # bit 8: top2gram_frac > 0.20
    "top3gram",            # bit 9: top3gram_frac > 0.18
    "dup3gram",            # bit 10: dup3gram_frac > 0.16
)


def gopher_filter_batch(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_words: int = 50, max_words: int = 100_000) -> pa.Table:
    """Per-doc Gopher quality gate: (id, n_words, fail_mask, keep) where
    ``fail_mask`` sets one bit per violated rule (see ``GOPHER_RULES``)
    and ``keep = fail_mask == 0``. One vectorized pass composing the
    repetition signals with the doc/line/word-shape rules — no shuffle,
    scale-safe at any corpus size. The DuckDB twin
    (``tests/test_gopher.py``) reproduces every bit exactly."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = batch.num_rows
    filled = pc.coalesce(texts, "")
    parents, tokens, _pos = split_tokens(texts)
    lparents, lines, llen = _split_lines(texts)
    rep = repetition_batch(
        batch, text_col, id_col,
        _tok=(parents, tokens), _lines=(lparents, lines, llen),
    )
    n_words = rep["n_tokens"].to_numpy(zero_copy_only=False)

    tok_len = pc.utf8_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    len_sum = np.zeros(n_rows, np.int64)
    alpha_words = np.zeros(n_rows, np.int64)
    if len(parents):
        np.add.at(len_sum, parents, tok_len)
        has_alpha = pc.match_substring_regex(tokens, "[a-z]").to_numpy(
            zero_copy_only=False
        )
        np.add.at(alpha_words, parents, has_alpha.astype(np.int64))
    mean_len = np.divide(
        len_sum.astype(np.float64), n_words,
        out=np.zeros(n_rows, np.float64), where=n_words > 0,
    )

    # symbols: '#' occurrences + ellipsis occurrences ('...' or the
    # one-char U+2026), counted on the RAW text
    n_hash = pc.count_substring(filled, "#").to_numpy(zero_copy_only=False)
    n_ell = (
        pc.count_substring_regex(filled, r"\.{3}").to_numpy(zero_copy_only=False)
        + pc.count_substring(filled, "…").to_numpy(zero_copy_only=False)
    )
    symbol_ratio = np.divide(
        (n_hash + n_ell).astype(np.float64), n_words,
        out=np.full(n_rows, np.inf), where=n_words > 0,
    )

    # line shapes: fraction of non-empty lines starting with a bullet or
    # ending with an ellipsis (lines from the shared split above)
    n_lines = np.zeros(n_rows, np.int64)
    bullet = np.zeros(n_rows, np.int64)
    ell_end = np.zeros(n_rows, np.int64)
    if len(lparents):
        np.add.at(n_lines, lparents, 1)
        is_bullet = pc.match_substring_regex(
            lines, r"^\s*([-*•‣▪●])"
        ).to_numpy(zero_copy_only=False)
        is_ell = pc.match_substring_regex(
            lines, r"(\.{3}|…)\s*$"
        ).to_numpy(zero_copy_only=False)
        np.add.at(bullet, lparents, is_bullet.astype(np.int64))
        np.add.at(ell_end, lparents, is_ell.astype(np.int64))
    bullet_frac = np.divide(
        bullet.astype(np.float64), n_lines,
        out=np.zeros(n_rows, np.float64), where=n_lines > 0,
    )
    ell_frac = np.divide(
        ell_end.astype(np.float64), n_lines,
        out=np.zeros(n_rows, np.float64), where=n_lines > 0,
    )

    # distinct Gopher stopwords per doc (index_in nulls = misses)
    stop_idx = pc.index_in(
        tokens, value_set=pa.array(GOPHER_STOPWORDS, type=pa.string())
    )
    n_stop = np.zeros(n_rows, np.int64)
    valid = pc.is_valid(stop_idx).to_numpy(zero_copy_only=False)
    if valid.any():
        nsw = len(GOPHER_STOPWORDS)
        si = stop_idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(parents[valid].astype(np.int64) * nsw + si[valid])
        np.add.at(n_stop, (uniq // nsw).astype(np.int64), 1)

    alpha_frac = np.divide(
        alpha_words.astype(np.float64), n_words,
        out=np.zeros(n_rows, np.float64), where=n_words > 0,
    )

    def col(name):
        return rep[name].to_numpy(zero_copy_only=False)

    fail = np.zeros(n_rows, np.int64)
    fail |= ((n_words < min_words) | (n_words > max_words)).astype(np.int64) << 0
    fail |= ((mean_len < 3) | (mean_len > 10)).astype(np.int64) << 1
    fail |= (symbol_ratio > 0.1).astype(np.int64) << 2
    fail |= ((bullet_frac > 0.9) | (ell_frac > 0.3)).astype(np.int64) << 3
    fail |= (alpha_frac < 0.8).astype(np.int64) << 4
    fail |= (n_stop < 2).astype(np.int64) << 5
    fail |= (col("dup_line_frac") > 0.30).astype(np.int64) << 6
    fail |= (col("dup_line_char_frac") > 0.20).astype(np.int64) << 7
    fail |= (col("top2gram_frac") > 0.20).astype(np.int64) << 8
    fail |= (col("top3gram_frac") > 0.18).astype(np.int64) << 9
    fail |= (col("dup3gram_frac") > 0.16).astype(np.int64) << 10
    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(n_words, type=pa.int64()),
            "fail_mask": pa.array(fail, type=pa.int64()),
            "keep": pa.array(fail == 0, type=pa.bool_()),
        }
    )


def gopher_filter(ds, text_col: str = "text", id_col: str = "doc_id",
                  min_words: int = 50, max_words: int = 100_000):
    """Dataset-level Gopher quality gate: stateless vectorized map, no
    shuffle."""
    return ds.map_batches(
        lambda b: gopher_filter_batch(b, text_col, id_col, min_words, max_words),
        batch_format="pyarrow",
    )


def token_entropy_batch(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Per-doc unigram token entropy in bits (H = -sum p*log2 p over the
    doc's token distribution) — low entropy flags degenerate/repetitive
    text that n-gram caps can miss, high entropy flags hash/gibberish
    pages. Vectorized: dictionary codes fuse with doc ids into one int64
    key, np.unique run counts, one log2 pass; empty docs report 0.0.
    Rounded to 6 like every ratio here; exact DuckDB twin in
    ``tests/test_entropy.py``."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = batch.num_rows
    parents, tokens, _pos = split_tokens(texts)
    n_tokens = np.zeros(n_rows, np.int64)
    entropy = np.zeros(n_rows, np.float64)
    if len(parents):
        np.add.at(n_tokens, parents, 1)
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        codes = pc.dictionary_encode(tokens).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        key = parents.astype(np.int64) * (codes.max() + 1) + codes
        pair, cnt = np.unique(key, return_counts=True)
        pp = (pair // (codes.max() + 1)).astype(np.int64)
        p = cnt / n_tokens[pp]
        np.add.at(entropy, pp, -p * np.log2(p))
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "token_entropy": pa.array(
                round_half_away(entropy, 6), type=pa.float64()
            ),
        }
    )


def token_entropy(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset-level token entropy: stateless vectorized map, no shuffle."""
    return ds.map_batches(
        lambda b: token_entropy_batch(b, text_col, id_col),
        batch_format="pyarrow",
    )
