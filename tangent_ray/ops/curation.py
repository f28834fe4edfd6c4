"""Corpus-curation operators for training-data pipelines: PII redaction,
benchmark decontamination, deterministic stratified sampling, and sequence
packing.

All hot paths are vectorized Arrow kernels inside ``map_batches`` stages;
every operator is deterministic and engine-independent (RE2 regexes, md5
hashes); the classic curation ops have exact DuckDB oracle twins in
``pipelines/entry_queries.py`` or in their pytest modules
(``mojibake_repair`` is the exception: its repair ladder is
Python-semantics by nature, verified against hand-built encodings and
adversarial lookalikes in ``tests/test_mojibake.py``).

Scale notes (100 TB corpus):
- PII redaction and sampling are stateless per-batch maps — no shuffle.
- Decontamination broadcasts the HOLDOUT side (a benchmark set: unique
  shingle hashes, MBs) via ``ray.put`` and streams the train side through a
  membership filter — the corpus never shuffles.
- Sequence packing needs a per-stream prefix sum, so it shuffles once on the
  stream key (``source``); at scale a pipeline shards each source into
  independent packing streams by doc-id range and packs each shard
  separately (the op packs whatever key it is given).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.tokenize.text import md5_u64, split_tokens
from tangent_ray.util import actor_pool

# ---------------------------------------------------------------------------
# PII redaction

#: (name, RE2 pattern, replacement) applied SEQUENTIALLY in this order; both
#: Arrow and DuckDB use RE2, so the DuckDB twin replays the same passes.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"(\+?\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_redact_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Redact emails / phone numbers / IPv4 addresses from ``text_col``.

    Counts each category on the text as it stands when that pass runs (the
    passes compose sequentially), then replaces matches with the category
    token. Pure RE2 kernels (`count_substring_regex`,
    `replace_substring_regex`) — no Python touches a string.
    """
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    cols: dict[str, pa.Array | pa.ChunkedArray] = {id_col: batch[id_col]}
    for name, pat, repl in PII_PATTERNS:
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(texts, pat), pa.int64()
        )
        texts = pc.replace_substring_regex(texts, pat, repl)
    cols["redacted"] = texts
    return pa.table(cols)


# ---------------------------------------------------------------------------
# Benchmark decontamination

DECONTAM_N = 5  # shingle width shared with the DuckDB twin


def _doc_shingle_hashes(
    batch: pa.Table, n: int, text_col: str, id_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """(parent_row, shingle_md5) pairs, DISTINCT within each document."""
    from tangent_ray.ops.dedup import shingle_batch

    rows = pa.table(
        {id_col: pa.array(np.arange(batch.num_rows), type=pa.int64()),
         text_col: batch[text_col]}
    )
    sh = shingle_batch(rows, n, text_col, id_col)
    parents = sh[id_col].to_numpy(zero_copy_only=False)
    hashes = md5_u64(sh["shingle"])
    if len(parents) == 0:
        return parents.astype(np.int64), hashes
    # per-doc distinct: sort (parent, hash), drop adjacent duplicates
    order = np.lexsort((hashes, parents))
    p, h = parents[order], hashes[order]
    keep = np.concatenate([[True], (p[1:] != p[:-1]) | (h[1:] != h[:-1])])
    return p[keep].astype(np.int64), h[keep]


def holdout_shingle_hashes(ds, n: int = DECONTAM_N, text_col: str = "text") -> np.ndarray:
    """Sorted unique shingle md5 hashes of the holdout/benchmark dataset.

    The per-batch map emits each batch's UNIQUE hashes only; the driver
    merges those small arrays. Driver memory is O(unique holdout shingles)
    — the holdout is a benchmark set (MBs), never the corpus.
    """
    def uniq_batch(batch: pa.Table) -> pa.Table:
        _, h = _doc_shingle_hashes(batch, n, text_col, "doc_id")
        return pa.table({"h": pa.array(np.unique(h).astype(np.int64), type=pa.int64())})

    parts = ds.map_batches(uniq_batch, batch_format="pyarrow")
    import ray

    # zero-row upstream blocks can surface unmapped with their old schema
    arrs = [
        t["h"].to_numpy(zero_copy_only=False)
        for t in ray.get(parts.to_arrow_refs())
        if t.num_rows and "h" in t.schema.names
    ]
    if not arrs:
        return np.empty(0, dtype=np.uint64)
    # unique in the UINT64 domain (the int64 transport wraps large values
    # negative, so int64-order unique would not be sorted for searchsorted)
    return np.unique(np.concatenate(arrs).astype(np.uint64))


class Decontaminate:
    """Actor-pool stage: flag train docs sharing any ``n``-gram with the
    broadcast holdout set. ``holdout_ref`` is a ``ray.put`` handle to the
    sorted hash array — shipped once per actor, not per batch."""

    def __init__(self, holdout_ref, n: int = DECONTAM_N,
                 text_col: str = "text", id_col: str = "doc_id"):
        import ray

        h = ray.get(holdout_ref) if not isinstance(holdout_ref, np.ndarray) else holdout_ref
        self.holdout = np.sort(np.asarray(h, dtype=np.uint64))
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parents, hashes = _doc_shingle_hashes(
            batch, self.n, self.text_col, self.id_col
        )
        from tangent_ray.util import sorted_lookup

        n_bad = np.zeros(batch.num_rows, dtype=np.int64)
        if len(parents) and len(self.holdout):
            hit, _ = sorted_lookup(self.holdout, hashes)
            np.add.at(n_bad, parents[hit], 1)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_bad": pa.array(n_bad, type=pa.int64()),
                "contaminated": pa.array(n_bad > 0, type=pa.bool_()),
            }
        )


class DropContaminated(Decontaminate):
    """Filtering variant of :class:`Decontaminate`: drops contaminated rows
    and passes every input column through unchanged (for mid-pipeline use
    where downstream stages still need the text/source columns)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = super().__call__(batch)
        keep = pc.invert(flags["contaminated"])
        if isinstance(keep, pa.ChunkedArray):
            keep = keep.combine_chunks()
        return batch.filter(keep)


def decontaminate(train_ds, holdout_ds, n: int = DECONTAM_N,
                  text_col: str = "text", id_col: str = "doc_id",
                  concurrency=None):
    """Per-train-doc count of DISTINCT shingles that also occur anywhere in
    ``holdout_ds`` (classic benchmark-decontamination flagging)."""
    import ray

    ref = ray.put(holdout_shingle_hashes(holdout_ds, n, text_col))
    return train_ds.map_batches(
        Decontaminate,
        fn_constructor_kwargs=dict(
            holdout_ref=ref, n=n, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool(),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling

SAMPLE_BUCKETS = 1_000_000


def sample_bucket(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-id sample bucket in [0, 1e6): first 8 hex digits of
    ``md5('s:' + str(id))`` mod 1e6. The ``s:`` salt decorrelates it from
    the holdout-split hash (`textstats.split_assign_batch`), so sampling is
    independent of split assignment. Engine-stable (DuckDB twin computes
    the identical bucket); id-only, so cost is metadata-rate."""
    from tangent_ray.tokenize.text import md5_bucket

    return md5_bucket(ids, SAMPLE_BUCKETS, prefix="s:")


def sample_threshold(rate: float) -> int:
    """The ONE rate -> integer-bucket-threshold definition, shared with the
    DuckDB twins: ``round`` (not ``int``) so a binary-float rate like 0.3
    (0.29999999...994 * 1e6 = 299999.99...) keeps its boundary bucket."""
    return int(round(rate * SAMPLE_BUCKETS))


def stratified_sample_batch(
    batch: pa.Table,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> pa.Table:
    """Keep each row iff ``bucket < round(rate[stratum] * 1e6)`` — a
    deterministic per-stratum Bernoulli sample with the subset property
    (the rate-0.1 sample is contained in the rate-0.5 sample), so sample
    sizes can be re-negotiated without reshuffling data. Returns the kept
    rows of the batch unchanged plus the bucket column."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    buckets = sample_bucket(ids)
    strata = batch[strata_col].to_numpy(zero_copy_only=False)
    # thresholds resolved once per UNIQUE stratum, then one gather — no
    # per-row Python dict lookups
    uniq, inv = np.unique(strata, return_inverse=True)
    thr_u = np.array(
        [sample_threshold(rates.get(s, default_rate)) for s in uniq],
        dtype=np.int64,
    )
    keep = buckets < thr_u[inv]
    out = batch.filter(pa.array(keep))
    return out.append_column("bucket", pa.array(buckets[keep], type=pa.int64()))


# ---------------------------------------------------------------------------
# Sequence packing

PACK_SEQ_LEN = 256


def pack_group(group: pa.Table, seq_len: int = PACK_SEQ_LEN,
               text_col: str = "text", id_col: str = "doc_id",
               key_col: str = "source") -> pa.Table:
    """Pack one stream's documents (ordered by id) into fixed-length token
    sequences, concatenation-style: the token streams of consecutive docs
    are laid end to end and cut every ``seq_len`` tokens, so a document may
    span sequences (`seq_first`..`seq_last`) starting at ``seq_offset``
    within its first sequence. One vectorized pass: tokenize, cumsum,
    integer divide."""
    if group.num_rows == 0:
        # derive id/key types from the group so the empty stub's schema
        # matches non-empty groups for ANY input types
        return pa.table(
            {
                id_col: pa.array([], type=group[id_col].type),
                key_col: pa.array([], type=group[key_col].type),
                "n_tok": pa.array([], type=pa.int64()),
                "seq_first": pa.array([], type=pa.int64()),
                "seq_last": pa.array([], type=pa.int64()),
                "seq_offset": pa.array([], type=pa.int64()),
            }
        )
    order = pc.sort_indices(group[id_col])
    group = group.take(order)
    texts = group[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, _, _ = split_tokens(texts)
    n_tok = np.zeros(group.num_rows, dtype=np.int64)
    if len(parents):
        np.add.at(n_tok, parents, 1)
    cum = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    seq_first = cum // seq_len
    last_tok = cum + np.maximum(n_tok, 1) - 1  # empty docs stay in seq_first
    return pa.table(
        {
            id_col: group[id_col],
            key_col: group[key_col],
            "n_tok": pa.array(n_tok, type=pa.int64()),
            "seq_first": pa.array(seq_first, type=pa.int64()),
            "seq_last": pa.array(last_tok // seq_len, type=pa.int64()),
            "seq_offset": pa.array(cum % seq_len, type=pa.int64()),
        }
    )


def pack_sequences(ds, seq_len: int = PACK_SEQ_LEN, text_col: str = "text",
                   id_col: str = "doc_id", key_col: str = "source"):
    """Per-``key_col`` sequence packing: ONE shuffle on the stream key, then
    a vectorized in-group pass. Shard huge streams into doc-id ranges
    upstream if one key's token stream must be packed by many workers."""
    import functools

    fn = functools.partial(
        pack_group, seq_len=seq_len, text_col=text_col,
        id_col=id_col, key_col=key_col,
    )
    return ds.groupby(key_col).map_groups(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Context-window chunking

CHUNK_TOKENS = 128
CHUNK_OVERLAP = 32


def chunk_spans_batch(batch: pa.Table, max_tokens: int = CHUNK_TOKENS,
                      overlap: int = CHUNK_OVERLAP, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Split each document into overlapping token-range chunks (the
    context-window chunking stage of RAG / pretraining pipelines):
    chunk i covers tokens [i*stride, i*stride + max_tokens) with
    stride = max_tokens - overlap; the final chunk is the first one whose
    window reaches the document's end (no degenerate tail chunks fully
    contained in their predecessor). Pure per-batch explode — token
    counts, chunk counts and spans are one vectorized repeat + arange, no
    shuffle, no per-doc Python. Empty docs emit no chunks.

    Emits (id, chunk_idx, tok_start, tok_end, n_tok) with ``tok_end``
    EXCLUSIVE and clamped to the document length.
    """
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, _tokens, _ = split_tokens(texts)
    n_tok = np.zeros(batch.num_rows, dtype=np.int64)
    if len(parents):
        np.add.at(n_tok, parents, 1)
    # chunks per doc: 1 + ceil(max(n - max_tokens, 0) / stride), 0 if empty
    extra = np.maximum(n_tok - max_tokens, 0)
    n_chunks = np.where(n_tok > 0, 1 + -(-extra // stride), 0)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rep_ids = np.repeat(ids, n_chunks)
    rep_n = np.repeat(n_tok, n_chunks)
    total = int(n_chunks.sum())
    starts_of_doc = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    chunk_idx = np.arange(total, dtype=np.int64) - starts_of_doc
    tok_start = chunk_idx * stride
    tok_end = np.minimum(tok_start + max_tokens, rep_n)
    return pa.table(
        {
            id_col: pa.array(rep_ids, type=pa.int64()),
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
            "tok_start": pa.array(tok_start, type=pa.int64()),
            "tok_end": pa.array(tok_end, type=pa.int64()),
            "n_tok": pa.array(rep_n, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Source-mix resampling (data-mixture reweighting)


def mix_multipliers(
    totals: dict[str, int],
    weights: dict[str, float],
    total_tokens: int | None = None,
    max_epochs: float = 10.0,
) -> dict[str, float]:
    """Per-source replication multiplier for a target token mixture: source
    ``s`` should contribute ``weight_s / sum(weights) * budget`` tokens, so
    its documents are repeated ``m_s = target_s / actual_s`` times (The
    Pile / DoReMi-style epoch weighting). Pure driver math over the tiny
    per-source totals dict — ONE definition shared by the operator and its
    DuckDB-twin test.

    ``total_tokens`` defaults to the current corpus total (rebalance at
    constant size). Sources absent from ``weights`` get multiplier 0
    (dropped); multipliers cap at ``max_epochs`` to bound upsampling of a
    tiny source."""
    w_sum = float(sum(weights.values()))
    if w_sum <= 0:
        raise ValueError("weights must sum to a positive value")
    budget = float(
        total_tokens if total_tokens is not None else sum(totals.values())
    )
    out: dict[str, float] = {}
    for s, toks in totals.items():
        w = float(weights.get(s, 0.0))
        m = (w / w_sum) * budget / toks if (w > 0 and toks > 0) else 0.0
        out[s] = min(m, float(max_epochs))
    return out


def _resample_epochs(
    batch: pa.Table, mult: dict[str, float], id_col: str, source_col: str
) -> pa.Table:
    """Replicate each (id, source, n_tok) row into its epochs: epochs
    ``0..floor(m)-1`` always, plus epoch ``floor(m)`` iff
    ``md5_bucket(id, prefix='e{floor(m)}:') < threshold(frac(m))`` — the
    fractional epoch is a deterministic Bernoulli keyed off the id with an
    epoch-salted prefix, so it is independent of the `s:` sample bucket and
    replayable in SQL. Vectorized: one np.repeat, buckets computed once per
    UNIQUE floor(m) value (a handful per batch)."""
    from tangent_ray.tokenize.text import md5_bucket

    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    src = batch[source_col].to_numpy(zero_copy_only=False)
    n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, inv = np.unique(src, return_inverse=True)
    m_u = np.array([float(mult.get(s, 0.0)) for s in uniq], dtype=np.float64)
    k_u = np.floor(m_u).astype(np.int64)
    thr_u = np.array(
        [sample_threshold(m - k) for m, k in zip(m_u, k_u)], dtype=np.int64
    )
    k, thr = k_u[inv], thr_u[inv]
    frac_keep = np.zeros(len(ids), dtype=bool)
    need = thr > 0
    for kk in np.unique(k[need]):
        sel = need & (k == kk)
        frac_keep[sel] = (
            md5_bucket(ids[sel], SAMPLE_BUCKETS, prefix=f"e{int(kk)}:")
            < thr[sel]
        )
    reps = k + frac_keep
    rep_idx = np.repeat(np.arange(len(ids)), reps)
    starts = np.repeat(np.cumsum(reps) - reps, reps)
    epoch = np.arange(int(reps.sum()), dtype=np.int64) - starts
    return pa.table(
        {
            id_col: pa.array(ids[rep_idx], type=pa.int64()),
            source_col: pa.array(src[rep_idx].tolist(), type=pa.string()),
            "epoch": pa.array(epoch, type=pa.int64()),
            "n_tok": pa.array(n_tok[rep_idx], type=pa.int64()),
        }
    )


def source_mix_resample(
    ds,
    weights: dict[str, float],
    total_tokens: int | None = None,
    max_epochs: float = 10.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Resample a corpus to a target per-source token mixture. Returns the
    epoch-assignment Dataset ``(id, source, epoch, n_tok)``: a document
    appears once per training epoch it participates in (0-based), with the
    fractional last epoch drawn deterministically per id.

    Two passes over a NARROW per-doc token table, never the payload:
    pass 1 tokenizes once into ``(id, source, n_tok)`` (24 B/doc) and
    materializes it — metadata-rate, spillable; per-source totals then come
    from a #sources-row groupby, and pass 2 is a stateless replicating map
    over the same materialized table. The text re-join (epoch table x
    corpus) composes as ``hash_join`` on ``id`` downstream, so payload
    bytes move zero times here."""

    def _narrow(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parents, _tokens, _ = split_tokens(texts)
        n_tok = np.zeros(batch.num_rows, dtype=np.int64)
        if len(parents):
            np.add.at(n_tok, parents, 1)
        return pa.table(
            {
                id_col: batch[id_col],
                source_col: batch[source_col],
                "n_tok": pa.array(n_tok, type=pa.int64()),
            }
        )

    narrow = ds.map_batches(_narrow, batch_format="pyarrow").materialize()
    totals = {
        r[source_col]: int(r["sum(n_tok)"])
        for r in narrow.groupby(source_col).sum("n_tok").take_all()
    }
    mult = mix_multipliers(totals, weights, total_tokens, max_epochs)
    return narrow.map_batches(
        lambda b: _resample_epochs(b, mult, id_col, source_col),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# C4-style line filter (Raffel et al. 2020, the C4 cleaning rules)

C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3


def c4_filter_batch(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_line_words: int = C4_MIN_LINE_WORDS,
                    min_kept_lines: int = C4_MIN_KEPT_LINES) -> pa.Table:
    """The C4 cleaning pass, line-level rules vectorized in one map:

    - keep a line iff it ends in terminal punctuation (``.!?"``) AND has
      >= ``min_line_words`` words (shared ``[^a-z0-9]+`` tokenizer);
    - rebuild the doc from kept lines (LF-joined);
    - ``keep`` = doc retains >= ``min_kept_lines`` lines (C4's 3-sentence
      floor, line-as-sentence proxy) AND contains neither ``lorem ipsum``
      nor a ``{`` (code pages). C4's word-blocklist rule is intentionally
      omitted (no public-list shipping here); its 3-sentence-span dedup is
      ``window_dedup``'s job.

    Returns (id, text, n_kept_lines, n_dropped_lines, keep). Stateless
    vectorized map — no shuffle. Exact DuckDB twin in
    ``tests/test_c4.py``."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = batch.num_rows
    filled = pc.coalesce(texts, "")
    lists = pc.split_pattern(filled, "\n")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    terminal = pc.match_substring_regex(
        flat, r'[.!?"]\s*$'
    ).to_numpy(zero_copy_only=False)
    lp, _tok, _ = split_tokens(flat)
    words_per_line = np.zeros(len(flat), np.int64)
    if len(lp):
        np.add.at(words_per_line, lp, 1)
    keep_line = terminal & (words_per_line >= min_line_words)

    n_lines_tot = np.zeros(n_rows, np.int64)
    n_kept = np.zeros(n_rows, np.int64)
    np.add.at(n_lines_tot, parents, 1)
    if keep_line.any():
        np.add.at(n_kept, parents[keep_line], 1)

    offsets = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    kept_lines = flat.filter(pa.array(keep_line))
    out_lists = pa.ListArray.from_arrays(pa.array(offsets), kept_lines)
    rebuilt = pc.binary_join(out_lists, "\n")

    lower = pc.utf8_lower(filled)
    lorem = pc.match_substring(lower, "lorem ipsum").to_numpy(
        zero_copy_only=False
    )
    brace = pc.match_substring(filled, "{").to_numpy(zero_copy_only=False)
    keep_doc = (n_kept >= min_kept_lines) & ~lorem & ~brace
    return pa.table(
        {
            id_col: batch[id_col],
            text_col: rebuilt.cast(pa.string()),
            "n_kept_lines": pa.array(n_kept, type=pa.int64()),
            "n_dropped_lines": pa.array(n_lines_tot - n_kept, type=pa.int64()),
            "keep": pa.array(keep_doc, type=pa.bool_()),
        }
    )


def c4_filter(ds, text_col: str = "text", id_col: str = "doc_id",
              min_line_words: int = C4_MIN_LINE_WORDS,
              min_kept_lines: int = C4_MIN_KEPT_LINES):
    """Dataset-level C4 cleaning pass: stateless vectorized map, no
    shuffle."""
    return ds.map_batches(
        lambda b: c4_filter_batch(
            b, text_col, id_col, min_line_words, min_kept_lines
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Deterministic fixed-size uniform sample

SAMPLE_KEY_HEX = 15  # 60 bits: fits both int64 and DuckDB's BIGINT cast


def sample_key(ids: np.ndarray) -> np.ndarray:
    """Deterministic 60-bit sample ordering key: first 15 hex digits of
    ``md5('u:' + str(id))`` via the shared ``md5_key`` — engine-stable
    (the DuckDB twin computes the identical key) and salt-decorrelated
    from both the holdout split and the rate-based sample bucket."""
    from tangent_ray.tokenize.text import md5_key

    return md5_key(ids, prefix="u:", hex_digits=SAMPLE_KEY_HEX)


def uniform_sample(ds, k: int, id_col: str = "doc_id"):
    """Fixed-size deterministic uniform sample: the k rows with the
    smallest salted-md5 id keys (ties broken by id). Equivalent to
    ``ORDER BY md5_key, id LIMIT k`` but never sorts the corpus: each
    batch prunes to its own k smallest (vectorized argpartition), so the
    final sort+limit sees only k x n_blocks rows. Deterministic across
    runs AND across corpus growth in the same sense as a min-wise sketch:
    a doc in the sample stays in it until k better keys exist. Output
    columns = the input's (the internal ordering key is dropped)."""
    if "sample_key" in ds.schema().names:
        raise ValueError("uniform_sample: column name 'sample_key' is reserved")

    def prune(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = sample_key(ids)
        if len(ids) > k:
            cut = np.argpartition(keys, k - 1)[:k]
            batch = batch.take(pa.array(cut))
            keys = keys[cut]
        return batch.append_column(
            "sample_key", pa.array(keys, type=pa.int64())
        )

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .sort(["sample_key", id_col])
        .limit(k)
        .drop_columns(["sample_key"])
    )


# ---------------------------------------------------------------------------
# Mojibake repair (conservative ftfy-style UTF-8-as-cp1252 undo)

def _cp1252_char(b: int) -> str:
    """Byte -> char under the lenient cp1252-with-latin1-gaps decode that
    creates mojibake in the first place."""
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return chr(b)


def _build_mojibake_re() -> str:
    """Signature of UTF-8 mis-decoded as cp1252: a LEAD byte (0xC2-0xF4)
    char immediately followed by a CONTINUATION byte (0x80-0xBF) char.
    Covers Latin ("Ã©"), punctuation ("â€™") and CJK ("æ—¥") mojibake
    alike; legit accented text ("château", "Ã is a letter") never pairs a
    lead-class char with a continuation-class char. Detection only — the
    strict UTF-8 round-trip in ``_try_repair`` is the correctness gate."""
    import re

    lead = "".join(_cp1252_char(b) for b in range(0xC2, 0xF5))
    cont = "".join(_cp1252_char(b) for b in range(0x80, 0xC0))
    return f"[{re.escape(lead)}][{re.escape(cont)}]"


def _build_strong_re() -> str:
    """Like ``_build_mojibake_re`` but EXCLUDING the two ambiguous lead
    chars x-sign (0xD7) and division-sign (0xF7): "800 ×\xa0600" is
    ubiquitous legit typography whose cp1252 bytes happen to be valid
    UTF-8 (Hebrew), so x/division pairs alone must never trigger a repair
    — they are only undone when the SAME string carries unambiguous
    evidence (any other lead byte)."""
    import re

    lead = "".join(
        _cp1252_char(b) for b in range(0xC2, 0xF5) if b not in (0xD7,)
    )
    cont = "".join(_cp1252_char(b) for b in range(0x80, 0xC0))
    return f"[{re.escape(lead)}][{re.escape(cont)}]"


_MOJIBAKE_RE = _build_mojibake_re()
_MOJIBAKE_STRONG_RE = _build_strong_re()


def _cp1252_bytes(s: str) -> bytes | None:
    """Inverse of the mojibake decode: cp1252 per char, with the 5 slots
    cp1252 leaves undefined (0x81 8D 8F 90 9D) falling back to their
    latin-1 byte — exactly how lenient decoders passed them through when
    the mojibake was created (the same per-char fallback ftfy documents).
    None when any char has no single-byte inverse (then the text cannot be
    one-layer mojibake)."""
    bs = bytearray()
    for ch in s:
        try:
            bs += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if o <= 0xFF:
                bs.append(o)
            else:
                return None
    return bytes(bs)


def _try_repair(s: str, max_rounds: int = 3) -> str | None:
    """Undo up to ``max_rounds`` layers of UTF-8-read-as-cp1252.
    ALL-OR-NOTHING: a repair is returned only when (a) the string shows
    UNAMBIGUOUS mojibake evidence (a signature pair whose lead is not the
    legit-typography x-sign), (b) every undo step round-trips as strict
    UTF-8, and (c) no unambiguous signature remains afterwards — a ladder
    that stalls half-way (or legit text that merely looks mojibake-ish)
    passes through unchanged."""
    import re

    if not re.search(_MOJIBAKE_STRONG_RE, s):
        return None
    out = s
    for _ in range(max_rounds):
        if not re.search(_MOJIBAKE_RE, out):
            break
        raw = _cp1252_bytes(out)
        if raw is None:
            break
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if fixed == out:
            break
        out = fixed
    if out == s or re.search(_MOJIBAKE_STRONG_RE, out):
        return None
    return out


def mojibake_repair_batch(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Repair UTF-8-decoded-as-cp1252 mojibake ("cafÃ©" -> "café",
    "â€™" -> "’", double-encodings too). Detection is ONE vectorized RE2
    pass over the batch; the Python repair loop runs only on the flagged
    minority (mojibake rate on real corpora is well under 1%), so the hot
    path stays Arrow-rate. Strictly conservative: a repair is applied only
    when the cp1252->UTF-8 undo round-trips exactly. Returns
    (id, text, repaired:bool)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flagged = pc.match_substring_regex(
        pc.coalesce(texts, ""), _MOJIBAKE_STRONG_RE
    ).to_numpy(zero_copy_only=False)
    untouched = pa.table(
        {
            id_col: batch[id_col],
            text_col: texts,
            "repaired": pa.array(
                np.zeros(batch.num_rows, bool), type=pa.bool_()
            ),
        }
    )
    if not flagged.any():
        return untouched
    # ONLY flagged rows cross the Arrow<->Python boundary; the unflagged
    # majority stays zero-copy and is spliced back with one mask kernel
    idx = np.flatnonzero(flagged)
    sub = texts.take(pa.array(idx)).to_pylist()
    fixed = [_try_repair(t) if t is not None else None for t in sub]
    repaired = np.zeros(batch.num_rows, bool)
    repaired[idx] = [f is not None for f in fixed]
    if not repaired.any():
        return untouched
    repl = pa.array([f for f in fixed if f is not None], type=pa.string())
    new_texts = pc.replace_with_mask(texts, pa.array(repaired), repl)
    return pa.table(
        {
            id_col: batch[id_col],
            text_col: new_texts,
            "repaired": pa.array(repaired, type=pa.bool_()),
        }
    )


def mojibake_repair(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset-level mojibake repair: stateless vectorized-detect map, no
    shuffle."""
    return ds.map_batches(
        lambda b: mojibake_repair_batch(b, text_col, id_col),
        batch_format="pyarrow",
    )
