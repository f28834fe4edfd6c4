"""Positional index sidecar + exact phrase search.

The main transcript index stores only FIRST positions per (term, doc) —
reference parity (``mathindexbase.h:248-255`` keeps one position per
SubObject). Phrase queries need EVERY position, so they get a separate
sidecar stream, the same layout decision Lucene makes (positions live in
``.pos``, apart from the doc/freq stream): the core index stays
rank-identical to the reference, and pipelines that never issue phrase
queries never pay for positions.

Layout (doc-sharded, not term-sharded — the point of the design):

- Build is ONE streaming pass, NO shuffle: each batch explodes to
  (shard = splitmix(docid) % S, term, docid, positions:list<int32>) rows
  and appends to partitioned Parquet. Every row of a given doc lands in
  the same shard by construction.
- Query reads the sidecar with ``columns=`` pruning and a pushed-down
  ``term IN phrase_terms`` filter (only matching postings leave storage),
  then ONE small ``groupby(shard)`` over the filtered stream — grouped by
  doc-shard, each group holds complete per-doc postings for all phrase
  terms, so adjacency verification is shard-local. Query cost scales with
  the matching postings, not the corpus, and shards verify in parallel
  with no all-to-all.

Adjacency check is fully vectorized: encode (doc, pos) as one uint64 key
(doc code << 32 | pos) and chain ``np.intersect1d(keys_i - i)`` across the
phrase terms — a doc position p survives iff term_i appears at p+i for
every i, i.e. an exact phrase occurrence. Counts are integers end-to-end,
so the DuckDB twin (positions self-join) matches bit-for-bit — no float
scoring in the driver-gated surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.tokenize.text import split_tokens

#: doc -> shard must be stable across build and query; splitmix64 finalizer
#: (same constants as ops/lm.py) so consecutive docids spread evenly.
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _doc_shard(docids: np.ndarray, num_shards: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = docids.astype(np.uint64) + _C1
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        z = z ^ (z >> np.uint64(31))
    return (z % np.uint64(num_shards)).astype(np.int32)


def _positions_partial(batch: pa.Table, id_col: str, text_col: str,
                       num_shards: int) -> pa.Table:
    """Explode one batch to (shard, term, docid, positions) rows — one row
    per distinct (doc, term), positions the full sorted occurrence list."""
    parents, tokens, pos = split_tokens(batch[text_col])
    empty = pa.table(
        {
            "shard": pa.array([], pa.int32()),
            "term": pa.array([], pa.string()),
            "docid": pa.array([], pa.int64()),
            "positions": pa.array([], pa.list_(pa.int32())),
        }
    )
    if len(tokens) == 0:
        return empty
    docids_all = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # group occurrences by (row, term): lexsort on (term code, row) then
    # run-length offsets -> list array, positions already row-ordered so
    # each list comes out ascending
    dict_arr = tokens.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((pos, codes, parents))
    sp, sc, spos = parents[order], codes[order], pos[order]
    boundary = np.empty(len(sp), dtype=bool)
    boundary[0] = True
    np.not_equal(sp[1:], sp[:-1], out=boundary[1:])
    boundary[1:] |= sc[1:] != sc[:-1]
    starts = np.flatnonzero(boundary)
    offsets = np.empty(len(starts) + 1, dtype=np.int32)
    offsets[:-1] = starts
    offsets[-1] = len(sp)
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(spos.astype(np.int32), pa.int32())
    )
    group_rows = sp[starts]
    group_docids = docids_all[group_rows]
    terms = dict_arr.dictionary.take(pa.array(sc[starts], pa.int64()))
    return pa.table(
        {
            "shard": pa.array(_doc_shard(group_docids, num_shards), pa.int32()),
            "term": terms,
            "docid": pa.array(group_docids, pa.int64()),
            "positions": lists,
        }
    )


def build_position_index(ds, out_dir: str, num_shards: int = 64,
                         id_col: str = "doc_id", text_col: str = "text"):
    """Corpus -> positional sidecar at ``out_dir`` (partitioned Parquet).

    One streaming map, no shuffle; Parquet's dictionary+RLE handles the
    repeated term strings. ``num_shards`` bounds the query-time group size
    (size it so one shard's phrase-term postings fit a worker)."""
    (
        ds.map_batches(
            lambda b: _positions_partial(b, id_col, text_col, num_shards),
            batch_format="pyarrow",
        ).write_parquet(out_dir)
    )


def positions_dataset(index_dir: str, terms: list[str]):
    """Pruned sidecar read: only the phrase terms' postings leave storage."""
    import pyarrow.dataset as pads
    import ray.data

    return ray.data.read_parquet(
        index_dir,
        columns=["shard", "term", "docid", "positions"],
        filter=pads.field("term").isin(terms),
    )


def _chain_survivors(key_all: np.ndarray, masks) -> np.ndarray:
    """Intersect-chain over (doc<<32|pos) keys: a key k survives iff for
    every phrase slot i the i-th term occurs at k+i. ``masks`` yields one
    boolean occurrence mask over ``key_all`` per phrase term, in order."""
    survivors: np.ndarray | None = None
    for i, m in enumerate(masks):
        keys_i = key_all[m]
        if i:
            keys_i = keys_i - np.uint64(i)
        keys_i = np.sort(keys_i)
        survivors = (
            keys_i if survivors is None else survivors[
                np.isin(survivors, keys_i, assume_unique=True)
            ]
        )
        if survivors.size == 0:
            break
    return survivors if survivors is not None else np.empty(0, np.uint64)


def _partial_topk(docs: np.ndarray, counts: np.ndarray,
                  k: int) -> tuple[np.ndarray, np.ndarray]:
    """Shard/block-local (count desc, docid asc) cut — global top-k rows
    survive any local cut, so the driver merge stays bounded at k*parts."""
    if len(docs) > k:
        order = np.lexsort((docs, -counts))[:k]
        docs, counts = docs[order], counts[order]
    return docs, counts


def _result_table(docs: np.ndarray, counts: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "docid": pa.array(docs, pa.int64()),
            "n_occurrences": pa.array(counts, pa.int64()),
        }
    )


def _merge_topk(parts: list[pa.Table], k: int) -> pa.Table:
    """Driver epilogue shared by both phrase paths: concat the per-part
    partial top-k tables, final (count desc, docid asc) sort, slice k."""
    if not parts:
        return _result_table(np.empty(0, np.int64), np.empty(0, np.int64))
    merged = pa.concat_tables(parts).combine_chunks()
    idx = pc.sort_indices(
        merged,
        sort_keys=[("n_occurrences", "descending"), ("docid", "ascending")],
    )
    return merged.take(idx.slice(0, k))


def _phrase_counts_group(
    group: pa.Table, terms: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, counts) of exact phrase occurrences within one doc-complete
    group of (term, docid, positions) rows."""
    term_col = group["term"].combine_chunks()
    docid_np = group["docid"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_docs, doc_codes = np.unique(docid_np, return_inverse=True)

    lists = group["positions"].combine_chunks()
    flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    sizes = lists.value_lengths().to_numpy(zero_copy_only=False)
    row_of_pos = np.repeat(np.arange(len(group), dtype=np.int64), sizes)
    key_all = (doc_codes[row_of_pos].astype(np.uint64) << np.uint64(32)) | flat

    survivors = _chain_survivors(
        key_all,
        (
            pc.equal(term_col, t).to_numpy(zero_copy_only=False)[row_of_pos]
            for t in terms
        ),
    )
    if survivors.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_code = (survivors >> np.uint64(32)).astype(np.int64)
    codes, counts = np.unique(doc_code, return_counts=True)
    return uniq_docs[codes], counts.astype(np.int64)


def phrase_search(index_dir: str, phrase: str, k: int = 10) -> pa.Table:
    """Exact phrase top-k from the positional sidecar.

    Returns (docid, n_occurrences) sorted by (count desc, docid asc),
    limit ``k``. Duplicate phrase terms are handled (each occurrence slot
    checks the right offset even when terms repeat, e.g. "the the")."""
    terms = _phrase_terms(phrase)
    ds = positions_dataset(index_dir, sorted(set(terms)))

    def per_shard(group: pa.Table) -> pa.Table:
        docs, counts = _phrase_counts_group(group, terms)
        return _result_table(*_partial_topk(docs, counts, k))

    import ray

    parts = [
        t
        for t in ray.get(
            ds.groupby("shard")
            .map_groups(per_shard, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    return _merge_topk(parts, k)


def phrase_count_scan(ds, phrase: str, k: int = 10, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Index-free differential twin: the same phrase top-k by direct corpus
    scan (stateless map, per-block partial top-k, bounded driver merge).
    Use when the phrase is one-off; build the sidecar for repeated
    queries."""
    terms = _phrase_terms(phrase)

    def per_batch(batch: pa.Table) -> pa.Table:
        parents, tokens, pos = split_tokens(batch[text_col])
        if len(tokens) == 0:
            return _result_table(np.empty(0, np.int64), np.empty(0, np.int64))
        docids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key_all = (parents.astype(np.uint64) << np.uint64(32)) | pos.astype(
            np.uint64
        )
        survivors = _chain_survivors(
            key_all,
            (pc.equal(tokens, t).to_numpy(zero_copy_only=False) for t in terms),
        )
        if survivors.size == 0:
            return _result_table(np.empty(0, np.int64), np.empty(0, np.int64))
        rows = (survivors >> np.uint64(32)).astype(np.int64)
        uniq_rows, counts = np.unique(rows, return_counts=True)
        docs, cnts = docids[uniq_rows], counts.astype(np.int64)
        return _result_table(*_partial_topk(docs, cnts, k))

    import ray

    parts = [
        t
        for t in ray.get(
            ds.map_batches(per_batch, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    return _merge_topk(parts, k)


def _phrase_terms(phrase: str) -> list[str]:
    terms = split_tokens(pa.array([phrase], pa.string()))[1].to_pylist()
    if not terms:
        raise ValueError("phrase_search: phrase has no tokens")
    return terms


# ---------------------------------------------------------------------------
# proximity search: all query terms within a position window
# ---------------------------------------------------------------------------
#
# ``min_span(doc)`` = the smallest (max_pos - min_pos) over any tuple of
# occurrences covering every DISTINCT query term — the classic positional-
# index proximity operator (Lucene SpanNearQuery / "terms within N words").
# For two terms this is min |p_a - p_b|; integer end-to-end, so the DuckDB
# positions-join twin matches bit-for-bit.

_I64_MAX = np.iinfo(np.int64).max
_HI32 = np.uint64(32)


def _min_gap_pairs(ka: np.ndarray, kb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc min |pos_a - pos_b| for two sorted (doc<<32|pos) key arrays.

    Vectorized nearest-neighbor: for each a-key the closest same-doc b-key
    is at searchsorted(b, a) or one before it (keys sort by (doc, pos), so
    any same-doc b beyond those two is strictly farther)."""
    if not len(ka) or not len(kb):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    idx = np.searchsorted(kb, ka)
    doc_a = (ka >> _HI32).astype(np.int64)
    best = np.full(len(ka), _I64_MAX, dtype=np.int64)
    for cand in (np.minimum(idx, len(kb) - 1), np.maximum(idx - 1, 0)):
        kb_c = kb[cand]
        same = (kb_c >> _HI32).astype(np.int64) == doc_a
        # same doc -> high bits cancel, |key diff| == |pos diff|
        gap = np.abs(kb_c.astype(np.int64) - ka.astype(np.int64))
        best = np.where(same & (gap < best), gap, best)
    valid = best != _I64_MAX
    docs, gaps = doc_a[valid], best[valid]
    if not len(docs):
        return docs, gaps
    order = np.argsort(docs, kind="stable")
    docs, gaps = docs[order], gaps[order]
    starts = np.flatnonzero(np.concatenate([[True], docs[1:] != docs[:-1]]))
    return docs[starts], np.minimum.reduceat(gaps, starts)


def _spans_from_keys(
    key_all: np.ndarray, masks: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_codes, min_span) for docs containing every term. ``masks`` is
    one occurrence mask over ``key_all`` per DISTINCT term.

    k >= 3 is fully vectorized (no per-doc Python): restrict to docs
    containing all terms, merge the occurrences in (doc, pos) order, and
    use the next-occurrence formulation of minimal cover — for every left
    endpoint i, the smallest covering window ends at ``jmax(i) = max over
    labels of the label's next same-doc occurrence at-or-after i``; the
    per-label next arrays come from ONE segmented suffix-min each (doc
    boundaries encoded into the value so runs never leak across docs)."""
    keys = [np.sort(key_all[m]) for m in masks]
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if any(len(ks) == 0 for ks in keys):
        return empty
    if len(keys) == 1:
        docs = np.unique((keys[0] >> _HI32).astype(np.int64))
        return docs, np.zeros(len(docs), dtype=np.int64)
    if len(keys) == 2:
        return _min_gap_pairs(keys[0], keys[1])
    doc_sets = [np.unique((ks >> _HI32).astype(np.int64)) for ks in keys]
    common = doc_sets[0]
    for d in doc_sets[1:]:
        common = common[np.isin(common, d, assume_unique=True)]
        if not len(common):
            return empty
    # occurrences of any term within the common docs, merged (doc, pos)
    kept_keys: list[np.ndarray] = []
    kept_lab: list[np.ndarray] = []
    for li, ks in enumerate(keys):
        doc = (ks >> _HI32).astype(np.int64)
        p = np.searchsorted(common, doc)
        p_c = np.minimum(p, len(common) - 1)
        m = common[p_c] == doc
        kept_keys.append(ks[m])
        kept_lab.append(np.full(int(m.sum()), li, dtype=np.int64))
    key = np.concatenate(kept_keys)
    lab = np.concatenate(kept_lab)
    order = np.argsort(key, kind="stable")
    key, lab = key[order], lab[order]
    n = len(key)
    docs_all = (key >> _HI32).astype(np.int64)
    pos_all = (key & np.uint64(0xFFFFFFFF)).astype(np.int64)
    doc_rank = np.searchsorted(common, docs_all)
    idx = np.arange(n, dtype=np.int64)
    base = doc_rank * n
    jmax = np.zeros(n, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    for li in range(len(keys)):
        # value = doc_rank*n + index for this label's occurrences: the
        # suffix-min at i is the label's next occurrence; a value from a
        # later doc lands at diff >= n and is rejected, so runs never
        # cross doc boundaries
        v = np.where(lab == li, base + idx, _I64_MAX)
        s = np.minimum.accumulate(v[::-1])[::-1]
        with np.errstate(over="ignore"):
            diff = s - base
        ok = (s != _I64_MAX) & (diff >= 0) & (diff < n)
        valid &= ok
        jmax = np.maximum(jmax, np.where(ok, diff, 0))
    spans_i = np.where(valid, pos_all[jmax] - pos_all, _I64_MAX)
    starts = np.flatnonzero(
        np.concatenate([[True], docs_all[1:] != docs_all[:-1]])
    )
    # every common doc contains all labels, so its first position always
    # has a finite covering window — the per-doc min is finite
    return docs_all[starts], np.minimum.reduceat(spans_i, starts)


def _span_table(docs: np.ndarray, spans: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "docid": pa.array(docs, pa.int64()),
            "min_span": pa.array(spans, pa.int64()),
        }
    )


def _partial_span_topk(docs, spans, k):
    if len(docs) > k:
        order = np.lexsort((docs, spans))[:k]
        docs, spans = docs[order], spans[order]
    return docs, spans


def _merge_span_topk(parts: list[pa.Table], k: int) -> pa.Table:
    if not parts:
        return _span_table(np.empty(0, np.int64), np.empty(0, np.int64))
    merged = pa.concat_tables(parts).combine_chunks()
    idx = pc.sort_indices(
        merged, sort_keys=[("min_span", "ascending"), ("docid", "ascending")]
    )
    return merged.take(idx.slice(0, k))


def proximity_search(
    index_dir: str, query: str, window: int, k: int = 10
) -> pa.Table:
    """Docs whose distinct query terms all occur within ``window`` positions
    of each other, from the positional sidecar.

    Returns (docid, min_span) with ``min_span <= window``, sorted by
    (min_span asc, docid asc), limit ``k``. Same scale shape as
    ``phrase_search``: pruned read of the query terms' postings only, one
    doc-sharded groupby, shard-local top-k cut, bounded driver merge."""
    terms = sorted(set(_phrase_terms(query)))
    ds = positions_dataset(index_dir, terms)

    def per_shard(group: pa.Table) -> pa.Table:
        term_col = group["term"].combine_chunks()
        docid_np = group["docid"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_docs, doc_codes = np.unique(docid_np, return_inverse=True)
        lists = group["positions"].combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        sizes = lists.value_lengths().to_numpy(zero_copy_only=False)
        row_of_pos = np.repeat(np.arange(len(group), dtype=np.int64), sizes)
        key_all = (doc_codes[row_of_pos].astype(np.uint64) << _HI32) | flat
        masks = [
            pc.equal(term_col, t).to_numpy(zero_copy_only=False)[row_of_pos]
            for t in terms
        ]
        codes, spans = _spans_from_keys(key_all, masks)
        keep = spans <= window
        docs, spans = uniq_docs[codes[keep]], spans[keep]
        return _span_table(*_partial_span_topk(docs, spans, k))

    import ray

    parts = [
        t
        for t in ray.get(
            ds.groupby("shard")
            .map_groups(per_shard, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    return _merge_span_topk(parts, k)


def proximity_scan(ds, query: str, window: int, k: int = 10,
                   id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Index-free differential twin of ``proximity_search`` (direct corpus
    scan; batch rows are whole docs, so spans are batch-local-exact)."""
    terms = sorted(set(_phrase_terms(query)))

    def per_batch(batch: pa.Table) -> pa.Table:
        parents, tokens, pos = split_tokens(batch[text_col])
        if len(tokens) == 0:
            return _span_table(np.empty(0, np.int64), np.empty(0, np.int64))
        docids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key_all = (parents.astype(np.uint64) << _HI32) | pos.astype(np.uint64)
        masks = [
            pc.equal(tokens, t).to_numpy(zero_copy_only=False) for t in terms
        ]
        rows, spans = _spans_from_keys(key_all, masks)
        keep = spans <= window
        docs, spans = docids[rows[keep]], spans[keep]
        return _span_table(*_partial_span_topk(docs, spans, k))

    import ray

    parts = [
        t
        for t in ray.get(
            ds.map_batches(per_batch, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    return _merge_span_topk(parts, k)


def _ordered_spans(keys: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """(doc_codes, min_slop) for ORDERED matches of the phrase terms.

    ``keys[i]`` is the sorted (doc<<32|pos) occurrence array of the i-th
    phrase term (repeated terms share an array). A match is positions
    ``p_0 < p_1 < ... < p_{k-1}`` in phrase order; its slop is
    ``p_{k-1} - p_0 - (k-1)`` (0 = exact phrase). Greedy next-occurrence
    chaining from every start is optimal for minimizing the end given the
    start, so the per-doc min over starts is the true minimum; each chain
    step is one vectorized ``searchsorted`` (keys sort by (doc, pos), so
    "next same-doc occurrence strictly after cur" is the insertion point
    of cur+1, doc-checked via the high bits)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if any(len(ks) == 0 for ks in keys):
        return empty
    start = keys[0]
    doc0 = (start >> _HI32).astype(np.int64)
    if len(keys) == 1:
        docs = np.unique(doc0)
        return docs, np.zeros(len(docs), dtype=np.int64)
    cur = start.copy()
    valid = np.ones(len(start), dtype=bool)
    for ks in keys[1:]:
        idx = np.searchsorted(ks, cur + np.uint64(1))
        ok = idx < len(ks)
        nxt = ks[np.minimum(idx, len(ks) - 1)]
        ok &= (nxt >> _HI32).astype(np.int64) == doc0
        valid &= ok
        cur = np.where(valid, nxt, cur)
    if not valid.any():
        return empty
    mask = np.uint64(0xFFFFFFFF)
    slops = (
        (cur[valid] & mask).astype(np.int64)
        - (start[valid] & mask).astype(np.int64)
        - (len(keys) - 1)
    )
    docs = doc0[valid]  # nondecreasing: start is key-sorted
    starts_i = np.flatnonzero(
        np.concatenate([[True], docs[1:] != docs[:-1]])
    )
    return docs[starts_i], np.minimum.reduceat(slops, starts_i)


def span_near_search(
    index_dir: str, phrase: str, slop: int, k: int = 10
) -> pa.Table:
    """Ordered phrase-with-slop over the positional sidecar (Lucene
    ``"a b"~slop`` SpanNear with ``inOrder=true``): docs where the phrase
    terms occur IN ORDER with at most ``slop`` extra positions between the
    first and last (slop 0 = exact phrase). Returns (docid, min_slop)
    sorted (min_slop asc, docid asc), limit ``k``; same scale shape as
    ``phrase_search`` — pruned read, one doc-sharded groupby, shard-local
    top-k, bounded driver merge."""
    terms = _phrase_terms(phrase)  # phrase ORDER, repeats kept
    ds = positions_dataset(index_dir, sorted(set(terms)))

    def per_shard(group: pa.Table) -> pa.Table:
        term_col = group["term"].combine_chunks()
        docid_np = group["docid"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_docs, doc_codes = np.unique(docid_np, return_inverse=True)
        lists = group["positions"].combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        sizes = lists.value_lengths().to_numpy(zero_copy_only=False)
        row_of_pos = np.repeat(np.arange(len(group), dtype=np.int64), sizes)
        key_all = (doc_codes[row_of_pos].astype(np.uint64) << _HI32) | flat
        by_term = {
            t: np.sort(
                key_all[
                    pc.equal(term_col, t).to_numpy(zero_copy_only=False)[
                        row_of_pos
                    ]
                ]
            )
            for t in set(terms)
        }
        codes, slops = _ordered_spans([by_term[t] for t in terms])
        keep = slops <= slop
        docs, slops = uniq_docs[codes[keep]], slops[keep]
        return _span_table(*_partial_span_topk(docs, slops, k))

    import ray

    parts = [
        t
        for t in ray.get(
            ds.groupby("shard")
            .map_groups(per_shard, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    return _merge_span_topk(parts, k)


def span_near_scan(ds, phrase: str, slop: int, k: int = 10,
                   id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Index-free differential twin of ``span_near_search`` (direct corpus
    scan; batch rows are whole docs, so slops are batch-local-exact)."""
    terms = _phrase_terms(phrase)

    def per_batch(batch: pa.Table) -> pa.Table:
        parents, tokens, pos = split_tokens(batch[text_col])
        if len(tokens) == 0:
            return _span_table(np.empty(0, np.int64), np.empty(0, np.int64))
        docids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key_all = (parents.astype(np.uint64) << _HI32) | pos.astype(np.uint64)
        by_term = {
            t: np.sort(
                key_all[pc.equal(tokens, t).to_numpy(zero_copy_only=False)]
            )
            for t in set(terms)
        }
        rows, slops = _ordered_spans([by_term[t] for t in terms])
        keep = slops <= slop
        docs, slops = docids[rows[keep]], slops[keep]
        return _span_table(*_partial_span_topk(docs, slops, k))

    import ray

    parts = [
        t
        for t in ray.get(
            ds.map_batches(per_batch, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    return _merge_span_topk(parts, k)
