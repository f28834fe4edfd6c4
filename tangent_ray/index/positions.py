"""Positional postings index + exact phrase / proximity / span-near search.

The main transcript index stores only FIRST positions per (term, doc) —
reference parity (``mathindexbase.h:248-255`` keeps one position per
SubObject). Phrase-family queries need EVERY position, so they get a
separate positional-postings file, the same layout decision Lucene makes
(positions live in ``.pos``, apart from the doc/freq stream): the core
index stays rank-identical to the reference, and pipelines that never
issue phrase queries never pay for positions.

Layout (TERM-sharded postings — the serving-grade design):

- Build is one streaming tokenize pass + ONE ``groupby(skey)`` shuffle
  keyed by ``crc32(term) % num_shards`` (the exact shape of the main index
  build, ``index/build.py``). Each reduce group vectorized-encodes every
  one of its terms into a single segment row::

      (term, df, npos, docs:binary, counts:binary, positions:binary)

  ``docs``      — LEB128 varint docid deltas (df values, ascending)
  ``counts``    — varint positions-per-doc (df values)
  ``positions`` — varint position deltas, reset at each doc (npos values)

- Query-time access is O(df(term)): a resident :class:`PositionsReader`
  (loaded once per actor / process, exactly like the BM25 ``Segment``)
  maps term -> rows and decodes only the queried terms' byte runs. No
  per-query Dataset job, no corpus-rate scan — phrase latency scales with
  the phrase terms' document frequency, not the corpus. (The previous
  design — a doc-sharded sidecar re-scanned per query with a pushed-down
  term filter — cost seconds per query at 1M docs; see BASELINE.md.)

- Scale contract: one reader holds ``total_positions_bytes`` resident
  (~1-2 bytes/token). At cluster scale the shard files partition by
  ``crc32(term)``, so a serving pool assigns disjoint file subsets per
  actor (``PositionsReader(dir, files=...)``) and a phrase query fans out
  one term-fetch per shard before the (tiny) key-intersection step.

- Streaming parity with the main index's D/E/T semantics (§2.9):
  :func:`add_position_increment` stages new docs' rows and flips them live
  with one atomic manifest replace; :func:`delete_position_docs` appends
  tombstones (deleted docs stop matching immediately — the Lucene
  live-docs rule the main index uses, ``deletes.py``);
  :func:`compact_positions` rewrites to one row per term, purging
  tombstones and folding increments (its re-encode doubles as the
  cross-increment docid-uniqueness verifier).

Adjacency / span checks are fully vectorized: encode (doc, pos) as one
uint64 key (doc code << 32 | pos); a phrase position ``p`` survives iff
term_i appears at ``p+i`` for every i (``np.isin`` chain over per-term
key arrays). Counts are integers end-to-end, so the DuckDB twin
(positions self-join) matches bit-for-bit — no float scoring in the
driver-gated surface.
"""

from __future__ import annotations

import fcntl
import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tangent_ray.index.codec import _varint_encode_with_lengths, varint_decode
from tangent_ray.tokenize.text import split_tokens

POS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("npos", pa.int64()),
        ("docs", pa.binary()),
        ("counts", pa.binary()),
        ("positions", pa.binary()),
    ]
)

POS_MANIFEST = "positions_manifest.json"
POS_DELETES_DIR = "deletes"


def _active_files(pos_dir: str) -> list[str]:
    """The positional dir's live segment files, absolute, sorted.

    A manifest-bearing dir (anything built/incremented/compacted by this
    module since the streaming surface landed) lists its files explicitly,
    so writers can stage new files on disk and flip them live with ONE
    atomic ``os.replace`` of the manifest — readers never observe a
    half-landed increment or a compaction's old+new double-count. Legacy
    dirs (no manifest: hand-assembled test dirs, pre-manifest builds) fall
    back to the top-level ``*.parquet`` scan."""
    mpath = os.path.join(pos_dir, POS_MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            rel = json.load(f)["files"]
        return [os.path.join(pos_dir, r) for r in rel]
    return [
        os.path.join(pos_dir, f)
        for f in sorted(os.listdir(pos_dir))
        if f.endswith(".parquet")
    ]


def _write_manifest(pos_dir: str, rel_files: list[str],
                    doc_partitions: int | None = None) -> None:
    mpath = os.path.join(pos_dir, POS_MANIFEST)
    meta: dict = {"files": sorted(rel_files)}
    if doc_partitions is None:
        doc_partitions = read_doc_partitions(pos_dir)  # preserve layout
    if doc_partitions:
        meta["doc_partitions"] = int(doc_partitions)
    with open(mpath + ".tmp", "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(mpath + ".tmp", mpath)


def read_doc_partitions(pos_dir: str) -> int:
    """The dir's doc-partition count (0 = term-sharded-only layout)."""
    mpath = os.path.join(pos_dir, POS_MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            return int(json.load(f).get("doc_partitions", 0))
    return 0


#: Fibonacci multiplicative docid->partition hash: uniform for both
#: sequential test ids and 62-bit blake2b transcript docids, and STABLE
#: across builds/increments (a doc's partition never changes, so
#: partitions stay doc-disjoint through the whole D/E/T lifecycle)
_DPART_GOLD = np.uint64(0x9E3779B97F4A7C15)


def dpart_of(docids: np.ndarray, doc_partitions: int) -> np.ndarray:
    return (
        (docids.astype(np.uint64) * _DPART_GOLD) >> np.uint64(33)
    ) % np.uint64(doc_partitions)


def _dpart_of_path(path: str) -> int:
    for seg in path.split(os.sep):
        if seg.startswith("dpart="):
            return int(seg[6:])
    return -1

_HI32 = np.uint64(32)
_I64_MAX = np.iinfo(np.int64).max


# ---------------------------------------------------------------------------
# build: explode -> ONE term-keyed shuffle -> vectorized multi-term encode
# ---------------------------------------------------------------------------


def _explode_positions(batch: pa.Table, id_col: str, text_col: str,
                       num_shards: int, doc_partitions: int = 0) -> pa.Table:
    """Explode one batch to (skey, term, docid, positions) rows — one row
    per distinct (doc, term), positions the full sorted occurrence list.
    With ``doc_partitions`` the shuffle key combines (docid partition,
    term shard) so ONE groupby yields the doc-partitioned serving layout
    (see ``build_position_index``); a ``dpart`` column rides along for
    the partitioned Parquet write."""
    from tangent_ray.index.build import term_shards

    parents, tokens, pos = split_tokens(batch[text_col])
    cols = {
        "skey": pa.array([], pa.int32()),
        "term": pa.array([], pa.string()),
        "docid": pa.array([], pa.int64()),
        "positions": pa.array([], pa.list_(pa.int32())),
    }
    if doc_partitions:
        cols["dpart"] = pa.array([], pa.int32())
    empty = pa.table(cols)
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
    terms = dict_arr.dictionary.take(pa.array(sc[starts], pa.int64()))
    docid_out = docids_all[group_rows]
    skey = term_shards(terms, num_shards).astype(np.int64)
    out = {
        "skey": None,  # filled below
        "term": terms,
        "docid": pa.array(docid_out, pa.int64()),
        "positions": lists,
    }
    if doc_partitions:
        dp = dpart_of(docid_out, doc_partitions).astype(np.int64)
        out["skey"] = pa.array(
            (dp * num_shards + skey).astype(np.int32), pa.int32()
        )
        out["dpart"] = pa.array(dp.astype(np.int32), pa.int32())
    else:
        out["skey"] = pa.array(skey.astype(np.int32), pa.int32())
    return pa.table(out)


#: positions per encoded run row — a corpus-hot term's postings split
#: into multiple rows at doc boundaries past this, so no single Parquet
#: binary cell grows with the corpus (readers fold the rows back via
#: ``merge_position_runs``; a sharded engine can slice them
#: independently). 1M positions ≈ 1-2 MB encoded.
MAX_RUN_POSITIONS = 1 << 20


def encode_positions_group(
    group: pa.Table, max_run_positions: int | None = None
) -> pa.Table:
    """Encode every term of one shard group into positional posting runs.

    One shared numpy pass over all the group's terms (the same
    keep-reduce-off-the-Python-floor rule as ``encode_postings_multi``):
    lexsort (term code, docid-as-uint64), delta-encode the three value
    streams once each, then slice per-term byte runs out of the shared
    encoded buffers. Duplicate (term, docid) rows raise — a repeated
    document is input corruption (reference warns on repeated docIDs,
    ``mathindex.cpp:335``). Terms holding more than ``max_run_positions``
    positions emit MULTIPLE rows, cut at doc boundaries (single-doc rows
    can exceed the cap — doc granularity is the floor)."""
    if max_run_positions is None:
        max_run_positions = MAX_RUN_POSITIONS
    n = group.num_rows
    if n == 0:
        return POS_SCHEMA.empty_table()
    term_col = group["term"]
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    dict_arr = term_col.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary
    docids = group["docid"].to_numpy(zero_copy_only=False).astype(np.uint64)
    lists = group["positions"]
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    order = np.lexsort((docids, codes))
    codes_s = codes[order]
    docids_s = docids[order]
    lists_s = lists.take(pa.array(order, pa.int64()))
    sizes = lists_s.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists_s.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)

    starts = np.flatnonzero(np.diff(codes_s, prepend=codes_s[0] - 1))
    ends = np.append(starts[1:], n)
    if n > 1:
        dup = (docids_s[1:] == docids_s[:-1]) & (codes_s[1:] == codes_s[:-1])
        if dup.any():
            bad = int(codes_s[int(np.flatnonzero(dup)[0])])
            raise ValueError(
                f"duplicate docid for term {vocab[bad].as_py()!r} "
                "(repeated document in input?)"
            )

    off = np.cumsum(sizes) - sizes  # flat start per row
    # run-cap pass: split oversized terms' row ranges at doc boundaries
    # so every emitted run stays <= max_run_positions positions (the
    # delta streams below reset at RUN starts, so each run decodes
    # standalone). Rare by construction — the Python loop touches only
    # terms past the cap.
    npos_term = off[ends - 1] + sizes[ends - 1] - off[starts]
    if np.any(npos_term > max_run_positions):
        new_starts: list[int] = []
        for t in np.flatnonzero(npos_term >= 0):  # all terms, in order
            s, e = int(starts[t]), int(ends[t])
            if npos_term[t] <= max_run_positions:
                new_starts.append(s)
                continue
            cum = np.cumsum(sizes[s:e])
            cut = 0  # row offset within the term
            while cut < e - s:
                new_starts.append(s + cut)
                base = int(cum[cut - 1]) if cut else 0
                nxt = int(
                    np.searchsorted(cum, base + max_run_positions, "right")
                )
                cut = max(nxt, cut + 1)  # >= 1 row per run
        starts = np.asarray(new_starts, dtype=np.int64)
        ends = np.append(starts[1:], n)
    # docid deltas, reset at each run's first posting
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = docids_s[0]
    np.subtract(docids_s[1:], docids_s[:-1], out=deltas[1:])
    deltas[starts] = docids_s[starts]
    # position deltas, reset at each (doc, term) row's first position
    pdel = np.empty(len(flat), dtype=np.uint64)
    if len(flat):
        pdel[0] = flat[0]
        np.subtract(flat[1:], flat[:-1], out=pdel[1:])
        pdel[off] = flat[off]

    def slices(arr: np.ndarray, vstarts: np.ndarray, vends: np.ndarray):
        """Per-term byte slices of one encoded stream (every term has >= 1
        doc and >= 1 position, so vstarts[t] < vends[t] always)."""
        enc, nb = _varint_encode_with_lengths(arr, allow_fast=True)
        if nb is None:  # fast path: every value is 1 byte
            bs, be = vstarts, vends
        else:
            bends = np.cumsum(nb, dtype=np.int64)
            bs = bends[vstarts] - nb[vstarts]
            be = bends[vends - 1]
        buf = enc.tobytes()
        return [buf[int(bs[t]) : int(be[t])] for t in range(len(vstarts))]

    # per-term value ranges in each stream's value space
    pstarts = off[starts]
    last_row = ends - 1
    pends = off[last_row] + sizes[last_row]
    doc_blobs = slices(deltas, starts, ends)
    cnt_blobs = slices(sizes.astype(np.uint64), starts, ends)
    pos_blobs = slices(pdel, pstarts, pends)
    return pa.Table.from_arrays(
        [
            pc.take(vocab, pa.array(codes_s[starts], pa.int64())).cast(pa.string()),
            pa.array((ends - starts).astype(np.int64), pa.int64()),
            pa.array((pends - pstarts).astype(np.int64), pa.int64()),
            pa.array(doc_blobs, pa.binary()),
            pa.array(cnt_blobs, pa.binary()),
            pa.array(pos_blobs, pa.binary()),
        ],
        schema=POS_SCHEMA,
    )


def build_position_index(ds, out_dir: str, num_shards: int = 64,
                         id_col: str = "doc_id", text_col: str = "text",
                         max_run_positions: int | None = None,
                         doc_partitions: int = 0):
    """Corpus -> term-sharded positional postings at ``out_dir`` (Parquet).

    One tokenize map + ONE ``groupby(skey)`` shuffle (`skey = crc32(term)
    % num_shards`), then a vectorized multi-term encode per reduce group.
    ``num_shards`` bounds the reduce-group size (positions-rate rows /
    num_shards per group); ``max_run_positions`` (default
    ``MAX_RUN_POSITIONS``) caps positions per emitted run row; Parquet
    dictionary+RLE handles the term strings. Query-side access is O(df)
    via :class:`PositionsReader`.

    ``doc_partitions=R`` additionally hash-partitions the postings by
    DOCID into ``dpart=r/`` subdirs (still ONE shuffle — the key becomes
    (dpart, term shard)) — the document-partitioned serving layout:
    :class:`PositionalEngine` then broadcasts each query's kernel to
    doc-disjoint part actors and only top-k partials move, the
    Lucene/Elasticsearch shard model (and this repo's BM25
    ``search_sharded``). Each part actor decodes df/R per hot term
    instead of df, so first-call latency scales down with R."""
    cap = MAX_RUN_POSITIONS if max_run_positions is None else max_run_positions
    enc = (
        ds.map_batches(
            lambda b: _explode_positions(b, id_col, text_col, num_shards,
                                         doc_partitions),
            batch_format="pyarrow",
        )
        .groupby("skey")
        .map_groups(
            lambda g: _encode_group_keep_dpart(g, cap, doc_partitions),
            batch_format="pyarrow",
        )
    )
    if doc_partitions:
        enc.write_parquet(out_dir, partition_cols=["dpart"])
    else:
        enc.write_parquet(out_dir)
    rel = []
    for root, _dirs, fnames in os.walk(out_dir):
        for f in fnames:
            if f.endswith(".parquet"):
                rel.append(os.path.relpath(os.path.join(root, f), out_dir))
    _write_manifest(out_dir, rel, doc_partitions=doc_partitions)


def _encode_group_keep_dpart(g: pa.Table, cap: int,
                             doc_partitions: int) -> pa.Table:
    """Encode one shuffle group; in doc-partitioned builds the group's
    (single) dpart value decorates the encoded rows so the Parquet write
    can partition by it."""
    if not doc_partitions:
        return encode_positions_group(g.drop_columns(["skey"]), cap)
    dp = int(g["dpart"][0].as_py()) if g.num_rows else 0
    enc = encode_positions_group(g.drop_columns(["skey", "dpart"]), cap)
    return enc.append_column(
        "dpart", pa.array(np.full(enc.num_rows, dp, np.int32), pa.int32())
    )


# ---------------------------------------------------------------------------
# streaming: increments, tombstone deletes, compaction (LSM parity with the
# main index's D/E/T semantics — build.py add_increment / deletes.py /
# merge.py compact_index)
# ---------------------------------------------------------------------------


def add_position_increment(ds, pos_dir: str, num_shards: int = 64,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> dict:
    """Index NEW docs into an existing positional dir without a rebuild.

    The increment's term-sharded rows build into ``inc{i:05d}__tmp`` (the
    same encode pipeline as :func:`build_position_index`), the dir renames
    atomically, and ONE manifest replace flips the new files live — a crash
    at any point leaves either the old view or the new view, never a
    partial one. A term present in both base and increment then owns one
    row per run; :meth:`PositionsReader.term_postings` merges runs by docid
    and raises on a duplicate docid (re-ingesting an already-indexed doc is
    input corruption — the main index's cross-increment uniqueness rule).
    Returns ``{"name", "n_files", "n_terms"}``."""
    os.makedirs(pos_dir, exist_ok=True)
    with open(os.path.join(pos_dir, ".lock"), "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        i = 0
        while glob.glob(os.path.join(pos_dir, f"inc{i:05d}*")):
            i += 1
        name = f"inc{i:05d}"
        tmp = os.path.join(pos_dir, name + "__tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        # an increment inherits the parent dir's layout: same docid hash,
        # same partition count — a doc's partition never changes, so the
        # doc-disjointness the serving kernels rely on survives increments
        doc_partitions = read_doc_partitions(pos_dir)
        build_position_index(ds, tmp, num_shards=num_shards,
                             id_col=id_col, text_col=text_col,
                             doc_partitions=doc_partitions)
        # one manifest per positional dir: the parent's governs, drop the
        # sub-build's
        os.remove(os.path.join(tmp, POS_MANIFEST))
        new_rel = []
        for root, _dirs, fnames in os.walk(tmp):
            for f in fnames:
                if f.endswith(".parquet"):
                    new_rel.append(
                        os.path.join(
                            name, os.path.relpath(os.path.join(root, f), tmp)
                        )
                    )
        new_rel.sort()
        n_terms = sum(
            pq.read_metadata(
                os.path.join(tmp, os.path.relpath(r, name))
            ).num_rows
            for r in new_rel
        )
        os.rename(tmp, os.path.join(pos_dir, name))
        base = [os.path.relpath(p, pos_dir) for p in _active_files(pos_dir)]
        _write_manifest(pos_dir, base + new_rel)
    return {"name": name, "n_files": len(new_rel), "n_terms": int(n_terms)}


def load_position_tombstones(pos_dir: str) -> np.ndarray:
    """Sorted unique int64 tombstoned docids of a positional dir (possibly
    empty). Same layout as the main index (`deletes.py`)."""
    files = sorted(
        glob.glob(os.path.join(pos_dir, POS_DELETES_DIR, "*.parquet"))
    )
    if not files:
        return np.empty(0, dtype=np.int64)
    parts = [
        pq.read_table(f, columns=["docid"])["docid"].to_numpy(
            zero_copy_only=False
        )
        for f in files
    ]
    return np.unique(np.concatenate(parts).astype(np.int64))


def delete_position_docs(pos_dir: str, docids) -> dict:
    """Tombstone docs in a positional dir — O(tombstones), no rewrite.

    Deleted docs stop matching phrase/proximity/span-near immediately (the
    resident reader's file-set signature includes the tombstone files, so
    :func:`positions_reader` reloads); the postings bytes keep them until
    :func:`compact_positions`. Idempotent like the main index's
    ``delete_docs``."""
    new = np.unique(np.asarray([int(d) for d in docids], dtype=np.int64))
    if new.size == 0:
        raise ValueError("delete_position_docs: nothing to delete")
    ddir = os.path.join(pos_dir, POS_DELETES_DIR)
    os.makedirs(ddir, exist_ok=True)
    with open(os.path.join(ddir, ".lock"), "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        i = 0
        while os.path.exists(os.path.join(ddir, f"t{i:05d}.parquet")):
            i += 1
        dst = os.path.join(ddir, f"t{i:05d}.parquet")
        pq.write_table(
            pa.table({"docid": pa.array(new, type=pa.int64())}), dst + ".tmp"
        )
        os.replace(dst + ".tmp", dst)
    total = load_position_tombstones(pos_dir)
    return {"added": int(new.size), "n_tombstones": int(total.size)}


def _decode_rows_to_lists(batch: pa.Table, num_shards: int,
                          tomb: np.ndarray,
                          doc_partitions: int = 0) -> pa.Table:
    """Segment rows -> exploded (skey, term, docid, positions:list<int32>)
    rows, dropping tombstoned docs — the decode inverse of
    :func:`encode_positions_group`, used by compaction. The Python loop is
    over TERM rows (vocab-rate, a few thousand per batch); per-row decode
    is the vectorized varint kernel."""
    from tangent_ray.index.build import term_shards

    terms_out: list[str] = []
    docs_out: list[np.ndarray] = []
    lists_val: list[np.ndarray] = []
    lists_len: list[np.ndarray] = []
    for row in range(batch.num_rows):
        docids, counts, flat = decode_position_run(
            batch["docs"][row].as_py(),
            batch["counts"][row].as_py(),
            batch["positions"][row].as_py(),
        )
        if tomb.size:
            dead = np.isin(docids.astype(np.int64), tomb)
            if dead.any():
                keep = ~dead
                flat = flat[np.repeat(keep, counts)]
                docids, counts = docids[keep], counts[keep]
        if not docids.size:
            continue
        terms_out.append(batch["term"][row].as_py())
        docs_out.append(docids.astype(np.int64))
        lists_val.append(flat.astype(np.int32))
        lists_len.append(counts)
    if not terms_out:
        cols = {
            "skey": pa.array([], pa.int32()),
            "term": pa.array([], pa.string()),
            "docid": pa.array([], pa.int64()),
            "positions": pa.array([], pa.list_(pa.int32())),
        }
        if doc_partitions:
            cols["dpart"] = pa.array([], pa.int32())
        return pa.table(cols)
    term_arr = pa.array(
        np.repeat(
            np.arange(len(terms_out)), [len(d) for d in docs_out]
        ).astype(np.int64)
    )
    vocab = pa.array(terms_out, pa.string())
    terms = pc.take(vocab, term_arr)
    all_len = np.concatenate(lists_len).astype(np.int64)
    offsets = np.zeros(len(all_len) + 1, dtype=np.int32)
    np.cumsum(all_len, out=offsets[1:])
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.array(np.concatenate(lists_val), pa.int32()),
    )
    docid_out = np.concatenate(docs_out)
    skey = term_shards(terms, num_shards).astype(np.int64)
    out = {
        "skey": None,
        "term": terms,
        "docid": pa.array(docid_out, pa.int64()),
        "positions": lists,
    }
    if doc_partitions:
        dp = dpart_of(docid_out, doc_partitions).astype(np.int64)
        out["skey"] = pa.array(
            (dp * num_shards + skey).astype(np.int32), pa.int32()
        )
        out["dpart"] = pa.array(dp.astype(np.int32), pa.int32())
    else:
        out["skey"] = pa.array(skey.astype(np.int32), pa.int32())
    return pa.table(out)


def compact_positions(pos_dir: str, num_shards: int = 64,
                      max_run_positions: int | None = None) -> dict:
    """Rewrite a positional dir to one run-capped row set per term
    (one row, or several doc-range rows past ``max_run_positions`` —
    see ``encode_positions_group``), physically dropping
    tombstoned docs and folding every increment — the positional
    ``purge_deletes`` + ``compact_index``. One Ray job: decode-explode the
    live rows (vocab-rate Python, positions-rate numpy), re-shard with the
    build's ``groupby(crc32(term) % num_shards)``, re-encode. The
    re-encode's duplicate-docid check makes compaction double as the
    cross-increment uniqueness verifier. New files stage under
    ``cmp{i:05d}__tmp``; ONE manifest replace flips them live, then old
    files and tombstones are removed (a crash after the flip leaves
    ignorable orphans, never a bad view)."""
    import ray.data

    cap = MAX_RUN_POSITIONS if max_run_positions is None else max_run_positions
    doc_partitions = read_doc_partitions(pos_dir)  # layout survives compaction
    old_files = _active_files(pos_dir)
    tomb = load_position_tombstones(pos_dir)
    with open(os.path.join(pos_dir, ".lock"), "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        i = 0
        while glob.glob(os.path.join(pos_dir, f"cmp{i:05d}*")):
            i += 1
        name = f"cmp{i:05d}"
        tmp = os.path.join(pos_dir, name + "__tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        enc = (
            ray.data.read_parquet(old_files)
            .map_batches(
                lambda b: _decode_rows_to_lists(b, num_shards, tomb,
                                                doc_partitions),
                batch_format="pyarrow",
            )
            .groupby("skey")
            .map_groups(
                lambda g: _encode_group_keep_dpart(g, cap, doc_partitions),
                batch_format="pyarrow",
            )
        )
        if doc_partitions:
            enc.write_parquet(tmp, partition_cols=["dpart"])
        else:
            enc.write_parquet(tmp)
        new_rel = []
        for root, _dirs, fnames in os.walk(tmp):
            for f in fnames:
                if f.endswith(".parquet"):
                    new_rel.append(
                        os.path.join(
                            name, os.path.relpath(os.path.join(root, f), tmp)
                        )
                    )
        new_rel.sort()
        os.rename(tmp, os.path.join(pos_dir, name))
        _write_manifest(pos_dir, new_rel, doc_partitions=doc_partitions)
        # old view is unreachable now — physical cleanup
        shutil.rmtree(os.path.join(pos_dir, POS_DELETES_DIR),
                      ignore_errors=True)
        keep = {os.path.join(pos_dir, r) for r in new_rel}
        for p in old_files:
            if p not in keep and os.path.exists(p):
                os.remove(p)
        for d in os.listdir(pos_dir):
            full = os.path.join(pos_dir, d)
            if (d.startswith(("inc", "cmp")) and d != name
                    and os.path.isdir(full)):
                shutil.rmtree(full, ignore_errors=True)
    return {
        "name": name,
        "n_files": len(new_rel),
        "n_tombstones_purged": int(tomb.size),
        "n_source_files": len(old_files),
    }


# ---------------------------------------------------------------------------
# read: resident reader, O(df) per-term decode
# ---------------------------------------------------------------------------


def decode_position_run(
    doc_blob: bytes, cnt_blob: bytes, pos_blob: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One term's run -> (docids:uint64 asc, counts:int64, flat positions).

    ``flat`` concatenates each doc's ascending position list in docid
    order (lengths given by ``counts``)."""
    deltas = varint_decode(np.frombuffer(doc_blob, dtype=np.uint8))
    docids = np.cumsum(deltas, dtype=np.uint64)
    counts = varint_decode(np.frombuffer(cnt_blob, dtype=np.uint8)).astype(np.int64)
    pdel = varint_decode(np.frombuffer(pos_blob, dtype=np.uint8))
    if len(pdel) == 0:
        return docids, counts, np.empty(0, dtype=np.uint64)
    g = np.cumsum(pdel, dtype=np.uint64)
    off = np.cumsum(counts) - counts
    base = g[off] - pdel[off]
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return docids, counts, g - base[doc_of]


def merge_position_runs(
    runs: list[tuple[np.ndarray, np.ndarray, np.ndarray]], term: str,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge one term's (docids, counts, flat positions) runs by docid —
    runs come from increments / salted builds / shard actors. A duplicate
    docid across runs raises (re-ingested document). Empty runs are
    dropped; zero live runs merge to empty arrays."""
    runs = [r for r in runs if r[0].size]
    if not runs:
        return (
            np.empty(0, np.uint64),
            np.empty(0, np.int64),
            np.empty(0, np.uint64),
        )
    if len(runs) == 1:
        return runs[0]
    docids = np.concatenate([r[0] for r in runs])
    counts = np.concatenate([r[1] for r in runs])
    flat = np.concatenate([r[2] for r in runs])
    order = np.argsort(docids, kind="stable")
    if (docids[order][1:] == docids[order][:-1]).any():
        raise ValueError(
            f"duplicate docid across positional runs for {term!r}"
        )
    seg_starts = np.cumsum(counts) - counts
    cnts_o = counts[order]
    tot = int(cnts_o.sum())
    within = np.arange(tot, dtype=np.int64) - np.repeat(
        np.cumsum(cnts_o) - cnts_o, cnts_o
    )
    return (
        docids[order],
        cnts_o,
        flat[np.repeat(seg_starts[order], cnts_o) + within],
    )


class PositionsReader:
    """Positional postings of an index (all shard files, or a subset for
    sharded serving), loaded once — term lookup + per-term O(df) decode,
    the positional twin of the BM25 ``Segment``."""

    MAX_CACHE = 512  # decoded term runs kept hot

    def __init__(self, pos_dir: str, files: list[str] | None = None):
        if files is None:
            files = _active_files(pos_dir)
            if not files:
                raise FileNotFoundError(
                    f"no positional postings under {pos_dir!r} — run "
                    "build_position_index"
                )
        # an explicitly-empty subset is legal (a sharded-serving actor
        # whose partitions currently hold no files): every term resolves
        # to empty postings
        if files:
            first = pq.read_schema(files[0])
            if "docs" not in first.names:
                raise ValueError(
                    f"{pos_dir!r} holds a legacy doc-sharded positional "
                    "sidecar (schema lacks the encoded 'docs' column) — "
                    "rebuild it with build_position_index"
                )
            t = pa.concat_tables([pq.read_table(f) for f in files])
        else:
            t = POS_SCHEMA.empty_table()
        self.table = t.combine_chunks()
        self.tombstones = load_position_tombstones(pos_dir)
        self.lookup: dict[str, list[int]] = {}
        for i, s in enumerate(self.table["term"].to_pylist()):
            self.lookup.setdefault(s, []).append(i)
        self._docs = self.table["docs"]
        self._cnts = self.table["counts"]
        self._poss = self.table["positions"]
        self._cache: dict[str, tuple] = {}
        #: see _term_keys — readers are immutable post-load, so this only
        #: needs to exist; invalidation is a new reader
        self._tk_cache: dict[tuple, tuple] = {}

    def term_docids(self, term: str) -> np.ndarray:
        """One term's live docids (uint64 asc) WITHOUT decoding counts or
        positions — O(df bytes) varint work, ~30x cheaper than
        ``term_postings`` for a hot term. The distributed planner's
        boundary-sampling primitive."""
        rows = self.lookup.get(term, ())
        parts = [
            np.cumsum(
                varint_decode(
                    np.frombuffer(self._docs[r].as_py(), dtype=np.uint8)
                ),
                dtype=np.uint64,
            )
            for r in rows
        ]
        parts = [p for p in parts if p.size]
        if not parts:
            return np.empty(0, np.uint64)
        d = parts[0] if len(parts) == 1 else np.sort(np.concatenate(parts))
        if self.tombstones.size:
            d = d[~np.isin(d.astype(np.int64), self.tombstones)]
        return d

    def term_postings(
        self, term: str
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(docids:uint64 asc, counts, flat positions) for one term —
        empty arrays when absent. Multiple rows (increments / salted
        builds) merge by docid; a duplicate docid across rows raises."""
        got = self._cache.get(term)
        if got is not None:
            return got
        rows = self.lookup.get(term)
        if not rows:
            return (
                np.empty(0, np.uint64),
                np.empty(0, np.int64),
                np.empty(0, np.uint64),
            )
        runs = [
            decode_position_run(
                self._docs[r].as_py(), self._cnts[r].as_py(), self._poss[r].as_py()
            )
            for r in rows
        ]
        out = merge_position_runs(runs, term)
        if self.tombstones.size:
            # live-docs filter (deletes.py visibility rule: deleted docs
            # stop matching immediately, bytes go at compaction)
            dead = np.isin(out[0].astype(np.int64), self.tombstones)
            if dead.any():
                keep = ~dead
                out = (
                    out[0][keep],
                    out[1][keep],
                    out[2][np.repeat(keep, out[1])],
                )
        if len(self._cache) < self.MAX_CACHE:
            self._cache[term] = out
        return out


#: resident readers per sidecar dir, invalidated when the file set changes
_READERS: dict[str, tuple[tuple, PositionsReader]] = {}


def positions_sig(pos_dir: str) -> tuple:
    """Cheap stat-based change signature of a positional dir: the active
    file set + tombstone files' (relpath, size, mtime). Any rebuild,
    increment, delete or compaction changes it — the invalidation key for
    every cache layered over the dir (``positions_reader``, the scorer's
    phrase caches)."""
    watched = _active_files(pos_dir) + sorted(
        glob.glob(os.path.join(pos_dir, POS_DELETES_DIR, "*.parquet"))
    )
    return tuple(
        sorted(
            (os.path.relpath(p, pos_dir), st.st_size, st.st_mtime_ns)
            for p, st in ((p, os.stat(p)) for p in watched if os.path.exists(p))
        )
    )


def positions_reader(pos_dir: str) -> PositionsReader:
    """Cached resident reader for a positional index dir (rebuilds,
    increments, deletes and compactions all detected via the active-file +
    tombstone set's (name, size, mtime) signature)."""
    key = os.path.realpath(pos_dir)
    sig = positions_sig(pos_dir)
    got = _READERS.get(key)
    if got is not None and got[0] == sig:
        return got[1]
    if len(_READERS) >= 8:  # bound resident memory across many test dirs
        _READERS.pop(next(iter(_READERS)))
    r = PositionsReader(pos_dir)
    _READERS[key] = (sig, r)
    return r


def _provider(src):
    """Resolve a positional-postings provider: a dir path (resident
    cached reader) or any object with ``fetch_terms(terms) -> {term:
    (docids, counts, flat)}`` — e.g. :class:`PositionalEngine`."""
    if isinstance(src, str):
        return positions_reader(src)
    return src


#: per-provider (terms-set -> (all_docs, keys)) entries kept hot — the
#: unique over the docid union is O(sum df log) and dominates repeat
#: queries on corpus-hot terms (~1 s/query at 20M turns without it)
_TK_CACHE = 32


def _term_keys(
    reader, terms: list[str]
) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """(all candidate docids asc-uint64, per-term sorted (code<<32|pos)
    keys) — the shared O(df) prologue of the three positional queries.
    Codes index into the returned docid union, so keys from different
    terms compare in one shared space. Cached per provider + terms-set
    when the provider carries a ``_tk_cache`` dict (PositionsReader and
    PositionalEngine do; both drop it when their postings change)."""
    uniq = sorted(set(terms))
    cache = getattr(reader, "_tk_cache", None)
    ckey = tuple(uniq)
    if cache is not None:
        got = cache.get(ckey)
        if got is not None:
            return got
    if hasattr(reader, "fetch_terms"):
        per = reader.fetch_terms(uniq)  # one batched round to shard actors
    else:
        per = {t: reader.term_postings(t) for t in uniq}
    out = _keys_from_postings(per)
    if cache is not None:
        if len(cache) >= _TK_CACHE:
            cache.pop(next(iter(cache)))
        cache[ckey] = out
    return out


def _keys_from_postings(
    per: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Postings dict -> (docid union asc, per-term sorted (code<<32|pos)
    keys) — the shared key-space construction of every positional kernel
    (used both driver-side via ``_term_keys`` and inside the distributed
    doc-range kernel tasks)."""
    nonempty = [p[0] for p in per.values() if p[0].size]
    if not nonempty:
        return (
            np.empty(0, np.uint64),
            {t: np.empty(0, np.uint64) for t in per},
        )
    all_docs = np.unique(np.concatenate(nonempty))
    keys: dict[str, np.ndarray] = {}
    for t, (d, c, f) in per.items():
        codes = np.searchsorted(all_docs, d).astype(np.uint64)
        # docids ascending + per-doc positions ascending => keys asc
        keys[t] = (np.repeat(codes, c) << _HI32) | f
    return all_docs, keys


def _phrase_match_counts(
    all_docs: np.ndarray, terms: list[str], keys: dict[str, np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """ALL exact-phrase matches as (docids int64, n_occurrences int64) —
    the shared kernel of ``phrase_search`` and the distributed range
    tasks. Rarest slot first (intersection is commutative over the
    shifted key sets), then sorted searchsorted probes of the bigger
    sets — never a sort or an isin over a corpus-hot term's occurrence
    array. Duplicate phrase terms are handled (each occurrence slot
    checks the right offset even when terms repeat, e.g. "the the")."""
    order = sorted(range(len(terms)), key=lambda j: len(keys[terms[j]]))
    survivors: np.ndarray | None = None
    for i in order:
        ki = keys[terms[i]]
        if i:
            # entries < i cannot be matches (slot-i keys sit at start+i,
            # start >= 1) and would wrap below zero — drop them so the
            # shifted array stays sorted for the probes
            ki = ki[int(np.searchsorted(ki, np.uint64(i))):] - np.uint64(i)
        if survivors is None:
            survivors = ki
        elif len(ki) == 0:
            survivors = ki
        else:
            pos = np.minimum(np.searchsorted(ki, survivors), len(ki) - 1)
            survivors = survivors[ki[pos] == survivors]
        if survivors.size == 0:
            break
    if survivors is None or survivors.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    codes, counts = np.unique(
        (survivors >> _HI32).astype(np.int64), return_counts=True
    )
    return all_docs[codes].astype(np.int64), counts.astype(np.int64)


def _after_filter_desc(
    docs: np.ndarray, counts: np.ndarray, after: tuple[int, int] | None
) -> tuple[np.ndarray, np.ndarray]:
    """Keep rows strictly AFTER the cursor in (count desc, docid asc)
    order — the phrase-family ``search_after`` filter (cursor = the
    previous page's last (n_occurrences, docid) pair)."""
    if after is None:
        return docs, counts
    a_cnt, a_doc = int(after[0]), int(after[1])
    keep = (counts < a_cnt) | ((counts == a_cnt) & (docs > a_doc))
    return docs[keep], counts[keep]


def _after_filter_asc(
    docs: np.ndarray, spans: np.ndarray, after: tuple[int, int] | None
) -> tuple[np.ndarray, np.ndarray]:
    """Cursor filter for the (span/slop asc, docid asc) orders."""
    if after is None:
        return docs, spans
    a_span, a_doc = int(after[0]), int(after[1])
    keep = (spans > a_span) | ((spans == a_span) & (docs > a_doc))
    return docs[keep], spans[keep]


def phrase_search(
    index_dir: str, phrase: str, k: int = 10,
    search_after: tuple[int, int] | None = None,
) -> pa.Table:
    """Exact phrase top-k from the positional postings — O(sum df) decode,
    no Dataset job.

    Returns (docid, n_occurrences) sorted by (count desc, docid asc),
    limit ``k``. ``search_after=(n_occurrences, docid)`` — the previous
    page's last row — returns the NEXT k rows of the same total order
    (Elasticsearch search_after pagination), so a consumer can page
    through every match without re-ranking the whole set client-side."""
    terms = _phrase_terms(phrase)
    all_docs, keys = _term_keys(_provider(index_dir), terms)
    docs, counts = _phrase_match_counts(all_docs, terms, keys)
    docs, counts = _after_filter_desc(docs, counts, search_after)
    order = np.lexsort((docs, -counts))[:k]
    return _result_table(docs[order], counts[order])


def proximity_search(
    index_dir: str, query: str, window: int, k: int = 10,
    search_after: tuple[int, int] | None = None,
) -> pa.Table:
    """Docs whose distinct query terms all occur within ``window`` positions
    of each other, from the positional postings (O(sum df) decode).

    Returns (docid, min_span) with ``min_span <= window``, sorted by
    (min_span asc, docid asc), limit ``k``. ``search_after=(min_span,
    docid)`` pages the same total order like ``phrase_search``."""
    terms = sorted(set(_phrase_terms(query)))
    all_docs, keys = _term_keys(_provider(index_dir), terms)
    codes, spans = _spans_from_sorted_keys([keys[t] for t in terms])
    keep = spans <= window
    docs = all_docs[codes[keep]].astype(np.int64)
    spans = spans[keep]
    docs, spans = _after_filter_asc(docs, spans, search_after)
    order = np.lexsort((docs, spans))[:k]
    return _span_table(docs[order], spans[order])


def span_near_search(
    index_dir: str, phrase: str, slop: int, k: int = 10,
    search_after: tuple[int, int] | None = None,
) -> pa.Table:
    """Ordered phrase-with-slop over the positional postings (Lucene
    ``"a b"~slop`` SpanNear with ``inOrder=true``): docs where the phrase
    terms occur IN ORDER with at most ``slop`` extra positions between the
    first and last (slop 0 = exact phrase). Returns (docid, min_slop)
    sorted (min_slop asc, docid asc), limit ``k``; O(sum df) decode.
    ``search_after=(min_slop, docid)`` pages the same total order."""
    terms = _phrase_terms(phrase)  # phrase ORDER, repeats kept
    all_docs, keys = _term_keys(_provider(index_dir), terms)
    codes, slops = _ordered_spans([keys[t] for t in terms])
    keep = slops <= slop
    docs = all_docs[codes[keep]].astype(np.int64)
    slops = slops[keep]
    docs, slops = _after_filter_asc(docs, slops, search_after)
    order = np.lexsort((docs, slops))[:k]
    return _span_table(docs[order], slops[order])


# ---------------------------------------------------------------------------
# shared vectorized kernels (index path and scan twins)
# ---------------------------------------------------------------------------


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
    """Driver epilogue of the scan twins: concat the per-part partial
    top-k tables, final (count desc, docid asc) sort, slice k."""
    if not parts:
        return _result_table(np.empty(0, np.int64), np.empty(0, np.int64))
    merged = pa.concat_tables(parts).combine_chunks()
    idx = pc.sort_indices(
        merged,
        sort_keys=[("n_occurrences", "descending"), ("docid", "ascending")],
    )
    return merged.take(idx.slice(0, k))


def phrase_count_scan(ds, phrase: str, k: int = 10, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Index-free differential twin: the same phrase top-k by direct corpus
    scan (stateless map, per-block partial top-k, bounded driver merge).
    Use when the phrase is one-off; build the positional index for
    repeated queries."""
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
# proximity: all query terms within a position window
# ---------------------------------------------------------------------------
#
# ``min_span(doc)`` = the smallest (max_pos - min_pos) over any tuple of
# occurrences covering every DISTINCT query term — the classic positional-
# index proximity operator (Lucene SpanNearQuery / "terms within N words").
# For two terms this is min |p_a - p_b|; integer end-to-end, so the DuckDB
# positions-join twin matches bit-for-bit.


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
    """Mask-form wrapper of :func:`_spans_from_sorted_keys` (scan twins)."""
    return _spans_from_sorted_keys([np.sort(key_all[m]) for m in masks])


def _spans_from_sorted_keys(
    keys: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_codes, min_span) for docs containing every term. ``keys[i]``
    is the i-th DISTINCT term's sorted (doc<<32|pos) occurrence array.

    k >= 3 is fully vectorized (no per-doc Python): restrict to docs
    containing all terms, merge the occurrences in (doc, pos) order, and
    use the next-occurrence formulation of minimal cover — for every left
    endpoint i, the smallest covering window ends at ``jmax(i) = max over
    labels of the label's next same-doc occurrence at-or-after i``; the
    per-label next arrays come from ONE segmented suffix-min each (doc
    boundaries encoded into the value so runs never leak across docs)."""
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


def _start_slops(keys: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Per-START ordered-match slops: (doc_codes, slop) with one entry per
    first-term occurrence that begins an in-order match of all phrase
    terms in its doc.

    ``keys[i]`` is the sorted (doc<<32|pos) occurrence array of the i-th
    phrase term (repeated terms share an array). A match is positions
    ``p_0 < p_1 < ... < p_{k-1}`` in phrase order; its slop is
    ``p_{k-1} - p_0 - (k-1)`` (0 = exact phrase). Greedy next-occurrence
    chaining from every start is optimal for minimizing the end given the
    start, so the reported slop is the true minimum for that start; each
    chain step is one vectorized ``searchsorted`` (keys sort by
    (doc, pos), so "next same-doc occurrence strictly after cur" is the
    insertion point of cur+1, doc-checked via the high bits). Doc codes
    come out nondecreasing (starts are key-sorted)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if not keys or any(len(ks) == 0 for ks in keys):
        return empty
    start = keys[0]
    doc0 = (start >> _HI32).astype(np.int64)
    if len(keys) == 1:
        return doc0, np.zeros(len(doc0), dtype=np.int64)
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
    return doc0[valid], slops


def _ordered_spans(keys: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """(doc_codes, min_slop) for ORDERED matches of the phrase terms — the
    per-doc min over :func:`_start_slops` starts (see there for the match
    and slop definitions)."""
    docs, slops = _start_slops(keys)
    if not len(docs):
        return docs, slops
    if len(keys) == 1:
        uniq = np.unique(docs)
        return uniq, np.zeros(len(uniq), dtype=np.int64)
    starts_i = np.flatnonzero(
        np.concatenate([[True], docs[1:] != docs[:-1]])
    )
    return docs[starts_i], np.minimum.reduceat(slops, starts_i)


def phrase_doc_tfs(
    src, terms: list[str], slop: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sloppy-phrase frequency over the positional postings:
    ``tf(doc)`` = number of first-term occurrences that begin an IN-ORDER
    match of ``terms`` with at most ``slop`` extra positions between first
    and last (slop 0 = exact phrase occurrences, identical counts to
    ``phrase_search``; greedy chaining minimizes the slop for each start,
    so a start matches within ``slop`` iff its greedy chain does — see
    ``_start_slops``). The integer-count analogue of Lucene PhraseQuery's
    phraseFreq, chosen over the 1/(1+dist) sloppyFreq weighting so the
    DuckDB positions-join twin matches bit-for-bit. Returns (docids int64
    asc, tf int64) over matching docs; O(sum df) decode via the resident
    reader (``src``: a positional index dir or any ``fetch_terms``
    provider, e.g. :class:`PositionalEngine`). A provider exposing a
    ``doc_tfs(terms, slop)`` hook (the engine's distributed doc-range
    path) answers through it instead of shipping postings here."""
    p = _provider(src)
    hook = getattr(p, "doc_tfs", None)
    if hook is not None:
        return hook(terms, slop)
    return _doc_tfs_local(p, terms, slop)


def _doc_tfs_local(provider, terms: list[str], slop: int):
    """Driver-side ``phrase_doc_tfs`` body (see there) over any postings
    provider — also the engine's small-query fallback."""
    all_docs, keys = _term_keys(provider, terms)
    doc_codes, slops = _start_slops([keys[t] for t in terms])
    m = slops <= slop
    if not m.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    codes, tfs = np.unique(doc_codes[m], return_counts=True)
    return all_docs[codes].astype(np.int64), tfs.astype(np.int64)


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


# ---------------------------------------------------------------------------
# resident sharded positional serving
# ---------------------------------------------------------------------------


def _pos_range_kernel(kind: str, terms: list[str], arg: int, k: int,
                      after, *shard_parts: dict) -> pa.Table:
    """One doc range's positional kernel, run as a Ray task.

    ``shard_parts`` are the per-shard ``{term: (docids, counts, flat)}``
    slices for THIS doc range (one object per shard, produced by
    ``_PosShardWorker.fetch_sliced`` with ``num_returns``, so each task
    pulls only its range's postings — already decoded through the
    actor's term-postings LRU and tombstone-filtered). The kernels are
    per-doc and the ranges are doc-disjoint, so per-range results union
    to the global answer exactly; the per-range partial top-k keeps the
    driver merge at O(k * ranges) — postings never reach the driver
    (reference analogue: the resident engine never ships postings,
    ``mathindex.cpp:415-457``)."""
    per = {
        t: merge_position_runs([p[t] for p in shard_parts if t in p], t)
        for t in set(terms)
    }
    all_docs, keys = _keys_from_postings(per)
    return _dispatch_kernel(kind, terms, arg, k, after, all_docs, keys)


def _dispatch_kernel(kind: str, terms: list[str], arg: int, k: int,
                     after, all_docs: np.ndarray,
                     keys: dict[str, np.ndarray]) -> pa.Table:
    """Shared per-slice kernel dispatch over a prepared key space —
    the partial (doc-disjoint-slice) half of every positional query
    family; exact under union because every kernel is per-doc."""
    if kind == "phrase":
        docs, counts = _phrase_match_counts(all_docs, list(terms), keys)
        docs, counts = _after_filter_desc(docs, counts, after)
        return _result_table(*_partial_topk(docs, counts, k))
    if kind == "prox":
        codes, spans = _spans_from_sorted_keys([keys[t] for t in terms])
        keep = spans <= arg
        docs = all_docs[codes[keep]].astype(np.int64)
        docs, spans = _after_filter_asc(docs, spans[keep], after)
        return _span_table(*_partial_span_topk(docs, spans, k))
    if kind == "span":
        codes, slops = _ordered_spans([keys[t] for t in terms])
        keep = slops <= arg
        docs = all_docs[codes[keep]].astype(np.int64)
        docs, slops = _after_filter_asc(docs, slops[keep], after)
        return _span_table(*_partial_span_topk(docs, slops, k))
    if kind == "tfs":
        doc_codes, slops = _start_slops([keys[t] for t in terms])
        m = slops <= arg
        if not m.any():
            docs = np.empty(0, np.int64)
            tfs = np.empty(0, np.int64)
        else:
            codes, tfs = np.unique(doc_codes[m], return_counts=True)
            docs = all_docs[codes].astype(np.int64)
            tfs = tfs.astype(np.int64)
        return pa.table(
            {"docid": pa.array(docs, pa.int64()),
             "tf": pa.array(tfs, pa.int64())}
        )
    raise ValueError(f"unknown positional kernel kind {kind!r}")


class _PosShardWorker:
    """Ray actor body: a resident :class:`PositionsReader` over a disjoint
    subset of the positional dir's files."""

    def __init__(self, pos_dir: str, files: list[str]):
        self.pos_dir = pos_dir
        self.reader = PositionsReader(pos_dir, files=files)

    def fetch(self, terms: list[str]) -> dict:
        """Per-term (docids, counts, flat positions) runs from THIS
        shard's files — already run-merged and tombstone-filtered."""
        return {t: self.reader.term_postings(t) for t in terms}

    def query_kernel(self, kind: str, terms: list[str], arg: int, k: int,
                     after) -> pa.Table:
        """Run one query family's kernel entirely ON this actor over its
        doc-disjoint partition files and return only the O(k)/O(matches)
        partial — the document-partitioned serving path: postings never
        leave the actor, and the reader's term-postings LRU + term-keys
        cache make repeats on the same terms ~free."""
        uniq = sorted(set(terms))
        all_docs, keys = _term_keys(self.reader, uniq)
        return _dispatch_kernel(kind, terms, arg, k, after, all_docs, keys)

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Per-term df held by THIS shard, WITHOUT decoding postings —
        the planning round of the distributed kernel path."""
        out: dict[str, int] = {}
        df_col = self.reader.table["df"]
        for t in terms:
            rows = self.reader.lookup.get(t, ())
            out[t] = int(sum(df_col[r].as_py() for r in rows))
        return out

    def term_docids(self, term: str) -> np.ndarray:
        """One term's live docid array (uint64 asc) — the boundary-
        sampling round (called on the query's RAREST term only, so the
        payload is bounded by min df, not sum df)."""
        return self.reader.term_postings(term)[0]

    def term_docid_samples(self, term: str, n: int) -> np.ndarray:
        """<= n equally-spaced docids from this shard's run of ``term``
        (uint64 asc) — enough to plan balanced doc-range boundaries
        without shipping a hot term's full docid array to the driver
        (8 B x df is tens of MB at 10M+ df; 8 B x n is ~8 KB). Decodes
        the docid stream ONLY (``PositionsReader.term_docids``) — a hot
        term's full positions decode costs ~1.5 s at 5M df and would
        serialize the whole query behind one actor."""
        d = self.reader.term_docids(term)
        if len(d) <= n:
            return d
        idx = (np.arange(n, dtype=np.int64) * len(d)) // n
        return d[idx]

    def fetch_sliced(self, terms: list[str], bounds: np.ndarray) -> list:
        """DECODED postings split into ``len(bounds)+1`` doc ranges: one
        ``{term: (docids, counts, flat)}`` dict PER RANGE, invoked with
        ``num_returns`` so each range ships as its own object — a
        doc-range kernel task pulls only its slice, and the driver never
        touches postings. Decoding happens HERE, once per term, through
        the reader's term-postings LRU (already tombstone-filtered and
        run-merged), so repeat queries over hot terms skip the O(df)
        varint work entirely — measured 2.7 s cold / 0.27 s warm for an
        all-hot trigram at 20.4M vs 3.5-5 s for a ship-encoded variant
        that re-decoded full runs in every overlapping range task."""
        n_ranges = len(bounds) + 1
        outs: list[dict] = [dict() for _ in range(n_ranges)]
        for t in terms:
            d, c, f = self.reader.term_postings(t)
            if not d.size:
                continue
            cuts = np.searchsorted(d, bounds)
            off = np.cumsum(c) - c
            prev = 0
            for r in range(n_ranges):
                hi = int(cuts[r]) if r < n_ranges - 1 else len(d)
                if hi > prev:
                    fs = int(off[prev])
                    fe = int(off[hi - 1] + c[hi - 1])
                    outs[r][t] = (d[prev:hi], c[prev:hi], f[fs:fe])
                prev = hi
        return outs

    def reload(self, files: list[str]) -> int:
        self.reader = PositionsReader(self.pos_dir, files=files)
        return len(files)


class PositionalEngine:
    """Resident sharded phrase/proximity/span-near serving.

    The single-process serving path (:func:`positions_reader`) holds the
    whole positional index (~1-2 B/token) in one heap — the right shape up
    to one node's memory, the wrong one past it. This engine is the
    cluster shape sketched in the module docstring: actors each hold a
    disjoint subset of the active files, a query fans ONE batched
    term-fetch to every shard (payload O(sum df)), and the (tiny)
    key-intersection kernels run on the driver via the exact same
    functions the local path uses (``phrase_search(self, ...)`` — the
    engine is a postings *provider*), so results are identical by
    construction (plus the cross-shard duplicate-docid check in
    :func:`merge_position_runs`).

    ``refresh()`` follows the manifest like ``ShardedEngine.refresh``:
    new files (an increment) go to the smallest group; a dropped file
    (compaction) triggers full reassignment; a tombstone change reloads
    in place. Workers reload only when their view actually changed.
    """

    def __init__(self, pos_dir: str, n_shards: int = 4,
                 num_cpus_per_shard: float = 1):
        import ray

        self.pos_dir = pos_dir
        #: doc-partitioned layout (build_position_index doc_partitions=R):
        #: actors own whole doc-disjoint partitions and run every query's
        #: kernel locally — only top-k partials move. 0 = term-sharded
        #: layout (actors are postings providers; kernels run driver-side
        #: or as doc-range tasks).
        self.doc_partitions = read_doc_partitions(pos_dir)
        files = _active_files(pos_dir)
        if not files:
            raise FileNotFoundError(f"no positional postings under {pos_dir!r}")
        n = max(1, min(n_shards, len(files)))
        self._groups: list[list[str]] = self._plan_groups(files, n)
        n = len(self._groups)
        self._tomb_sig = self._tombstone_sig()
        self._actor_cls = ray.remote(num_cpus=num_cpus_per_shard)(
            _PosShardWorker
        )
        self._actors = [
            self._actor_cls.remote(pos_dir, g) for g in self._groups
        ]
        self._fetch_cache: dict[str, tuple] = {}
        self._tk_cache: dict[tuple, tuple] = {}  # see _term_keys
        #: postings generation — bumped whenever refresh() changes any
        #: shard's view; scorers watch it via postings_sig() to invalidate
        #: their own phrase caches
        self._gen = 0
        #: instrumentation: queries served by the distributed doc-range
        #: kernel path vs the driver-side fallback (soaks report both)
        self.dist_queries = 0
        self.local_queries = 0
        #: ES/Solr-style query-result cache: repeat phrase/proximity/
        #: span-near queries on a RESIDENT engine answer from here;
        #: dropped whenever refresh() changes any shard's view
        self._result_cache: dict[tuple, pa.Table] = {}
        ray.get([a.fetch.remote([]) for a in self._actors])  # load errors now

    def _plan_groups(self, files: list[str], n: int) -> list[list[str]]:
        """File -> actor assignment. Doc-partitioned layout: whole
        partitions per actor (partition r -> actor r % n) so every actor
        is doc-disjoint and doc-complete for its partitions — the
        property the local kernels need. Term-sharded layout: plain
        round-robin (actors are term-disjoint-ish postings providers)."""
        if self.doc_partitions:
            groups = [[] for _ in range(min(n, self.doc_partitions))]
            for f in sorted(files):
                r = _dpart_of_path(f)
                if r < 0:
                    raise ValueError(
                        f"doc-partitioned positional dir has a file outside "
                        f"dpart= layout: {f!r}"
                    )
                groups[r % len(groups)].append(f)
            return [g for g in groups if g]
        return [files[i::n] for i in range(n)]

    def _tombstone_sig(self) -> tuple:
        return tuple(
            sorted(
                (os.path.basename(f), os.path.getsize(f))
                for f in glob.glob(
                    os.path.join(self.pos_dir, POS_DELETES_DIR, "*.parquet")
                )
            )
        )

    #: driver-side merged-postings LRU entries (hot terms at 20M turns
    #: are ~100-200 MB of (docids, counts, positions) arrays PER TERM;
    #: without this every repeat query re-ships them from the shard
    #: actors — measured 950 ms/query for a corpus-head bigram)
    FETCH_CACHE = 64

    # -- provider protocol (phrase_search & co. accept the engine) -------
    def fetch_terms(self, terms: list[str]) -> dict:
        import ray

        # touch hits FIRST (move-to-end: dict order is the LRU order) so
        # the miss-fill's eviction below can never evict a term that this
        # very request is about to return (the evict-then-KeyError bug)
        out: dict[str, tuple] = {}
        for t in terms:
            v = self._fetch_cache.pop(t, None)
            if v is not None:
                self._fetch_cache[t] = v
                out[t] = v
        missing = sorted({t for t in terms if t not in out})
        if missing:
            parts = ray.get([a.fetch.remote(missing) for a in self._actors])
            for t in missing:
                merged = merge_position_runs([p[t] for p in parts], t)
                out[t] = merged
                while len(self._fetch_cache) >= self.FETCH_CACHE:
                    # evict oldest entries NOT serving the current request
                    victim = next(
                        (o for o in self._fetch_cache if o not in out), None
                    )
                    if victim is None:
                        break  # request larger than the cache: let it grow
                    self._fetch_cache.pop(victim)
                self._fetch_cache[t] = merged
        return {t: out[t] for t in terms}

    RESULT_CACHE = 256

    def _cached(self, key: tuple, fn) -> pa.Table:
        got = self._result_cache.get(key)
        if got is None:
            got = fn()
            if len(self._result_cache) >= self.RESULT_CACHE:
                self._result_cache.pop(next(iter(self._result_cache)))
            self._result_cache[key] = got
        return got

    # -- distributed doc-range kernels -----------------------------------
    #: distribute a query when its terms' summed df exceeds this; below
    #: it the driver-side kernel over fetch_terms is faster than task
    #: round-trips (and its LRU makes repeats ~free). Instance-overridable
    #: (tests set 0 to force distribution).
    DIST_MIN_SUMDF = 1 << 18
    #: upper bound on doc-range fan-out per query
    MAX_RANGES = 32

    def _kernel(self):
        import ray

        if getattr(self, "_kernel_fn", None) is None:
            # num_cpus=0: the range kernels are short vectorized bursts on
            # the QUERY path — they must never queue behind long-lived
            # actor CPU reservations (the engine's own shard actors plus a
            # resident BM25 pool can hold every slot on a busy node, and a
            # pending kernel task would deadlock the query that spawned it)
            self._kernel_fn = ray.remote(num_cpus=0)(_pos_range_kernel)
        return self._kernel_fn

    def _distributed(self, kind: str, slot_terms: list[str], arg: int,
                     k: int, after) -> pa.Table | None:
        """Doc-range-split kernel execution: plan ranges off the RAREST
        term's docids (candidates are a subset of them for every kernel
        family), slice each shard's postings server-side
        (``fetch_sliced`` with ``num_returns`` — one object per range),
        run :func:`_pos_range_kernel` once per range as a Ray task, and
        merge the O(k)-or-O(matches)-sized partials on the driver.

        Returns None when the query is too small to be worth task
        round-trips (the caller falls back to the exact driver-side
        path), or an exact result table. Payload ever touching the
        driver: per-term dfs, the rarest term's docids, and the partial
        result tables — never the O(sum df) postings.

        On a DOC-PARTITIONED dir this short-circuits to the broadcast
        path: every actor runs the kernel locally over its partitions
        (``query_kernel``), so nothing but partials moves at all and
        per-actor decode is df/R per term."""
        import ray

        if self.doc_partitions:
            self.dist_queries += 1
            parts = ray.get(
                [
                    a.query_kernel.remote(kind, list(slot_terms), arg, k,
                                          after)
                    for a in self._actors
                ]
            )
            if kind == "phrase":
                return _merge_topk([p for p in parts if p.num_rows], k)
            if kind == "tfs":
                merged = pa.concat_tables(parts)
                if merged.num_rows:
                    merged = merged.sort_by("docid")  # parts interleave
                return merged
            return _merge_span_topk([p for p in parts if p.num_rows], k)

        uniq = sorted(set(slot_terms))
        dfs = ray.get([a.term_dfs.remote(uniq) for a in self._actors])
        tot = {t: sum(d[t] for d in dfs) for t in uniq}
        if min(tot.values()) == 0:
            # every kernel family requires every term: a missing term
            # means no matches, no postings need move at all
            if kind == "phrase":
                return _result_table(np.empty(0, np.int64),
                                     np.empty(0, np.int64))
            if kind == "tfs":
                return pa.table(
                    {"docid": pa.array([], pa.int64()),
                     "tf": pa.array([], pa.int64())}
                )
            return _span_table(np.empty(0, np.int64), np.empty(0, np.int64))
        sum_df = sum(tot.values())
        if sum_df < self.DIST_MIN_SUMDF:
            self.local_queries += 1
            return None
        rarest = min(uniq, key=lambda t: (tot[t], t))
        rid = [
            p
            for p in ray.get(
                [
                    a.term_docid_samples.remote(rarest, 4096)
                    for a in self._actors
                ]
            )
            if p.size
        ]
        if not rid:
            # df counts tombstoned docs too: every posting of the rarest
            # term can be dead — then nothing matches in any family
            if kind == "phrase":
                return _result_table(np.empty(0, np.int64),
                                     np.empty(0, np.int64))
            if kind == "tfs":
                return pa.table(
                    {"docid": pa.array([], pa.int64()),
                     "tf": pa.array([], pa.int64())}
                )
            return _span_table(np.empty(0, np.int64), np.empty(0, np.int64))
        rd = np.sort(np.concatenate(rid))
        n_r = int(
            min(
                self.MAX_RANGES,
                max(2, sum_df // max(1, self.DIST_MIN_SUMDF // 2)),
                len(rd),
            )
        )
        if n_r < 2:
            self.local_queries += 1
            return None
        # boundaries at the rarest term's docid quantiles: candidate docs
        # are a subset of its docids, so ranges balance the candidate
        # count even under skewed docid spaces
        bounds = np.unique(rd[(np.arange(1, n_r) * len(rd)) // n_r])
        n_r = len(bounds) + 1
        if n_r < 2:
            self.local_queries += 1
            return None
        self.dist_queries += 1
        slice_refs = [
            a.fetch_sliced.options(num_returns=n_r).remote(uniq, bounds)
            for a in self._actors
        ]
        kern = self._kernel()
        parts = ray.get(
            [
                kern.remote(
                    kind, list(slot_terms), arg, k, after,
                    *[slice_refs[s][r] for s in range(len(self._actors))],
                )
                for r in range(n_r)
            ]
        )
        if kind == "phrase":
            return _merge_topk([p for p in parts if p.num_rows], k)
        if kind == "tfs":
            # ranges are docid-ordered, so concat keeps docids ascending
            return pa.concat_tables(parts)
        return _merge_span_topk([p for p in parts if p.num_rows], k)

    # -- queries ----------------------------------------------------------
    def phrase(self, phrase: str, k: int = 10,
               search_after: tuple[int, int] | None = None) -> pa.Table:
        def run() -> pa.Table:
            terms = _phrase_terms(phrase)
            got = self._distributed("phrase", terms, 0, k, search_after)
            if got is not None:
                return got
            return phrase_search(self, phrase, k=k,
                                 search_after=search_after)

        return self._cached(("phrase", phrase, k, search_after), run)

    def proximity(self, query: str, window: int, k: int = 10,
                  search_after: tuple[int, int] | None = None) -> pa.Table:
        def run() -> pa.Table:
            terms = sorted(set(_phrase_terms(query)))
            got = self._distributed("prox", terms, window, k, search_after)
            if got is not None:
                return got
            return proximity_search(self, query, window=window, k=k,
                                    search_after=search_after)

        return self._cached(("prox", query, window, k, search_after), run)

    def span_near(self, phrase: str, slop: int, k: int = 10,
                  search_after: tuple[int, int] | None = None) -> pa.Table:
        def run() -> pa.Table:
            terms = _phrase_terms(phrase)
            got = self._distributed("span", terms, slop, k, search_after)
            if got is not None:
                return got
            return span_near_search(self, phrase, slop=slop, k=k,
                                    search_after=search_after)

        return self._cached(("span", phrase, slop, k, search_after), run)

    def doc_tfs(
        self, terms: list[str], slop: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """Sloppy-phrase (docids, tf) — the :func:`phrase_doc_tfs`
        provider hook: big queries run the distributed doc-range path,
        small ones the driver-side kernel over the fetch LRU."""
        key = ("tfs", tuple(terms), slop)
        got = self._result_cache.get(key)
        if got is None:
            t = self._distributed("tfs", list(terms), slop, 0, None)
            if t is None:
                got = _doc_tfs_local(self, terms, slop)
            else:
                got = (
                    t["docid"].to_numpy().astype(np.int64),
                    t["tf"].to_numpy().astype(np.int64),
                )
            if len(self._result_cache) >= self.RESULT_CACHE:
                self._result_cache.pop(next(iter(self._result_cache)))
            self._result_cache[key] = got
        return got

    def refresh(self) -> dict:
        """Pick up add_position_increment / delete_position_docs /
        compact_positions in place. Returns ``{"new_files": n,
        "reassigned": bool, "reloaded": [shard indices]}``."""
        import ray

        current = _active_files(self.pos_dir)
        assigned = {f for g in self._groups for f in g}
        dropped = assigned - set(current)
        new = [f for f in current if f not in assigned]
        changed: set[int] = set()
        if self.doc_partitions:
            # layout-aware: a file always belongs to its partition's
            # actor, so increments land on the right actor and doc-
            # disjointness is preserved; compaction changes every group
            new_groups = self._plan_groups(current, len(self._actors))
            while len(new_groups) < len(self._actors):
                new_groups.append([])
            for i in range(len(self._actors)):
                if set(new_groups[i]) != set(self._groups[i]):
                    changed.add(i)
            self._groups = new_groups
        elif dropped:
            n = len(self._actors)
            self._groups = [current[i::n] for i in range(n)]
            changed = set(range(n))
        else:
            for f in new:
                g = min(self._groups, key=len)
                g.append(f)
                changed.add(self._groups.index(g))
        tsig = self._tombstone_sig()
        if tsig != self._tomb_sig:
            self._tomb_sig = tsig
            changed = set(range(len(self._actors)))
        jobs = [
            self._actors[i].reload.remote(self._groups[i])
            for i in sorted(changed)
        ]
        ray.get(jobs)
        if changed or new:
            # postings changed under every resident cache layer
            self._fetch_cache = {}
            self._tk_cache = {}
            self._result_cache = {}
            self._gen += 1
        return {
            "new_files": len(new),
            "reassigned": bool(dropped),
            "reloaded": sorted(changed),
        }

    def __reduce__(self):
        """Pickle as a LIGHT handle: the actor handles + layout, caches
        dropped. Shipping an engine into other actors (e.g.
        ``search_sharded(..., positions=engine)`` — every BM25 shard
        scorer attaching the SAME part actors) must not copy the
        driver's warm postings caches, and the deserialized copy shares
        the resident actors instead of loading its own positional index
        (the N-scorers-x-full-index memory blowup this exists to avoid).
        The driver's original remains the lifecycle owner (refresh /
        shutdown); a shipped copy is a SNAPSHOT — after a driver-side
        refresh(), restart the consuming pool (the same reader-refresh
        rule as any segment change, ``deletes.py``)."""
        return (
            _engine_from_handle,
            (
                self.pos_dir,
                self.doc_partitions,
                [list(g) for g in self._groups],
                list(self._actors),
                self._tomb_sig,
                self._gen,
            ),
        )

    _instance_seq = iter(range(1 << 62))

    def postings_sig(self) -> tuple:
        """Change signature for caches layered over this engine (the
        scorer's phrase caches): (engine identity, postings generation).
        Identity is a process-unique sequence number, not id() — a
        recycled address must never alias a dead engine's signature."""
        seq = getattr(self, "_seq", None)
        if seq is None:
            seq = self._seq = next(PositionalEngine._instance_seq)
        return (seq, self._gen)

    def shutdown(self) -> None:
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []


def _engine_from_handle(pos_dir, doc_partitions, groups, actors, tomb_sig,
                        gen) -> "PositionalEngine":
    """Rebuild a (cache-cold) :class:`PositionalEngine` around EXISTING
    shard actors — the unpickle side of ``PositionalEngine.__reduce__``."""
    eng = PositionalEngine.__new__(PositionalEngine)
    eng.pos_dir = pos_dir
    eng.doc_partitions = doc_partitions
    eng._groups = groups
    eng._actors = actors
    eng._tomb_sig = tomb_sig
    eng._gen = gen
    eng._actor_cls = None  # a handle copy never creates actors
    eng._fetch_cache = {}
    eng._tk_cache = {}
    eng._result_cache = {}
    eng.dist_queries = 0
    eng.local_queries = 0
    return eng
