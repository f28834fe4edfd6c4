"""Compressed posting lists: delta + LEB128 varint with skip blocks.

The reference keeps postings as raw in-memory int arrays with a galloping
``skip`` (doubling + binary search — ``IDIterPL::skip``,
``mathindexmid.h:100-132``) and pays 2-2.5x index size in RAM (paper §8.2).
Here posting lists are immutable compressed byte strings designed for
object-store shipping and mmap-friendly segment files:

- entries are ``(docid, tf, dl, pos1)`` sorted by docid; ``dl`` is the
  document length *in the term's namespace* (text token count for text
  terms, math tuple count for tuple terms) embedded per posting so that
  BM25 / F-measure scoring needs no separate doc-stats lookup at scale;
  ``pos1`` is the first occurrence position (the reference stores only first
  positions per doc — ``mathindexbase.h:248-255``).
- docids are stored as deltas (the first entry's delta is taken from 0 or
  from the previous block's last docid), so a block is decodable standalone
  given its skip entry, and the whole stream is decodable with one
  vectorized pass;
- a skip table with one entry per block of ``block_size`` postings carries
  ``(last_docid, byte_offset, n_entries, max_tf, min_dl)`` — the galloping
  analogue is a ``searchsorted`` over ``last_docid``, and
  ``(max_tf, min_dl)`` give the block-max score bound for WAND pruning
  (the reference's threshold skipping — ``mathindex.cpp:225-255``).

All encode/decode paths are numpy-vectorized; no Python loop touches
individual postings.
"""

from __future__ import annotations

import numpy as np

SKIP_DTYPE = np.dtype(
    [("last", "<u8"), ("off", "<u4"), ("n", "<u2"), ("maxtf", "<u4"), ("mindl", "<u4")]
)


def varint_encode(values: np.ndarray) -> np.ndarray:
    """LEB128-encode a uint64 array -> uint8 array (vectorized)."""
    return _varint_encode_with_lengths(values)[0]


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """Decode a uint8 LEB128 stream -> uint64 array (vectorized)."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    term = b < 0x80
    if term.all():
        # every value fits one byte (tf counts, most position deltas):
        # the stream IS the value array — ~60x cheaper than the general
        # reduceat path on hot-term runs
        return b.astype(np.uint64)
    n_bytes = b.size
    starts = np.empty(int(term.sum()), dtype=np.int64)
    ends = np.flatnonzero(term)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    pos_in_group = np.arange(n_bytes, dtype=np.int64)
    # group id per byte = number of terminators strictly before it
    gid = np.cumsum(term) - term
    pos_in_group -= starts[gid]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_group.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts)


def _block_layout(ns: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Index math shared by encode/decode.

    Given per-block entry counts ``ns``, returns ``(estarts, vstarts,
    block_of, within)``: entry/value start offsets per block, and for each
    entry its block id and within-block index. Values are laid out per block
    as [deltas, tfs, dls, pos1s] (4 * n_b values).
    """
    ns = ns.astype(np.int64)
    estarts = np.concatenate([[0], np.cumsum(ns[:-1])])
    vstarts = 4 * estarts
    block_of = np.repeat(np.arange(len(ns), dtype=np.int64), ns)
    within = np.arange(int(ns.sum()), dtype=np.int64) - estarts[block_of]
    return estarts, vstarts, block_of, within


def encode_postings(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    pos1s: np.ndarray,
    block_size: int = 128,
) -> tuple[bytes, bytes]:
    """Encode sorted-unique (docid, tf, dl, pos1) arrays.

    Returns ``(postings_bytes, skips_bytes)``. Within each block the value
    stream is: docid deltas, then tfs, then dls, then pos1s (each LEB128).
    Fully vectorized across blocks.
    """
    n = len(docids)
    docids = np.ascontiguousarray(docids, dtype=np.uint64)
    if n == 0:
        return b"", b""
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=deltas[1:])
    n_blocks = (n + block_size - 1) // block_size
    ns = np.full(n_blocks, block_size, dtype=np.int64)
    ns[-1] = n - (n_blocks - 1) * block_size
    estarts, vstarts, block_of, within = _block_layout(ns)
    # interleaved value array: per block [deltas | tfs | dls | pos1s]
    vals = np.empty(4 * n, dtype=np.uint64)
    idx = vstarts[block_of] + within
    nsb = ns[block_of]
    vals[idx] = deltas
    vals[idx + nsb] = tfs.astype(np.uint64)
    vals[idx + 2 * nsb] = dls.astype(np.uint64)
    vals[idx + 3 * nsb] = pos1s.astype(np.uint64)
    enc, nbytes = _varint_encode_with_lengths(vals)
    byte_ends = np.cumsum(nbytes)
    if int(byte_ends[-1]) >= 1 << 32:
        # skip offsets are u4: a >=4GiB single run would silently wrap.
        # A hot term at this size needs more salt buckets (smaller runs).
        raise ValueError(
            "posting run exceeds 4 GiB encoded; raise salt_buckets so hot "
            "terms split into smaller per-bucket runs"
        )
    skips = np.zeros(n_blocks, dtype=SKIP_DTYPE)
    last_idx = estarts + ns - 1
    skips["last"] = docids[last_idx]
    skips["off"][1:] = byte_ends[vstarts[1:] - 1] if n_blocks > 1 else 0
    skips["n"] = ns
    skips["maxtf"] = np.maximum.reduceat(tfs.astype(np.uint32), estarts)
    skips["mindl"] = np.minimum.reduceat(dls.astype(np.uint32), estarts)
    return enc.tobytes(), skips.tobytes()


def _scatter_segments(
    dst: np.ndarray,
    dst_starts: np.ndarray,
    src: np.ndarray,
    src_starts: np.ndarray,
    lengths: np.ndarray,
) -> None:
    """Copy variable-length segments ``src[src_starts[i]:+len]`` to
    ``dst[dst_starts[i]:+len]`` in one vectorized scatter (int32 math)."""
    total = int(lengths.sum())
    if total == 0:
        return
    seg = np.repeat(np.arange(len(lengths), dtype=np.int32), lengths)
    base = (np.cumsum(lengths, dtype=np.int64) - lengths).astype(np.int64)
    within = np.arange(total, dtype=np.int64)
    within -= base[seg]
    dst[dst_starts[seg] + within] = src[src_starts[seg] + within]


def encode_postings_multi(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    pos1s: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    block_size: int = 128,
) -> tuple[list[bytes], list[bytes]]:
    """Encode MANY concatenated runs in one vectorized pass.

    ``docids[starts[t]:ends[t]]`` is run ``t`` (sorted, unique). Returns
    per-run ``(postings, skips)`` byte strings identical to calling
    :func:`encode_postings` on each slice — but with one shared numpy pass
    over all runs, which is what keeps the reduce side of the index-build
    shuffle off the Python-per-term floor.

    The four value streams are varint-encoded SEPARATELY (hash-docid deltas
    are 5-7 bytes; tf/dl/pos1 are near-always 1 byte and take a cast-only
    fast path) and then assembled into the per-block
    ``[deltas|tfs|dls|pos1s]`` wire layout with one segmented scatter per
    stream — ~3x less memory traffic than interleaving everything into one
    4n uint64 array, which is what the reduce CPU is bound by.
    """
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    T = len(starts)
    n = len(docids)
    if n == 0 or T == 0:
        return [b""] * T, [b""] * T
    docids = np.ascontiguousarray(docids, dtype=np.uint64)
    lens = ends - starts
    # docid deltas, reset at each run start
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=deltas[1:])
    deltas[starts] = docids[starts]
    # per-run block counts -> global per-block entry counts
    nbt = (lens + block_size - 1) // block_size
    total_blocks = int(nbt.sum())
    run_of_block = np.repeat(np.arange(T, dtype=np.int64), nbt)
    bstart_of_run = np.concatenate([[0], np.cumsum(nbt[:-1])])
    blk_local = np.arange(total_blocks, dtype=np.int64) - bstart_of_run[run_of_block]
    estarts = starts[run_of_block] + blk_local * block_size
    ns = np.minimum(block_size, ends[run_of_block] - estarts)

    streams = []
    for arr in (deltas, tfs, dls, pos1s):
        enc_s, nb_s = _varint_encode_with_lengths(arr, allow_fast=True)
        if nb_s is None:  # 1-byte fast path: lengths are implicitly 1
            blk_bytes = ns.astype(np.int64)
            src_starts = estarts
        else:
            b_ends = np.cumsum(nb_s, dtype=np.int64)
            src_starts = b_ends[estarts] - nb_s[estarts]
            blk_bytes = np.add.reduceat(nb_s, estarts)
        streams.append((enc_s, src_starts, blk_bytes))

    # destination layout: per block [deltas|tfs|dls|pos1s]
    counts = np.empty((total_blocks, 4), dtype=np.int64)
    for k in range(4):
        counts[:, k] = streams[k][2]
    flat_ends = np.cumsum(counts.ravel())
    flat_starts = flat_ends - counts.ravel()
    dst_starts = flat_starts.reshape(total_blocks, 4)
    out = np.empty(int(flat_ends[-1]), dtype=np.uint8)
    for k, (enc_s, src_starts, blk_bytes) in enumerate(streams):
        _scatter_segments(out, dst_starts[:, k], enc_s, src_starts, blk_bytes)

    block_byte_start = dst_starts[:, 0]
    run_byte_start = block_byte_start[bstart_of_run]
    run_byte_end = np.concatenate([run_byte_start[1:], [int(flat_ends[-1])]])
    if int((run_byte_end - run_byte_start).max()) >= 1 << 32:
        raise ValueError(
            "posting run exceeds 4 GiB encoded; raise salt_buckets so hot "
            "terms split into smaller per-bucket runs"
        )
    skips = np.zeros(total_blocks, dtype=SKIP_DTYPE)
    skips["last"] = docids[estarts + ns - 1]
    skips["off"] = block_byte_start - run_byte_start[run_of_block]
    skips["n"] = ns
    skips["maxtf"] = np.maximum.reduceat(tfs.astype(np.uint32), estarts)
    skips["mindl"] = np.minimum.reduceat(dls.astype(np.uint32), estarts)
    enc_b = out.tobytes()
    skips_b = skips.tobytes()
    ss = SKIP_DTYPE.itemsize
    out_post = [
        enc_b[run_byte_start[t] : run_byte_end[t]] for t in range(T)
    ]
    out_skips = [
        skips_b[bstart_of_run[t] * ss : (bstart_of_run[t] + nbt[t]) * ss]
        for t in range(T)
    ]
    return out_post, out_skips


def _varint_encode_with_lengths(
    a: np.ndarray, allow_fast: bool = False
) -> tuple[np.ndarray, np.ndarray | None]:
    """LEB128 encode + per-value byte counts (both vectorized).

    With ``allow_fast`` and all values < 128 the encoding is a bare uint8
    cast and the lengths are implicitly 1 — ``None`` is returned for them
    (tf/dl/pos1 streams hit this nearly always).
    """
    if a.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    if allow_fast and int(a.max()) < 128:
        return a.astype(np.uint8), None
    a = np.ascontiguousarray(a, dtype=np.uint64)
    nb = np.ones(a.size, dtype=np.int64)
    kmax = max(1, (int(a.max()).bit_length() + 6) // 7)
    for k in range(1, kmax):
        nb += (a >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nb)
    starts = ends - nb
    for j in range(10):
        mask = nb > j
        if not mask.any():
            break
        idx = starts[mask] + j
        vals = (a[mask] >> np.uint64(7 * j)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = vals.astype(np.uint8) | cont
    return out, nb


def decode_skips(skips_bytes: bytes) -> np.ndarray:
    return np.frombuffer(skips_bytes, dtype=SKIP_DTYPE)


def decode_postings(
    postings: bytes, skips_bytes: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full posting list -> (docids, tfs, dls, pos1s)."""
    skips = decode_skips(skips_bytes)
    if len(skips) == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e.astype(np.uint32), e.astype(np.uint32), e.astype(np.uint32)
    vals = varint_decode(np.frombuffer(postings, dtype=np.uint8))
    ns = skips["n"].astype(np.int64)
    estarts, vstarts, block_of, within = _block_layout(ns)
    idx = vstarts[block_of] + within
    nsb = ns[block_of]
    deltas = vals[idx]
    tfs = vals[idx + nsb].astype(np.uint32)
    dls = vals[idx + 2 * nsb].astype(np.uint32)
    pos1s = vals[idx + 3 * nsb].astype(np.uint32)
    # per-block cumsum of deltas: global cumsum minus the cumsum value just
    # before each block start, plus the previous block's last docid.
    g = np.cumsum(deltas, dtype=np.uint64)
    before = g[estarts] - deltas[estarts]
    bases = np.concatenate([[np.uint64(0)], skips["last"][:-1]]).astype(np.uint64)
    docids = g - before[block_of] + bases[block_of]
    return docids, tfs, dls, pos1s


def decode_block(
    postings: bytes, skips: np.ndarray, bi: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode a single block standalone (used by the WAND iterator)."""
    start = int(skips["off"][bi])
    end = int(skips["off"][bi + 1]) if bi + 1 < len(skips) else len(postings)
    vals = varint_decode(np.frombuffer(postings[start:end], dtype=np.uint8))
    nb = int(skips["n"][bi])
    base = np.uint64(0) if bi == 0 else skips["last"][bi - 1]
    docids = np.cumsum(vals[:nb], dtype=np.uint64) + base
    return (
        docids,
        vals[nb : 2 * nb].astype(np.uint32),
        vals[2 * nb : 3 * nb].astype(np.uint32),
        vals[3 * nb : 4 * nb].astype(np.uint32),
    )


def concat_runs(runs: list[tuple[bytes, bytes]]) -> tuple[bytes, bytes]:
    """Concatenate posting runs over *disjoint, ascending* docid ranges.

    This is the fast path of the tiered segment merge: salted build runs are
    keyed by docid range (``(term, docid >> shift)``), so partial lists for
    one term arrive as ordered, non-overlapping runs and merging is pure
    byte concatenation — only each run's first delta (relative to 0) must be
    rewritten relative to the previous run's last docid, and skip offsets
    shifted.
    """
    runs = [r for r in runs if len(r[1])]
    if not runs:
        return b"", b""
    if len(runs) == 1:
        return runs[0]
    out_post: list[bytes] = []
    out_skips: list[np.ndarray] = []
    prev_last = np.uint64(0)
    has_prev = False
    byte_off = 0
    for post, sk in runs:
        skips = decode_skips(sk).copy()
        if has_prev:
            # overlap must be checked against EVERY previous run, including
            # one whose last docid is 0 (docid 0 is reachable); only the
            # delta rewrite is a no-op when prev_last == 0
            first = varint_decode(np.frombuffer(post[:10], dtype=np.uint8)[: _first_len(post)])[0]
            if first <= prev_last:
                raise ValueError("concat_runs: runs overlap; use merge_postings")
            if prev_last > 0:
                old = varint_encode(np.array([first], dtype=np.uint64))
                new = varint_encode(np.array([first - prev_last], dtype=np.uint64))
                post = new.tobytes() + post[len(old) :]
                # The delta-varint rewrite changes the run's byte length;
                # shift only blocks 1+ — block 0's in-run offset must stay 0.
                shift = len(new) - len(old)
                if shift and len(skips) > 1:
                    skips["off"][1:] = (
                        skips["off"][1:].astype(np.int64) + shift
                    ).astype(np.uint32)
        if byte_off + len(post) >= 1 << 32:
            raise ValueError(
                "concatenated posting run exceeds 4 GiB; compact with "
                "merge_postings (re-encode) or raise salt_buckets"
            )
        skips["off"] += np.uint32(byte_off)
        out_post.append(post)
        out_skips.append(skips)
        byte_off += len(post)
        prev_last = skips["last"][-1]
        has_prev = True
    return b"".join(out_post), np.concatenate(out_skips).tobytes()


def _first_len(post: bytes) -> int:
    for i in range(min(10, len(post))):
        if post[i] < 0x80:
            return i + 1
    raise ValueError("bad varint")


def merge_postings(
    runs: list[tuple[bytes, bytes]], block_size: int = 128
) -> tuple[bytes, bytes]:
    """General merge of posting runs with possibly interleaved docid ranges.

    Used by the cross-increment tiered merge when increments cover
    overlapping docid ranges (hash docids). Decode → merge-sort → re-encode.
    A docid appearing in several runs is an error (a doc belongs to exactly
    one build increment); duplicates raise.
    """
    runs = [r for r in runs if len(r[1])]
    if not runs:
        return b"", b""
    try:
        return concat_runs(sorted(runs, key=_run_first_docid))
    except ValueError:
        pass
    parts = [decode_postings(p, s) for p, s in runs]
    docids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    dls = np.concatenate([p[2] for p in parts])
    pos1s = np.concatenate([p[3] for p in parts])
    order = np.argsort(docids, kind="stable")
    docids = docids[order]
    if len(docids) > 1 and (docids[1:] == docids[:-1]).any():
        raise ValueError("merge_postings: duplicate docid across runs")
    return encode_postings(docids, tfs[order], dls[order], pos1s[order], block_size)


def _run_first_docid(run: tuple[bytes, bytes]) -> int:
    post, _ = run
    return int(varint_decode(np.frombuffer(post[: _first_len(post)], dtype=np.uint8))[0])
