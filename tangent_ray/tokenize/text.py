"""Vectorized text tokenization over Arrow batches.

Replaces the reference text path (lowercase + split + Porter stem before
querying Solr — ``text/TextResult.py:29-32``, ``text/text_engine_client.py``)
with a native, Arrow-kernel tokenizer: ``utf8_lower`` → ``split_pattern_regex``
→ ``list_flatten`` / ``list_parent_indices`` → hash ``group_by`` for per-doc
term frequencies. No Python loop touches individual tokens except the
(lru-cached, unique-values-only) stemmer.

Token definition (shared verbatim with the DuckDB oracle SQL):
``string_split_regex(lower(text), '[^a-z0-9]+')`` minus empty strings.
Positions are 1-based ranks among the non-empty tokens of a document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.tokenize.porter import porter_stem

_SPLIT_RE = "[^a-z0-9]+"


def split_tokens(texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Tokenize a string array.

    Returns ``(parents, tokens, pos)``: one entry per non-empty token, where
    ``parents[i]`` is the row index the token came from, ``tokens`` the token
    string and ``pos`` its 1-based rank within its row.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lower = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(lower, _SPLIT_RE)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # Some rows may be null/empty -> parents may skip indices; that's fine.
    parents = parents[keep]
    tokens = flat.filter(pa.array(keep))
    # 1-based position among kept tokens of each parent. parents is
    # non-decreasing (list order), so a run-reset cumulative count works.
    n = len(parents)
    if n == 0:
        pos = np.empty(0, dtype=np.int32)
    else:
        idx = np.arange(n, dtype=np.int64)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        np.not_equal(parents[1:], parents[:-1], out=new_run[1:])
        run_starts = np.maximum.accumulate(np.where(new_run, idx, 0))
        pos = (idx - run_starts + 1).astype(np.int32)
    return parents, tokens, pos


def stem_tokens(tokens: pa.Array) -> pa.Array:
    """Porter-stem a token array, stemming each distinct token once."""
    uniq = pc.unique(tokens)
    idx = pc.index_in(tokens, value_set=uniq)
    stemmed_uniq = pa.array(
        [porter_stem(u) for u in uniq.to_pylist()], type=pa.string()
    )
    return pc.take(stemmed_uniq, idx)


def tokenize_text(
    texts: pa.Array, stem: bool = False
) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Per-(row, term) aggregated tokenization of a batch.

    Returns ``(row_idx, term, tf, pos1, dl)`` where the first four are
    parallel arrays with one entry per distinct (row, term) pair — ``tf`` the
    term frequency, ``pos1`` the first 1-based position (the analogue of the
    reference's first-position-only ``SubObjectMap``,
    ``mathindexbase.h:248-255``) — and ``dl[r]`` is the token count of input
    row r (length of the full input ``texts``).
    """
    parents, tokens, pos = split_tokens(texts)
    if stem and len(tokens):
        tokens = stem_tokens(tokens)
    dl = np.zeros(len(texts), dtype=np.int32)
    if len(parents):
        np.add.at(dl, parents, 1)
    t = pa.table(
        {
            "row": pa.array(parents, type=pa.int64()),
            "term": tokens,
            "pos": pa.array(pos, type=pa.int32()),
        }
    )
    agg = t.group_by(["row", "term"]).aggregate([("pos", "count"), ("pos", "min")])
    return (
        agg["row"].to_numpy(zero_copy_only=False),
        agg["term"].combine_chunks() if isinstance(agg["term"], pa.ChunkedArray) else agg["term"],
        agg["pos_count"].to_numpy(zero_copy_only=False).astype(np.int32),
        agg["pos_min"].to_numpy(zero_copy_only=False).astype(np.int32),
        dl,
    )


def md5_key(ids, prefix: str = "", hex_digits: int = 8) -> np.ndarray:
    """Deterministic salted id key: ``int(md5(prefix + str(id))[:hex], 16)``
    — the ONE md5-of-id definition behind the holdout split, stratified
    sampling (both via ``md5_bucket``) and the fixed-size uniform sample
    (``ops.curation.sample_key``), each replayed verbatim by its DuckDB
    twin. Id-only, so the Python md5 loop runs at metadata rate (~1M
    ids/s/core), never at payload rate."""
    import hashlib

    return np.fromiter(
        (
            int(hashlib.md5(f"{prefix}{int(i)}".encode())
                .hexdigest()[:hex_digits], 16)
            for i in ids
        ),
        count=len(ids),
        dtype=np.int64,
    )


def md5_bucket(ids, n_buckets: int, prefix: str = "") -> np.ndarray:
    """``md5_key(ids, prefix) % n_buckets`` (see ``md5_key``)."""
    return md5_key(ids, prefix) % n_buckets


def md5_u64(strings: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Portable 64-bit string hash: little-endian uint64 of md5 bytes [8:16].

    This is exactly DuckDB's ``md5_number_lower``, so every operator built
    on it (fingerprints, SimHash, MinHash) has an EXACT SQL oracle twin —
    unlike ``pd.util.hash_array``, whose values are a pandas implementation
    detail. Engine-independent hashes are what a production corpus pipeline
    needs anyway: fingerprints written this year must match fingerprints
    recomputed next year on a different stack.

    Cost shape: md5 runs only over the batch's UNIQUE strings (dictionary
    encoding first), then the per-occurrence values are a numpy gather —
    per-batch work is O(vocabulary), not O(tokens). The unique-string md5
    itself runs in DuckDB's vectorized C++ kernel (a cached single-threaded
    in-process connection — map_batches workers are 1-CPU slots), ~10x a
    Python hashlib loop; high-uniqueness inputs like shingles are
    payload-rate, so this is the hot path of the dedup family.
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if len(strings) == 0:
        return np.empty(0, dtype=np.uint64)
    d = pc.dictionary_encode(strings)
    codes = d.indices.to_numpy(zero_copy_only=False)
    hv = _md5_u64_unique(d.dictionary)
    return hv[codes]


def md5_u64_pair(
    strings: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray]:
    """Both 64-bit halves of md5 (DuckDB ``md5_number_lower`` /
    ``md5_number_upper``) — the 128-bit portable content key used where a
    64-bit birthday bound is not acceptable (whole-corpus dedup keys).
    Same unique-then-gather cost shape as :func:`md5_u64`."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if len(strings) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    d = pc.dictionary_encode(strings)
    codes = d.indices.to_numpy(zero_copy_only=False)
    lo, hi = _md5_pair_unique(d.dictionary)
    return lo[codes], hi[codes]


def md5_hex(strings: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Lowercase hex md5 per string (= DuckDB ``md5``). Used where hashed
    content must flow back into STRING composition (e.g. per-turn hashes
    joined by control-character separators: hex is [0-9a-f], so a hash can
    never collide with a separator). Same unique-then-gather cost shape as
    :func:`md5_u64`."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if len(strings) == 0:
        return pa.array([], type=pa.string())
    d = pc.dictionary_encode(strings)
    uniq = d.dictionary
    try:
        con, lock = _md5_con()
        tbl = pa.table({"s": uniq})
        with lock:
            con.register("md5_in", tbl)
            out = con.execute("SELECT md5(s) AS h FROM md5_in").arrow()
            con.unregister("md5_in")
        hv = out["h"].combine_chunks()
    except ImportError:  # duckdb absent: same values, Python rate
        import hashlib

        hv = pa.array(
            [hashlib.md5(u.encode()).hexdigest() for u in uniq.to_pylist()],
            type=pa.string(),
        )
    return hv.take(d.indices)


def _md5_pair_unique(uniq: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(md5_number_lower, md5_number_upper) over unique strings."""
    try:
        con, lock = _md5_con()
        tbl = pa.table({"s": uniq})
        with lock:
            con.register("md5_in", tbl)
            out = con.execute(
                "SELECT md5_number_lower(s) AS lo, md5_number_upper(s) AS hi"
                " FROM md5_in"
            ).arrow()
            con.unregister("md5_in")
        return (
            out["lo"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.uint64),
            out["hi"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.uint64),
        )
    except ImportError:  # duckdb absent: same values, Python rate
        import hashlib

        vals = uniq.to_pylist()
        digs = [hashlib.md5(u.encode()).digest() for u in vals]
        lo = np.fromiter(
            (int.from_bytes(dg[8:16], "little") for dg in digs),
            dtype=np.uint64, count=len(digs),
        )
        hi = np.fromiter(
            (int.from_bytes(dg[0:8], "little") for dg in digs),
            dtype=np.uint64, count=len(digs),
        )
        return lo, hi


def _md5_u64_unique(uniq: pa.Array) -> np.ndarray:
    """md5_number_lower over an array of (unique) strings, order-preserved."""
    try:
        con, lock = _md5_con()
        tbl = pa.table({"s": uniq})
        # the shared view name makes register->execute a critical section
        # (Ray tasks are single-threaded, but this repo does run concurrent
        # Dataset executions from driver threads — e.g. the docmap sidecar)
        with lock:
            con.register("md5_in", tbl)
            out = con.execute(
                "SELECT md5_number_lower(s) AS h FROM md5_in"
            ).arrow()
            con.unregister("md5_in")
        return out["h"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.uint64)
    except ImportError:  # duckdb absent: same values, Python rate
        import hashlib

        vals = uniq.to_pylist()
        return np.fromiter(
            (
                int.from_bytes(hashlib.md5(u.encode()).digest()[8:16], "little")
                for u in vals
            ),
            dtype=np.uint64,
            count=len(vals),
        )


_MD5_CON = None
import threading as _threading

#: created at import so the lazy connection init itself is synchronized —
#: an unlocked check-then-act here could hand two first-call driver
#: threads different locks around the SAME connection
_MD5_LOCK = _threading.Lock()


def _md5_con():
    """Process-cached DuckDB connection, pinned to one thread (each Ray
    map_batches worker owns one CPU slot; insertion-order preservation is
    on by default, which the positional gather in md5_u64 relies on)."""
    global _MD5_CON
    with _MD5_LOCK:
        if _MD5_CON is None:
            import duckdb

            con = duckdb.connect()
            con.execute("SET threads=1")
            _MD5_CON = con  # publish only after it is fully configured
    return _MD5_CON, _MD5_LOCK
