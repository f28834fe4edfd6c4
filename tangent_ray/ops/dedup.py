"""Deduplication operators: exact, n-gram shingle, MinHash+LSH, SimHash.

All are Ray-Data-first: vectorized per-batch signature computation, then ONE
shuffle, then vectorized candidate emission. The shuffle key is never the
raw bucket/content key (bucket groups are O(corpus) and a per-group Python
call costs ~0.5 ms — measured: 419 s for 100k groups): exact dedup folds
with built-in Min/Count aggregates, and the pair generators group by a
FIXED hash shard of the bucket key, each shard processing all its bucket
runs in one sorted pass. The reference's only dedup is exact-expression
first-wins (``dictExpressions``, ``mathindex.cpp:336-355``); these
generalize it to the operations a training-data pipeline needs at 100 TB.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from tangent_ray.tokenize.text import split_tokens
from tangent_ray.util import DEFAULT_SHARDS, actor_pool, shard_column

logger = logging.getLogger(__name__)

# A shingle/bucket group larger than this emits pairs for only the first
# PAIR_GROUP_CAP (sorted) ids — O(g^2) emission on a hot group (boilerplate
# shared by 100k docs) would otherwise explode the pipeline's biggest
# intermediate. Truncation is logged, never silent.
PAIR_GROUP_CAP = 1024

def _capped_unique_ids(ids: np.ndarray, cap: int, what: str) -> np.ndarray:
    """Sorted unique ids of one candidate group, capped with a logged drop."""
    ids = np.unique(ids)
    if len(ids) > cap:
        logger.warning(
            "%s: hot group of %d docs capped to %d (%d dropped from pair emission)",
            what, len(ids), cap, len(ids) - cap,
        )
        ids = ids[:cap]
    return ids


def _distinct_pairs(cand, id_cols: list[str]):
    """Distinct rows via the built-in groupby-count (no Python per group)."""
    return cand.groupby(id_cols).count().select_columns(id_cols)


def _dual_hash(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The package's ONE 128-bit dedup key: two independently-keyed
    vectorized C siphashes over a string array (deterministic across
    processes; the key only ever keys equality groupbys, so the function
    choice is free — per-row Python hashing of full payload bytes would
    dominate the dedup pipeline).

    Two 64-bit halves, not one: a single 64-bit key reaches birthday
    collision odds ~40% at 4x10^9 items — a colliding pair of DISTINCT
    items would silently merge and one would be flagged a duplicate. At
    128 bits the same odds are ~1e-20 at 10^12 items. Shared by content
    (doc) and paragraph dedup so the key can only ever change in one
    place."""
    import pandas as pd

    h1 = pd.util.hash_array(values).astype(np.uint64)
    h2 = pd.util.hash_array(values, hash_key="tangent_ray_dup2").astype(np.uint64)
    return h1, h2


def content_hash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """128-bit whole-document content hash rows (see ``_dual_hash``)."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    h1, h2 = _dual_hash(texts)
    return pa.table(
        {
            id_col: batch[id_col],
            "content_hash": pa.array(h1.astype(np.int64), type=pa.int64()),
            "content_hash2": pa.array(h2.astype(np.int64), type=pa.int64()),
        }
    )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: first-wins by minimum id per identical content.

    Returns (id, dups) — the kept id and the duplicate count per content
    group. The groupby key is the 128-bit content hash (narrow shuffle: the
    text itself never moves) and the fold is BUILT-IN Min/Count aggregates
    — no Python runs per group (content groups are O(corpus)); the
    analogue of the reference's global first-occurrence expression dedup
    with "first" defined by data order, not arrival (SURVEY §2.7 D1)."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col, id_col), batch_format="pyarrow"
    )
    agg = hashed.groupby(["content_hash", "content_hash2"]).aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="dups")
    )

    def strip(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "dups": pc.cast(batch["dups"], pa.int64()),
            }
        )

    return agg.map_batches(strip, batch_format="pyarrow", batch_size=65536)


# ---------------------------------------------------------------------------
# token shingles


def shingle_batch(
    batch: pa.Table, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """(id, shingle) rows: token n-grams joined by a single space (shared
    definition with the DuckDB oracle).

    Fully vectorized: the flat token array is sliced n times (zero-copy
    views offset by 0..n-1), joined with one Arrow
    ``binary_join_element_wise`` kernel call, and masked to windows that
    stay within one document — no Python loop touches a token."""
    import pyarrow.compute as pc

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, tokens, _ = split_tokens(texts)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    m = len(parents)
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "shingle": pa.array([], type=pa.string()),
        }
    )
    if m < n:
        return empty
    L = m - n + 1
    valid = parents[:L] == parents[n - 1 :]
    if not valid.any():
        return empty
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    parts = [tokens.slice(k, L) for k in range(n)]
    joined = pc.binary_join_element_wise(*parts, " ")
    keep = pa.array(valid)
    return pa.table(
        {
            id_col: pa.array(
                ids[parents[:L][valid]].astype(np.int64), type=pa.int64()
            ),
            "shingle": joined.filter(keep),
        }
    )


def _pair_table(ids: np.ndarray) -> pa.Table:
    a, b = np.triu_indices(len(ids), k=1)
    return pa.table(
        {
            "doc_a": pa.array(ids[a], type=pa.int64()),
            "doc_b": pa.array(ids[b], type=pa.int64()),
        }
    )


_EMPTY_PAIRS = pa.table(
    {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())}
)


def shingle_candidates(ds, n: int = 5, text_col: str = "text", id_col: str = "doc_id",
                       group_cap: int = PAIR_GROUP_CAP,
                       shards: int = DEFAULT_SHARDS):
    """Distinct doc pairs (a < b) sharing at least one token n-gram.

    The shuffle key is a FIXED hash shard of the shingle, not the shingle
    itself: shingle groups are O(vocabulary) and a per-group Python call
    costs ~0.5 ms; each shard instead processes all its shingle runs in
    one sorted pass (the same shape as ``jaccard_pairs``)."""
    def shard_shingles(batch: pa.Table) -> pa.Table:
        return shard_column(shingle_batch(batch, n, text_col, id_col),
                            ["shingle"], shards)

    sh = ds.map_batches(shard_shingles, batch_format="pyarrow")

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _EMPTY_PAIRS
        shingles = g["shingle"].to_numpy(zero_copy_only=False)
        order = np.argsort(shingles, kind="stable")
        shingles = shingles[order]
        docs = g[id_col].to_numpy(zero_copy_only=False)[order]
        starts = np.flatnonzero(
            np.concatenate([[True], shingles[1:] != shingles[:-1]])
        )
        ends = np.append(starts[1:], len(shingles))
        out_a, out_b = [], []
        for st, en in zip(starts, ends):
            ids = _capped_unique_ids(docs[st:en], group_cap, "shingle_candidates")
            if len(ids) < 2:
                continue
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if not out_a:
            return _EMPTY_PAIRS
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            }
        )

    cand = sh.groupby("shard").map_groups(per_shard, batch_format="pyarrow")
    return _distinct_pairs(cand, ["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# MinHash + LSH


class MinHashLSH:
    """Per-batch MinHash signatures exploded to (band, band_hash, id) rows.

    num_perm permutations via the multiply-shift uint64 family (odd ``a``,
    arithmetic mod 2^64 — pure numpy, no Python bigints); bands of rows;
    near-duplicates collide in >= 1 band. The follow-up
    ``groupby(["band","band_hash"])`` is the only shuffle. Per-doc minima
    come from one ``np.minimum.reduceat`` over the batch's doc-sorted
    shingle rows; band hashes are a vectorized FNV-style column fold —
    no per-doc Python loop anywhere.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col
        rng = np.random.RandomState(42)
        a = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
        self.a = (a << np.uint64(1)) | np.uint64(1)  # odd multipliers
        self.b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """Signature of ONE shingle set (kept for tests/direct use)."""
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, np.iinfo(np.int64).max, dtype=np.int64)
        x = shingle_hashes.astype(np.uint64)[:, None]
        with np.errstate(over="ignore"):
            vals = self.a[None, :] * x + self.b[None, :]
        return (np.min(vals, axis=0) >> np.uint64(1)).astype(np.int64)

    def _band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(n_docs, num_perm) int64 signatures -> (n_docs, bands) int64."""
        u = sigs.astype(np.uint64).reshape(-1, self.bands, self.rows_per_band)
        prime = np.uint64(0x100000001B3)
        h = np.full((u.shape[0], self.bands), np.uint64(0xCBF29CE484222325))
        with np.errstate(over="ignore"):
            for r in range(self.rows_per_band):
                h = (h ^ u[:, :, r]) * prime
        return (h >> np.uint64(1)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tangent_ray.tokenize.text import md5_u64

        sh = shingle_batch(batch, self.shingle_n, self.text_col, self.id_col)
        ids = sh[self.id_col].to_numpy(zero_copy_only=False)
        # portable shingle hash (= DuckDB md5_number_lower; unique values
        # only) so signatures are engine-independent and SQL-twinnable
        hashes = md5_u64(sh["shingle"])
        if len(ids) == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                }
            )
        # doc-sorted segments -> per-doc minima, one contiguous 1-D
        # multiply-add + reduceat per permutation (the 2-D axis-0 reduceat
        # takes numpy's slow path and a 200 MB temporary at realistic batch
        # sizes)
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        hs = hashes[order]
        starts = np.flatnonzero(np.diff(ids_s, prepend=ids_s[0] - 1))
        uniq = ids_s[starts]
        sigs = np.empty((len(uniq), self.num_perm), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(self.num_perm):
                v = self.a[j] * hs + self.b[j]
                sigs[:, j] = np.minimum.reduceat(v, starts)
        sigs = (sigs >> np.uint64(1)).astype(np.int64)
        bh = self._band_hashes(sigs)  # (n_docs, bands)
        n_docs = len(uniq)
        return pa.table(
            {
                self.id_col: pa.array(
                    np.repeat(uniq.astype(np.int64), self.bands), type=pa.int64()
                ),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n_docs),
                    type=pa.int32(),
                ),
                "band_hash": pa.array(bh.ravel(), type=pa.int64()),
            }
        )


def minhash_candidates(ds, num_perm: int = 64, bands: int = 16, shingle_n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       group_cap: int = PAIR_GROUP_CAP,
                       shards: int = DEFAULT_SHARDS):
    """Candidate near-duplicate pairs via MinHash LSH banding."""
    sigs = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_n=shingle_n,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=actor_pool(),
    )

    # fixed hash shards of the (band, band_hash) bucket space — bucket
    # groups are O(docs x bands), so per-group Python calls are the wrong
    # granularity; each shard processes all its bucket runs in one sorted
    # vectorized pass

    def add_shard(batch: pa.Table) -> pa.Table:
        return shard_column(batch, ["band", "band_hash"], shards)

    def per_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _EMPTY_PAIRS
        band = g["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = g["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        docs = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((bh, band))
        band, bh, docs = band[order], bh[order], docs[order]
        new = np.concatenate(
            [[True], (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])]
        )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(docs))
        out_a, out_b = [], []
        for st, en in zip(starts, ends):
            ids = _capped_unique_ids(docs[st:en], group_cap, "minhash_candidates")
            if len(ids) < 2:
                continue
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if not out_a:
            return _EMPTY_PAIRS
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            }
        )

    cand = (
        sigs.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(per_shard, batch_format="pyarrow")
    )
    return _distinct_pairs(cand, ["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# SimHash


def simhash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash over token hashes (tf-weighted bit votes)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    from tangent_ray.tokenize.text import md5_u64

    parents, tokens, _ = split_tokens(texts)
    # portable token hash (= DuckDB md5_number_lower; see md5_u64) so the
    # signature has an exact SQL oracle twin and survives engine swaps
    th = md5_u64(tokens)
    votes = np.zeros((len(texts), 64), dtype=np.int64)
    if len(parents):
        # parents is doc-ordered (split_tokens), so per-doc vote sums are
        # one reduceat over contiguous runs — no np.add.at scatter.
        # unpackbits gives the (n_tok, 64) bit matrix as ONE uint8 C pass
        # (column b = bit b of the little-endian uint64); the broadcast-shift
        # formulation materialized 3 int64 temporaries 8x this size, and
        # their first-touch page faults dominated the whole kernel.
        bits = np.unpackbits(
            th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        starts = np.flatnonzero(
            np.concatenate([[True], parents[1:] != parents[:-1]])
        )
        ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
        cnt = np.diff(np.append(starts, len(parents)))
        votes[parents[starts]] = 2 * ones - cnt[:, None]
    sim = (votes > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return pa.table(
        {
            id_col: batch[id_col],
            "simhash": pa.array(sim.astype(np.int64), type=pa.int64()),
        }
    )


def jaccard_pairs(ds, n: int = 4, threshold: float = 0.0,
                  text_col: str = "text", id_col: str = "doc_id",
                  shards: int = DEFAULT_SHARDS,
                  group_cap: int = PAIR_GROUP_CAP):
    """Exact token n-gram Jaccard similarity for every doc pair sharing at
    least one shingle: |A∩B| / (|A|+|B|-|A∩B|) over DISTINCT shingle sets.

    Shape (one wide shuffle + one small pair aggregate, Arrow end-to-end,
    nothing on the driver): per-batch distinct (doc, shingle) rows carry the
    doc's distinct-shingle count ``sz`` (computable batch-locally — a doc's
    text is one input row, so all its shingles are in one batch) and a
    deterministic shingle-hash shard key. Each shard group explodes its
    shingle runs into candidate pairs with numpy; the global
    ``groupby([doc_a, doc_b, sz_a, sz_b]).Sum(i)`` folds per-shard partial
    intersection counts (sizes are functions of the doc ids, so widening the
    key changes nothing); the final map computes i/(sz_a+sz_b-i). The exact
    counterpart of the MinHash estimate (reference has no near-dup ops,
    SURVEY §2.7).
    """
    from ray.data.aggregate import Sum

    empty_sh = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "shingle": pa.array([], type=pa.string()),
            "sz": pa.array([], type=pa.int64()),
            "shard": pa.array([], type=pa.int32()),
        }
    )

    def shard_shingles(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = shingle_batch(batch, n, text_col, id_col)
        if t.num_rows == 0:
            return empty_sh
        # distinct (doc, shingle) + per-doc distinct count, one fused-key
        # unique over dictionary codes (docs never span input batches);
        # routing via the shared shard_column definition
        sh_col = t["shingle"]
        if isinstance(sh_col, pa.ChunkedArray):
            sh_col = sh_col.combine_chunks()
        d = pc.dictionary_encode(sh_col)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uids, inv = np.unique(ids, return_inverse=True)
        nv = len(d.dictionary)
        ukey = np.unique(inv.astype(np.int64) * nv + codes)
        doc_i = (ukey // nv).astype(np.int64)
        code_i = ukey % nv
        sz = np.bincount(doc_i, minlength=len(uids)).astype(np.int64)
        out = pa.table(
            {
                id_col: pa.array(uids[doc_i], type=pa.int64()),
                "shingle": pc.take(d.dictionary, pa.array(code_i)),
                "sz": pa.array(sz[doc_i], type=pa.int64()),
            }
        )
        return shard_column(out, ["shingle"], shards)

    sh = ds.map_batches(shard_shingles, batch_format="pyarrow")

    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "sz_a": pa.array([], type=pa.int64()),
            "sz_b": pa.array([], type=pa.int64()),
            "i": pa.array([], type=pa.int64()),
        }
    )

    def shard_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        shingles = g["shingle"].to_numpy(zero_copy_only=False)
        order = np.argsort(shingles, kind="stable")
        docs = g[id_col].to_numpy(zero_copy_only=False)[order]
        szs = g["sz"].to_numpy(zero_copy_only=False)[order]
        shingles = shingles[order]
        starts = np.flatnonzero(
            np.concatenate([[True], shingles[1:] != shingles[:-1]])
        )
        ends = np.append(starts[1:], len(shingles))
        out_a, out_b, out_sa, out_sb = [], [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            # deterministic doc order BEFORE any capping, so a hot shingle
            # keeps its smallest group_cap doc ids (not input order)
            o = np.argsort(docs[s:e], kind="stable")
            ids = docs[s:e][o]
            sz = szs[s:e][o]
            if len(ids) > group_cap:
                # pairs among the kept docs stay exact; pairs involving a
                # dropped doc lose this shingle from their intersection
                # count, biasing their Jaccard LOW (they may fall under
                # `threshold`) — inherent to bounding an O(g^2) hot group
                logger.warning(
                    "jaccard_pairs: hot shingle with %d docs capped to the "
                    "%d smallest ids (%d dropped; surviving pairs with a "
                    "dropped doc undercount this shingle)",
                    len(ids), group_cap, len(ids) - group_cap,
                )
                ids = ids[:group_cap]
                sz = sz[:group_cap]
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
            out_sa.append(sz[a])
            out_sb.append(sz[b])
        if not out_a:
            return empty
        import pandas as pd

        df = pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "sz_a": np.concatenate(out_sa),
                "sz_b": np.concatenate(out_sb),
            }
        )
        # partial per-shard intersection counts (a pair reappears in other
        # shards through different shingles; the Sum aggregate folds them)
        part = (
            df.groupby(["doc_a", "doc_b", "sz_a", "sz_b"], as_index=False)
            .size()
            .rename(columns={"size": "i"})
        )
        return pa.Table.from_pandas(part, preserve_index=False).cast(empty.schema)

    inter = (
        sh.groupby("shard").map_groups(shard_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b", "sz_a", "sz_b"])
        .aggregate(Sum("i", alias_name="i"))
    )

    def to_jaccard(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        sa = batch["sz_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        sb = batch["sz_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = i / (sa + sb - i)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep], type=pa.int64()),
                "doc_b": pa.array(b[keep], type=pa.int64()),
                "jaccard": pa.array(j[keep], type=pa.float64()),
            }
        )

    return inter.map_batches(to_jaccard, batch_format="pyarrow")


def connected_components(pairs, nodes, id_a: str = "doc_a", id_b: str = "doc_b",
                         node_col: str = "doc_id", max_iters: int = 64,
                         num_partitions: int = 16):
    """Duplicate clusters from a candidate-pair graph: connected components
    by iterative min-label propagation.

    Returns a Dataset of ``(doc_id, cluster)`` for EVERY node in ``nodes``
    (singletons label themselves); ``cluster`` is the component's minimum
    doc id. Edge endpoints absent from ``nodes`` still relay labels but are
    excluded from the output (membership flag carried through the rounds).

    Each round is fully vectorized — no per-group Python:

    1. one hash join ships every node's current label to its out-edges
       (the neighbor messages);
    2. the messages union the nodes' own rows and one ``groupby(node)``
       Min/Max aggregate folds the new label while carrying the old label
       and the membership flag;
    3. a batched map normalizes the frontier and a one-row aggregate gives
       the changed count (keys materialized purely from neighbor messages
       count as changed, else the loop could converge a round early
       through a relay).

    Labels only decrease, so rounds needed equal the graph diameter
    (near-dup graphs are shallow: clusters are quasi-cliques from shared
    shingles/bands). Star-contraction would cut worst-case chains to
    O(log n) rounds with the same per-round plumbing. Every round
    materializes the O(V) frontier so lineage stays flat.

    Engine note: this Ray version's hash-shuffle aggregate emits empty
    blocks with a NULL schema, and a downstream hash join whose partition
    assembles only such blocks fails in Acero ("No match ... FieldRef on
    right side"). The frontier therefore re-batches through a
    ``map_batches(..., batch_size=...)`` normalizer each round — batching
    coalesces rows across blocks, so schema-less empties never reach the
    next join.
    """
    from ray.data.aggregate import Max, Min

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    edges = pairs.map_batches(
        to_edges, batch_format="pyarrow", batch_size=65536
    ).materialize()
    have_edges = edges.count() > 0

    def to_labels(batch: pa.Table) -> pa.Table:
        ids = batch[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(ids, type=pa.int64()),
                "label": pa.array(ids, type=pa.int64()),
                "member": pa.array(np.ones(len(ids), np.int64), type=pa.int64()),
            }
        )

    labels = nodes.map_batches(
        to_labels, batch_format="pyarrow", batch_size=65536
    ).materialize()

    def nbr_msgs(batch: pa.Table) -> pa.Table:
        # neighbor message: dst inherits src's label; sentinel own/member
        n = batch.num_rows
        return pa.table(
            {
                "node": batch["dst"],
                "label": batch["label"],
                "own": pa.array(np.full(n, -1, np.int64), type=pa.int64()),
                "member": pa.array(np.full(n, -1, np.int64), type=pa.int64()),
            }
        )

    def self_msgs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "label": batch["label"],
                "own": batch["label"],
                "member": batch["member"],
            }
        )

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "label": batch["label"],
                "member": batch["member"],
            }
        )

    def delta(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False)
        own = batch["own"].to_numpy(zero_copy_only=False)
        changed = int(((own < 0) | (lab < own)).sum())
        return pa.table({"changed": pa.array([changed], pa.int64())})

    for _ in range(max_iters if have_edges else 0):
        nbr = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        ).map_batches(nbr_msgs, batch_format="pyarrow", batch_size=65536)
        own = labels.map_batches(
            self_msgs, batch_format="pyarrow", batch_size=65536
        )
        folded = (
            nbr.union(own)
            .groupby("node")
            .aggregate(
                Min("label", alias_name="label"),
                Max("own", alias_name="own"),
                Max("member", alias_name="member"),
            )
            .materialize()
        )
        changed = folded.map_batches(
            delta, batch_format="pyarrow", batch_size=65536
        ).sum("changed")
        labels = folded.map_batches(
            norm, batch_format="pyarrow", batch_size=65536
        ).materialize()
        if not changed:
            break
    else:
        if have_edges and changed:
            logger.warning(
                "connected_components: max_iters=%d exhausted with %d labels "
                "still propagating — components with diameter > max_iters "
                "carry SPLIT cluster ids; raise max_iters",
                max_iters, changed,
            )

    def out(batch: pa.Table) -> pa.Table:
        keep = batch["member"].to_numpy(zero_copy_only=False) == 1
        batch = batch.filter(pa.array(keep))
        return pa.table(
            {
                node_col: batch["node"],
                "cluster": pc.cast(batch["label"], pa.int64()),
            }
        )

    import pyarrow.compute as pc

    return labels.map_batches(out, batch_format="pyarrow", batch_size=65536)

def simhash_pairs(ds, max_hamming: int = 3, n_bands: int = 4,
                  text_col: str = "text", id_col: str = "doc_id",
                  group_cap: int = PAIR_GROUP_CAP,
                  shards: int = DEFAULT_SHARDS):
    """SimHash near-duplicate pairs: doc pairs whose 64-bit SimHash
    signatures differ in at most ``max_hamming`` bits.

    The banding pigeonhole makes it exact for ``max_hamming < n_bands``:
    two signatures within the Hamming radius agree on at least one of the
    ``n_bands`` 16-bit bands, so candidates are found by ONE
    ``groupby((band, band_bits))`` shuffle, and each group verifies its
    (capped) candidates with a vectorized XOR-popcount. Distinctness of
    pairs found in several bands comes from the same built-in groupby
    used by the other candidate generators.
    """
    assert max_hamming < n_bands, "pigeonhole needs max_hamming < n_bands"
    band_width = 64 // n_bands
    mask = np.uint64((1 << band_width) - 1)

    def explode(batch: pa.Table) -> pa.Table:
        sig = simhash_batch(batch, text_col, id_col)
        ids = sig[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = sig["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        bands = np.repeat(np.arange(n_bands, dtype=np.int32), n)
        shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(band_width))
        bits = ((np.tile(h, n_bands) >> np.repeat(shifts, n)) & mask).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.tile(ids, n_bands), type=pa.int64()),
                "simhash": pa.array(np.tile(h.astype(np.int64), n_bands), type=pa.int64()),
                "band": pa.array(bands, type=pa.int32()),
                "band_bits": pa.array(bits, type=pa.int64()),
            }
        )

    # fixed hash shards of the (band, band_bits) bucket space (bucket
    # groups are O(docs); per-group Python is the wrong granularity)

    def add_shard(batch: pa.Table) -> pa.Table:
        return shard_column(batch, ["band", "band_bits"], shards)

    exploded = ds.map_batches(explode, batch_format="pyarrow").map_batches(
        add_shard, batch_format="pyarrow"
    )
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)

    def verify_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _EMPTY_PAIRS
        band = g["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bits = g["band_bits"].to_numpy(zero_copy_only=False).astype(np.int64)
        docs = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((docs, bits, band))
        band, bits, docs, hs = band[order], bits[order], docs[order], hs[order]
        new = np.concatenate(
            [[True], (band[1:] != band[:-1]) | (bits[1:] != bits[:-1])]
        )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(docs))
        out_a, out_b = [], []
        for st, en in zip(starts, ends):
            ids = docs[st:en]
            h = hs[st:en]
            keep_first = np.concatenate([[True], ids[1:] != ids[:-1]])
            ids, h = ids[keep_first], h[keep_first]
            if len(ids) > group_cap:
                logger.warning(
                    "simhash_pairs: hot band bucket of %d docs capped to %d",
                    len(ids), group_cap,
                )
                ids, h = ids[:group_cap], h[:group_cap]
            if len(ids) < 2:
                continue
            a, b = np.triu_indices(len(ids), k=1)
            x = h[a] ^ h[b]
            ham = lut[x.view(np.uint8).reshape(len(x), 8)].sum(1)
            ok = ham <= max_hamming
            out_a.append(ids[a[ok]])
            out_b.append(ids[b[ok]])
        if not out_a:
            return _EMPTY_PAIRS
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            }
        )

    cand = exploded.groupby("shard").map_groups(
        verify_shard, batch_format="pyarrow"
    )
    return _distinct_pairs(cand, ["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# Paragraph-level cross-document dedup


def paragraph_hash_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Explode each document into its non-empty paragraphs (split on a
    blank line, i.e. LF LF) and emit one NARROW row per paragraph:
    (id, para_idx, phash, phash2). ``para_idx`` is the paragraph's 1-based
    position among ALL splits of its document (empties included), so the
    index is stable under the dedup itself. The 128-bit dual-siphash key
    is the shared ``_dual_hash`` — paragraph TEXT never leaves the map
    task, so the downstream shuffle moves 28 B per paragraph regardless of
    paragraph size."""
    import pyarrow.compute as pc

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(pc.coalesce(texts, ""), "\n\n")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    idx1 = np.arange(len(flat), dtype=np.int64) - offsets[parents] + 1
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parents, idx1 = parents[keep], idx1[keep]
    paras = flat.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False)[parents]
    h1, h2 = _dual_hash(paras)
    return pa.table(
        {
            id_col: pa.array(ids.astype(np.int64), type=pa.int64()),
            "para_idx": pa.array(idx1, type=pa.int64()),
            "phash": pa.array(h1.astype(np.int64), type=pa.int64()),
            "phash2": pa.array(h2.astype(np.int64), type=pa.int64()),
        }
    )


def _mark_first_paras(g: pa.Table, id_col: str) -> pa.Table:
    """Within one hash shard: keep = this row is the global first
    occurrence (min (id, para_idx)) of its (phash, phash2) group. All rows
    of a hash group land in one shard, so the flag is final here. One
    lexsort, no Python per group."""
    if g.num_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "para_idx": pa.array([], type=pa.int64()),
                "keep": pa.array([], type=pa.bool_()),
            }
        )
    ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    idx = g["para_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    h1 = g["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
    h2 = g["phash2"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((idx, ids, h2, h1))
    sh1, sh2 = h1[order], h2[order]
    first = np.concatenate(
        [[True], (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1])]
    )
    keep = np.empty(len(first), dtype=bool)
    keep[order] = first
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "para_idx": pa.array(idx, type=pa.int64()),
            "keep": pa.array(keep, type=pa.bool_()),
        }
    )


def paragraph_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                    shards: int | None = None):
    """Corpus-wide paragraph dedup flags — the paragraph-granularity
    analogue of exact substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a paragraph is kept only
    at its first occurrence across the WHOLE corpus, first = minimum
    (id, para_idx).

    Returns (id, para_idx, keep) per non-empty paragraph. ONE narrow
    shuffle, keyed by the 128-bit paragraph hash (28 B/paragraph — size
    ``shards`` so one shard group fits a worker heap: shards ~
    n_paragraphs x 28 B / 1 GB); the
    rebuild (filter each document's paragraphs by the flags) composes as a
    hash_join on (id) followed by an in-doc sort — kept separate so the
    flags table can also drive audits without touching payload bytes.
    """
    from tangent_ray.util import DEFAULT_SHARDS, shard_column

    nsh = shards or DEFAULT_SHARDS
    return (
        ds.map_batches(
            lambda b: paragraph_hash_batch(b, text_col, id_col),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda b: shard_column(b, ["phash", "phash2"], nsh),
            batch_format="pyarrow",
        )
        .groupby("shard")
        .map_groups(
            lambda g: _mark_first_paras(g, id_col), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------------------
# Exact substring-window dedup (Lee et al. 2022, arXiv:2107.06499)

#: odd multipliers -> invertible mod 2^64, so the rolling hash is O(n);
#: two independent 64-bit keys = the package's standard 128-bit dedup key
#: (a single 64-bit window hash WOULD collide at 100 TB: ~2e13 windows
#: -> millions of birthday pairs, each falsely cutting a w-token span)
_ROLL_R = np.uint64(0x9E3779B97F4A7C15 | 1)
_ROLL_R2 = np.uint64(0xC2B2AE3D27D4EB4F | 1)


def _rolling_window_keys(th: np.ndarray, w: int,
                         r: np.uint64 = _ROLL_R) -> np.ndarray:
    """64-bit polynomial rolling hash of every w-token window of one
    document's token-hash array: key_i = sum_{j<w} th[i+j] * r^j (mod 2^64)
    = (S[i+w] - S[i]) * r^-i, with S the prefix sum of th[j] * r^j. All
    arithmetic is native uint64 wraparound -> one vectorized pass whatever
    ``w`` is (the chained-combine alternative costs w passes)."""
    n = len(th)
    if n < w:
        return np.empty(0, np.uint64)
    rinv_c = np.uint64(pow(int(r), -1, 2**64))
    with np.errstate(over="ignore"):
        rpow = np.empty(n + 1, np.uint64)
        rpow[0] = 1
        np.multiply.accumulate(np.full(n, r), out=rpow[1:])
        s = np.empty(n + 1, np.uint64)
        s[0] = 0
        np.cumsum(th * rpow[:n], out=s[1:])
        rinv = np.empty(n - w + 1, np.uint64)
        rinv[0] = 1
        np.multiply.accumulate(np.full(n - w, rinv_c), out=rinv[1:])
        key = (s[w:] - s[: n - w + 1]) * rinv
        # splitmix finalizer: the raw polynomial is linear in the inputs
        key = (key ^ (key >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        key = (key ^ (key >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return key ^ (key >> np.uint64(31))


_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _winnow_select(keys: np.ndarray, valid: np.ndarray, s: int) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer et al. 2003, MOSS):
    position i is selected iff its key is the minimum of SOME s-window of
    consecutive positions containing i. Content-defined, so two copies of
    a duplicated substring select the SAME windows whatever their offsets
    — a fixed ``pos % s`` stride would miss every dup pair whose copies
    are misaligned mod s. Guarantee: every duplicated substring of
    >= w + s - 1 tokens shares >= s consecutive key positions, and the min
    of that full s-window is selected in both copies.

    Invalid positions (cross-document windows) read as +inf; docs are
    separated by >= s - 1 such positions (enforced by ``stride <= w``), and
    the flat array is padded with s - 1 +inf keys per side, so selection
    near every document's edges is identical whatever batch the doc landed
    in. Vectorized: 2s shifted-min/max passes, no Python per position."""
    m = len(keys)
    if s <= 1 or m == 0:
        return valid.copy()
    pad = np.full(s - 1, _U64_MAX, dtype=np.uint64)
    k = np.concatenate([pad, np.where(valid, keys, _U64_MAX), pad])
    # wmin[t] = min(k[t : t+s]), t in [0, m + s - 1)
    nt = m + s - 1
    wmin = k[:nt].copy()
    for j in range(1, s):
        np.minimum(wmin, k[j : j + nt], out=wmin)
    # selected[i] <=> max(wmin[t] for windows containing i) == keys[i]
    # (wmin[t] <= k[i] for every containing t, so equality <=> some window
    # has i as its minimum)
    wmax = wmin[: m].copy()
    for j in range(1, s):
        np.maximum(wmax, wmin[j : j + m], out=wmax)
    return valid & (wmax == keys)


def window_hash_batch(batch: pa.Table, w: int = 50, stride: int = 1,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """One NARROW row (id, pos, whash) per SELECTED w-token window of each
    document (shared ``[^a-z0-9]+``-on-lower tokenizer). ``stride=1``
    keeps every window — the exact substring-dedup granularity;
    ``stride=s`` winnows to local-min fingerprints (~2/(s+1) of positions)
    and still detects every duplicated substring of >= w + stride - 1
    tokens at ANY alignment — the scale knob for the O(total tokens)
    shuffle this op implies (Lee et al. use suffix arrays on one box; a
    rolling-hash window shuffle is the distributed equivalent). Window
    TEXT never leaves the map task."""
    if not 1 <= stride <= w:
        raise ValueError("stride must be in [1, w]")
    from tangent_ray.tokenize.text import md5_u64, split_tokens

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, tokens, _ = split_tokens(texts)
    th = md5_u64(tokens)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
            "whash": pa.array([], type=pa.int64()),
            "whash2": pa.array([], type=pa.int64()),
        }
    )
    n = len(th)
    if n < w:
        return empty
    # ONE rolling-hash pass over the whole flat token stream, then mask out
    # windows that cross a document boundary — no per-doc Python loop
    keys = _rolling_window_keys(th, w)
    keys2 = _rolling_window_keys(th, w, _ROLL_R2)
    wp = parents[: n - w + 1]
    first = np.searchsorted(parents, wp, side="left")  # doc's flat start
    pos = np.arange(n - w + 1, dtype=np.int64) - first
    valid = parents[w - 1 :] == wp
    keep = _winnow_select(keys, valid, stride)
    if not keep.any():
        return empty
    return pa.table(
        {
            id_col: pa.array(ids[wp[keep]], type=pa.int64()),
            "pos": pa.array(pos[keep], type=pa.int64()),
            "whash": pa.array(
                keys[keep].astype(np.int64), type=pa.int64()
            ),
            "whash2": pa.array(
                keys2[keep].astype(np.int64), type=pa.int64()
            ),
        }
    )


def _mark_dup_windows(g: pa.Table, id_col: str) -> pa.Table:
    """Within one hash shard: drop = the window's whash group has >= 2
    members and this row is NOT its minimum (id, pos). Emits ONLY dropped
    windows (dup spans are rare; the kept majority would dominate the
    output otherwise)."""
    if g.num_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
            }
        )
    ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = g["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = g["whash"].to_numpy(zero_copy_only=False).astype(np.int64)
    h2 = g["whash2"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((pos, ids, h2, h))
    sh, sh2 = h[order], h2[order]
    first = np.concatenate([[True], (sh[1:] != sh[:-1]) | (sh2[1:] != sh2[:-1])])
    drop_sorted = ~first
    drop = np.empty(len(first), dtype=bool)
    drop[order] = drop_sorted
    return pa.table(
        {
            id_col: pa.array(ids[drop], type=pa.int64()),
            "pos": pa.array(pos[drop], type=pa.int64()),
        }
    )


def merge_window_spans(flags: pa.Table, w: int,
                       id_col: str = "doc_id") -> pa.Table:
    """Collapse dropped windows (id, pos) into per-doc merged token spans
    [tok_start, tok_end): windows overlapping or touching chain into one
    span. Vectorized: one lexsort over the (bounded: dup windows only)
    flag table, boundary = new doc or gap > w."""
    if flags.num_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "tok_start": pa.array([], type=pa.int64()),
                "tok_end": pa.array([], type=pa.int64()),
            }
        )
    ids = flags[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = flags["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((pos, ids))
    sid, spos = ids[order], pos[order]
    new = np.concatenate(
        [[True], (sid[1:] != sid[:-1]) | (spos[1:] > spos[:-1] + w)]
    )
    starts = np.flatnonzero(new)
    ends = np.concatenate([starts[1:], [len(sid)]]) - 1
    return pa.table(
        {
            id_col: pa.array(sid[starts], type=pa.int64()),
            "tok_start": pa.array(spos[starts], type=pa.int64()),
            "tok_end": pa.array(spos[ends] + w, type=pa.int64()),
        }
    )


def window_dedup(ds, w: int = 50, stride: int = 1, text_col: str = "text",
                 id_col: str = "doc_id", shards: int | None = None):
    """Exact substring-window dedup: every w-token window that appeared
    earlier anywhere in the corpus (earlier = smaller (id, pos)) is flagged
    for removal, and flagged windows merge into per-doc token spans
    ``(id, tok_start, tok_end)`` ready to cut (the cut itself composes as a
    tokenize + span-mask map over the corpus).

    Cost model at 100 TB: the window shuffle is O(total tokens / stride)
    rows x 28 B — narrow but token-rate; crank ``stride`` (detects dups of
    length >= w + stride - 1) and size ``shards`` so one shard group fits a
    worker heap: shards ~ (tokens / stride) x 28 B / 1 GB (e.g. 2e13 tokens
    at stride 10 -> ~56k shards; a map_groups group materializes whole).
    The span-merge reshuffle only moves DUPLICATED windows, which is
    boilerplate-rate, not corpus-rate."""
    from tangent_ray.util import DEFAULT_SHARDS, shard_column

    nsh = shards or DEFAULT_SHARDS
    flags = (
        ds.map_batches(
            lambda b: window_hash_batch(b, w, stride, text_col, id_col),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda b: shard_column(b, ["whash", "whash2"], nsh),
            batch_format="pyarrow",
        )
        .groupby("shard")
        .map_groups(lambda g: _mark_dup_windows(g, id_col),
                    batch_format="pyarrow")
    )
    return (
        flags.map_batches(
            lambda b: shard_column(b, [id_col], nsh), batch_format="pyarrow"
        )
        .groupby("shard")
        .map_groups(
            lambda g: merge_window_spans(g.drop_columns(["shard"]), w, id_col),
            batch_format="pyarrow",
        )
    )


def _rebuild_shard(g: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """One id-hash shard of the doc/span UNION: doc rows (is_doc) carry
    text, span rows carry (tok_start, tok_end). ONLY docs that actually
    have a span in this shard are re-tokenized and rebuilt — every other
    doc passes through byte-identical (including null text). Vectorized
    rebuild: tokenize the touched docs once, turn spans into a +1/-1
    difference array over the flat token stream, cumsum -> cut mask,
    re-join kept tokens per doc with one Arrow list kernel. No Python per
    doc or per span."""
    import pyarrow.compute as pc

    from tangent_ray.tokenize.text import split_tokens

    out_schema = pa.schema(
        [(id_col, pa.int64()), (text_col, pa.string()),
         ("n_cut_tokens", pa.int64())]
    )
    if g.num_rows == 0:
        return out_schema.empty_table()
    is_doc = g["is_doc"].to_numpy(zero_copy_only=False)
    all_docs = g.filter(pa.array(is_doc))
    spans = g.filter(pa.array(~is_doc))
    all_ids = all_docs[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    span_ids = spans[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    touched = np.isin(all_ids, span_ids)

    def passthrough(d: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: d[id_col],
                text_col: d[text_col],
                "n_cut_tokens": pa.array(
                    np.zeros(d.num_rows, np.int64), type=pa.int64()
                ),
            }
        ).cast(out_schema)

    untouched = passthrough(all_docs.filter(pa.array(~touched)))
    if spans.num_rows == 0:
        return untouched
    docs = all_docs.filter(pa.array(touched))
    ids = all_ids[touched]
    order = np.argsort(ids, kind="stable")
    docs = docs.take(pa.array(order))
    ids = ids[order]
    texts = docs[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, tokens, _ = split_tokens(texts)
    n_tok = np.zeros(docs.num_rows, np.int64)
    if len(parents):
        np.add.at(n_tok, parents, 1)
    flat_start = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    # spans -> difference array over the flat token stream (clipped)
    s_ids = span_ids
    row_of = np.searchsorted(ids, s_ids)
    # a span whose doc is outside this shard's docs would misroute — the
    # shared shard_column guarantees co-location, so this is an assert
    if len(row_of) and (
        (row_of >= len(ids)).any() or (ids[np.minimum(row_of, len(ids) - 1)] != s_ids).any()
    ):
        raise ValueError("apply_span_cuts: span for an unknown doc id")
    lo = spans["tok_start"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = spans["tok_end"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo = np.clip(lo, 0, n_tok[row_of])
    hi = np.clip(hi, lo, n_tok[row_of])
    total = int(n_tok.sum())
    diff = np.zeros(total + 1, np.int64)
    np.add.at(diff, flat_start[row_of] + lo, 1)
    np.add.at(diff, flat_start[row_of] + hi, -1)
    cut = np.cumsum(diff[:total]) > 0
    keep = ~cut
    cut_per_doc = np.zeros(docs.num_rows, np.int64)
    if total:
        np.add.at(cut_per_doc, parents, cut.astype(np.int64))
    # per-doc kept-token lists -> one join kernel
    kept_per_doc = n_tok - cut_per_doc
    offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    kept_tokens = tokens.filter(pa.array(keep))
    lists = pa.ListArray.from_arrays(pa.array(offsets), kept_tokens)
    joined = pc.binary_join(lists, " ")
    rebuilt = pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            text_col: joined.cast(pa.string()),
            "n_cut_tokens": pa.array(cut_per_doc, type=pa.int64()),
        }
    ).cast(out_schema)
    return pa.concat_tables([untouched, rebuilt])


def apply_span_cuts(docs_ds, spans_ds, text_col: str = "text",
                    id_col: str = "doc_id", shards: int | None = None,
                    prefilter: bool = False):
    """Cut ``window_dedup`` spans out of the corpus: each doc's text is
    rebuilt as its kept tokens (shared normalized tokenizer, single-space
    joined — token coordinates are what the spans are expressed in; docs
    with NO spans pass through byte-identical). Returns
    (id, text, n_cut_tokens).

    Co-location without a join: docs and spans are UNIONED into one
    Dataset (schema-harmonized with nulls), sharded by the SAME id hash,
    and rebuilt per shard — ONE payload-rate shuffle total.

    ``prefilter=True`` is the 100-TB low-dup-rate path: span doc-ids build
    a distributed Bloom filter (ops/bloom: OR-tree of per-block bitsets,
    bitset broadcast once per worker); definite non-members stream STRAIGHT
    to the output with no shuffle, only the (dup-rate + FP-rate) fraction
    of docs pays the co-location shuffle. Bloom false positives are safe —
    an FP doc rides the shuffle and exits via the rebuild path's own
    byte-identical passthrough. Two pruned payload reads replace one full
    payload shuffle; output is identical either way (tested)."""
    from tangent_ray.util import DEFAULT_SHARDS, shard_column

    nsh = shards or DEFAULT_SHARDS
    if prefilter:
        from tangent_ray.ops.bloom import build_bloom, filter_by_bloom

        spans_ds = spans_ds.materialize()  # consumed twice: bloom + union
        # size the filter to the ACTUAL span count (~13 bits/id -> ~1% FP;
        # a fixed size would saturate to FP ~ 1.0 at scale and silently
        # shuffle the whole corpus anyway), capped at 2^30 bits = 128 MB
        n_spans = max(1, spans_ds.count())
        bits_log2 = min(30, max(16, int(np.ceil(np.log2(13 * n_spans)))))
        bloom = build_bloom(
            spans_ds.select_columns([id_col]), id_col, bits_log2=bits_log2
        )

        def passthrough(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: b[id_col].cast(pa.int64()),
                    text_col: b[text_col].cast(pa.string()),
                    "n_cut_tokens": pa.array(
                        np.zeros(b.num_rows, np.int64), type=pa.int64()
                    ),
                }
            )

        untouched = filter_by_bloom(
            docs_ds, bloom, id_col, keep_hits=False
        ).map_batches(passthrough, batch_format="pyarrow")
        candidates = filter_by_bloom(docs_ds, bloom, id_col, keep_hits=True)
        cut = apply_span_cuts(
            candidates, spans_ds, text_col, id_col, shards, prefilter=False
        )
        return cut.union(untouched)

    def doc_side(b: pa.Table) -> pa.Table:
        # explicit marker, not text-validity: a doc with NULL text must
        # stay a doc row (and pass through as-is), never read as a span
        t = pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                text_col: b[text_col].cast(pa.string()),
                "tok_start": pa.nulls(b.num_rows, pa.int64()),
                "tok_end": pa.nulls(b.num_rows, pa.int64()),
                "is_doc": pa.array(np.ones(b.num_rows, bool)),
            }
        )
        return shard_column(t, [id_col], nsh)

    def span_side(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                text_col: pa.nulls(b.num_rows, pa.string()),
                "tok_start": b["tok_start"].cast(pa.int64()),
                "tok_end": b["tok_end"].cast(pa.int64()),
                "is_doc": pa.array(np.zeros(b.num_rows, bool)),
            }
        )
        return shard_column(t, [id_col], nsh)

    union = docs_ds.map_batches(doc_side, batch_format="pyarrow").union(
        spans_ds.map_batches(span_side, batch_format="pyarrow")
    )
    return union.groupby("shard").map_groups(
        lambda g: _rebuild_shard(g.drop_columns(["shard"]), text_col, id_col),
        batch_format="pyarrow",
    )


def _rebuild_paragraph_shard(g: pa.Table, text_col: str,
                             id_col: str) -> pa.Table:
    """One id-hash shard of the doc/flag UNION: rebuild each flagged doc
    as its kept paragraphs re-joined with blank lines; docs with no DROP
    flags in the shard pass through byte-identical. Vectorized: one
    split_pattern over the touched docs, one boolean gather, one list
    re-join."""
    import pyarrow.compute as pc

    out_schema = pa.schema(
        [(id_col, pa.int64()), (text_col, pa.string()),
         ("n_cut_paras", pa.int64())]
    )
    if g.num_rows == 0:
        return out_schema.empty_table()
    is_doc = g["is_doc"].to_numpy(zero_copy_only=False)
    all_docs = g.filter(pa.array(is_doc))
    flags = g.filter(pa.array(~is_doc))
    # only DROP flags matter; keep=true rows change nothing
    drop = flags.filter(pc.equal(pc.coalesce(flags["keep"], True), False))
    all_ids = all_docs[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    d_ids = drop[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    touched = np.isin(all_ids, d_ids)
    pass_docs = all_docs.filter(pa.array(~touched))
    untouched = pa.table(
        {
            id_col: pass_docs[id_col],
            text_col: pass_docs[text_col],
            "n_cut_paras": pa.array(
                np.zeros(pass_docs.num_rows, np.int64), type=pa.int64()
            ),
        }
    ).cast(out_schema)
    if drop.num_rows == 0:
        return untouched
    docs = all_docs.filter(pa.array(touched))
    ids = all_ids[touched]
    order = np.argsort(ids, kind="stable")
    docs = docs.take(pa.array(order))
    ids = ids[order]
    texts = docs[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(pc.coalesce(texts, ""), "\n\n")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    n_para = np.diff(offsets)  # ALL splits incl. empties (para_idx basis)
    # mark dropped (doc, para_idx) positions
    row_of = np.searchsorted(ids, d_ids)
    if len(row_of) and (
        (row_of >= len(ids)).any()
        or (ids[np.minimum(row_of, len(ids) - 1)] != d_ids).any()
    ):
        raise ValueError("apply_paragraph_cuts: flag for an unknown doc id")
    d_idx = drop["para_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    # a para_idx outside the doc's split count means the flags were
    # computed against a DIFFERENT corpus version — as loud as the
    # unknown-doc check above, not a silent no-op
    if len(d_idx) and ((d_idx < 1) | (d_idx > n_para[row_of])).any():
        raise ValueError(
            "apply_paragraph_cuts: para_idx out of range (stale flags?)"
        )
    cut = np.zeros(len(flat), dtype=bool)
    cut[offsets[row_of] + d_idx - 1] = True
    keep = ~cut
    cut_per_doc = np.zeros(docs.num_rows, np.int64)
    np.add.at(cut_per_doc, parents[cut], 1)
    kept_per_doc = n_para - cut_per_doc
    new_off = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    kept = flat.filter(pa.array(keep))
    out_lists = pa.ListArray.from_arrays(pa.array(new_off), kept)
    joined = pc.binary_join(out_lists, "\n\n")
    rebuilt = pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            text_col: joined.cast(pa.string()),
            "n_cut_paras": pa.array(cut_per_doc, type=pa.int64()),
        }
    ).cast(out_schema)
    return pa.concat_tables([untouched, rebuilt])


def apply_paragraph_cuts(docs_ds, flags_ds, text_col: str = "text",
                         id_col: str = "doc_id", shards: int | None = None):
    """Apply ``paragraph_dedup`` flags: each doc whose flags mark DROPPED
    paragraphs is rebuilt as its kept splits re-joined with blank lines
    (empty splits between kept paragraphs are preserved as splits, so
    para_idx stays consistent under iteration); docs with no dropped
    paragraph pass through byte-identical. Returns (id, text,
    n_cut_paras). Same co-location shape as ``apply_span_cuts``: UNION +
    one id-hash shard groupby, no join machinery."""
    from tangent_ray.util import DEFAULT_SHARDS, shard_column

    nsh = shards or DEFAULT_SHARDS

    def doc_side(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                text_col: b[text_col].cast(pa.string()),
                "para_idx": pa.nulls(b.num_rows, pa.int64()),
                "keep": pa.nulls(b.num_rows, pa.bool_()),
                "is_doc": pa.array(np.ones(b.num_rows, bool)),
            }
        )
        return shard_column(t, [id_col], nsh)

    def flag_side(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                text_col: pa.nulls(b.num_rows, pa.string()),
                "para_idx": b["para_idx"].cast(pa.int64()),
                "keep": b["keep"].cast(pa.bool_()),
                "is_doc": pa.array(np.zeros(b.num_rows, bool)),
            }
        )
        return shard_column(t, [id_col], nsh)

    union = docs_ds.map_batches(doc_side, batch_format="pyarrow").union(
        flags_ds.map_batches(flag_side, batch_format="pyarrow")
    )
    return union.groupby("shard").map_groups(
        lambda g: _rebuild_paragraph_shard(
            g.drop_columns(["shard"]), text_col, id_col
        ),
        batch_format="pyarrow",
    )
