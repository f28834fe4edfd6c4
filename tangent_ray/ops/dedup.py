"""Deduplication operators: exact, n-gram shingle, MinHash+LSH, SimHash.

All are Ray-Data-first: vectorized per-batch signature computation, then one
``groupby`` on the signature/bucket key (the only shuffle), then per-group
candidate emission. The reference's only dedup is exact-expression first-wins
(``dictExpressions``, ``mathindex.cpp:336-355``); these generalize it to the
operations a training-data pipeline needs at 100 TB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from tangent_ray.tokenize.text import split_tokens

# deterministic 64-bit hash of a string (unsalted, cross-process stable)


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def content_hash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    h = np.fromiter(
        (_h64(t) if t is not None else 0 for t in batch[text_col].to_pylist()),
        count=batch.num_rows,
        dtype=np.uint64,
    )
    return pa.table(
        {
            id_col: batch[id_col],
            "content_hash": pa.array(h.astype(np.int64), type=pa.int64()),
        }
    )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: first-wins by minimum id per identical content.

    Returns (id, dups) — the kept id and the duplicate count per content
    group. The groupby key is the 64-bit content hash (narrow shuffle: the
    text itself never moves), the analogue of the reference's global
    first-occurrence expression dedup with "first" defined by data order,
    not arrival (SURVEY §2.7 D1)."""
    import pandas as pd

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col, id_col), batch_format="pyarrow"
    )

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: [int(g[id_col].min())], "dups": [np.int64(len(g))]}
        )

    return hashed.groupby("content_hash").map_groups(first_wins, batch_format="pandas")


# ---------------------------------------------------------------------------
# token shingles


def shingle_batch(
    batch: pa.Table, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """(id, shingle) rows: token n-grams joined by a single space (shared
    definition with the DuckDB oracle)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, tokens, _ = split_tokens(texts)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    toks = tokens.to_pylist()
    out_id: list[int] = []
    out_sh: list[str] = []
    m = len(parents)
    i = 0
    while i < m:
        j = i
        p = parents[i]
        while j < m and parents[j] == p:
            j += 1
        row_toks = toks[i:j]
        did = int(ids[p])
        for s in range(0, len(row_toks) - n + 1):
            out_id.append(did)
            out_sh.append(" ".join(row_toks[s : s + n]))
        i = j
    return pa.table(
        {
            id_col: pa.array(out_id, type=pa.int64()),
            "shingle": pa.array(out_sh, type=pa.string()),
        }
    )


def shingle_candidates(ds, n: int = 5, text_col: str = "text", id_col: str = "doc_id"):
    """Distinct doc pairs (a < b) sharing at least one token n-gram."""
    import pandas as pd

    sh = ds.map_batches(
        lambda b: shingle_batch(b, n, text_col, id_col), batch_format="pyarrow"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = sh.groupby("shingle").map_groups(pairs, batch_format="pandas")

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["doc_a", "doc_b"]).map_groups(dedupe, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH


class MinHashLSH:
    """Per-batch MinHash signatures exploded to (band, band_hash, id) rows.

    num_perm permutations via the standard (a*x+b mod p) family with fixed
    seeds; bands of rows; near-duplicates collide in >= 1 band. The follow-up
    ``groupby(["band","band_hash"])`` is the only shuffle.
    """

    P = (1 << 61) - 1

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
        self.a = rng.randint(1, self.P, size=num_perm, dtype=np.int64).astype(object)
        self.b = rng.randint(0, self.P, size=num_perm, dtype=np.int64).astype(object)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, np.iinfo(np.int64).max, dtype=np.int64)
        x = shingle_hashes.astype(object)[:, None]
        vals = (self.a[None, :] * x + self.b[None, :]) % self.P
        return np.min(vals, axis=0).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = shingle_batch(batch, self.shingle_n, self.text_col, self.id_col)
        ids = sh[self.id_col].to_numpy(zero_copy_only=False)
        hashes = np.fromiter(
            (_h64(s) & 0x7FFFFFFFFFFFFFFF for s in sh["shingle"].to_pylist()),
            count=len(ids),
            dtype=np.int64,
        )
        out_id: list[int] = []
        out_band: list[int] = []
        out_bh: list[int] = []
        for did in np.unique(ids):
            sig = self.signature(hashes[ids == did])
            for band in range(self.bands):
                seg = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.blake2b(seg.tobytes(), digest_size=8).digest(), "big"
                ) & 0x7FFFFFFFFFFFFFFF
                out_id.append(int(did))
                out_band.append(band)
                out_bh.append(bh)
        return pa.table(
            {
                self.id_col: pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_bh, type=pa.int64()),
            }
        )


def minhash_candidates(ds, num_perm: int = 64, bands: int = 16, shingle_n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Candidate near-duplicate pairs via MinHash LSH banding."""
    import pandas as pd

    sigs = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_n=shingle_n,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = sigs.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["doc_a", "doc_b"]).map_groups(dedupe, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash


def simhash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash over token hashes (tf-weighted bit votes)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parents, tokens, _ = split_tokens(texts)
    th = np.fromiter(
        (_h64(t) for t in tokens.to_pylist()), count=len(parents), dtype=np.uint64
    )
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    votes = np.zeros((len(texts), 64), dtype=np.int64)
    np.add.at(votes, parents, 2 * bits - 1)
    sim = (votes > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return pa.table(
        {
            id_col: batch[id_col],
            "simhash": pa.array(sim.astype(np.int64), type=pa.int64()),
        }
    )


def jaccard_pairs(ds, n: int = 4, threshold: float = 0.0,
                  text_col: str = "text", id_col: str = "doc_id",
                  shards: int = 64):
    """Exact token n-gram Jaccard similarity for every doc pair sharing at
    least one shingle: |A∩B| / (|A|+|B|-|A∩B|) over DISTINCT shingle sets.

    Shape (one wide shuffle + one tiny pair aggregate, everything
    vectorized): per-batch distinct (doc, shingle) rows carry a
    deterministic shingle-hash shard key; each shard group explodes its
    shingle runs into candidate pairs with numpy (no per-shingle Python);
    pair intersection counts come from a Sum aggregate; per-doc set sizes
    are a tiny count aggregate broadcast into the final map. The exact
    counterpart of the MinHash estimate (reference has no near-dup ops,
    SURVEY §2.7).
    """
    import pandas as pd

    import ray
    from ray.data.aggregate import Sum

    def shard_shingles(batch: pa.Table) -> pa.Table:
        t = shingle_batch(batch, n, text_col, id_col)
        df = t.to_pandas().drop_duplicates()  # docs never span input batches
        h = pd.util.hash_array(df["shingle"].to_numpy(dtype=object))
        df["shard"] = (h % shards).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    sh = ds.map_batches(shard_shingles, batch_format="pyarrow")

    sizes = {
        r[id_col]: r["count()"]
        for r in sh.groupby(id_col).count().take_all()
    }
    sizes_ref = ray.put(sizes)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("shingle", kind="stable")
        codes, _ = pd.factorize(g["shingle"].to_numpy(dtype=object), sort=False)
        docs = g[id_col].to_numpy()
        starts = np.flatnonzero(np.diff(codes, prepend=codes[0] - 1)) if len(g) else np.empty(0, np.int64)
        ends = np.append(starts[1:], len(g))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ids = np.sort(docs[s:e])
            a, b = np.triu_indices(e - s, k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if not out_a:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "i": []}).astype(np.int64)
        df = pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})
        # partial per-shard intersection counts (a pair reappears in other
        # shards through different shingles; the Sum aggregate folds them)
        return df.groupby(["doc_a", "doc_b"], as_index=False).size().rename(columns={"size": "i"})

    inter = (
        sh.groupby("shard").map_groups(shard_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"]).aggregate(Sum("i", alias_name="i"))
    )

    def to_jaccard(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        sa = np.array([sz[x] for x in a], dtype=np.float64)
        sb = np.array([sz[x] for x in b], dtype=np.float64)
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
