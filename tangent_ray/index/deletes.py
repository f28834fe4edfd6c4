"""Tombstone deletes for the LSM index (Lucene-style live-docs).

The reference engine is build-once (no document removal surface anywhere in
``mathindex.cpp``); a long-lived transcript index needs one — conversations
get retracted, filtered, re-ingested. The public design every LSM text
engine uses (Lucene ``liveDocs`` + ``forceMergeDeletes``) splits the
operation in two:

- ``delete_docs`` appends a sorted tombstone file under
  ``<index>/deletes/`` — O(tombstones), no index rewrite, and the index
  stays fully queryable: scoring drops tombstoned docids exactly (TAAT
  paths post-filter their full candidate set; the WAND loop skips a
  tombstoned pivot *inside* the loop so a deleted doc can never inflate
  the pruning threshold and shadow a live result). Corpus statistics
  (N, avgdl, df) keep their pre-delete values until a purge — the same
  visibility rule Lucene applies (deleted docs stop matching immediately;
  statistics change at merge time).

- ``purge_deletes`` physically rewrites the postings without the
  tombstoned docs: one full-fanin tiered merge (``merge_partials`` with a
  tombstone filter), recomputing df/cf/max_tf per term, dropping emptied
  terms, filtering the docmap sidecars, fixing ``n_docs``/token counts,
  then clearing the tombstones and re-finalizing. After a purge the index
  is equivalent to a fresh build over the reduced corpus — pytest asserts
  rank+score identity of query results against exactly that fresh build.

Matched-tombstone accounting (how much to subtract from ``n_docs``): via
the docmap sidecar when every partial carries one (exact, covers even
zero-token docs); otherwise a distributed postings sweep — a tombstoned id
is counted iff it appears in at least one posting list, so a deleted doc
whose text produced no tokens is not subtracted (it was never visible to
scoring either; documented caveat of docmap-less corpora).
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

logger = logging.getLogger(__name__)

DELETES_DIR = "deletes"


def load_tombstones(index_dir: str) -> np.ndarray:
    """All tombstoned docids of an index: sorted unique int64 (possibly
    empty). Readers call this once at startup (IndexReader.__init__)."""
    ddir = os.path.join(index_dir, DELETES_DIR)
    files = sorted(glob.glob(os.path.join(ddir, "*.parquet")))
    if not files:
        return np.empty(0, dtype=np.int64)
    parts = [
        pq.read_table(f, columns=["docid"])["docid"].to_numpy(
            zero_copy_only=False
        )
        for f in files
    ]
    return np.unique(np.concatenate(parts).astype(np.int64))


def delete_docs(
    index_dir: str,
    docids=None,
    dockeys=None,
) -> dict:
    """Tombstone documents by docid and/or dockey. Returns a summary dict.

    ``dockeys`` (e.g. ``"conv_id:turn_idx"`` strings, or an ingested
    corpus's file-path / JSONL string keys) hash through the same
    ``dockeys_to_docids`` the build uses, so callers can delete by the
    natural key without knowing the hash. (A keyed corpus whose JSONL
    ids were INTEGERS passes them through as docids at ingest — delete
    those via ``docids``, not ``dockeys``.) Idempotent: re-deleting an
    already-tombstoned doc adds no live tombstone (files are deduped at
    load). The new tombstones become visible to NEW readers; long-lived
    scorer actors hold the tombstone set they loaded at startup (restart
    the pool to pick up deletes — the same reader-refresh rule as any
    segment change)."""
    ids: list[int] = []
    if docids is not None:
        ids.extend(int(d) for d in docids)
    if dockeys is not None:
        from tangent_ray.docids import dockeys_to_docids

        ids.extend(int(d) for d in dockeys_to_docids(list(dockeys)))
    new = np.unique(np.asarray(ids, dtype=np.int64))
    if new.size == 0:
        raise ValueError("delete_docs: nothing to delete")

    import fcntl

    ddir = os.path.join(index_dir, DELETES_DIR)
    os.makedirs(ddir, exist_ok=True)
    # exclusive lock around name-pick + write: two concurrent delete_docs
    # calls must not choose the same t{i} file; tmp + os.replace so a crash
    # mid-write can never leave a truncated parquet that poisons every
    # subsequent load_tombstones (i.e. every reader startup)
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
    total = load_tombstones(index_dir)
    # observability only — readers glob the deletes dir, not the manifest
    mpath = os.path.join(index_dir, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            g = json.load(f)
        g["n_tombstones"] = int(total.size)
        with open(mpath, "w") as f:
            json.dump(g, f, indent=1, sort_keys=True)
    return {"added": int(new.size), "n_tombstones": int(total.size)}


def matched_tombstones(index_dir: str, tomb: np.ndarray) -> np.ndarray:
    """The subset of ``tomb`` that identifies documents actually present in
    the index (what a purge subtracts from ``n_docs``).

    Docmap path (transcripts): intersect against the per-partial docmap
    sidecars — exact, no posting decode, covers zero-token docs. Fallback:
    one distributed postings sweep (same shuffle class as ``verify_index``)
    that ORs per-block membership masks on the driver — driver traffic is
    ``len(tomb)`` bools per block, never the corpus."""
    if tomb.size == 0:
        return tomb
    with open(os.path.join(index_dir, "manifest.json")) as f:
        g = json.load(f)
    pdir = os.path.join(index_dir, "partials")
    dm_dirs = [os.path.join(pdir, p, "docmap") for p in g["partials"]]
    if dm_dirs and all(os.path.isdir(d) for d in dm_dirs):
        hits = np.zeros(tomb.size, dtype=bool)
        for d in dm_dirs:
            ids = pq.read_table(d, columns=["docid"])["docid"].to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ids.sort()
            pos = np.searchsorted(ids, tomb)
            pos_c = np.minimum(pos, max(len(ids) - 1, 0))
            if len(ids):
                hits |= (pos < len(ids)) & (ids[pos_c] == tomb)
        return tomb[hits]

    import ray
    import ray.data

    files = sorted(
        f
        for p in g["partials"]
        for f in glob.glob(os.path.join(pdir, p, "terms", "*.parquet"))
    )
    tomb_ref = ray.put(tomb)

    def probe(batch: pa.Table) -> pa.Table:
        from tangent_ray.index.codec import decode_postings

        t = ray.get(tomb_ref) if not isinstance(tomb_ref, np.ndarray) else tomb_ref
        hit = np.zeros(t.size, dtype=bool)
        # every kind decodes with the shared codec (problem-marker rows are
        # ordinary postings under PROBLEM_TERM), so probe them all
        for i in range(batch.num_rows):
            d, _, _, _ = decode_postings(
                batch["postings"][i].as_py(), batch["skips"][i].as_py()
            )
            d = d.astype(np.int64)
            pos = np.searchsorted(d, t)
            pos_c = np.minimum(pos, max(len(d) - 1, 0))
            if len(d):
                hit |= (pos < len(d)) & (d[pos_c] == t)
        return pa.table({"hit": pa.array(np.packbits(hit), type=pa.uint8())})

    acc = np.zeros(tomb.size, dtype=bool)
    for row_t in ray.get(
        ray.data.read_parquet(files)
        .map_batches(probe, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        if row_t.num_rows == 0:
            continue
        packed = row_t["hit"].to_numpy(zero_copy_only=False).astype(np.uint8)
        # each probe() call emitted one packed mask; blocks may concat
        # several — fold in packed-mask-sized strides
        stride = (tomb.size + 7) // 8
        for s in range(0, len(packed), stride):
            acc |= np.unpackbits(packed[s : s + stride], count=tomb.size).astype(
                bool
            )
    return tomb[acc]


def purge_deletes(index_dir: str, shards: int | None = None) -> dict:
    """Physically remove tombstoned docs: full-fanin merge with filtering,
    then clear tombstones and re-finalize. Returns the new global manifest.
    No-op (returns the current manifest) when there are no tombstones."""
    from tangent_ray.config import EngineConfig
    from tangent_ray.index.build import finalize_index
    from tangent_ray.index.merge import merge_partials
    from tangent_ray.sources.corpus import corpus_from_json
    from tangent_ray.util import DEFAULT_SHARDS

    with open(os.path.join(index_dir, "manifest.json")) as f:
        g = json.load(f)
    tomb = load_tombstones(index_dir)
    if tomb.size == 0:
        return g
    matched = matched_tombstones(index_dir, tomb)
    names = list(g["partials"])
    merged_name = f"purged_{names[0]}"
    merge_partials(
        index_dir,
        names,
        merged_name,
        shards=shards or DEFAULT_SHARDS,
        tombstones=tomb,
        purged_docs=int(matched.size),
    )
    shutil.rmtree(os.path.join(index_dir, DELETES_DIR))
    out = finalize_index(
        index_dir,
        EngineConfig.from_json(g["config"]),
        corpus_from_json(g["corpus"]),
    )
    # finalize_index rebuilt the manifest from partial manifests; record
    # that the tombstones were consumed
    out["n_tombstones"] = 0
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    # the fuzzy suggest sidecar ranks by df and names terms — both change
    # under a purge; rebuild it with its own recorded parameters
    spath = os.path.join(index_dir, "suggest.parquet")
    if os.path.exists(spath):
        from tangent_ray.query.fuzzy import build_suggest_index

        md = pq.read_schema(spath).metadata or {}
        build_suggest_index(
            index_dir,
            max_edit=int(md.get(b"max_edit", b"2")),
            min_df=int(md.get(b"min_df", b"1")),
        )
    logger.info(
        "purge_deletes: removed %d docs (%d tombstones) from %s",
        matched.size, tomb.size, index_dir,
    )
    return out
