"""Log-structured tiered merge of partial indexes (segment compaction).

The reference's offline flow concatenates per-worker TSVs into one stream
and rebuilds a monolithic in-memory index (``cat db-index/* | mathindex.exe``,
``README.txt:45-49``; binary save via ``outputIndex``,
``mathindex.cpp:120-157``). The distributed analogue: each build partition
leaves an independent partial index; a *tiered merge* repeatedly folds groups
of K partials into one, keeping the partial count (and so per-query segment
fan-out) bounded while staying resumable — exactly a log-structured merge
tree over posting runs.

Merging one term across partials uses ``codec.merge_postings``: pure byte
concatenation when the runs' docid ranges are disjoint and ordered (dense-id
corpora partitioned by key range), full decode->merge-sort->re-encode when
hash docids interleave. A docid occurring in two partials raises — a document
belongs to exactly one build partition.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

import ray.data

from tangent_ray.config import EngineConfig
from tangent_ray.index.build import MANIFEST_NAME, SEGMENT_SCHEMA
from tangent_ray.index.codec import (
    _run_first_docid,
    decode_postings,
    decode_skips,
    encode_postings,
    merge_postings,
)
from tangent_ray.util import DEFAULT_SHARDS, shard_column, sorted_lookup


def _merge_term_group(group: pa.Table, block_size: int) -> pa.Table:
    if group.num_rows == 1:
        return group.select([f.name for f in SEGMENT_SCHEMA])
    posts = group["postings"].to_pylist()
    skips = group["skips"].to_pylist()
    runs = [(p, s) for p, s in zip(posts, skips)]
    post, skip = merge_postings(runs, block_size)
    if len(skip):
        sk = decode_skips(skip)
        max_tf = int(sk["maxtf"].max())
    else:
        max_tf = int(pc.max(group["max_tf"]).as_py() or 0)
    return pa.Table.from_arrays(
        [
            group["term"].slice(0, 1),
            group["kind"].slice(0, 1),
            pa.array([0], type=pa.int32()),
            pa.array([int(pc.sum(group["df"]).as_py())], type=pa.int64()),
            pa.array([int(pc.sum(group["cf"]).as_py())], type=pa.int64()),
            pa.array([max_tf], type=pa.int32()),
            pa.array([post], type=pa.binary()),
            pa.array([skip], type=pa.binary()),
        ],
        schema=SEGMENT_SCHEMA,
    )


def _purge_term_group(
    group: pa.Table, block_size: int, tomb: np.ndarray
) -> pa.Table | None:
    """Merge one term's runs with tombstoned docids REMOVED (purge path).

    Fast path: when no tombstone falls inside any run's docid range (cheap
    check against the skip table's first/last docids), delegate to the
    plain merge — most terms of a large index are untouched by a delete.
    Returns None when every posting of the term is tombstoned (the term
    row disappears, exactly as in a fresh build without those docs)."""
    posts = group["postings"].to_pylist()
    skips = group["skips"].to_pylist()
    runs = [(p, s) for p, s in zip(posts, skips) if len(s)]
    if not runs:
        return None
    touched = False
    for p, s in runs:
        first = _run_first_docid((p, s))
        last = int(decode_skips(s)["last"][-1])
        lo = int(np.searchsorted(tomb, first))
        if lo < tomb.size and int(tomb[lo]) <= last:
            touched = True
            break
    if not touched:
        return _merge_term_group(group, block_size)
    parts = [decode_postings(p, s) for p, s in runs]
    docids = np.concatenate([x[0] for x in parts]).astype(np.int64)
    tfs = np.concatenate([x[1] for x in parts])
    dls = np.concatenate([x[2] for x in parts])
    pos1 = np.concatenate([x[3] for x in parts])
    order = np.argsort(docids, kind="stable")
    docids, tfs, dls, pos1 = docids[order], tfs[order], dls[order], pos1[order]
    if len(docids) > 1 and (docids[1:] == docids[:-1]).any():
        raise ValueError("purge: duplicate docid across runs")
    hit, _ = sorted_lookup(tomb, docids)
    if hit.all():
        return None
    keep = ~hit
    docids, tfs, dls, pos1 = docids[keep], tfs[keep], dls[keep], pos1[keep]
    post, skip = encode_postings(
        docids.astype(np.uint64), tfs, dls, pos1, block_size
    )
    return pa.Table.from_arrays(
        [
            group["term"].slice(0, 1),
            group["kind"].slice(0, 1),
            pa.array([0], type=pa.int32()),
            pa.array([len(docids)], type=pa.int64()),
            pa.array([int(tfs.astype(np.int64).sum())], type=pa.int64()),
            pa.array([int(tfs.max())], type=pa.int32()),
            pa.array([post], type=pa.binary()),
            pa.array([skip], type=pa.binary()),
        ],
        schema=SEGMENT_SCHEMA,
    )


def merge_partials(out_dir: str, names: list[str], merged_name: str,
                   shards: int = DEFAULT_SHARDS,
                   tombstones: np.ndarray | None = None,
                   purged_docs: int = 0) -> dict:
    """Merge the named partials of an index into one; atomic swap.

    With ``tombstones`` (sorted int64; see ``index/deletes.py``) the merge
    is a PURGE: tombstoned docids are filtered out of every posting run,
    df/cf/max_tf are recomputed, emptied terms are dropped, docmap sidecars
    are filtered, and the merged manifest's doc/token/posting counts are
    recomputed from the purged segments (``purged_docs`` = exact number of
    deleted docs present in these partials, subtracted from ``n_docs``)."""
    pdir = os.path.join(out_dir, "partials")
    dirs = [os.path.join(pdir, n) for n in names]
    manifests = []
    for d in dirs:
        with open(os.path.join(d, MANIFEST_NAME)) as f:
            manifests.append(json.load(f))
    cfg = EngineConfig.from_json(manifests[0]["config"])

    tmp = os.path.join(pdir, merged_name + "__tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "terms"))

    term_files = sorted(
        f for d in dirs for f in glob.glob(os.path.join(d, "terms", "*.parquet"))
    )
    ds = ray.data.read_parquet(term_files)
    bs = cfg.block_size
    # shuffle on a FIXED hash shard of the term, not the term itself: term
    # groups are O(vocabulary) (math-tuple vocabularies reach 10^8) and a
    # per-group Python call costs ~0.5 ms; each shard merges all its term
    # runs in one pass (size ``shards`` so one shard's rows fit a worker)

    def add_shard(batch: pa.Table) -> pa.Table:
        return shard_column(batch, ["term"], shards)

    def merge_shard(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["shard"])
        if g.num_rows == 0:
            return SEGMENT_SCHEMA.empty_table()
        terms = g["term"].to_numpy(zero_copy_only=False)
        order = np.argsort(terms, kind="stable")
        g = g.take(pa.array(order))
        terms = terms[order]
        starts = np.flatnonzero(
            np.concatenate([[True], terms[1:] != terms[:-1]])
        )
        ends = np.append(starts[1:], len(terms))
        if tombstones is None:
            parts = [
                _merge_term_group(g.slice(st, en - st), bs)
                for st, en in zip(starts, ends)
            ]
        else:
            parts = [
                t
                for st, en in zip(starts, ends)
                if (t := _purge_term_group(g.slice(st, en - st), bs, tombstones))
                is not None
            ]
        if not parts:
            return SEGMENT_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    ds.map_batches(add_shard, batch_format="pyarrow").groupby("shard").map_groups(
        merge_shard, batch_format="pyarrow"
    ).write_parquet(os.path.join(tmp, "terms"))

    # carry the docmap sidecars along (pure byte copy — docids are disjoint
    # across partials, so the merged docmap is the file union). ONLY when
    # every source has one: a merged docmap covering just some sources
    # would silently decorate the uncovered docs with numeric ids, because
    # the reader's input-files fallback fires only for partials with NO
    # docmap dir. A mixed merge (pre-sidecar partial folded with new ones)
    # therefore writes no docmap and keeps the fallback path correct.
    have_dm = [os.path.isdir(os.path.join(d, "docmap")) for d in dirs]
    if all(have_dm):
        import pyarrow.parquet as _pq

        dm_files = sorted(
            f for d in dirs
            for f in glob.glob(os.path.join(d, "docmap", "*.parquet"))
        )
        os.makedirs(os.path.join(tmp, "docmap"), exist_ok=True)
        for i, f in enumerate(dm_files):
            dst = os.path.join(tmp, "docmap", f"dm{i:05d}.parquet")
            if tombstones is None:
                shutil.copy2(f, dst)
            else:
                t = _pq.read_table(f)
                ids = t["docid"].to_numpy(zero_copy_only=False).astype(np.int64)
                hit, _ = sorted_lookup(tombstones, ids)
                _pq.write_table(t.filter(pa.array(~hit)), dst)
    elif any(have_dm):
        logger.warning(
            "merge_partials: %d of %d sources lack a docmap sidecar; the "
            "merged partial keeps NONE (dockeys decorate via input_files)",
            sum(1 for h in have_dm if not h), len(dirs),
        )

    merged = dict(manifests[0])
    merged["input_files"] = sorted(
        f for m in manifests for f in m["input_files"]
    )
    for key in (
        "n_docs", "n_terms_text", "n_terms_math", "postings_text",
        "postings_math", "tokens_text", "tokens_math", "problem_fragments",
        "math_expr_instances", "math_expr_unique",
    ):
        merged[key] = sum(m.get(key, 0) for m in manifests)
    # term counts across partials overlap; recount from the merged table
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(tmp, "terms"), columns=["term", "kind", "df", "cf"]
    )
    kinds = t["kind"].to_numpy(zero_copy_only=False)
    merged["n_terms_text"] = int((kinds == 0).sum())
    merged["n_terms_math"] = int((kinds == 1).sum())
    if tombstones is not None:
        # a purge changed the postings themselves — recompute every count
        # from the purged segments so the manifest equals what a fresh
        # build over the reduced corpus would record
        df = t["df"].to_numpy(zero_copy_only=False)
        cf = t["cf"].to_numpy(zero_copy_only=False)
        merged["n_docs"] = merged["n_docs"] - int(purged_docs)
        merged["postings_text"] = int(df[kinds == 0].sum())
        merged["postings_math"] = int(df[kinds == 1].sum())
        merged["tokens_text"] = int(cf[kinds == 0].sum())
        merged["tokens_math"] = int(cf[kinds == 1].sum())
        merged["problem_fragments"] = int(cf[kinds == 3].sum())
        from tangent_ray.tokenize.batch import EXPR_INST_TERM, EXPR_UNIQ_TERM

        terms_np = t["term"].to_numpy(zero_copy_only=False)
        merged["math_expr_instances"] = int(cf[terms_np == EXPR_INST_TERM].sum())
        merged["math_expr_unique"] = int(cf[terms_np == EXPR_UNIQ_TERM].sum())
    merged["merged_from"] = names
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)

    for d in dirs:
        shutil.rmtree(d)
    os.rename(tmp, os.path.join(pdir, merged_name))
    return merged


def compact_index(out_dir: str, max_partials: int = 4, fanin: int = 8) -> list[str]:
    """Tiered compaction: fold oldest groups of ``fanin`` until bounded.

    Re-finalizes the GLOBAL manifest + term-stats sidecar afterwards (the
    merge deletes folded partial dirs, so a stale global manifest would
    point readers at removed paths) — the index stays queryable across the
    whole call."""
    pdir = os.path.join(out_dir, "partials")
    gen = 0
    compacted = False
    while True:
        names = sorted(
            d
            for d in os.listdir(pdir)
            # never fold crash-leftover "*__tmp" dirs (manifest precedes
            # the atomic rename; see finalize_index)
            if not d.endswith("__tmp")
            and os.path.exists(os.path.join(pdir, d, MANIFEST_NAME))
        )
        if len(names) <= max_partials:
            break
        group = names[: min(fanin, len(names) - max_partials + 1)]
        merged_name = f"m{gen:05d}_{group[0]}"
        merge_partials(out_dir, group, merged_name)
        compacted = True
        gen += 1
    gpath = os.path.join(out_dir, "manifest.json")
    if compacted and os.path.exists(gpath):
        from tangent_ray.index.build import finalize_index
        from tangent_ray.sources.corpus import corpus_from_json

        with open(gpath) as f:
            g = json.load(f)
        finalize_index(
            out_dir, EngineConfig.from_json(g["config"]), corpus_from_json(g["corpus"])
        )
    return names


def _verify_batch(t: pa.Table) -> pa.Table:
    """Per-segment-row invariants + partial totals (one row out per batch)."""
    from tangent_ray.index.codec import decode_postings

    totals = {"postings_text": 0, "postings_math": 0,
              "tokens_text": 0, "tokens_math": 0}
    kinds = t["kind"].to_numpy(zero_copy_only=False)
    dfs = t["df"].to_numpy(zero_copy_only=False)
    cfs = t["cf"].to_numpy(zero_copy_only=False)
    for i in range(t.num_rows):
        kind = int(kinds[i])
        if kind in (3, 4):  # problem / expr-stats pseudo-rows: not postings
            continue
        d, tf, _, _ = decode_postings(
            t["postings"][i].as_py(), t["skips"][i].as_py()
        )
        assert len(d) == dfs[i], "df != posting entries"
        assert int(tf.sum()) == cfs[i], "cf != sum tf"
        if len(d) > 1:
            assert (np.diff(d.astype(np.int64)) > 0).all(), "docids not sorted"
        key = "text" if kind == 0 else "math"
        totals[f"postings_{key}"] += len(d)
        totals[f"tokens_{key}"] += int(tf.sum())
    return pa.Table.from_pylist([totals])


def _verify_term_shard(g: pa.Table) -> pa.Table:
    """Cross-run docid uniqueness for every term of ONE hash shard.

    Salted runs within a partial cover disjoint docid ranges by
    construction; re-ingesting the same documents as a new increment
    produces the same hashed docids in another partial — exactly what this
    catches (it would silently double-count df/cf in scoring otherwise).
    One shard call checks all its terms (term groups are O(vocabulary);
    per-group Python calls are the wrong granularity)."""
    from tangent_ray.index.codec import decode_postings

    if g.num_rows == 0:
        return pa.table({"dup_terms": pa.array([0], type=pa.int64())})
    terms = g["term"].to_numpy(zero_copy_only=False)
    order = np.argsort(terms, kind="stable")
    terms = terms[order]
    starts = np.flatnonzero(np.concatenate([[True], terms[1:] != terms[:-1]]))
    ends = np.append(starts[1:], len(terms))
    posts = g["postings"]
    skips = g["skips"]
    for st, en in zip(starts, ends):
        if en - st == 1:
            continue
        docs = np.concatenate(
            [
                decode_postings(
                    posts[int(order[i])].as_py(), skips[int(order[i])].as_py()
                )[0]
                for i in range(st, en)
            ]
        )
        docs.sort()
        if len(docs) > 1 and (docs[1:] == docs[:-1]).any():
            raise AssertionError(
                f"duplicate docid across runs for term {terms[st]!r} "
                "(same documents ingested in more than one increment?)"
            )
    return pa.table({"dup_terms": pa.array([0], type=pa.int64())})


def verify_index(out_dir: str, check_unique: bool = True) -> dict:
    """The ``verifyIndex`` invariants (``mathindex.cpp:62-66``), distributed:

    - sum of posting entries across segments == manifest postings counts;
    - sum of per-posting tf == manifest token counts;
    - docids strictly increasing within every posting list;
    - with ``check_unique`` (default): global docid uniqueness per term
      across partials/increments, via one term-keyed groupby over the
      segment rows (the same shuffle class as compaction — skip it for a
      totals-only spot check).

    Both passes are Ray jobs: a ``map_batches`` sweep over segment files
    with a tiny driver reduce, plus the optional uniqueness groupby. Returns
    the recomputed stats; raises on violation.
    """
    with open(os.path.join(out_dir, "manifest.json")) as f:
        g = json.load(f)
    files = sorted(
        f
        for p in g["partials"]
        for f in glob.glob(os.path.join(out_dir, "partials", p, "terms", "*.parquet"))
    )
    ds = ray.data.read_parquet(files)
    parts = ds.map_batches(_verify_batch, batch_format="pyarrow").take_all()
    totals = {"postings_text": 0, "postings_math": 0,
              "tokens_text": 0, "tokens_math": 0}
    for r in parts:
        for k in totals:
            totals[k] += r[k]
    for k, v in totals.items():
        assert v == g[k], f"{k}: recomputed {v} != manifest {g[k]}"
    if check_unique:
        def add_shard(batch: pa.Table) -> pa.Table:
            return shard_column(batch, ["term"], DEFAULT_SHARDS)

        ray.data.read_parquet(files).map_batches(
            add_shard, batch_format="pyarrow"
        ).groupby("shard").map_groups(
            _verify_term_shard, batch_format="pyarrow"
        ).count()  # consume: raises inside workers on violation
    return totals
