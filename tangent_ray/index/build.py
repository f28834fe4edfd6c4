"""Log-structured, resumable index build.

Pipeline (all Ray Data; reference analogue: ``index.py`` preprocessing +
the single-process C++ ``Doc`` consumer ``mathindex.cpp:322-403``, here
distributed):

1. The input Parquet files are planned into ``cfg.partitions`` build
   partitions. Each partition builds an independent **partial index**
   (sorted term -> compressed posting run) plus a lineage manifest, written
   atomically (tmp dir + rename). A re-run skips completed partitions — this
   is the checkpoint/resume story (reference analogue: ``file_skips`` +
   ``index_fileids`` bookkeeping, ``index.py:162-173,202``).

2. Within a partition::

       read_parquet(files, columns=corpus.columns)        # prune at read
         .map_batches(tokenize_task, pyarrow, tasks)      # (term,docid,tf,..)
         .groupby("skey").map_groups(encode)              # the ONE wide shuffle
         .write_parquet(partial_dir)

   The fused int32 shuffle key is ``skey = (crc32(term) % build_shards) *
   salt_buckets + bucket``: *shard* bounds the number of reduce groups (each
   group encodes many terms in one vectorized codec pass, not one Python
   call per term), *bucket* is the docid-range salt that splits hot terms
   across reducers so no group exceeds a range's worth of postings
   (reference has no skew handling — SURVEY §4; this is the explicit
   Ray-scale answer). A salted term's runs stay as separate segment rows
   (disjoint ordered docid ranges): the scorer sums over them like it sums
   over segments, and tiered compaction (merge.py) folds them into one run.

3. ``finalize_index`` sums partial manifests into the global manifest
   (N, avgdl, token/postings counts — the BM25 analogue of the reference's
   corpus stats ``mathindex.cpp:62-79``) and verifies the ``verifyIndex``
   invariant (sum of postings == sum of tuple/term emissions,
   ``mathindex.cpp:62-66``).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

logger = logging.getLogger(__name__)

from tangent_ray.config import EngineConfig
from tangent_ray.index.codec import encode_postings_multi
from tangent_ray.sources.corpus import Corpus, corpus_kind, corpus_spec
from tangent_ray.tokenize.batch import (
    EXPR_INST_TERM,
    EXPR_UNIQ_TERM,
    KIND_PROBLEM,
    TokenizeBatch,
)

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("kind", pa.int8()),
        ("bucket", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("max_tf", pa.int32()),
        ("postings", pa.binary()),
        ("skips", pa.binary()),
    ]
)

MANIFEST_NAME = "_MANIFEST.json"

#: term-stats aggregation switches from one driver-side Arrow group_by to a
#: Ray groupby above this many segment metadata rows
_STATS_RAY_ROWS = 2_000_000


_TOK_CACHE: dict = {}


def tokenize_task(batch: pa.Table, cfg_json: str, corpus_kind_s: str, num_shards: int) -> pa.Table:
    """Stateless-task tokenizer with per-worker-process instance caching.

    The tokenizer's only state (compiled regex + SLT template tuple cache +
    the process-global Porter lru_cache) is cheap and process-local, so a
    plain task pool gives the same amortization as an actor pool without the
    pool ramp-up latency — tasks scale elastically to every free CPU, which
    matters for the two-parallelism-level scaling criterion.
    """
    key = (cfg_json, corpus_kind_s, num_shards)
    tok = _TOK_CACHE.get(key)
    if tok is None:
        from tangent_ray.sources.corpus import corpus_from_json

        tok = TokenizeBatch(
            EngineConfig.from_json(cfg_json), corpus_from_json(corpus_kind_s), num_shards
        )
        _TOK_CACHE[key] = tok
    return tok(batch)


def term_shards(terms: pa.Array, num_shards: int) -> np.ndarray:
    """Deterministic (cross-process stable) shard id per term via crc32."""
    uniq = pc.unique(terms)
    crc = np.array(
        [zlib.crc32(u.encode("utf-8")) % num_shards for u in uniq.to_pylist()],
        dtype=np.int32,
    )
    idx = pc.index_in(terms, value_set=uniq).to_numpy(zero_copy_only=False)
    return crc[idx]


def encode_group(group: pa.Table, block_size: int) -> pa.Table:
    """Encode every term of one (shard, bucket) group into posting runs.

    Vectorized term segmentation: one lexsort over (term-code, docid), then
    per-term slices feed the (numpy-vectorized) codec. Duplicate docids
    within a term raise — a repeated document is input corruption (the
    reference warns on repeated docIDs, ``mathindex.cpp:335``).
    """
    n = group.num_rows
    if n == 0:
        return SEGMENT_SCHEMA.empty_table()
    term_col = group["term"]
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    dict_arr = term_col.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary
    docids = group["docid"].to_numpy(zero_copy_only=False).astype(np.uint64)
    tfs = group["tf"].to_numpy(zero_copy_only=False).astype(np.uint32)
    dls = group["dl"].to_numpy(zero_copy_only=False).astype(np.uint32)
    pos1 = group["pos1"].to_numpy(zero_copy_only=False).astype(np.uint32)
    kinds = group["kind"].to_numpy(zero_copy_only=False)
    bucket = int(group["bucket"][0].as_py())

    order = np.lexsort((docids, codes))
    codes_s = codes[order]
    docids_s = docids[order]
    tfs_s = tfs[order]
    dls_s = dls[order]
    pos1_s = pos1[order]
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
    out_post, out_skips = encode_postings_multi(
        docids_s, tfs_s, dls_s, pos1_s, starts, ends, block_size
    )
    out_df = (ends - starts).astype(np.int64)
    out_cf = np.add.reduceat(tfs_s.astype(np.int64), starts)
    out_maxtf = np.maximum.reduceat(tfs_s, starts).astype(np.int32)
    return pa.Table.from_arrays(
        [
            pc.take(vocab, pa.array(codes_s[starts], type=pa.int64())).cast(pa.string()),
            pa.array(kinds[order][starts], type=pa.int8()),
            pa.array(np.full(len(starts), bucket, dtype=np.int32), type=pa.int32()),
            pa.array(out_df, type=pa.int64()),
            pa.array(out_cf, type=pa.int64()),
            pa.array(out_maxtf, type=pa.int32()),
            pa.array(out_post, type=pa.binary()),
            pa.array(out_skips, type=pa.binary()),
        ],
        schema=SEGMENT_SCHEMA,
    )


def plan_partitions(paths: list[str], k: int) -> list[list[str]]:
    """Group input files into k build partitions (contiguous, balanced)."""
    k = max(1, min(k, len(paths)))
    out: list[list[str]] = [[] for _ in range(k)]
    for i, p in enumerate(sorted(paths)):
        out[i * k // len(paths)].append(p)
    return out


def list_input_files(path: str | list[str]) -> list[str]:
    paths = [path] if isinstance(path, str) else list(path)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
        else:
            files.append(p)
    return sorted(files)


def build_partition(
    files: list[str],
    partial_dir: str,
    cfg: EngineConfig,
    corpus: Corpus,
    *,
    tokenize_concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    build_shards: int = 64,
    read_num_blocks: int | None = None,
) -> dict:
    """Build one partial index; returns its manifest dict.

    ``read_num_blocks`` pins the read/block parallelism of the partition
    (strong-scaling benchmarks fix it to the target-cluster value so the
    same job shape runs at every resource level; default lets Ray choose).
    """
    t_start = time.monotonic()
    tmp = partial_dir + "__tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "terms"), exist_ok=True)

    # row count from parquet footers on the driver — no cluster job
    n_docs = sum(pq.read_metadata(f).num_rows for f in files)
    ds = ray.data.read_parquet(
        files, columns=list(corpus.columns), override_num_blocks=read_num_blocks
    )
    tok = ds.map_batches(
        tokenize_task,
        fn_kwargs=dict(
            cfg_json=cfg.to_json(),
            corpus_kind_s=corpus_spec(corpus),
            num_shards=build_shards,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=tokenize_concurrency,
        zero_copy_batch=True,
    )
    # ONE wide shuffle. When salting (salt_buckets > 1) a hot term's rows
    # split into per-docid-range bucket runs that land in different groups;
    # the runs are NOT re-merged here — segments may carry several
    # (term, bucket) rows and the scorer sums over them (disjoint ordered
    # docid ranges), while tiered compaction (merge.py) folds them into one
    # run as a side effect of its term merge. This keeps the build at a
    # single all-to-all instead of two.
    enc = tok.groupby("skey").map_groups(
        lambda g: encode_group(g, cfg.block_size), batch_format="pyarrow"
    )

    # docmap sidecar: compact (docid, dockey) rows per partial, written from
    # a second PRUNED read of only the key columns (no text bytes move).
    # Serving decorates results by searchsorted lookup against only the
    # partials a reader holds — memory bounded per partial, instead of one
    # O(corpus) dict per scorer actor rebuilt from the raw inputs. The job
    # is driven from a side thread so it pipelines with the main
    # tokenize->shuffle->encode job instead of serializing behind it.
    key_cols = [c for c in corpus.columns if c != corpus.text_column]
    dm_thread = None
    dm_err: list[BaseException] = []
    if key_cols:  # every corpus: the sidecar also feeds the dense TAAT path
        import threading

        # pre-warm imports that Ray's path resolution performs lazily —
        # a first import racing between this thread and the main job's
        # write_parquet can observe a partially-initialized module
        try:
            import fsspec.implementations.http  # noqa: F401
        except ImportError:
            pass

        def emit_docmap(batch: pa.Table) -> pa.Table:
            keys = corpus.dockeys(batch)
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            # the corpus's own docid rule (raw int64 for documents,
            # blake2b(dockey) for transcripts) — docmap ids MUST match
            # posting ids or the dense rank space silently misranks
            ids = np.asarray(corpus.docids(batch), dtype=np.int64)
            return pa.table(
                {
                    "docid": pa.array(ids, type=pa.int64()),
                    "dockey": pc.cast(keys, pa.string()),
                }
            )

        def run_docmap() -> None:
            try:
                # tiny output — let Ray pick its own (small) parallelism
                # rather than inheriting the main build's block count
                ray.data.read_parquet(files, columns=key_cols).map_batches(
                    emit_docmap, batch_format="pyarrow"
                ).write_parquet(os.path.join(tmp, "docmap"))
            except BaseException as e:  # surfaced after join
                dm_err.append(e)

        dm_thread = threading.Thread(target=run_docmap, daemon=True)
        dm_thread.start()

    enc.write_parquet(os.path.join(tmp, "terms"))
    if dm_thread is not None:
        dm_thread.join()
        if dm_err:
            raise dm_err[0]

    manifest = _partition_manifest(tmp, files, n_docs, cfg, corpus)
    # per-partition build metrics ride with the lineage (the checkpoint
    # record a resumed run reports without recomputing anything)
    elapsed = time.monotonic() - t_start
    manifest["metrics"] = {
        "build_seconds": round(elapsed, 3),
        "docs_per_sec": round(n_docs / elapsed, 1) if elapsed > 0 else None,
    }
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if os.path.exists(partial_dir):
        shutil.rmtree(partial_dir)
    os.rename(tmp, partial_dir)
    return manifest


def _partition_manifest(
    tmp: str, files: list[str], n_docs: int, cfg: EngineConfig, corpus: Corpus
) -> dict:
    t = pq.read_table(
        os.path.join(tmp, "terms"), columns=["term", "kind", "df", "cf"]
    )
    kinds = t["kind"].to_numpy(zero_copy_only=False)
    df = t["df"].to_numpy(zero_copy_only=False)
    cf = t["cf"].to_numpy(zero_copy_only=False)
    is_text = kinds == 0
    is_math = kinds == 1
    is_prob = kinds == KIND_PROBLEM
    # a salted term may span several (term, bucket) rows — count unique terms
    uniq = t.select(["term", "kind"]).group_by(["term", "kind"]).aggregate([])
    ukinds = uniq["kind"].to_numpy(zero_copy_only=False)
    return {
        "schema_version": 1,
        "input_files": files,
        "n_docs": int(n_docs),
        "n_terms_text": int((ukinds == 0).sum()),
        "n_terms_math": int((ukinds == 1).sum()),
        "postings_text": int(df[is_text].sum()),
        "postings_math": int(df[is_math].sum()),
        "tokens_text": int(cf[is_text].sum()),
        "tokens_math": int(cf[is_math].sum()),
        "problem_fragments": int(cf[is_prob].sum()),
        # reference-indexer expression totals (log1.txt:171-179): parsed
        # formula instances / per-doc-unique expressions, summed from the
        # kind-4 pseudo-rows the tokenizer emits per math-bearing doc
        "math_expr_instances": int(
            cf[pc.equal(t["term"], EXPR_INST_TERM).to_numpy(
                zero_copy_only=False
            )].sum()
        ),
        "math_expr_unique": int(
            cf[pc.equal(t["term"], EXPR_UNIQ_TERM).to_numpy(
                zero_copy_only=False
            )].sum()
        ),
        "config": cfg.to_json(),
        "corpus": corpus_spec(corpus),
    }


def build_index(
    input_path: str | list[str],
    out_dir: str,
    cfg: EngineConfig,
    corpus: Corpus,
    *,
    tokenize_concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    build_shards: int = 64,
    read_num_blocks: int | None = None,
    resume: bool = True,
) -> dict:
    """Build (or resume building) the full index; returns global manifest."""
    files = list_input_files(input_path)
    parts = plan_partitions(files, cfg.partitions)
    os.makedirs(os.path.join(out_dir, "partials"), exist_ok=True)
    for i, pfiles in enumerate(parts):
        pdir = os.path.join(out_dir, "partials", f"p{i:05d}")
        mpath = os.path.join(pdir, MANIFEST_NAME)
        if resume and os.path.exists(mpath):
            # a finished partition resumes ONLY if its lineage matches the
            # current plan: with new input files or a changed config, the
            # planned file->partition mapping shifts and skipping would
            # silently drop (or double-index) documents / mix tokenizer
            # configs within one index
            with open(mpath) as f:
                m = json.load(f)
            if (
                sorted(m.get("input_files", [])) == sorted(pfiles)
                and m.get("config") == cfg.to_json()
            ):
                continue
            logger.warning(
                "build_index: partition %s exists but its lineage does not "
                "match the current plan (inputs or config changed) — "
                "rebuilding it",
                f"p{i:05d}",
            )
        build_partition(
            pfiles,
            pdir,
            cfg,
            corpus,
            tokenize_concurrency=tokenize_concurrency,
            batch_size=batch_size,
            build_shards=build_shards,
            read_num_blocks=read_num_blocks,
        )
    return finalize_index(out_dir, cfg, corpus)


def finalize_index(out_dir: str, cfg: EngineConfig, corpus: Corpus) -> dict:
    """Aggregate partial manifests into the global manifest + invariants."""
    pdir = os.path.join(out_dir, "partials")
    partials = sorted(
        d
        for d in os.listdir(pdir)
        # a crashed build can leave a fully-manifested "*__tmp" dir (the
        # manifest is written BEFORE the atomic rename); counting it as a
        # completed partial would double-index its docs on retry
        if not d.endswith("__tmp")
        and os.path.exists(os.path.join(pdir, d, MANIFEST_NAME))
    )
    manifests = []
    for d in partials:
        with open(os.path.join(pdir, d, MANIFEST_NAME)) as f:
            manifests.append(json.load(f))
    n_docs = sum(m["n_docs"] for m in manifests)
    tokens_text = sum(m["tokens_text"] for m in manifests)
    tokens_math = sum(m["tokens_math"] for m in manifests)
    g = {
        "schema_version": 1,
        "partials": partials,
        "n_docs": n_docs,
        "tokens_text": tokens_text,
        "tokens_math": tokens_math,
        "postings_text": sum(m["postings_text"] for m in manifests),
        "postings_math": sum(m["postings_math"] for m in manifests),
        "problem_fragments": sum(m["problem_fragments"] for m in manifests),
        "math_expr_instances": sum(
            m.get("math_expr_instances", 0) for m in manifests
        ),
        "math_expr_unique": sum(
            m.get("math_expr_unique", 0) for m in manifests
        ),
        "avgdl_text": (tokens_text / n_docs) if n_docs else 0.0,
        "config": cfg.to_json(),
        "corpus": corpus_spec(corpus),
        # pooled per-partition build metrics (partition wall-times overlap
        # only if partitions ran concurrently; the sum is total build work)
        "metrics": {
            "partition_build_seconds_sum": round(
                sum(m.get("metrics", {}).get("build_seconds") or 0.0 for m in manifests),
                3,
            ),
            "partitions_with_metrics": sum(
                1 for m in manifests if m.get("metrics")
            ),
        },
    }
    # global term-stats sidecar (A4 corpus stats, ``mathindex.cpp:62-79``):
    # term -> (kind, global df, cf). Sharded serving needs GLOBAL df for
    # exact BM25 idf while each actor holds only its segment subset. The
    # aggregation input is segment *metadata* rows (one per term-run, no
    # postings bytes). Small vocabularies aggregate with one vectorized
    # Arrow group_by on the driver; above _STATS_RAY_ROWS rows (math-tuple
    # vocabularies reach 10^8 terms) it becomes a Ray groupby so no
    # per-term work ever runs on the driver.
    import glob as _glob

    term_files = sorted(
        f
        for d in partials
        for f in _glob.glob(os.path.join(pdir, d, "terms", "*.parquet"))
    )
    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in term_files)
    cols = ["term", "kind", "df", "cf"]
    if n_rows > _STATS_RAY_ROWS:
        from ray.data.aggregate import Min, Sum

        out = (
            ray.data.read_parquet(term_files, columns=cols)
            .groupby("term")
            .aggregate(
                Min("kind", alias_name="kind"),
                Sum("df", alias_name="df"),
                Sum("cf", alias_name="cf"),
            )
        )
        import ray as _ray

        stats_t = pa.concat_tables(_ray.get(out.to_arrow_refs()))
    else:
        t = pa.concat_tables(
            [pq.read_table(f, columns=cols) for f in term_files]
        )
        agg = t.group_by(["term"]).aggregate(
            [("kind", "min"), ("df", "sum"), ("cf", "sum")]
        )
        stats_t = pa.table(
            {
                "term": agg["term"],
                "kind": agg["kind_min"],
                "df": agg["df_sum"],
                "cf": agg["cf_sum"],
            }
        )
    stats_t = stats_t.sort_by("term")
    pq.write_table(
        pa.table(
            {
                "term": pc.cast(stats_t["term"], pa.string()),
                "kind": pc.cast(stats_t["kind"], pa.int8()),
                "df": pc.cast(stats_t["df"], pa.int64()),
                "cf": pc.cast(stats_t["cf"], pa.int64()),
            }
        ),
        os.path.join(out_dir, "term_stats.parquet"),
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(g, f, indent=1, sort_keys=True)
    return g


def add_increment(
    input_path: str | list[str],
    out_dir: str,
    cfg: EngineConfig | None = None,
    corpus: Corpus | None = None,
    **build_kwargs,
) -> dict:
    """Append a NEW partial index for additional input files and re-finalize.

    The streaming analogue of the reference's interleaved ``D``/``Q`` command
    stream (queries run against "the index state so far" —
    ``mathindex.cpp:377-403``; SURVEY §2.9): the index stays queryable
    between increments, each increment is one more LSM partial, and
    ``compact_index`` folds old partials in the background. ``cfg`` /
    ``corpus`` default to the existing manifest's values — an increment
    cannot silently change tokenization parameters. A document must belong
    to exactly one increment (``verify_index`` / ``merge_postings`` raise on
    cross-increment docid duplicates).
    """
    from tangent_ray.sources.corpus import corpus_from_json

    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            g = json.load(f)
        if cfg is None:
            cfg = EngineConfig.from_json(g["config"])
        elif cfg.to_json() != g["config"]:
            raise ValueError("increment config differs from the existing index")
        if corpus is None:
            corpus = corpus_from_json(g["corpus"])
    if cfg is None or corpus is None:
        raise ValueError("cfg and corpus are required for a fresh index")

    pdir = os.path.join(out_dir, "partials")
    os.makedirs(pdir, exist_ok=True)
    used = {d for d in os.listdir(pdir)}
    i = 0
    while f"p{i:05d}" in used or f"p{i:05d}__tmp" in used:
        i += 1
    files = list_input_files(input_path)
    build_partition(files, os.path.join(pdir, f"p{i:05d}"), cfg, corpus, **build_kwargs)
    return finalize_index(out_dir, cfg, corpus)
