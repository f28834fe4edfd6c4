"""`ray job submit` entrypoint: build (or resume) an index, then optionally
serve a query file — the cluster-facing driver script of the engine.

On a real cluster::

    ray job submit --working-dir . -- \
        python tools/build_job.py --input s3://bucket/transcripts/ \
        --out /shared/index --partitions 256 --queries queries.parquet

In this sandbox (single node) the same script runs standalone::

    python tools/build_job.py --input /root/testdata/sf0.001 \
        --out /tmp/idx --corpus documents

The job connects to whatever cluster ``RAY_ADDRESS`` points at (`ray job
submit` sets it to the cluster's GCS; unset it falls back to a local
session). The build is resumable: finished partitions are detected by
their lineage manifests and skipped, so re-submitting the identical job
after a mid-build failure completes only the remaining partitions. Each
partition manifest carries lineage (input files, config) + build metrics
(wall seconds, docs/s); the global manifest pools them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# workers must import tangent_ray too, wherever the job was launched from
# (`ray job submit --working-dir` ships the package; standalone we extend
# PYTHONPATH before the local session starts)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True,
                    help="parquet file/dir (transcripts or documents table)")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--corpus", default="transcripts",
                    choices=("transcripts", "documents"))
    ap.add_argument("--partitions", type=int, default=1,
                    help="resumable build partitions (one manifest each)")
    ap.add_argument("--shards", type=int, default=64,
                    help="term shards for the build groupby")
    ap.add_argument("--salt", default="auto",
                    help="hot-term salt buckets (int, or 'auto' to size "
                         "from the input row count)")
    ap.add_argument("--no-resume", action="store_true",
                    help="rebuild every partition even if finished")
    ap.add_argument("--queries", default=None,
                    help="optional parquet of (query_id, kind, text) to run "
                         "against the finished index")
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--query-concurrency", type=int, default=2)
    ap.add_argument("--results-out", default=None,
                    help="parquet dir for query results (default: print rows)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS is the cluster; standalone we
        # stay on a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from tangent_ray.config import EngineConfig
    from tangent_ray.index.build import build_index
    from tangent_ray.sources.corpus import DocumentsCorpus, TranscriptsCorpus

    if args.salt == "auto":
        import pyarrow.parquet as pq

        from tangent_ray.index.build import list_input_files

        n_rows = sum(
            pq.read_metadata(f).num_rows for f in list_input_files(args.input)
        )
        salt = EngineConfig.suggest_salt_buckets(n_rows)
    else:
        salt = int(args.salt)
    cfg = EngineConfig(partitions=args.partitions, salt_buckets=salt)
    corpus = TranscriptsCorpus() if args.corpus == "transcripts" else DocumentsCorpus()

    t0 = time.monotonic()
    manifest = build_index(
        args.input, args.out, cfg, corpus,
        build_shards=args.shards, resume=not args.no_resume,
    )
    build_sec = time.monotonic() - t0
    summary = {
        "out": args.out,
        "build_wall_sec": round(build_sec, 3),
        "n_docs": manifest["n_docs"],
        "postings": manifest["postings_text"] + manifest["postings_math"],
        "partials": len(manifest["partials"]),
        "metrics": manifest.get("metrics", {}),
    }

    if args.queries:
        import pyarrow.parquet as pq

        from tangent_ray.query.scorer import search

        qt = pq.read_table(args.queries)
        t0 = time.monotonic()
        res = search(qt, args.out,
                     concurrency=args.query_concurrency, topk=args.topk)
        if args.results_out:
            res.write_parquet(args.results_out)
            n_rows = sum(
                pq.read_metadata(os.path.join(args.results_out, f)).num_rows
                for f in os.listdir(args.results_out)
                if f.endswith(".parquet")
            )
        else:
            rows = res.take_all()
            n_rows = len(rows)
            for r in rows[:20]:
                print(r)
        summary["queries"] = {
            "n": qt.num_rows,
            "result_rows": n_rows,
            "wall_sec": round(time.monotonic() - t0, 3),
        }

    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
