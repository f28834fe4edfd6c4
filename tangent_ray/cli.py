"""Command-line parity layer for the reference's three entry points.

The reference drives everything from a control ("cntl") file plus three
commands (SURVEY.md §3): ``python index.py [cntl]`` (corpus -> index),
``python query.py`` + engine (queries -> raw top-k results TSV) and
``python rerank_results.py cntl results.tsv metric out.tsv`` (+ HTML).
This module is the Ray-Data-native analogue::

    python -m tangent_ray index  cntl.json
    python -m tangent_ray query  cntl.json --queries q.parquet --out r.parquet
    python -m tangent_ray rerank cntl.json --queries q.parquet --metric v04 \
        --out reranked.parquet [--serp serp_dir]
    python -m tangent_ray verify cntl.json

The cntl file is JSON (the S1 control-file analogue; ``EngineConfig``
round-trips through its ``config`` key)::

    {
      "input": "/path/to/corpus_parquet",     # file or directory
      "index_dir": "/path/to/index",
      "corpus": "transcripts",                # or "documents"
      "config": {"window": 2, "eol": "small", "stem": true, "math": true,
                 "partitions": 1}             # any EngineConfig field
    }

Queries are a Parquet table with columns ``(query_id, kind, text[, topk])``
— ``kind`` in ``text | math | mixed``; math fragments are ``$SLT$`` spans
or Presentation MathML, exactly what the query reader (S5) accepts.
Results are Parquet (``RESULT_SCHEMA`` / ``RERANK_SCHEMA``), the Parquet
analogue of the reference's R-row TSVs; ``--serp`` additionally renders
the S15 HTML result pages.

The CLI owns its Ray session (guarded — under ``ray job submit`` the
cluster session is reused); library code never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _load_cntl(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        cntl = json.load(f)
    for key in ("input", "index_dir"):
        if key not in cntl:
            raise SystemExit(f"cntl file {path}: missing required key {key!r}")
    return cntl


def _config_of(cntl: dict):
    from tangent_ray.config import EngineConfig

    return EngineConfig.from_json(json.dumps(cntl.get("config", {})))


def _corpus_of(cntl: dict):
    from tangent_ray.sources.corpus import (
        DocumentsCorpus,
        KeyedCorpus,
        TranscriptsCorpus,
    )

    name = cntl.get("corpus", "transcripts")
    try:
        return {
            "transcripts": TranscriptsCorpus,
            "documents": DocumentsCorpus,
            "keyed": KeyedCorpus,
        }[name]()
    except KeyError:
        raise SystemExit(
            f"unknown corpus {name!r} (transcripts | documents | keyed)"
        )


def _read_queries(path: str):
    if path.endswith(".xml"):
        # NTCIR topics file (the reference's query format, query.py:96-114)
        from tangent_ray.sources.topics import read_topics

        t = read_topics(path)
        if t.num_rows == 0:
            raise SystemExit(f"topics xml {path}: no <topic> entries found")
        return t
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    missing = {"query_id", "kind", "text"} - set(t.schema.names)
    if missing:
        raise SystemExit(f"queries parquet: missing columns {sorted(missing)}")
    return t


def cmd_index(args) -> int:
    cntl = _load_cntl(args.cntl)
    _ensure_ray(args.num_cpus)
    from tangent_ray.index.build import build_index

    manifest = build_index(
        cntl["input"],
        cntl["index_dir"],
        _config_of(cntl),
        _corpus_of(cntl),
        resume=not args.no_resume,
    )
    print(json.dumps(manifest))
    return 0


def cmd_query(args) -> int:
    cntl = _load_cntl(args.cntl)
    _ensure_ray(args.num_cpus)
    from tangent_ray.query.scorer import search, search_sharded

    queries = _read_queries(args.queries)
    if args.sharded:
        table = search_sharded(
            queries, cntl["index_dir"], topk=args.topk,
            n_shards=args.shards,
            concurrency_per_shard=args.concurrency,
        )
    else:
        res = search(
            queries, cntl["index_dir"], topk=args.topk,
            concurrency=args.concurrency,
        )
        import pyarrow as pa

        import ray

        tabs = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
        table = (
            pa.concat_tables(tabs) if tabs
            else pa.table({n: [] for n in ("query_id", "docid", "score", "rank")})
        )
    import pyarrow.parquet as pq

    pq.write_table(table, args.out)
    print(json.dumps({"results": table.num_rows, "out": args.out}))
    return 0


def cmd_rerank(args) -> int:
    cntl = _load_cntl(args.cntl)
    _ensure_ray(args.num_cpus)
    from tangent_ray.index.build import list_input_files
    from tangent_ray.rerank.pipeline import rerank_search

    queries = _read_queries(args.queries)
    table = rerank_search(
        queries,
        cntl["index_dir"],
        list_input_files(cntl["input"]),
        topk=args.topk,
        metric=args.metric,
        concurrency=args.concurrency,
    )
    import pyarrow.parquet as pq

    pq.write_table(table, args.out)
    pages: list[str] = []
    if args.serp:
        from tangent_ray.eval.serp import write_serp
        from tangent_ray.query.snippets import snippets_for_results

        snips = snippets_for_results(
            table, queries, list_input_files(cntl["input"]),
            corpus=_corpus_of(cntl),
        )
        pages = write_serp(table, queries, args.serp, snippets=snips)
    print(json.dumps({"results": table.num_rows, "out": args.out,
                      "serp_pages": len(pages)}))
    return 0


def cmd_positions(args) -> int:
    """Build (or rebuild) the positional-postings sidecar into
    ``<index_dir>/positions`` — the conventional location QueryScorer
    auto-attaches for quoted-phrase clauses and the source
    phrase/proximity/span-near serving reads."""
    cntl = _load_cntl(args.cntl)
    _ensure_ray(args.num_cpus)
    import os

    import ray.data

    from tangent_ray.index.positions import build_position_index

    corpus = _corpus_of(cntl)
    ds = ray.data.read_parquet(cntl["input"], columns=corpus.columns)

    def to_pos_cols(batch):
        import numpy as np
        import pyarrow as pa

        return pa.table(
            {
                "doc_id": pa.array(
                    np.asarray(corpus.docids(batch), dtype=np.int64)
                ),
                "text": corpus.texts(batch),
            }
        )

    out = os.path.join(cntl["index_dir"], "positions")
    build_position_index(
        ds.map_batches(to_pos_cols, batch_format="pyarrow"), out,
        num_shards=args.shards,
        doc_partitions=getattr(args, "doc_partitions", 0) or 0,
    )
    from tangent_ray.index.positions import _active_files

    print(json.dumps({"out": out, "files": len(_active_files(out))}))
    return 0


def cmd_ingest(args) -> int:
    """Convert a raw corpus (file-per-document doclist/dir, or JSONL) to
    the canonical Parquet layout every pipeline consumes — the
    reference's doclist front door (S2-S4) as a streaming Ray job."""
    _ensure_ray(args.num_cpus)
    from tangent_ray.sources.ingest import ingest_corpus

    out = ingest_corpus(
        args.src, args.out, fmt=args.format, text_col=args.text_col,
        id_col=args.id_col, root=args.root,
    )
    print(json.dumps(out))
    return 0


def cmd_delete(args) -> int:
    cntl = _load_cntl(args.cntl)
    from tangent_ray.index.deletes import delete_docs

    docids = [int(d) for d in args.docids.split(",")] if args.docids else None
    dockeys = args.dockeys.split(",") if args.dockeys else None
    out = delete_docs(cntl["index_dir"], docids=docids, dockeys=dockeys)
    print(json.dumps(out))
    return 0


def cmd_purge(args) -> int:
    cntl = _load_cntl(args.cntl)
    _ensure_ray(args.num_cpus)
    from tangent_ray.index.deletes import purge_deletes

    manifest = purge_deletes(cntl["index_dir"])
    print(json.dumps(manifest))
    return 0


def cmd_verify(args) -> int:
    cntl = _load_cntl(args.cntl)
    _ensure_ray(args.num_cpus)
    from tangent_ray.index.merge import verify_index

    report = verify_index(cntl["index_dir"])
    print(json.dumps(report))
    return 0


def cmd_explain(args) -> int:
    cntl = _load_cntl(args.cntl)
    from tangent_ray.query.scorer import QueryScorer

    ex = QueryScorer(cntl["index_dir"]).explain(args.text, args.docid)
    for r in ex.to_pylist():
        print(json.dumps(r))
    return 0


def cmd_complete(args) -> int:
    cntl = _load_cntl(args.cntl)
    from tangent_ray.query.scorer import IndexReader

    t = IndexReader(cntl["index_dir"]).complete(args.prefix, n=args.n)
    for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
        print(json.dumps({"term": term, "df": df}))
    return 0


def cmd_suggest(args) -> int:
    cntl = _load_cntl(args.cntl)
    from tangent_ray.query.fuzzy import Suggester

    for term, dist, df in Suggester(cntl["index_dir"]).suggest(
        args.word, topn=args.n
    ):
        print(json.dumps({"term": term, "distance": dist, "df": df}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m tangent_ray", description=__doc__.splitlines()[0]
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("cntl", help="control file (JSON)")
    common.add_argument("--num-cpus", type=int, default=None,
                        help="ray.init num_cpus (default: Ray's choice)")

    p = sub.add_parser("index", parents=[common],
                       help="build (or resume) the index from the cntl corpus")
    p.add_argument("--no-resume", action="store_true",
                   help="rebuild finished partitions instead of skipping")
    p.set_defaults(fn=cmd_index)

    qcommon = argparse.ArgumentParser(add_help=False, parents=[common])
    qcommon.add_argument("--queries", required=True,
                         help="Parquet with (query_id, kind, text)")
    qcommon.add_argument("--out", required=True, help="output Parquet path")
    qcommon.add_argument("--topk", type=int, default=100)
    qcommon.add_argument("--concurrency", type=int, default=2,
                         help="scorer actor-pool size")

    p = sub.add_parser("query", parents=[qcommon],
                       help="raw top-k results (query.py + engine analogue)")
    p.add_argument("--sharded", action="store_true",
                   help="shard segments across the actor pool (hot queries)")
    p.add_argument("--shards", type=int, default=2,
                   help="partial-index shard groups with --sharded")
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("rerank", parents=[qcommon],
                       help="two-stage search + similarity rerank "
                            "(rerank_results.py analogue)")
    p.add_argument("--metric", default="mss",
                   help="registry metric: mss | v00..v11 (default mss/v04)")
    p.add_argument("--serp", default=None,
                   help="also write S15 HTML result pages to this directory")
    p.set_defaults(fn=cmd_rerank)

    p = sub.add_parser("positions", parents=[common],
                       help="build the positional-postings sidecar into "
                            "<index_dir>/positions (phrase / proximity / "
                            "span-near serving + quoted-phrase clauses)")
    p.add_argument("--shards", type=int, default=64,
                   help="term-hash shard files (bounds reduce-group size)")
    p.add_argument("--doc-partitions", type=int, default=0,
                   dest="doc_partitions",
                   help="also hash-partition by docid into R doc-disjoint "
                        "parts (the document-partitioned serving layout: "
                        "PositionalEngine broadcasts kernels, only top-k "
                        "partials move; 0 = term-sharded only)")
    p.set_defaults(fn=cmd_positions)

    p = sub.add_parser("ingest",
                       help="convert a raw corpus (doclist / directory of "
                            "document files, or JSONL shards) to the "
                            "canonical Parquet layout")
    p.add_argument("src", help="doclist file, documents directory, or "
                               ".jsonl path/dir")
    p.add_argument("--out", required=True, help="output Parquet directory")
    p.add_argument("--format", default="auto",
                   choices=["auto", "files", "jsonl"])
    p.add_argument("--text-col", default="text", dest="text_col",
                   help="JSONL text column")
    p.add_argument("--id-col", default="id", dest="id_col",
                   help="JSONL stable id column (hashed to docids)")
    p.add_argument("--root", default=None,
                   help="doclist entries resolve against this root "
                        "(default: the doclist's directory)")
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("delete", parents=[common],
                       help="tombstone documents (Lucene-style live-docs; "
                            "index stays queryable, stats change at purge)")
    p.add_argument("--docids", default=None,
                   help="comma-separated integer docids")
    p.add_argument("--dockeys", default=None,
                   help="comma-separated dockeys (e.g. conv_id:turn_idx)")
    p.set_defaults(fn=cmd_delete)

    p = sub.add_parser("purge", parents=[common],
                       help="physically remove tombstoned docs (full-fanin "
                            "merge + re-finalize; forceMergeDeletes analogue)")
    p.set_defaults(fn=cmd_purge)

    p = sub.add_parser("verify", parents=[common],
                       help="distributed index invariant check (A4 verifyIndex)")
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser("explain", parents=[common],
                       help="per-term BM25 score breakdown of one doc")
    p.add_argument("--text", required=True, help="query text (full syntax)")
    p.add_argument("--docid", type=int, required=True)
    p.set_defaults(fn=cmd_explain)

    p = sub.add_parser("complete", parents=[common],
                       help="df-ranked autocomplete for a prefix")
    p.add_argument("--prefix", required=True)
    p.add_argument("-n", type=int, default=10)
    p.set_defaults(fn=cmd_complete)

    p = sub.add_parser("suggest", parents=[common],
                       help="SymSpell fuzzy suggestions for a word")
    p.add_argument("--word", required=True)
    p.add_argument("-n", type=int, default=5)
    p.set_defaults(fn=cmd_suggest)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
