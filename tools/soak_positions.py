"""Positional-postings scale soak: build the term-sharded positional
index over the 20M-turn transcripts corpus, then exercise the full
serving + lifecycle surface:

- build wall (ONE positions-rate groupby(crc32(term) % shards) shuffle);
- resident PositionalEngine at 4 and 8 shards: warm p50/p99 per query
  family over a fixed phrase set (one query per call);
- add_position_increment mid-soak -> refresh() -> new docs searchable;
- delete_position_docs -> refresh() -> tombstoned docs gone;
- compact_positions -> refresh() (full reassignment) -> identity spot
  check vs the single-process reader path.

Usage: python tools/soak_positions.py [n_convs] [num_cpus] [pos_shards]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[soak] {msg}", file=sys.stderr, flush=True)


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


# phrase-family queries over the transcript vocabulary: hot bigrams,
# rarer trigrams, and a cross-frequency pair (fixtures.vocab is
# deterministic, so these hit real postings at any scale)
def query_list(words):
    return [
        ("phrase", f"{words[0]} {words[7]}", None),
        ("phrase", f"{words[2]} {words[3]} {words[5]}", None),
        ("phrase", f"{words[50]} {words[300]}", None),
        ("proximity", f"{words[0]} {words[12]}", 8),
        ("proximity", f"{words[60]} {words[61]} {words[62]}", 12),
        ("span_near", f"{words[0]} {words[7]}", 3),
        ("span_near", f"{words[10]} {words[11]} {words[12]}", 6),
    ]


def lat(eng, queries, reps=6):
    """First-call latency (uncached: fetch + term-keys + kernel) and
    repeat latency (the engine's ES-style result cache) per query."""

    def run(kind, q, arg):
        if kind == "phrase":
            eng.phrase(q, k=20)
        elif kind == "proximity":
            eng.proximity(q, window=arg, k=20)
        else:
            eng.span_near(q, slop=arg, k=20)

    firsts = {}
    for kind, q, arg in queries:
        t0 = time.perf_counter()
        run(kind, q, arg)
        firsts[f"{kind}:{q[:18]}"] = round(
            (time.perf_counter() - t0) * 1e3, 1
        )
    per = {}
    for _ in range(reps):
        for kind, q, arg in queries:
            t0 = time.perf_counter()
            run(kind, q, arg)
            per.setdefault((kind, q), []).append(
                (time.perf_counter() - t0) * 1e3
            )
    xs = [x for v in per.values() for x in v]
    worst = dict(sorted(firsts.items(), key=lambda kv: -kv[1])[:3])
    return {
        "p50_ms": round(pct(xs, 50), 2), "p99_ms": round(pct(xs, 99), 2),
        "n_calls": len(xs),
        "first_call_p50_ms": round(
            float(np.median(list(firsts.values()))), 1
        ),
        "slowest_first_ms": worst,
        # doc-range-distributed kernel vs driver-fallback split (hot
        # queries must take the distributed path — postings stay off the
        # driver)
        "distributed_queries": eng.dist_queries,
        "local_queries": eng.local_queries,
    }


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    pos_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow.dataset as pads
    import ray.data

    from tangent_ray.docids import dockeys_to_docids, transcript_dockeys
    from tangent_ray.fixtures import generate_conv_range, vocab, write_transcripts
    from tangent_ray.index.positions import (
        PositionalEngine,
        add_position_increment,
        build_position_index,
        compact_positions,
        delete_position_docs,
        phrase_search,
    )

    out: dict = {"n_convs": n_convs, "num_cpus": num_cpus,
                 "pos_shards": pos_shards}
    tdir = f"/tmp/tangent_ray_cache/soak-serve-{n_convs}"
    t0 = time.time()
    write_transcripts(tdir, n_convs, files=64)
    out["corpus_gen_sec"] = round(time.time() - t0, 1)
    out["n_turns"] = pads.dataset(tdir, format="parquet").count_rows()

    def with_docids(ds):
        """turns -> (doc_id, text) rows via the same dockey hash the main
        index uses (docid per (conv_id, turn_idx))."""
        import pyarrow as pa

        def add_ids(b: "pa.Table") -> "pa.Table":
            keys = transcript_dockeys(b)
            ids = dockeys_to_docids(
                keys.to_pylist() if hasattr(keys, "to_pylist") else list(keys)
            )
            return pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "text": b["text"]}
            )

        return ds.map_batches(add_ids, batch_format="pyarrow")

    pdir = f"/tmp/tangent_ray_soak/pos-idx-{n_convs}"
    shutil.rmtree(pdir, ignore_errors=True)
    t0 = time.time()
    # doc-partitioned serving layout (Lucene/ES shard model): part actors
    # run kernels locally and only top-k partials move — the 100x shape
    build_position_index(
        with_docids(ray.data.read_parquet(tdir, columns=["conv_id", "turn_idx", "text"])),
        pdir, num_shards=pos_shards, doc_partitions=32,
    )
    out["build_sec"] = round(time.time() - t0, 1)
    out["build_turns_per_sec"] = round(out["n_turns"] / out["build_sec"])
    log(f"build_sec={out['build_sec']}")

    words = vocab()
    qs = query_list(words)
    for n in (4, 32, 8):  # 8 last: it stays resident for the lifecycle
        t0 = time.time()
        eng = PositionalEngine(pdir, n_shards=n)
        load_s = round(time.time() - t0, 1)
        stats = lat(eng, qs)
        stats["engine_load_sec"] = load_s
        out[f"shards{n}"] = stats
        log(f"shards{n}: {stats}")
        if n != 8:
            eng.shutdown()

    # --- increment mid-soak ----------------------------------------------
    inc = generate_conv_range(n_convs, n_convs + max(2000, n_convs // 48))
    t0 = time.time()
    add_position_increment(
        with_docids(ray.data.from_arrow(inc)), pdir, num_shards=pos_shards
    )
    out["increment_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    r = eng.refresh()
    out["refresh_after_increment_sec"] = round(time.time() - t0, 1)
    assert r["new_files"] > 0 and not r["reassigned"], r
    out["shards8_after_increment"] = lat(eng, qs)
    log(f"after_increment: {out['shards8_after_increment']}")

    # --- tombstones --------------------------------------------------------
    base = eng.phrase(f"{words[0]} {words[7]}", k=1000)
    victims = base["docid"].to_pylist()[:500]
    t0 = time.time()
    delete_position_docs(pdir, victims)
    out["delete_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    r = eng.refresh()
    out["refresh_after_delete_sec"] = round(time.time() - t0, 1)
    assert r["reloaded"] == list(range(len(eng._actors))), r
    after = eng.phrase(f"{words[0]} {words[7]}", k=1000)
    assert not set(after["docid"].to_pylist()) & set(victims)
    out["shards8_after_delete"] = lat(eng, qs)
    log(f"after_delete: {out['shards8_after_delete']}")

    # --- compaction ---------------------------------------------------------
    t0 = time.time()
    c = compact_positions(pdir, num_shards=pos_shards)
    out["compact_sec"] = round(time.time() - t0, 1)
    out["compact_tombstones_purged"] = c["n_tombstones_purged"]
    log(f"compact_sec={out['compact_sec']}")
    t0 = time.time()
    r = eng.refresh()
    out["refresh_after_compact_sec"] = round(time.time() - t0, 1)
    assert r["reassigned"], r
    out["shards8_after_compact"] = lat(eng, qs)
    # identity spot check vs the single-process reader path
    for _kind, q, _arg in qs[:3]:
        assert eng.phrase(q, k=50).equals(phrase_search(pdir, q, k=50)), q
    out["identity_vs_local"] = True

    # --- scored phrase clauses ("a b" as a BM25 pseudo-term) at scale ------
    # needs the main BM25 index for dl; the resident PositionalEngine is
    # the phrase-postings provider (attach_positions), so this measures
    # the full serving shape: sharded positional fetch + dl gather + merge
    from tangent_ray.config import EngineConfig
    from tangent_ray.index.build import build_index
    from tangent_ray.query.scorer import QueryScorer
    from tangent_ray.sources.corpus import TranscriptsCorpus

    idx_dir = f"/tmp/tangent_ray_soak/bm25-idx-{n_convs}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_index(
        tdir, idx_dir,
        EngineConfig(window=1, eol="none", stem=False, math=False,
                     partitions=num_cpus),
        TranscriptsCorpus(),
    )
    out["bm25_build_sec"] = round(time.time() - t0, 1)
    sc = QueryScorer(idx_dir)
    sc.attach_positions(eng)
    pq_queries = [
        f'"{words[0]} {words[7]}" {words[12]}',     # hot phrase + term
        f'"{words[2]} {words[3]} {words[5]}"~4',    # sloppy trigram
        f'+"{words[50]} {words[300]}" {words[1]}',  # required rarer phrase
    ]
    for q in pq_queries:  # warm
        sc.score_query(q, "text", 20)
    ts_all: dict[str, list[float]] = {}
    for _ in range(6):
        for q in pq_queries:
            t0 = time.perf_counter()
            sc.score_query(q, "text", 20)
            ts_all.setdefault(q[:24], []).append(
                (time.perf_counter() - t0) * 1e3
            )
    out["phraseq_warm_p50_ms"] = {
        k: round(float(np.median(v)), 1) for k, v in ts_all.items()
    }
    # cold distinct phrases: each pays the sharded O(df) fetch + dl gather
    colds = []
    for i in range(12):
        q = f'"{words[100 + 7 * i]} {words[101 + 7 * i]}"'
        t0 = time.perf_counter()
        sc.score_query(q, "text", 20)
        colds.append((time.perf_counter() - t0) * 1e3)
    out["phraseq_cold_p50_ms"] = round(float(np.median(colds)), 1)
    log(f"phraseq: {out['phraseq_warm_p50_ms']} cold={out['phraseq_cold_p50_ms']}")
    eng.shutdown()

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
