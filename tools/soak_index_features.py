"""Soak the round-3 index-side features at scale (default 1M docs):

- positional sidecar build throughput, phrase + proximity query latency;
- BM25 index build, tombstone delete visibility cost (query p50 with a
  1000-doc live-docs filter), purge_deletes wall time + invariants;
- boolean NOT query latency;
- snippets: one filtered scan producing excerpts for 200 result pairs;
- BPE: word_counts + 64-merge train + actor-pool encode over the corpus.

Usage: python tools/soak_index_features.py [n_docs] [num_cpus]
Prints one JSON line; reuses bench_ops' deterministic corpus generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_ops import write_corpus  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import logging

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    corpus = write_corpus(f"/tmp/tangent_ray_cache/opsbench-v2-{n_docs}", n_docs)
    out: dict = {}

    def ds():
        return ray.data.read_parquet(corpus, columns=["doc_id", "text"])

    ds().count()  # first-touch

    import dataclasses
    import shutil

    import pyarrow as pa

    from tangent_ray.config import SQL_PARITY_CONFIG
    from tangent_ray.index.build import build_index
    from tangent_ray.index.deletes import delete_docs, purge_deletes
    from tangent_ray.index.positions import (
        build_position_index,
        phrase_search,
        proximity_search,
    )
    from tangent_ray.query.scorer import QueryScorer
    from tangent_ray.query.snippets import snippets_for_results
    from tangent_ray.sources.corpus import DocumentsCorpus

    root = f"/tmp/tangent_ray_cache/soakidx-{n_docs}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    # a phrase that certainly occurs: the first bigram of doc 0 (tokens are
    # uniform vocab draws, so these two words are corpus-common too)
    first_text = ds().take(1)[0]["text"]
    w = first_text.split()
    phrase = f"{w[0]} {w[1]}"

    # --- positional sidecar -------------------------------------------
    pos_dir = os.path.join(root, "pos")
    t0 = time.perf_counter()
    build_position_index(ds(), pos_dir, num_shards=max(64, num_cpus * 4))
    dt = time.perf_counter() - t0
    out["positions_build"] = {"sec": round(dt, 2),
                              "docs_per_sec": round(n_docs / dt)}
    from tangent_ray.index.positions import span_near_search

    for name, fn in (
        ("phrase_search", lambda: phrase_search(pos_dir, phrase, k=20)),
        ("proximity_search",
         lambda: proximity_search(pos_dir, phrase, window=8, k=20)),
        ("span_near_search",
         lambda: span_near_search(pos_dir, phrase, slop=8, k=20)),
    ):
        t0 = time.perf_counter()
        t = fn()
        cold = time.perf_counter() - t0  # includes any reader load
        ts = []
        for _ in range(20):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        out[name] = {"cold_sec": round(cold, 3),
                     "warm_p50_ms": round(float(np.median(ts) * 1000), 2),
                     "rows": t.num_rows}

    # warm reader, cold terms: 20 distinct bigrams, each queried once
    # (pays the per-term O(df) decode, not just the cached intersection)
    bigrams = []
    for row in ds().take(40):
        toks = row["text"].split()
        if len(toks) >= 4:
            bigrams.append(f"{toks[2]} {toks[3]}")
        if len(bigrams) >= 20:
            break
    ts = []
    for bg in bigrams:
        t0 = time.perf_counter()
        phrase_search(pos_dir, bg, k=20)
        ts.append(time.perf_counter() - t0)
    out["phrase_distinct_terms_p50_ms"] = round(float(np.median(ts) * 1000), 2)

    # --- BM25 index + deletes + NOT -----------------------------------
    idx = os.path.join(root, "idx")
    cfg = dataclasses.replace(SQL_PARITY_CONFIG, partitions=max(8, num_cpus // 4))
    t0 = time.perf_counter()
    m = build_index(corpus, idx, cfg, DocumentsCorpus())
    dt = time.perf_counter() - t0
    out["index_build"] = {"sec": round(dt, 2),
                          "docs_per_sec": round(n_docs / dt)}

    def p50(scorer, q="join hash stream", reps=40):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            scorer.score_query(q, "text", 10)
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts) * 1000), 2)

    s = QueryScorer(idx)
    out["query_p50_ms"] = p50(s, q=phrase)
    out["not_query_p50_ms"] = p50(s, q=f"{phrase} -mutated")

    # --- query-language wave: scored phrase / regexp / mm --------------
    s.attach_positions(pos_dir)
    out["phraseq_warm_p50_ms"] = p50(s, q=f'"{phrase}" {w[4]}')
    out["phrasesl_warm_p50_ms"] = p50(s, q=f'"{phrase}"~2')
    ts = []
    for bg in bigrams:  # cold phrase clauses: each pays the O(df) decode
        t0 = time.perf_counter()
        s.score_query(f'"{bg}"', "text", 10)
        ts.append(time.perf_counter() - t0)
    out["phraseq_cold_terms_p50_ms"] = round(float(np.median(ts) * 1000), 2)
    out["regexq_p50_ms"] = p50(s, q=f"/{w[0][:2]}.*/ {w[1]}")
    out["mm_p50_ms"] = p50(s, q=f"{phrase} {w[4]} #mm:2")

    rng = np.random.default_rng(7)
    victims = rng.choice(n_docs, size=1000, replace=False).tolist()
    t0 = time.perf_counter()
    delete_docs(idx, docids=victims)
    out["delete_1000"] = {"sec": round(time.perf_counter() - t0, 3)}
    s2 = QueryScorer(idx)
    out["query_p50_ms_with_tombstones"] = p50(s2, q=phrase)
    t0 = time.perf_counter()
    m2 = purge_deletes(idx)
    dt = time.perf_counter() - t0
    assert m2["n_docs"] == m["n_docs"] - 1000, (m2["n_docs"], m["n_docs"])
    out["purge_deletes"] = {"sec": round(dt, 2),
                            "docs_per_sec": round(n_docs / dt)}
    out["query_p50_ms_after_purge"] = p50(QueryScorer(idx), q=phrase)

    # --- snippets: real result docs (every pair produces an excerpt) -----
    qids = [f"q{i}" for i in range(20)]
    s3 = QueryScorer(idx)
    res_rows = []
    qtexts = []
    for i, qid in enumerate(qids):
        qtext = f"{w[2 * i]} {w[2 * i + 1]}"
        qtexts.append(qtext)
        d, _ = s3.score_query(qtext, "text", 10)
        res_rows.extend({"query_id": qid, "docid": int(x)} for x in d)
    results = pa.Table.from_pylist(res_rows)
    queries = pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "text": pa.array(qtexts, pa.string()),
        }
    )
    files = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    t0 = time.perf_counter()
    snips = snippets_for_results(results, queries, files, corpus=DocumentsCorpus())
    out["snippets_200_pairs"] = {"sec": round(time.perf_counter() - t0, 2),
                                 "rows": snips.num_rows}

    # serving path: stored-fields sidecar (built once) -> O(results) lookup
    from tangent_ray.sources.stored import StoredFields, build_stored_fields

    stored_dir = os.path.join(root, "stored")
    t0 = time.perf_counter()
    build_stored_fields(corpus, stored_dir, corpus=DocumentsCorpus())
    out["stored_fields_build"] = {"sec": round(time.perf_counter() - t0, 2)}
    sf_handle = StoredFields(stored_dir)
    t0 = time.perf_counter()
    snips2 = snippets_for_results(results, queries, files,
                                  corpus=DocumentsCorpus(), stored=sf_handle)
    out["snippets_200_pairs_stored"] = {
        "sec": round(time.perf_counter() - t0, 3), "rows": snips2.num_rows,
        "matches_scan": bool(snips2.equals(snips)),
    }

    # --- BPE -------------------------------------------------------------
    from tangent_ray.ops.bpe import bpe_encode_stats, train_bpe_pipeline

    t0 = time.perf_counter()
    merges, vocab_set = train_bpe_pipeline(
        ds(), num_merges=64, min_freq=2, top_m=50_000
    )
    out["bpe_train"] = {"sec": round(time.perf_counter() - t0, 2),
                        "merges": len(merges), "vocab": len(vocab_set)}
    t0 = time.perf_counter()
    n = bpe_encode_stats(ds(), merges).count()
    dt = time.perf_counter() - t0
    out["bpe_encode"] = {"sec": round(dt, 2), "rows": n,
                         "docs_per_sec": round(n_docs / dt)}

    print(json.dumps({"n_docs": n_docs, "num_cpus": num_cpus, "ops": out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
