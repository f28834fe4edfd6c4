"""Soak the round-3 retrieval-feature wave at scale (default 1M docs):

- expansion-lexicon (text_vocab) build time per reader;
- prefix query p50 at heavy (cap 128) and light (cap 4) expansion;
- synonym-group, boosted, metadata-filtered query p50 (facet sidecar
  build throughput included);
- more-like-this p50 (term selection + OR BM25);
- ordered span-near p50 over the positional sidecar.

Usage: python tools/soak_expand.py [n_docs] [num_cpus]
Prints one JSON line; reuses bench_ops' deterministic corpus generator
and caches the built index under /tmp/tangent_ray_cache (keyed by size),
so repeat runs measure only the queries.
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

    import dataclasses

    from tangent_ray.config import SQL_PARITY_CONFIG
    from tangent_ray.index.build import build_index
    from tangent_ray.index.positions import build_position_index, span_near_search
    from tangent_ray.query.facets import FACETS_DIR, build_facet_sidecar
    from tangent_ray.query.mlt import more_like_this
    from tangent_ray.query.scorer import QueryScorer
    from tangent_ray.sources.corpus import DocumentsCorpus

    root = f"/tmp/tangent_ray_cache/soakexpand-{n_docs}"
    idx = os.path.join(root, "idx")
    pos_dir = os.path.join(root, "pos")
    cfg = dataclasses.replace(SQL_PARITY_CONFIG,
                              partitions=max(8, num_cpus // 4))
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        os.makedirs(root, exist_ok=True)
        t0 = time.perf_counter()
        build_index(corpus, idx, cfg, DocumentsCorpus())
        out["index_build_sec"] = round(time.perf_counter() - t0, 2)
    def _pos_is_current(d: str) -> bool:
        if not os.path.isdir(d):
            return False
        import pyarrow.parquet as pq_

        parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
        # a legacy doc-sharded sidecar lacks the encoded 'docs' column
        return bool(parts) and "docs" in pq_.read_schema(
            os.path.join(d, parts[0])
        ).names

    if not _pos_is_current(pos_dir):
        import shutil

        shutil.rmtree(pos_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_position_index(
            ray.data.read_parquet(corpus, columns=["doc_id", "text"]),
            pos_dir, num_shards=max(64, num_cpus * 4),
        )
        out["positions_build_sec"] = round(time.perf_counter() - t0, 2)
    with open(os.path.join(idx, "manifest.json")) as f:
        p0 = json.load(f)["partials"][0]
    if not os.path.isdir(os.path.join(idx, "partials", p0, FACETS_DIR)):
        t0 = time.perf_counter()
        build_facet_sidecar(idx, ["source"])
        dt = time.perf_counter() - t0
        out["facet_sidecar_build"] = {"sec": round(dt, 2),
                                      "docs_per_sec": round(n_docs / dt)}

    s = QueryScorer(idx)
    t0 = time.perf_counter()
    vocab_terms = len(s.reader.text_vocab()[0])
    out["text_vocab"] = {"sec": round(time.perf_counter() - t0, 3),
                         "terms": vocab_terms}

    def p50(fn, reps=30):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts) * 1000), 2)

    def q(text):
        return lambda: s.score_query(text, "text", 10)

    # the synthetic vocab is ~40 words; s* expands to several corpus-hot
    # terms, so heavy expansion unions multiple full posting lists — the
    # worst case for a blended group
    s.prefix_max_expansions = 128
    out["prefix_heavy_p50_ms"] = p50(q("s*"), reps=10)
    s.prefix_max_expansions = 4
    out["prefix_cap4_p50_ms"] = p50(q("s*"), reps=10)
    out["syn_p50_ms"] = p50(q("{stream,query} join"), reps=10)
    out["boost_p50_ms"] = p50(q("stream^2 index join"), reps=10)
    out["filter_p50_ms"] = p50(q("stream index #source:src3"), reps=10)
    out["wild_p50_ms"] = p50(q("s*am"), reps=10)
    from tangent_ray.query.facets import collapsed_search

    t0 = time.perf_counter()
    co = collapsed_search(idx, "stream index", "source", k=5, per_group=2)
    out["collapse"] = {"sec": round(time.perf_counter() - t0, 2),
                       "rows": co.num_rows}
    first_text = (
        ray.data.read_parquet(corpus, columns=["text"]).take(1)[0]["text"]
    )
    out["mlt_p50_ms"] = p50(
        lambda: more_like_this(s, first_text, k=10, max_query_terms=10),
        reps=10,
    )
    w = first_text.split()
    if len(w) >= 2:  # a 1-token first doc would crash AFTER the builds
        out["spannear_p50_ms"] = p50(
            lambda: span_near_search(pos_dir, f"{w[0]} {w[1]}", slop=8, k=20),
            reps=5,
        )

    # search_after page 2 + autocomplete
    d1, s1 = s.score_query("stream index", "text", 10)
    out["page2_p50_ms"] = p50(
        lambda: s.score_query("stream index", "text", 10,
                              after=(float(s1[-1]), int(d1[-1]))),
        reps=10,
    )
    out["complete_p50_ms"] = p50(lambda: s.reader.complete("sp", 10), reps=30)
    if len(d1):
        out["explain_p50_ms"] = p50(
            lambda: s.explain("stream^2 index {join,merge}", int(d1[0])),
            reps=10,
        )

    # hybrid RRF: BM25 leg + 1M-vector brute-force cosine leg
    from bench_ops import write_vecs

    from tangent_ray.query.hybrid import hybrid_search

    vdir = write_vecs(f"/tmp/tangent_ray_cache/opsbench-vecs-{n_docs}", n_docs)
    emb = ray.data.read_parquet(vdir, columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq_

    qvec = np.asarray(
        pq_.read_table(
            os.path.join(vdir, sorted(os.listdir(vdir))[0]),
            columns=["vec_id", "embedding"],
        )["embedding"][0].as_py(),
        dtype=np.float64,
    )
    # brute leg (explicit opt-in — the exact baseline, O(N) matmul/query)
    t0 = time.perf_counter()
    hy = hybrid_search(s, "stream index join", emb, qvec, k=10, depth=50,
                       ann="brute")
    out["hybrid_rrf_brute"] = {"sec": round(time.perf_counter() - t0, 2),
                               "rows": hy.num_rows}
    # serving IVF leg: cluster-partitioned IVF index built ONCE, resident
    # IVFReader per query batch; recall@depth vs the brute leg
    import pyarrow as pa

    from tangent_ray.ops.ann import IVFReader, build_ivf_index, knn_cosine
    from tangent_ray.query.hybrid import hybrid_search_batch

    nlist, nprobe, depth = 64, 8, 50
    ivf_dir = os.path.join(root, "ivf")
    if not os.path.exists(os.path.join(ivf_dir, "manifest.json")):
        t0 = time.perf_counter()
        build_ivf_index(emb, ivf_dir, nlist=nlist, iters=1)
        out["ivf_index_build_sec"] = round(time.perf_counter() - t0, 2)
    reader = IVFReader(ivf_dir)
    nq = 16
    rng3 = np.random.default_rng(3)
    qmat = np.tile(qvec, (nq, 1)) + rng3.standard_normal(
        (nq, len(qvec))
    ) * 0.5
    texts = ["stream index join"] * nq
    t0 = time.perf_counter()
    hyb = hybrid_search_batch(
        s, texts, qmat, emb, k=10, depth=depth, ann=reader, nprobe=nprobe,
    )
    cold = time.perf_counter() - t0  # includes lazy cluster loads
    t0 = time.perf_counter()
    hybrid_search_batch(
        s, texts, qmat, emb, k=10, depth=depth, ann=reader, nprobe=nprobe,
    )
    warm = time.perf_counter() - t0
    out["hybrid_rrf_ivf_batch"] = {
        "cold_sec": round(cold, 2), "warm_sec": round(warm, 2),
        "n_queries": nq,
        "warm_per_query_ms": round(warm / nq * 1000, 1),
        "rows": hyb.num_rows,
    }

    def topset(t):
        got: dict[int, set] = {}
        for q, i in zip(t["qid"].to_pylist(), t["vec_id"].to_pylist()):
            got.setdefault(q, set()).add(i)
        return got

    exact = topset(pa.concat_tables(
        [x for x in ray.get(
            knn_cosine(emb, qmat, k=depth).to_arrow_refs()
        ) if x.num_rows]
    ))
    # recall/nprobe curve: this corpus is UNIFORM random vectors (the
    # worst case for any clustering ANN — neighbors scatter across
    # clusters), so probing half the lists is needed for >= 0.9; on
    # clustered data (tests/test_ann.py) nprobe=2/4 already clears 0.9
    for np_ in (nprobe, nlist // 2):
        t0 = time.perf_counter()
        approx = topset(reader.search(qmat, k=depth, nprobe=np_))
        dt = time.perf_counter() - t0
        out[f"ivf_recall_at_depth_nprobe{np_}"] = {
            "recall": round(
                float(np.mean([
                    len(exact[q] & approx.get(q, set())) / len(exact[q])
                    for q in exact
                ])), 4,
            ),
            "warm_per_query_ms": round(dt / nq * 1000, 1),
        }

    out["n_docs"] = n_docs
    out["num_cpus"] = num_cpus
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
