"""Serve-path soak at the largest buildable scale (round-4 item 4).

Builds a >=20M-turn transcripts index (default 2.4M convs ~ 20.4M turns),
then exercises the RESIDENT serving path end-to-end, in one process:

- build wall + turns/s (16 partials, the LSM shape sharded serving wants);
- distributed verify_index wall (totals + global docid uniqueness);
- ShardedEngine at 4 and 8 shard groups: per-query warm p50/p99 over the
  25-query fixture set, one query per call (serving latency, not batch
  throughput);
- tombstone 1,000 docs mid-soak -> refresh() -> latency again (live-docs
  filter cost) + visibility check;
- add_increment (+50k convs, ~425k turns) mid-soak -> refresh() picks up
  the new partial without reloading resident segments -> latency again +
  the new docs are searchable.

Usage: python tools/soak_serve.py [n_convs] [num_cpus]
Prints ONE JSON line. Nothing corpus-rate lands on the driver: queries are
25 rows, results are topk rows/query, verify/build are Ray jobs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[soak] {msg}", file=sys.stderr, flush=True)


def pct(xs: list[float], p: float) -> float:
    return float(np.percentile(np.asarray(xs), p))


def lat_ms(eng, queries, reps: int) -> dict:
    """One query per call (serving latency): warm-up round, then
    reps x len(queries) timed calls. Reports the three slowest queries'
    per-query MEDIAN (steady-state cost of the heavy queries, robust to
    one-off scheduling hiccups) so a p99 cliff is attributable."""
    one = [queries.slice(i, 1) for i in range(queries.num_rows)]
    qids = [q["query_id"][0].as_py() for q in one]
    for q in one:  # warm every query's terms once
        eng.search(q)
    xs = []
    per: dict[str, list[float]] = {qid: [] for qid in qids}
    for _ in range(reps):
        for qid, q in zip(qids, one):
            t0 = time.perf_counter()
            eng.search(q)
            ms = (time.perf_counter() - t0) * 1e3
            xs.append(ms)
            per[qid].append(ms)
    med = {qid: pct(v, 50) for qid, v in per.items()}
    worst = sorted(med, key=med.get, reverse=True)[:3]
    return {
        "p50_ms": round(pct(xs, 50), 2),
        "p99_ms": round(pct(xs, 99), 2),
        "n_calls": len(xs),
        "slowest_median_ms": {q: round(med[q], 1) for q in worst},
    }


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from tangent_ray.config import EngineConfig
    from tangent_ray.fixtures import (
        generate_conv_range,
        query_set,
        write_transcripts,
    )
    from tangent_ray.index.build import add_increment, build_index
    from tangent_ray.index.deletes import delete_docs
    from tangent_ray.index.merge import verify_index
    from tangent_ray.query.engine import ShardedEngine
    from tangent_ray.sources.corpus import TranscriptsCorpus

    out: dict = {"n_convs": n_convs, "num_cpus": num_cpus}

    tdir = f"/tmp/tangent_ray_cache/soak-serve-{n_convs}"
    t0 = time.time()
    write_transcripts(tdir, n_convs, files=64)
    out["corpus_gen_sec"] = round(time.time() - t0, 1)
    log("corpus_gen_sec=%s" % out["corpus_gen_sec"])

    import pyarrow.dataset as pads

    n_turns = pads.dataset(tdir, format="parquet").count_rows()
    out["n_turns"] = n_turns

    cfg = EngineConfig(
        window=2, eol="small", stem=True, math=True,
        salt_buckets=EngineConfig.suggest_salt_buckets(n_turns),
        partitions=16, block_size=128,
    )
    idx = f"/tmp/tangent_ray_soak/serve-idx-{n_convs}"
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    build_index(tdir, idx, cfg, TranscriptsCorpus(), batch_size=16384,
                build_shards=max(32, num_cpus * 4))
    out["build_sec"] = round(time.time() - t0, 1)
    log("build_sec=%s" % out["build_sec"])
    out["build_turns_per_sec"] = round(n_turns / (time.time() - t0))

    t0 = time.time()
    verify_index(idx)  # raises on any invariant violation
    out["verify_sec"] = round(time.time() - t0, 1)
    log("verify_sec=%s" % out["verify_sec"])
    out["verify_ok"] = True

    qs = query_set()
    reps = 8
    # serving reservations must leave headroom for the mid-soak index jobs
    # (delete/increment finalize are Ray Data tasks; an engine that
    # reserves every CPU deadlocks them — see engine.py docstring). Halve
    # the per-shard reservation when 8 shards would eat >= half the node.
    cps = 1.0 if num_cpus >= 16 else 0.5
    for n_shards in (4, 8):
        t0 = time.time()
        eng = ShardedEngine(idx, n_shards=n_shards, num_cpus_per_shard=cps)
        load_s = time.time() - t0
        log(f"engine n_shards={n_shards} loaded in {load_s:.1f}s")
        stats = lat_ms(eng, qs, reps)
        stats["engine_load_sec"] = round(load_s, 1)
        out[f"shards{n_shards}"] = stats
        log(f"shards{n_shards}: {stats}")
        if n_shards != 8:
            eng.shutdown()

    # --- tombstones mid-soak (engine from the 8-shard run stays up) -----
    base = eng.search(qs)
    victims = list(dict.fromkeys(base["docid"].to_pylist()))[:1000]
    t0 = time.time()
    delete_docs(idx, docids=victims)
    out["delete_sec"] = round(time.time() - t0, 1)
    log("delete_sec=%s" % out["delete_sec"])
    t0 = time.time()
    r = eng.refresh()
    out["refresh_after_delete_sec"] = round(time.time() - t0, 1)
    log("refresh_after_delete_sec=%s" % out["refresh_after_delete_sec"])
    assert r == {"new_partials": [], "reassigned": False}, r
    after = eng.search(qs)
    assert not set(after["docid"].to_pylist()) & set(victims)
    out["shards8_after_delete"] = lat_ms(eng, qs, reps)
    log("shards8_after_delete=%s" % out["shards8_after_delete"])

    # --- increment mid-soak ---------------------------------------------
    import pyarrow.parquet as pq

    inc_dir = f"/tmp/tangent_ray_soak/serve-inc-{n_convs}"
    os.makedirs(inc_dir, exist_ok=True)
    n_inc = max(2_000, n_convs // 48)  # ~2% of the corpus (50k at 2.4M)
    p = os.path.join(inc_dir, "inc.parquet")
    if not os.path.exists(p):
        pq.write_table(generate_conv_range(n_convs, n_convs + n_inc), p)
    t0 = time.time()
    m = add_increment(inc_dir, idx)
    out["increment_sec"] = round(time.time() - t0, 1)
    log("increment_sec=%s" % out["increment_sec"])
    out["n_docs_after_increment"] = m["n_docs"]
    t0 = time.time()
    r = eng.refresh()
    out["refresh_after_increment_sec"] = round(time.time() - t0, 1)
    log("refresh_after_increment_sec=%s" % out["refresh_after_increment_sec"])
    assert r["new_partials"] and not r["reassigned"], r
    out["shards8_after_increment"] = lat_ms(eng, qs, reps)
    # the increment's docs are actually served: results change vs base
    assert not eng.search(qs).equals(base)
    eng.shutdown()

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
