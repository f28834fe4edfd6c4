"""Scale soak for the round-3b wave: conversation analytics (ops/conv.py)
over a large synthetic transcripts corpus, and model-based curation
(ops/classify.py) over the bench_ops documents corpus.

Usage: python tools/soak_round3b.py [n_convs] [n_docs] [num_cpus]
Defaults 200k convs (~1.7 M turns) / 1 M docs / 32 CPUs. Results stream
(``.count()``); only the bounded model tables ever land on the driver.
Prints ONE JSON line of per-op wall seconds + throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else int(
        os.environ.get("RAY_GRAFT_CPUS", "32")
    )

    import logging

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from bench_ops import write_corpus

    from tangent_ray.fixtures import write_transcripts
    from tangent_ray.ops.classify import dsir_sample, nb_score, nb_train
    from tangent_ray.ops.conv import (
        assemble_examples,
        conv_dedup,
        conv_stats,
        tool_transitions,
    )

    tdir = f"/tmp/tangent_ray_cache/soak-transcripts-{n_convs}"
    write_transcripts(tdir, n_convs, files=32)
    ddir = write_corpus(f"/tmp/tangent_ray_cache/opsbench-v2-{n_docs}", n_docs)

    def tds():
        return ray.data.read_parquet(tdir)

    def dds():
        ds = ray.data.read_parquet(
            ddir, columns=["doc_id", "text", "source"]
        )

        def lab(b: pa.Table) -> pa.Table:
            # deterministic seed label: single-digit sources (src0..src9)
            # positive, the rest negative — a balanced 10/10 split
            return b.append_column(
                "label", pc.equal(pc.binary_length(b["source"]), 4)
            )

        return ds.map_batches(lab, batch_format="pyarrow")

    # untimed warm-up: worker spawn + lazy imports off the first op's clock
    tds().map_batches(
        lambda b: pa.table({"n": [b.num_rows]}), batch_format="pyarrow"
    ).count()

    n_turns = tds().count()
    results: dict[str, dict] = {}

    def run(name, fn, unit_n, unit):
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        results[name] = {
            "wall_s": round(wall, 2),
            "rows_out": out,
            "per_s": round(unit_n / wall),
            "unit": unit,
        }
        print(f"[soak] {name}: {wall:.2f}s, {out} rows out,"
              f" {unit_n / wall:,.0f} {unit}/s", flush=True)

    run("conv_stats", lambda: conv_stats(tds()).count(), n_turns, "turns")
    run("tool_transitions", lambda: tool_transitions(tds()).count(),
        n_turns, "turns")
    run("conv_dedup", lambda: conv_dedup(tds()).count(), n_turns, "turns")
    run("assemble_examples",
        lambda: assemble_examples(tds(), k_context=3).count(),
        n_turns, "turns")

    def nb():
        model = nb_train(dds())
        return nb_score(dds(), model).count()

    run("nb_train_score", nb, n_docs, "docs")
    run("dsir_sample",
        lambda: dsir_sample(dds(), k=n_docs // 10).count(), n_docs, "docs")

    print(json.dumps(
        {"metric": "soak_round3b", "n_convs": n_convs, "n_turns": n_turns,
         "n_docs": n_docs, "num_cpus": num_cpus, "ops": results}
    ))
    ray.shutdown()


if __name__ == "__main__":
    main()
