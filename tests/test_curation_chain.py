"""End-to-end curation chain: C4 line cleaning -> Gopher gate ->
paragraph dedup + cuts -> substring-window dedup + span cuts (Bloom
prefilter) -> source-mix resample, composed as Datasets. Verifies the ops
compose (schemas line up, ids survive), the chain is deterministic, and
each stage's row accounting is consistent."""

import numpy as np
import pyarrow as pa

from tangent_ray.ops.curation import c4_filter, source_mix_resample
from tangent_ray.ops.dedup import (
    apply_paragraph_cuts,
    apply_span_cuts,
    paragraph_dedup,
    window_dedup,
)
from tangent_ray.ops.textstats import gopher_filter


def _mk_corpus(n=60):
    rng = np.random.default_rng(21)
    words = [
        "system", "pipeline", "cluster", "worker", "process", "shuffle",
        "index", "compact", "block", "data", "batch", "corpus", "result",
        "log", "report", "network", "metric", "signal", "window", "filter",
        "engine", "stream", "vector", "column", "record", "schema",
        "buffer", "thread", "socket", "kernel", "module", "driver",
        "object", "memory", "storage", "compute", "runtime", "session",
        "request", "response",
    ]
    tails = ["with care.", "with ease.", "with zeal.", "with flair."]
    boiler = ("Subscribe to the newsletter for more updates and offers "
              "about the platform today.")
    texts, sources = [], []
    for i in range(n):
        lines = []
        for j in range(6):
            mid = " ".join(rng.choice(words, size=6))
            lines.append(f"the {mid} {rng.choice(tails)}")
        doc = "\n".join(lines)
        if i % 3 == 0:
            doc = boiler + "\n" + doc  # shared boilerplate line/span
        if i % 10 == 0:
            doc = doc + "\nshort junk line"  # dropped by C4
        texts.append(doc)
        sources.append(f"s{i % 4}")
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
        }
    )


def _collect(ds, cols):
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables([x.select(cols) for x in tabs])
    order = np.argsort(t[cols[0]].to_numpy(zero_copy_only=False))
    return t.take(pa.array(order))


def _run_chain():
    import ray
    import ray.data

    corpus = _mk_corpus()
    srcs = pa.table(
        {"doc_id": corpus["doc_id"], "source": corpus["source"]}
    )
    ds = ray.data.from_arrow(corpus)

    # 1. C4 line cleaning; keep passing docs with their rebuilt text
    c4 = c4_filter(ds)
    import pyarrow.compute as pc

    cleaned = c4.map_batches(
        lambda b: b.filter(pc.equal(b["keep"], True)).select(
            ["doc_id", "text"]
        ),
        batch_format="pyarrow",
    ).materialize()
    n_clean = cleaned.count()

    # 2. Gopher gate over the cleaned text (relaxed floor: short fixtures)
    gop = gopher_filter(cleaned, min_words=30)
    keep_ids = set(
        r["doc_id"] for r in gop.take_all() if r["keep"]
    )
    gated = cleaned.filter(
        lambda row: row["doc_id"] in keep_ids
    ).materialize()

    # 3. paragraph (line-block) dedup + cuts
    flags = paragraph_dedup(gated)
    deduped = apply_paragraph_cuts(gated, flags).materialize()

    # 4. substring-window dedup + Bloom-prefiltered span cuts
    spans = window_dedup(
        deduped.select_columns(["doc_id", "text"]), w=8, stride=2, shards=5
    )
    cut = apply_span_cuts(
        deduped.select_columns(["doc_id", "text"]), spans,
        shards=5, prefilter=True,
    ).materialize()

    # 5. re-attach source, resample the mix
    import ray.data as rd

    with_src = cut.map_batches(
        lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow"
    )
    src_map = {
        int(i): s
        for i, s in zip(
            srcs["doc_id"].to_pylist(), srcs["source"].to_pylist()
        )
    }

    def add_src(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        return b.append_column(
            "source", pa.array([src_map[i] for i in ids], type=pa.string())
        )

    final_in = with_src.map_batches(add_src, batch_format="pyarrow")
    mix = source_mix_resample(
        final_in, {"s0": 2.0, "s1": 1.0, "s2": 1.0}  # s3 dropped
    )
    return (
        n_clean,
        _collect(cut, ["doc_id", "text", "n_cut_tokens"]),
        _collect(mix, ["doc_id", "source", "epoch", "n_tok"]),
    )


def test_curation_chain_composes_and_is_deterministic(ray_session):
    n_clean, cut1, mix1 = _run_chain()
    assert n_clean > 0
    # every junk line is gone, boilerplate survives only in its first owner
    texts = cut1["text"].to_pylist()
    assert all("short junk line" not in (t or "") for t in texts)
    boiler_holders = [
        d for d, t in zip(cut1["doc_id"].to_pylist(), texts)
        if "subscribe to the newsletter" in (t or "").lower()
    ]
    assert len(boiler_holders) == 1
    # dropped source never appears in the mix
    assert "s3" not in set(mix1["source"].to_pylist())
    # run the whole chain again: byte-identical outputs
    _, cut2, mix2 = _run_chain()
    assert cut1.to_pydict() == cut2.to_pydict()
    assert mix1.to_pydict() == mix2.to_pydict()
