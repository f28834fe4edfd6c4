"""Dense-rank TAAT fast path: bit-identity with the classic sort-based
TAAT (docids AND float64 scores), across plain/hot/negated/synonym/boost
queries, tombstones, increments (stale-dense-cache hazard), and sharded
subset readers."""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc
import pytest

from tangent_ray.config import EngineConfig
from tangent_ray.fixtures import (
    generate_conv_range,
    query_set,
    write_transcripts,
)
from tangent_ray.index.build import add_increment, build_index
from tangent_ray.index.deletes import delete_docs
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import TranscriptsCorpus

CFG = EngineConfig(
    window=2, eol="small", stem=True, math=True,
    block_size=32, salt_buckets=4, partitions=3,
)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("dense")
    data_dir = str(root / "transcripts")
    out_dir = str(root / "index")
    write_transcripts(data_dir, 40, files=6)
    build_index(data_dir, out_dir, CFG, TranscriptsCorpus())
    return str(root), data_dir, out_dir


def _force(sc: QueryScorer, on: bool) -> None:
    """Force the dense path on (every query) or fully off."""
    if on:
        sc.dense_min_postings = 0
        sc.dense_ratio = 1 << 40
        sc.wand_min_postings = 1 << 62  # WAND would shadow dense
    else:
        sc.dense_min_postings = 1 << 62


def _text_queries():
    qs = query_set()
    return qs.filter(pc.equal(qs["kind"], "text"))


def _run(out_dir: str, on: bool, queries, check_marker: bool = True):
    sc = QueryScorer(out_dir)
    _force(sc, on)
    t = sc(queries)
    if on and check_marker:
        # last_stats is per query, so only check when the batch's final
        # query exercises the BM25 path
        assert sc.last_stats.get("dense_taat"), "dense path did not engage"
    return t


def assert_bit_identical(a, b):
    assert a.num_rows == b.num_rows
    for col in a.column_names:
        av, bv = a[col].to_pylist(), b[col].to_pylist()
        assert av == bv, col  # exact — floats included


def test_dense_vs_classic_identity(built):
    _, _, out_dir = built
    qs = _text_queries()
    assert_bit_identical(_run(out_dir, True, qs), _run(out_dir, False, qs))


def test_mixed_and_full_candidate_identity(built):
    """Mixed-fusion queries (text leg is a k=None full-candidate call, now
    dense + merge-fused) and math/mixed kinds end-to-end: forced-dense ==
    forced-classic, floats included."""
    _, _, out_dir = built
    qs = query_set()  # all kinds, incl. q014/q015/q023/q024 mixed
    a = _run(out_dir, True, qs, check_marker=False)
    sc = QueryScorer(out_dir)
    _force(sc, False)
    b = sc(qs)
    assert_bit_identical(a, b)


def test_dense_with_negation_and_groups(built):
    """Negated terms (per-query dead docs), synonym groups and boosts all
    go through the dense kernel's gplan/dead handling."""
    import pyarrow as pa

    _, _, out_dir = built
    rows = [
        {"query_id": "n1", "kind": "text", "text": "the spark -index"},
        {"query_id": "g1", "kind": "text", "text": "{query, term} spark"},
        {"query_id": "b1", "kind": "text", "text": "query^2 spark"},
        {"query_id": "p1", "kind": "text", "text": "quer* spark"},
    ]
    qs = pa.Table.from_pylist(rows)
    assert_bit_identical(_run(out_dir, True, qs), _run(out_dir, False, qs))


def test_dense_after_delete_and_increment(built, tmp_path):
    """Tombstones zero out in dense space; an add_increment shifts the
    dense rank space — reload() must drop the per-row dense caches (a
    stale cache mis-ranks silently, this is the test that would catch
    it)."""
    root, data_dir, _ = built
    out_dir = str(tmp_path / "idx2")
    build_index(data_dir, out_dir, CFG, TranscriptsCorpus())
    qs = _text_queries()

    sc_on = QueryScorer(out_dir)
    _force(sc_on, True)
    sc_off = QueryScorer(out_dir)
    _force(sc_off, False)
    base = sc_on(qs)  # warm the dense row caches pre-mutation

    victims = list(dict.fromkeys(base["docid"].to_pylist()))[:5]
    delete_docs(out_dir, docids=victims)
    inc_dir = str(tmp_path / "inc")
    import os

    import pyarrow.parquet as pq

    os.makedirs(inc_dir)
    pq.write_table(generate_conv_range(40, 52), f"{inc_dir}/i.parquet")
    add_increment(inc_dir, out_dir)

    sc_on.refresh()
    sc_off.refresh()
    a, b = sc_on(qs), sc_off(qs)
    assert_bit_identical(a, b)
    assert not set(a["docid"].to_pylist()) & set(victims)
    assert not a.equals(base)  # the mutations are visible


def test_dense_sharded_subset_reader(built):
    """A subset (shard) reader's dense space is its own partials' docmaps;
    per-shard dense results must equal per-shard classic results."""
    import json
    import os

    _, _, out_dir = built
    with open(os.path.join(out_dir, "manifest.json")) as f:
        partials = json.load(f)["partials"]
    assert len(partials) >= 2
    qs = _text_queries()
    for group in (partials[0::2], partials[1::2]):
        sc_on = QueryScorer(out_dir, partials=group)
        _force(sc_on, True)
        sc_off = QueryScorer(out_dir, partials=group)
        _force(sc_off, False)
        assert_bit_identical(sc_on(qs), sc_off(qs))


def test_documents_corpus_dense_identity(ray_session, tmp_path):
    """Documents-corpus indexes carry the docmap sidecar too (raw-int64
    docid rule), so the dense path engages and is bit-identical there."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tangent_ray.config import SQL_PARITY_CONFIG
    from tangent_ray.sources.corpus import DocumentsCorpus

    src = str(tmp_path / "docs")
    os.makedirs(src)
    docs = [
        " ".join(
            ["alpha", "beta", "gamma", "delta"][(i + j) % 4]
            for j in range(3 + i % 7)
        )
        for i in range(120)
    ]
    for fi in range(2):
        sl = slice(fi, None, 2)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        list(range(1, len(docs) + 1))[sl], pa.int64()
                    ),
                    "text": pa.array(docs[sl], pa.string()),
                }
            ),
            os.path.join(src, f"d{fi}.parquet"),
        )
    out = str(tmp_path / "idx")
    import dataclasses

    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=2),
                DocumentsCorpus())
    sc = QueryScorer(out)
    dd = sc.reader.dense_docids()
    assert dd is not None and len(dd) == len(docs)
    assert dd.tolist() == list(range(1, len(docs) + 1))  # raw-id rule
    for q in ("alpha beta", "{alpha,beta} gamma", "alpha -delta"):
        sc_on = QueryScorer(out)
        _force(sc_on, True)
        sc_off = QueryScorer(out)
        _force(sc_off, False)
        d1, s1 = sc_on.score_query(q, "text", 50)
        assert sc_on.last_stats.get("dense_taat"), q
        d2, s2 = sc_off.score_query(q, "text", 50)
        assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist(), q
