"""Resident ShardedEngine: identity with unsharded search, and in-place
refresh() across tombstones, increments, and a compaction that rewrites the
partial list."""

import os

import pyarrow.parquet as pq
import pytest

from tangent_ray.config import EngineConfig
from tangent_ray.fixtures import generate_conv_range, query_set, write_transcripts
from tangent_ray.index.build import add_increment, build_index
from tangent_ray.query.engine import ShardedEngine
from tangent_ray.query.scorer import search
from tangent_ray.sources.corpus import TranscriptsCorpus

CFG = EngineConfig(
    window=2, eol="small", stem=True, math=True,
    block_size=32, salt_buckets=4, partitions=3,
)
N_CONVS = 40


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("engine")
    data_dir = str(root / "transcripts")
    out_dir = str(root / "index")
    write_transcripts(data_dir, N_CONVS, files=6)
    build_index(data_dir, out_dir, CFG, TranscriptsCorpus())
    return str(root), out_dir


def norm(table):
    df = table.to_pandas() if not hasattr(table, "groupby") else table
    if not hasattr(df, "groupby"):
        df = df.to_pandas()
    return {
        qid: list(zip(g.sort_values("rank")["docid"],
                      g.sort_values("rank")["score"].round(12)))
        for qid, g in df.groupby("query_id")
    }


def assert_same(a, b):
    fa, fb = norm(a), norm(b)
    assert set(fa) == set(fb)
    for qid in fa:
        assert fa[qid] == fb[qid], qid


def test_engine_identity_and_repeat(built):
    """Engine results == unsharded search (incl. mixed-kind fusion queries
    through the lazy full-index worker), and a second call on the SAME
    resident actors returns the identical table (no per-call state
    leaking)."""
    _, out_dir = built
    eng = ShardedEngine(out_dir, n_shards=3)
    try:
        full = search(query_set(), out_dir, concurrency=1).to_pandas()
        got1 = eng.search(query_set())
        got2 = eng.search(query_set())
        assert_same(got1, full)
        assert got1.equals(got2)
    finally:
        eng.shutdown()


def test_engine_refresh_tombstones_increment_compaction(built):
    """One resident engine across the index's whole life: a delete is
    invisible until refresh(); an increment's docs AND its global-stats
    shift (N/avgdl/df change every BM25 score) arrive with refresh();
    purge_deletes rewrites the partial list and refresh() re-assigns.
    After every step the engine is score-identical to a FRESH unsharded
    search over the index as it stands."""
    import pandas as pd

    from tangent_ray.index.deletes import delete_docs, purge_deletes

    root, _ = built
    # private index copy: this test mutates it
    data_dir = os.path.join(root, "transcripts")
    idx = os.path.join(root, "mut_idx")
    build_index(data_dir, idx, CFG, TranscriptsCorpus())

    qs = query_set()
    eng = ShardedEngine(idx, n_shards=2)
    try:
        base = eng.search(qs)
        assert base.num_rows > 0

        # -- tombstones: stale until refresh, exact after ----------------
        victims = pd.unique(base.to_pandas()["docid"])[:5].tolist()
        delete_docs(idx, docids=victims)
        stale = eng.search(qs)
        assert stale.equals(base)  # resident actors hold old live-docs
        r = eng.refresh()
        assert r == {"new_partials": [], "reassigned": False}
        after_del = eng.search(qs)
        assert not set(after_del.to_pandas()["docid"]) & set(victims)
        assert_same(after_del, search(qs, idx, concurrency=1).to_pandas())

        # -- increment: new docs + global-stats shift ---------------------
        inc = os.path.join(root, "inc")
        os.makedirs(inc, exist_ok=True)
        pq.write_table(
            generate_conv_range(N_CONVS, N_CONVS + 12),
            os.path.join(inc, "a.parquet"),
        )
        add_increment(inc, idx)
        r = eng.refresh()
        assert r["new_partials"] and not r["reassigned"]
        after_inc = eng.search(qs)
        assert_same(after_inc, search(qs, idx, concurrency=1).to_pandas())
        assert not base.equals(after_inc)  # stats shift actually observed

        # -- compaction: partial list rewritten -> reassign ---------------
        purge_deletes(idx)
        r = eng.refresh()
        assert r["reassigned"]
        after_purge = eng.search(qs)
        assert_same(after_purge, search(qs, idx, concurrency=1).to_pandas())
        assert not set(after_purge.to_pandas()["docid"]) & set(victims)
    finally:
        eng.shutdown()


def test_engine_mixed_bounds_edges(built):
    """The two-phase sharded fusion protocol's edge paths, each pinned
    against unsharded search: an empty text leg (every shard reports
    n==0, normalization skipped), an empty math leg (bounds still drive
    a real min-max normalize), and both fallback kinds (n==-1: a
    formula-only and a text-only query sent with kind="mixed")."""
    import pyarrow as pa

    _, out_dir = built
    qs = pa.Table.from_pylist([
        {"query_id": "e1", "kind": "mixed",
         "text": "zzznotaword $[V!x[+[V!p,a[N!2]]]]$", "topk": 10},
        {"query_id": "e2", "kind": "mixed",
         "text": "merge query $[V!zzznotavar]$", "topk": 10},
        {"query_id": "e3", "kind": "mixed", "text": "$[V!x,b[N!3]]$",
         "topk": 10},
        {"query_id": "e4", "kind": "mixed", "text": "merge query",
         "topk": 10},
    ])
    eng = ShardedEngine(out_dir, n_shards=3)
    try:
        full = search(qs, out_dir, concurrency=1).to_pandas()
        assert_same(eng.search(qs), full)
    finally:
        eng.shutdown()
