"""Resident sharded positional serving: PositionalEngine answers
identically to the single-process reader path across all three query
families, follows increments/deletes/compactions via refresh(), and
catches cross-shard duplicate docids."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from tangent_ray.index.positions import (
    PositionalEngine,
    add_position_increment,
    build_position_index,
    compact_positions,
    delete_position_docs,
    phrase_search,
    proximity_search,
    span_near_search,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]


def _corpus(rng, n_docs, id_base=0):
    ids = [id_base + i * 3 + 1 for i in range(n_docs)]
    docs = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 30)))
        for _ in range(n_docs)
    ]
    return ids, docs


def _table(ids, docs):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )


def _assert_engine_matches_local(eng, pos_dir, rng, n=8):
    for _ in range(n):
        q = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 3)))
        k = rng.choice([5, 1000])
        assert eng.phrase(q, k=k).equals(phrase_search(pos_dir, q, k=k)), q
        w = rng.randint(0, 10)
        assert eng.proximity(q, window=w, k=k).equals(
            proximity_search(pos_dir, q, window=w, k=k)
        ), (q, w)
        s = rng.randint(0, 10)
        assert eng.span_near(q, slop=s, k=k).equals(
            span_near_search(pos_dir, q, slop=s, k=k)
        ), (q, s)


def test_engine_identity_and_lifecycle(ray_session, tmp_path):
    import ray.data

    rng = random.Random(5)
    ids, docs = _corpus(rng, 50)
    live = str(tmp_path / "pos")
    build_position_index(
        ray.data.from_arrow(_table(ids, docs)).repartition(3), live,
        num_shards=6,
    )
    eng = PositionalEngine(live, n_shards=3)
    try:
        _assert_engine_matches_local(eng, live, rng)

        # increment -> new files to the smallest group only
        ids_b, docs_b = _corpus(rng, 15, id_base=7000)
        add_position_increment(
            ray.data.from_arrow(_table(ids_b, docs_b)), live, num_shards=6
        )
        r = eng.refresh()
        assert r["new_files"] > 0 and not r["reassigned"]
        _assert_engine_matches_local(eng, live, rng)

        # delete -> every shard reloads (tombstone change), docs vanish
        victims = ids[::6]
        delete_position_docs(live, victims)
        r = eng.refresh()
        assert r["reloaded"] == list(range(len(eng._actors)))
        hits = eng.phrase("alpha", k=10_000)["docid"].to_pylist()
        assert not set(hits) & set(victims)
        _assert_engine_matches_local(eng, live, rng)

        # compaction rewrites the file set -> full reassignment
        compact_positions(live, num_shards=6)
        r = eng.refresh()
        assert r["reassigned"]
        _assert_engine_matches_local(eng, live, rng)
    finally:
        eng.shutdown()


def test_engine_duplicate_across_shards_raises(ray_session, tmp_path):
    """The same doc indexed in base AND increment lands on different
    shard actors; the driver-side run merge must still catch it."""
    import ray.data

    live = str(tmp_path / "dup")
    t = _table([3, 9], ["alpha beta", "beta gamma"])
    build_position_index(ray.data.from_arrow(t), live, num_shards=2)
    add_position_increment(ray.data.from_arrow(t), live, num_shards=2)
    eng = PositionalEngine(live, n_shards=2)
    try:
        with pytest.raises(Exception, match="duplicate docid"):
            eng.phrase("beta", k=5)
    finally:
        eng.shutdown()


def test_fetch_cache_eviction_mixed_hit_miss(ray_session, tmp_path):
    """A query mixing a cached term with a miss must not evict (then
    KeyError on) the cached term while filling the miss — the resident
    LRU regression from long-running serving."""
    import ray.data

    live = str(tmp_path / "lru")
    ids, docs = _corpus(random.Random(11), 30)
    build_position_index(ray.data.from_arrow(_table(ids, docs)), live,
                         num_shards=4)
    eng = PositionalEngine(live, n_shards=2)
    try:
        eng.FETCH_CACHE = 2  # instance override: tiny cache
        local = {t: phrase_search(live, t, k=10_000) for t in VOCAB[:4]}
        eng.fetch_terms(["alpha"])
        eng.fetch_terms(["beta"])   # cache now full: {alpha, beta}
        # hit alpha + miss gamma: the old fill evicted alpha, then
        # crashed popping it; the fix touches hits first
        got = eng.fetch_terms(["alpha", "gamma"])
        assert set(got) == {"alpha", "gamma"}
        # request larger than the cache: must still answer, cache may
        # transiently exceed its cap but shrinks on the next call
        got = eng.fetch_terms(["alpha", "beta", "gamma", "delta"])
        assert set(got) == {"alpha", "beta", "gamma", "delta"}
        eng.fetch_terms(["eps"])
        assert len(eng._fetch_cache) <= eng.FETCH_CACHE + 1
        # served results stay correct end-to-end
        for t in VOCAB[:4]:
            assert eng.phrase(t, k=10_000).equals(local[t])
    finally:
        eng.shutdown()


def test_distributed_kernels_identity(ray_session, tmp_path):
    """Forcing the doc-range-distributed kernel path (DIST_MIN_SUMDF=0)
    answers identically to the single-process reader across all four
    kernel families, through increments + deletes, with search_after
    paging — postings never materialize on the driver."""
    import numpy as np
    import ray.data

    from tangent_ray.index.positions import phrase_doc_tfs

    rng = random.Random(23)
    ids, docs = _corpus(rng, 120)
    live = str(tmp_path / "dist")
    build_position_index(
        ray.data.from_arrow(_table(ids, docs)).repartition(4), live,
        num_shards=8,
    )
    eng = PositionalEngine(live, n_shards=3)
    try:
        eng.DIST_MIN_SUMDF = 0  # force the distributed path
        eng.MAX_RANGES = 4
        _assert_engine_matches_local(eng, live, rng, n=10)

        # doc_tfs hook: distributed == local for exact and sloppy
        for q, s in [("alpha beta", 0), ("alpha gamma", 2), ("beta", 0)]:
            terms = q.split()
            d1, t1 = phrase_doc_tfs(eng, terms, s)
            d2, t2 = phrase_doc_tfs(live, terms, s)
            assert d1.tolist() == d2.tolist(), (q, s)
            assert t1.tolist() == t2.tolist(), (q, s)

        # search_after pages reconstruct the full ranking exactly
        full = eng.phrase("alpha", k=10_000)
        pages, cur = [], None
        while True:
            pg = eng.phrase("alpha", k=7, search_after=cur)
            if not pg.num_rows:
                break
            pages.append(pg)
            cur = (
                pg["n_occurrences"][-1].as_py(), pg["docid"][-1].as_py()
            )
        assert pa.concat_tables(pages).equals(full)
        sp_full = eng.span_near("alpha beta", slop=3, k=10_000)
        pages, cur = [], None
        while True:
            pg = eng.span_near("alpha beta", slop=3, k=5, search_after=cur)
            if not pg.num_rows:
                break
            pages.append(pg)
            cur = (pg["min_span"][-1].as_py(), pg["docid"][-1].as_py())
        assert pa.concat_tables(pages).equals(sp_full)

        # lifecycle: increment + delete, identity holds on the new view
        ids_b, docs_b = _corpus(random.Random(29), 40, id_base=9000)
        add_position_increment(
            ray.data.from_arrow(_table(ids_b, docs_b)), live, num_shards=8
        )
        eng.refresh()
        _assert_engine_matches_local(eng, live, rng, n=6)
        delete_position_docs(live, ids[::5])
        eng.refresh()
        _assert_engine_matches_local(eng, live, rng, n=6)
        # missing term short-circuits with zero postings moved
        assert eng.phrase("zzzmissing alpha", k=5).num_rows == 0
        assert eng.proximity("zzzmissing alpha", window=4, k=5).num_rows == 0
    finally:
        eng.shutdown()


def test_distributed_duplicate_docid_raises(ray_session, tmp_path):
    """A doc double-indexed across increments lands in the SAME doc range
    (ranges split by docid), so the in-task run merge still catches it."""
    import ray.data

    live = str(tmp_path / "dup2")
    t = _table(list(range(1, 40)), ["alpha beta"] * 39)
    build_position_index(ray.data.from_arrow(t), live, num_shards=2)
    add_position_increment(ray.data.from_arrow(t), live, num_shards=2)
    eng = PositionalEngine(live, n_shards=2)
    try:
        eng.DIST_MIN_SUMDF = 0
        with pytest.raises(Exception, match="duplicate docid"):
            eng.phrase("beta", k=5)
    finally:
        eng.shutdown()


def test_doc_partitioned_layout_identity(ray_session, tmp_path):
    """build_position_index(doc_partitions=R) — the document-partitioned
    serving layout (Lucene/ES shard model): the engine broadcasts each
    query's kernel to doc-disjoint part actors, only partials move, and
    answers are identical to the term-sharded single-process path
    through the full D/E/T lifecycle, pagination and doc_tfs included."""
    import ray.data

    from tangent_ray.index.positions import (
        phrase_doc_tfs,
        read_doc_partitions,
    )

    rng = random.Random(47)
    ids, docs = _corpus(rng, 130)
    dpart = str(tmp_path / "dpart")
    flat = str(tmp_path / "flat")
    t = _table(ids, docs)
    build_position_index(
        ray.data.from_arrow(t).repartition(3), dpart, num_shards=4,
        doc_partitions=6,
    )
    build_position_index(ray.data.from_arrow(t).repartition(3), flat,
                         num_shards=4)
    assert read_doc_partitions(dpart) == 6
    assert read_doc_partitions(flat) == 0
    eng = PositionalEngine(dpart, n_shards=3)
    try:
        assert eng.doc_partitions == 6
        _assert_engine_matches_local(eng, flat, rng, n=8)
        assert eng.dist_queries > 0  # partitioned path actually served

        # doc_tfs (the scorer's scored-phrase hook) matches too
        for terms, s in [(["alpha", "beta"], 0), (["alpha", "gamma"], 2)]:
            d1, t1 = phrase_doc_tfs(eng, terms, s)
            d2, t2 = phrase_doc_tfs(flat, terms, s)
            assert d1.tolist() == d2.tolist() and t1.tolist() == t2.tolist()

        # increment inherits the layout; identity holds on the new view
        ids_b, docs_b = _corpus(random.Random(48), 40, id_base=9000)
        add_position_increment(
            ray.data.from_arrow(_table(ids_b, docs_b)), dpart, num_shards=4
        )
        add_position_increment(
            ray.data.from_arrow(_table(ids_b, docs_b)), flat, num_shards=4
        )
        eng.refresh()
        _assert_engine_matches_local(eng, flat, rng, n=5)

        # tombstones
        victims = ids[::6]
        delete_position_docs(dpart, victims)
        delete_position_docs(flat, victims)
        eng.refresh()
        hits = eng.phrase("alpha", k=10_000)["docid"].to_pylist()
        assert not set(hits) & set(victims)
        _assert_engine_matches_local(eng, flat, rng, n=5)

        # compaction preserves the layout
        compact_positions(dpart, num_shards=4)
        compact_positions(flat, num_shards=4)
        assert read_doc_partitions(dpart) == 6
        eng.refresh()
        _assert_engine_matches_local(eng, flat, rng, n=5)

        # pagination on the partitioned path reconstructs the full order
        full = eng.phrase("alpha", k=10_000)
        pages, cur = [], None
        while True:
            pg = eng.phrase("alpha", k=5, search_after=cur)
            if not pg.num_rows:
                break
            pages.append(pg)
            cur = (pg["n_occurrences"][-1].as_py(),
                   pg["docid"][-1].as_py())
        assert pa.concat_tables(pages).equals(full)
    finally:
        eng.shutdown()


def test_doc_partitioned_duplicate_docid_raises(ray_session, tmp_path):
    """A doc double-indexed lands in the SAME partition (stable docid
    hash), so the part actor's run merge still catches it."""
    import ray.data

    live = str(tmp_path / "dupdp")
    t = _table(list(range(1, 30)), ["alpha beta"] * 29)
    build_position_index(ray.data.from_arrow(t), live, num_shards=2,
                         doc_partitions=4)
    add_position_increment(ray.data.from_arrow(t), live, num_shards=2)
    eng = PositionalEngine(live, n_shards=2)
    try:
        with pytest.raises(Exception, match="duplicate docid"):
            eng.phrase("beta", k=5)
    finally:
        eng.shutdown()


def test_doc_partitioned_hash_ids_fuzz(ray_session, tmp_path):
    """Doc-partitioned identity under transcript-style 62-bit hash
    docids and forced multi-run hot terms (tiny run cap) — the layout's
    docid hash and run routing must hold off the sequential-id happy
    path."""
    import ray.data

    rng = random.Random(53)
    ids = sorted(rng.sample(range(1, 1 << 62), 100))
    docs = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 30)))
        for _ in range(100)
    ]
    dpart = str(tmp_path / "dp")
    flat = str(tmp_path / "fl")
    t = _table(ids, docs)
    build_position_index(
        ray.data.from_arrow(t).repartition(3), dpart, num_shards=4,
        doc_partitions=5, max_run_positions=128,
    )
    build_position_index(ray.data.from_arrow(t).repartition(3), flat,
                         num_shards=4)
    eng = PositionalEngine(dpart, n_shards=3)
    try:
        _assert_engine_matches_local(eng, flat, rng, n=10)
        assert eng.dist_queries > 0
    finally:
        eng.shutdown()


def test_distributed_all_rarest_tombstoned(ray_session, tmp_path):
    """df counts tombstoned docs: when every posting of a query's rarest
    term is dead, the distributed planner must return empty (not crash
    on an empty boundary sample)."""
    import ray.data

    live = str(tmp_path / "tomb")
    # 'gamma' appears only in docs 2 and 4; everything else is hot
    t = _table(
        [1, 2, 3, 4, 5],
        ["alpha beta", "alpha gamma", "alpha beta", "gamma beta", "alpha"],
    )
    build_position_index(ray.data.from_arrow(t), live, num_shards=2)
    delete_position_docs(live, [2, 4])
    eng = PositionalEngine(live, n_shards=2)
    try:
        eng.DIST_MIN_SUMDF = 0
        assert eng.phrase("alpha gamma", k=5).num_rows == 0
        assert eng.proximity("gamma beta", window=3, k=5).num_rows == 0
        assert eng.span_near("gamma beta", slop=2, k=5).num_rows == 0
        from tangent_ray.index.positions import phrase_doc_tfs

        d, tf = phrase_doc_tfs(eng, ["gamma", "beta"], 0)
        assert len(d) == 0 and len(tf) == 0
        # live terms still answer
        assert eng.phrase("alpha beta", k=5).num_rows > 0
    finally:
        eng.shutdown()
