"""Positional postings streaming semantics (LSM parity with the main
index, SURVEY §2.9): increments flip live atomically via the manifest,
tombstones hide docs immediately, compaction purges them physically and
enforces cross-increment docid uniqueness — all pinned by identity against
a fresh build over the equivalent corpus."""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pytest

from tangent_ray.index.positions import (
    POS_MANIFEST,
    PositionsReader,
    add_position_increment,
    build_position_index,
    compact_positions,
    delete_position_docs,
    load_position_tombstones,
    phrase_search,
    positions_reader,
    proximity_search,
    span_near_search,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]


def _corpus(rng, n_docs, id_base=0):
    ids = [id_base + i * 3 + 1 for i in range(n_docs)]  # sparse, sorted
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


def _assert_query_identity(live_dir: str, ref_dir: str, rng, n=6):
    """All three query families answer identically on two dirs."""
    for _ in range(n):
        q = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 3)))
        k = rng.choice([5, 1000])
        assert phrase_search(live_dir, q, k=k).equals(
            phrase_search(ref_dir, q, k=k)
        ), ("phrase", q)
        w = rng.randint(0, 10)
        assert proximity_search(live_dir, q, window=w, k=k).equals(
            proximity_search(ref_dir, q, window=w, k=k)
        ), ("prox", q, w)
        s = rng.randint(0, 10)
        assert span_near_search(live_dir, q, slop=s, k=k).equals(
            span_near_search(ref_dir, q, slop=s, k=k)
        ), ("span", q, s)


def test_increment_matches_full_rebuild(ray_session, tmp_path):
    """base build + add_position_increment == one build over the union,
    for every query family; and the resident reader cache picks the
    increment up without manual invalidation."""
    import ray.data

    rng = random.Random(11)
    ids_a, docs_a = _corpus(rng, 30)
    ids_b, docs_b = _corpus(rng, 12, id_base=1000)
    live = str(tmp_path / "live")
    build_position_index(
        ray.data.from_arrow(_table(ids_a, docs_a)).repartition(2), live,
        num_shards=4,
    )
    # warm the resident reader on the pre-increment view
    pre = phrase_search(live, "alpha beta", k=1000)
    m = add_position_increment(
        ray.data.from_arrow(_table(ids_b, docs_b)).repartition(2), live,
        num_shards=4,
    )
    assert m["name"] == "inc00000" and m["n_terms"] > 0
    full = str(tmp_path / "full")
    build_position_index(
        ray.data.from_arrow(_table(ids_a + ids_b, docs_a + docs_b)), full,
        num_shards=4,
    )
    _assert_query_identity(live, full, rng)
    # second increment stacks
    ids_c, docs_c = _corpus(rng, 8, id_base=5000)
    add_position_increment(ray.data.from_arrow(_table(ids_c, docs_c)), live)
    full2 = str(tmp_path / "full2")
    build_position_index(
        ray.data.from_arrow(
            _table(ids_a + ids_b + ids_c, docs_a + docs_b + docs_c)
        ),
        full2, num_shards=4,
    )
    _assert_query_identity(live, full2, rng)
    assert not phrase_search(live, "alpha beta", k=1000).equals(pre) or (
        "alpha beta" not in " ".join(docs_b + docs_c)
    )


def test_delete_then_compact_matches_reduced_rebuild(ray_session, tmp_path):
    """Tombstoned docs stop matching immediately; compact_positions purges
    them physically (tombstone files cleared, one row per term) and the
    answers stay identical to a fresh build over the reduced corpus."""
    import ray.data

    rng = random.Random(23)
    ids, docs = _corpus(rng, 40)
    live = str(tmp_path / "live")
    build_position_index(
        ray.data.from_arrow(_table(ids, docs)).repartition(3), live,
        num_shards=4,
    )
    victims = ids[::5]
    keep = [(i, d) for i, d in zip(ids, docs) if i not in set(victims)]
    delete_position_docs(live, victims)
    assert load_position_tombstones(live).size == len(victims)
    reduced = str(tmp_path / "reduced")
    build_position_index(
        ray.data.from_arrow(_table([i for i, _ in keep],
                                   [d for _, d in keep])),
        reduced, num_shards=4,
    )
    _assert_query_identity(live, reduced, rng)
    hit_docs = phrase_search(live, "alpha", k=10_000)["docid"].to_pylist()
    assert not set(hit_docs) & set(victims)

    out = compact_positions(live, num_shards=4)
    assert out["n_tombstones_purged"] == len(victims)
    assert load_position_tombstones(live).size == 0
    r = PositionsReader(live)
    assert all(len(v) == 1 for v in r.lookup.values())  # one row per term
    _assert_query_identity(live, reduced, rng)


def test_increment_delete_compact_interleaved(ray_session, tmp_path):
    """The full lifecycle in one dir: build -> increment -> delete (from
    both runs) -> compact -> another increment; identity against the
    equivalent fresh build at every step."""
    import ray.data

    rng = random.Random(37)
    ids_a, docs_a = _corpus(rng, 25)
    ids_b, docs_b = _corpus(rng, 10, id_base=2000)
    live = str(tmp_path / "live")
    build_position_index(ray.data.from_arrow(_table(ids_a, docs_a)), live,
                         num_shards=4)
    add_position_increment(ray.data.from_arrow(_table(ids_b, docs_b)), live,
                           num_shards=4)
    victims = set(ids_a[:4] + ids_b[:3])
    delete_position_docs(live, sorted(victims))
    compact_positions(live, num_shards=4)
    ids_c, docs_c = _corpus(rng, 6, id_base=9000)
    add_position_increment(ray.data.from_arrow(_table(ids_c, docs_c)), live,
                           num_shards=4)
    pairs = [
        (i, d)
        for i, d in zip(ids_a + ids_b + ids_c, docs_a + docs_b + docs_c)
        if i not in victims
    ]
    ref = str(tmp_path / "ref")
    build_position_index(
        ray.data.from_arrow(_table([i for i, _ in pairs],
                                   [d for _, d in pairs])),
        ref, num_shards=4,
    )
    _assert_query_identity(live, ref, rng)


def test_reingest_duplicate_doc_raises(ray_session, tmp_path):
    """Re-ingesting an already-indexed doc via an increment is input
    corruption: the reader's run merge raises at query time, and
    compact_positions raises during the re-encode (the uniqueness
    verifier)."""
    import ray.data

    live = str(tmp_path / "dup")
    t = _table([3, 9], ["alpha beta", "beta gamma"])
    build_position_index(ray.data.from_arrow(t), live, num_shards=2)
    add_position_increment(ray.data.from_arrow(t), live, num_shards=2)
    with pytest.raises(ValueError, match="duplicate docid"):
        PositionsReader(live).term_postings("beta")
    with pytest.raises(Exception, match="duplicate docid"):
        compact_positions(live, num_shards=2)


def test_manifest_governs_active_files(ray_session, tmp_path):
    """A stray parquet dropped next to a manifest-bearing dir is ignored
    (the manifest is the view), and the resident-reader signature follows
    manifest flips, not directory listings."""
    import ray.data

    live = str(tmp_path / "m")
    build_position_index(
        ray.data.from_arrow(_table([1], ["alpha beta"])), live, num_shards=2
    )
    assert os.path.exists(os.path.join(live, POS_MANIFEST))
    r1 = positions_reader(live)
    # stage an unreferenced file the way a crashed increment would
    stray = str(tmp_path / "stray")
    build_position_index(
        ray.data.from_arrow(_table([2], ["alpha beta"])), stray, num_shards=2
    )
    import shutil

    for f in os.listdir(stray):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(stray, f),
                        os.path.join(live, "zz-" + f))
    assert positions_reader(live) is r1  # signature unchanged: same view
    got = phrase_search(live, "alpha beta", k=10)
    assert got["docid"].to_pylist() == [1]
    # a delete flips the signature (new reader), not just the answers
    delete_position_docs(live, [1])
    assert positions_reader(live) is not r1
    assert phrase_search(live, "alpha beta", k=10).num_rows == 0
