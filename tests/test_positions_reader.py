"""Term-sharded positional postings: index-vs-scan identity on randomized
corpora (the positional-identity pin for the O(df) layout), multi-run
merge (increment layout), hash-scale docids, and reader cache
invalidation."""

from __future__ import annotations

import os
import random
import shutil

import pyarrow as pa
import pytest

from tangent_ray.index.positions import (
    PositionsReader,
    build_position_index,
    phrase_count_scan,
    phrase_search,
    proximity_scan,
    proximity_search,
    span_near_scan,
    span_near_search,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]


def _corpus(rng, n_docs, hash_ids=False):
    ids = (
        sorted(rng.sample(range(1, (1 << 62)), n_docs))
        if hash_ids
        else list(range(n_docs))
    )
    docs = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 40)))
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


def _rows(t):
    return list(zip(*(t[c].to_pylist() for c in t.column_names)))


@pytest.mark.parametrize("hash_ids", [False, True])
def test_index_vs_scan_identity(ray_session, tmp_path, hash_ids):
    """The positional-identity pin: for fuzzed corpora (including
    transcript-style 62-bit hash docids), the O(df) index path returns
    byte-identical tables to the index-free scan twin across all three
    query families."""
    import ray.data

    rng = random.Random(42 + hash_ids)
    for case in range(3):
        ids, docs = _corpus(rng, rng.randint(5, 60), hash_ids)
        ds = ray.data.from_arrow(_table(ids, docs)).repartition(3)
        out = str(tmp_path / f"px{hash_ids}{case}")
        build_position_index(ds, out, num_shards=8)
        for _ in range(4):
            q = " ".join(
                rng.choice(VOCAB) for _ in range(rng.randint(1, 3))
            )
            k = rng.choice([3, 10, 1000])
            assert phrase_search(out, q, k=k).equals(
                phrase_count_scan(ds, q, k=k)
            ), (case, q, "phrase")
            w = rng.randint(0, 12)
            assert proximity_search(out, q, window=w, k=k).equals(
                proximity_scan(ds, q, window=w, k=k)
            ), (case, q, w, "prox")
            s = rng.randint(0, 12)
            assert span_near_search(out, q, slop=s, k=k).equals(
                span_near_scan(ds, q, slop=s, k=k)
            ), (case, q, s, "span")


def test_multi_run_merge_matches_single_build(ray_session, tmp_path):
    """Two increments' shard files in one dir (a term then has one row per
    increment, docid ranges interleaved because ids hash): the reader's
    run merge must answer exactly like one build over the union."""
    import ray.data

    rng = random.Random(7)
    ids, docs = _corpus(rng, 40, hash_ids=True)
    # interleave: even rows -> increment A, odd rows -> increment B
    a = ([ids[i] for i in range(0, len(ids), 2)],
         [docs[i] for i in range(0, len(ids), 2)])
    b = ([ids[i] for i in range(1, len(ids), 2)],
         [docs[i] for i in range(1, len(ids), 2)])
    single = str(tmp_path / "single")
    build_position_index(
        ray.data.from_arrow(_table(ids, docs)).repartition(2), single,
        num_shards=4,
    )
    merged = str(tmp_path / "merged")
    os.makedirs(merged)
    for tag, (i_ids, i_docs) in (("a", a), ("b", b)):
        part = str(tmp_path / f"inc_{tag}")
        build_position_index(
            ray.data.from_arrow(_table(i_ids, i_docs)).repartition(2), part,
            num_shards=4,
        )
        for f in os.listdir(part):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(part, f),
                            os.path.join(merged, f"{tag}-{f}"))
    r_single, r_merged = PositionsReader(single), PositionsReader(merged)
    assert set(r_single.lookup) == set(r_merged.lookup)
    for term in r_single.lookup:
        ds_, cs_, fs_ = r_single.term_postings(term)
        dm_, cm_, fm_ = r_merged.term_postings(term)
        assert ds_.tolist() == dm_.tolist(), term
        assert cs_.tolist() == cm_.tolist(), term
        assert fs_.tolist() == fm_.tolist(), term
    for q in ("alpha beta", "gamma", "beta beta"):
        assert phrase_search(merged, q, k=50).equals(
            phrase_search(single, q, k=50)
        ), q


def test_duplicate_doc_across_runs_raises(ray_session, tmp_path):
    import ray.data

    ids, docs = [3, 9], ["alpha beta", "beta gamma"]
    merged = str(tmp_path / "dup")
    os.makedirs(merged)
    for tag in ("a", "b"):  # the SAME docs indexed twice
        part = str(tmp_path / f"dup_{tag}")
        build_position_index(
            ray.data.from_arrow(_table(ids, docs)), part, num_shards=2
        )
        for f in os.listdir(part):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(part, f),
                            os.path.join(merged, f"{tag}-{f}"))
    with pytest.raises(ValueError, match="duplicate docid"):
        PositionsReader(merged).term_postings("beta")


def test_reader_cache_invalidation(ray_session, tmp_path):
    """positions_reader must notice a rebuilt dir (file-set signature) and
    reload instead of serving stale postings."""
    import ray.data

    out = str(tmp_path / "px")
    build_position_index(
        ray.data.from_arrow(_table([0, 1], ["alpha beta", "alpha"])), out,
        num_shards=2,
    )
    assert _rows(phrase_search(out, "alpha beta", k=5)) == [(0, 1)]
    shutil.rmtree(out)
    build_position_index(
        ray.data.from_arrow(_table([0, 1], ["alpha", "alpha beta beta"])),
        out, num_shards=2,
    )
    assert _rows(phrase_search(out, "alpha beta", k=5)) == [(1, 1)]


def test_run_cap_splits_hot_terms(ray_session, tmp_path):
    """A term past max_run_positions encodes as MULTIPLE rows cut at doc
    boundaries; readers fold them back — query results identical to an
    uncapped build, and compaction preserves the cap."""
    import pyarrow.parquet as pq
    import ray.data

    from tangent_ray.index.positions import (
        _active_files,
        compact_positions,
    )

    rng = random.Random(31)
    ids, docs = _corpus(rng, 60)
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "text": pa.array(docs, pa.string())}
    )
    capped = str(tmp_path / "capped")
    flat = str(tmp_path / "flat")
    build_position_index(ray.data.from_arrow(t), capped, num_shards=2,
                         max_run_positions=64)
    build_position_index(ray.data.from_arrow(t), flat, num_shards=2)

    def runs_per_term(d):
        tab = pa.concat_tables(
            [pq.read_table(f) for f in _active_files(d)]
        )
        out: dict[str, int] = {}
        for term in tab["term"].to_pylist():
            out[term] = out.get(term, 0) + 1
        return out, tab

    capped_runs, ctab = runs_per_term(capped)
    flat_runs, _ = runs_per_term(flat)
    assert max(capped_runs.values()) > 1  # a hot term actually split
    assert max(flat_runs.values()) == 1
    # every capped run obeys the cap unless it is a single doc's row
    for npos, df in zip(ctab["npos"].to_pylist(), ctab["df"].to_pylist()):
        assert npos <= 64 or df == 1
    # fold-back identity across all three families
    for q in ["alpha", "alpha beta", "beta gamma alpha"]:
        assert phrase_search(capped, q, k=10_000).equals(
            phrase_search(flat, q, k=10_000)
        ), q
        assert proximity_search(capped, q, window=6, k=10_000).equals(
            proximity_search(flat, q, window=6, k=10_000)
        ), q
        assert span_near_search(capped, q, slop=4, k=10_000).equals(
            span_near_search(flat, q, slop=4, k=10_000)
        ), q
    # compaction keeps the cap and the answers
    compact_positions(capped, num_shards=2, max_run_positions=64)
    capped_runs2, ctab2 = runs_per_term(capped)
    assert max(capped_runs2.values()) > 1
    for npos, df in zip(ctab2["npos"].to_pylist(), ctab2["df"].to_pylist()):
        assert npos <= 64 or df == 1
    for q in ["alpha", "alpha beta"]:
        assert phrase_search(capped, q, k=10_000).equals(
            phrase_search(flat, q, k=10_000)
        ), q


@pytest.mark.parametrize("seed", [101, 202])
def test_scan_twin_fuzz_with_lifecycle(ray_session, tmp_path, seed):
    """CI-cheap differential fuzz (the soak twins, shrunk): a ~200-doc
    corpus, then an increment and tombstones MID-SEQUENCE — after every
    lifecycle step the O(df) index path must equal the index-free scan
    twin over the LIVE corpus, byte-identical, across all three families
    and both docid styles."""
    import ray.data

    from tangent_ray.index.positions import (
        add_position_increment,
        delete_position_docs,
    )

    rng = random.Random(seed)
    hash_ids = seed % 2 == 0
    ids, docs = _corpus(rng, 140, hash_ids)
    out = str(tmp_path / "lc")
    base = _table(ids, docs)
    build_position_index(
        ray.data.from_arrow(base).repartition(3), out, num_shards=8,
        max_run_positions=256,  # force multi-run hot terms in the fuzz
    )

    def check(live_ids, live_docs, tag):
        ds = ray.data.from_arrow(_table(live_ids, live_docs)).repartition(3)
        for _ in range(5):
            q = " ".join(
                rng.choice(VOCAB) for _ in range(rng.randint(1, 3))
            )
            k = rng.choice([4, 1000])
            assert phrase_search(out, q, k=k).equals(
                phrase_count_scan(ds, q, k=k)
            ), (tag, q)
            w = rng.randint(0, 9)
            assert proximity_search(out, q, window=w, k=k).equals(
                proximity_scan(ds, q, window=w, k=k)
            ), (tag, q, w)
            s = rng.randint(0, 9)
            assert span_near_search(out, q, slop=s, k=k).equals(
                span_near_scan(ds, q, slop=s, k=k)
            ), (tag, q, s)

    check(ids, docs, "base")
    # increment mid-sequence
    inc_ids, inc_docs = _corpus(random.Random(seed + 1), 50, hash_ids)
    inc_ids = [i + (max(ids) + 7) for i in inc_ids]
    add_position_increment(
        ray.data.from_arrow(_table(inc_ids, inc_docs)), out, num_shards=8
    )
    ids, docs = ids + inc_ids, docs + inc_docs
    check(ids, docs, "post-increment")
    # tombstones mid-sequence (some base, some increment docs)
    victims = set(ids[::7])
    delete_position_docs(out, sorted(victims))
    live = [(i, d) for i, d in zip(ids, docs) if i not in victims]
    ids, docs = [i for i, _ in live], [d for _, d in live]
    check(ids, docs, "post-delete")
