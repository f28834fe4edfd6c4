"""Dedup operator tests: hot-group capping, minhash collision behavior,
exact Jaccard vs a brute-force python oracle."""

import numpy as np
import pyarrow as pa


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_shingle_candidates_hot_group_capped(ray_session):
    """One boilerplate shingle shared by many docs must emit a bounded pair
    set (cap^2/2), not O(g^2) — the 100 TB hot-key guard."""
    import ray.data

    from tangent_ray.ops.dedup import shingle_candidates

    boiler = "the quick brown fox jumps"
    texts = [f"{boiler} unique{i} tail{i} pad{i} x{i}" for i in range(300)]
    ds = ray.data.from_arrow(_docs(texts))
    rows = shingle_candidates(ds, n=5, group_cap=16).take_all()
    # only the first 16 (sorted) ids pair up: 16*15/2 pairs
    assert len(rows) == 16 * 15 // 2
    ids = {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
    assert ids == set(range(16))


def test_jaccard_pairs_exact_vs_bruteforce(ray_session):
    import ray.data

    import re

    from tangent_ray.ops.dedup import jaccard_pairs

    token_re = re.compile(r"[^a-z0-9]+")
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(8, 20)))
        for _ in range(40)
    ]
    n = 3

    def shingles(t):
        toks = [w for w in token_re.split(t.lower()) if w]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = [shingles(t) for t in texts]
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            i = len(sets[a] & sets[b])
            if i:
                want[(a, b)] = i / (len(sets[a]) + len(sets[b]) - i)
    assert want, "fixture must produce overlapping pairs"

    ds = ray.data.from_arrow(_docs(texts))
    rows = jaccard_pairs(ds, n=n).take_all()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_minhash_signature_properties():
    from tangent_ray.ops.dedup import MinHashLSH

    mh = MinHashLSH(num_perm=64, bands=16)
    rng = np.random.default_rng(5)
    base = rng.integers(0, 1 << 63, size=200).astype(np.uint64)
    near = base.copy()
    near[:10] = rng.integers(0, 1 << 63, size=10).astype(np.uint64)  # 95% overlap
    far = rng.integers(0, 1 << 63, size=200).astype(np.uint64)
    s0, s1, s2 = mh.signature(base), mh.signature(near), mh.signature(far)
    # determinism
    assert (mh.signature(base) == s0).all()
    # similar sets agree on most minima, dissimilar on few
    assert (s0 == s1).mean() > 0.7
    assert (s0 == s2).mean() < 0.2
    # int64 non-negative (band hashing + Arrow casting rely on this)
    assert s0.dtype == np.int64 and (s0 >= 0).all()


def test_minhash_candidates_finds_near_dups(ray_session):
    import ray.data

    from tangent_ray.ops.dedup import minhash_candidates

    base = " ".join(f"tok{i}" for i in range(60))
    texts = [base, base + " extra", "totally different words here entirely " * 5]
    ds = ray.data.from_arrow(_docs(texts))
    rows = minhash_candidates(ds, num_perm=64, bands=16, shingle_n=3).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_connected_components_chains_and_singletons(ray_session):
    import pyarrow as pa
    import ray.data

    from tangent_ray.ops.dedup import connected_components

    # a 6-long chain (needs multiple propagation rounds), a triangle with a
    # redundant edge, and a singleton
    pairs = pa.table(
        {
            "doc_a": [2, 3, 4, 5, 6, 20, 21, 20],
            "doc_b": [3, 4, 5, 6, 7, 21, 22, 22],
        }
    )
    nodes = pa.table({"doc_id": [2, 3, 4, 5, 6, 7, 20, 21, 22, 50]})
    got = connected_components(
        ray.data.from_arrow(pairs), ray.data.from_arrow(nodes)
    ).take_all()
    lab = {r["doc_id"]: r["cluster"] for r in got}
    assert lab == {2: 2, 3: 2, 4: 2, 5: 2, 6: 2, 7: 2,
                   20: 20, 21: 20, 22: 20, 50: 50}


def test_connected_components_iteration_cap(ray_session):
    import pyarrow as pa
    import ray.data

    from tangent_ray.ops.dedup import connected_components

    # with max_iters=1 a long chain cannot fully converge: the far end of
    # the chain keeps an intermediate label (bounded work is honored)
    pairs = pa.table({"doc_a": [1, 2, 3, 4], "doc_b": [2, 3, 4, 5]})
    nodes = pa.table({"doc_id": [1, 2, 3, 4, 5]})
    got = connected_components(
        ray.data.from_arrow(pairs), ray.data.from_arrow(nodes), max_iters=1
    ).take_all()
    lab = {r["doc_id"]: r["cluster"] for r in got}
    assert lab[1] == 1 and lab[2] == 1
    assert lab[5] == 4  # one hop of propagation only


def test_simhash_pairs_equals_brute_force(ray_session):
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from tangent_ray.ops.dedup import simhash_batch, simhash_pairs

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "with words ") * 4
    texts = [base + f"tail{i // 5}" if i < 5
             else " ".join(f"w{i}x{j}" for j in range(40)) for i in range(30)]
    t = pa.table({"doc_id": pa.array(range(30), type=pa.int64()),
                  "text": texts})
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(ray.data.from_arrow(t)).take_all()
    }
    h = simhash_batch(t)["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    want = {
        (i, j)
        for i, j in itertools.combinations(range(30), 2)
        if ham(h[i], h[j]) <= 3
    }
    assert got == want and len(want) >= 10


def test_connected_components_non_member_endpoint_relays(ray_session):
    import pyarrow as pa
    import ray.data

    from tangent_ray.ops.dedup import connected_components

    # endpoint 99 appears in pairs but NOT in nodes: it must relay
    # connectivity (1-99-5 one component) yet never appear in the output
    pairs = pa.table({"doc_a": [1, 99], "doc_b": [99, 5]})
    nodes = pa.table({"doc_id": [1, 5, 7]})
    got = sorted(
        (r["doc_id"], r["cluster"])
        for r in connected_components(
            ray.data.from_arrow(pairs), ray.data.from_arrow(nodes)
        ).take_all()
    )
    assert got == [(1, 1), (5, 1), (7, 7)]
