"""heavy_hitters: certified shuffle-free top-k vs brute force, fallback
path on near-uniform data, multi-block inputs."""

import collections

import numpy as np
import pyarrow as pa
import ray.data

from tangent_ray.ops.sketch import heavy_hitters
from tangent_ray.tokenize.text import split_tokens


def _brute_topk(texts, k):
    cnt = collections.Counter()
    _, toks, _ = split_tokens(pa.array(texts))
    cnt.update(toks.to_pylist())
    return sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _ds(texts, blocks=4):
    t = pa.table({"text": pa.array(texts)})
    cut = max(1, len(texts) // blocks)
    d = ray.data.from_arrow(t.slice(0, cut))
    for i in range(cut, len(texts), cut):
        d = d.union(ray.data.from_arrow(t.slice(i, cut)))
    return d


def test_heavy_hitters_zipf_certified(ray_session):
    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(500)]
    # zipf-ish: token i with weight 1/(i+1)
    w = 1.0 / (np.arange(500) + 1)
    texts = [
        " ".join(rng.choice(vocab, size=40, p=w / w.sum()))
        for _ in range(400)
    ]
    got = heavy_hitters(_ds(texts), k=10, m=256)
    want = _brute_topk(texts, 10)
    assert got["term"].to_pylist() == [t for t, _ in want]
    assert got["cnt"].to_pylist() == [c for _, c in want]
    assert got["rank"].to_pylist() == list(range(1, 11))


def test_heavy_hitters_fallback_still_exact(ray_session, caplog):
    # near-uniform counts + tiny m: certification cannot hold, the exact
    # groupby fallback must produce the same answer anyway
    import logging

    texts = [f"t{i % 97} t{(i * 31) % 97}" for i in range(300)]
    with caplog.at_level(logging.WARNING, logger="tangent_ray.ops.sketch"):
        got = heavy_hitters(_ds(texts), k=5, m=4)
    want = _brute_topk(texts, 5)
    assert got["term"].to_pylist() == [t for t, _ in want]
    assert got["cnt"].to_pylist() == [c for _, c in want]
    assert any("certification failed" in r.message for r in caplog.records)


def test_heavy_hitters_empty(ray_session):
    got = heavy_hitters(_ds(["", "", ""]), k=5)
    assert got.num_rows == 0


def test_hll_distinct_accuracy_and_determinism(ray_session):
    from tangent_ray.ops.sketch import distinct_tokens_hll

    # ~8,000 distinct tokens spread over docs
    texts = [" ".join(f"tok{(i * 97 + j) % 8000}" for j in range(50))
             for i in range(400)]
    exact = len({t for s in texts for t in s.split()})
    est1 = distinct_tokens_hll(_ds(texts, blocks=4), p=14)
    est2 = distinct_tokens_hll(_ds(texts, blocks=7), p=14)
    assert est1 == est2  # block layout must not change the estimate
    assert abs(est1 - exact) / exact < 0.03  # ~0.8% expected at p=14


def test_hll_small_range_linear_counting(ray_session):
    from tangent_ray.ops.sketch import distinct_tokens_hll

    texts = ["alpha beta gamma delta"] * 50
    est = distinct_tokens_hll(_ds(texts), p=12)
    assert abs(est - 4) < 0.5


def test_heavy_hitters_under_k_distinct_no_fallback(ray_session, caplog):
    # fewer distinct tokens than k with resid 0: counts are complete, so
    # no fallback (and no spurious warning) — result is simply shorter
    import logging

    texts = ["aa bb aa", "bb cc aa"] * 20
    with caplog.at_level(logging.WARNING, logger="tangent_ray.ops.sketch"):
        got = heavy_hitters(_ds(texts), k=20, m=4096)
    assert got["term"].to_pylist() == ["aa", "bb", "cc"]
    assert got["cnt"].to_pylist() == [60, 40, 20]
    assert not any("certification" in r.message for r in caplog.records)


def test_heavy_hitters_tie_at_bound_falls_back(ray_session):
    # counts tied exactly at the residual bound must NOT certify: a
    # non-candidate with the same total could win the term-asc tie rule.
    # Construct it: m=1 so each batch emits only its top token.
    # batch1: b x6, a x3; batch2: c x6, a x3  -> candidates {b, c},
    # resid_bound 6, and the true winner is 'a' (6, alphabetically first).
    texts1 = ["b b b b b b a a a"]
    texts2 = ["c c c c c c a a a"]
    import ray.data

    d = ray.data.from_arrow(pa.table({"text": pa.array(texts1)})).union(
        ray.data.from_arrow(pa.table({"text": pa.array(texts2)}))
    )
    got = heavy_hitters(d, k=1, m=1)
    assert got["term"].to_pylist() == ["a"]
    assert got["cnt"].to_pylist() == [6]
