"""Unit tests for ops/lm.py: bigram LM training semantics (hand-computed
add-one log-probs), OOV backoff at scoring time, pruning, and empty docs."""

import math

import numpy as np
import pyarrow as pa
import ray

from tangent_ray.ops.lm import (
    BigramLM,
    LMScore,
    bigram_count_partial,
    lm_score,
    train_bigram_lm,
)
from tangent_ray.util import round_half_away


def _docs(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts)}
    )


def _lp(c12, c1, v):
    return int(round_half_away(np.array([math.log((c12 + 1.0) / (c1 + v)) * 1e6]), 0)[0])


def test_partial_counts():
    t = bigram_count_partial(_docs(["a b a b", "b c", ""]))
    kind = t["kind"].to_numpy()
    # bigrams: (a,b)x2, (b,a)x1, (b,c)x1 -> 3 unique; tokens: a,b,c -> 3
    assert (kind == 0).sum() == 3
    assert (kind == 1).sum() == 3
    cnt = t["cnt"].to_numpy()[kind == 0]
    assert sorted(cnt.tolist()) == [1, 1, 2]


def test_train_and_score_hand_computed(ray_session):
    # corpus: "a b a b" and "b c"; V=3; c1(a)=2 [a->b twice], c1(b)=2 [b->a, b->c]
    ds = ray.data.from_arrow(_docs(["a b a b", "b c"]))
    m = train_bigram_lm(ds)
    assert m.v == 3
    scored = {r["doc_id"]: r for r in lm_score(ds, m).take_all()}
    lp_ab = _lp(2, 2, 3)   # c12(a,b)=2, c1(a)=2
    lp_ba = _lp(1, 2, 3)
    lp_bc = _lp(1, 2, 3)
    assert scored[0]["n_bigrams"] == 3
    assert scored[0]["sum_lp_e6"] == 2 * lp_ab + lp_ba
    assert scored[1]["n_bigrams"] == 1
    assert scored[1]["sum_lp_e6"] == lp_bc


def test_oov_backoff_and_empty(ray_session):
    train = ray.data.from_arrow(_docs(["a b a b", "b c"]))
    m = train_bigram_lm(train)
    held = ray.data.from_arrow(_docs(["a c", "z q", ""]))
    got = {r["doc_id"]: r for r in lm_score(held, m).take_all()}
    # (a,c) unseen bigram, seen context a -> ln(1/(c1(a)+V)) = ln(1/5)
    assert got[0]["sum_lp_e6"] == _lp(0, 2, 3)
    # (z,q): unseen context -> floor ln(1/V)
    assert got[1]["sum_lp_e6"] == _lp(0, 0, 3)
    assert got[2]["n_bigrams"] == 0 and got[2]["sum_lp_e6"] == 0


def test_pruning_backs_off(ray_session):
    ds = ray.data.from_arrow(_docs(["a b a b a b", "b c"]))
    full = train_bigram_lm(ds)
    pruned = train_bigram_lm(ds, min_count=2)  # drops (b,a) c=2? no: keeps >=2
    # (b,c) count 1 is pruned; its c1 mass must still shape the denominator
    assert len(pruned.b_keys) < len(full.b_keys)
    scored = {r["doc_id"]: r for r in lm_score(ds, pruned).take_all()}
    # doc 1 "b c": pruned bigram backs off to ln((0+1)/(c1(b)+V))
    assert scored[1]["sum_lp_e6"] == _lp(0, 3, 3)


def test_scoring_batch_invariance(ray_session):
    texts = [f"w{i % 7} w{(i * 3) % 7} w{(i * 5 + 1) % 7}" for i in range(50)]
    ds = ray.data.from_arrow(_docs(texts))
    m = train_bigram_lm(ds)
    one = LMScore(m)(_docs(texts))
    many = pa.concat_tables(
        [LMScore(m)(_docs(texts[i:i + 7])) for i in range(0, 50, 7)]
    )
    assert sorted(one["sum_lp_e6"].to_pylist()) == sorted(many["sum_lp_e6"].to_pylist())
