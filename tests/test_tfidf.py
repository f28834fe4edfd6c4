"""Unit tests for ops/textstats.py TF-IDF keywords: hand-computed scores,
deterministic tie-breaks, min_df pruning, batch invariance."""

import math

import numpy as np
import pyarrow as pa
import ray

from tangent_ray.ops.textstats import TfIdfTopK, df_count_partial, tfidf_keywords
from tangent_ray.tokenize.text import md5_u64


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}
    )


def _model(texts):
    t = df_count_partial(_docs(texts))
    kind = t["kind"].to_numpy()
    keys = t["th"].to_numpy()[kind == 0].astype(np.int64).view(np.uint64)
    dfs = t["df"].to_numpy()[kind == 0].astype(np.int64)
    order = np.argsort(keys)
    return keys[order], dfs[order]


def test_df_partial():
    t = df_count_partial(_docs(["a b a", "a c", ""]))
    kind = t["kind"].to_numpy()
    # df(a)=2 (two docs), df(b)=1, df(c)=1
    assert sorted(t["df"].to_numpy()[kind == 0].tolist()) == [1, 1, 2]
    # the kind=1 row carries the batch doc count (all three docs)
    assert t["df"].to_numpy()[kind == 1].tolist() == [3]


def test_hand_computed_scores():
    texts = ["a a b", "a c"]
    m = _model(texts)
    out = TfIdfTopK(m, n_docs=2, k=5)(_docs(texts))
    rows = {(r["doc_id"], r["term"]): r for r in out.to_pylist()}
    idf = lambda df: math.log((2 + 1.0) / (df + 1.0)) + 1.0
    # doc0: a tf=2 df=2; b tf=1 df=1
    assert rows[(0, "a")]["score_e6"] == round(2 * idf(2) * 1e6)
    assert rows[(0, "b")]["score_e6"] == round(1 * idf(1) * 1e6)
    # b (tf=1, idf high) outranks a (tf=2, idf=1)? 2*1.0=2.0 vs 1*1.405=1.405
    assert rows[(0, "a")]["rank"] == 1 and rows[(0, "b")]["rank"] == 2


def test_tie_breaks_on_term_asc():
    texts = ["z q", "z q"]  # both terms: tf=1, df=2 -> equal scores
    m = _model(texts)
    out = TfIdfTopK(m, n_docs=2, k=5)(_docs(texts))
    for doc in (0, 1):
        ranked = sorted(
            (r for r in out.to_pylist() if r["doc_id"] == doc),
            key=lambda r: r["rank"],
        )
        assert [r["term"] for r in ranked] == ["q", "z"]


def test_k_limits_output():
    texts = ["a b c d e f g h"]
    m = _model(texts)
    out = TfIdfTopK(m, n_docs=1, k=3)(_docs(texts))
    assert out.num_rows == 3
    assert sorted(out["rank"].to_pylist()) == [1, 2, 3]


def test_min_df_prunes_to_max_idf(ray_session):
    texts = ["common rare1", "common rare2", "common rare3"]
    ds = ray.data.from_arrow(_docs(texts))
    full = {(r["doc_id"], r["term"]): r["score_e6"]
            for r in tfidf_keywords(ds, k=5).take_all()}
    pruned = {(r["doc_id"], r["term"]): r["score_e6"]
              for r in tfidf_keywords(ds, k=5, min_df=2).take_all()}
    # pruned rare terms score with df=0 => ln((N+1)/1)+1 (max idf)
    want = round((math.log(4.0) + 1.0) * 1e6)
    assert pruned[(0, "rare1")] == want
    # common term unaffected by pruning
    assert pruned[(0, "common")] == full[(0, "common")]


def test_batch_invariance():
    texts = [f"w{i % 5} w{(i * 2) % 5} shared" for i in range(20)]
    m = _model(texts)
    one = TfIdfTopK(m, n_docs=20, k=3)(_docs(texts))
    many = pa.concat_tables(
        [TfIdfTopK(m, n_docs=20, k=3)(_docs(texts[i:i + 6], ids=list(range(i, min(i + 6, 20)))))
         for i in range(0, 20, 6)]
    )
    assert one.num_rows == many.num_rows
    assert sorted(one.to_pylist(), key=lambda r: (r["doc_id"], r["rank"])) == \
        sorted(many.to_pylist(), key=lambda r: (r["doc_id"], r["rank"]))
