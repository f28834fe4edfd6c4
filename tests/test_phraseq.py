"""Scored phrase queries in the query language: ``"a b"`` / ``"a b"~slop``
/ ``"a b"^boost`` / ``-"a b"`` clauses inside ``score_query``, scored as
BM25 pseudo-terms whose tf is the sloppy-phrase frequency (Lucene
PhraseQuery with integer phraseFreq). Differential suite: a brute-force
python oracle over the raw corpus, sharded-scorer identity, a stemmed
index (surface-form phrase terms), and the extension-syntax interplay."""

from __future__ import annotations

import dataclasses
import math
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG, EngineConfig
from tangent_ray.index.build import build_index
from tangent_ray.index.positions import build_position_index, phrase_doc_tfs
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import DocumentsCorpus

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _mk_docs(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        toks = [rng.choice(VOCAB) for _ in range(rng.randint(3, 24))]
        # salt in phrase-ish runs so exact/sloppy matches are common
        if i % 3 == 0:
            j = rng.randrange(len(toks))
            toks[j:j] = ["alpha", "beta"]
        if i % 5 == 0:
            j = rng.randrange(len(toks))
            toks[j:j] = ["alpha", rng.choice(VOCAB), "beta"]
        docs.append(" ".join(toks))
    return docs


DOCS = _mk_docs(7, 90)


def _build(root, docs, cfg, parts=3):
    src = str(root / "docs")
    os.makedirs(src, exist_ok=True)
    # one file per partition: plan_partitions splits by input file
    for fi in range(parts):
        sl = slice(fi, None, parts)
        ids = list(range(1, len(docs) + 1))[sl]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(docs[sl], pa.string()),
                }
            ),
            os.path.join(src, f"d{fi}.parquet"),
        )
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(cfg, partitions=parts),
                DocumentsCorpus())
    import ray.data

    build_position_index(
        ray.data.read_parquet(src, columns=["doc_id", "text"]),
        os.path.join(out, "positions"), num_shards=4,
    )
    return out


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    return _build(tmp_path_factory.mktemp("phraseq"), DOCS, SQL_PARITY_CONFIG)


# -- python oracle -----------------------------------------------------------


def _occ(docs: list[str], terms: tuple[str, ...], slop: int) -> dict[int, int]:
    """Greedy-chain sloppy phrase frequency per doc_id (1-based)."""
    out: dict[int, int] = {}
    for docn, text in enumerate(docs, start=1):
        tt = text.lower().split()
        c = 0
        for i, w in enumerate(tt):
            if w != terms[0]:
                continue
            cur, ok = i, True
            for nxt in terms[1:]:
                found = next(
                    (j for j in range(cur + 1, len(tt)) if tt[j] == nxt), None
                )
                if found is None:
                    ok = False
                    break
                cur = found
            if ok and (cur - i - (len(terms) - 1)) <= slop:
                c += 1
        if c:
            out[docn] = c
    return out


def _bm25_table(docs: list[str]):
    toks = [d.lower().split() for d in docs]
    N = len(docs)
    dls = [len(t) for t in toks]
    avgdl = sum(dls) / N
    return toks, N, dls, avgdl


def _expected(docs, legs):
    """legs: list of (occurrence dict, boost); BM25-sum them."""
    _, N, dls, avgdl = _bm25_table(docs)
    exp: dict[int, float] = {}
    for o, boost in legs:
        df = len(o)
        idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
        for docn, tf in o.items():
            dl = dls[docn - 1]
            exp[docn] = exp.get(docn, 0.0) + boost * idf * tf * 2.2 / (
                tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
            )
    return exp


def _got(sc, q, k=1000):
    d, s = sc.score_query(q, "text", k)
    return {int(x): float(y) for x, y in zip(d, s)}


def _close(got: dict, exp: dict):
    assert set(got) == set(exp), (sorted(got), sorted(exp))
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9, (k, got[k], exp[k])


# -- tests -------------------------------------------------------------------


def test_phrase_doc_tfs_matches_oracle(idx):
    pos = os.path.join(idx, "positions")
    for terms, slop in [
        (("alpha", "beta"), 0), (("alpha", "beta"), 1),
        (("alpha", "beta"), 3), (("beta", "alpha"), 0),
        (("alpha", "gamma", "beta"), 2), (("alpha",), 0),
    ]:
        d, tf = phrase_doc_tfs(pos, list(terms), slop)
        exp = _occ(DOCS, terms, slop)
        assert dict(zip(d.tolist(), tf.tolist())) == exp, (terms, slop)


def test_scored_phrase_alone(idx):
    sc = QueryScorer(idx)
    _close(_got(sc, '"alpha beta"'),
           _expected(DOCS, [(_occ(DOCS, ("alpha", "beta"), 0), 1.0)]))


def test_scored_phrase_plus_terms(idx):
    sc = QueryScorer(idx)
    _close(
        _got(sc, '"alpha beta" gamma delta'),
        _expected(DOCS, [
            (_occ(DOCS, ("delta",), 0), 1.0),
            (_occ(DOCS, ("gamma",), 0), 1.0),
            (_occ(DOCS, ("alpha beta".split(" ")[0], "beta"), 0), 1.0),
        ]),
    )


def test_sloppy_and_boosted(idx):
    sc = QueryScorer(idx)
    _close(_got(sc, '"alpha beta"~2'),
           _expected(DOCS, [(_occ(DOCS, ("alpha", "beta"), 2), 1.0)]))
    _close(_got(sc, '"alpha beta"^3 gamma'),
           _expected(DOCS, [
               (_occ(DOCS, ("gamma",), 0), 1.0),
               (_occ(DOCS, ("alpha", "beta"), 0), 3.0),
           ]))


def test_negated_phrase(idx):
    sc = QueryScorer(idx)
    banned = set(_occ(DOCS, ("alpha", "beta"), 0))
    exp = {
        k: v
        for k, v in _expected(
            DOCS, [(_occ(DOCS, ("gamma",), 0), 1.0)]
        ).items()
        if k not in banned
    }
    _close(_got(sc, 'gamma -"alpha beta"'), exp)
    # negated sloppy phrase excludes the wider match set
    banned2 = set(_occ(DOCS, ("alpha", "beta"), 2))
    exp2 = {
        k: v
        for k, v in _expected(
            DOCS, [(_occ(DOCS, ("gamma",), 0), 1.0)]
        ).items()
        if k not in banned2
    }
    _close(_got(sc, 'gamma -"alpha beta"~2'), exp2)
    assert banned < banned2 or banned == banned2


def test_topk_and_order(idx):
    sc = QueryScorer(idx)
    full = _got(sc, '"alpha beta" gamma', k=1000)
    d, s = sc.score_query('"alpha beta" gamma', "text", 5)
    expect_order = sorted(full.items(), key=lambda kv: (-round(kv[1], 12), kv[0]))
    assert [int(x) for x in d] == [k for k, _ in expect_order[:5]]
    assert len(d) == 5


def test_search_after_pages_with_phrase(idx):
    sc = QueryScorer(idx)
    deep_d, deep_s = sc.score_query('"alpha beta" gamma', "text", 1000)
    deep = list(zip(deep_d.tolist(), deep_s.tolist()))
    rows, after = [], None
    for _ in range(1000):
        d, s = sc.score_query('"alpha beta" gamma', "text", 7, after=after)
        if not len(d):
            break
        rows.extend(zip(d.tolist(), s.tolist()))
        after = (float(s[-1]), int(d[-1]))
    assert rows == deep


def test_extension_interplay(idx):
    """Quoted bodies are protected from extension/negation rewrites, and
    extensions still work alongside a phrase clause."""
    sc = QueryScorer(idx)
    # prefix expansion next to a phrase: both legs contribute
    got = _got(sc, '"alpha beta" gamm*')
    exp = _expected(DOCS, [
        (_occ(DOCS, ("gamma",), 0), 1.0),   # gamm* expands to gamma only
        (_occ(DOCS, ("alpha", "beta"), 0), 1.0),
    ])
    _close(got, exp)
    # a -term next to a phrase
    banned = set(_occ(DOCS, ("delta",), 0))
    exp2 = {
        k: v
        for k, v in _expected(
            DOCS, [(_occ(DOCS, ("alpha", "beta"), 0), 1.0)]
        ).items()
        if k not in banned
    }
    _close(_got(sc, '"alpha beta" -delta'), exp2)


def test_sharded_identity(idx):
    """Disjoint-partial scorers with the same (global) positional source
    produce exactly the full scorer's rows after a plain union."""
    full = QueryScorer(idx)
    parts = full.reader.manifest["partials"]
    assert len(parts) >= 2
    got: dict[int, float] = {}
    for p in parts:
        shard = QueryScorer(idx, partials=[p])
        d, s = shard.score_query('"alpha beta" gamma', "text", None)
        for x, y in zip(d.tolist(), s.tolist()):
            assert x not in got, "duplicate doc across disjoint shards"
            got[x] = y
    d, s = full.score_query('"alpha beta" gamma', "text", None)
    exp = dict(zip(d.tolist(), s.tolist()))
    assert got == exp


def test_stemmed_index_surface_phrase(ray_session, tmp_path_factory):
    """In a stemmed index the phrase terms stay SURFACE forms (positions
    are unstemmed) while the dl lookup goes through the stemmed lexicon."""
    docs = [
        "running quickly through fields",
        "the runner runs quickly",
        "running quickly and running quickly again",
        "nothing to see",
    ]
    out = _build(
        tmp_path_factory.mktemp("phraseq_stem"), docs,
        EngineConfig(stem=True, math=False, window=1, eol="none"), parts=1,
    )
    sc = QueryScorer(out)
    got = _got(sc, '"running quickly"')
    exp = _expected(docs, [(_occ(docs, ("running", "quickly"), 0), 1.0)])
    _close(got, exp)
    # surface form 'runs quickly' matches only doc 2, not stem-collapsed
    assert set(_got(sc, '"runs quickly"')) == {2}


def test_guards(idx):
    sc = QueryScorer(idx)
    with pytest.raises(ValueError, match="text-query syntax"):
        sc.score_query('"alpha beta" $v!x$', "mixed", 5)
    sc2 = QueryScorer(idx)
    sc2.positions = None
    with pytest.raises(ValueError, match="positional"):
        sc2.score_query('"alpha beta"', "text", 5)
    # empty quotes are a no-op clause, not an error
    d, s = sc.score_query('"" gamma', "text", 5)
    assert len(d)
    # no-match phrase returns the term leg only
    _close(_got(sc, '"eps eps eps eps eps eps" gamma'),
           _expected(DOCS, [(_occ(DOCS, ("gamma",), 0), 1.0)]))


def test_actor_pool_batch_path(idx):
    """Phrase clauses flow through the __call__ batch path unchanged."""
    sc = QueryScorer(idx)
    batch = pa.table(
        {
            "query_id": pa.array(["a", "b"], pa.string()),
            "kind": pa.array(["text", "text"], pa.string()),
            "text": pa.array(['"alpha beta" gamma', "gamma"], pa.string()),
            "topk": pa.array([8, 8], pa.int32()),
        }
    )
    out = sc(batch)
    by_q = {}
    for qid, docid, score in zip(
        out["query_id"].to_pylist(), out["docid"].to_pylist(),
        out["score"].to_pylist(),
    ):
        by_q.setdefault(qid, {})[docid] = score
    d, s = sc.score_query('"alpha beta" gamma', "text", 8)
    assert by_q["a"] == dict(zip(d.tolist(), s.tolist()))


def test_positional_engine_attach_identity(idx):
    """attach_positions(PositionalEngine) — the sharded serving provider —
    yields byte-identical phrase-query scores to the resident dir reader."""
    from tangent_ray.index.positions import PositionalEngine

    eng = PositionalEngine(os.path.join(idx, "positions"), n_shards=2)
    try:
        a = QueryScorer(idx)
        b = QueryScorer(idx)
        b.attach_positions(eng)
        for q in ['"alpha beta" gamma', '"alpha beta"~2', 'gamma -"alpha beta"']:
            da, sa = a.score_query(q, "text", 1000)
            db, sb = b.score_query(q, "text", 1000)
            assert da.tolist() == db.tolist(), q
            assert sa.tolist() == sb.tolist(), q
    finally:
        eng.shutdown()


def test_explain_phrase_rows(idx):
    """explain() rows for phrase / required / mm / negated-phrase clauses:
    contributions still sum to the doc's score."""
    sc = QueryScorer(idx)
    q = '"alpha beta" gamma'
    d, s = sc.score_query(q, "text", 5)
    doc, score = int(d[0]), float(s[0])
    ex = sc.explain(q, doc).to_pylist()
    kinds = {r["kind"] for r in ex}
    assert sum(r["contribution"] for r in ex) == pytest.approx(
        score, abs=1e-12
    )
    if any(r["kind"] == "phrase" for r in ex):
        pr = next(r for r in ex if r["kind"] == "phrase")
        assert pr["term"] == '"alpha beta"' and pr["tf"] >= 1
    # a doc that matches gamma but not the required phrase
    only_gamma = next(
        i + 1 for i, t in enumerate(DOCS)
        if "gamma" in t.split() and not _occ([t], ("alpha", "beta"), 0)
    )
    ex2 = sc.explain('+"alpha beta" gamma', only_gamma).to_pylist()
    assert any(r["kind"] == "required" for r in ex2)
    # mm shortfall marker
    ex3 = sc.explain("alpha beta gamma eps zeta #mm:5", only_gamma)
    assert any(r["kind"] == "mm" for r in ex3.to_pylist())
    # negated phrase marker on a matching doc
    phrase_doc = next(iter(_occ(DOCS, ("alpha", "beta"), 0)))
    ex4 = sc.explain('gamma -"alpha beta"', phrase_doc).to_pylist()
    assert any(
        r["kind"] == "excluded" and r["term"].startswith('-"')
        for r in ex4
    )


def test_search_sharded_phrase_identity(idx):
    """search_sharded (actor groups, positions auto-attach per shard)
    returns exactly the unsharded actor-pool rows for phrase queries."""
    from tangent_ray.query.scorer import search, search_sharded

    queries = pa.table(
        {
            "query_id": pa.array(["p1", "p2", "p3"], pa.string()),
            "kind": pa.array(["text"] * 3, pa.string()),
            "text": pa.array(
                ['"alpha beta" gamma', '"alpha beta"~2',
                 '+"alpha beta" -delta'],
                pa.string(),
            ),
        }
    )
    import ray

    res = search(queries, idx, topk=25)
    tabs = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
    flat = pa.concat_tables(tabs)
    sharded = search_sharded(queries, idx, n_shards=3, topk=25)
    key = ["query_id", "rank", "docid", "score"]

    def rows(t):
        return sorted(zip(*[t[c].to_pylist() for c in key]))

    assert rows(flat) == rows(sharded)


def test_phrase_cache_invalidation_on_refresh(ray_session, tmp_path):
    """Positional increments become visible to a resident scorer after
    refresh() (phrase caches cleared; the dir reader re-resolves)."""
    import ray.data

    from tangent_ray.index.positions import add_position_increment

    docs = ["alpha beta here", "nothing else"]
    root = tmp_path
    src = str(root / "docs")
    os.makedirs(src)
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(docs, pa.string())}),
        os.path.join(src, "d.parquet"),
    )
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    build_position_index(
        ray.data.read_parquet(src, columns=["doc_id", "text"]),
        os.path.join(out, "positions"), num_shards=2,
    )
    sc = QueryScorer(out)
    d, _ = sc.score_query('"alpha beta"', "text", 10)
    assert d.tolist() == [1]
    # new doc arrives in BOTH the main index and the positional sidecar
    inc_src = str(root / "inc")
    os.makedirs(inc_src)
    pq.write_table(
        pa.table({"doc_id": pa.array([3], pa.int64()),
                  "text": pa.array(["alpha beta again"], pa.string())}),
        os.path.join(inc_src, "d.parquet"),
    )
    from tangent_ray.index.build import add_increment

    add_increment(inc_src, out, corpus=DocumentsCorpus())
    add_position_increment(
        ray.data.read_parquet(inc_src, columns=["doc_id", "text"]),
        os.path.join(out, "positions"), num_shards=2,
    )
    # stale until refresh (resident caches), fresh after
    sc.refresh()
    d2, _ = sc.score_query('"alpha beta"', "text", 10)
    assert sorted(d2.tolist()) == [1, 3]


def test_scorer_result_cache(idx):
    """Repeat top-k text queries answer from the result cache (identical
    arrays, fresh copies) and refresh() invalidates it."""
    sc = QueryScorer(idx)
    d1, s1 = sc.score_query('"alpha beta" gamma', "text", 10)
    d2, s2 = sc.score_query('"alpha beta" gamma', "text", 10)
    assert sc.last_stats.get("result_cached") is True
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
    d2[0] = -1  # caller mutation must not poison the cache
    d3, _ = sc.score_query('"alpha beta" gamma', "text", 10)
    assert d3.tolist() == d1.tolist()
    sc.refresh()
    assert not sc._result_cache
    # k=None (full-candidate) calls are never cached
    sc.score_query("gamma", "text", None)
    assert not sc._result_cache


def test_positional_change_autodetected_without_refresh(ray_session, tmp_path):
    """A positional-sidecar-only change (delete_position_docs) is picked
    up by a resident scorer's NEXT phrase query — no refresh() needed:
    the phrase caches watch the sidecar's stat signature."""
    import ray.data

    from tangent_ray.index.positions import delete_position_docs

    docs = ["alpha beta one", "alpha beta two", "alpha alone"]
    src = str(tmp_path / "docs")
    os.makedirs(src)
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(docs, pa.string())}),
        os.path.join(src, "d.parquet"),
    )
    out = str(tmp_path / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    build_position_index(
        ray.data.read_parquet(src, columns=["doc_id", "text"]),
        os.path.join(out, "positions"), num_shards=2,
    )
    sc = QueryScorer(out)
    d, _ = sc.score_query('"alpha beta"', "text", 10)
    assert sorted(d.tolist()) == [1, 2]
    delete_position_docs(os.path.join(out, "positions"), [2])
    d2, _ = sc.score_query('"alpha beta"', "text", 10)  # NO refresh()
    assert d2.tolist() == [1]


def test_search_sharded_shared_engine_identity(idx):
    """search_sharded(positions=PositionalEngine): every shard scorer
    attaches the SAME driver-built engine (the handle pickles light —
    part actors shared, no per-actor full positional load) and results
    are identical to the dir-attach path. The engine stays usable on the
    driver afterwards."""
    import ray

    from tangent_ray.index.positions import PositionalEngine
    from tangent_ray.query.scorer import search_sharded

    queries = pa.table(
        {
            "query_id": pa.array(["p1", "p2"], pa.string()),
            "kind": pa.array(["text"] * 2, pa.string()),
            "text": pa.array(
                ['"alpha beta" gamma', '"alpha beta"~2 -delta'],
                pa.string(),
            ),
        }
    )
    eng = PositionalEngine(os.path.join(idx, "positions"), n_shards=2)
    try:
        # the pickled handle must be LIGHT even when the driver's caches
        # are warm (warm them first)
        eng.phrase("alpha beta", k=5)
        import pickle

        assert len(pickle.dumps(eng)) < 100_000
        base = search_sharded(queries, idx, n_shards=3, topk=25)
        shared = search_sharded(queries, idx, n_shards=3, topk=25,
                                positions=eng)
        key = ["query_id", "rank", "docid", "score"]

        def rows(t):
            return sorted(zip(*[t[c].to_pylist() for c in key]))

        assert rows(base) == rows(shared)
        # driver's engine still answers after the pool tore down
        assert eng.phrase("alpha beta", k=5).num_rows >= 0
    finally:
        eng.shutdown()


def test_resident_sharded_engine_shared_positions(idx):
    """ShardedEngine(positions=PositionalEngine): resident BM25 shard
    scorers share the positional part actors; phrase results identical
    to the dir-attach engine."""
    from tangent_ray.index.positions import PositionalEngine
    from tangent_ray.query.engine import ShardedEngine

    q = [{"query_id": "p", "kind": "text", "text": '"alpha beta" gamma'}]
    # sequential engines, 1 actor each: the 4-CPU test session cannot
    # host two resident pools plus the positional actors at once
    e1 = ShardedEngine(idx, n_shards=1)
    try:
        r1 = e1.search(q)
    finally:
        e1.shutdown()
    pe = PositionalEngine(os.path.join(idx, "positions"), n_shards=1)
    e2 = ShardedEngine(idx, n_shards=1, positions=pe)
    try:
        r2 = e2.search(q)
    finally:
        e2.shutdown()
        pe.shutdown()
    assert r1.equals(r2) and r1.num_rows
