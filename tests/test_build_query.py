"""End-to-end: build index over synthetic transcripts, query, compare to the
pure-Python oracle — rank-identical (same docids, same scores to 1e-9, same
order)."""

import os

import numpy as np
import pytest

from tangent_ray.config import EngineConfig
from tangent_ray.fixtures import generate_transcripts, query_set, write_transcripts
from tangent_ray.index.build import build_index
from tangent_ray.query.scorer import search
from tangent_ray.sources.corpus import TranscriptsCorpus

from oracle import OracleIndex

CFG = EngineConfig(
    window=2,
    eol="small",
    stem=True,
    math=True,
    block_size=32,  # small blocks to exercise skip structure
    salt_buckets=4,  # exercise the salted two-stage shuffle
    partitions=3,  # exercise multi-partial query merge
)

N_CONVS = 40


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("idx")
    data_dir = str(root / "transcripts")
    out_dir = str(root / "index")
    write_transcripts(data_dir, N_CONVS, files=6)
    manifest = build_index(data_dir, out_dir, CFG, TranscriptsCorpus())
    return out_dir, manifest


@pytest.fixture(scope="module")
def oracle_index():
    oi = OracleIndex(CFG)
    oi.add_transcripts(generate_transcripts(N_CONVS))
    return oi


def test_manifest_counts(built_index, oracle_index):
    _, manifest = built_index
    oi = oracle_index
    assert manifest["n_docs"] == oi.N
    assert manifest["tokens_text"] == sum(
        sum(p.values()) for p in oi.text_post.values()
    )
    # verifyIndex invariant (mathindex.cpp:62-66): postings count == sum df
    assert manifest["postings_text"] == sum(len(p) for p in oi.text_post.values())
    assert manifest["postings_math"] == sum(len(p) for p in oi.math_post.values())
    assert manifest["tokens_math"] == sum(
        sum(p.values()) for p in oi.math_post.values()
    )
    assert manifest["problem_fragments"] == 0


def test_rank_identity_all_queries(built_index, oracle_index):
    out_dir, _ = built_index
    queries = query_set()
    res = search(queries, out_dir, concurrency=2).to_pandas()
    by_q = dict(tuple(res.groupby("query_id")))
    mismatches = []
    for row in queries.to_pylist():
        qid, kind, text, k = row["query_id"], row["kind"], row["text"], row["topk"]
        want = oracle_index.search(text, kind, k)
        got = by_q.get(qid)
        got_rows = (
            []
            if got is None
            else list(zip(got.sort_values("rank")["docid"], got["score"]))
        )
        if len(want) != len(got_rows):
            mismatches.append((qid, "len", len(want), len(got_rows)))
            continue
        for (wd, ws), (gd, gs) in zip(want, got_rows):
            if wd != gd or abs(ws - gs) > 1e-9:
                mismatches.append((qid, "row", (wd, ws), (int(gd), float(gs))))
                break
    assert not mismatches, mismatches[:10]


def test_nonempty_results(built_index):
    out_dir, _ = built_index
    res = search(query_set(), out_dir, concurrency=1).to_pandas()
    assert res.shape[0] > 50
    assert set(res.columns) == {"query_id", "rank", "docid", "dockey", "score"}
    # dockeys resolve to conv:turn strings
    assert res["dockey"].str.contains(":").all()


def test_resume_skips_complete_partitions(built_index, tmp_path_factory):
    """Rebuild with resume: identical manifest, partials untouched."""
    out_dir, manifest = built_index
    import json

    mtimes = {}
    pdir = os.path.join(out_dir, "partials")
    for p in os.listdir(pdir):
        mtimes[p] = os.path.getmtime(os.path.join(pdir, p, "_MANIFEST.json"))
    data_dir = os.path.join(os.path.dirname(out_dir), "transcripts")
    m2 = build_index(data_dir, out_dir, CFG, TranscriptsCorpus())
    assert m2 == manifest
    for p, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(pdir, p, "_MANIFEST.json")) == mt


def test_scorer_instrumentation(built_index):
    """Per-query counters (reference `I` rows analogue) are populated."""
    from tangent_ray.query.scorer import QueryScorer

    s = QueryScorer(built_index[0])
    d, _ = s.score_query("query index merge", "text", 10)
    st = s.last_stats
    assert st["qt_ms"] > 0
    assert st["postings"] > 0
    assert st["terms"] >= 1
    assert st["candidates"] >= st["returned"] == len(d)


def test_wand_matches_taat(built_index):
    """Block-max WAND must return the identical (docid, score) top-k as
    full TAAT accumulation — same floats, same tie-breaks."""
    import numpy as np

    from tangent_ray.query.scorer import QueryScorer

    taat = QueryScorer(built_index[0])
    wand = QueryScorer(built_index[0])
    wand.wand_min_postings = 1  # force the WAND path
    wand.wand_drive_ratio = 0   # ...even for unselective term mixes
    wand.wand_bailout_ratio = 0  # and keep it there (no TAAT fallback)
    for row in query_set().to_pylist():
        if row["kind"] != "text":
            continue
        k = int(row["topk"])
        d1, s1 = taat.score_query(row["text"], "text", k)
        d2, s2 = wand.score_query(row["text"], "text", k)
        assert (d1 == d2).all(), (row["query_id"], d1[:5], d2[:5])
        assert (s1 == s2).all(), (row["query_id"], np.abs(s1 - s2).max())


def test_hot_term_salting_identity(ray_session, tmp_path):
    """A term present in EVERY doc must score identically whether its
    postings were salted across docid-range buckets or built unsalted
    (multi-run segment rows sum exactly like one run)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tangent_ray.config import EngineConfig
    from tangent_ray.index.build import build_index
    from tangent_ray.query.scorer import QueryScorer
    from tangent_ray.sources.corpus import TranscriptsCorpus

    n = 300
    t = pa.table(
        {
            "conv_id": [f"c{i:05d}" for i in range(n)],
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "role": ["user"] * n,
            "text": [f"hotword filler{i % 17} tail{i % 5}" for i in range(n)],
            "tool": [""] * n,
            "ts": pa.array([0] * n, type=pa.timestamp("us")),
        }
    )
    data = str(tmp_path / "corpus")
    import os

    os.makedirs(data)
    pq.write_table(t, os.path.join(data, "part-0000.parquet"))

    outs = {}
    for salt in (1, 8):
        idx = str(tmp_path / f"idx{salt}")
        cfg = EngineConfig(window=1, eol="none", stem=True, math=False,
                           salt_buckets=salt)
        build_index(data, idx, cfg, TranscriptsCorpus())
        s = QueryScorer(idx)
        outs[salt] = s.score_query("hotword tail1", "text", 50)
    d1, s1 = outs[1]
    d8, s8 = outs[8]
    assert (d1 == d8).all()
    assert (s1 == s8).all()


def test_sharded_search_identity(built_index):
    """Sharded serving (each actor holds a partial subset + global stats)
    must return the identical result set as the unsharded pool."""
    from tangent_ray.query.scorer import search, search_sharded

    out_dir = built_index[0]
    full = search(query_set(), out_dir, concurrency=1).to_pandas()
    shard = search_sharded(query_set(), out_dir, n_shards=3).to_pandas()

    def norm(df):
        return {
            qid: list(zip(g.sort_values("rank")["docid"], g.sort_values("rank")["score"].round(12)))
            for qid, g in df.groupby("query_id")
        }

    f, s = norm(full), norm(shard)
    assert set(f) == set(s)
    for qid in f:
        assert f[qid] == s[qid], qid


def test_wildcard_patterns_share_tf_consumption(ray_session, tmp_path):
    """Two wildcard patterns expanding to the SAME doc tuple must share its
    tf (the reference's IDIterPL.rem decrement across IND iterators): a doc
    with one tuple scores F = 2*1/(1+2), never 2*2/(1+2) > 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tangent_ray.config import EngineConfig
    from tangent_ray.index.build import build_index
    from tangent_ray.query.scorer import QueryScorer
    from tangent_ray.sources.corpus import TranscriptsCorpus

    data = str(tmp_path / "c")
    os.makedirs(data)
    t = pa.table(
        {
            "conv_id": ["c0"],
            "turn_idx": pa.array([0], type=pa.int32()),
            "role": ["assistant"],
            "text": ["one formula $[V!y[V!x]]$ here"],
            "tool": [""],
            "ts": pa.array([0], type=pa.timestamp("us")),
        }
    )
    pq.write_table(t, os.path.join(data, "d.parquet"))
    idx = str(tmp_path / "i")
    build_index(data, idx, EngineConfig(window=1, eol="none"), TranscriptsCorpus())
    s = QueryScorer(idx)
    # two wildcard tuples: (?v -> V!x) and (V!y -> ?w); qtc = 2
    docs, scores = s.score_query("$[?v[V!x]]$ $[V!y[?w]]$", "math", 10)
    assert len(docs) == 1
    assert scores[0] <= 1.0 + 1e-12
    assert abs(scores[0] - 2.0 * 1.0 / (1 + 2)) < 1e-12
