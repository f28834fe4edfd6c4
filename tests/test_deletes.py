"""Tombstone deletes (Lucene-style live-docs; index/deletes.py).

Contract under test:
- a delete hides documents from results IMMEDIATELY (new readers) while
  leaving every surviving doc's score bit-identical (stats stay pre-delete
  until purge — the Lucene visibility rule);
- the WAND path stays exact under deletes (a tombstoned top doc must not
  inflate the pruning threshold and shadow the live successors);
- purge_deletes physically removes the docs, after which the index is
  rank+score identical to a FRESH BUILD over the reduced corpus and passes
  verify_index;
- the matched-tombstone accounting is exact on both the docmap path
  (transcripts) and the postings-sweep path (documents corpus).
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG, EngineConfig
from tangent_ray.docids import dockey_to_docid
from tangent_ray.fixtures import generate_transcripts, query_set, write_transcripts
from tangent_ray.index.build import build_index
from tangent_ray.index.deletes import (
    delete_docs,
    load_tombstones,
    matched_tombstones,
    purge_deletes,
)
from tangent_ray.index.merge import verify_index
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import DocumentsCorpus, TranscriptsCorpus

CFG = EngineConfig(window=1, eol="small", stem=True, math=True,
                   block_size=16, salt_buckets=2, partitions=4)
N_CONVS = 24


@pytest.fixture(scope="module")
def env(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("deletes")
    data_dir = str(root / "tr")
    out_dir = str(root / "idx")
    write_transcripts(data_dir, N_CONVS, files=4)
    manifest = build_index(data_dir, out_dir, CFG, TranscriptsCorpus())
    return root, data_dir, out_dir, manifest


def _all_results(index_dir: str, kinds=("text", "math", "mixed")):
    s = QueryScorer(index_dir)
    out = {}
    for row in query_set().to_pylist():
        if row["kind"] not in kinds:
            continue
        d, sc = s.score_query(row["text"], row["kind"], int(row["topk"]))
        out[row["query_id"]] = list(zip(d.tolist(), np.round(sc, 12).tolist()))
    return out


def test_delete_hides_docs_immediately(env):
    root, _, out_dir, _ = env
    idx = str(root / "idx_del")
    shutil.copytree(out_dir, idx)
    text_q = next(r for r in query_set().to_pylist() if r["kind"] == "text")

    s = QueryScorer(idx)
    d, sc = s.score_query(text_q["text"], "text", 10_000)  # full candidates
    assert len(d) >= 3
    victims = d[:2]
    out = delete_docs(idx, docids=victims.tolist())
    assert out["n_tombstones"] == 2

    s2 = QueryScorer(idx)  # new reader sees the tombstones
    d2, sc2 = s2.score_query(text_q["text"], "text", 10_000)
    keep = ~np.isin(d, victims)
    # survivors keep their exact pre-delete scores (stats change at purge)
    assert (d2 == d[keep]).all()
    assert (sc2 == sc[keep]).all()

    # math candidates are filtered through the same live-docs set
    math_q = next(r for r in query_set().to_pylist() if r["kind"] == "math")
    dm, _ = s2.score_query(math_q["text"], "math", 10_000)
    assert not np.isin(dm, victims).any()


def test_delete_by_dockey(env):
    root, _, out_dir, _ = env
    idx = str(root / "idx_key")
    shutil.copytree(out_dir, idx)
    delete_docs(idx, dockeys=["0:0", "1:2"])
    tomb = load_tombstones(idx)
    assert set(tomb.tolist()) == {dockey_to_docid("0:0"), dockey_to_docid("1:2")}
    with pytest.raises(ValueError):
        delete_docs(idx)  # nothing to delete


def test_wand_stays_exact_under_deletes(env):
    root, _, out_dir, _ = env
    idx = str(root / "idx_wand")
    shutil.copytree(out_dir, idx)
    qs = [r for r in query_set().to_pylist() if r["kind"] == "text"]

    probe = QueryScorer(idx)
    d, _ = probe.score_query(qs[0]["text"], "text", 50)
    assert len(d) >= 5
    delete_docs(idx, docids=d[:3].tolist())  # tombstone the TOP docs

    taat = QueryScorer(idx)
    wand = QueryScorer(idx)
    wand.wand_min_postings = 1
    wand.wand_drive_ratio = 0
    wand.wand_bailout_ratio = 0
    for row in qs:
        k = int(row["topk"])
        d1, s1 = taat.score_query(row["text"], "text", k)
        d2, s2 = wand.score_query(row["text"], "text", k)
        assert (d1 == d2).all(), row["query_id"]
        assert (s1 == s2).all(), row["query_id"]
        assert not np.isin(d1, d[:3]).any()
    # the deleted top docs were REPLACED by live successors, not dropped
    d1, _ = taat.score_query(qs[0]["text"], "text", 3)
    assert len(d1) == 3


def test_purge_equals_fresh_build(env):
    root, _, out_dir, manifest = env
    idx = str(root / "idx_purge")
    shutil.copytree(out_dir, idx)

    s = QueryScorer(idx)
    text_q = next(r for r in query_set().to_pylist() if r["kind"] == "text")
    d, _ = s.score_query(text_q["text"], "text", 10)
    victims = [int(d[0]), int(d[2])]
    # two tombstone files + one id that exists nowhere in the corpus
    delete_docs(idx, docids=[victims[0], 12345])
    delete_docs(idx, docids=[victims[1]])
    tomb = load_tombstones(idx)
    assert tomb.size == 3
    assert set(matched_tombstones(idx, tomb).tolist()) == set(victims)

    m2 = purge_deletes(idx)
    assert not os.path.exists(os.path.join(idx, "deletes"))
    assert m2["n_docs"] == manifest["n_docs"] - 2
    assert m2["n_tombstones"] == 0
    verify_index(idx)

    # fresh build over the corpus MINUS the deleted docs
    full = generate_transcripts(N_CONVS)
    keys = [
        f"{c}:{t}"
        for c, t in zip(full["conv_id"].to_pylist(), full["turn_idx"].to_pylist())
    ]
    docids = np.array([dockey_to_docid(k) for k in keys], dtype=np.int64)
    reduced = full.filter(pa.array(~np.isin(docids, victims)))
    rdir = str(root / "reduced")
    os.makedirs(rdir, exist_ok=True)
    pq.write_table(reduced, os.path.join(rdir, "part0.parquet"))
    fresh = str(root / "idx_fresh")
    m3 = build_index(rdir, fresh, CFG, TranscriptsCorpus())

    for key in ("n_docs", "tokens_text", "tokens_math", "postings_text",
                "postings_math", "problem_fragments", "avgdl_text"):
        assert m2[key] == m3[key], key
    assert _all_results(idx) == _all_results(fresh)


def test_purge_noop_without_tombstones(env):
    root, _, out_dir, manifest = env
    idx = str(root / "idx_noop")
    shutil.copytree(out_dir, idx)
    m = purge_deletes(idx)
    assert m["n_docs"] == manifest["n_docs"]
    assert sorted(os.listdir(os.path.join(idx, "partials"))) == sorted(
        os.listdir(os.path.join(out_dir, "partials"))
    )


def test_postings_sweep_matched_path(ray_session, tmp_path):
    """documents corpus (no docmap sidecar): matched_tombstones must fall
    back to the distributed postings sweep and still be exact."""
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "text": pa.array(
                [f"alpha beta doc{i} gamma" if i % 2 else f"delta doc{i}"
                 for i in range(40)],
                pa.string(),
            ),
        }
    )
    src = str(tmp_path / "docs")
    os.makedirs(src)
    pq.write_table(docs, os.path.join(src, "d.parquet"))
    idx = str(tmp_path / "idx")
    import dataclasses

    cfg = dataclasses.replace(SQL_PARITY_CONFIG, partitions=2)
    m = build_index(src, idx, cfg, DocumentsCorpus())
    assert m["n_docs"] == 40

    delete_docs(idx, docids=[3, 7, 10_000])  # 10_000 not in the corpus
    tomb = load_tombstones(idx)
    assert set(matched_tombstones(idx, tomb).tolist()) == {3, 7}

    s = QueryScorer(idx)
    d, _ = s.score_query("alpha beta", "text", 100)
    assert not np.isin(d, [3, 7]).any()

    m2 = purge_deletes(idx)
    assert m2["n_docs"] == 38
    verify_index(idx)
    d2, _ = QueryScorer(idx).score_query("alpha beta", "text", 100)
    assert (d2 == d).all()
