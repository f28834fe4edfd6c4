"""Tiered merge + verify-invariants + resume-after-failure tests."""

import json
import os
import shutil

import pytest

from tangent_ray.config import EngineConfig
from tangent_ray.fixtures import generate_transcripts, query_set, write_transcripts
from tangent_ray.index.build import MANIFEST_NAME, build_index, finalize_index
from tangent_ray.index.merge import compact_index, verify_index
from tangent_ray.query.scorer import search
from tangent_ray.sources.corpus import TranscriptsCorpus

from oracle import OracleIndex

CFG = EngineConfig(window=1, eol="small", stem=True, math=True,
                   block_size=16, salt_buckets=2, partitions=6)
N_CONVS = 30


@pytest.fixture(scope="module")
def env(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    data_dir = str(root / "tr")
    out_dir = str(root / "idx")
    write_transcripts(data_dir, N_CONVS, files=6)
    manifest = build_index(data_dir, out_dir, CFG, TranscriptsCorpus())
    oi = OracleIndex(CFG)
    oi.add_transcripts(generate_transcripts(N_CONVS))
    return data_dir, out_dir, manifest, oi


def _results(out_dir, oi):
    res = search(query_set(), out_dir, concurrency=1).to_pandas()
    got = {}
    for qid, g in res.groupby("query_id"):
        g = g.sort_values("rank")
        got[qid] = list(zip(g["docid"], g["score"].round(9)))
    return got


def test_verify_invariants(env):
    _, out_dir, manifest, _ = env
    totals = verify_index(out_dir)
    assert totals["postings_text"] == manifest["postings_text"]


def test_compact_preserves_results(env):
    data_dir, out_dir, manifest, oi = env
    before = _results(out_dir, oi)
    copy = out_dir + "_compacted"
    shutil.copytree(out_dir, copy)
    names = compact_index(copy, max_partials=2, fanin=3)
    assert len(names) <= 2
    m2 = finalize_index(copy, CFG, TranscriptsCorpus())
    assert m2["n_docs"] == manifest["n_docs"]
    assert m2["postings_text"] == manifest["postings_text"]
    assert m2["tokens_math"] == manifest["tokens_math"]
    verify_index(copy)
    after = _results(copy, oi)
    assert before == after  # rank + score identical through the merge


def test_resume_after_partial_failure(env):
    data_dir, out_dir, manifest, _ = env
    broken = out_dir + "_broken"
    shutil.copytree(out_dir, broken)
    pdir = os.path.join(broken, "partials")
    victims = sorted(os.listdir(pdir))[2:4]
    # simulate a mid-build crash: one partition gone, one half-written (tmp)
    shutil.rmtree(os.path.join(pdir, victims[0]))
    os.rename(
        os.path.join(pdir, victims[1]), os.path.join(pdir, victims[1] + "__tmp")
    )
    m2 = build_index(data_dir, broken, CFG, TranscriptsCorpus())
    assert m2["n_docs"] == manifest["n_docs"]
    assert m2["postings_text"] == manifest["postings_text"]
    assert m2["postings_math"] == manifest["postings_math"]
    with open(os.path.join(broken, "manifest.json")) as f:
        assert json.load(f)["partials"] == manifest["partials"]
    verify_index(broken)
