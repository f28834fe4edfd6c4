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


def test_incremental_build_query_interleave(env):
    """SURVEY §2.9: the index is queryable after each increment, and after
    all increments it scores bit-identically to a one-shot full build."""
    import os

    import pyarrow.parquet as pq

    from tangent_ray.fixtures import generate_conv_range
    from tangent_ray.index.build import add_increment, build_index
    from tangent_ray.query.scorer import QueryScorer
    from tangent_ray.sources.corpus import TranscriptsCorpus

    data_dir, out_dir, _, _ = env
    root = os.path.dirname(out_dir)
    inc_idx = os.path.join(root, "inc_idx")
    full_idx = os.path.join(root, "full_idx")

    d1 = os.path.join(root, "inc1")
    d2 = os.path.join(root, "inc2")
    dall = os.path.join(root, "all")
    for d in (d1, d2, dall):
        os.makedirs(d, exist_ok=True)
    pq.write_table(generate_conv_range(0, 20), os.path.join(d1, "a.parquet"))
    pq.write_table(generate_conv_range(20, 40), os.path.join(d2, "b.parquet"))
    pq.write_table(generate_conv_range(0, 40), os.path.join(dall, "all.parquet"))

    m1 = add_increment(d1, inc_idx, CFG, TranscriptsCorpus())
    s = QueryScorer(inc_idx)
    d_first, _ = s.score_query("query index", "text", 10)
    assert len(d_first) > 0 and m1["n_docs"] > 0

    m2 = add_increment(d2, inc_idx)  # cfg/corpus from the manifest
    assert m2["n_docs"] > m1["n_docs"]

    build_index(dall, full_idx, CFG, TranscriptsCorpus())
    si = QueryScorer(inc_idx)
    sf = QueryScorer(full_idx)
    for q in ("query index", "token merge shard", "cache"):
        di, vi = si.score_query(q, "text", 25)
        df_, vf = sf.score_query(q, "text", 25)
        assert (di == df_).all()
        assert (vi == vf).all()


def test_increment_config_mismatch_raises(env):
    import os

    import pyarrow.parquet as pq
    import pytest as _pytest

    from tangent_ray.config import EngineConfig
    from tangent_ray.fixtures import generate_conv_range
    from tangent_ray.index.build import add_increment
    from tangent_ray.sources.corpus import TranscriptsCorpus

    data_dir, out_dir, _, _ = env
    root = os.path.dirname(out_dir)
    d = os.path.join(root, "inc_cfg")
    os.makedirs(d, exist_ok=True)
    pq.write_table(generate_conv_range(0, 5), os.path.join(d, "a.parquet"))
    idx = os.path.join(root, "inc_cfg_idx")
    add_increment(d, idx, CFG, TranscriptsCorpus())
    other = EngineConfig(window=3, eol="all", stem=False, math=False)
    with _pytest.raises(ValueError):
        add_increment(d, idx, other)


def test_verify_index_catches_double_ingestion(ray_session, tmp_path):
    """Re-ingesting the same files as a new increment duplicates every
    docid; verify_index's cross-partial uniqueness groupby must raise (it
    would silently double-count df/cf in scoring otherwise)."""
    from tangent_ray.index.build import add_increment

    data_dir = str(tmp_path / "tr")
    out_dir = str(tmp_path / "idx")
    write_transcripts(data_dir, 6, files=2)
    cfg = EngineConfig(window=1, eol="small", partitions=1)
    build_index(data_dir, out_dir, cfg, TranscriptsCorpus())
    verify_index(out_dir)  # clean index passes
    add_increment(data_dir, out_dir)  # same docs again -> duplicate docids
    with pytest.raises(Exception):
        verify_index(out_dir)
    # totals-only spot check still works on the corrupted index
    verify_index(out_dir, check_unique=False)


def test_compact_index_refinalizes_global_manifest(ray_session, tmp_path):
    """compact_index must leave the global manifest pointing at live
    partial dirs (the public API contract: index stays queryable)."""
    data_dir = str(tmp_path / "tr")
    out_dir = str(tmp_path / "idx")
    write_transcripts(data_dir, 10, files=4)
    cfg = EngineConfig(window=1, eol="small", partitions=4)
    build_index(data_dir, out_dir, cfg, TranscriptsCorpus())
    before = search(query_set(), out_dir, concurrency=1).to_pandas()
    compact_index(out_dir, max_partials=1)
    with open(os.path.join(out_dir, "manifest.json")) as f:
        g = json.load(f)
    for p in g["partials"]:
        assert os.path.isdir(os.path.join(out_dir, "partials", p)), p
    assert len(g["partials"]) == 1
    verify_index(out_dir)
    after = search(query_set(), out_dir, concurrency=1).to_pandas()
    cols = ["query_id", "rank", "docid"]
    assert before[cols].sort_values(cols).reset_index(drop=True).equals(
        after[cols].sort_values(cols).reset_index(drop=True)
    )


def test_crash_leftover_tmp_dir_is_not_a_partial(ray_session, tmp_path):
    """A '*__tmp' dir with a manifest (crash between manifest write and the
    atomic rename) must not be counted by finalize_index or compaction."""
    import json
    import shutil

    from tangent_ray.config import EngineConfig
    from tangent_ray.fixtures import write_transcripts
    from tangent_ray.index.build import build_index, finalize_index
    from tangent_ray.sources.corpus import TranscriptsCorpus

    data = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    write_transcripts(data, 10, files=2)
    cfg = EngineConfig(window=1, eol="none", partitions=1)
    m = build_index(data, idx, cfg, TranscriptsCorpus())
    # simulate the crash window: a fully-manifested tmp copy of the partial
    src = os.path.join(idx, "partials", m["partials"][0])
    shutil.copytree(src, src + "__tmp")
    g = finalize_index(idx, cfg, TranscriptsCorpus())
    assert g["partials"] == m["partials"]  # tmp dir NOT included
    assert g["n_docs"] == m["n_docs"]  # docs not double-counted


def test_resume_rebuilds_on_lineage_mismatch(ray_session, tmp_path):
    """Resume skips a partition only when its recorded inputs + config match
    the current plan; adding input files forces the remap to rebuild."""
    import pyarrow.parquet as pq

    from tangent_ray.config import EngineConfig
    from tangent_ray.fixtures import generate_conv_range, write_transcripts
    from tangent_ray.index.build import build_index
    from tangent_ray.sources.corpus import TranscriptsCorpus

    data = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    write_transcripts(data, 12, files=3)
    cfg = EngineConfig(window=1, eol="none", partitions=3)
    m1 = build_index(data, idx, cfg, TranscriptsCorpus())
    # new input file shifts the file->partition mapping
    pq.write_table(generate_conv_range(12, 16), os.path.join(data, "zz_new.parquet"))
    m2 = build_index(data, idx, cfg, TranscriptsCorpus())
    assert m2["n_docs"] > m1["n_docs"]
    # every planned file is covered exactly once across partials
    import glob as _glob
    import json

    covered = []
    for p in m2["partials"]:
        with open(os.path.join(idx, "partials", p, "_MANIFEST.json")) as f:
            covered += json.load(f)["input_files"]
    assert sorted(covered) == sorted(
        _glob.glob(os.path.join(data, "*.parquet"))
    )
