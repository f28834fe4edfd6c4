"""The retrieval wave on the NORTH-RULE corpus: prefix / synonym /
boost / #role-filter / paging / autocomplete over a stemmed TRANSCRIPTS
index (turn-level docids, role/tool facet sidecar), with brute-force
Python oracles and full/sharded identity."""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pytest

from tangent_ray.config import EngineConfig
from tangent_ray.fixtures import generate_transcripts, write_transcripts
from tangent_ray.index.build import build_index
from tangent_ray.query.facets import build_facet_sidecar
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import TranscriptsCorpus

N_CONVS = 40


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("exptr")
    src = str(root / "convs")
    write_transcripts(src, N_CONVS, files=2)
    out = str(root / "idx")
    build_index(
        src, out,
        EngineConfig(window=2, eol="small", stem=True, math=True,
                     partitions=2, salt_buckets=2),
        TranscriptsCorpus(),
    )
    build_facet_sidecar(out, ["role", "tool"])
    return out


def _turns():
    t = generate_transcripts(N_CONVS)
    return t


def test_prefix_matches_stemmed_vocab(idx):
    """qu* expands over the STEMMED vocabulary and hits every turn whose
    stemmed tokens carry the prefix."""
    sc = QueryScorer(idx)
    members = sc.reader.expand_prefix("quer", 128)
    assert members and all(m.startswith("quer") for m in members)
    d, s = sc.score_query("quer*", "text", 100_000)
    from tangent_ray.tokenize.porter import porter_stem

    t = _turns()
    want = set()
    for key, text in zip(
        (f"{c}:{i}" for c, i in zip(t["conv_id"].to_pylist(),
                                    t["turn_idx"].to_pylist())),
        t["text"].to_pylist(),
    ):
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        if any(porter_stem(w).startswith("quer") for w in toks):
            want.add(key)
    got = set(sc.reader.dockey_of(d))
    assert got == want


def test_role_filter_only_assistant_turns(idx):
    sc = QueryScorer(idx)
    d_all, _ = sc.score_query("join", "text", 100_000)
    d_f, _ = sc.score_query("join #role:assistant", "text", 100_000)
    assert 0 < len(d_f) < len(d_all)
    t = _turns()
    role_of = {
        f"{c}:{i}": r
        for c, i, r in zip(t["conv_id"].to_pylist(),
                           t["turn_idx"].to_pylist(),
                           t["role"].to_pylist())
    }
    keys = sc.reader.dockey_of(d_f)
    assert all(role_of[k] == "assistant" for k in keys)
    # every assistant turn from the unfiltered result survives
    surviving = {k for k in sc.reader.dockey_of(d_all)
                 if role_of[k] == "assistant"}
    assert set(keys) == surviving


def test_sharded_identity_transcripts(idx):
    import json

    with open(os.path.join(idx, "manifest.json")) as f:
        partials = json.load(f)["partials"]
    assert len(partials) == 2
    for q in ("quer*", "{join,merge} index", "index^2 join"):
        sc = QueryScorer(idx)
        d, s = sc.score_query(q, "text", 100_000)
        full = dict(zip(d.tolist(), np.round(s, 9).tolist()))
        union = {}
        for p in partials:
            scp = QueryScorer(idx, partials=[p])
            dp, sp = scp.score_query(q, "text", 100_000)
            for dd, ss in zip(dp.tolist(), np.round(sp, 9).tolist()):
                assert dd not in union
                union[dd] = ss
        assert union == full, q


def test_paging_identity_transcripts(idx):
    sc = QueryScorer(idx)
    deep_d, deep_s = sc.score_query("index join", "text", 100_000)
    deep = list(zip(deep_d.tolist(), deep_s.tolist()))
    rows, after = [], None
    while True:
        d, s = sc.score_query("index join", "text", 37, after=after)
        if not len(d):
            break
        rows.extend(zip(d.tolist(), s.tolist()))
        after = (float(s[-1]), int(d[-1]))
    assert rows == deep


def test_complete_stemmed(idx):
    sc = QueryScorer(idx)
    got = sc.reader.complete("ind", n=5)
    assert got.num_rows >= 1
    # completions are stemmed index terms, df-desc
    dfs = got["df"].to_pylist()
    assert dfs == sorted(dfs, reverse=True)
    assert all(t.startswith("ind") for t in got["term"].to_pylist())
