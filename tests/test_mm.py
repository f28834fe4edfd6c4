"""``#mm:N`` minimum_should_match (Lucene/Solr mm): keep only docs
matching at least N distinct SHOULD clauses — plain terms, expansion
groups (any member counts the group once), and phrase clauses. Survivor
scores are unchanged (the cut happens after scoring, like filters)."""

from __future__ import annotations

import dataclasses
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG
from tangent_ray.index.build import build_index
from tangent_ray.index.positions import build_position_index
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import DocumentsCorpus

DOCS = [
    "alpha beta gamma",          # 1: all three
    "alpha beta",                # 2: two
    "alpha gamma",               # 3: two
    "alpha",                     # 4: one
    "beta",                      # 5: one
    "gamma delta",               # 6: one
    "alpha alpha alpha",         # 7: one (tf does not inflate mm)
    "delta eps",                 # 8: zero
    "alpha beta gamma delta",    # 9: all three
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("mm")
    src = str(root / "docs")
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(DOCS) + 1), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        ),
        os.path.join(src, "d.parquet"),
    )
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    import ray.data

    build_position_index(
        ray.data.read_parquet(src, columns=["doc_id", "text"]),
        os.path.join(out, "positions"), num_shards=2,
    )
    return out


def _matched(doc: str, clauses: list[set[str]]) -> int:
    toks = set(doc.split())
    return sum(1 for c in clauses if toks & c)


def test_mm_cut_and_score_identity(idx):
    sc = QueryScorer(idx)
    base_d, base_s = sc.score_query("alpha beta gamma", "text", 100)
    base = dict(zip(base_d.tolist(), base_s.tolist()))
    clauses = [{"alpha"}, {"beta"}, {"gamma"}]
    for mm in (2, 3):
        d, s = sc.score_query(f"alpha beta gamma #mm:{mm}", "text", 100)
        exp = {
            i + 1
            for i, doc in enumerate(DOCS)
            if _matched(doc, clauses) >= mm
        }
        assert set(d.tolist()) == exp, mm
        for x, y in zip(d.tolist(), s.tolist()):
            assert y == base[x]  # survivor scores unchanged


def test_mm_counts_groups_once(idx):
    sc = QueryScorer(idx)
    # {alpha,beta} is ONE clause: doc 2 (alpha beta) matches 1 clause
    d, _ = sc.score_query("{alpha,beta} gamma #mm:2", "text", 100)
    clauses = [{"alpha", "beta"}, {"gamma"}]
    exp = {
        i + 1 for i, doc in enumerate(DOCS) if _matched(doc, clauses) >= 2
    }
    assert set(d.tolist()) == exp and 2 not in set(d.tolist())


def test_mm_counts_phrases(idx):
    sc = QueryScorer(idx)
    d, _ = sc.score_query('"alpha beta" gamma #mm:2', "text", 100)
    # phrase matches docs 1, 2, 9; gamma matches 1, 3, 6, 9 -> mm 2: 1, 9
    assert set(d.tolist()) == {1, 9}


def test_mm_repeated_term_counts_once(idx):
    sc = QueryScorer(idx)
    d, _ = sc.score_query("alpha beta #mm:2", "text", 100)
    assert 7 not in set(d.tolist())  # "alpha alpha alpha": 1 clause
    assert set(d.tolist()) == {1, 2, 9}


def test_mm_above_clause_count_empty(idx):
    sc = QueryScorer(idx)
    d, _ = sc.score_query("alpha beta #mm:5", "text", 100)
    assert len(d) == 0


def test_mm_with_filter_and_paging(idx):
    sc = QueryScorer(idx)
    deep_d, deep_s = sc.score_query("alpha beta gamma #mm:2", "text", 100)
    rows, after = [], None
    for _ in range(50):
        d, s = sc.score_query("alpha beta gamma #mm:2", "text", 2,
                              after=after)
        if not len(d):
            break
        rows.extend(zip(d.tolist(), s.tolist()))
        after = (float(s[-1]), int(d[-1]))
    assert rows == list(zip(deep_d.tolist(), deep_s.tolist()))


def test_mm_kind_guard(idx):
    sc = QueryScorer(idx)
    with pytest.raises(ValueError, match="text queries only"):
        sc.score_query("$v!x$ #mm:2", "math", 10)


def test_match_all(idx):
    """'*' (and '*:*') — every live doc at constant score 1.0; filters,
    negation and paging compose; docid-asc order under the constant."""
    import numpy as np

    sc = QueryScorer(idx)
    d, s = sc.score_query("*", "text", 1000)
    assert d.tolist() == list(range(1, len(DOCS) + 1))
    assert set(s.tolist()) == {1.0}
    d2, _ = sc.score_query("*:*", "text", 1000)
    assert d2.tolist() == d.tolist()
    # negation composes
    d3, _ = sc.score_query("* -alpha", "text", 1000)
    assert d3.tolist() == [
        i + 1 for i, t in enumerate(DOCS) if "alpha" not in t.split()
    ]
    # paging under the constant score
    rows, after = [], None
    for _ in range(20):
        dp, sp = sc.score_query("*", "text", 3, after=after)
        if not len(dp):
            break
        rows.extend(dp.tolist())
        after = (float(sp[-1]), int(dp[-1]))
    assert rows == d.tolist()
    # k-cut keeps the first k docids
    d4, _ = sc.score_query("*", "text", 4)
    assert d4.tolist() == d.tolist()[:4]
