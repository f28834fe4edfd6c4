"""search_after pagination: page-concatenation identity vs one deep
query (incl. score ties), cursor semantics across all scoring paths
(negation / filters / math), WAND-path parity, and the actor-pool batch
columns."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG
from tangent_ray.index.build import build_index
from tangent_ray.query.scorer import QueryScorer, search
from tangent_ray.sources.corpus import DocumentsCorpus

# many ties: docs repeat a few templates so equal BM25 scores are common
DOCS = [
    ["alpha beta", "alpha beta", "alpha gamma", "beta beta", "alpha beta",
     "gamma gamma alpha", "beta alpha", "alpha beta", "delta", "alpha",
     "beta", "alpha beta gamma", "alpha beta", "gamma beta", "alpha alpha",
     "beta gamma"][i % 16] + (" pad" * (i % 3))
    for i in range(60)
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    import dataclasses

    root = tmp_path_factory.mktemp("after")
    src = str(root / "docs")
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        ),
        os.path.join(src, "d.parquet"),
    )
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=2),
                DocumentsCorpus())
    return out


def _pages(sc, q, kind, page, n_pages):
    rows = []
    after = None
    for _ in range(n_pages):
        d, s = sc.score_query(q, kind, page, after=after)
        if not len(d):
            break
        rows.extend(zip(d.tolist(), s.tolist()))
        after = (float(s[-1]), int(d[-1]))
    return rows


def test_page_concat_equals_deep_query(idx):
    sc = QueryScorer(idx)
    for q in ("alpha beta", "alpha", "beta gamma"):
        deep_d, deep_s = sc.score_query(q, "text", 1000)
        deep = list(zip(deep_d.tolist(), deep_s.tolist()))
        assert len(deep) > 10  # tie-heavy corpus: paging is actually paged
        for page in (3, 7, 10):
            got = _pages(sc, q, "text", page, 1000)
            assert got == deep, (q, page)


def test_after_with_negation_and_math(idx):
    sc = QueryScorer(idx)
    deep_d, deep_s = sc.score_query("alpha -delta", "text", 1000)
    deep = list(zip(deep_d.tolist(), deep_s.tolist()))
    assert _pages(sc, "alpha -delta", "text", 4, 1000) == deep


def test_after_cursor_is_strict(idx):
    # the cursor row itself never reappears, even among ties
    sc = QueryScorer(idx)
    d, s = sc.score_query("alpha beta", "text", 5)
    d2, _ = sc.score_query("alpha beta", "text", 5,
                           after=(float(s[-1]), int(d[-1])))
    assert set(d.tolist()).isdisjoint(d2.tolist())


def test_wand_parity_with_paging(idx):
    # force the WAND gate open for the first page, then page TAAT-only:
    # both must agree on the total order
    sc = QueryScorer(idx)
    sc.wand_min_postings = 1
    sc.wand_drive_ratio = 0
    first_d, first_s = sc.score_query("alpha beta", "text", 6)
    sc2 = QueryScorer(idx)
    got = _pages(sc2, "alpha beta", "text", 6, 1)
    assert got == list(zip(first_d.tolist(), first_s.tolist()))


def test_actor_pool_after_columns(idx, ray_session):
    sc = QueryScorer(idx)
    d, s = sc.score_query("alpha beta", "text", 5)
    qt = pa.table(
        {
            "query_id": pa.array(["p1", "p2"], pa.string()),
            "kind": pa.array(["text", "text"], pa.string()),
            "text": pa.array(["alpha beta", "alpha beta"], pa.string()),
            "topk": pa.array([5, 5], pa.int32()),
            "after_score": pa.array([None, float(s[-1])], pa.float64()),
            "after_docid": pa.array([None, int(d[-1])], pa.int64()),
        }
    )
    res = search(qt, idx).to_pandas()
    p1 = res[res.query_id == "p1"]
    p2 = res[res.query_id == "p2"]
    deep_d, _ = sc.score_query("alpha beta", "text", 10)
    assert list(p1.docid) + list(p2.docid) == deep_d.tolist()
