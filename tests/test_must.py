"""``+term`` required (MUST) clauses — Lucene BooleanQuery: the doc must
contain every ``+term``; all clauses keep SHOULD scoring, so survivor
scores are unchanged. Interplay with mm / phrases / negation / paging."""

from __future__ import annotations

import dataclasses
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG, EngineConfig
from tangent_ray.index.build import build_index
from tangent_ray.index.positions import build_position_index
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import DocumentsCorpus

DOCS = [
    "alpha beta gamma",     # 1
    "alpha beta",           # 2
    "alpha gamma",          # 3
    "beta gamma",           # 4
    "alpha",                # 5
    "beta",                 # 6
    "gamma delta",          # 7
    "alpha beta gamma delta",  # 8
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("must")
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


def _docs_with(*terms):
    return {
        i + 1
        for i, doc in enumerate(DOCS)
        if all(t in doc.split() for t in terms)
    }


def test_must_cut_scores_unchanged(idx):
    sc = QueryScorer(idx)
    base_d, base_s = sc.score_query("alpha beta gamma", "text", 100)
    base = dict(zip(base_d.tolist(), base_s.tolist()))
    d, s = sc.score_query("+alpha beta gamma", "text", 100)
    assert set(d.tolist()) == {k for k in base if k in _docs_with("alpha")}
    for x, y in zip(d.tolist(), s.tolist()):
        assert y == base[x]
    d2, _ = sc.score_query("+alpha +beta gamma", "text", 100)
    assert set(d2.tolist()) == _docs_with("alpha", "beta")


def test_must_required_term_scores_too(idx):
    """+term is also a SHOULD clause: +alpha alone ranks by alpha's BM25."""
    sc = QueryScorer(idx)
    d1, s1 = sc.score_query("+alpha", "text", 100)
    d2, s2 = sc.score_query("alpha", "text", 100)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()


def test_must_absent_term_empties(idx):
    sc = QueryScorer(idx)
    d, _ = sc.score_query("+zzz alpha", "text", 100)
    assert len(d) == 0


def test_must_with_phrase_mm_negation(idx):
    sc = QueryScorer(idx)
    # phrase SHOULD + required term
    d, _ = sc.score_query('+delta "alpha beta"', "text", 100)
    assert set(d.tolist()) == _docs_with("delta")
    # mm counts clauses independently of MUST
    d2, _ = sc.score_query("+alpha beta gamma #mm:3", "text", 100)
    assert set(d2.tolist()) == _docs_with("alpha", "beta", "gamma")
    # negation composes
    d3, _ = sc.score_query("+alpha beta -delta", "text", 100)
    assert set(d3.tolist()) == _docs_with("alpha") - _docs_with("delta")


def test_must_paging_identity(idx):
    sc = QueryScorer(idx)
    deep_d, deep_s = sc.score_query("+alpha beta gamma", "text", 100)
    rows, after = [], None
    for _ in range(50):
        d, s = sc.score_query("+alpha beta gamma", "text", 2, after=after)
        if not len(d):
            break
        rows.extend(zip(d.tolist(), s.tolist()))
        after = (float(s[-1]), int(d[-1]))
    assert rows == list(zip(deep_d.tolist(), deep_s.tolist()))


def test_must_stemmed_index(ray_session, tmp_path):
    """+running requires the STEMMED term (the indexed vocabulary), like
    plain query terms."""
    src = str(tmp_path / "docs")
    os.makedirs(src)
    docs = ["running fast", "runs slow", "walking fast"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        os.path.join(src, "d.parquet"),
    )
    out = str(tmp_path / "idx")
    build_index(
        src, out,
        EngineConfig(stem=True, math=False, window=1, eol="none",
                     partitions=1),
        DocumentsCorpus(),
    )
    sc = QueryScorer(out)
    d, _ = sc.score_query("+running fast", "text", 10)
    # porter: running -> run, runs -> run: both docs 1 and 2 contain 'run'
    assert set(d.tolist()) == {1, 2}


def test_plus_as_punctuation(idx):
    """'a + b' (spaced +) is punctuation, not a MUST clause."""
    sc = QueryScorer(idx)
    d1, s1 = sc.score_query("alpha + beta", "text", 100)
    d2, s2 = sc.score_query("alpha beta", "text", 100)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()


def test_required_phrase(idx):
    """+\"a b\" scores like \"a b\" AND cuts candidates to its matches."""
    sc = QueryScorer(idx)
    base_d, base_s = sc.score_query('"alpha beta" gamma', "text", 100)
    base = dict(zip(base_d.tolist(), base_s.tolist()))
    d, s = sc.score_query('+"alpha beta" gamma', "text", 100)
    phrase_docs = {
        i + 1
        for i, doc in enumerate(DOCS)
        if "alpha beta" in " " + doc + " "
        and any(
            doc.split()[j : j + 2] == ["alpha", "beta"]
            for j in range(len(doc.split()))
        )
    }
    assert set(d.tolist()) == {k for k in base if k in phrase_docs}
    for x, y in zip(d.tolist(), s.tolist()):
        assert y == base[x]
    # no-match required phrase: zero results even with matching terms
    d2, _ = sc.score_query('+"delta alpha" gamma', "text", 100)
    assert len(d2) == 0
    # sloppy required phrase widens the cut set
    d3, _ = sc.score_query('+"alpha gamma"~2 beta', "text", 100)
    wide = {
        i + 1 for i, doc in enumerate(DOCS)
        if _sloppy_match(doc.split(), ("alpha", "gamma"), 2)
    }
    base3_d, _ = sc.score_query('"alpha gamma"~2 beta', "text", 100)
    assert set(d3.tolist()) == set(base3_d.tolist()) & wide


def _sloppy_match(tt, terms, slop):
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
            return True
    return False


def test_required_wildcard_not_half_parsed(idx):
    """``+alpha*`` must NOT backtrack into MUST 'alph' (empty results) —
    it falls through to the ordinary wildcard pass."""
    sc = QueryScorer(idx)
    d1, s1 = sc.score_query("+alpha* gamma", "text", 100)
    d2, s2 = sc.score_query("alpha* gamma", "text", 100)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
    assert len(d1)
