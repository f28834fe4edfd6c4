"""SymSpell-style fuzzy suggestions: deletes-index candidates verified by
true Levenshtein, differential against a DuckDB full-scan levenshtein()
oracle, ranking rules, did-you-mean query rewrite, and seeded fuzz."""

from __future__ import annotations

import os
import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG
from tangent_ray.index.build import build_index
from tangent_ray.query.fuzzy import (
    Suggester,
    _delete_variants,
    build_suggest_index,
    levenshtein,
    suggest_rewrite,
)
from tangent_ray.sources.corpus import DocumentsCorpus

DOCS = [
    "query planner scans the relation",
    "the planner chooses a hash join",
    "query query query optimizer",
    "relation scan with predicate pushdown",
    "quarry stone",                # near 'query' (dist 2)
    "plan the work",
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    import dataclasses

    root = tmp_path_factory.mktemp("fuzzy")
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
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    build_suggest_index(out, max_edit=2)
    return out


def test_levenshtein_matches_duckdb():
    rng = random.Random(3)
    words = ["", "a", "query", "qurey", "quarry", "planner", "plan", "scan",
             "scna", "relation", "relatoin"]
    con = duckdb.connect()
    for _ in range(60):
        a, b = rng.choice(words), rng.choice(words)
        want = con.execute(f"select levenshtein('{a}','{b}')").fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_delete_variants_counts():
    assert _delete_variants("ab", 1) == {"ab", "a", "b"}
    v = _delete_variants("abcd", 2)
    assert "abcd" in v and "ab" in v and "acd" in v
    # 1 + 4 + C(4,2) distinct strings for distinct-letter words
    assert len(v) == 1 + 4 + 6


def _oracle(idx_dir, word, d, topn=5):
    """Full-scan DuckDB oracle: rank the whole lexicon by levenshtein."""
    con = duckdb.connect()
    got = con.execute(
        f"""
        SELECT term, levenshtein('{word}', term) AS dist, df
        FROM read_parquet('{os.path.join(idx_dir, "term_stats.parquet")}')
        WHERE kind = 0 AND term <> '{word}'
          AND levenshtein('{word}', term) <= {d}
        ORDER BY dist, df DESC, term LIMIT {topn}
        """
    ).fetchall()
    return [(t, int(dist), int(df)) for t, dist, df in got]


def test_suggest_matches_full_scan_oracle(idx):
    s = Suggester(idx)
    for word in ("qurey", "plannr", "scn", "relatin", "quary", "xyz",
                 "query", "hash", "joim"):
        for d in (1, 2):
            assert s.suggest(word, max_edit=d) == _oracle(idx, word, d), (word, d)


def test_ranking_prefers_distance_then_df(idx):
    s = Suggester(idx)
    got = s.suggest("quer", max_edit=2)
    assert got and got[0][0] == "query"  # dist 1 beats dist-2 candidates
    dists = [g[1] for g in got]
    assert dists == sorted(dists)


def test_suggest_rewrite(idx):
    text, fixes = suggest_rewrite(idx, "qurey plannr $[V!x]$ join")
    assert fixes == {"qurey": "query", "plannr": "planner"}
    assert text == "query planner $[V!x]$ join"
    # known terms and math spans untouched
    text2, fixes2 = suggest_rewrite(idx, "query join")
    assert text2 == "query join" and fixes2 == {}


def test_fuzz_against_oracle(idx):
    rng = random.Random(11)
    s = Suggester(idx)
    base = ["query", "planner", "relation", "scan", "predicate", "optimizer"]
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(25):
        w = list(rng.choice(base))
        for _ in range(rng.randrange(1, 3)):
            op = rng.choice(["del", "ins", "sub", "swap"])
            i = rng.randrange(len(w))
            if op == "del" and len(w) > 1:
                del w[i]
            elif op == "ins":
                w.insert(i, rng.choice(alphabet))
            elif op == "sub":
                w[i] = rng.choice(alphabet)
            elif op == "swap" and i + 1 < len(w):
                w[i], w[i + 1] = w[i + 1], w[i]
        word = "".join(w)
        assert s.suggest(word, max_edit=2) == _oracle(idx, word, 2), word


def test_rewrite_leaves_mathml_topics_verbatim(idx):
    q = '<math xmlns="x"><mi>zz</mi></math> qurey'
    text, fixes = suggest_rewrite(idx, q)
    assert text == q and fixes == {}


def test_purge_rebuilds_suggest_sidecar(idx, tmp_path, ray_session):
    import shutil

    from tangent_ray.index.deletes import delete_docs, purge_deletes

    copy = str(tmp_path / "idx2")
    shutil.copytree(idx, copy)
    s = Suggester(copy)
    before = s.suggest("qurey")
    assert before and before[0][0] == "query"
    # delete the docs that contain 'query' and purge: the sidecar must be
    # rebuilt so the vanished term is no longer suggested
    delete_docs(copy, docids=[0, 2])
    purge_deletes(copy)
    after = Suggester(copy).suggest("qurey")
    assert all(t != "query" for t, _, _ in after)


def test_suggest_stale_after_increment(ray_session, tmp_path):
    """add_increment invalidates the suggest sidecar: loading raises with
    a rebuild hint, allow_stale serves the old vocab, and a rebuild
    clears the staleness."""
    import dataclasses
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from tangent_ray.config import SQL_PARITY_CONFIG
    from tangent_ray.index.build import add_increment, build_index
    from tangent_ray.query.fuzzy import Suggester, build_suggest_index
    from tangent_ray.sources.corpus import DocumentsCorpus

    src1, src2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    for src, lo, word in ((src1, 0, "alpha"), (src2, 10, "omega")):
        os.makedirs(src)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(lo, lo + 2), pa.int64()),
                    "text": pa.array([f"{word} words"] * 2, pa.string()),
                }
            ),
            os.path.join(src, "d.parquet"),
        )
    out = str(tmp_path / "idx")
    build_index(src1, out,
                dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    build_suggest_index(out)
    assert Suggester(out).suggest("alpa")  # fresh: loads fine
    add_increment(src2, out)
    with pytest.raises(ValueError, match="stale"):
        Suggester(out)
    stale = Suggester(out, allow_stale=True)
    assert not stale.suggest("omeg")  # old vocab: increment word missing
    build_suggest_index(out)
    assert Suggester(out).suggest("omeg")  # rebuilt: increment word found


# ---------------------------------------------------------------------------
# fuzzy QUERY terms (`term~d` Lucene syntax) — expansion + scoring


def _brute_expand(idx, word, d, cap):
    """Full-scan oracle for expand_fuzzy's (dist asc, df desc, term asc)
    rank-and-cap rule, word itself included when indexed."""
    from tangent_ray.query.scorer import IndexReader

    terms, dfs = IndexReader(idx).text_vocab()
    ranked = sorted(
        (levenshtein(word, t), -int(df), t)
        for t, df in zip(terms, dfs)
        if levenshtein(word, t) <= d
    )
    return [t for _, _, t in ranked[:cap]]


def test_expand_fuzzy_matches_brute_force(idx):
    from tangent_ray.query.scorer import IndexReader

    r = IndexReader(idx)
    for word in ("quary", "plann", "qery", "zzz", "the"):
        for d in (1, 2):
            assert r.expand_fuzzy(word, d, 128) == _brute_expand(
                idx, word, d, 128
            ), (word, d)


def test_expand_fuzzy_sidecar_and_scan_paths_identical(idx, tmp_path):
    """The SymSpell-probe fast path and the banded-DP lexicon scan must
    return the same members in the same order."""
    import shutil

    from tangent_ray.query.fuzzy import SUGGEST_NAME
    from tangent_ray.query.scorer import IndexReader

    bare = str(tmp_path / "bare")
    shutil.copytree(idx, bare)
    os.remove(os.path.join(bare, SUGGEST_NAME))
    with_sidecar, without = IndexReader(idx), IndexReader(bare)
    for word in ("quary", "qery", "scann", "reltion"):
        for d in (1, 2):
            a = with_sidecar.expand_fuzzy(word, d, 128)
            b = without.expand_fuzzy(word, d, 128)
            assert a == b, (word, d, a, b)
    assert with_sidecar._fuzzy_suggester is not None
    assert without._fuzzy_suggester is None


def test_expand_fuzzy_cap_and_d0(idx):
    from tangent_ray.query.scorer import IndexReader

    r = IndexReader(idx)
    full = r.expand_fuzzy("quary", 2, 128)
    assert r.expand_fuzzy("quary", 2, 1) == full[:1]
    assert r.expand_fuzzy("query", 0, 128) == ["query"]  # indexed
    assert r.expand_fuzzy("nosuchterm", 0, 128) == []


def test_fuzzy_query_scores_like_synonym_group(idx):
    """`word~d` must score exactly like the `{members}` synonym group of
    its expansion (same SynonymQuery blend), boost included, digits > 2
    clamped to the Lucene limit."""
    from tangent_ray.query.scorer import QueryScorer

    sc = QueryScorer(idx)
    members = sc.reader.expand_fuzzy("quary", 2, sc.prefix_max_expansions)
    assert members  # the fixture corpus has query/quarry near 'quary'
    syn = "{" + ",".join(members) + "}"
    for fq, sq in (
        ("quary~2 planner", syn + " planner"),
        ("quary~ planner", syn + " planner"),  # bare ~ = 2 (Lucene)
        ("quary~9", syn),                       # clamped to 2
        ("quary~2^3", syn + "^3"),              # boost carries
    ):
        d1, s1 = sc.score_query(fq, "text", 10)
        d2, s2 = sc.score_query(sq, "text", 10)
        assert (d1 == d2).all() and (s1 == s2).all(), fq


def test_fuzzy_query_d1_tighter_than_d2(idx):
    from tangent_ray.query.scorer import QueryScorer

    sc = QueryScorer(idx)
    m1 = sc.reader.expand_fuzzy("quarys", 1, 128)
    m2 = sc.reader.expand_fuzzy("quarys", 2, 128)
    assert set(m1) <= set(m2) and len(m2) > len(m1)


def test_negated_fuzzy_excludes_expansion(idx):
    """-word~d drops every doc containing ANY term within the distance
    (the full-expansion rule negated wildcards follow)."""
    from tangent_ray.query.scorer import QueryScorer

    sc = QueryScorer(idx)
    d_all, _ = sc.score_query("planner", "text", 10)
    d_neg, _ = sc.score_query("planner -quary~2", "text", 10)
    dropped = set(d_all.tolist()) - set(d_neg.tolist())
    assert dropped  # docs with query/quarry are gone
    # survivors keep their original scores (NOT filters, not re-scoring)
    import numpy as np

    keep = np.isin(d_all, d_neg)
    s_all = sc.score_query("planner", "text", 10)[1][keep]
    s_neg = sc.score_query("planner -quary~2", "text", 10)[1]
    assert (s_all == s_neg).all()


def test_span_near_syntax_untouched_by_fuzzy(idx):
    """`"a b"~8` span-near strings must not parse as fuzzy terms — the ~
    follows a quote there."""
    from tangent_ray.query.scorer import QueryScorer

    sc = QueryScorer(idx)
    _, groups, _ = sc._split_extensions('"planner scans"~8')
    assert groups == []
