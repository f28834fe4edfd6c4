"""Snippet extraction + highlighting: unit windows, stemming-aware
matching, brute-force best-window differential, and the distributed
filtered-scan path over a parquet corpus."""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.query.snippets import (
    best_window,
    extract_snippet,
    query_terms,
    snippets_for_results,
)
from tangent_ray.tokenize.porter import porter_stem


def test_query_terms_stemming():
    assert query_terms("Merging runs!") == {porter_stem("merging"), porter_stem("runs")}
    assert query_terms("Merging runs!", stem=False) == {"merging", "runs"}
    assert query_terms("$[V!x]$") == frozenset()  # math spans stripped
    assert query_terms("<math><mi>x</mi></math>") == frozenset()
    assert query_terms("matrix $[V!a[-[N!2]]]$") == {porter_stem("matrix")}


def test_extract_none_without_hits():
    assert extract_snippet("nothing relevant here", frozenset({"zzz"})) is None
    assert extract_snippet("", frozenset({"a"})) is None


def test_extract_highlights_and_ellipses():
    text = "AAA bbb ccc. " + "pad " * 30 + "Target one, target two! " + "pad " * 30
    got = extract_snippet(text, query_terms("target"), width=6)
    assert got is not None
    snip, hl, n_hits, n_distinct = got
    assert n_hits == 2 and n_distinct == 1
    assert "<em>Target</em>" in hl and "<em>target</em>" in hl
    assert hl.startswith("…") and hl.endswith("…")
    assert re.sub("</?em>", "", hl) == snip
    # original casing/punctuation preserved
    assert "Target one, target two" in snip


def test_stemmed_surface_match():
    text = "The merger merged many merges while merging"
    got = extract_snippet(text, query_terms("merging"), width=10)
    assert got is not None
    _, hl, n_hits, _ = got
    # every surface form with the same stem highlights
    forms = re.findall(r"<em>([^<]+)</em>", hl)
    assert "merged" in [f.lower() for f in forms]
    assert n_hits == len(forms) >= 3


def _brute_best(toks, terms, width):
    best = (0, 0, None)  # (n_distinct, n_hits, start)
    for s in range(len(toks)):
        win = toks[s : s + width]
        hits = [t for t in win if t in terms]
        cand = (len(set(hits)), len(hits))
        if cand > best[:2]:
            best = (cand[0], cand[1], s)
    return best[:2]


def test_best_window_matches_brute_force():
    rng = np.random.default_rng(7)
    vocab = ["aa", "bb", "cc", "dd", "xx", "yy"]
    terms = frozenset({"aa", "bb", "cc"})
    for _ in range(50):
        toks = [vocab[i] for i in rng.integers(0, len(vocab), size=40)]
        hits = np.flatnonzero([t in terms for t in toks])
        if not len(hits):
            continue
        width = int(rng.integers(2, 12))
        lo, hi, n_hits, n_distinct = best_window(
            hits, [toks[i] for i in hits], width
        )
        assert (n_distinct, n_hits) == _brute_best(toks, terms, width)


def test_distributed_snippets(ray_session, tmp_path):
    from tangent_ray.sources.corpus import DocumentsCorpus

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "Sorting merges sorted runs into one stream.",
                    "No relevant words here at all.",
                    "merge Merge MERGE — three times plus a sort.",
                    "",
                ],
                pa.string(),
            ),
        }
    )
    src = str(tmp_path / "docs")
    os.makedirs(src)
    pq.write_table(docs, os.path.join(src, "d.parquet"))

    results = pa.table(
        {
            "query_id": pa.array(["q1", "q1", "q1", "q2", "q3"], pa.string()),
            "docid": pa.array([0, 2, 1, 2, 0], pa.int64()),
        }
    )
    queries = pa.table(
        {
            "query_id": pa.array(["q1", "q2", "q3"], pa.string()),
            # q3 is math-only: no text terms -> contributes no rows
            "text": pa.array(["merging sort", "merge", ""], pa.string()),
        }
    )
    out = snippets_for_results(
        results, queries, [os.path.join(src, "d.parquet")],
        corpus=DocumentsCorpus(), width=8,
    )
    rows = {(r["query_id"], r["docid"]): r for r in out.to_pylist()}
    # doc 1 has no query terms -> dropped; q3 empty -> dropped
    assert set(rows) == {("q1", 0), ("q1", 2), ("q2", 2)}
    assert rows[("q1", 0)]["n_distinct"] == 2  # merges + sorting/sorted stems
    assert rows[("q1", 2)]["n_hits"] >= 4      # three merges + sort
    assert rows[("q2", 2)]["n_distinct"] == 1
    assert "<em>" in rows[("q1", 0)]["highlighted"]
    # deterministic output order
    assert out["query_id"].to_pylist() == sorted(out["query_id"].to_pylist())


def test_empty_results(ray_session, tmp_path):
    from tangent_ray.sources.corpus import DocumentsCorpus

    out = snippets_for_results(
        pa.table({"query_id": pa.array([], pa.string()),
                  "docid": pa.array([], pa.int64())}),
        pa.table({"query_id": pa.array(["q"], pa.string()),
                  "text": pa.array(["x"], pa.string())}),
        ["/nonexistent.parquet"],
        corpus=DocumentsCorpus(),
    )
    assert out.num_rows == 0


def test_match_spec_extension_syntax():
    from tangent_ray.query.snippets import query_match_spec

    # filters / negations never highlight; groups + boosts do; prefixes
    # come back as patterns
    terms, patterns = query_match_spec(
        "alpha^2 {beta,gamma} quer* -delta -eps* #lang:en", stem=False
    )
    assert terms == {"alpha", "beta", "gamma"}
    assert patterns == ("quer*",)
    # stemming applies to terms, not to glob patterns
    terms_s, patterns_s = query_match_spec("merging runs* ", stem=True)
    assert porter_stem("merging") in terms_s
    assert patterns_s == ("runs*",)
    # general globs come through whole; a lone trailing ? is punctuation
    terms_g, patterns_g = query_match_spec("te*m t?st beta?", stem=False)
    assert patterns_g == ("t?st", "te*m")
    assert terms_g == {"beta"}


def test_extract_snippet_prefix_highlight():
    text = "plain words then QUERYING and queries appear here"
    got = extract_snippet(text, frozenset(), patterns=("quer*",), stem=False)
    assert got is not None
    snip, hl, n_hits, n_distinct = got
    assert "<em>querying</em>" in hl.lower() and "<em>queries</em>" in hl.lower()
    assert n_hits == 2


def test_stored_fields_path_matches_scan(ray_session, tmp_path):
    """The O(results) stored-fields path returns EXACTLY what the
    streaming-scan path returns, on a corpus big enough for multiple row
    groups; StoredFields.texts only returns requested ids."""
    import random

    import ray.data

    from tangent_ray.sources.corpus import DocumentsCorpus
    from tangent_ray.sources.stored import StoredFields, build_stored_fields

    rng = random.Random(5)
    vocab = ["merge", "sort", "stream", "run", "pad", "xyz"]
    n = 900
    ids = sorted(rng.sample(range(1, 1 << 40), n))  # sparse hash-ish ids
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(n)
    ]
    docs = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    src = str(tmp_path / "docs")
    os.makedirs(src)
    pq.write_table(docs, os.path.join(src, "d.parquet"))
    stored_dir = str(tmp_path / "stored")
    build_stored_fields(src, stored_dir, corpus=DocumentsCorpus(),
                        row_group_docs=64)
    sf = StoredFields(stored_dir)
    # direct lookup: exact texts, absent ids omitted
    some = ids[::97] + [123456789]
    got = sf.texts(some)
    assert set(got) == set(ids[::97])
    for d in ids[::97]:
        assert got[d] == texts[ids.index(d)]

    picks = rng.sample(ids, 40)
    results = pa.table(
        {
            "query_id": pa.array(["q1"] * 20 + ["q2"] * 20, pa.string()),
            "docid": pa.array(picks, pa.int64()),
        }
    )
    queries = pa.table(
        {
            "query_id": pa.array(["q1", "q2"], pa.string()),
            "text": pa.array(["merge sort", "stream run"], pa.string()),
        }
    )
    scan = snippets_for_results(
        results, queries, [os.path.join(src, "d.parquet")],
        corpus=DocumentsCorpus(), width=8,
    )
    fast = snippets_for_results(
        results, queries, [os.path.join(src, "d.parquet")],
        corpus=DocumentsCorpus(), width=8, stored=sf,
    )
    assert fast.equals(scan)
    # the dir-path form loads the handle itself
    fast2 = snippets_for_results(
        results, queries, [], corpus=DocumentsCorpus(), width=8,
        stored=stored_dir,
    )
    assert fast2.equals(scan)
