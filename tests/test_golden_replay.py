"""Replay the reference's published golden outputs (no Ray needed).

Three independent parity proofs against reference-produced artifacts:

1. Smoke corpus totals: tokenizing the reference's own 41-doc test corpus
   (testing/testlist.txt) with OUR MathML->SLT pipeline reproduces the
   EXACT totals its indexer logged (log1.txt:171-179): 644 unique
   expressions, 846 instances.
2. SLT grammar: every expression string in the golden core-output TSVs
   parses and round-trips through our parser (they were serialized by the
   reference's own engine).
3. Score replay: the core engine score F = 2*cc/(exprtc+querytc)
   (mathindex.cpp:240) is a pure function of the (query, result expression)
   pair; replaying it over the golden R rows must reproduce the published
   scores. Concrete (non-wildcard) queries replay EXACTLY; wildcard queries
   replay >= 95% (the remainder depends on iterator-construction claim
   ordering against corpus-global postings sizes — unknowable without the
   Wikipedia corpus, and acknowledged approximate in the reference itself:
   "TODO: mechanism not right ... when count > 1", mathindexmid.h:160).
"""

import glob
import os

import pytest

from tangent_ray.eval.golden import GOLDEN_DIR, parse_golden, replay_file

REF_TESTING = "/root/reference/tangent_code/tangent/testing"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference golden outputs not present"
)


def test_smoke_corpus_totals_exact():
    from tangent_ray.tokenize.mathml import (
        MATHML_SPAN_RE,
        MathMLError,
        mathml_to_slt,
    )

    files = [
        line.strip()
        for line in open(os.path.join(REF_TESTING, "testlist.txt"))
        if line.strip()
    ]
    uniq_total = inst_total = bad = 0
    n_tex = 0
    for f in files:
        p = os.path.join(REF_TESTING, "..", f)
        if p.endswith(".tex"):
            n_tex += 1  # needs latexmlmath; failed in the reference run too
            continue
        src = open(p, encoding="utf-8", errors="replace").read()
        slts = []
        for span in MATHML_SPAN_RE.findall(src):
            try:
                slts.append(mathml_to_slt(span).serialize())
            except MathMLError:
                bad += 1
        inst_total += len(slts)
        uniq_total += len(set(slts))
    assert n_tex == 4  # the reference's 4 "problem files" (log1.txt:177)
    assert bad == 0
    # log1.txt:173-174
    assert uniq_total == 644
    assert inst_total == 846


def test_golden_slt_strings_roundtrip():
    from tangent_ray.tokenize.slt import parse_slt

    path = os.path.join(GOLDEN_DIR, "core_w4_e1.tsv")
    n = 0
    for q in parse_golden(path):
        parse_slt(q.expr)  # round-trip verified inside parse_slt
        for expr, _score in q.results:
            parse_slt(expr)
            n += 1
    assert n > 1000


@pytest.mark.parametrize(
    "fname,wc_floor",
    [
        ("core_w0_e0.tsv", 0.95),
        # EOL=all emits a wildcard-EOL tuple per ?-leaf, multiplying the
        # duplicate-pattern instances the construction-order artifact hits
        ("core_w2_e1.tsv", 0.90),
        ("core_w4_e2.tsv", 0.95),
    ],
)
def test_golden_scores_replay(fname, wc_floor):
    s = replay_file(os.path.join(GOLDEN_DIR, fname))
    assert s["queries"] == 40
    # every concrete-query score is reproduced exactly
    assert s["concrete_ok"] == s["concrete_rows"] > 0
    # wildcard scores: near-exact (see module docstring for the residual)
    assert s["wildcard_ok"] >= wc_floor * s["wildcard_rows"]
    # the residual is quantified, not just counted: drift touches a handful
    # of queries (measured max 10/40 at w2_e1 across all 15 conditions) and
    # its magnitude is bounded (construction-order artifact shifts cc by at
    # most a few duplicate-tuple claims; measured max |delta| 0.121)
    assert s["wildcard_drift_queries"] <= 10
    assert s["wildcard_max_delta"] <= 0.13


def test_golden_scores_replay_all_files_concrete_exact():
    """Concrete replay is exact across ALL 15 (window, EOL) conditions."""
    total = ok = 0
    for f in sorted(glob.glob(os.path.join(GOLDEN_DIR, "core_w*_e*.tsv"))):
        s = replay_file(f, max_queries=8)
        total += s["concrete_rows"]
        ok += s["concrete_ok"]
    assert total > 0 and ok == total


RERANKED_DIR = (
    "/root/reference/results/Wikipedia/Task_FormulaBrowing/reranked_output"
)


def _metric_of(name):
    from tangent_ray.rerank.metrics import similarity_v00, slt_pairs
    from tangent_ray.rerank.subtree import subtree_metric_score

    return {
        # identified empirically against the published files (each is an
        # EXACT 3,940/3,940 replay): m1 = v00 at window 1; m2/m3/m4 =
        # scoring m9/m10/m4 over the v06 wildcard-subtree matcher with
        # default (U) constraints
        "m1": lambda q, c: similarity_v00(slt_pairs(q, 1), slt_pairs(c, 1))[0],
        "m2": lambda q, c: subtree_metric_score(q, c, None, "m9")[0],
        "m3": lambda q, c: subtree_metric_score(q, c, None, "m10")[0],
        "m4": lambda q, c: subtree_metric_score(q, c, None, "m4")[0],
    }[name]


@pytest.mark.parametrize("mfile", ["m1", "m2", "m3", "m4"])
def test_reranked_golden_replays_exactly(mfile):
    """Every score in every published reranked_paper_m{N} golden file must
    replay EXACTLY — all queries, wildcards included (15,760 rows total
    across the four files)."""
    path = os.path.join(RERANKED_DIR, f"reranked_paper_{mfile}_w0_e2.tsv")
    if not os.path.exists(path):
        pytest.skip("reranked golden output not present")
    fn = _metric_of(mfile)
    tot = ok = 0
    # 6 concrete + 6 wildcard queries per file keeps the suite fast; the
    # full 3,940-row replay of every file was verified and the m4 file
    # replays fully in the golden_replay driver-gate entry
    queries = parse_golden(path)
    sample = queries[:6] + [q for q in queries if "?" in q.expr][:6]
    for q in sample:
        for expr, want in q.results:
            got = fn(q.expr, expr)
            tot += 1
            ok += abs(got - want) <= max(1e-6, abs(want)) * 1e-4
    assert tot >= 1100
    assert ok == tot


def test_reranked_m4_concrete_near_exact_under_v04():
    """The v04 MSS (no subtree wildcards) agrees with the published file on
    >= 98% of concrete-query rows — the residual is v06's ungated branch
    growth on matrix-heavy candidates."""
    from tangent_ray.rerank.mss import mss_score

    path = os.path.join(RERANKED_DIR, "reranked_paper_m4_w0_e2.tsv")
    if not os.path.exists(path):
        pytest.skip("reranked golden output not present")
    tot = ok = 0
    for q in parse_golden(path):
        if "?" in q.expr:
            continue
        for expr, want in q.results:
            got = mss_score(q.expr, expr)[0]
            tot += 1
            ok += abs(got - want) <= max(1e-6, abs(want)) * 1e-4
    assert tot == 1940
    assert ok >= 0.98 * tot
