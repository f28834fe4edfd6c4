"""Hand-computed vectors for the rerank metric registry (v00/v01/v02)."""

import pytest

from tangent_ray.rerank.metrics import (
    METRICS,
    similarity_v00,
    similarity_v01,
    similarity_v02,
    slt_pairs,
)

# x + 1 : nodes V!x -n-> + -n-> N!1
QA = "[V!x[+[N!1]]]"
# x + 2
QB = "[V!x[+[N!2]]]"
# y - 1
QC = "[V!y[-[N!1]]]"


def test_slt_pairs_unbounded_no_eol():
    pairs = slt_pairs(QA)
    rels = {(f, t, r) for f, t, r, _ in pairs}
    # unbounded window: includes the distance-2 pair; no EOL tuples
    assert rels == {
        ("V!x", "+", "n"),
        ("V!x", "N!1", "nn"),
        ("+", "N!1", "n"),
    }


def test_v00_identity_and_partial():
    pa_, pb = slt_pairs(QA), slt_pairs(QB)
    assert similarity_v00(pa_, pa_) == (1.0,)
    # QA vs QB share only (V!x,+,n): m=1, |Q|=|C|=3 -> 2*1/6
    assert similarity_v00(pa_, pb) == pytest.approx((2 * 1 / 6,))
    # disjoint trees score 0
    assert similarity_v00(pa_, slt_pairs("[V!z]") or [("V!z", "0!", "n", "")])[0] == 0.0


def test_v00_multiset_min_semantics():
    # duplicate pairs count min(q_tf, c_tf)
    p1 = [("a", "b", "n", "l1"), ("a", "b", "n", "l2")]
    p2 = [("a", "b", "n", "x1")]
    # m = min(2,1) = 1; sizes 2 and 1 -> f = 2*1/(2+1)
    assert similarity_v00(p1, p2) == pytest.approx((2 / 3,))


def test_v01_identity_and_substructure():
    assert similarity_v01(QA, QA) == (1.0,)
    # QA vs QC: only N!1 matches (tags V!x/V!y and +/- differ).
    # Best alignment root N!1<->N!1: matches=1, f = 2*(1/3)*(1/1)/(1/3+1)
    s = similarity_v01(QA, QC)[0]
    assert s == pytest.approx(2 * (1 / 3) * 1.0 / ((1 / 3) + 1.0))
    # QA vs QB: V!x<->V!x grows through +<->+ (2 matches); the mismatched
    # N!1/N!2 child is REJECTED and never enters total_elements, so
    # precision counts 2 joined elements: f(2, q=3, c=2) = 2*(2/3)*1/(5/3)
    assert similarity_v01(QA, QB)[0] == pytest.approx(0.8)


def test_v02_element_limiting():
    # candidate has TWO V!x instances; query has one -> only the best
    # instance's pairs survive into the v00 computation
    q = slt_pairs(QA)  # V!x + N!1
    c = slt_pairs("[V!x[+[V!x[+[N!2]]]]]")  # x + x + 2 (two V!x instances)
    pair_f, elem_f = similarity_v02(q, c)
    # overlap: V!x -> 1 (of 2 in cand), '+' -> 1 (of 2), N!x none shared
    # elements: matched=2, unique_q = 2 (V!x, +), unique_c = 4
    assert elem_f == pytest.approx(2 * (2 / 2) * (2 / 4) / ((2 / 2) + (2 / 4)))
    assert 0.0 < pair_f <= 1.0
    # identity still perfect
    assert similarity_v02(q, q) == (1.0, 1.0)


def test_registry_and_rerank_candidates_metric_param():
    from tangent_ray.rerank.mss import rerank_candidates

    cands = [(2, QB), (1, QA), (3, QC)]
    for name in ("v00", "v01", "v02", "mss", "v04"):
        assert name in METRICS or name in ("mss", "v04")
        ranked = rerank_candidates(QA, cands, metric=name)
        # exact copy must rank first under every metric
        assert ranked[0][0] == 1, name


def test_combine_math_weighted_best_per_expression():
    from tangent_ray.rerank.pipeline import combine_math, combine_math_text

    QX = "[V!x[+[N!1]]]"
    QY = "[V!y]"
    # doc 1 matches QX exactly and has junk; doc 2 matches QY only
    per_doc = {1: [QX, "[V!z]"], 2: ["[V!y]"]}
    got = combine_math([QX, QY], per_doc, how="v00")
    # doc1: best for QX = 1.0, best for QY = 0.0 -> 0.5 * 1.0
    assert got[1][0] == pytest.approx(0.5)
    # doc2: QX->0, QY: [V!y] pairs are EOL-free -> empty pair list -> 0.0
    assert got[2][0] == pytest.approx(0.0)
    # size-based weights: QX has 3 nodes, QY 1 -> weight 0.75/0.25
    got = combine_math([QX, QY], per_doc, how="v00", size_norm=True)
    assert got[1][0] == pytest.approx(0.75)
    # text fusion with dynamic weight: 2 exprs, 2 keywords -> mweight 0.5
    fused = combine_math_text(got, {1: 1.0, 3: 0.8}, 2, 2)
    assert fused[1][0] == pytest.approx(0.5 * 0.75 + 0.5 * 1.0)
    assert fused[3][0] == pytest.approx(0.5 * 0.8)


def test_combine_math_mss_vector_rides_along():
    from tangent_ray.rerank.pipeline import combine_math

    QX = "[V!x[+[N!1]]]"
    got = combine_math([QX], {7: [QX]}, how="mss")
    assert len(got[7]) == 3  # (h, unmatched, exact) vector preserved
    assert got[7][0] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# v03 (pairs + greedy unification), v05 (multi-submatch MSS), v07/v08
# (subtree matcher with edge-Dice scoring)


def test_v03_unifies_variables_and_pools_constants():
    from tangent_ray.rerank.metrics import similarity_v03

    # x+1 vs y+2: no pair matches literally, but x<->y unify and constants
    # pool to N!U, so the unified pair f-measure is perfect while the
    # original one is 0 (score order: unified-pair f, original f, element f)
    assert similarity_v03(slt_pairs(QA), slt_pairs("[V!y[+[N!2]]]")) == (
        1.0,
        0.0,
        1.0,
    )
    # identity: everything 1.0
    assert similarity_v03(slt_pairs(QA), slt_pairs(QA)) == (1.0, 1.0, 1.0)
    # fully disjoint: all zero
    assert similarity_v03(slt_pairs(QA), slt_pairs("[O!([N!9[)]]]")) == (
        0.0,
        0.0,
        0.0,
    )


def test_v03_one_to_one_greedy_unification():
    from tangent_ray.rerank.metrics import similarity_v03

    # query has ONE variable, candidate TWO: greedy unification must pick
    # V!b (anonymized pair f 1.0) over V!a (0.667). With x<->b the
    # element-limited unified candidate pairs equal the query's exactly,
    # while V!a stays an unmatched element (element f = 2*(2/2)*(2/3)/(5/3))
    q = slt_pairs("[V!x[+[N!1]]]")
    c = slt_pairs("[V!a[+[V!b[+[N!1]]]]]")
    u_f, o_f, e_f = similarity_v03(q, c)
    assert u_f == pytest.approx(1.0)
    assert o_f == pytest.approx(0.5)
    assert e_f == pytest.approx(2 * 1.0 * 0.5 / 1.5)
    assert u_f > o_f  # unification can only help


def test_v05_pools_disjoint_submatches():
    from tangent_ray.rerank.mss import mss_multi_score, mss_score

    # untyped operators can't unify, and the interleaved % chain prevents a
    # single grown alignment from covering =, <, > together; v05 pools the
    # three 1-node sub-matches where v04 keeps only the best one
    q = "[=[<[>]]]"
    c = "[=[%[<[%[>]]]]]"
    assert mss_score(q, c) == pytest.approx((2 * (1 / 3) * (1 / 4) / (1 / 3 + 1 / 4), -4, 1))
    hs, unmatched, exact = mss_multi_score(q, c)
    assert exact == 3 and unmatched == -2
    # pooled: sym 3/3, per-submatch edges 0 -> 0.5/(qsize-1) floor
    assert hs == pytest.approx(2 * (1.0 * 0.25) / (1.0 + 0.25))
    # identity: one alignment takes everything
    assert mss_multi_score(q, q) == (1.0, 0, 3)


def test_v05_unification_consistency_across_submatches():
    from tangent_ray.rerank.mss import mss_multi_score

    # first submatch unifies V!x<->V!p; a later submatch wanting V!x<->V!q
    # is rejected for the conflicting entry (consistent-map rule)
    q = "[V!x[=[V!x]]]"
    c = "[V!p[=[V!q]]]"
    hs, unmatched, exact = mss_multi_score(q, c)
    # one alignment: = exact, one V!x unifies, the other V!x cannot map to a
    # second distinct candidate var 1-to-1 within that alignment
    assert exact == 1
    assert unmatched == -1  # 3 candidate nodes - 2 unified


def test_v07_v08_registry_ordering():
    # v07 disables unification: x+1 vs y+1 only matches [+, N!1]; v08
    # unifies x<->y as well, so it must score at least as high
    qa, qb = QA, "[V!y[+[N!1]]]"
    v07 = METRICS["v07"]
    v08 = METRICS["v08"]
    assert v07(qa, qa) > v07(qa, qb) > v07(qa, "[O!(]")
    assert v08(qa, qb)[0] >= v07(qa, qb)[0]
    for name in ("v03", "v05", "v07", "v08"):
        assert name in METRICS
