"""Rerank similarity-metric registry (reference ``rerank_results.py:256-334``).

Independent implementations of the pair/alignment metrics the reference
selects with its ``metric`` integer; scores are tuples compared
lexicographically (larger = more similar), matching the reference's
multi-score lists:

- ``v00`` — f-measure over matched symbol-pair multisets
  (``ranking_functions.py:251-287``): matches are per-(ancestor,
  descendant, relation) multiset minima; score
  ``2m/(|Q|+|C|)`` (``get_fmeasure``, ranking_functions.py:217).
- ``v01`` — greedy tree-alignment score (``ranking_functions.py:368-416``):
  every same-symbol (query node, candidate node) pair seeds an alignment
  grown child-by-child while the f-measure improves
  (``align_trees``, ranking_functions.py:286-332); grown alignments consume
  their matched node pairs, survivors are greedily accepted by unaligned
  roots, and the top accepted alignment's score is returned.
- ``v02`` — element-limited pair f-measure (``ranking_functions.py:419-480``):
  for each shared symbol the candidate keeps only its best
  ``min(q_count, c_count)`` instances' pairs (scored by pair matches
  against the query's pairs for that symbol), then v00 runs on the filtered
  pair set; a second unique-element f-measure breaks ties.
- ``v03`` — v02 plus greedy variable unification
  (``ranking_functions.py:542-619``): anonymized per-variable pair lists
  score every (query var, candidate var) unification, accepted 1-to-1
  greedily; scores under the rewritten (unified) pair lists come first.
- ``mss`` (v04) — Maximum Subtree Similarity with unification, in
  :mod:`tangent_ray.rerank.mss`.
- ``v05`` — MSS over multiple disjoint sub-matches with a shared
  unification map (:func:`tangent_ray.rerank.mss.mss_multi_score`).
- ``v06``-``v11`` — the wildcard-subtree matcher family
  (:mod:`tangent_ray.rerank.subtree`); v07/v09 disable unification ("E"
  constraints), each pairs the v06 matcher with a different scoring
  (m7/m8/m6/m9/m10/m4 — ``ranking_functions.py:2028-2066``).
- ``core`` — bypass: keep the engine's core score (reference metric -1).

Pairs are ``slt_tuples(..., window=0 (unbounded), eol="none")`` like the
reference rerank's ``get_pairs("", window)`` with its default unbounded
window and no EOL tuples.
"""

from __future__ import annotations

from collections import Counter

from tangent_ray.rerank.mss import EDGE_ORDER, MNode, node_list
from tangent_ray.tokenize.slt import parse_slt, slt_tuples

Pair = tuple[str, str, str, str]  # (ancestor, descendant, relation, location)


def get_fmeasure(matches: float, size_query: int, size_candidate: int) -> float:
    if int(matches) == 0 or int(size_query) == 0 or int(size_candidate) == 0:
        return 0.0
    recall = matches / float(size_query)
    precision = matches / float(size_candidate)
    return (2.0 * recall * precision) / (recall + precision)


def slt_pairs(slt: str, window: int = 0) -> list[Pair]:
    """Rerank pair list of an SLT string (unbounded window, no EOL)."""
    return slt_tuples(parse_slt(slt), window=window, eol="none")


def _match_count(pairs_a: list[Pair], pairs_b: list[Pair]) -> int:
    ca = Counter((f, t, r) for f, t, r, _ in pairs_a)
    cb = Counter((f, t, r) for f, t, r, _ in pairs_b)
    return sum(min(v, cb[k]) for k, v in ca.items() if k in cb)


def similarity_v00(pairs_query: list[Pair], pairs_candidate: list[Pair]) -> tuple:
    if not pairs_query or not pairs_candidate:
        return (0.0,)
    m = _match_count(pairs_query, pairs_candidate)
    return (get_fmeasure(m, len(pairs_query), len(pairs_candidate)),)


def _align_trees(
    n1: MNode, p1: str, n2: MNode, p2: str, qsize: int
) -> tuple[list[tuple[str, str]], int, float]:
    """Greedy same-path alignment growth (align_trees,
    ranking_functions.py:286-332): a child subtree joins only while the
    running f-measure improves."""
    matches: list[tuple[str, str]] = []
    if n1.te == n2.te:
        matches.append((p1, p2))
    root_f = get_fmeasure(len(matches), qsize, 1)
    total_unmatched = 1 - len(matches)
    total_elements = 1
    for lbl in EDGE_ORDER:
        c1 = n1.edges.get(lbl)
        c2 = n2.edges.get(lbl)
        if c1 is None or c2 is None:
            continue
        cm, cu, _cs = _align_trees(c1, p1 + lbl, c2, p2 + lbl, qsize)
        ct = len(cm) + cu
        cf = get_fmeasure(len(matches) + len(cm), qsize, total_elements + ct)
        if cf > root_f:
            matches += cm
            total_unmatched += cu
            total_elements += ct
            root_f = cf
    return matches, total_unmatched, root_f


def similarity_v01(query_slt: str, candidate_slt: str) -> tuple:
    q_root = MNode.from_slt(parse_slt(query_slt))
    c_root = MNode.from_slt(parse_slt(candidate_slt))
    nodes_q = node_list(q_root)
    nodes_c = node_list(c_root)
    qsize = len(nodes_q)
    all_aligns = [
        (qn, qp, cn, cp)
        for qn, qp in nodes_q
        for cn, cp in nodes_c
        if qn.te == cn.te
    ]
    present = {(qp, cp) for _, qp, _, cp in all_aligns}
    scored: list[tuple[float, tuple[str, str], list[tuple[str, str]]]] = []
    for qn, qp, cn, cp in all_aligns:
        if (qp, cp) not in present:
            continue
        matches, _unmatched, score = _align_trees(qn, qp, cn, cp, qsize)
        for m in matches:
            present.discard(m)
        scored.append((score, (qp, cp), matches))
    # stable sort: ties keep generation (DFS x DFS) order like the reference
    scored.sort(key=lambda x: -x[0])
    aligned_q: set[str] = set()
    aligned_c: set[str] = set()
    for score, (qp, cp), matches in scored:
        if qp not in aligned_q and cp not in aligned_c:
            # the reference returns the TOP accepted alignment's score
            # (similarity_score_from_alignments, ranking_functions.py:346)
            return (score,)
    return (0.0,)


def _count_unique(pairs: list[Pair]) -> dict[str, int]:
    """Unique instance (location) count per ancestor element."""
    locs: dict[str, set[str]] = {}
    for a, _, _, loc in pairs:
        locs.setdefault(a, set()).add(loc)
    return {a: len(s) for a, s in locs.items()}


def _per_element(pairs: list[Pair]) -> dict[str, list[Pair]]:
    out: dict[str, list[Pair]] = {}
    for p in pairs:
        out.setdefault(p[0], []).append(p)
    return out


def similarity_v02(pairs_query: list[Pair], pairs_candidate: list[Pair]) -> tuple:
    e_query = _count_unique(pairs_query)
    e_candidate = _count_unique(pairs_candidate)
    overlap = {
        a: min(e_query[a], e_candidate[a]) for a in e_query if a in e_candidate
    }

    pe_query = _per_element(pairs_query)
    pe_candidate = _per_element(pairs_candidate)

    final_pairs_candidate: list[Pair] = []
    total_elements_matched = 0
    for ancestor, count in overlap.items():
        total_elements_matched += count
        sub_candidate = pe_candidate[ancestor]
        if count < e_candidate[ancestor]:
            sub_query = pe_query[ancestor]
            per_instance: dict[str, list[Pair]] = {}
            for p in sub_candidate:
                per_instance.setdefault(p[3], []).append(p)
            scored = [
                (_match_count(sub_query, inst), loc)
                for loc, inst in per_instance.items()
            ]
            scored.sort(reverse=True)  # (score, location) tuple order
            for _s, loc in scored[:count]:
                final_pairs_candidate += per_instance[loc]
        else:
            final_pairs_candidate += sub_candidate

    pair_fmeasure = similarity_v00(pairs_query, final_pairs_candidate)[0]
    if total_elements_matched > 0:
        er = total_elements_matched / float(sum(e_query.values()))
        ep = total_elements_matched / float(sum(e_candidate.values()))
        elements_fmeasure = (2.0 * er * ep) / (er + ep)
    else:
        elements_fmeasure = 0.0
    return (pair_fmeasure, elements_fmeasure)


def _is_var_tag(tag: str) -> bool:
    return tag.startswith("V!") or tag.startswith("?")


def _unification_pairs(tag_pairs: list[Pair]) -> list[Pair]:
    """Anonymize one element's pair list for unification testing: the
    (common) ancestor becomes ``<U>``, self-references ``<U>``, other
    variables ``<V>`` (``generate_unification_pairs``,
    ``ranking_functions.py:496-510``)."""
    out: list[Pair] = []
    for anc, desc, rel, loc in tag_pairs:
        if desc == anc:
            u_desc = "<U>"
        elif _is_var_tag(desc):
            u_desc = "<V>"
        else:
            u_desc = desc
        out.append(("<U>", u_desc, rel, loc))
    return out


def _unify_vars(pairs: list[Pair], variables: dict[str, int | None]) -> list[Pair]:
    """Rewrite accepted-variable tags to shared ``U!<idx>`` placeholders and
    pool all constants as ``N!U`` (``unify_variables``,
    ``ranking_functions.py:513-539``)."""
    out: list[Pair] = []
    for anc, desc, rel, loc in pairs:
        if anc in variables:
            if variables[anc] is not None:
                anc = f"U!{variables[anc]}"
        elif anc.startswith("N!"):
            anc = "N!U"
        if desc in variables:
            if variables[desc] is not None:
                desc = f"U!{variables[desc]}"
        elif desc.startswith("N!"):
            desc = "N!U"
        out.append((anc, desc, rel, loc))
    return out


def similarity_v03(pairs_query: list[Pair], pairs_candidate: list[Pair]) -> tuple:
    """v02 plus greedy variable unification (``similarity_v03``,
    ``ranking_functions.py:542-619``): every (query var, candidate var)
    pair is scored by the f-measure of their anonymized pair lists, the
    best-scoring pairs are accepted 1-to-1 greedily, both pair lists are
    rewritten under the accepted map (constants pooled), and the score is
    ``(unified pair f, original pair f, unified element f)``."""
    v_query: dict[str, int | None] = {
        t: None for t in _count_unique(pairs_query) if _is_var_tag(t)
    }
    v_candidate: dict[str, int | None] = {
        t: None for t in _count_unique(pairs_candidate) if _is_var_tag(t)
    }
    pe_query = _per_element(pairs_query)
    pe_candidate = _per_element(pairs_candidate)
    uq = {t: _unification_pairs(pe_query[t]) for t in v_query}
    uc = {t: _unification_pairs(pe_candidate[t]) for t in v_candidate}

    weights = []
    for qv in v_query:
        for cv in v_candidate:
            m = _match_count(uq[qv], uc[cv])
            f = get_fmeasure(m, len(uq[qv]), len(uc[cv]))
            weights.append(((f, 1.0 if qv == cv else 0.0), qv, cv))
    n_accepted = 0
    for (f, _same), qv, cv in sorted(weights, reverse=True):
        if f > 0.0 and v_query[qv] is None and v_candidate[cv] is None:
            v_query[qv] = v_candidate[cv] = n_accepted
            n_accepted += 1

    u_scores = similarity_v02(
        _unify_vars(pairs_query, v_query), _unify_vars(pairs_candidate, v_candidate)
    )
    o_scores = similarity_v02(pairs_query, pairs_candidate)
    return (u_scores[0], o_scores[0], u_scores[1])


def _score_v00(query_slt: str, cand_slt: str) -> tuple:
    return similarity_v00(slt_pairs(query_slt), slt_pairs(cand_slt))


def _score_v01(query_slt: str, cand_slt: str) -> tuple:
    return similarity_v01(query_slt, cand_slt)


def _score_v02(query_slt: str, cand_slt: str) -> tuple:
    return similarity_v02(slt_pairs(query_slt), slt_pairs(cand_slt))


def _score_v03(query_slt: str, cand_slt: str) -> tuple:
    return similarity_v03(slt_pairs(query_slt), slt_pairs(cand_slt))


def _score_v05(query_slt: str, cand_slt: str) -> tuple:
    from tangent_ray.rerank.mss import mss_multi_score

    return mss_multi_score(query_slt, cand_slt)


def _score_v07(query_slt: str, cand_slt: str) -> tuple:
    from tangent_ray.rerank.subtree import (
        all_exact_constraints,
        subtree_metric_score,
    )

    # v07 overrides the constraint tree to "E" (unification disabled,
    # ranking_functions.py:2034-2040)
    return subtree_metric_score(
        query_slt, cand_slt, all_exact_constraints(query_slt), "m7"
    )


def _score_v08(query_slt: str, cand_slt: str) -> tuple:
    from tangent_ray.rerank.subtree import subtree_metric_score

    return subtree_metric_score(query_slt, cand_slt, None, "m8")


def _score_mss(query_slt: str, cand_slt: str) -> tuple:
    from tangent_ray.rerank.mss import mss_score

    return mss_score(query_slt, cand_slt)


def _score_v11(query_slt: str, cand_slt: str) -> tuple:
    from tangent_ray.rerank.subtree import mss_subtree_score

    return mss_subtree_score(query_slt, cand_slt)


def _score_v09(query_slt: str, cand_slt: str) -> tuple:
    from tangent_ray.rerank.subtree import subtree_metric_score

    return subtree_metric_score(query_slt, cand_slt, None, "m9")


def _score_v10(query_slt: str, cand_slt: str) -> tuple:
    from tangent_ray.rerank.subtree import subtree_metric_score

    return subtree_metric_score(query_slt, cand_slt, None, "m10")


def _score_v06(query_slt: str, cand_slt: str) -> tuple:
    from tangent_ray.rerank.subtree import subtree_metric_score

    return subtree_metric_score(query_slt, cand_slt, None, "m6")


#: metric name -> callable(query_slt, candidate_slt) -> score tuple
#: (compare lexicographically, larger = more similar)
METRICS = {
    "v00": _score_v00,
    "v01": _score_v01,
    "v02": _score_v02,
    "v03": _score_v03,
    "v04": _score_mss,
    "mss": _score_mss,
    "v05": _score_v05,
    "v07": _score_v07,
    "v08": _score_v08,
    # wildcard-subtree matcher family (rerank/subtree.py). Each replays its
    # published reranked_paper_m{N}_w0_e2.tsv golden file EXACTLY
    # (tests/test_golden_replay.py): m2 = v09's scoring with default (U)
    # constraints, m3 = v10, m4 = v11 (the paper's operational MSS); m1 is
    # v00 at window 1.
    "v06": _score_v06,
    "v09": _score_v09,
    "v10": _score_v10,
    "v11": _score_v11,
}
