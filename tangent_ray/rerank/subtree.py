"""Wildcard-subtree MSS matching — the paper's operational rerank metric.

An independent implementation of the reference's ``matching_v06`` +
``scoring_m4`` combination (= ``similarity_v11``,
``ranking_functions.py:1362-1935, 2062-2099, 2240-2250``), which is what
produced the published ``reranked_paper_m4_w0_e2.tsv``: the v04 MSS score
vector computed over the v06 matcher, where a query wildcard absorbs a
whole candidate SUBTREE (with horizontal n-chain expansion and root left
expansion) instead of a single node, and child branches merge
unconditionally (no greedy f-measure gating).

Differences in kind vs :mod:`tangent_ray.rerank.mss` (v04):

- ``?x`` captures the candidate node plus every child slot the query
  wildcard does not itself constrain; a leaf-ish wildcard (no vertical
  edges) expands along the candidate's n-chain until the query's next
  symbol is found (exact first, then unifiable);
- repeated wildcard names must bind the SAME subtree (string identity;
  largest instance wins — ``greedy_subtree_unification``);
- the node/edge recall of the primary score is computed over QUERY paths
  (``score_structure_unified_dice_coefficient``), and edge counting is
  occurrence-based, not set-based.

Validated against the reference's published reranked golden output in
``tests/test_golden_replay.py`` (reranked_paper_m4 replay).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from tangent_ray.rerank.mss import (
    ConstraintTree,
    MNode,
    _greedy_unify,
    _is_var,
    matrix_size,
    node_list,
)
from tangent_ray.tokenize.slt import parse_slt

_VERT = ("a", "b", "o", "u", "c", "d")


def _copy_tree(n: MNode | None) -> MNode | None:
    if n is None:
        return None
    out = MNode(n.te)
    for k, v in n.edges.items():
        out.edges[k] = _copy_tree(v)
    return out


def _serialize(n: MNode) -> str:
    parts = [n.te]
    for k in ("n", "a", "b", "o", "u", "c", "d", "w", "e"):
        c = n.edges.get(k)
        if c is not None:
            parts.append(k + "(" + _serialize(c) + ")")
    return "[" + ",".join(parts) + "]"


def _tree_nodes(root: MNode, path: str) -> list[tuple[MNode, str]]:
    return node_list(root, path)


def _is_wildcard_matrix(n: MNode) -> bool:
    if not n.te.startswith("M!"):
        return False
    r, c = matrix_size(n.te)
    w = n.edges.get("w")
    return (
        r == 1 and c == 1 and w is not None
        and w.te.startswith("?") and "n" not in w.edges
    )


@dataclass
class _WildAlign:
    q_te: str
    q_path: str
    c_tree: MNode
    c_path: str

    @property
    def c_size(self) -> int:
        return len(_tree_nodes(self.c_tree, ""))


@dataclass
class _SubState:
    matched: list[tuple[str, str, str, str]] = field(default_factory=list)
    u_qvars: list[_WildAlign] = field(default_factory=list)
    u_vars: list[tuple[str, str, str, str]] = field(default_factory=list)
    u_const: list[tuple[str, str, str, str]] = field(default_factory=list)
    unmatched: int = 0

    def merge(self, o: "_SubState") -> None:
        self.matched += o.matched
        self.u_qvars += o.u_qvars
        self.u_vars += o.u_vars
        self.u_const += o.u_const
        self.unmatched += o.unmatched


def _align_subtree(
    q: MNode, qp: str, c: MNode, cp: str,
    con: ConstraintTree, restricted: set[str],
) -> _SubState:
    st = _SubState()
    entry = (q.te, c.te, qp, cp)
    spec = con.at(qp)
    children: list[tuple[MNode, MNode, str, str]] = []

    if q.te.startswith("?"):
        # wildcard absorbs a subtree; slots the query also has are matched
        # as normal children instead (align_trees_subtree_unification,
        # ranking_functions.py:1381-1502)
        sub = MNode(c.te)
        cn = c.edges.get("n")
        if cn is not None:
            hor_expandable = all(q.edges.get(k) is None for k in _VERT)
            qn = q.edges.get("n")
            if qn is not None:
                if hor_expandable:
                    sub.edges["n"] = _copy_tree(cn)
                    # search the absorbed n-chain for the query's next
                    # symbol: exact tag first, then first unifiable
                    found = False
                    tempo, rel = sub, "n"
                    while tempo.edges.get("n") is not None:
                        nxt = tempo.edges["n"]
                        if nxt.te == qn.te:
                            children.append((qn, nxt, qp + "n", cp + rel))
                            del tempo.edges["n"]
                            found = True
                            break
                        tempo, rel = nxt, rel + "n"
                    if not found:
                        nspec = con.at(qp + "n")
                        tempo, rel = sub, "n"
                        while tempo.edges.get("n") is not None:
                            nxt = tempo.edges["n"]
                            if nspec.check(qn.te, nxt.te):
                                children.append((qn, nxt, qp + "n", cp + rel))
                                del tempo.edges["n"]
                                break
                            tempo, rel = nxt, rel + "n"
                else:
                    children.append((qn, cn, qp + "n", cp + "n"))
            elif hor_expandable:
                sub.edges["n"] = _copy_tree(cn)
        for lbl in _VERT:
            cc = c.edges.get(lbl)
            if cc is None:
                continue
            qc = q.edges.get(lbl)
            if qc is not None:
                children.append((qc, cc, qp + lbl, cp + lbl))
            else:
                sub.edges[lbl] = _copy_tree(cc)
        if c.edges.get("w") is not None:
            sub.edges["w"] = _copy_tree(c.edges["w"])
        st.u_qvars.append(_WildAlign(q.te, qp, sub, cp))
    elif _is_var(q.te) and _is_var(c.te):
        if q.te in restricted or c.te in restricted:
            if q.te == c.te:
                st.matched.append(entry)
            else:
                st.unmatched += 1
        else:
            st.u_vars.append(entry)
    elif _is_wildcard_matrix(q) and c.te.startswith("M!"):
        st.matched.append(entry)
    elif q.te == c.te:
        st.matched.append(entry)
    elif spec.check(q.te, c.te):
        st.u_const.append(entry)
    else:
        st.unmatched += 1

    if not q.te.startswith("?"):
        for lbl in ("n",) + _VERT:
            qc, cc = q.edges.get(lbl), c.edges.get(lbl)
            if qc is not None and cc is not None:
                children.append((qc, cc, qp + lbl, cp + lbl))

    if q.te.startswith("M!") and c.te.startswith("M!"):
        if _is_wildcard_matrix(q):
            w = c.edges.get("w")
            if w is not None:
                st.u_qvars.append(
                    _WildAlign(q.edges["w"].te, qp + "w", _copy_tree(w), cp + "w")
                )
        else:
            qr, qc_ = matrix_size(q.te)
            cr, cc_ = matrix_size(c.te)
            q_cells = q.element_children()
            c_cells = c.element_children()
            if (qr == 1 or qc_ == 1) and (cr == 1 or cc_ == 1):
                p = "w"
                for i in range(min(len(q_cells), len(c_cells))):
                    children.append((q_cells[i], c_cells[i], qp + p, cp + p))
                    p += "e"
            else:
                for row in range(min(qr, cr)):
                    for col in range(min(qc_, cc_)):
                        iq, ic = row * qc_ + col, row * cc_ + col
                        if iq < len(q_cells) and ic < len(c_cells):
                            children.append(
                                (q_cells[iq], c_cells[ic],
                                 qp + "w" + "e" * iq, cp + "w" + "e" * ic)
                            )
    elif not q.te.startswith("?"):
        qc, cc = q.edges.get("w"), c.edges.get("w")
        if qc is not None and cc is not None:
            children.append((qc, cc, qp + "w", cp + "w"))

    # v06: ALL child branches merge — no greedy f-measure gating
    for qc, cc, qpp, cpp in children:
        st.merge(_align_subtree(qc, qpp, cc, cpp, con, restricted))
    return st


def _edges_from_locations(locs: list[str]) -> int:
    """Occurrence-based parent-edge count (matched_edges_from_locations)."""
    by_len: dict[int, list[str]] = {}
    for loc in locs:
        by_len.setdefault(len(loc), []).append(loc)
    if not by_len:
        return 0
    edges = 0
    for length in range(max(by_len), min(by_len), -1):
        parents = by_len.get(length - 1)
        if parents is None or length not in by_len:
            continue
        for loc in by_len[length]:
            if loc[:-1] in parents:
                edges += 1
    return edges


def _greedy_subtree_unification(
    u_qvars: list[_WildAlign],
) -> tuple[list[_WildAlign], int]:
    """Same wildcard name must bind the same subtree (largest wins)."""
    by_name: dict[str, list[_WildAlign]] = {}
    for w in u_qvars:
        by_name.setdefault(w.q_te, []).append(w)
    valid: list[_WildAlign] = []
    invalid = 0
    for name, insts in by_name.items():
        if len(insts) >= 2:
            longest = max(range(len(insts)), key=lambda i: insts[i].c_size)
            want = _serialize(insts[longest].c_tree)
            for w in insts:
                if _serialize(w.c_tree) == want:
                    valid.append(w)
                else:
                    invalid += 1
        else:
            valid.append(insts[0])
    return valid, invalid


def _node_at(root: MNode, path: str) -> MNode | None:
    cur: MNode | None = root
    for ch in path:
        if cur is None:
            return None
        cur = cur.edges.get(ch)
    return cur


def _left_expand(c_root: MNode, w: _WildAlign) -> None:
    """Extend a root-wildcard subtree upward through candidate n-parents
    (root_wildcard_left_expansion, ranking_functions.py:1699-1734)."""
    while len(w.c_path) >= 1 and w.c_path[-1] == "n":
        parent = _node_at(c_root, w.c_path[:-1])
        if parent is None:
            return
        sub = MNode(parent.te)
        sub.edges["n"] = w.c_tree
        for lbl in _VERT + ("w",):
            pc = parent.edges.get(lbl)
            if pc is not None:
                sub.edges[lbl] = _copy_tree(pc)
        w.c_path = w.c_path[:-1]
        w.c_tree = sub


@dataclass
class _MatchState:
    """One seed's full matching outcome (mirrors test_alignment_subtree_
    unification's return): entry tuples are (q_te, c_te, q_path, c_path)."""

    matched: list[tuple[str, str, str, str]]
    unified: list[tuple[str, str, str, str]]
    valid_w: list[_WildAlign]  # accepted wildcard instances (roots)
    subtree_children: list[tuple[str, str]]  # (q_path, c_path) per node
    qsize: int
    csize: int
    q_root: MNode
    c_root: MNode


def _iter_seed_matches(query, candidate, constraints):
    """Run the v06 matcher from every seed alignment (with pending-pair
    consumption), yielding a _MatchState per surviving seed."""
    q_root = (
        MNode.from_slt(parse_slt(query)) if isinstance(query, str) else query
    )
    c_root = (
        MNode.from_slt(parse_slt(candidate))
        if isinstance(candidate, str)
        else candidate
    )
    if isinstance(constraints, str):
        constraints = ConstraintTree.from_slt(constraints)
    con = constraints or ConstraintTree()

    q_nodes = node_list(q_root)
    c_nodes = node_list(c_root)
    qsize, csize = len(q_nodes), len(c_nodes)
    restricted = {
        n.te
        for n, p in q_nodes
        if n.te.startswith("V!") and not con.at(p).unifiable
    }

    seeds: list[tuple[MNode, str, MNode, str]] = []
    pending: set[tuple[str, str]] = set()
    for qn, qp in q_nodes:
        spec = con.at(qp)
        for cn, cp in c_nodes:
            if qn.te == cn.te or spec.check(qn.te, cn.te):
                seeds.append((qn, qp, cn, cp))
                pending.add((qp, cp))

    for qn, qp, cn, cp in seeds:
        if (qp, cp) not in pending:
            continue
        st = _align_subtree(qn, qp, cn, cp, con, restricted)

        by_name: dict[str, int] = {}
        for w in st.u_qvars:
            by_name[w.q_te] = by_name.get(w.q_te, 0) + 1
        if qn.te.startswith("?") and by_name.get(qn.te) == 1:
            hor_expandable = all(qn.edges.get(k) is None for k in _VERT)
            if cp and cp[-1] == "n" and hor_expandable:
                for w in st.u_qvars:
                    if w.c_path == cp:
                        _left_expand(c_root, w)
                        break

        matched = list(st.matched)
        unified: list[tuple[str, str, str, str]] = []
        v_u = _greedy_unify(st.u_vars)
        for e in st.u_vars:
            if v_u[e[0]] == e[1]:
                (matched if e[0] == e[1] else unified).append(e)
        unified.extend(st.u_const)

        valid_w, _invalid = (
            _greedy_subtree_unification(st.u_qvars)
            if st.u_qvars
            else ([], 0)
        )
        subtree_children: list[tuple[str, str]] = []
        for w in valid_w:
            for _n, p in _tree_nodes(w.c_tree, w.c_path):
                subtree_children.append((w.q_path, p))

        # consume pending pairs (matched + unified + subtree roots + seed)
        for e in matched:
            pending.discard((e[2], e[3]))
        for e in unified:
            pending.discard((e[2], e[3]))
        for w in valid_w:
            pending.discard((w.q_path, w.c_path))
        pending.discard((qp, cp))

        yield _MatchState(
            matched, unified, valid_w, subtree_children,
            qsize, csize, q_root, c_root,
        )


def _dice(a: float, b: float) -> float:
    return (2.0 * a * b) / (a + b) if a + b > 0 else 0.0


def _edge_recall(edges: int, qsize: int) -> float:
    if qsize > 1:
        return (edges if edges > 0 else 0.5) / float(qsize - 1)
    return 1.0


def score_m4(s: _MatchState) -> tuple:
    """v04 score vector over the subtree matcher (similarity_v11)."""
    q_locs = (
        [e[2] for e in s.matched + s.unified] + [w.q_path for w in s.valid_w]
    )
    sym_rec = len(q_locs) / float(s.qsize)
    h = _dice(sym_rec, _edge_recall(_edges_from_locations(q_locs), s.qsize))
    c_cov = len(s.matched) + len(s.unified) + len(s.subtree_children)
    return (h, -(s.csize - c_cov), len(s.matched))


def _leftmost_scores(s: _MatchState, max_depth: int) -> list[int]:
    """leftmost_match_scores (ranking_functions.py:2125-2137): prefer
    matches earlier on shallower baselines; c_type 0 exact / 1 wildcard /
    2 unified."""
    best: list[int] | None = None
    groups = [
        (0, [e[3] for e in s.matched]),
        (1, [cpath for _qp, cpath in s.subtree_children]),
        (2, [e[3] for e in s.unified]),
    ]
    for c_type, locs in groups:
        for loc in locs:
            ms = [0] * max_depth
            depth = baseline = 0
            for ch in loc:
                if depth >= max_depth:
                    break
                if ch == "n":
                    baseline += 1
                else:
                    ms[depth] = -(baseline * 4 + 3)
                    baseline = 0
                    depth += 1
            if depth < max_depth:
                ms[depth] = -(baseline * 4 + c_type)
            if best is None or best < ms:
                best = ms
    return best if best is not None else [0] * max_depth


def _wildcard_stdev(s: _MatchState) -> float:
    import statistics

    counts: dict[str, int] = {}
    for qp, _cp in s.subtree_children:
        counts[qp] = counts.get(qp, 0) + 1
    if len(counts) < 2:
        return 0.0
    return statistics.stdev(counts.values())


def score_m6(s: _MatchState) -> tuple:
    """v06: dice(exact+wildcard recall, unified structure dice) + ties."""
    q_ew = len(s.matched) + len(s.valid_w)
    ew_recall = q_ew / float(s.qsize)
    q_locs = (
        [e[2] for e in s.matched + s.unified] + [w.q_path for w in s.valid_w]
    )
    u_dice = _dice(
        len(q_locs) / float(s.qsize),
        _edge_recall(_edges_from_locations(q_locs), s.qsize),
    )
    score1 = _dice(u_dice, ew_recall)
    c_cov = len(s.matched) + len(s.unified) + len(s.subtree_children)
    return tuple(
        [score1, -(s.csize - c_cov), -len(s.subtree_children)]
        + _leftmost_scores(s, 3)
        + [-_wildcard_stdev(s)]
    )


def _count_triplets(root: MNode, window: int, n_anc: int = 0) -> int:
    total = n_anc if window == 0 else min(n_anc, window)
    for lbl in ("n", "a", "b", "c", "d", "o", "u", "w", "e"):
        c = root.edges.get(lbl)
        if c is not None:
            total += _count_triplets(c, window, n_anc + 1)
    return total


def _triplets_from_locations(locs: list[str], window: int) -> int:
    by_len: dict[int, list[str]] = {}
    for loc in locs:
        by_len.setdefault(len(loc), []).append(loc)
    if not by_len:
        return 0
    total = 0
    lo, hi = min(by_len), max(by_len)
    for length in range(hi, lo, -1):
        if length not in by_len:
            continue
        start = lo if window == 0 else max(length - window, lo)
        for anc_len in range(start, length):
            if anc_len not in by_len:
                continue
            parents = by_len[anc_len]
            for loc in by_len[length]:
                if loc[:anc_len] in parents:
                    total += 1
    return total


def _triplet_score(s: _MatchState, window: int, with_unif: bool) -> float:
    """score_DC_triplets_w_wild_{no,w}_unif (ranking_functions.py:2190-2238)."""
    q_triplets = _count_triplets(s.q_root, window)
    c_triplets = _count_triplets(s.c_root, window)
    q_ew_locs = [e[2] for e in s.matched] + [w.q_path for w in s.valid_w]
    q_ew = _triplets_from_locations(q_ew_locs, window)
    c_ew_locs = [e[3] for e in s.matched] + [cp for _qp, cp in s.subtree_children]
    c_ew = _triplets_from_locations(c_ew_locs, window)
    if not with_unif:
        rec = (q_ew + 1.0) / float(q_triplets + 1.0)
        prec = (c_ew + 1.0) / float(c_triplets + 1.0)
        return _dice(rec, prec)
    q_u_locs = q_ew_locs[: len(s.matched)] + [e[2] for e in s.unified] + [
        w.q_path for w in s.valid_w
    ]
    q_u = _triplets_from_locations(q_u_locs, window)
    c_u_locs = (
        [e[3] for e in s.matched]
        + [e[3] for e in s.unified]
        + [cp for _qp, cp in s.subtree_children]
    )
    c_u = _triplets_from_locations(c_u_locs, window)
    rec = (q_ew + q_u + 2.0) / float(2 * (q_triplets + 1))
    prec = (c_ew + c_u + 2.0) / float(2 * (c_triplets + 1))
    return _dice(rec, prec)


def score_m7(s: _MatchState) -> tuple:
    """score_DC_edges_w_wild_no_unif (ranking_functions.py:2147-2162).
    NOTE: the reference's candidate-side edge count reads q_location for
    the c side too — reproduced verbatim."""
    q_ew_locs = [e[2] for e in s.matched] + [w.q_path for w in s.valid_w]
    q_ew_edges = _edges_from_locations(q_ew_locs)
    c_ew_locs = [e[2] for e in s.matched] + [qp for qp, _cp in s.subtree_children]
    c_ew_edges = _edges_from_locations(c_ew_locs)
    rec = (q_ew_edges + 1.0) / float(s.qsize)
    prec = (c_ew_edges + 1.0) / float(s.csize)
    return (_dice(rec, prec), q_ew_edges, c_ew_edges, s.qsize, s.csize)


def score_m8(s: _MatchState) -> tuple:
    """score_DC_Edges_w_wild_w_unif (ranking_functions.py:2164-2188)."""
    q_ew_locs = [e[2] for e in s.matched] + [w.q_path for w in s.valid_w]
    q_ew = _edges_from_locations(q_ew_locs)
    q_u_locs = (
        [e[2] for e in s.matched]
        + [e[2] for e in s.unified]
        + [w.q_path for w in s.valid_w]
    )
    q_u = _edges_from_locations(q_u_locs)
    c_ew_locs = [e[2] for e in s.matched] + [qp for qp, _cp in s.subtree_children]
    c_ew = _edges_from_locations(c_ew_locs)
    c_u_locs = (
        [e[2] for e in s.matched]
        + [e[2] for e in s.unified]
        + [qp for qp, _cp in s.subtree_children]
    )
    c_u = _edges_from_locations(c_u_locs)
    rec = (q_ew + q_u + 2.0) / float(2 * s.qsize)
    prec = (c_ew + c_u + 2.0) / float(2 * s.csize)
    return (_dice(rec, prec), rec, prec, q_ew, q_u, c_ew, c_u)


def score_m9(s: _MatchState) -> tuple:
    score1 = _triplet_score(s, window=0, with_unif=False)
    return tuple(
        [score1, -len(s.subtree_children), -_wildcard_stdev(s)]
        + _leftmost_scores(s, 2)
    )


def score_m10(s: _MatchState) -> tuple:
    score1 = _triplet_score(s, window=0, with_unif=True)
    return tuple(
        [score1, -len(s.subtree_children), -_wildcard_stdev(s)]
        + _leftmost_scores(s, 2)
    )


SCORING = {"m4": score_m4, "m6": score_m6, "m7": score_m7, "m8": score_m8,
           "m9": score_m9, "m10": score_m10}


def all_exact_constraints(query: str | MNode) -> ConstraintTree:
    """The 'E' default-constraint tree (unification disabled — used by the
    reference's v07/v09 variants, ranking_functions.py:2034-2054)."""
    from tangent_ray.rerank.mss import ConstraintSpec

    root = MNode.from_slt(parse_slt(query)) if isinstance(query, str) else query
    return ConstraintTree(
        {p: ConstraintSpec(unifiable=False) for _n, p in node_list(root)}
    )


def subtree_metric_score(
    query: str | MNode,
    candidate: str | MNode,
    constraints: ConstraintTree | str | None = None,
    scoring: str = "m4",
) -> tuple:
    """choose_best_match over the v06 matcher with the selected scoring."""
    fn = SCORING[scoring]
    best: tuple | None = None
    for s in _iter_seed_matches(query, candidate, constraints):
        score = fn(s)
        if best is None or score > best:
            best = score
    if best is not None:
        return best
    if scoring == "m4":
        return (0.0, 0, 0)
    return (0.0,)


def mss_subtree_score(
    query: str | MNode,
    candidate: str | MNode,
    constraints: ConstraintTree | str | None = None,
) -> tuple[float, int, int]:
    """similarity_v11: scoring_m4 over the v06 subtree matcher."""
    return subtree_metric_score(query, candidate, constraints, "m4")
