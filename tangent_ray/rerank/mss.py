"""Maximum Subtree Similarity (MSS) reranking of formula candidates.

Implements the published MSS metric of the Tangent-3 paper
(``research_paper/1507.06235.pdf`` §7, "Maximum Subtree Similarity"): given a
query SLT ``Tq`` and candidate SLT ``Tc``, consider every pair of aligned
subtrees whose roots can be unified; grow each alignment greedily to the
maximally-similar subtree; greedily unify symbols by type (1-to-1); and
score the candidate with the lexicographic triple

1. ``hs`` — harmonic mean of the fraction of query nodes preserved by the
   matched set ``M`` and the fraction of query edges preserved by ``E(M)``
   (with the paper's ``max(|E(M)|, 0.5)`` floor when nodes matched but no
   edges did, and edge recall 1.0 for single-node queries);
2. ``-(|Tc| - |M|)`` — negated count of superfluous candidate nodes;
3. the number of exactly-matched nodes (identical labels).

``MSS(Tq, Tc)`` is the lexicographic max over alignments. The reference
realizes the same metric as ``similarity_v04`` (greedy alignment +
``test_alignment_unification``, ``ranking/ranking_functions.py:1070,908``);
this module is an independent implementation from the paper's definitions,
with behavior cross-checked against the reference semantics:

- unification is by *symbol type*: wildcards (``?x``) unify with anything,
  ``V!``/``N!``/``T!``/… unify within their type, untyped operators only
  match exactly (``ConstraintInfo.check_unifiable``,
  ``ranking/constraint_info.py:36-101``);
- per-query-node constraint trees (user-extension surface, SURVEY §2.10):
  ``E`` forces exact match, ``U[!>=x][!<=y]`` bounds numeric unification,
  a bare type letter restricts wildcard type
  (``constraint_info.py:103-132``; default is an all-``U`` tree,
  ``ranking/query.py:36,58``);
- matrices compare cell-by-cell over the row/col grid (1-D fenced rows
  compare as lists — ``ranking_functions.py:712-747``);
- subtree growth accepts a child branch only when it improves the harmonic
  f-measure bound (the "maximally similar to Tq" rule,
  ``ranking_functions.py:765-780``);
- unified variable pairs with identical names count as exact matches; a
  candidate symbol may be the unification target of at most one query
  symbol (greedy by frequency, ties prefer identical names —
  ``greedy_unification``, ``ranking_functions.py:865-906``).

Reranking runs over the top-k candidates only (the reference fixes k=100,
``rerank_results.py:129-136``), so it is driver-side or a small actor-pool
``map_batches`` stage — never a shuffle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from tangent_ray.tokenize.slt import SLTNode, parse_slt

#: child slots in reference ``build_str`` order (n first, then scripts)
EDGE_ORDER = ("n", "a", "b", "o", "u", "c", "d", "w", "e")


class MNode:
    """Edge-labelled view of an SLT node (one child slot per edge label)."""

    __slots__ = ("te", "edges")

    def __init__(self, te: str):
        self.te = te
        self.edges: dict[str, MNode] = {}

    @classmethod
    def from_slt(cls, node: SLTNode) -> "MNode":
        out = cls(node.te)
        for c in node.children:
            out.edges[c.ty if c.ty != "-" else "n"] = cls.from_slt(c)
        return out

    def element_children(self) -> list["MNode"]:
        """Cells of a fenced row / matrix: within child then its e-chain."""
        cells: list[MNode] = []
        cur = self.edges.get("w")
        while cur is not None:
            cells.append(cur)
            cur = cur.edges.get("e")
        return cells


def node_list(root: MNode, path: str = "") -> list[tuple[MNode, str]]:
    out = [(root, path)]
    for label in EDGE_ORDER:
        child = root.edges.get(label)
        if child is not None:
            out.extend(node_list(child, path + label))
    return out


_MAT_SIZE_RE = re.compile(r"(\d+)x(\d+)$")


def matrix_size(tag: str) -> tuple[int, int]:
    m = _MAT_SIZE_RE.search(tag)
    if not m:
        return (-1, -1)
    return int(m.group(1)), int(m.group(2))


# ---------------------------------------------------------------------------
# constraints (user-extension surface)

@dataclass
class ConstraintSpec:
    unifiable: bool = True
    min_value: float | None = None
    max_value: float | None = None
    min_strict: bool = False
    max_strict: bool = False
    restricted_type: str | None = None

    @classmethod
    def parse(cls, text: str) -> "ConstraintSpec":
        """``E`` exact; ``U[!>=x][!<=y][!>x][!<y]`` numeric bounds; a bare
        type letter restricts wildcard matches to that type."""
        if text == "E":
            return cls(unifiable=False)
        spec = cls(unifiable=True)
        parts = text.split("!")
        if parts[0] == "U":
            for p in parts[1:]:
                if p.startswith(">="):
                    spec.min_value, spec.min_strict = float(p[2:]), False
                elif p.startswith(">"):
                    spec.min_value, spec.min_strict = float(p[1:]), True
                elif p.startswith("<="):
                    spec.max_value, spec.max_strict = float(p[2:]), False
                elif p.startswith("<"):
                    spec.max_value, spec.max_strict = float(p[1:]), True
        elif parts[0]:
            spec.restricted_type = parts[0][0]
        return spec

    def check(self, q_te: str, c_te: str) -> bool:
        # equal labels and query wildcards unify unconditionally (the
        # reference checks these before any constraint,
        # constraint_info.py:38-39); a typed wildcard restriction applies
        # when the constraint names a type
        if q_te == c_te:
            return True
        if q_te.startswith("?"):
            if self.restricted_type is None:
                return True
            return len(c_te) > 1 and c_te[1] == "!" and c_te[0] == self.restricted_type
        if not self.unifiable:
            return False
        q_typed = len(q_te) > 1 and q_te[1] == "!"
        c_typed = len(c_te) > 1 and c_te[1] == "!"
        if not (q_typed and c_typed and q_te[0] == c_te[0]):
            return False
        if q_te[0] == "N":
            # the candidate's numeric value is ALWAYS parsed for N<->N
            # unification (constraint_info.py:63-70): an unparseable
            # constant (e.g. digit-grouping spaces) cannot be unified,
            # bounds or not
            try:
                v = float(c_te.split("!", 1)[1].strip())
            except ValueError:
                return False
            if self.min_value is not None and (
                v < self.min_value or (self.min_strict and v == self.min_value)
            ):
                return False
            if self.max_value is not None and (
                v > self.max_value or (self.max_strict and v == self.max_value)
            ):
                return False
        return True


_DEFAULT_SPEC = ConstraintSpec()


class ConstraintTree:
    """Constraint per query node, shaped like the query tree; default all-U."""

    def __init__(self, specs: dict[str, ConstraintSpec] | None = None):
        self.specs = specs or {}

    @classmethod
    def from_slt(cls, slt_string: str) -> "ConstraintTree":
        root = MNode.from_slt(parse_slt(slt_string))
        specs = {p: ConstraintSpec.parse(n.te) for n, p in node_list(root)}
        return cls(specs)

    def at(self, path: str) -> ConstraintSpec:
        return self.specs.get(path, _DEFAULT_SPEC)


def _is_var(te: str) -> bool:
    return te.startswith("V!") or te.startswith("?")


# ---------------------------------------------------------------------------
# alignment

@dataclass
class _AlignState:
    matched: list[tuple[str, str, str, str]] = field(default_factory=list)
    u_wild: list[tuple[str, str, str, str]] = field(default_factory=list)
    u_vars: list[tuple[str, str, str, str]] = field(default_factory=list)
    u_const: list[tuple[str, str, str, str]] = field(default_factory=list)
    unmatched: int = 0

    def potential(self) -> int:
        return len(self.matched) + len(self.u_wild) + len(self.u_vars) + len(self.u_const)

    def size(self) -> int:
        return self.potential() + self.unmatched

    def extend(self, other: "_AlignState") -> None:
        self.matched += other.matched
        self.u_wild += other.u_wild
        self.u_vars += other.u_vars
        self.u_const += other.u_const
        self.unmatched += other.unmatched


def _fmeasure(matches: int, qsize: int, csize: int) -> float:
    if matches == 0:
        return 0.0
    p, r = matches / csize, matches / qsize
    return 2.0 * p * r / (p + r)


def _grow_alignment(
    q: MNode, qp: str, c: MNode, cp: str,
    con: ConstraintTree, restricted: set[str], qsize: int,
) -> _AlignState:
    """Grow the maximally-similar aligned subtree from roots (q, c).

    A child branch joins only if it improves the harmonic f-measure bound —
    the paper's "T1 is maximally similar to Tq" greedy rule."""
    st = _AlignState()
    entry = (q.te, c.te, qp, cp)
    spec = con.at(qp)
    if q.te.startswith("?"):
        if spec.check(q.te, c.te):
            st.u_wild.append(entry)
        else:
            st.unmatched += 1
    elif _is_var(q.te) and _is_var(c.te):
        if q.te in restricted or c.te in restricted:
            if q.te == c.te:
                st.matched.append(entry)
            else:
                st.unmatched += 1
        else:
            st.u_vars.append(entry)
    elif q.te == c.te:
        st.matched.append(entry)
    elif spec.check(q.te, c.te):
        st.u_const.append(entry)
    else:
        st.unmatched += 1

    best_f = _fmeasure(
        len(st.matched) + len(st.u_vars) + len(st.u_const), qsize, 1
    )
    cur_matches = len(st.matched) + len(st.u_vars) + len(st.u_const)
    cur_size = 1

    branches: list[tuple[MNode, MNode, str, str]] = []
    for label in ("n", "a", "b", "o", "u", "c", "d"):
        qc, cc = q.edges.get(label), c.edges.get(label)
        if qc is not None and cc is not None:
            branches.append((qc, cc, qp + label, cp + label))
    if q.te.startswith("M!") and c.te.startswith("M!"):
        qr, qc_ = matrix_size(q.te)
        cr, cc_ = matrix_size(c.te)
        q_cells = q.element_children()
        c_cells = c.element_children()
        if (qr == 1 or qc_ == 1) and (cr == 1 or cc_ == 1):
            p = "w"
            for i in range(min(len(q_cells), len(c_cells))):
                branches.append((q_cells[i], c_cells[i], qp + p, cp + p))
                p += "e"
        else:
            for row in range(min(qr, cr)):
                for col in range(min(qc_, cc_)):
                    iq, ic = row * qc_ + col, row * cc_ + col
                    if iq < len(q_cells) and ic < len(c_cells):
                        branches.append(
                            (q_cells[iq], c_cells[ic],
                             qp + "w" + "e" * iq, cp + "w" + "e" * ic)
                        )
    else:
        qc, cc = q.edges.get("w"), c.edges.get("w")
        if qc is not None and cc is not None:
            branches.append((qc, cc, qp + "w", cp + "w"))

    for qc, cc, qpp, cpp in branches:
        child = _grow_alignment(qc, qpp, cc, cpp, con, restricted, qsize)
        nm = cur_matches + child.potential()
        ns = cur_size + child.size()
        f = _fmeasure(nm, qsize, ns)
        if f > best_f:
            st.extend(child)
            cur_matches, cur_size, best_f = nm, ns, f
    return st


def _greedy_unify(pairs: list[tuple[str, str, str, str]]) -> dict[str, str | None]:
    """1-to-1 symbol unification, most-frequent pair first (ties prefer
    identical names). Returns query-symbol -> unified candidate symbol."""
    freq: dict[tuple[str, str], int] = {}
    q_u: dict[str, str | None] = {}
    c_u: dict[str, str | None] = {}
    for q_te, c_te, _, _ in pairs:
        freq[(q_te, c_te)] = freq.get((q_te, c_te), 0) + 1
        q_u.setdefault(q_te, None)
        c_u.setdefault(c_te, None)
    order = sorted(
        ((n, 1 if q == c else 0, q, c) for (q, c), n in freq.items()),
        reverse=True,
    )
    for _, _, q_te, c_te in order:
        if q_u[q_te] is None and c_u[c_te] is None:
            q_u[q_te] = c_te
            c_u[c_te] = q_te
    return q_u


def _matched_edges(locations: list[str]) -> int:
    locs = set(locations)
    return sum(1 for loc in locs if loc and loc[:-1] in locs)


@dataclass
class _ScoredAlign:
    """One unified alignment: score triple, accepted entry lists, and the
    greedy 1-to-1 symbol maps it committed to (query tag -> candidate tag)."""

    score: tuple[float, int, int]
    matched: list[tuple[str, str, str, str]]
    unified: list[tuple[str, str, str, str]]
    var_map: dict[str, str | None]
    wild_map: dict[str, str | None]

    @property
    def used(self) -> list[tuple[str, str, str, str]]:
        return self.matched + self.unified


def _score_alignment(st: _AlignState, qsize: int, csize: int) -> _ScoredAlign:
    matched = list(st.matched)
    unified: list[tuple[str, str, str, str]] = []
    not_unified = 0

    w_u: dict[str, str | None] = {}
    if st.u_wild:
        w_u = _greedy_unify(st.u_wild)
        for e in st.u_wild:
            if w_u[e[0]] == e[1]:
                unified.append(e)
            else:
                not_unified += 1
    v_u = _greedy_unify(st.u_vars)
    for e in st.u_vars:
        if v_u[e[0]] == e[1]:
            (matched if e[0] == e[1] else unified).append(e)
        else:
            not_unified += 1
    unified.extend(st.u_const)

    n_unified = len(matched) + len(unified)
    locations = [e[3] for e in matched + unified]
    edges = _matched_edges(locations)

    sym_rec = n_unified / float(qsize)
    if qsize > 1:
        edge_rec = (edges if edges > 0 else 0.5) / float(qsize - 1)
    else:
        edge_rec = 1.0
    hs = (
        2.0 * sym_rec * edge_rec / (sym_rec + edge_rec)
        if sym_rec + edge_rec > 0
        else 0.0
    )
    return _ScoredAlign(
        (hs, -(csize - n_unified), len(matched)), matched, unified, v_u, w_u
    )


ZERO_SCORE = (0.0, 0, 0)


def mss_score(
    query: SLTNode | str,
    candidate: SLTNode | str,
    constraints: ConstraintTree | str | None = None,
) -> tuple[float, int, int]:
    """MSS(Tq, Tc): lexicographic max score triple over aligned subtrees."""
    q_root = MNode.from_slt(parse_slt(query) if isinstance(query, str) else query)
    c_root = MNode.from_slt(
        parse_slt(candidate) if isinstance(candidate, str) else candidate
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

    # all unifiable (query node, candidate node) root pairs, DFS order
    pending: set[tuple[int, int]] = set()
    roots: list[tuple[MNode, str, MNode, str, int, int]] = []
    for qi, (qn, qp) in enumerate(q_nodes):
        spec = con.at(qp)
        for ci, (cn, cp) in enumerate(c_nodes):
            if qn.te == cn.te or spec.check(qn.te, cn.te):
                roots.append((qn, qp, cn, cp, qi, ci))
                pending.add((qi, ci))

    q_index = {id(n): i for i, (n, _) in enumerate(q_nodes)}
    c_index = {id(n): i for i, (n, _) in enumerate(c_nodes)}
    qpath_index = {p: i for i, (_, p) in enumerate(q_nodes)}
    cpath_index = {p: i for i, (_, p) in enumerate(c_nodes)}

    best = ZERO_SCORE
    for qn, qp, cn, cp, qi, ci in roots:
        if (qi, ci) not in pending:
            continue
        st = _grow_alignment(qn, qp, cn, cp, con, restricted, qsize)
        res = _score_alignment(st, qsize, csize)
        # consume used pairs (reference removes matched+unified alignments)
        for _, _, upq, upc in res.used:
            key = (qpath_index.get(upq), cpath_index.get(upc))
            pending.discard(key)
        pending.discard((qi, ci))
        if res.score > best:
            best = res.score
    return best


def mss_multi_score(
    query: SLTNode | str,
    candidate: SLTNode | str,
    constraints: ConstraintTree | str | None = None,
) -> tuple[float, int, int]:
    """``similarity_v05``: MSS with multiple disjoint sub-matches.

    Where v04 keeps only the single best aligned subtree, v05 accepts the
    best alignment in full and then folds in further alignments' entries
    that (a) touch only still-unaligned query/candidate nodes and (b) carry
    a variable/wildcard unification consistent with the map accumulated so
    far (``ranking_functions.py:1151-1315``). The final triple pools all
    accepted sub-matches: harmonic mean of pooled node recall and pooled
    per-sub-match edge recall, negated candidate leftovers, pooled exact
    matches (``similarity_scores_from_u_alignments``,
    ``ranking_functions.py:1104-1149``)."""
    q_root = MNode.from_slt(parse_slt(query) if isinstance(query, str) else query)
    c_root = MNode.from_slt(
        parse_slt(candidate) if isinstance(candidate, str) else candidate
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
    qpath_index = {p: i for i, (_, p) in enumerate(q_nodes)}
    cpath_index = {p: i for i, (_, p) in enumerate(c_nodes)}

    # same alignment generation/consumption as mss_score, keeping every
    # scored alignment instead of only the max
    pending: set[tuple[int, int]] = set()
    roots: list[tuple[MNode, str, MNode, str, int, int]] = []
    for qi, (qn, qp) in enumerate(q_nodes):
        spec = con.at(qp)
        for ci, (cn, cp) in enumerate(c_nodes):
            if qn.te == cn.te or spec.check(qn.te, cn.te):
                roots.append((qn, qp, cn, cp, qi, ci))
                pending.add((qi, ci))
    scored: list[_ScoredAlign] = []
    for qn, qp, cn, cp, qi, ci in roots:
        if (qi, ci) not in pending:
            continue
        st = _grow_alignment(qn, qp, cn, cp, con, restricted, qsize)
        res = _score_alignment(st, qsize, csize)
        for _, _, upq, upc in res.used:
            pending.discard((qpath_index.get(upq), cpath_index.get(upc)))
        pending.discard((qi, ci))
        scored.append(res)
    scored.sort(key=lambda r: r.score, reverse=True)

    aligned_q: set[str] = set()
    aligned_c: set[str] = set()
    var_map: dict[str, str] = {}  # query var tag -> candidate var tag
    var_rev: dict[str, str] = {}
    wild_map: dict[str, str] = {}
    wild_rev: dict[str, str] = {}
    total_exact = total_unified = total_edges = 0
    accepted_any = False

    for res in scored:
        if not accepted_any:
            valid_m, valid_u = res.matched, res.unified
            for q_te, c_te in res.var_map.items():
                if c_te is not None:
                    var_map[q_te], var_rev[c_te] = c_te, q_te
            for q_te, c_te in res.wild_map.items():
                if c_te is not None:
                    wild_map[q_te], wild_rev[c_te] = c_te, q_te
        else:
            # merge compatible unifications; conflicting query tags are
            # invalid for this sub-match
            new_var: dict[str, str] = {}
            new_wild: dict[str, str] = {}
            invalid: set[str] = set()
            for q_te, c_te in res.var_map.items():
                if c_te is None:
                    continue
                if var_map.get(q_te) == c_te:
                    continue
                if q_te not in var_map and c_te not in var_rev:
                    new_var[q_te] = c_te
                else:
                    invalid.add(q_te)
            for q_te, c_te in res.wild_map.items():
                if c_te is None:
                    continue
                if wild_map.get(q_te) == c_te:
                    continue
                if q_te not in wild_map and c_te not in wild_rev:
                    new_wild[q_te] = c_te
                else:
                    invalid.add(q_te)

            def _ok(e: tuple[str, str, str, str]) -> bool:
                return (
                    e[2] not in aligned_q
                    and e[3] not in aligned_c
                    and e[0] not in invalid
                )

            valid_m = [e for e in res.matched if _ok(e)]
            valid_u = [e for e in res.unified if _ok(e)]
            if not valid_m and not valid_u:
                continue
            for q_te, c_te in new_var.items():
                var_map[q_te], var_rev[c_te] = c_te, q_te
            for q_te, c_te in new_wild.items():
                wild_map[q_te], wild_rev[c_te] = c_te, q_te

        accepted_any = True
        for e in valid_m + valid_u:
            aligned_q.add(e[2])
            aligned_c.add(e[3])
        total_exact += len(valid_m)
        total_unified += len(valid_m) + len(valid_u)
        # edges within THIS sub-match's accepted query locations
        total_edges += _matched_edges([e[2] for e in valid_m + valid_u])

    if not accepted_any:
        return ZERO_SCORE
    sym_rec = total_unified / float(qsize)
    if qsize > 1:
        edge_rec = (total_edges if total_edges > 0 else 0.5) / float(qsize - 1)
    else:
        edge_rec = 1.0
    hs = (
        2.0 * sym_rec * edge_rec / (sym_rec + edge_rec)
        if sym_rec + edge_rec > 0
        else 0.0
    )
    return (hs, -(csize - total_unified), total_exact)


def rerank_candidates(
    query_slt: str,
    candidates: list[tuple[int, str]],
    constraints: ConstraintTree | str | None = None,
    topk: int | None = None,
    metric: str = "mss",
) -> list[tuple[int, str, tuple]]:
    """Rerank (docid, slt) candidates by score desc, docid asc.

    ``metric`` selects from the registry (``rerank/metrics.py``: v00, v01,
    v02, v04/mss — reference ``rerank_results.py:256-334``); constraints
    apply to the MSS metric only. Each doc is scored by its best expression
    (the reference keeps the top candidate per query expression per doc —
    ``comp_query.py:207-235``)."""
    if metric in ("mss", "v04"):
        def score(slt: str) -> tuple:
            return mss_score(query_slt, slt, constraints)
    elif metric == "v11":
        from tangent_ray.rerank.subtree import mss_subtree_score

        def score(slt: str) -> tuple:
            return mss_subtree_score(query_slt, slt, constraints)
    else:
        from tangent_ray.rerank.metrics import METRICS

        fn = METRICS[metric]

        def score(slt: str) -> tuple:
            return fn(query_slt, slt)

    scored = [(docid, slt, score(slt)) for docid, slt in candidates]
    scored.sort(key=lambda r: (tuple(-x for x in r[2]), r[0]))
    return scored[:topk] if topk else scored
