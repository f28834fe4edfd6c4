"""Property tests over random SLT trees (hypothesis).

Fuzzes the grammar surface the hand-vector tests can't cover: arbitrary
label/edge combinations through parse/serialize, tuple expansion, and the
rerank metric registry's invariants.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from tangent_ray.tokenize.slt import SLTNode, parse_slt, slt_tuples

LABELS = st.sampled_from(
    ["V!x", "V!y", "N!1", "N!27", "T!sin", "+", "=", "!", "O!(",
     "?w", "F!", "R!", "M!2x2", "W!"]
)
#: child edge types; first child may be "n" like the grammar emits
EDGES = st.sampled_from(list("nabouwcde"))


@st.composite
def slt_trees(draw, depth=3):
    te = draw(LABELS)
    node = SLTNode(te=te, ty="-")
    if depth > 0:
        n_children = draw(st.integers(0, 3))
        used: set[str] = set()
        for _ in range(n_children):
            ty = draw(EDGES)
            if ty in used:  # one child per edge slot, like real SLTs
                continue
            used.add(ty)
            child = draw(slt_trees(depth=depth - 1))
            child.ty = ty
            node.children.append(child)
        # canonical child order: the bare "n" child must serialize first
        # (the grammar marks only non-n edges with ",ty"), then EDGE order
        order = "nabouwcde"
        node.children.sort(key=lambda ch: order.index(ch.ty))
    return node


@given(slt_trees())
@settings(max_examples=200, deadline=None)
def test_serialize_parse_round_trip(tree):
    s = tree.serialize()
    back = parse_slt(s)
    assert back.serialize() == s


@given(slt_trees(), st.integers(0, 3), st.sampled_from(["none", "small", "all"]))
@settings(max_examples=200, deadline=None)
def test_tuple_expansion_total_and_bounded(tree, window, eol):
    """Expansion never raises on any tree and every tuple references labels
    from the tree (or EOL!/wildcard forms)."""
    tuples = slt_tuples(tree, window=window, eol=eol)
    labels = {n.te for n in _walk(tree)}
    for fr, to, rel, _loc in tuples:
        assert fr in labels
        assert to in labels or to == "0!"  # the reference's EOL marker
        assert rel == "" or set(rel) <= set("nabouwcde0")


def _walk(node):
    yield node
    for c in node.children:
        yield from _walk(c)


#: metrics whose leading component is provably maximal at self-similarity;
#: the subtree edge/triplet-Dice family (v06-v11) is NOT — a smaller
#: candidate fully covered by wildcards can out-precision the query itself
#: (reference semantics, not a bug)
SELF_MAXIMAL = ("v00", "v01", "v02", "v03", "mss", "v05")


@given(slt_trees(), slt_trees())
@settings(max_examples=60, deadline=None)
def test_metric_invariants(q, c):
    """Every registry metric: never raises and keeps its leading component
    in [0, 1]; the pair/MSS metrics additionally score self maximally."""
    from tangent_ray.rerank.metrics import METRICS

    qs = q.serialize()
    cs = c.serialize()
    for name, fn in METRICS.items():
        if name in ("v04",):  # alias of mss
            continue
        s_qc = fn(qs, cs)
        s_qq = fn(qs, qs)
        assert 0.0 <= s_qc[0] <= 1.0 + 1e-12, (name, s_qc)
        if name in SELF_MAXIMAL:
            assert s_qq[0] >= s_qc[0] - 1e-12, (name, s_qq, s_qc)
