"""MSS (Maximum Subtree Similarity) rerank tests.

Expected values hand-derived from the paper's definition
(``1507.06235.pdf`` §7): score = (harmonic mean of node/edge recall,
-unmatched candidate nodes, exact matches), lexicographic.
"""

from tangent_ray.rerank.mss import (
    ConstraintSpec,
    ConstraintTree,
    mss_score,
    rerank_candidates,
)

Q = "[V!x[=[F!,o[N!1],u[V!p]]]]"  # x = 1/p : 5 nodes, 4 edges


def test_exact_self_match():
    assert mss_score(Q, Q) == (1.0, 0, 5)


def test_superfluous_nodes_penalized_second():
    extra = "[V!x[=[F!,o[N!1],u[V!p[+[N!3]]]]]]"  # 7 nodes
    s = mss_score(Q, extra)
    assert s == (1.0, -2, 5)
    assert mss_score(Q, Q) > s  # fewer superfluous wins on tie of hs


def test_variable_unification_third_component():
    unif = "[V!y[=[F!,o[N!1],u[V!q]]]]"  # y~x, q~p unify; =,F!,N!1 exact
    s = mss_score(Q, unif)
    assert s == (1.0, 0, 3)
    assert mss_score(Q, Q) > s  # exact labels beat unified on 3rd component


def test_no_match():
    assert mss_score(Q, "[T!hello]") == (0.0, 0, 0)


def test_single_node_query_edge_recall_one():
    # |Tq| = 1: edge recall defined as 1.0
    assert mss_score("[V!x]", "[V!x]") == (1.0, 0, 1)
    assert mss_score("[V!x]", "[V!x[+[V!y]]]") == (1.0, -2, 1)


def test_wildcard_matches_anything():
    s = mss_score("[?v[=[F!,o[N!1],u[V!p]]]]", Q)
    assert s == (1.0, 0, 4)  # ?v->V!x unified, 4 exact


def test_one_to_one_unification():
    # query has x and y; candidate has z twice: only one can unify with z
    s = mss_score("[V!x[+[V!y]]]", "[V!z[+[V!z]]]")
    # M = {x~z, +, y unmatchable (z taken)} -> 2/3 nodes, 1/2 edges
    sym, edge = 2 / 3, 1 / 2
    hs = 2 * sym * edge / (sym + edge)
    assert abs(s[0] - hs) < 1e-12 and s[1] == -1 and s[2] == 1


def test_same_name_vars_count_exact():
    s = mss_score("[V!x[+[V!y]]]", "[V!x[+[V!y]]]")
    assert s == (1.0, 0, 3)


def test_partial_connected_match_hs():
    # S(k) query vs S+k: only S survives the connected subtree,
    # k matches in a second (consumed) alignment with no edges
    s = mss_score("[V!S[M!()1x1,w[V!k]]]", "[V!S[+[V!k]]]")
    sym, edge = 1 / 3, 0.5 / 2
    hs = 2 * sym * edge / (sym + edge)
    assert abs(s[0] - hs) < 1e-12


def test_matrix_cellwise_alignment():
    m = "[M!2x2,w[N!1,e[N!2,e[N!3,e[N!4]]]]]"
    assert mss_score(m, m) == (1.0, 0, 5)
    # one cell differs -> 4/5 nodes; grid edges w-path all preserved
    m2 = "[M!2x2,w[N!1,e[N!2,e[N!9,e[N!4]]]]]"
    s = mss_score(m, m2)
    assert s[2] == 4


def test_number_unifies_with_number():
    s = mss_score("[N!2]", "[N!7]")
    assert s == (1.0, 0, 0)  # unified (same type), not exact


def test_operator_requires_exact():
    assert mss_score("[+]", "[-]") == (0.0, 0, 0)
    assert mss_score("[+]", "[+]") == (1.0, 0, 1)


# -- constraint trees (user-extension surface) ------------------------------

def test_constraint_exact_blocks_unification():
    con = ConstraintTree.from_slt("[E[E[E,o[E],u[E]]]]")
    unif = "[V!y[=[F!,o[N!1],u[V!q]]]]"
    s = mss_score(Q, unif, con)
    # x,p restricted: cannot unify with y,q -> only =,F!,N!1 match
    assert s[2] == 3 and s[0] < 1.0


def test_constraint_numeric_range():
    spec = ConstraintSpec.parse("U!>=2!<=5")
    assert spec.check("N!3", "N!4")
    assert not spec.check("N!3", "N!9")
    assert not spec.check("N!3", "N!1")
    strict = ConstraintSpec.parse("U!>2")
    assert not strict.check("N!3", "N!2")
    assert strict.check("N!3", "N!5")


def test_constraint_wildcard_type_restriction():
    spec = ConstraintSpec.parse("V")
    assert spec.check("?x", "V!y")
    assert not spec.check("?x", "N!2")


def test_rerank_ordering_and_tiebreak():
    cands = [
        (30, "[V!y[=[F!,o[N!1],u[V!q]]]]"),            # unified
        (10, Q),                                        # exact
        (20, "[V!x[=[F!,o[N!1],u[V!p[+[N!3]]]]]]"),    # exact + extra
        (40, "[T!hello]"),                              # no match
        (5, Q),                                         # exact, higher docid first? no: docid asc
    ]
    out = rerank_candidates(Q, cands)
    # lexicographic: unified-without-extra (0 unmatched) outranks
    # exact-with-extra (-2 unmatched); equal scores tie-break docid asc
    assert [d for d, _, _ in out] == [5, 10, 30, 20, 40]


def test_rerank_search_end_to_end(ray_session, tmp_path):
    """Exact formula doc must rank 1 with mss_h == 1.0 after reranking."""
    from tangent_ray.config import EngineConfig
    from tangent_ray.fixtures import write_transcripts
    from tangent_ray.index.build import build_index, list_input_files
    from tangent_ray.rerank.pipeline import rerank_search
    from tangent_ray.sources.corpus import TranscriptsCorpus

    data_dir = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    write_transcripts(data_dir, 40, files=2)
    cfg = EngineConfig(window=2, eol="small", stem=True, math=True)
    build_index(data_dir, idx, cfg, TranscriptsCorpus())

    out = rerank_search(
        [{"query_id": "r1", "kind": "math", "text": "$[V!x[=[F!,o[N!1],u[V!p]]]]$"}],
        idx,
        list_input_files(data_dir),
        topk=10,
        concurrency=1,
    ).to_pylist()
    assert out, "no rerank results"
    assert out[0]["rank"] == 1
    assert out[0]["mss_h"] == 1.0
    # ranks are dense, 1..n
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    # MSS vectors non-increasing lexicographically
    vecs = [(r["mss_h"], r["mss_unmatched"], r["mss_exact"]) for r in out]
    assert vecs == sorted(vecs, reverse=True) or all(
        vecs[i] >= vecs[i + 1] for i in range(len(vecs) - 1)
    )


def test_rerank_search_metric_param(ray_session, tmp_path):
    """rerank_search accepts any registry metric; exact doc still tops."""
    from tangent_ray.config import EngineConfig
    from tangent_ray.fixtures import write_transcripts
    from tangent_ray.index.build import build_index, list_input_files
    from tangent_ray.rerank.pipeline import rerank_search
    from tangent_ray.sources.corpus import TranscriptsCorpus

    data_dir = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    write_transcripts(data_dir, 40, files=2)
    build_index(data_dir, idx, EngineConfig(window=2, eol="small"),
                TranscriptsCorpus())
    q = [{"query_id": "r1", "kind": "math",
          "text": "$[V!x[=[F!,o[N!1],u[V!p]]]]$"}]
    files = list_input_files(data_dir)
    for metric, top in (("v00", None), ("v05", 1.0), ("v11", 1.0)):
        out = rerank_search(q, idx, files, topk=5, concurrency=1,
                            metric=metric).to_pylist()
        assert out and [r["rank"] for r in out] == list(range(1, len(out) + 1))
        scores = [r["mss_h"] for r in out]
        assert scores == sorted(scores, reverse=True), metric
        assert scores[0] > 0.0, metric
        if top is not None:
            # unification-capable metrics fully cover the variant formula
            # (the corpus holds N!/V! variants of the query template)
            assert scores[0] == top, metric
        else:
            # v00 has no unification: the variant can't reach 1.0
            assert scores[0] < 1.0, metric
        # padded integer columns stay well-formed for 1-component metrics
        assert isinstance(out[0]["mss_unmatched"], int)
