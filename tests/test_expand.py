"""Query expansion (prefix / synonym groups), metadata-filtered search,
and more-like-this: DuckDB differentials on the blended SynonymQuery
scoring, expansion-cap determinism, sharded-serving identity, stemming
interaction, and edge cases (no-match prefix, unknown facet column)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG, EngineConfig
from tangent_ray.index.build import build_index
from tangent_ray.query.facets import build_facet_sidecar
from tangent_ray.query.mlt import mlt_terms, more_like_this
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import DocumentsCorpus

ROWS = [
    (0, "alpha beta gamma delta", "en"),
    (1, "alphabet soup beta beta", "en"),
    (2, "alpine alpha alpha trails", "de"),
    (3, "delta gamma gamma", "en"),
    (4, "beta beta alpine walks", "de"),
    (5, "alpha alphabet alpine all", "en"),
    (6, "unrelated words entirely", "fr"),
    (7, "gamma alpha beta soup", "de"),
]

K1, B = 1.2, 0.75


def _tab():
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "text": pa.array([r[1] for r in ROWS], pa.string()),
            "lang": pa.array([r[2] for r in ROWS], pa.string()),
            "nval": pa.array([10 * (r[0] + 1) for r in ROWS], pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    import dataclasses

    root = tmp_path_factory.mktemp("expand")
    src = str(root / "docs")
    os.makedirs(src)
    t = _tab()
    pq.write_table(t.slice(0, 4), os.path.join(src, "a.parquet"))
    pq.write_table(t.slice(4), os.path.join(src, "b.parquet"))
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=2),
                DocumentsCorpus())
    build_facet_sidecar(out, ["lang", "nval"])
    return out


def _duck():
    con = duckdb.connect()
    con.register("docs", _tab())
    con.execute(
        """
        CREATE TEMP VIEW toks AS
        SELECT * FROM (
          SELECT doc_id, unnest(string_split_regex(lower(text),
                 '[^a-z0-9]+')) AS term FROM docs
        ) WHERE term <> '';
        CREATE TEMP VIEW tf AS
        SELECT term, doc_id, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2;
        CREATE TEMP VIEW dl AS
        SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY 1;
        CREATE TEMP VIEW stats AS
        SELECT (SELECT count(*) FROM docs)::DOUBLE AS n,
               (SELECT sum(dl) FROM dl) / (SELECT count(*) FROM docs) AS avgdl;
        CREATE TEMP VIEW dfx AS
        SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1;
        """
    )
    return con


#: blended pseudo-term scores for a member list chosen by an in-SQL rule
_GROUP_SQL = """
WITH sel AS ({sel}),
gtf AS (
  SELECT tf.doc_id, sum(tf.tf) AS tf FROM tf JOIN sel USING (term)
  GROUP BY 1
),
gdf AS (SELECT max(df) AS df FROM dfx JOIN sel USING (term))
SELECT g.doc_id,
       ln(1 + (stats.n - gdf.df + 0.5) / (gdf.df + 0.5))
         * g.tf * ({k1} + 1)
         / (g.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl)) AS score
FROM gtf g JOIN dl USING (doc_id), stats, gdf
ORDER BY score DESC, doc_id
"""


def _engine(idx, text, k=10):
    sc = QueryScorer(idx)
    d, s = sc.score_query(text, "text", k)
    return list(zip(d.tolist(), np.round(s, 9).tolist()))


def _sqlrows(con, sql):
    return [(int(d), round(float(s), 9)) for d, s in con.execute(sql).fetchall()]


def test_prefix_blended_vs_duckdb(idx):
    # alp* -> alpha, alphabet, alpine (all fit under the cap)
    sel = "SELECT term FROM dfx WHERE term LIKE 'alp%' ORDER BY df DESC, term"
    want = _sqlrows(_duck(), _GROUP_SQL.format(sel=sel, k1=K1, b=B))
    assert _engine(idx, "alp*") == want


def test_prefix_expansion_cap_by_df(idx):
    # cap 2 keeps the two highest-df terms (df desc, term asc) — alpha (5
    # docs) and alpine (3) outrank alphabet (2)
    sc = QueryScorer(idx)
    sc.prefix_max_expansions = 2
    assert sc.reader.expand_prefix("alp", 2) == ["alpha", "alpine"]
    d, s = sc.score_query("alp*", "text", 10)
    sel = ("SELECT term FROM dfx WHERE term LIKE 'alp%' "
           "ORDER BY df DESC, term LIMIT 2")
    want = _sqlrows(_duck(), _GROUP_SQL.format(sel=sel, k1=K1, b=B))
    assert list(zip(d.tolist(), np.round(s, 9).tolist())) == want


def test_synonym_group_vs_duckdb(idx):
    sel = "SELECT unnest(['beta', 'gamma']) AS term"
    want = _sqlrows(_duck(), _GROUP_SQL.format(sel=sel, k1=K1, b=B))
    assert _engine(idx, "{beta,gamma}") == want
    assert _engine(idx, "{beta|gamma}") == want  # pipe separator alias


def test_group_plus_plain_term_sums(idx):
    # mixed query: plain term contribution + group contribution add up
    con = _duck()
    sel = "SELECT unnest(['beta', 'gamma']) AS term"
    grp = {d: s for d, s in _sqlrows(con, _GROUP_SQL.format(sel=sel, k1=K1, b=B))}
    plain = {
        d: s
        for d, s in _sqlrows(
            con,
            _GROUP_SQL.format(sel="SELECT 'soup' AS term", k1=K1, b=B),
        )
    }
    want = {}
    for d in set(grp) | set(plain):
        want[d] = round(grp.get(d, 0.0) + plain.get(d, 0.0), 6)
    got = {d: round(s, 6) for d, s in _engine(idx, "soup {beta,gamma}")}
    assert got == want


def test_no_match_prefix_and_group(idx):
    assert _engine(idx, "zzz*") == []
    assert _engine(idx, "{zzz,qqq}") == []
    # a no-match group contributes nothing next to a live term
    lone = _engine(idx, "soup")
    assert _engine(idx, "soup {zzz,qqq}") == lone
    assert _engine(idx, "soup zzz*") == lone


def test_filtered_search_vs_duckdb(idx):
    con = _duck()
    want = [
        (d, s)
        for d, s in _sqlrows(
            con, _GROUP_SQL.format(sel="SELECT 'beta' AS term", k1=K1, b=B)
        )
        if con.execute(
            f"SELECT lang = 'de' FROM docs WHERE doc_id = {d}"
        ).fetchone()[0]
    ]
    assert _engine(idx, "beta #lang:de") == want
    # survivors keep their unfiltered scores
    full = dict(_engine(idx, "beta"))
    for d, s in want:
        assert full[d] == s


def test_filter_no_match_value_and_bad_column(idx):
    assert _engine(idx, "beta #lang:xx") == []
    with pytest.raises(KeyError):
        _engine(idx, "beta #nosuch:x")
    # a typo'd column raises even when the terms match nothing
    with pytest.raises(KeyError):
        _engine(idx, "zzznomatch #nosuch:x")


def test_numeric_range_filters_vs_duckdb(idx):
    """#nval>35 / #nval<=30 numeric range filters vs the raw column."""
    base = _engine(idx, "beta")
    nval = {r[0]: 10 * (r[0] + 1) for r in ROWS}
    assert _engine(idx, "beta #nval>35") == [
        (d, s) for d, s in base if nval[d] > 35
    ]
    assert _engine(idx, "beta #nval<=30") == [
        (d, s) for d, s in base if nval[d] <= 30
    ]
    assert _engine(idx, "beta #nval>=20 #nval<40") == [
        (d, s) for d, s in base if 20 <= nval[d] < 40
    ]
    assert _engine(idx, "beta #nval>99999") == []
    # a range op on a TEXT column raises (caller bug, not an empty page)
    with pytest.raises(Exception):
        _engine(idx, "beta #lang>3")


def test_negated_prefix_and_group(idx):
    # -alp* excludes every doc containing ANY alp-prefixed term (full
    # expansion, not the scoring cap)
    con = _duck()
    excluded = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'alp%'"
        ).fetchall()
    }
    got = dict(_engine(idx, "beta -alp*"))
    want = {d: s for d, s in _engine(idx, "beta") if d not in excluded}
    assert got == want
    # -{gamma,delta} excludes both members
    exc2 = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT doc_id FROM toks WHERE term IN ('gamma','delta')"
        ).fetchall()
    }
    got2 = dict(_engine(idx, "beta -{gamma,delta}"))
    assert got2 == {d: s for d, s in _engine(idx, "beta") if d not in exc2}
    # negated GLOB: -a?pha excludes docs containing alpha (not alpine)
    exc3 = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'a_pha'"
        ).fetchall()
    }
    got3 = dict(_engine(idx, "beta -a?pha"))
    assert got3 == {d: s for d, s in _engine(idx, "beta") if d not in exc3}
    # negated lone-trailing-? is the literal term
    assert _engine(idx, "beta -delta?") == _engine(idx, "beta -delta")


def test_explain_sums_to_score(idx):
    """explain(): per-term contributions sum EXACTLY to the doc's TAAT
    score, for plain, boosted, grouped, prefix, and filtered queries."""
    sc = QueryScorer(idx)
    for q in ("alpha beta", "beta^2.5 gamma", "soup {beta,gamma}", "alp*",
              "alpha beta #lang:de"):
        d, s = sc.score_query(q, "text", 10)
        for dd, ss in zip(d.tolist()[:3], s.tolist()[:3]):
            ex = sc.explain(q, dd)
            got = float(np.sum(ex["contribution"].to_numpy()))
            assert abs(got - ss) < 1e-12, (q, dd, got, ss)
            assert all(k in ("term", "group")
                       for k in ex["kind"].to_pylist())


def test_explain_excluded_and_filtered(idx):
    sc = QueryScorer(idx)
    # doc 0 contains delta -> excluded row present
    ex = sc.explain("alpha -delta", 0)
    assert "excluded" in ex["kind"].to_pylist()
    # doc 0 is en -> filtered out by #lang:de
    ex2 = sc.explain("alpha #lang:de", 0)
    assert "filtered" in ex2["kind"].to_pylist()
    # a doc that matches nothing explains to zero rows
    assert sc.explain("zzznomatch", 0).num_rows == 0


def test_explain_deleted_doc(ray_session, tmp_path):
    """A tombstoned doc explains with a synthetic 'deleted' row — the
    engine can never surface it, and explain must say so."""
    import dataclasses

    from tangent_ray.index.deletes import delete_docs

    src = str(tmp_path / "docs")
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["alpha beta", "alpha"], pa.string()),
            }
        ),
        os.path.join(src, "d.parquet"),
    )
    out = str(tmp_path / "idx")
    build_index(src, out,
                dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    delete_docs(out, docids=[0])
    sc = QueryScorer(out)
    ex = sc.explain("alpha", 0)
    assert "deleted" in ex["kind"].to_pylist()
    assert "deleted" not in sc.explain("alpha", 1)["kind"].to_pylist()


def test_collapsed_search_vs_duckdb(idx):
    """Field collapsing: groups of `lang` ranked by best doc, 2 reps per
    group, vs a window-function twin."""
    from tangent_ray.query.facets import collapsed_search

    got = collapsed_search(idx, "alpha beta", "lang", k=3, per_group=2)
    con = _duck()
    con.register(
        "documents",
        _tab(),
    )
    want = con.execute(
        f"""
        WITH scores AS (
          SELECT tf.doc_id,
                 sum( ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
                      * tf.tf * ({K1} + 1)
                      / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))
                    ) AS score
          FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id), stats
          WHERE tf.term IN ('alpha', 'beta') GROUP BY 1
        ),
        base AS (
          SELECT s.doc_id, s.score, d.lang AS value
          FROM scores s JOIN documents d USING (doc_id)
          WHERE d.lang IS NOT NULL
        ),
        g AS (
          SELECT *, row_number() OVER (
            PARTITION BY value ORDER BY score DESC, doc_id) AS grank
          FROM base
        ),
        ord AS (
          SELECT value, score AS best,
                 row_number() OVER (ORDER BY score DESC, value) AS vrank
          FROM g WHERE grank = 1 QUALIFY vrank <= 3
        )
        SELECT o.vrank, g.value, g.doc_id, g.score, g.grank
        FROM g JOIN ord o USING (value)
        WHERE g.grank <= 2
        ORDER BY o.vrank, g.grank
        """
    ).fetchall()
    assert [
        (r["rank"], r["value"], r["docid"], round(r["score"], 9),
         r["group_rank"])
        for r in got.to_pylist()
    ] == [(int(v), str(val), int(d), round(float(s), 9), int(g))
          for v, val, d, s, g in want]


def test_collapsed_search_composes_with_extensions(idx):
    from tangent_ray.query.facets import collapsed_search

    # negation flows through: docs with delta never appear
    got = collapsed_search(idx, "alpha -delta", "lang", k=5, per_group=5)
    deltas = {0, 4}  # docs containing delta (see ROWS)
    assert set(got["docid"].to_pylist()).isdisjoint(deltas)
    # bad column raises
    with pytest.raises(KeyError):
        collapsed_search(idx, "alpha", "nosuch", k=2)


def test_actor_pool_batch_all_syntaxes(idx, ray_session):
    """One query batch carrying every extension syntax through the
    map_batches actor pool returns exactly what per-query score_query
    returns — the pool surface and the resident scorer cannot drift."""
    from tangent_ray.query.scorer import search

    queries = [
        "alp*", "{beta,gamma}", "beta^2.5 gamma", "al*a", "b?ta soup",
        "beta #lang:de", "beta #nval>35", "alpha -delta", "beta -alp*",
        "soup {beta|gamma}^2 alp* #lang:en",
        "alpa~1 soup", "beta -alpa~1", "gama~^2 beta",
    ]
    qt = pa.table(
        {
            "query_id": pa.array([f"q{i}" for i in range(len(queries))]),
            "kind": pa.array(["text"] * len(queries)),
            "text": pa.array(queries),
            "topk": pa.array([10] * len(queries), pa.int32()),
        }
    )
    got = search(qt, idx, concurrency=2).to_pandas()
    sc = QueryScorer(idx)
    for i, q in enumerate(queries):
        d, s = sc.score_query(q, "text", 10)
        rows = got[got.query_id == f"q{i}"]
        assert list(rows.docid) == d.tolist(), q
        assert np.allclose(rows.score.to_numpy(), s, rtol=0, atol=0), q


def test_facet_sidecar_incremental_catchup(ray_session, tmp_path):
    """add_increment leaves new partials without facet sidecars (filtered
    queries fail LOUDLY, not stale); re-running build_facet_sidecar
    rebuilds ONLY the missing partials and the filter then sees docs from
    both increments."""
    import dataclasses

    from tangent_ray.index.build import add_increment
    from tangent_ray.query.facets import FacetCounter, build_facet_sidecar

    src1 = str(tmp_path / "d1")
    src2 = str(tmp_path / "d2")
    for src, lo in ((src1, 0), (src2, 100)):
        os.makedirs(src)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(lo, lo + 3), pa.int64()),
                    "text": pa.array(["beta beta"] * 3, pa.string()),
                    "lang": pa.array(["de", "en", "de"], pa.string()),
                }
            ),
            os.path.join(src, "d.parquet"),
        )
    out = str(tmp_path / "idx")
    build_index(src1, out,
                dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    build_facet_sidecar(out, ["lang"])
    add_increment(src2, out)
    # loud failure on the increment's missing sidecar
    with pytest.raises(FileNotFoundError):
        FacetCounter(out)
    import glob

    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(out, "partials", "*", "facets",
                                        "*.parquet"))
    }
    build_facet_sidecar(out, ["lang"])  # incremental catch-up
    for f, mt in before.items():  # untouched partials were NOT rebuilt
        assert os.path.getmtime(f) == mt
    sc = QueryScorer(out)
    d, _ = sc.score_query("beta #lang:de", "text", 100)
    assert set(d.tolist()) == {0, 2, 100, 102}


def test_malformed_cursor_rejected(idx, ray_session):
    from tangent_ray.query.scorer import search

    qt = pa.table(
        {
            "query_id": pa.array(["q"], pa.string()),
            "kind": pa.array(["text"], pa.string()),
            "text": pa.array(["beta"], pa.string()),
            "after_score": pa.array([1.5], pa.float64()),
            "after_docid": pa.array([None], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="malformed search_after cursor"):
        search(qt, idx).take_all()


def test_filter_disables_wand_truncation(idx):
    """With the WAND gates forced open, a filtered query must still fill
    k from BELOW the unfiltered top-k (WAND would have truncated the
    candidate set before the filter cut)."""
    sc = QueryScorer(idx)
    sc.wand_min_postings = 1
    sc.wand_drive_ratio = 0
    # unfiltered top-1 of "alpha beta" is an 'en' doc; ask for de only
    d, s = sc.score_query("alpha beta #lang:de", "text", 10)
    want = [
        (dd, ss) for dd, ss in _engine(idx, "alpha beta")
        if ROWS[dd][2] == "de"
    ]
    assert list(zip(d.tolist(), np.round(s, 9).tolist())) == want
    assert len(want) >= 2  # the second row sits below the unfiltered top-k


def test_sharded_identity(idx):
    """Each single-partial scorer returns its own docs with the SAME
    blended scores as the full reader (global df / expansion via the
    term_stats sidecar), so the sharded union equals the full result."""
    import json

    with open(os.path.join(idx, "manifest.json")) as f:
        partials = json.load(f)["partials"]
    assert len(partials) == 2
    for q in ("alp*", "{beta,gamma}", "soup alp*"):
        full = dict(_engine(idx, q))
        union = {}
        for p in partials:
            sc = QueryScorer(idx, partials=[p])
            d, s = sc.score_query(q, "text", 10)
            for dd, ss in zip(d.tolist(), np.round(s, 9).tolist()):
                assert dd not in union  # partials are disjoint
                union[dd] = ss
        assert union == full


def test_stemmed_synonym_members(ray_session, tmp_path):
    """With stem=True, group members stem like plain terms — {running}
    matches docs that contain 'run'."""
    src = str(tmp_path / "docs")
    os.makedirs(src)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["run fast", "walk slow"], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(src, "d.parquet"))
    out = str(tmp_path / "idx")
    build_index(
        src, out,
        EngineConfig(stem=True, math=False, window=1, eol="none", partitions=1),
        DocumentsCorpus(),
    )
    sc = QueryScorer(out)
    d, _ = sc.score_query("{running,walked}", "text", 10)
    assert set(d.tolist()) == {0, 1}


def test_mlt_vs_duckdb(idx):
    """MLT twin: top max_query_terms by tf*idf from the source doc (tie:
    weight desc, term asc), blended? no — plain per-term BM25 over the
    selection, source doc excluded."""
    con = _duck()
    doc = 0
    sel_terms = [
        r[0]
        for r in con.execute(
            f"""
            SELECT tf.term
            FROM tf JOIN dfx USING (term), stats
            WHERE tf.doc_id = {doc}
            ORDER BY tf.tf * ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
                     DESC, tf.term
            LIMIT 3
            """
        ).fetchall()
    ]
    sc = QueryScorer(idx)
    assert mlt_terms(sc, "alpha beta gamma delta", 3) == sel_terms
    terms_sql = ", ".join(f"'{t}'" for t in sel_terms)
    want = con.execute(
        f"""
        SELECT tf.doc_id,
               sum( ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
                    * tf.tf * ({K1} + 1)
                    / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))
                  ) AS score
        FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id), stats
        WHERE tf.term IN ({terms_sql}) AND tf.doc_id <> {doc}
        GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 5
        """
    ).fetchall()
    got = more_like_this(sc, "alpha beta gamma delta", k=5,
                         max_query_terms=3, exclude_docids=(doc,))
    assert got["docid"].to_pylist() == [int(d) for d, _ in want]
    assert np.allclose(
        got["score"].to_numpy(), [float(s) for _, s in want], atol=1e-9
    )


def test_extensions_ignore_math_spans(idx):
    """$...$ spans are never rewritten: a * or {} inside a formula is
    formula text, not expansion syntax."""
    sc = QueryScorer(idx)
    clean, groups, filters = sc._split_extensions("alpha $[V!x*]$ bet*")
    assert "$[V!x*]$" in clean
    assert groups == [(("beta",), 1.0)]  # bet* expanded; x* untouched
    assert filters == []


def test_boosted_term_vs_duckdb(idx):
    """term^2.5 multiplies that term's contribution; other terms keep
    their plain scores (sum of the two parts)."""
    con = _duck()
    boosted = {
        d: 2.5 * s
        for d, s in _sqlrows(
            con, _GROUP_SQL.format(sel="SELECT 'beta' AS term", k1=K1, b=B)
        )
    }
    plain = dict(
        _sqlrows(
            con, _GROUP_SQL.format(sel="SELECT 'gamma' AS term", k1=K1, b=B)
        )
    )
    want = {
        d: round(boosted.get(d, 0.0) + plain.get(d, 0.0), 6)
        for d in set(boosted) | set(plain)
    }
    got = {d: round(s, 6) for d, s in _engine(idx, "beta^2.5 gamma")}
    assert got == want


def test_boosted_group_and_prefix(idx):
    """{a,b}^2 and pre*^2 scale the blended group score by 2 (up to fp
    association: the boost multiplies idf BEFORE the tf kernel)."""
    for base_q, boost_q in (("{beta,gamma}", "{beta,gamma}^2"),
                            ("alp*", "alp*^2")):
        base = dict(_engine(idx, base_q))
        got = dict(_engine(idx, boost_q))
        assert set(got) == set(base)
        for d, s in base.items():
            assert np.isclose(got[d], 2 * s, rtol=1e-12)


def test_boost_one_is_identity(idx):
    assert _engine(idx, "beta^1 gamma") == _engine(idx, "{beta} gamma")


def test_wildcard_patterns_vs_duckdb(idx):
    """Glob tokens: te*m / t?st / *ing (leading star) expand like prefix
    queries but via fnmatch; SQL twin uses LIKE with % and _."""
    con = _duck()
    # NOTE: a lone TRAILING ? is punctuation by design (see the
    # dedicated test), so the single-char wildcard case uses a mid-token ?
    for pat, like in (("al*a", "al%a"), ("a?pha", "a_pha"),
                      ("*lpine", "%lpine"), ("a*p*", "a%p%")):
        sel = (f"SELECT term FROM dfx WHERE term LIKE '{like}' "
               "ORDER BY df DESC, term")
        want = _sqlrows(_duck(), _GROUP_SQL.format(sel=sel, k1=K1, b=B))
        assert _engine(idx, pat) == want, pat


def test_wildcard_expansion_rule(idx):
    sc = QueryScorer(idx)
    assert sc.reader.expand_wildcard("al*a", 10) == ["alpha"]
    assert sc.reader.expand_wildcard("*lpine", 10) == ["alpine"]
    assert sc.reader.expand_wildcard("a?pha", 10) == ["alpha"]
    assert sc.reader.expand_wildcard("zz*", 10) == []
    # cap applies after the (df desc, term asc) rank, same as prefix
    assert sc.reader.expand_wildcard("al*", 2) == sc.reader.expand_prefix(
        "al", 2
    )


def test_lone_trailing_question_mark_is_punctuation(idx):
    # "beta?" means the word beta, not a 5-char wildcard
    assert _engine(idx, "beta?") == _engine(idx, "beta")
    assert _engine(idx, "beta?^2") == _engine(idx, "beta^2")
    # "bet?" is ALSO a lone trailing ? -> plain term "bet" (absent) -> []
    assert _engine(idx, "bet?") == []
    # in-query single-char wildcards need a non-trailing ? (or a *)
    assert _engine(idx, "b?ta") == _engine(idx, "{beta}")
    sc = QueryScorer(idx)
    assert sc.reader.expand_wildcard("bet?", 10) == ["beta"]


def test_complete_vs_duckdb(idx):
    sc = QueryScorer(idx)
    got = sc.reader.complete("alp", n=2)
    want = _duck().execute(
        "SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks "
        "WHERE term LIKE 'alp%' GROUP BY 1 "
        "ORDER BY df DESC, term LIMIT 2"
    ).fetchall()
    assert list(zip(got["term"].to_pylist(), got["df"].to_pylist())) == [
        (t, int(d)) for t, d in want
    ]
    assert sc.reader.complete("zzz").num_rows == 0


def test_extensions_skip_namespaced_mathml(idx):
    """<m:math ...> (namespace-prefixed MathML) must bypass extension
    rewriting entirely, mirroring _split_negations' ':math' guard — a *
    or ^ inside the markup is formula text, not expansion syntax."""
    sc = QueryScorer(idx)
    q = ('<m:math xmlns:m="http://www.w3.org/1998/Math/MathML">'
         "<m:msup><m:mi>x</m:mi><m:mn>2</m:mn></m:msup></m:math> a*b")
    clean, groups, filters = sc._split_extensions(q)
    assert clean == q
    assert groups == [] and filters == []
