"""Round-3 driver-gate layout: the 50-slot budget, twin coverage, and the
merged-entry twins on edge-case fixtures the real corpus cannot exercise
(empty docs, zero-word docs, cross-doc duplicate paragraphs)."""

import duckdb
import numpy as np
import pyarrow as pa

from tangent_ray.pipelines.entry_queries import (
    ORACLE_SQL,
    QUERIES,
    doc_signals_batch,
)

# entries whose results are engine-internal (math tuples, golden replay,
# flagship index) — rows-only at the gate, python-oracle'd in pytest
ROWS_ONLY = {
    "transcript_bm25",
    "transcript_rerank",
    "index_verify",
    "math_corpus_stats",
    "golden_replay",
    "formula_topk",
}


def test_gate_layout():
    # the driver grades at most 50 entries; every slot must be used and
    # every SQL twin must belong to a live entry
    assert len(QUERIES) == 50
    assert set(ORACLE_SQL) <= set(QUERIES)
    assert set(QUERIES) - set(ORACLE_SQL) == ROWS_ONLY


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


EDGE_DOCS = [
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "",  # empty doc: zero words, zero lines
    "!!! ... ###",  # punctuation only: zero words, nonzero chars
    "aa bb\naa bb\ncc",  # duplicate lines
    "x y x y x y",  # dominant 2-gram
    "para one\n\npara two\n\npara one",  # intra-doc duplicate paragraph
]


def test_doc_signals_twin_edge_cases():
    tbl = _docs(EDGE_DOCS)
    got = doc_signals_batch(tbl)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(ORACLE_SQL["doc_signals"]).arrow()
    assert got.num_rows == want.num_rows
    w = {r["doc_id"]: r for r in want.to_pylist()}
    for r in got.to_pylist():
        exp = w[r["doc_id"]]
        for c in got.column_names:
            assert r[c] == exp[c], (r["doc_id"], c, r[c], exp[c])


def test_gopher_and_c4_twin_edge_cases():
    tbl = _docs(EDGE_DOCS)
    con = duckdb.connect()
    con.register("documents", tbl)

    from tangent_ray.ops.curation import c4_filter_batch
    from tangent_ray.ops.textstats import gopher_filter_batch

    got = gopher_filter_batch(tbl)
    want = con.execute(ORACLE_SQL["gopher_quality"]).arrow()
    w = {r["doc_id"]: r for r in want.to_pylist()}
    for r in got.select(["doc_id", "n_words", "fail_mask", "keep"]).to_pylist():
        exp = w[r["doc_id"]]
        assert r == exp, (r, exp)

    got = c4_filter_batch(tbl)
    want = con.execute(ORACLE_SQL["c4_clean"]).arrow()
    w = {r["doc_id"]: r for r in want.to_pylist()}
    cols = ["doc_id", "text", "n_kept_lines", "n_dropped_lines", "keep"]
    for r in got.select(cols).to_pylist():
        exp = w[r["doc_id"]]
        assert r == exp, (r, exp)


def test_paragraph_cuts_twin_edge_cases(ray_session):
    import ray.data

    from tangent_ray.ops.dedup import apply_paragraph_cuts, paragraph_dedup

    docs = [
        "shared para\n\nunique one",
        "shared para\n\nunique two",  # cross-doc duplicate: cut here
        "",  # empty doc passes through
        "a\n\n\n\nb",  # empty split between paragraphs is preserved
        "no paragraphs here",
    ]
    tbl = _docs(docs)
    ds = ray.data.from_arrow(tbl)
    out = apply_paragraph_cuts(ds, paragraph_dedup(ds))
    import ray

    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    got = pa.concat_tables(
        [t.select(["doc_id", "text", "n_cut_paras"]) for t in tabs]
    ).to_pylist()
    con = duckdb.connect()
    con.register("documents", tbl)
    want = {
        r["doc_id"]: r
        for r in con.execute(ORACLE_SQL["paragraph_cuts"]).arrow().to_pylist()
    }
    assert len(got) == len(want)
    for r in got:
        exp = want[r["doc_id"]]
        assert int(r["n_cut_paras"]) == exp["n_cut_paras"], (r, exp)
        assert r["text"] == exp["text"], (r, exp)


def test_rows_only_entries_content_hash_pins(ray_session):
    """The two no_oracle gate entries carry a content_hash column whose
    whole-result digest is pinned here: a scoring perturbation that keeps
    row counts stable now fails THIS test (and flips any row hashing the
    driver does) instead of passing silently.

    Repinning is legitimate only for a deliberate, explained semantic
    change — update the constant in the same commit as the change."""
    import hashlib

    from tangent_ray.pipelines.entry_queries import (
        q_formula_topk,
        q_golden_replay,
    )

    def digest(t):
        return hashlib.blake2b(
            "|".join(
                str(h) for h in sorted(t["content_hash"].to_pylist())
            ).encode(),
            digest_size=8,
        ).hexdigest()

    g = q_golden_replay("/root/testdata/sf0.001")
    assert g.num_rows == 16
    assert digest(g) == "ac008101a51f2a9f"
    f = q_formula_topk("/root/testdata/sf0.001")
    assert f.num_rows == 16
    assert digest(f) == "b148fd36d13ca0f2"
