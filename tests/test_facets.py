"""Faceted search: candidate-set facet counts vs a DuckDB corpus twin,
null buckets, negation interaction, sharded-subset counters, and the
sidecar build over the real multi-partial index layout."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG
from tangent_ray.index.build import build_index
from tangent_ray.query.facets import FacetCounter, build_facet_sidecar, facet_counts
from tangent_ray.sources.corpus import DocumentsCorpus

ROWS = [
    (0, "alpha beta", "en", "web"),
    (1, "alpha gamma", "en", "books"),
    (2, "beta beta beta", "de", "web"),
    (3, "alpha alpha", "de", None),          # null facet bucket
    (4, "gamma delta", "fr", "web"),
    (5, "alpha beta gamma", "en", "web"),
    (6, "unrelated words only", "en", "books"),
]


def _tab():
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "text": pa.array([r[1] for r in ROWS], pa.string()),
            "lang": pa.array([r[2] for r in ROWS], pa.string()),
            "source": pa.array([r[3] for r in ROWS], pa.string()),
        }
    )


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    import dataclasses

    root = tmp_path_factory.mktemp("facets")
    src = str(root / "docs")
    os.makedirs(src)
    t = _tab()
    # two files -> two partials: exercises the per-partial sidecar merge
    pq.write_table(t.slice(0, 4), os.path.join(src, "a.parquet"))
    pq.write_table(t.slice(4), os.path.join(src, "b.parquet"))
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=2),
                DocumentsCorpus())
    dirs = build_facet_sidecar(out, ["lang", "source"])
    assert len(dirs) == 2
    return out


def _duck(query_terms, col):
    con = duckdb.connect()
    con.register("docs", _tab())
    terms = ", ".join(f"'{t}'" for t in query_terms)
    got = con.execute(
        f"""
        WITH cand AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id, unnest(string_split_regex(lower(text),
                   '[^a-z0-9]+')) AS tok FROM docs
          ) WHERE tok IN ({terms})
        )
        SELECT d.{col} AS value, count(*)::BIGINT AS n_docs
        FROM docs d JOIN cand USING (doc_id)
        GROUP BY 1 ORDER BY 2 DESC, coalesce(1, NULL), coalesce({col}, '')
        """
    ).fetchall()
    return [(v, int(n)) for v, n in got]


def _rows(t: pa.Table):
    return list(zip(t["value"].to_pylist(), t["n_docs"].to_pylist()))


def test_counts_match_duckdb(idx):
    for q, terms in (("alpha", ["alpha"]), ("alpha beta", ["alpha", "beta"]),
                     ("gamma", ["gamma"])):
        for col in ("lang", "source"):
            got = _rows(facet_counts(idx, q, col))
            assert got == _duck(terms, col), (q, col)


def test_null_bucket(idx):
    got = dict(_rows(facet_counts(idx, "alpha", "source")))
    # doc 3 has a NULL source and matches 'alpha'
    assert got[None] == 1


def test_negation_respected(idx):
    got = dict(_rows(facet_counts(idx, "alpha -beta", "lang")))
    # candidates: docs with alpha minus docs with beta -> {1, 3}
    assert got == {"en": 1, "de": 1}


def test_no_match_and_counter_reuse(idx):
    counter = FacetCounter(idx)
    assert _rows(facet_counts(idx, "zzznotaword", "lang", counter=counter)) == []
    # direct candidate counting, subset reader
    import json

    with open(os.path.join(idx, "manifest.json")) as f:
        partials = json.load(f)["partials"]
    sub = FacetCounter(idx, partials=partials[:1])
    full = counter.counts(np.array([0, 1, 2, 3, 4, 5]), "lang")
    part = sub.counts(np.array([0, 1, 2, 3, 4, 5]), "lang")
    assert sum(part["n_docs"].to_pylist()) <= sum(full["n_docs"].to_pylist())
    assert sum(full["n_docs"].to_pylist()) == 6


def test_missing_sidecar_raises(ray_session, tmp_path):
    import dataclasses

    src = str(tmp_path / "docs")
    os.makedirs(src)
    pq.write_table(_tab(), os.path.join(src, "d.parquet"))
    out = str(tmp_path / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    with pytest.raises(FileNotFoundError):
        FacetCounter(out)


def test_numeric_sidecar_column(ray_session, tmp_path):
    """A sidecar holding a NUMERIC column (external/legacy build — ours
    stringifies at build time) must still filter (#n_chars:10) and
    collapse: mask/values_of compare on the cast-to-string view exactly
    like the SQL twin's ::VARCHAR."""
    import dataclasses
    import json

    src = str(tmp_path / "docs")
    os.makedirs(src)
    t = _tab().append_column(
        "n_chars", pa.array([len(r[1]) for r in ROWS], pa.int64())
    )
    pq.write_table(t, os.path.join(src, "d.parquet"))
    out = str(tmp_path / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=1),
                DocumentsCorpus())
    build_facet_sidecar(out, ["n_chars"])
    # rewrite the sidecar with the raw int64 column (the legacy layout)
    with open(os.path.join(out, "manifest.json")) as f:
        partials = json.load(f)["partials"]
    for p in partials:
        d = os.path.join(out, "partials", p, "facets")
        side = pq.read_table(d)
        import pyarrow.compute as pc

        fixed = side.set_column(
            side.schema.get_field_index("n_chars"), "n_chars",
            pc.cast(side["n_chars"], pa.int64()),
        )
        for fn in os.listdir(d):
            os.remove(os.path.join(d, fn))
        pq.write_table(fixed, os.path.join(d, "part.parquet"))
    counter = FacetCounter(out)
    docids = np.array([r[0] for r in ROWS], dtype=np.int64)
    want_len = len(ROWS[0][1])  # doc 0's text length
    mask = counter.mask(docids, "n_chars", str(want_len), op=":")
    assert mask.tolist() == [len(r[1]) == want_len for r in ROWS]
    # range op keeps working on the numeric column
    ge = counter.mask(docids, "n_chars", "12", op=">=")
    assert ge.tolist() == [len(r[1]) >= 12 for r in ROWS]
    # values_of stringifies, so collapsed_search groups on "10"/"11"/...
    vals = counter.values_of(docids, "n_chars")
    assert vals == [str(len(r[1])) for r in ROWS]
    from tangent_ray.query.facets import collapsed_search

    got = collapsed_search(out, "alpha", "n_chars", k=3)
    assert got.num_rows > 0
    assert all(v.isdigit() for v in got["value"].to_pylist())
