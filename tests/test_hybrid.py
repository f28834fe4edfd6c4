"""RRF hybrid retrieval: fusion math vs a pure-Python oracle, end-to-end
BM25+ANN fusion vs a DuckDB twin (ranks from the same BM25/cosine SQL),
and edge cases (one empty leg, disjoint legs, tie-breaking)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.config import SQL_PARITY_CONFIG
from tangent_ray.index.build import build_index
from tangent_ray.query.hybrid import hybrid_search, rrf_fuse
from tangent_ray.query.scorer import QueryScorer
from tangent_ray.sources.corpus import DocumentsCorpus

DOCS = [
    "alpha beta gamma",
    "alpha gamma gamma beta",
    "beta delta",
    "alpha alpha",
    "gamma beta alpha delta",
    "epsilon zeta",
]
DIM = 8


def _vecs():
    rng = np.random.RandomState(11)
    m = rng.standard_normal((len(DOCS), DIM))
    m[1] = m[5] * 0.9 + 0.1 * rng.standard_normal(DIM)  # planted neighbor
    return m


def _python_rrf(legs, k, c=60):
    agg: dict[int, float] = {}
    for leg in legs:
        for i, x in enumerate(leg):
            agg[x] = agg.get(x, 0.0) + 1.0 / (c + i + 1)
    rows = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [int(d) for d, _ in rows], [s for _, s in rows]


def test_rrf_fuse_matches_python_oracle():
    legs = [[3, 1, 4, 1_000], [4, 3, 9], [], [9]]
    ids, scores = rrf_fuse([np.array(x, np.int64) for x in legs], k=10)
    want_ids, want_scores = _python_rrf(legs, 10)
    assert ids.tolist() == want_ids
    assert np.allclose(scores, want_scores, rtol=0, atol=1e-15)


def test_rrf_tie_breaks_by_id():
    # two ids with identical rank profiles -> id asc
    ids, _ = rrf_fuse([np.array([7, 2], np.int64),
                       np.array([2, 7], np.int64)], k=2)
    assert ids.tolist() == [2, 7]


def test_rrf_empty():
    ids, scores = rrf_fuse([], k=5)
    assert len(ids) == 0 and len(scores) == 0
    ids, _ = rrf_fuse([np.empty(0, np.int64)], k=5)
    assert len(ids) == 0


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import dataclasses

    root = tmp_path_factory.mktemp("hybrid")
    src = str(root / "docs")
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        ),
        os.path.join(src, "d.parquet"),
    )
    emb = str(root / "emb.parquet")
    m = _vecs()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(DOCS)), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in m],
                    type=pa.list_(pa.float32()),
                ),
            }
        ),
        emb,
    )
    out = str(root / "idx")
    build_index(src, out, dataclasses.replace(SQL_PARITY_CONFIG, partitions=2),
                DocumentsCorpus())
    return out, emb


def test_hybrid_vs_duckdb(setup, ray_session):
    import ray.data

    idx, emb = setup
    qvec = _vecs()[5]
    sc = QueryScorer(idx)
    got = hybrid_search(
        sc, "alpha beta", ray.data.read_parquet(emb), qvec, k=4, depth=3,
        ann="brute",  # the DuckDB twin ranks the ANN leg by exact cosine
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        ),
    )
    con.register("embeddings", pq.read_table(emb))
    qlist = ", ".join(f"{x!r}" for x in qvec.astype(np.float64).tolist())
    want = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(text),
                 '[^a-z0-9]+')) AS term FROM documents
        ),
        tf AS (SELECT term, doc_id, count(*)::DOUBLE AS tf FROM toks
               WHERE term <> '' GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks
               WHERE term <> '' GROUP BY 1),
        stats AS (
          SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                 (SELECT sum(dl) FROM dl) / (SELECT count(*) FROM documents)
                   AS avgdl
        ),
        dfx AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
        bm25 AS (
          SELECT tf.doc_id,
                 sum( ln(1 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                    ) AS score
          FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id), stats
          WHERE tf.term IN ('alpha', 'beta') GROUP BY 1
        ),
        lega AS (
          SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
          FROM bm25 QUALIFY r <= 3
        ),
        legb AS (
          SELECT vec_id AS doc_id,
                 row_number() OVER (
                   ORDER BY list_cosine_similarity(embedding::DOUBLE[],
                                                   [{qlist}]) DESC, vec_id
                 ) AS r
          FROM embeddings QUALIFY r <= 3
        )
        SELECT doc_id, sum(1.0 / (60 + r)) AS score
        FROM (SELECT * FROM lega UNION ALL SELECT * FROM legb)
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 4
        """
    ).fetchall()
    assert got["docid"].to_pylist() == [int(d) for d, _ in want]
    assert np.allclose(
        got["rrf_score"].to_numpy(), [float(s) for _, s in want], atol=1e-15
    )
    # leg-rank provenance columns are consistent
    for r in got.to_pylist():
        assert r["bm25_rank"] > 0 or r["ann_rank"] > 0


def test_hybrid_empty_text_leg(setup, ray_session):
    import ray.data

    idx, emb = setup
    sc = QueryScorer(idx)
    got = hybrid_search(
        sc, "nosuchword", ray.data.read_parquet(emb), _vecs()[5], k=3,
        depth=3, ann="brute",
    )
    # pure-ANN fallback: ids are the ANN top-3 in order
    assert got.num_rows == 3
    assert all(r == 0 for r in got["bm25_rank"].to_pylist())
    assert got["ann_rank"].to_pylist() == [1, 2, 3]


def test_ivf_leg_full_probe_matches_brute(setup, ray_session):
    """With nprobe >= nlist every cluster is probed, so the IVF leg scores
    every vector — the default leg must then fuse identically to brute."""
    import ray.data

    idx, emb = setup
    sc = QueryScorer(idx)
    kw = dict(k=4, depth=3)
    want = hybrid_search(
        sc, "alpha beta", ray.data.read_parquet(emb), _vecs()[5],
        ann="brute", **kw,
    )
    got = hybrid_search(
        sc, "alpha beta", ray.data.read_parquet(emb), _vecs()[5],
        ann="ivf", nlist=4, nprobe=4, **kw,
    )
    assert got.equals(want)


def test_hybrid_batch_matches_per_query(setup, ray_session):
    """hybrid_search_batch (one shared ANN job) returns per-query tables
    identical to N separate hybrid_search calls with the same legs."""
    import ray.data

    from tangent_ray.query.hybrid import hybrid_search_batch

    idx, emb = setup
    sc = QueryScorer(idx)
    texts = ["alpha beta", "gamma", "alpha"]
    vecs = np.stack([_vecs()[1], _vecs()[5], _vecs()[3]])
    from tangent_ray.ops.ann import ivf_centroids

    cents = ivf_centroids(ray.data.read_parquet(emb), nlist=4)
    batched = hybrid_search_batch(
        sc, texts, vecs, ray.data.read_parquet(emb), k=4, depth=3,
        ann="ivf", centroids=cents, nprobe=2,
    )
    for qi, (t, v) in enumerate(zip(texts, vecs)):
        one = hybrid_search(
            sc, t, ray.data.read_parquet(emb), v, k=4, depth=3,
            ann="ivf", centroids=cents, nprobe=2,
        )
        import pyarrow.compute as pc

        part = batched.filter(pc.equal(batched["qid"], qi)).drop_columns(
            ["qid"]
        )
        assert part.equals(one), (qi, t)


def test_ivf_recall_on_clustered_corpus(ray_session, tmp_path):
    """IVF leg recall@k >= 0.9 vs brute force on a corpus with real cluster
    structure (queries drawn near cluster centers — the regime IVF is
    designed for)."""
    import ray.data

    from tangent_ray.ops.ann import ivf_centroids, ivf_knn, knn_cosine

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16)) * 4
    vecs = np.concatenate(
        [c + rng.standard_normal((60, 16)) for c in centers]
    )
    tab = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [r for r in vecs.astype(np.float64)],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    ds = ray.data.from_arrow(tab).repartition(4)
    queries = centers + rng.standard_normal(centers.shape) * 0.3
    cents = ivf_centroids(ds, nlist=8, iters=2)
    import ray as _r

    def ranked(out):
        t = pa.concat_tables(
            [x for x in _r.get(out.to_arrow_refs()) if x.num_rows]
        )
        got = {}
        qs = t["qid"].to_pylist()
        ids = t["vec_id"].to_pylist()
        for q, i in zip(qs, ids):
            got.setdefault(q, set()).add(i)
        return got

    exact = ranked(knn_cosine(ds, queries, k=10))
    approx = ranked(ivf_knn(ds, queries, k=10, nlist=8, nprobe=3,
                            centroids=cents))
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert float(np.mean(recalls)) >= 0.9, recalls


def test_hybrid_with_resident_ivf_reader(setup, ray_session, tmp_path):
    """ann=IVFReader (the resident serving leg, no Dataset job) fuses
    identically to the brute leg when every cluster is probed."""
    import ray.data

    from tangent_ray.ops.ann import IVFReader, build_ivf_index

    idx, emb = setup
    sc = QueryScorer(idx)
    out = str(tmp_path / "ivf")
    build_ivf_index(ray.data.read_parquet(emb), out, nlist=3, iters=1)
    reader = IVFReader(out)
    want = hybrid_search(
        sc, "alpha beta", ray.data.read_parquet(emb), _vecs()[5],
        ann="brute", k=4, depth=3,
    )
    got = hybrid_search(
        sc, "alpha beta", ray.data.read_parquet(emb), _vecs()[5],
        ann=reader, nprobe=3, k=4, depth=3,
    )
    assert got.equals(want)
