"""Hashed NB quality classifier + DSIR resampling (ops/classify.py) vs
exact DuckDB twins over the real sf0.001 documents table.

Everything is fixed-point (round(ln(·)·1e6) int64), so per-doc scores are
integer sums and the comparison is exact equality, not approx."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.ops.classify import (
    dsir_sample,
    dsir_twin_sql,
    nb_score,
    nb_train,
    nb_twin_sql,
)

SF_DIR = "/root/testdata/sf0.001"
D = 4096  # small enough to force bucket collisions

# the twins are the SHARED templates from ops/classify.py (the gate's
# model_curation twin wraps the same strings at the production D)
NB_SQL = nb_twin_sql(D)


def DSIR_SQL(k):
    return dsir_twin_sql(D, k)


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


def _twin(tbl: pa.Table, sql: str) -> pa.Table:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(sql).arrow()


def _labeled_ds(tbl: pa.Table):
    import ray.data

    lab = pa.compute.equal(tbl["lang"], "en")
    t = tbl.append_column("label", lab)
    return ray.data.from_arrow(t).repartition(4)


def _canon(t: pa.Table):
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def test_nb_matches_twin(ray_session, docs):
    import pandas as pd

    ds = _labeled_ds(docs)
    model = nb_train(ds, d=D)
    got = pa.concat_tables(
        [t for t in _refs(nb_score(ds, model)) if t.num_rows]
    )
    want = _twin(docs, NB_SQL)
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_nb_separates_planted_classes(ray_session):
    """Behavioral check on a corpus where the label IS text-predictive
    (the sf tables' lang column barely correlates with text, so the
    real-corpus test above only proves twin equality)."""
    import ray.data

    good = [f"insightful prose essay chapter figure w{i % 7}" for i in range(60)]
    spam = [f"click winner prize free casino w{i % 7}" for i in range(60)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(120), type=pa.int64()),
            "text": pa.array(good + spam),
            "label": pa.array([True] * 60 + [False] * 60),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    model = nb_train(ds, d=D)
    got = pa.concat_tables(
        [x for x in _refs(nb_score(ds, model)) if x.num_rows]
    ).to_pylist()
    preds = {r["doc_id"]: r["pred"] for r in got}
    assert all(preds[i] for i in range(60))
    assert not any(preds[i] for i in range(60, 120))


def _refs(ds):
    import ray

    return ray.get(ds.to_arrow_refs())


def test_dsir_matches_twin(ray_session, docs):
    import pandas as pd

    k = 40
    ds = _labeled_ds(docs)
    got = pa.concat_tables(
        [t for t in _refs(dsir_sample(ds, k=k, d=D)) if t.num_rows]
    )
    want = _twin(docs, DSIR_SQL(k))
    assert got.num_rows == k
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    # importance resampling is target-seeking: the selected set is
    # en-enriched vs the base rate
    lang = {d: la for d, la in zip(docs["doc_id"].to_pylist(),
                                   docs["lang"].to_pylist())}
    sel_en = np.mean([lang[r] == "en" for r in got["doc_id"].to_pylist()])
    base_en = np.mean([v == "en" for v in lang.values()])
    assert sel_en > base_en


def test_nb_model_bounded_with_smoothing_default(ray_session, docs):
    from tangent_ray.ops.classify import _log_e6

    ds = _labeled_ds(docs)
    model = nb_train(ds, d=D)
    assert model.lr_e6.shape == (D,) and model.lr_e6.dtype == np.int64
    # an unseen bucket carries the add-one default, not zero
    from tangent_ray.ops.classify import label_bucket_counts

    rows = [r for r in label_bucket_counts(ds, d=D).to_pylist()
            if r["bucket"] >= 0]  # drop the doc-count sentinel (bucket -1)
    seen = {r["bucket"] for r in rows}
    unseen = next(b for b in range(D) if b not in seen)
    n1 = sum(r["c_pos"] for r in rows)
    n0 = sum(r["c_neg"] for r in rows)
    want = (_log_e6(np.array([1.0]), n1 + float(D))
            - _log_e6(np.array([1.0]), n0 + float(D)))[0]
    assert model.lr_e6[unseen] == want and want != 0
