"""The ray-job-submit entrypoint (tools/build_job.py) end-to-end.

Runs the real CLI in a subprocess (it owns its Ray session) against the
driver's sf0.001 documents table: build, resume (skip finished
partitions), and the one-line JSON summary contract.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "tools", "build_job.py")
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run(*args):
    out = subprocess.run(
        [sys.executable, JOB, *args],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # last stdout line is the JSON summary
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_build_job_build_and_resume(tmp_path):
    if not os.path.exists(DOCS):
        import pytest

        pytest.skip("driver testdata absent")
    idx = str(tmp_path / "idx")
    s1 = _run("--input", DOCS, "--out", idx, "--corpus", "documents",
              "--partitions", "2")
    assert s1["n_docs"] == 500 and s1["partials"] >= 1
    assert s1["metrics"]["partitions_with_metrics"] == s1["partials"]
    assert s1["metrics"]["partition_build_seconds_sum"] > 0

    # resume: finished partitions are skipped, so the rebuild is fast and
    # reports the SAME totals
    s2 = _run("--input", DOCS, "--out", idx, "--corpus", "documents",
              "--partitions", "2")
    assert s2["n_docs"] == s1["n_docs"]
    assert s2["build_wall_sec"] < s1["build_wall_sec"]


def test_custom_column_corpus_roundtrip(ray_session, tmp_path):
    # the corpus spec shipped to workers/manifests must carry the custom
    # column names (a bare kind string reset them to defaults and crashed)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tangent_ray.config import SQL_PARITY_CONFIG
    from tangent_ray.index.build import build_index
    from tangent_ray.query.scorer import QueryScorer
    from tangent_ray.sources.corpus import DocumentsCorpus, corpus_from_json, corpus_spec

    c = DocumentsCorpus(id_column="id", text_column="body")
    assert corpus_from_json(corpus_spec(c)) == c
    assert corpus_from_json("documents") == DocumentsCorpus()  # legacy

    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2, 3], type=pa.int64()),
                "body": pa.array(["alpha beta", "beta gamma", "gamma delta"]),
            }
        ),
        src,
    )
    out = str(tmp_path / "idx")
    build_index(str(src), out, SQL_PARITY_CONFIG, c)
    docs, _scores = QueryScorer(out).score_query("beta", "text", 10)
    assert sorted(docs.tolist()) == [1, 2]
