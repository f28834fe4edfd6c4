"""Resumable partitioned sink (sources/sink.write_resumable): skip-on-
match, rebuild-on-stale-input, rebuild-on-pipeline-change, atomicity."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tangent_ray.sources.sink import MANIFEST, write_resumable


@pytest.fixture()
def corpus_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    for f in range(4):
        ids = np.arange(f * 100, (f + 1) * 100, dtype=np.int64)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array([f"doc {i} body." for i in ids]),
                }
            ),
            str(d / f"part-{f}.parquet"),
        )
    return str(d)


def _read_all(out_dir):
    tabs = []
    for p in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, p)
        if not os.path.isdir(pdir):
            continue
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                tabs.append(pq.read_table(os.path.join(pdir, f)))
    t = pa.concat_tables(tabs)
    return t.take(
        pa.array(np.argsort(t["doc_id"].to_numpy(zero_copy_only=False)))
    )


def _pipeline(ds):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda b: b.append_column(
            "n_chars", pc.cast(pc.utf8_length(b["text"]), pa.int64())
        ),
        batch_format="pyarrow",
    )


def test_write_skip_and_stale_rebuild(ray_session, corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    r1 = write_resumable(_pipeline, corpus_dir, out, partitions=3)
    assert r1["skipped"] == [] and len(r1["written"]) == 3
    assert r1["rows"] == 400
    t1 = _read_all(out)
    assert t1.num_rows == 400 and "n_chars" in t1.column_names

    # identical re-run: everything skips, bytes untouched
    mtimes = {
        p: os.stat(os.path.join(out, p, MANIFEST)).st_mtime_ns
        for p in r1["written"]
    }
    r2 = write_resumable(_pipeline, corpus_dir, out, partitions=3)
    assert r2["written"] == [] and len(r2["skipped"]) == 3
    assert r2["rows"] == 400
    for p, m in mtimes.items():
        assert os.stat(os.path.join(out, p, MANIFEST)).st_mtime_ns == m

    # touch ONE input file: only partitions containing it rebuild
    victim = sorted(os.listdir(corpus_dir))[0]
    os.utime(os.path.join(corpus_dir, victim), ns=(1, 1))
    r3 = write_resumable(_pipeline, corpus_dir, out, partitions=3)
    assert len(r3["written"]) == 1 and len(r3["skipped"]) == 2
    assert _read_all(out).to_pydict() == t1.to_pydict()

    # pipeline tag change rebuilds everything
    r4 = write_resumable(_pipeline, corpus_dir, out, partitions=3, tag="v2")
    assert len(r4["written"]) == 3


def test_crashed_partition_resumes(ray_session, corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    write_resumable(_pipeline, corpus_dir, out, partitions=4)
    # simulate a crash: one partition vanishes, another is a half-written tmp
    shutil.rmtree(os.path.join(out, "part-0002"))
    os.makedirs(os.path.join(out, "part-0001.tmp"))
    r = write_resumable(_pipeline, corpus_dir, out, partitions=4)
    assert "part-0002" in r["written"]
    assert "part-0001" in r["skipped"]  # intact partition untouched
    assert not os.path.exists(os.path.join(out, "part-0001.tmp"))
    assert _read_all(out).num_rows == 400


def test_corrupt_manifest_rebuilds(ray_session, corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    write_resumable(_pipeline, corpus_dir, out, partitions=2)
    with open(os.path.join(out, "part-0000", MANIFEST), "w") as f:
        f.write("not json")
    r = write_resumable(_pipeline, corpus_dir, out, partitions=2)
    assert r["written"] == ["part-0000"]
    m = json.load(open(os.path.join(out, "part-0000", MANIFEST)))
    assert m["rows"] == 200


def test_manifestless_partition_dir_recovers(ray_session, corpus_dir, tmp_path):
    """A crash between manifest unlink and rmtree (or an operator deleting
    the manifest to force a rebuild) must not wedge the sink."""
    out = str(tmp_path / "out")
    write_resumable(_pipeline, corpus_dir, out, partitions=2)
    os.remove(os.path.join(out, "part-0001", MANIFEST))
    r = write_resumable(_pipeline, corpus_dir, out, partitions=2)
    assert r["written"] == ["part-0001"]
    assert _read_all(out).num_rows == 400


def test_orphan_partitions_removed(ray_session, corpus_dir, tmp_path):
    """Re-running with fewer partitions removes the stale extras so
    out_dir/*/*.parquet never double-counts."""
    out = str(tmp_path / "out")
    write_resumable(_pipeline, corpus_dir, out, partitions=4)
    r = write_resumable(_pipeline, corpus_dir, out, partitions=2)
    assert set(r["removed"]) == {"part-0002", "part-0003"}
    assert sorted(
        p for p in os.listdir(out) if os.path.isdir(os.path.join(out, p))
    ) == ["part-0000", "part-0001"]
    assert _read_all(out).num_rows == 400


def test_empty_input_raises(ray_session, tmp_path):
    d = tmp_path / "none"
    d.mkdir()
    with pytest.raises(ValueError, match="no parquet"):
        write_resumable(_pipeline, str(d), str(tmp_path / "o"))
