"""Corpus ingestion (sources/ingest.py): file-per-document doclists and
JSONL shards -> the canonical (doc_id, dockey, text) layout. Unit-level
twins of the CLI e2e cases in test_cli.py: key determinism, id-type
rules, and loud failures on malformed inputs."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from tangent_ray.docids import dockeys_to_docids
from tangent_ray.sources.ingest import (
    ingest_corpus,
    read_file_corpus,
    read_jsonl_corpus,
)


def _collect(ds) -> pa.Table:
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs)


def _write_files(root, docs: dict[str, str]) -> str:
    src = os.path.join(str(root), "docs")
    for rel, text in docs.items():
        p = os.path.join(src, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w", encoding="utf-8") as f:
            f.write(text)
    return src


def test_file_corpus_dir_and_doclist(ray_session, tmp_path):
    docs = {"a/one.txt": "alpha beta", "b/two.txt": "gamma", "three.txt": ""}
    src = _write_files(tmp_path, docs)
    tab = _collect(read_file_corpus(src)).sort_by("dockey")
    assert tab["dockey"].to_pylist() == sorted(docs)
    assert tab["text"].to_pylist() == [docs[k] for k in sorted(docs)]
    # doc_id is blake2b(dockey) — the repo's docid rule, deterministic
    assert tab["doc_id"].to_pylist() == list(
        dockeys_to_docids([k for k in sorted(docs)])
    )
    # doclist variant: an explicit subset in doclist order, keys relative
    # to the doclist's root
    dl = os.path.join(str(tmp_path), "list.txt")
    with open(dl, "w") as f:
        f.write("a/one.txt\n\nb/two.txt\n")
    tab2 = _collect(read_file_corpus(dl, root=src)).sort_by("dockey")
    assert tab2["dockey"].to_pylist() == ["a/one.txt", "b/two.txt"]
    assert tab2.num_rows == 2


def test_file_corpus_empty_raises(tmp_path):
    os.makedirs(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        read_file_corpus(str(tmp_path / "empty"))


def test_jsonl_rules(ray_session, tmp_path):
    p = str(tmp_path / "a.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"id": 7, "text": "alpha"}) + "\n")
        f.write(json.dumps({"id": 9, "text": "beta"}) + "\n")
    # integer ids pass through as docids; dockey is their string form
    tab = _collect(read_jsonl_corpus(p, id_col="id")).sort_by("doc_id")
    assert tab["doc_id"].to_pylist() == [7, 9]
    assert tab["dockey"].to_pylist() == ["7", "9"]
    # id_col is mandatory
    with pytest.raises(ValueError, match="id_col is required"):
        read_jsonl_corpus(p, id_col=None)
    # missing columns fail loudly at execution
    with pytest.raises(Exception, match="missing id column"):
        _collect(read_jsonl_corpus(p, id_col="nope"))
    # nulls fail loudly
    p2 = str(tmp_path / "b.jsonl")
    with open(p2, "w") as f:
        f.write(json.dumps({"id": 1, "text": "ok"}) + "\n")
        f.write(json.dumps({"id": None, "text": "bad"}) + "\n")
    with pytest.raises(Exception, match="null values in id column"):
        _collect(read_jsonl_corpus(p2, id_col="id"))


def test_ingest_corpus_auto_and_output(ray_session, tmp_path):
    src = _write_files(tmp_path, {"x.txt": "hello world", "y.txt": "more"})
    out = str(tmp_path / "parquet")
    m = ingest_corpus(src, out)  # auto -> files
    assert m == {"out": out, "n_docs": 2, "format": "files"}
    got = pads.dataset(out, format="parquet").to_table().sort_by("dockey")
    assert got.column_names == ["doc_id", "dockey", "text"]
    assert got["dockey"].to_pylist() == ["x.txt", "y.txt"]
