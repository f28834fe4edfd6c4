"""Corpus ingestion: file-per-document and JSONL sources -> the canonical
Parquet layout every pipeline in this repo consumes.

The reference's indexer walks a doclist of HTML/XHTML/MathML FILES
(``testing/testlist.txt`` -> one document per file, S2-S4) and its
utilities massage other formats into that shape; web-scale training
pipelines ingest JSONL shards. This module is the Ray-Data-first
equivalent: a streaming read of the raw source, a vectorized normalize
to ``(doc_id, dockey, text)``, and a partitioned Parquet write — after
which EVERY existing surface (``build_index``, ``build_position_index``,
the ops layer, the CLI) runs unchanged on the converted corpus.

Docids are ``blake2b`` of the document's stable string key (the repo's
docid rule, ``docids.py``): the file's doclist-relative path for file
corpora, the user-named id column for JSONL. Deterministic, so
re-ingesting produces the identical corpus (resume-safe) and increments
hash to the same doc-partition (positions layout contract).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from tangent_ray.docids import dockeys_to_docids

CORPUS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("dockey", pa.string()),
        ("text", pa.string()),
    ]
)


def _doclist_paths(src: str, root: str | None = None) -> tuple[list[str], str]:
    """Resolve a file-corpus source to (absolute file paths, key root).

    ``src`` may be a directory (every regular file under it, recursive,
    sorted) or a doclist text file (one relative path per line — the
    reference's ``testlist.txt`` format), whose entries resolve against
    ``root`` (default: the doclist's own directory)."""
    if os.path.isdir(src):
        base = src
        paths = []
        for r, _dirs, files in os.walk(src):
            for f in files:
                paths.append(os.path.join(r, f))
        paths.sort()
    else:
        base = root if root is not None else os.path.dirname(os.path.abspath(src))
        with open(src, encoding="utf-8") as f:
            rels = [line.strip() for line in f if line.strip()]
        paths = [os.path.join(base, r) for r in rels]
    return paths, base


def read_file_corpus(src: str, root: str | None = None):
    """File-per-document corpus -> Dataset(doc_id, dockey, text).

    One document per file (the reference's doclist model): a streaming
    ``read_binary_files(include_paths=True)`` over the resolved paths,
    then a per-batch decode + docid hash — no driver-side file loop, so
    a million-file corpus streams through the object store like any
    other source. ``dockey`` is the path relative to the doclist root
    (stable across machines); bytes decode as UTF-8 with replacement
    (the reference reads with error tolerance too)."""
    import ray.data

    paths, base = _doclist_paths(src, root)
    if not paths:
        raise FileNotFoundError(f"file corpus {src!r}: no documents found")
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def to_rows(batch: pa.Table) -> pa.Table:
        keys = [
            os.path.relpath(p, base)
            for p in batch["path"].to_pylist()
        ]
        texts = [
            b.decode("utf-8", errors="replace")
            for b in batch["bytes"].to_pylist()
        ]
        return pa.Table.from_arrays(
            [
                pa.array(dockeys_to_docids(keys), pa.int64()),
                pa.array(keys, pa.string()),
                pa.array(texts, pa.string()),
            ],
            schema=CORPUS_SCHEMA,
        )

    return ds.map_batches(to_rows, batch_format="pyarrow")


def read_jsonl_corpus(src: str, text_col: str = "text",
                      id_col: str | None = "id"):
    """JSONL corpus -> Dataset(doc_id, dockey, text).

    ``src`` is a ``.json``/``.jsonl`` file or a directory of shards
    (Ray's streaming JSON reader handles both). ``id_col`` names the
    stable per-document key column — string keys hash through the repo's
    blake2b docid rule, integer keys pass through; it is REQUIRED
    (``None`` raises) because a content- or position-derived id would
    either collide on duplicate texts (the build's duplicate-docid guard
    would reject the corpus) or drift between runs (breaking increments'
    doc-partition stability)."""
    import pyarrow.compute as pc
    import ray.data

    if id_col is None:
        raise ValueError(
            "read_jsonl_corpus: id_col is required — a stable per-doc key "
            "column (string keys are blake2b-hashed, ints pass through)"
        )
    ds = ray.data.read_json(src)

    def to_rows(batch: pa.Table) -> pa.Table:
        if id_col not in batch.column_names:
            raise ValueError(
                f"jsonl corpus: missing id column {id_col!r} "
                f"(have {batch.column_names})"
            )
        if text_col not in batch.column_names:
            raise ValueError(
                f"jsonl corpus: missing text column {text_col!r} "
                f"(have {batch.column_names})"
            )
        ids = batch[id_col]
        if ids.null_count:
            raise ValueError(
                f"jsonl corpus: null values in id column {id_col!r} — "
                "every document needs a stable key"
            )
        if batch[text_col].null_count:
            raise ValueError(
                f"jsonl corpus: null values in text column {text_col!r} — "
                "drop or empty-string them upstream"
            )
        if pa.types.is_integer(ids.type):
            keys = pc.cast(ids, pa.string())
            docids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            keys = pc.cast(ids, pa.string())
            docids = dockeys_to_docids(keys.to_pylist())
        return pa.Table.from_arrays(
            [
                pa.array(np.asarray(docids, dtype=np.int64), pa.int64()),
                keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
                else keys,
                pc.cast(batch[text_col], pa.string()),
            ],
            schema=CORPUS_SCHEMA,
        )

    return ds.map_batches(to_rows, batch_format="pyarrow")


def ingest_corpus(src: str, out_dir: str, fmt: str = "auto",
                  text_col: str = "text", id_col: str | None = "id",
                  root: str | None = None,
                  num_rows_per_file: int | None = None) -> dict:
    """Convert a raw corpus to the canonical partitioned Parquet layout.

    ``fmt``: ``files`` (file-per-document / doclist), ``jsonl``, or
    ``auto`` (doclist/dir of non-JSON files -> files; ``.json``/
    ``.jsonl`` -> jsonl). Writes many Parquet files (Ray's streaming
    write — resumable consumers skip finished partitions), returns
    ``{"out", "n_docs", "format"}``. Every downstream surface
    (``build_index``, positional builds, the ops layer) then reads
    ``out_dir`` like any documents corpus."""
    if fmt == "auto":
        low = src.lower()
        fmt = "jsonl" if low.endswith((".json", ".jsonl")) else "files"
    if fmt == "files":
        ds = read_file_corpus(src, root=root)
    elif fmt == "jsonl":
        ds = read_jsonl_corpus(src, text_col=text_col, id_col=id_col)
    else:
        raise ValueError(f"ingest_corpus: unknown format {fmt!r}")
    kwargs = {}
    if num_rows_per_file:
        kwargs["num_rows_per_file"] = int(num_rows_per_file)
    ds.write_parquet(out_dir, **kwargs)
    import pyarrow.dataset as pads

    n = pads.dataset(out_dir, format="parquet").count_rows()
    return {"out": out_dir, "n_docs": int(n), "format": fmt}
