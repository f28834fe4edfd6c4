"""Corpus adapters: how a Parquet table maps to (docid, dockey, text).

The reference reads documents out of a doc-list file + per-file readers
(``math/mathdocument.py:56-90``); here a corpus is any Parquet table plus a
small adapter describing its key and text columns. Two adapters cover the
repo's corpora:

- ``TranscriptsCorpus``: the primary input mandated by BASELINE.json
  ``input_hint`` — ``(conv_id:string, turn_idx:int32, role:string,
  text:string, tool:string, ts:timestamp[us])``; one *turn* is one document,
  ``dockey = f"{conv_id}:{turn_idx}"``, docid = blake2b64(dockey)
  (see ``tangent_ray.docids``).
- ``DocumentsCorpus``: any table with an int64 key column and a text column
  (the driver's ``documents(doc_id, text, ...)`` test table); docid is the
  key itself so DuckDB oracle SQL lines up exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.docids import dockeys_to_docids, transcript_dockeys


@dataclass(frozen=True)
class DocumentsCorpus:
    id_column: str = "doc_id"
    text_column: str = "text"

    @property
    def columns(self) -> list[str]:
        return [self.id_column, self.text_column]

    def docids(self, batch: pa.Table) -> np.ndarray:
        col = batch[self.id_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            # to_numpy would surface nulls as float64 NaN and astype would
            # fold every null to INT64_MIN (and round ids > 2^53) — refuse
            raise ValueError(f"{self.id_column!r} contains null ids")
        return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)

    def dockeys(self, batch: pa.Table) -> pa.Array:
        return pc.cast(batch[self.id_column], pa.string())

    def texts(self, batch: pa.Table) -> pa.Array:
        col = batch[self.text_column]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


@dataclass(frozen=True)
class TranscriptsCorpus:
    text_column: str = "text"

    @property
    def columns(self) -> list[str]:
        return ["conv_id", "turn_idx", self.text_column]

    def docids(self, batch: pa.Table) -> np.ndarray:
        keys = self.dockeys(batch)
        return dockeys_to_docids(keys.to_pylist())

    def dockeys(self, batch: pa.Table) -> pa.Array:
        return transcript_dockeys(batch)

    def texts(self, batch: pa.Table) -> pa.Array:
        col = batch[self.text_column]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


@dataclass(frozen=True)
class KeyedCorpus:
    """(doc_id, dockey, text) corpora — the ``sources.ingest`` layout:
    docids are already blake2b(dockey) (or the user's integer ids), and
    the explicit ``dockey`` column decorates results (file paths, JSONL
    ids) instead of stringified hashes."""

    id_column: str = "doc_id"
    key_column: str = "dockey"
    text_column: str = "text"

    @property
    def columns(self) -> list[str]:
        return [self.id_column, self.key_column, self.text_column]

    def docids(self, batch: pa.Table) -> np.ndarray:
        col = batch[self.id_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            raise ValueError(f"{self.id_column!r} contains null ids")
        return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)

    def dockeys(self, batch: pa.Table) -> pa.Array:
        col = pc.cast(batch[self.key_column], pa.string())
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    def texts(self, batch: pa.Table) -> pa.Array:
        col = batch[self.text_column]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


Corpus = DocumentsCorpus | TranscriptsCorpus | KeyedCorpus


def corpus_from_json(spec: str) -> Corpus:
    """Rebuild a corpus adapter from ``corpus_spec`` output (also accepts
    the legacy bare kind strings that older manifests recorded — those
    imply default column names)."""
    import json

    if spec in ("transcripts", "documents", "keyed"):
        d: dict = {"kind": spec}
    else:
        d = json.loads(spec)
    kind = d.pop("kind")
    if kind == "transcripts":
        return TranscriptsCorpus(**d)
    if kind == "documents":
        return DocumentsCorpus(**d)
    if kind == "keyed":
        return KeyedCorpus(**d)
    raise ValueError(f"unknown corpus kind {kind!r}")


def corpus_spec(corpus: Corpus) -> str:
    """Full JSON spec INCLUDING the configured column names — the string a
    build ships to workers and records in manifests (a bare kind string
    silently reset custom id/text columns to the defaults on every
    worker / resume)."""
    import json

    if isinstance(corpus, TranscriptsCorpus):
        return json.dumps(
            {"kind": "transcripts", "text_column": corpus.text_column}
        )
    if isinstance(corpus, KeyedCorpus):
        return json.dumps(
            {
                "kind": "keyed",
                "id_column": corpus.id_column,
                "key_column": corpus.key_column,
                "text_column": corpus.text_column,
            }
        )
    return json.dumps(
        {
            "kind": "documents",
            "id_column": corpus.id_column,
            "text_column": corpus.text_column,
        }
    )


def corpus_kind(corpus: Corpus) -> str:
    if isinstance(corpus, TranscriptsCorpus):
        return "transcripts"
    if isinstance(corpus, KeyedCorpus):
        return "keyed"
    return "documents"
