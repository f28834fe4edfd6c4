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
        return batch[self.id_column].to_numpy(zero_copy_only=False).astype(np.int64)

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


Corpus = DocumentsCorpus | TranscriptsCorpus


def corpus_from_json(kind: str) -> Corpus:
    if kind == "transcripts":
        return TranscriptsCorpus()
    if kind == "documents":
        return DocumentsCorpus()
    raise ValueError(f"unknown corpus kind {kind!r}")


def corpus_kind(corpus: Corpus) -> str:
    return "transcripts" if isinstance(corpus, TranscriptsCorpus) else "documents"
