"""Deterministic document identifiers.

The reference assigns dense int docIDs by position in a doc-list file
(``docid = chunkid*chunk_size + offset``, ``math/mathdocument.py:45``) — a
single-writer, arrival-order scheme that cannot survive a parallel build.
Here the docID is a *pure function of the data*, independent of partitioning
and arrival order:

- transcripts: dockey = ``f"{conv_id}:{turn_idx}"``; docid = the first 8
  bytes of blake2b(dockey) masked to a non-negative int64. Deterministic
  across processes/machines (unlike salted ``hash()``), uniformly spread
  (which the docid-range salting of the postings shuffle relies on), and
  collision-free with overwhelming probability at test scale. At 10^12 docs
  the 63-bit space gives a expected handful of collisions; the documented
  upgrade path is the 16-byte digest in two int64 columns. The build audits
  uniqueness cheaply (df of the docmap groupby).
- int64-keyed corpora (e.g. the ``documents`` test table): docid = the key
  itself, so ordering and oracle SQL line up exactly.

The (score desc, docid asc) tie-break of the reference top-k heap
(``mathindexbase.h:100``: score then exprID) therefore remains a
deterministic total order, just over hashed ids for transcripts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MASK63 = (1 << 63) - 1


def dockey_to_docid(key: str) -> int:
    """int64 docid for a string doc key (deterministic, unsalted)."""
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & _MASK63


def dockeys_to_docids(keys: list[str] | np.ndarray) -> np.ndarray:
    """Vector version; returns int64 ndarray."""
    out = np.empty(len(keys), dtype=np.int64)
    blake2b = hashlib.blake2b
    from_bytes = int.from_bytes
    for i, k in enumerate(keys):
        d = blake2b(k.encode("utf-8"), digest_size=8).digest()
        out[i] = from_bytes(d, "big") & _MASK63
    return out


def transcript_dockeys(batch: pa.Table) -> pa.Array:
    """``conv_id:turn_idx`` string keys for a transcripts batch."""
    return pc.binary_join_element_wise(
        batch["conv_id"], pc.cast(batch["turn_idx"], pa.string()), ":"
    )
