"""Engine configuration.

The reference drives everything from a TSV control file
(``utility/control.py:12-43``) plus compile-time flags
(``mathindex.cpp:11-28``); here a frozen dataclass plays that role and is
plumbed through the build and query pipelines explicitly.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # --- tokenization -----------------------------------------------------
    #: symbol-pair tuple window in edges; 0 means unbounded
    #: (reference: ``W`` command, ``mathindex.cpp:385`` maps 0 -> INT_MAX).
    window: int = 1
    #: end-of-line ("EOB") tuple mode: "none" | "small" | "all"
    #: (reference compile-time ENDOFBASELINE, ``mathindex.cpp:13-19``;
    #: "small" emits EOL tuples only for expressions of height <= 1,
    #: ``mathindexmid.h:73`` + ``heightGT``).
    eol: str = "small"
    #: Porter-stem text terms (reference text path stems keywords,
    #: ``text/TextResult.py:29-32``). Oracle-checked SQL pipelines run with
    #: ``stem=False`` because DuckDB in this sandbox has no stemmer.
    stem: bool = True
    #: drop tokens longer than this many characters (safety valve; the
    #: reference caps pair strings at 200 chars, ``symboltree.py:44-47``).
    max_token_len: int = 200
    #: extract math fragments ($...$ spans) and index symbol-pair tuples.
    math: bool = True

    # --- BM25 -------------------------------------------------------------
    k1: float = 1.2
    b: float = 0.75

    # --- index layout -----------------------------------------------------
    #: posting-list block size (entries per skip block).
    block_size: int = 128
    #: number of docid-range salt buckets for the postings groupby; 1 means
    #: no salting. Salted key = (term, min(docid >> (63 - salt_bits),
    #: salt_buckets-1)) — docids are masked to 63 bits, and the top-bits
    #: range is clipped (not wrapped) for non-power-of-two bucket counts so
    #: runs stay disjoint ascending docid ranges and the second-stage merge
    #: is pure concatenation.
    salt_buckets: int = 1
    #: number of input partitions for the log-structured build (each gets an
    #: independent, resumable partial index + manifest).
    partitions: int = 1

    # --- query ------------------------------------------------------------
    topk: int = 100

    @property
    def salt_bits(self) -> int:
        n = max(1, self.salt_buckets)
        return max(0, (n - 1).bit_length())

    @staticmethod
    def suggest_salt_buckets(n_rows: int, target_group_rows: int = 320_000) -> int:
        """Power-of-two salt bucket count for a corpus of ``n_rows`` docs.

        Sized so a worst-case hot term (df ~= n_rows) splits into per-group
        runs of ~``target_group_rows`` — the encode stage's critical path is
        its LARGEST group, and oversalting multiplies group count by the
        whole vocabulary, costing more in the sort/groupby than it saves in
        skew (measured, 5.1M-turn corpus, 32 CPUs: salt 4 -> 45 s,
        16 -> 20.8 s, 64 -> 54 s). Capped at 32.
        """
        want = max(1, -(-n_rows // target_group_rows))  # ceil
        buckets = 1 << (want - 1).bit_length()
        return max(4, min(32, buckets))

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "EngineConfig":
        return cls(**json.loads(s))


#: tokenizer settings used by every oracle-checked (DuckDB SQL) pipeline:
#: no stemming, no math extraction -> expressible as
#: ``unnest(string_split_regex(lower(text), '[^a-z0-9]+'))`` in ANSI-ish SQL.
SQL_PARITY_CONFIG = EngineConfig(stem=False, math=False, window=1, eol="none")
