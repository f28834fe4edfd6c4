"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``   — flagship pipeline on /root/testdata/sf0.001: build the
  transcripts inverted index (tokenize -> salted groupby -> compressed
  postings) and run the fixed query set through the BM25 / tuple-F-measure
  actor-pool scorer; returns the top-k result Dataset.
- ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data extension set); each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB twins for every SQL-expressible entry
  (column names/types/rounding match exactly). Engine-only entries
  (math tuples, formula scoring, flagship) are rows-only checked by the
  driver and rank-identity checked against a pure-Python oracle in pytest.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from tangent_ray.pipelines.entry_queries import q_transcript_bm25

    return q_transcript_bm25("/root/testdata/sf0.001").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from tangent_ray.pipelines.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tangent_ray.pipelines.entry_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
