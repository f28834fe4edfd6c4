"""tangent_ray — a Ray-Data-native inverted-index build + top-k query engine.

A from-scratch reimplementation of the retrieval capabilities of Tangent 0.3.1
(the RIT/Waterloo math-formula search engine; reference surveyed in SURVEY.md)
transplanted onto Parquet tables of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Architecture (Ray-Data-first, not a port):

- tokenize each turn via ``Dataset.map_batches`` over zero-copy Arrow batches:
  plain-text terms plus Tangent-style symbol-pair tuples for embedded math
  fragments (reference tuple semantics: ``mathindexmid.h:18-75``),
- emit ``(term, docid, tf, dl, pos1)`` rows, shuffle with
  ``groupby(term)`` (salted by docid range for hot-term skew),
- encode sorted delta+varint posting lists with skip blocks
  (``tangent_ray.index.codec``),
- partial index per input partition + manifest → log-structured tiered merge
  (``tangent_ray.index.merge``), resumable mid-build,
- query-time BM25 / tuple F-measure top-k inside a stateful actor pool
  (``tangent_ray.query.scorer``), deterministic (score desc, docid asc)
  ordering (reference analogue: ``mathindexbase.h:100``).
"""

from tangent_ray.config import EngineConfig
from tangent_ray.util import tune_allocator as _tune_allocator

#: applied in every process that imports the package (driver and each Ray
#: worker): large numpy temporaries reuse heap pages instead of paying
#: first-touch mmap faults — see util.tune_allocator
_ALLOCATOR_TUNED = _tune_allocator()

__version__ = "0.1.0"

__all__ = ["EngineConfig", "__version__"]
