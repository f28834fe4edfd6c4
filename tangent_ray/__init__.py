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


def __getattr__(name):
    # public API surface, imported lazily to keep `import tangent_ray` light
    if name in ("build_index", "add_increment"):
        from tangent_ray.index import build as _b

        return getattr(_b, name)
    if name in ("compact_index", "verify_index", "merge_partials"):
        from tangent_ray.index import merge as _m

        return getattr(_m, name)
    if name in ("QueryScorer", "search", "IndexReader"):
        from tangent_ray.query import scorer as _s

        return getattr(_s, name)
    if name in ("mss_score", "rerank_candidates"):
        from tangent_ray.rerank import mss as _r

        return getattr(_r, name)
    if name == "rerank_search":
        from tangent_ray.rerank.pipeline import rerank_search

        return rerank_search
    if name in ("pii_redact_batch", "decontaminate", "stratified_sample_batch",
                "pack_sequences", "chunk_spans_batch"):
        from tangent_ray.ops import curation as _c

        return getattr(_c, name)
    if name in ("asof_join", "range_count", "hash_join", "broadcast_join"):
        from tangent_ray.ops import joins as _j

        return getattr(_j, name)
    if name in ("kth_value", "quantile_values"):
        from tangent_ray.ops import quantiles as _q

        return getattr(_q, name)
    if name in ("heavy_hitters", "distinct_tokens_hll"):
        from tangent_ray.ops import sketch as _sk

        return getattr(_sk, name)
    raise AttributeError(name)

#: applied in every process that imports the package (driver and each Ray
#: worker): large numpy temporaries reuse heap pages instead of paying
#: first-touch mmap faults — see util.tune_allocator
_ALLOCATOR_TUNED = _tune_allocator()

from tangent_ray.util import stabilize_lazy_imports as _stabilize_lazy_imports

_stabilize_lazy_imports()

__version__ = "0.1.0"

__all__ = [
    "EngineConfig", "build_index", "add_increment", "compact_index",
    "verify_index", "merge_partials", "QueryScorer", "search", "IndexReader",
    "mss_score", "rerank_candidates", "rerank_search", "pii_redact_batch",
    "decontaminate", "stratified_sample_batch", "pack_sequences",
    "chunk_spans_batch",
    "asof_join", "range_count", "hash_join", "broadcast_join",
    "kth_value", "quantile_values", "heavy_hitters", "distinct_tokens_hll",
    "__version__",
]
