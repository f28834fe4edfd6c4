"""Faceted search: per-facet document counts over the FULL candidate set.

The standard SERP sidebar ("lang: en 1,204 / de 87 …"): for a query, count
matching documents per value of a metadata column — over every candidate,
not just the top-k page. The reference has no metadata surface (its corpus
is bare formula documents); transcripts carry ``role``/``tool`` and the
documents table ``lang``/``source``, which is exactly what production
retrieval filters on.

Design mirrors the docmap sidecar (scorer.py dockey_of):

- ``build_facet_sidecar`` writes, per partial, a narrow
  ``facets/`` parquet of (docid, <facet cols...>) from ONE pruned scan of
  that partial's own input files (no text bytes move). Per-partial layout
  means a sharded reader pays memory only for the partials it holds — the
  same scale bound as the docmap; values are dictionary-encoded by
  Parquet, the in-memory form is one sorted docid array + code arrays.
- ``FacetCounter.counts`` maps a candidate docid array to per-value
  counts by searchsorted probe + one bincount per partial — O(|cands| log
  docs_held), no scan, no shuffle.
- ``facet_counts`` is the query-level wrapper: full TAAT candidate set
  (docs containing >= 1 query term, live-docs filtered — the same set
  BM25 scores) -> counts. The pytest twin recomputes it in DuckDB from
  the raw corpus (match + group by + order by) and must agree exactly.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

FACETS_DIR = "facets"


def _sidecar_current(out: str, facet_cols: list[str]) -> bool:
    """An existing per-partial sidecar is reusable iff it carries exactly
    the requested facet columns."""
    if not os.path.isdir(out):
        return False
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    if not parts:
        return False
    schema = pq.read_schema(os.path.join(out, parts[0]))
    return set(schema.names) == {"docid", *facet_cols}


def build_facet_sidecar(
    index_dir: str, facet_cols: list[str], corpus=None, force: bool = False
) -> list[str]:
    """Add a facet sidecar to every partial of an index; returns the dirs.

    Reads each partial's lineage ``input_files`` with column pruning
    (id + facet columns only). Null facet values are kept as nulls and
    reported under the ``None`` bucket.

    INCREMENTAL: a partial whose sidecar already exists with the same
    facet columns is skipped (pass ``force=True`` to rebuild) — after
    ``add_increment`` or ``compact_index`` a re-run touches only the new
    partials, so sidecar catch-up costs O(new docs), not O(corpus)."""
    import ray.data

    from tangent_ray.sources.corpus import corpus_from_json

    with open(os.path.join(index_dir, "manifest.json")) as f:
        g = json.load(f)
    if corpus is None:
        corpus = corpus_from_json(g["corpus"])
    out_dirs: list[str] = []
    pdir = os.path.join(index_dir, "partials")
    for p in g["partials"]:
        if not force and _sidecar_current(
            os.path.join(pdir, p, FACETS_DIR), facet_cols
        ):
            out_dirs.append(os.path.join(pdir, p, FACETS_DIR))
            continue
        with open(os.path.join(pdir, p, "_MANIFEST.json")) as f:
            files = json.load(f)["input_files"]
        key_cols = [c for c in corpus.columns if c != corpus.text_column]
        read_cols = sorted(set(key_cols) | set(facet_cols))

        def emit(batch: pa.Table) -> pa.Table:
            ids = corpus.docids(batch)
            cols = {"docid": pa.array(np.asarray(ids, dtype=np.int64))}
            for c in facet_cols:
                col = batch[c]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                cols[c] = pc.cast(col, pa.string())
            return pa.table(cols)

        out = os.path.join(pdir, p, FACETS_DIR)
        tmp = out + "__tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        (
            ray.data.read_parquet(files, columns=read_cols)
            .map_batches(emit, batch_format="pyarrow")
            .write_parquet(tmp)
        )
        shutil.rmtree(out, ignore_errors=True)
        os.rename(tmp, out)
        out_dirs.append(out)
    return out_dirs


class FacetCounter:
    """Loaded facet sidecars of an index (or a partial subset for sharded
    serving). Lazily loads one sorted-docid view per partial."""

    def __init__(self, index_dir: str, partials: list[str] | None = None):
        with open(os.path.join(index_dir, "manifest.json")) as f:
            g = json.load(f)
        self._dirs = [
            os.path.join(index_dir, "partials", p, FACETS_DIR)
            for p in (partials if partials is not None else g["partials"])
        ]
        missing = [d for d in self._dirs if not os.path.isdir(d)]
        if missing:
            raise FileNotFoundError(
                f"facet sidecar missing for {len(missing)} partial(s) — run "
                "build_facet_sidecar"
            )
        self._loaded: list[tuple[np.ndarray, pa.Table]] | None = None

    def _load(self) -> list[tuple[np.ndarray, pa.Table]]:
        if self._loaded is None:
            views = []
            for d in self._dirs:
                t = pq.read_table(d)
                ids = t["docid"].to_numpy(zero_copy_only=False).astype(np.int64)
                order = np.argsort(ids)
                views.append((ids[order], t.take(pa.array(order))))
            self._loaded = views
        return self._loaded

    def counts(self, docids: np.ndarray, col: str) -> pa.Table:
        """(value, n_docs) per facet value over the given docids, sorted
        (n_docs desc, value asc); docids absent from every sidecar are
        ignored. Null facet values count under value=null."""
        q = np.asarray(docids, dtype=np.int64)
        agg: dict[str | None, int] = {}
        for ids_sorted, table in self._load():
            if not len(ids_sorted):
                continue
            hit, rows = self._probe(ids_sorted, q)
            if not len(hit):
                continue
            vals = table[col].take(pa.array(rows)).combine_chunks()
            enc = vals.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            if vals.null_count:
                agg[None] = agg.get(None, 0) + int(vals.null_count)
                codes = codes[
                    ~pc.is_null(vals).to_numpy(zero_copy_only=False)
                ]
            bc = np.bincount(codes.astype(np.int64),
                             minlength=len(enc.dictionary))
            for k, n in zip(enc.dictionary.to_pylist(), bc):
                if n:
                    agg[k] = agg.get(k, 0) + int(n)
        rows = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0] or ""))
        return pa.table(
            {
                "value": pa.array([k for k, _ in rows], pa.string()),
                "n_docs": pa.array([n for _, n in rows], pa.int64()),
            }
        )

    @staticmethod
    def _probe(ids_sorted: np.ndarray, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(hit positions into q, matching sidecar rows) — the ONE
        per-partial sorted-docid probe shared by counts / mask /
        values_of."""
        pos = np.searchsorted(ids_sorted, q)
        pos_c = np.minimum(pos, len(ids_sorted) - 1)
        hit = np.flatnonzero((pos < len(ids_sorted)) & (ids_sorted[pos_c] == q))
        return hit, pos_c[hit]

    def values_of(self, docids: np.ndarray, col: str) -> list[str | None]:
        """Per-docid facet value (None for nulls AND for docids absent
        from every sidecar) — the field-collapsing lookup. Vectorized:
        one searchsorted probe + one fancy object-array assignment per
        partial, no per-candidate Python loop."""
        q = np.asarray(docids, dtype=np.int64)
        out = np.full(len(q), None, dtype=object)
        for ids_sorted, table in self._load():
            if col not in table.column_names:
                raise KeyError(
                    f"facet column {col!r} not in sidecar "
                    f"(has {[c for c in table.column_names if c != 'docid']})"
                )
            if not len(ids_sorted):
                continue
            hit, rows = self._probe(ids_sorted, q)
            if not len(hit):
                continue
            vals = pc.cast(table[col].take(pa.array(rows)), pa.string())
            out[hit] = vals.to_numpy(zero_copy_only=False)
        return out.tolist()

    def numeric_values_of(self, docids: np.ndarray, col: str) -> np.ndarray:
        """Per-docid NUMERIC facet value (float64; NaN for nulls and for
        docids absent from every sidecar) — the sort-by-field lookup. A
        text column raises, like range filters."""
        q = np.asarray(docids, dtype=np.int64)
        out = np.full(len(q), np.nan, dtype=np.float64)
        for ids_sorted, table in self._load():
            if col not in table.column_names:
                raise KeyError(
                    f"facet column {col!r} not in sidecar "
                    f"(has {[c for c in table.column_names if c != 'docid']})"
                )
            if not len(ids_sorted):
                continue
            hit, rows = self._probe(ids_sorted, q)
            if not len(hit):
                continue
            vals = pc.cast(table[col].take(pa.array(rows)), pa.float64())
            out[hit] = vals.to_numpy(zero_copy_only=False)
        return out

    _OPS = {
        ">": pc.greater, ">=": pc.greater_equal,
        "<": pc.less, "<=": pc.less_equal,
    }

    def mask(self, docids: np.ndarray, col: str, value: str,
             op: str = ":") -> np.ndarray:
        """Boolean keep-mask per docid: ``facet[col] == value`` for the
        ``:`` equality op (string equality on the sidecar's
        cast-to-string values), or a NUMERIC comparison for ``> >= < <=``
        (both sides cast to float64; a non-numeric sidecar value raises —
        a range filter on a text column is a caller bug, not an empty
        page). Docids absent from every sidecar and null facet values
        never match."""
        q = np.asarray(docids, dtype=np.int64)
        out = np.zeros(len(q), dtype=bool)
        fval = 0.0
        if op != ":":
            if op not in self._OPS:
                raise ValueError(f"unsupported facet filter op {op!r}")
            # validate ONCE, up front: a garbage bound must raise even
            # when no candidate hits a sidecar row
            try:
                fval = float(value)
            except ValueError:
                raise ValueError(
                    f"range filter bound {value!r} is not numeric"
                ) from None
        for ids_sorted, table in self._load():
            if col not in table.column_names:
                raise KeyError(
                    f"facet column {col!r} not in sidecar "
                    f"(has {[c for c in table.column_names if c != 'docid']})"
                )
            if not len(ids_sorted):
                continue
            hit, rows = self._probe(ids_sorted, q)
            if not len(hit):
                continue
            vals = table[col].take(pa.array(rows))
            if op == ":":
                # compare on the cast-to-string view so a numeric sidecar
                # column (e.g. #n_chars:300) matches like the SQL twin's
                # ::VARCHAR instead of raising on equal(int64, string)
                eq = pc.fill_null(
                    pc.equal(pc.cast(vals, pa.string()), value), False
                )
            else:
                nums = pc.cast(vals, pa.float64())  # raises on text values
                eq = pc.fill_null(self._OPS[op](nums, fval), False)
            eqn = eq.to_numpy(zero_copy_only=False).astype(bool)
            out[hit[eqn]] = True
        return out


    def stats(self, docids: np.ndarray, col: str) -> dict:
        """Elasticsearch-style stats aggregation over a NUMERIC facet
        column for the given docids: ``{count, min, max, sum, avg}``.
        Null values and docids absent from every sidecar are excluded
        from all five; a text column raises (like range filters). Sums
        are exact for integer-valued columns (float64 holds ints to
        2^53); ``count == 0`` reports min/max/avg as None."""
        q = np.asarray(docids, dtype=np.int64)
        cnt, sm = 0, 0.0
        mn, mx = np.inf, -np.inf
        for ids_sorted, table in self._load():
            if col not in table.column_names:
                raise KeyError(
                    f"facet column {col!r} not in sidecar "
                    f"(has {[c for c in table.column_names if c != 'docid']})"
                )
            if not len(ids_sorted):
                continue
            hit, rows = self._probe(ids_sorted, q)
            if not len(hit):
                continue
            vals = pc.cast(table[col].take(pa.array(rows)), pa.float64())
            arr = vals.to_numpy(zero_copy_only=False)
            if vals.null_count:
                arr = arr[~np.isnan(arr)]
            if not len(arr):
                continue
            cnt += int(len(arr))
            sm += float(arr.sum())
            mn = min(mn, float(arr.min()))
            mx = max(mx, float(arr.max()))
        if cnt == 0:
            return {"count": 0, "min": None, "max": None, "sum": 0.0,
                    "avg": None}
        return {"count": cnt, "min": mn, "max": mx, "sum": sm,
                "avg": sm / cnt}


def facet_counts(
    index_dir: str,
    query_text: str,
    col: str,
    counter: FacetCounter | None = None,
    scorer=None,
) -> pa.Table:
    """Facet counts over a text query's FULL candidate set (every live doc
    containing at least one query term — the set BM25 scores, before any
    top-k cut)."""
    from tangent_ray.query.scorer import QueryScorer

    if scorer is None:
        scorer = QueryScorer(index_dir)
    if counter is None:
        counter = FacetCounter(index_dir)
    # full candidate set: parse -> TAAT (k=None forces the accumulation
    # path, no WAND truncation) -> live-docs filter
    scorer.last_stats = {"postings": 0, "terms": 0, "candidates": 0}
    text, neg_terms = scorer._split_negations(query_text)
    scorer._dead = scorer.reader.tombstones
    if neg_terms:
        excl = scorer._excluded_docs(neg_terms)
        if excl.size:
            scorer._dead = (
                np.union1d(scorer._dead, excl) if scorer._dead.size else excl
            )
    terms, _, _, _ = scorer.parse_query(text)
    d, _ = scorer._score_bm25(terms, None)
    dead = scorer._dead
    if dead.size and len(d):
        from tangent_ray.util import sorted_lookup

        hit, _ = sorted_lookup(dead, d)
        d = d[~hit]
    return counter.counts(d, col)


def collapsed_search(
    index_dir: str,
    query_text: str,
    col: str,
    k: int = 10,
    per_group: int = 1,
    counter: FacetCounter | None = None,
    scorer=None,
) -> pa.Table:
    """Field collapsing (the Elasticsearch ``collapse`` / Lucene grouping
    feature): rank GROUPS of a metadata column by their best-scoring doc,
    keeping ``per_group`` representative docs each.

    The full query syntax applies (prefix / groups / boosts / -negations;
    a cursorless full-candidate pass, so collapsing never under-fills).
    Docs with a null facet value (or absent from the sidecar) are
    dropped — they belong to no group. Returns (rank, value, docid,
    score, group_rank) sorted by (group's best score desc, value asc)
    then group_rank; deterministic ties exactly like the scorer."""
    from tangent_ray.query.scorer import QueryScorer

    if scorer is None:
        scorer = QueryScorer(index_dir)
    if counter is None:
        counter = FacetCounter(index_dir)
    # full candidate pass through the ordinary scoring path (filters,
    # negations and expansion groups all apply); k large = no cut here
    d, s = scorer.score_query(query_text, "text", None)
    varr = pa.array(counter.values_of(d, col), pa.string())
    keep = pc.is_valid(varr).to_numpy(zero_copy_only=False).astype(bool)
    d, s = d[keep], s[keep]
    if not len(d):
        return pa.table(
            {
                "rank": pa.array([], pa.int32()),
                "value": pa.array([], pa.string()),
                "docid": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
                "group_rank": pa.array([], pa.int32()),
            }
        )
    enc = varr.filter(pa.array(keep)).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # within-group rank: sort (code, score desc, docid) and number runs
    order = np.lexsort((d, -s, codes))
    gcode, gd, gs = codes[order], d[order], s[order]
    starts = np.concatenate([[True], gcode[1:] != gcode[:-1]])
    idx = np.arange(len(gcode))
    run_start = np.maximum.accumulate(np.where(starts, idx, 0))
    grank = idx - run_start  # 0-based rank inside the group
    top = grank < per_group
    # group ordering key: the group's best (rank-0) doc score; ties by
    # value asc — resolved on the group's dictionary string
    best_s = gs[starts]
    best_of = dict(
        zip(gcode[starts].tolist(), best_s.tolist())
    )
    dictionary = enc.dictionary.to_pylist()
    group_order = sorted(
        best_of, key=lambda c: (-best_of[c], dictionary[c])
    )[:k]
    pos_of = {c: i for i, c in enumerate(group_order)}
    rows = [
        (pos_of[int(c)], dictionary[int(c)], int(dd), float(ss), int(gr) + 1)
        for c, dd, ss, gr in zip(gcode[top], gd[top], gs[top], grank[top])
        if int(c) in pos_of
    ]
    rows.sort(key=lambda r: (r[0], r[4]))
    return pa.table(
        {
            "rank": pa.array([r[0] + 1 for r in rows], pa.int32()),
            "value": pa.array([r[1] for r in rows], pa.string()),
            "docid": pa.array([r[2] for r in rows], pa.int64()),
            "score": pa.array([r[3] for r in rows], pa.float64()),
            "group_rank": pa.array([r[4] for r in rows], pa.int32()),
        }
    )


def facet_stats(
    index_dir: str,
    query_text: str,
    col: str,
    counter: FacetCounter | None = None,
    scorer=None,
) -> pa.Table:
    """Stats aggregation of a NUMERIC metadata column over a text query's
    FULL candidate set — the Elasticsearch ``stats`` agg next to
    ``facet_counts``' terms agg. One row: (col, n_docs, vmin, vmax, vsum,
    vavg); the candidate set goes through the ordinary scoring path, so
    negations / filters / expansion groups / phrases all apply."""
    from tangent_ray.query.scorer import QueryScorer

    if scorer is None:
        scorer = QueryScorer(index_dir)
    if counter is None:
        counter = FacetCounter(index_dir)
    d, _ = scorer.score_query(query_text, "text", None)
    st = counter.stats(d, col)
    return pa.table(
        {
            "col": pa.array([col], pa.string()),
            "n_docs": pa.array([st["count"]], pa.int64()),
            "vmin": pa.array([st["min"]], pa.float64()),
            "vmax": pa.array([st["max"]], pa.float64()),
            "vsum": pa.array([st["sum"]], pa.float64()),
            "vavg": pa.array([st["avg"]], pa.float64()),
        }
    )


def sorted_search(
    index_dir: str,
    query_text: str,
    col: str,
    k: int = 10,
    ascending: bool = True,
    counter: FacetCounter | None = None,
    scorer=None,
) -> pa.Table:
    """Sort-by-field results (Lucene SortField / the Elasticsearch
    ``sort`` clause): the query's FULL candidate set ordered by a NUMERIC
    metadata column instead of relevance — (column asc|desc, docid asc),
    null / absent values dropped, limit ``k``. The deterministic
    integer-keyed order avoids the cross-engine fp-tie hazard a score
    tie-break would reintroduce; the BM25 score still rides along as a
    column. Full query syntax applies (the candidates come from the
    ordinary scoring path)."""
    from tangent_ray.query.scorer import QueryScorer

    if scorer is None:
        scorer = QueryScorer(index_dir)
    if counter is None:
        counter = FacetCounter(index_dir)
    d, s = scorer.score_query(query_text, "text", None)
    vals = counter.numeric_values_of(d, col)
    keep = ~np.isnan(vals)
    d, s, vals = d[keep], s[keep], vals[keep]
    order = np.lexsort((d, vals if ascending else -vals))[:k]
    return pa.table(
        {
            "rank": pa.array(
                np.arange(1, len(order) + 1, dtype=np.int32), pa.int32()
            ),
            "docid": pa.array(d[order], pa.int64()),
            "sort_value": pa.array(vals[order], pa.float64()),
            "score": pa.array(s[order], pa.float64()),
        }
    )
