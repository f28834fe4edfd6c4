"""Top-k query scoring over index segments (stateful actor pool).

The reference keeps one resident C++ process per index (socket mode,
``mathindex.cpp:415-457``) that executes queries against in-memory postings
with threshold-driven skipping (``mathindex.cpp:190-260``). The Ray-native
equivalent is ``queries.map_batches(QueryScorer, concurrency=N)``: each actor
loads the segment set once in ``__init__`` and scores query batches against
it. Results carry the deterministic (score desc, docid asc) ordering of the
reference top-k heap (``qresult::operator<``, ``mathindexbase.h:100``:
score, then id).

Scoring modes per query ``kind``:

- ``text``  — BM25 over text terms: ``idf = ln(1 + (N-df+0.5)/(df+0.5))``,
  ``tfn = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))``, summed over distinct query
  terms in sorted-term order (fixed fp summation order for determinism).
  This replaces the external Solr dismax engine (S12,
  ``text/text_engine_client.py``) with a native scorer.
- ``math``  — the reference's simplified f-measure over symbol-pair tuple
  bags: ``F = 2*cc/(dtc + qtc)`` with ``cc = sum_t min(qtf_t, dtf_t)``
  (``mathindex.cpp:239-240``; per-tuple ``min`` from ``IDIterPL``/``IDIterOR``
  semantics, ``mathindexmid.h:104-160``). ``dtc`` is the doc's total tuple
  count (the per-doc analogue of ``exprTC``), embedded in every math posting.
  Wildcard query tuples (``?x`` symbols) expand to the matching concrete
  tuple terms (the var-lexicon semi-join, ``mathindexbase.h:204-234``) and
  contribute ``min(1, remaining_tf)`` per doc through ANY/IND semantics.
- ``mixed`` — linear fusion ``mweight*math + (1-mweight)*text_norm`` with the
  reference's dynamic weight ``#formulae/(#formulae+#keywords)``
  (``CompQuery.combine_math_text``, ``utility/comp_query.py:255-291``);
  text scores min-max normalized into [0,1] like the reference normalizes
  Solr scores before fusion.

Two execution strategies, selected per term-list size:

- vectorized TAAT (term-at-a-time) accumulation via numpy — fastest in
  Python for the common case;
- block-max WAND doc-at-a-time over the skip blocks for very long lists
  (upper bound per block from ``(max_tf, min_dl)``), the analogue of the
  reference's threshold skipping + galloping search
  (``mathindex.cpp:225-255``, ``mathindexmid.h:100-132``).
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tangent_ray.config import EngineConfig
from tangent_ray.index.codec import decode_postings
from tangent_ray.tokenize.batch import _MATH_RE
from tangent_ray.tokenize.slt import (
    SLTParseError,
    is_wildcard,
    parse_slt,
    parse_tuple_term,
    slt_tuples,
    tuple_term,
)
from tangent_ray.tokenize.text import tokenize_text

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("rank", pa.int32()),
        ("docid", pa.int64()),
        ("dockey", pa.string()),
        ("score", pa.float64()),
    ]
)


class Segment:
    """One partial index loaded into memory (Arrow-backed, binary columns)."""

    MAX_CACHE = 4096  # decoded posting lists kept hot per segment

    def __init__(self, terms_dir: str):
        t = pq.read_table(terms_dir)
        self.table = t
        self.terms = t["term"].to_pylist()
        # term -> rows: a salted term has one row per docid-range bucket
        # (disjoint ordered runs); scoring sums over a term's rows exactly
        # like it sums over segments
        self.lookup: dict[str, list[int]] = {}
        for i, s in enumerate(self.terms):
            self.lookup.setdefault(s, []).append(i)
        self.df = t["df"].to_numpy(zero_copy_only=False)
        self.kind = t["kind"].to_numpy(zero_copy_only=False)
        self._post = t["postings"]
        self._skips = t["skips"]
        self._cache: dict[int, tuple] = {}
        self._dense_cache: dict[int, np.ndarray] = {}
        self._contrib_cache: dict[int, np.ndarray] = {}

    def postings(self, row: int):
        got = self._cache.get(row)
        if got is None:
            got = decode_postings(self._post[row].as_py(), self._skips[row].as_py())
            if len(self._cache) < self.MAX_CACHE:
                self._cache[row] = got
        return got

    def postings_dense(self, row: int, all_docids: np.ndarray):
        """One row's docids as dense ranks into ``all_docids`` (the
        reader's sorted global docid array) — int32, cached per row like
        the decoded postings. Returns None if any posting docid is absent
        from the dense space (a docmap/postings mismatch; callers fall
        back to the classic path rather than mis-rank silently)."""
        got = self._dense_cache.get(row)
        if got is None:
            docs = self.postings(row)[0].astype(np.int64)
            pos = np.searchsorted(all_docids, docs)
            clam = np.minimum(pos, len(all_docids) - 1)
            if not np.array_equal(all_docids[clam], docs):
                return None
            got = clam.astype(np.int32)
            if len(self._dense_cache) < self.MAX_CACHE:
                self._dense_cache[row] = got
        return got

    def contrib(self, row: int, idf: float, tfn_fn):
        """One row's per-posting BM25 contribution ``idf * tfn`` — a pure
        function of the row and the reader's global stats, so it is cached
        per row and recomputed only after ``clear_derived`` (reload: N /
        avgdl and hence idf may shift)."""
        got = self._contrib_cache.get(row)
        if got is None:
            _d, tfs, dls, _p = self.postings(row)
            got = idf * tfn_fn(tfs.astype(np.float64), dls)
            if len(self._contrib_cache) < self.MAX_CACHE:
                self._contrib_cache[row] = got
        return got

    def clear_derived(self) -> None:
        """Drop the stats-derived row caches — dense ranks (the rank space
        shifts with the partial set) and contributions (idf/avgdl shift
        with the manifest) — on IndexReader.reload."""
        self._dense_cache = {}
        self._contrib_cache = {}

    def wildcard_rows(self, fr: str | None, to: str | None, rel: str) -> list[int]:
        """Rows whose tuple term matches a (?,to,rel) / (fr,?,rel) pattern."""
        if self._var_lex is None:
            self._build_var_lexicon()
        if fr is None:
            return self._var_lex.get(("\x00to", to, rel), [])
        return self._var_lex.get(("\x00fr", fr, rel), [])

    _var_lex: dict | None = None

    def _build_var_lexicon(self) -> None:
        # var-lexicon: pattern -> concrete tuple rows (reference populates
        # this at Lexicon.add time — mathindexbase.h:204-234; here it is
        # derived from the segment dictionary once per actor).
        var: dict[tuple, list[int]] = {}
        for i in np.flatnonzero(self.kind == 1):
            fr, to, rel = parse_tuple_term(self.terms[i])
            var.setdefault(("\x00to", to, rel), []).append(int(i))
            var.setdefault(("\x00fr", fr, rel), []).append(int(i))
        self._var_lex = var


class IndexReader:
    """Segments of an index (all, or a subset for sharded serving) + the
    GLOBAL corpus stats: N / avgdl from the manifest and per-term global df
    from the ``term_stats.parquet`` sidecar, so BM25 idf is exact even when
    this reader holds only some partials (scale path: each actor of the
    pool owns a partial subset; docs live in exactly one partial, so
    per-shard results are disjoint and merge by plain top-k union)."""

    def __init__(self, index_dir: str, partials: list[str] | None = None):
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.cfg = EngineConfig.from_json(self.manifest["config"])
        pdir = os.path.join(index_dir, "partials")
        self.partials = list(partials) if partials is not None else list(
            self.manifest["partials"]
        )
        self.segments = [
            Segment(os.path.join(pdir, p, "terms")) for p in self.partials
        ]
        self.N = self.manifest["n_docs"]
        self.avgdl = max(self.manifest["avgdl_text"], 1e-9)
        # live-docs: tombstoned docids never surface in results. Corpus
        # stats (N / avgdl / df) stay pre-delete until purge_deletes — the
        # Lucene visibility rule (deletes hide docs immediately; statistics
        # change at merge time). Loaded once per reader; a long-lived actor
        # pool picks up new deletes on restart.
        from tangent_ray.index.deletes import load_tombstones

        self.tombstones = load_tombstones(index_dir)
        self._docmap: list[tuple[np.ndarray, pa.Array]] | None = None
        self._dense: np.ndarray | None = None
        self._dense_tried = False
        self._index_dir = index_dir
        self._stats: dict[str, int] | None = None
        self._stats_path = os.path.join(index_dir, "term_stats.parquet")
        self._is_subset = partials is not None and set(self.partials) != set(
            self.manifest["partials"]
        )

    def reload(self, partials: list[str] | None = None) -> None:
        """LSM refresh for a resident reader: re-read the manifest, global
        stats and tombstones, attach any NEW partials — segments already in
        memory are reused, so picking up an ``add_increment`` costs one new
        partial load, not a full reload (the Lucene ``IndexReader.reopen``
        model). ``partials`` keeps a sharded reader's subset assignment;
        ``None`` follows the manifest (full reader). Raises if the index
        was rebuilt under a different config — a resident engine must not
        silently switch tokenization parameters mid-flight."""
        with open(os.path.join(self._index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        if EngineConfig.from_json(self.manifest["config"]) != self.cfg:
            raise ValueError(
                "index config changed under a resident reader; build a new "
                "reader instead of reload()"
            )
        have = dict(zip(self.partials, self.segments))
        pdir = os.path.join(self._index_dir, "partials")
        new_parts = list(partials) if partials is not None else list(
            self.manifest["partials"]
        )
        self.segments = [
            have.get(p) or Segment(os.path.join(pdir, p, "terms"))
            for p in new_parts
        ]
        self.partials = new_parts
        self.N = self.manifest["n_docs"]
        self.avgdl = max(self.manifest["avgdl_text"], 1e-9)
        from tangent_ray.index.deletes import load_tombstones

        self.tombstones = load_tombstones(self._index_dir)
        # finalize_index rewrites the sidecars; drop every derived cache
        self._stats = None
        self._vocab = None
        self._docmap = None
        # the dense rank space shifts when the partial set changes, so the
        # per-row dense caches inside every (reused) segment are stale too
        self._dense = None
        self._dense_tried = False
        for s in self.segments:
            s.clear_derived()
        self._is_subset = partials is not None and set(self.partials) != set(
            self.manifest["partials"]
        )

    def dense_docids(self) -> np.ndarray | None:
        """Sorted global docid array of THIS reader's partials — the dense
        rank space of the hot-term TAAT fast path (``rank ==`` position in
        this array, so rank order == docid order and score accumulation
        becomes one ``np.bincount`` instead of a 62-bit-key sort; the
        per-segment dense-ordinal idea every production engine uses, done
        as a reader-side view so the on-disk format stays unchanged).
        Built from the per-partial docmap sidecars; ``None`` when any held
        partial lacks one (pre-sidecar indexes, corpora without dockeys) —
        callers fall back to the classic sort-based TAAT."""
        if self._dense is None and not self._dense_tried:
            self._dense_tried = True
            pdir = os.path.join(self._index_dir, "partials")
            parts: list[np.ndarray] = []
            for p in self.partials:
                dmdir = os.path.join(pdir, p, "docmap")
                if not os.path.isdir(dmdir):
                    return None
                parts.append(
                    pq.read_table(dmdir, columns=["docid"])[
                        "docid"
                    ].to_numpy(zero_copy_only=False).astype(np.int64)
                )
            if parts:
                self._dense = np.sort(np.concatenate(parts))
        return self._dense

    def global_df(self, term: str) -> int:
        # a full reader computes exact global df from its own segments; the
        # sidecar is needed ONLY for sharded serving (subset readers), and
        # even then just its kind==0 (text) rows — global_df is a BM25-only
        # lookup, and pulling the math-tuple vocabulary (up to 1e8 terms)
        # into every actor would defeat the sharded memory bound
        if not self._is_subset:
            return sum(
                int(s.df[r])
                for s in self.segments
                for r in s.lookup.get(term, ())
            )
        terms, dfs = self._load_stats()
        i = int(np.searchsorted(terms, term))
        if i < len(dfs) and terms[i] == term:
            return int(dfs[i])
        return 0

    def _load_stats(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted text terms, global df) from the term_stats sidecar."""
        if self._stats is None:
            if not os.path.exists(self._stats_path):
                raise FileNotFoundError(
                    "sharded serving needs the term_stats.parquet sidecar "
                    "(re-run finalize_index)"
                )
            import pyarrow.compute as pc_

            t = pq.read_table(self._stats_path, columns=["term", "kind", "df"])
            t = t.filter(pc_.equal(t["kind"], 0)).combine_chunks()
            order = pc_.sort_indices(t["term"])
            terms = (
                t["term"].take(order).to_numpy(zero_copy_only=False)
            )  # sorted; searchsorted replaces a per-term Python dict
            dfs = t["df"].take(order).to_numpy(zero_copy_only=False)
            self._stats = (terms, dfs)
        return self._stats

    _vocab: tuple[np.ndarray, np.ndarray] | None = None

    def text_vocab(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted unique TEXT terms, global df aligned) — the expansion
        lexicon for prefix queries. A full reader derives it once from its
        own segments; a subset (sharded-serving) reader reads the
        term_stats sidecar so expansion — and therefore the blended df and
        idf — is identical on every shard regardless of which terms that
        shard happens to hold."""
        if self._is_subset:
            return self._load_stats()
        if self._vocab is None:
            import pyarrow.compute as pc_

            parts = [
                s.table.select(["term", "kind", "df"]).filter(
                    pc_.equal(s.table["kind"], 0)
                )
                for s in self.segments
            ]
            t = pa.concat_tables(parts) if parts else pa.table(
                {"term": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64())}
            )
            # vectorized: one Arrow group_by sum (salted/bucketed rows of a
            # term fold here) + one sort — no Python loop over the vocab
            g = t.group_by("term").aggregate([("df", "sum")])
            order = pc_.sort_indices(g["term"])
            terms = g["term"].take(order).to_numpy(zero_copy_only=False)
            dfs = (
                g["df_sum"].take(order).to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            self._vocab = (terms, dfs)
        return self._vocab

    def _vocab_range(self, prefix: str) -> tuple[np.ndarray, np.ndarray]:
        """The lexicon slice whose terms start with ``prefix`` (the whole
        vocabulary for an empty prefix) — the ONE range-probe idiom shared
        by prefix expansion, wildcard expansion, and autocomplete."""
        terms, dfs = self.text_vocab()
        if not prefix:
            return terms, dfs
        lo = int(np.searchsorted(terms, prefix))
        hi = int(np.searchsorted(terms, prefix + "\uffff"))
        return terms[lo:hi], dfs[lo:hi]

    @staticmethod
    def _rank_cut(
        cand_t: np.ndarray, cand_df: np.ndarray, n: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """The ONE (global df desc, term asc) rank + cap rule shared by
        every expansion surface."""
        order = np.lexsort((cand_t, -cand_df))[:n]
        return cand_t[order], cand_df[order]

    def _prefix_ranked(
        self, prefix: str, n: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Ranked-and-capped lexicon range for ``prefix`` (see
        ``_vocab_range`` / ``_rank_cut``)."""
        return self._rank_cut(*self._vocab_range(prefix), n)

    def expand_prefix(self, prefix: str, max_expansions: int) -> list[str]:
        """Concrete index terms matching ``prefix*``, capped at
        ``max_expansions`` by (global df desc, term asc) — the Lucene
        MultiTermQuery rewrite rule of keeping the most frequent terms.
        Deterministic and shard-consistent (see ``text_vocab``)."""
        t, _ = self._prefix_ranked(prefix, max_expansions)
        return [str(x) for x in t]

    def expand_wildcard(self, pattern: str, max_expansions: int) -> list[str]:
        """Concrete index terms matching a glob ``pattern`` (``*`` = any
        run, ``?`` = one char — Lucene WildcardQuery), capped like
        ``expand_prefix``. The scan is narrowed to the pattern's literal
        prefix range first, so ``te*m`` touches only ``te``-terms; a
        LEADING wildcard scans the whole text vocabulary (the same
        documented cost Lucene's leading-wildcard queries pay)."""
        import fnmatch

        pre = re.split(r"[*?]", pattern, 1)[0]
        cand_t, cand_df = self._vocab_range(pre)
        if not len(cand_t):
            return []
        rx = re.compile(fnmatch.translate(pattern))
        keep = np.fromiter(
            (rx.match(t) is not None for t in cand_t), dtype=bool,
            count=len(cand_t),
        )
        t, _ = self._rank_cut(cand_t[keep], cand_df[keep], max_expansions)
        return [str(x) for x in t]

    def expand_regexp(self, pattern: str, max_expansions: int) -> list[str]:
        """Concrete index terms FULLY matching a regular expression (Lucene
        RegexpQuery semantics: the pattern is implicitly anchored), capped
        at ``max_expansions`` by (global df desc, term asc) like
        ``expand_prefix``. The scan narrows to the pattern's literal
        prefix range first (the chars before the first regex
        metacharacter, minus one when a quantifier binds the last literal),
        so ``tabl.s`` touches only ``tabl``-terms; a pattern with no
        literal prefix scans the whole text vocabulary — the same
        documented cost Lucene regexp queries pay. Deterministic and
        shard-consistent (see ``text_vocab``). A top-level alternation
        (``tab.*|join``) makes any literal prefix non-mandatory, so those
        patterns always take the whole-vocabulary scan."""
        m = re.match(r"[a-z0-9]*", pattern)
        pre = m.group(0) if m else ""
        if pre and pattern[len(pre) : len(pre) + 1] in ("*", "?", "+", "{"):
            pre = pre[:-1]  # quantifier binds the last literal char
        if pre and _has_toplevel_alt(pattern):
            pre = ""  # the branch after '|' need not start with the prefix
        cand_t, cand_df = self._vocab_range(pre)
        if not len(cand_t):
            return []
        rx = re.compile(pattern)
        keep = np.fromiter(
            (rx.fullmatch(t) is not None for t in cand_t), dtype=bool,
            count=len(cand_t),
        )
        t, _ = self._rank_cut(cand_t[keep], cand_df[keep], max_expansions)
        return [str(x) for x in t]

    _fuzzy_lens: np.ndarray | None = None
    _fuzzy_suggester = None
    _fuzzy_suggester_tried: bool = False

    @staticmethod
    def _lev_banded(
        word: str, cand: np.ndarray, cand_len: np.ndarray, d: int
    ) -> np.ndarray:
        """Levenshtein distances ``lev(word, cand[i])`` saturated at
        ``d + 1`` (the Ukkonen band cutoff: cells more than ``d`` off the
        diagonal can never feed a ``<= d`` result, so only the band is
        computed) — one vectorized DP over ALL candidates at once, no
        Python loop over the lexicon. Distances ``<= d`` are exact."""
        m_max = int(cand_len.max())
        chars = cand.astype(f"<U{m_max}").view(np.uint32).reshape(
            len(cand), m_max
        )
        w = np.frombuffer(word.encode("utf-32-le"), dtype=np.uint32)
        big = np.int32(d + 1)
        prev = np.broadcast_to(
            np.minimum(np.arange(m_max + 1, dtype=np.int32), big),
            (len(cand), m_max + 1),
        ).copy()
        cur = np.empty_like(prev)
        for i, ch in enumerate(w, 1):
            cur.fill(big)
            if i <= d:
                cur[:, 0] = i
            lo, hi = max(1, i - d), min(m_max, i + d)
            neq = chars != ch
            for j in range(lo, hi + 1):
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
                np.minimum(cur[:, j], prev[:, j - 1] + neq[:, j - 1],
                           out=cur[:, j])
                np.minimum(cur[:, j], big, out=cur[:, j])
            prev, cur = cur, prev
        return prev[np.arange(len(cand)), cand_len]

    def expand_fuzzy(
        self, word: str, max_edits: int, max_expansions: int
    ) -> list[str]:
        """Concrete index terms within Levenshtein distance ``max_edits``
        of ``word`` (Lucene FuzzyQuery, edits clamped to 2 like Lucene's
        ``LevenshteinAutomata`` limit), ranked (distance asc, global df
        desc, term asc) and capped at ``max_expansions``. ``word`` itself
        is included when indexed (distance 0 ranks first). Matches the
        INDEXED vocabulary as-is (post-stem terms), shard-consistent via
        ``text_vocab``. Serving path: when the SymSpell deletes sidecar
        (``build_suggest_index``) is present and fresh, expansion is
        O(variants(word) log V) hash probes; otherwise one vectorized
        banded-DP scan of the length-windowed lexicon slice — the same
        documented full-vocabulary cost a leading-wildcard query pays."""
        from tangent_ray.query.fuzzy import MAX_TERM_LEN

        d = max(0, min(int(max_edits), 2))
        terms, dfs = self.text_vocab()
        i = int(np.searchsorted(terms, word))
        indexed = i < len(terms) and terms[i] == word
        if d == 0 or max_expansions <= 0:
            return [word] if indexed and max_expansions > 0 else []
        via = self._suggester()
        if via is not None:
            ranked = via.suggest(word, max_edit=d, topn=max_expansions)
            members = ([word] if indexed else []) + [t for t, _, _ in ranked]
            return members[:max_expansions]
        if self._fuzzy_lens is None:
            self._fuzzy_lens = np.fromiter(
                (len(t) for t in terms), np.int32, count=len(terms)
            )
        lens = self._fuzzy_lens
        keep = (np.abs(lens - len(word)) <= d) & (lens > 0) & (
            lens <= MAX_TERM_LEN  # parity with the sidecar's junk guard
        )
        cand, cdf, clen = terms[keep], dfs[keep], lens[keep]
        if not len(cand):
            return []
        dist = self._lev_banded(word, cand, clen, d)
        ok = dist <= d
        cand, cdf, dist = cand[ok], cdf[ok], dist[ok]
        order = np.lexsort((cand, -cdf.astype(np.int64), dist))
        return [str(x) for x in cand[order][:max_expansions]]

    def _suggester(self):
        """The SymSpell deletes sidecar as a fuzzy-expansion accelerator —
        used only when present, FRESH (partials fingerprint matches), and
        built lossless (min_df=1, max_edit=2); anything else falls back to
        the exact lexicon scan rather than serving a stale or pruned
        vocabulary."""
        if not self._fuzzy_suggester_tried:
            self._fuzzy_suggester_tried = True
            from tangent_ray.query.fuzzy import SUGGEST_NAME, Suggester

            path = os.path.join(self._index_dir, SUGGEST_NAME)
            if os.path.exists(path):
                try:
                    meta = pq.read_schema(path).metadata or {}
                    if (
                        meta.get(b"min_df", b"1") == b"1"
                        and int(meta.get(b"max_edit", b"2").decode()) >= 2
                    ):
                        self._fuzzy_suggester = Suggester(self._index_dir)
                except (ValueError, OSError, KeyError):
                    self._fuzzy_suggester = None
        return self._fuzzy_suggester

    def complete(self, prefix: str, n: int = 10) -> pa.Table:
        """Autocomplete: the top-``n`` vocabulary completions of ``prefix``
        by (global df desc, term asc) — the suggest-as-you-type surface,
        served from the same expansion lexicon as prefix queries."""
        t, df = self._prefix_ranked(prefix, n)
        return pa.table(
            {
                "term": pa.array([str(x) for x in t], pa.string()),
                "df": pa.array(df.astype(np.int64), pa.int64()),
            }
        )

    def dockey_of(self, docids: np.ndarray) -> list[str]:
        from tangent_ray.sources.corpus import (
            KeyedCorpus,
            TranscriptsCorpus,
            corpus_from_json,
        )

        corpus = corpus_from_json(self.manifest["corpus"])
        if not isinstance(corpus, (TranscriptsCorpus, KeyedCorpus)):
            # documents: dockey IS the stringified id — no sidecar needed
            return [str(int(d)) for d in docids]
        if self._docmap is None:
            # per-partial docmap sidecars (sorted id arrays + key arrays,
            # searchsorted lookup): a reader pays memory only for the
            # partials it actually holds — the sharded-serving scale path.
            # Indexes built before the sidecar existed fall back to
            # rederiving the map from the partial manifests' input_files
            # (docid = blake2b(dockey) is a pure function of the keys).
            maps: list[tuple[np.ndarray, pa.Array]] = []
            pdir = os.path.join(self._index_dir, "partials")
            legacy_files: set[str] = set()
            for p in self.partials:
                dmdir = os.path.join(pdir, p, "docmap")
                if os.path.isdir(dmdir):
                    t = pq.read_table(dmdir)
                    ids = t["docid"].to_numpy(zero_copy_only=False)
                    order = np.argsort(ids)
                    keys = t["dockey"].combine_chunks().take(
                        pa.array(order)
                    )
                    maps.append((ids[order], keys))
                else:
                    with open(os.path.join(pdir, p, "_MANIFEST.json")) as f:
                        legacy_files.update(json.load(f)["input_files"])
            if legacy_files and isinstance(corpus, TranscriptsCorpus):
                from tangent_ray.docids import (
                    dockeys_to_docids,
                    transcript_dockeys,
                )

                for fp in sorted(legacy_files):
                    t = pq.read_table(fp, columns=["conv_id", "turn_idx"])
                    keys = transcript_dockeys(t)
                    if isinstance(keys, pa.ChunkedArray):
                        keys = keys.combine_chunks()
                    ids = dockeys_to_docids(keys.to_pylist())
                    order = np.argsort(ids)
                    maps.append((ids[order], keys.take(pa.array(order))))
            elif legacy_files:
                # keyed corpus: re-read the key columns from the inputs
                for fp in sorted(legacy_files):
                    t = pq.read_table(fp, columns=["doc_id", "dockey"])
                    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                    order = np.argsort(ids)
                    maps.append(
                        (
                            ids[order],
                            t["dockey"].combine_chunks().take(
                                pa.array(order)
                            ),
                        )
                    )
            self._docmap = maps
        q = np.asarray(docids, dtype=np.int64)
        res: list[str | None] = [None] * len(q)
        for ids_sorted, keys in self._docmap:
            if not len(ids_sorted):
                continue
            pos = np.searchsorted(ids_sorted, q)
            pos_c = np.minimum(pos, len(ids_sorted) - 1)
            hit = np.flatnonzero(ids_sorted[pos_c] == q)
            if len(hit):
                found = keys.take(pa.array(pos_c[hit])).to_pylist()
                for j, v in zip(hit, found):
                    if res[j] is None:
                        res[j] = v
        return [
            r if r is not None else str(int(d)) for r, d in zip(res, q)
        ]


def _has_toplevel_alt(pattern: str) -> bool:
    """True when ``pattern`` carries an alternation at paren depth 0
    (outside character classes and escapes) — e.g. ``tab.*|join``. A
    top-level branch invalidates literal-prefix narrowing: the other
    branch's matches need not start with the prefix."""
    depth = 0
    in_class = False
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif c == "|" and depth == 0:
            return True
        i += 1
    return False


def _bm25_idf(N: int, df: np.ndarray | int) -> np.ndarray | float:
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


_BMW_END = 1 << 63  # past any 63-bit docid


class _BMWIter:
    """One posting list's cursor for block-max WAND: per-block score caps
    from the skip table ``(max_tf, min_dl)``, galloping block seek via
    ``searchsorted`` over block-last docids (the skip-block analogue of
    ``IDIterPL::skip``, ``mathindexmid.h:100-132``), blocks decoded lazily
    only when the cursor actually enters them."""

    __slots__ = (
        "idf", "k1", "b", "avgdl", "plan_pos", "post", "skips", "lasts",
        "block_ubs", "gub", "bi", "docs", "tfs", "dls", "pi", "cur", "ncum",
    )

    def __init__(self, idf, seg, row, k1, b, avgdl, plan_pos):
        from tangent_ray.index.codec import decode_skips

        self.idf = float(idf)
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.plan_pos = plan_pos
        self.post = seg._post[row].as_py()
        self.skips = decode_skips(seg._skips[row].as_py())
        self.lasts = self.skips["last"]
        mtf = self.skips["maxtf"].astype(np.float64)
        mdl = self.skips["mindl"].astype(np.float64)
        tfn = mtf * (k1 + 1.0) / (mtf + k1 * (1.0 - b + b * mdl / avgdl))
        self.block_ubs = self.idf * tfn
        self.gub = float(self.block_ubs.max()) if len(self.block_ubs) else 0.0
        self.ncum = np.concatenate(
            [[0], np.cumsum(self.skips["n"].astype(np.int64))]
        )
        self.cur = _BMW_END
        if len(self.lasts):
            self._load(0)

    def progress(self) -> int:
        """Postings passed so far (for the mid-flight cost estimate)."""
        if self.cur == _BMW_END:
            return int(self.ncum[-1])
        return int(self.ncum[self.bi]) + self.pi

    def _load(self, bi: int) -> None:
        from tangent_ray.index.codec import decode_block

        if bi >= len(self.lasts):
            self.cur = _BMW_END
            return
        self.bi = bi
        d, t, l, _ = decode_block(self.post, self.skips, bi)
        self.docs, self.tfs, self.dls = d, t, l
        self.pi = 0
        self.cur = int(d[0])

    def advance_to(self, target: int) -> None:
        """Move cursor to the first docid >= target."""
        if self.cur >= target:
            return
        if int(self.lasts[self.bi]) < target:
            nbi = int(np.searchsorted(self.lasts, np.uint64(target)))
            self._load(nbi)
            if self.cur >= target:
                return
            if self.cur == _BMW_END:
                return
        pi = int(np.searchsorted(self.docs, np.uint64(target)))
        self.pi = pi
        self.cur = int(self.docs[pi])

    def advance_past(self, doc: int) -> None:
        if self.cur > doc:
            return
        if self.pi + 1 < len(self.docs):
            self.pi += 1
            self.cur = int(self.docs[self.pi])
        else:
            self._load(self.bi + 1)

    def block_ub(self, pivot: int) -> float:
        """Score cap of the block that would contain ``pivot``."""
        bi = self.bi
        if int(self.lasts[bi]) < pivot:
            bi = int(np.searchsorted(self.lasts, np.uint64(pivot)))
            if bi >= len(self.lasts):
                return 0.0
        return float(self.block_ubs[bi])

    def score_at(self) -> float:
        """BM25 contribution at the current cursor (same op order as TAAT)."""
        tf = float(self.tfs[self.pi])
        dl = float(self.dls[self.pi])
        tfn = tf * (self.k1 + 1.0) / (
            tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        )
        return self.idf * tfn


class QueryScorer:
    """map_batches actor: a batch of queries in, top-k result rows out.

    Query batch columns: ``query_id`` (string), ``kind``
    ("text"|"math"|"mixed"), ``text`` (the raw query string; ``$...$`` spans
    are formula fragments; a ``-term`` token excludes every doc containing
    that term — boolean NOT, applied exactly on all scoring paths), optional
    ``topk`` (int).

    Text-query clause syntax beyond plain terms: ``prefix*`` / glob
    ``t?st`` wildcards, ``{a,b}`` synonym groups, ``term~d`` fuzzy,
    ``term^2`` boosts, ``#col:value`` / ``#col>n`` metadata filters,
    ``-clause`` negation of any of these — and quoted phrases:
    ``"a b"`` (exact), ``"a b"~2`` (ordered slop), ``"a b"^2`` (boost),
    ``-"a b"`` (prohibited). Phrase clauses score as BM25 pseudo-terms
    (tf = sloppy-phrase frequency via the positional postings, df = the
    phrase's global matching-doc count) and need a positional source:
    the ``<index_dir>/positions`` sidecar auto-attaches, or call
    ``attach_positions``.
    """

    def __init__(self, index_dir: str, topk: int | None = None,
                 partials: list[str] | None = None, positions=None):
        self.reader = IndexReader(index_dir, partials=partials)
        self.cfg = self.reader.cfg
        self.topk = topk or self.cfg.topk
        self._dead = self.reader.tombstones  # per-query: tombstones + NOTs
        self._facets = None  # lazy FacetCounter, built on first #col:value
        # positional-postings source for quoted-phrase clauses ("a b"~s):
        # an explicit ``positions`` (a dir, or a PositionalEngine — engine
        # HANDLES pickle light, so actor-pool scorers can all share one
        # resident engine's part actors) wins; else the conventional
        # <index_dir>/positions sidecar auto-attaches when present;
        # otherwise attach_positions(). None = phrase syntax raises
        self.positions: str | None = positions
        if positions is None:
            _pos = os.path.join(index_dir, "positions")
            if os.path.isdir(_pos):
                self.positions = _pos
        #: last seen positional-source signature (see
        #: ``_check_positions_fresh``) — None until the first phrase query
        self._pos_sig: tuple | None = None
        #: per-(terms, slop) global phrase postings (docids, tfs) — bounded
        self._phrase_cache: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
        #: per-(terms, slop) masked (docids, tfn, df) legs — _phrase_leg
        self._phrase_leg_cache: dict[tuple, tuple] = {}
        #: ES/Solr-style query-result cache (top-k calls only; k=None
        #: full-candidate calls are never cached): a repeat hot-phrase
        #: query re-materialized a multi-million-doc candidate merge per
        #: call (~450 ms at 20M turns). Keyed on the RAW inputs, cleared
        #: on refresh/attach_positions.
        self._result_cache: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
        # text legs computed by mixed_text_bounds (phase 1 of sharded
        # fusion), keyed by raw query text; popped by the phase-2
        # score_query so the leg is never computed twice. Replaced
        # wholesale per phase-1 batch, cleared on refresh().
        self._mixed_leg_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        #: per-term dense (ids, contrib) vectors — see _dense_term_vec
        self._term_vecs: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        #: per-group dense (nz, tfn, n_postings) legs — see _dense_group_vec
        self._group_vecs: dict[tuple, tuple] = {}
        #: per-query instrumentation (reference `I` rows): qt_ms, postings
        #: touched, query terms with matches, candidate docs, returned rows
        self.last_stats: dict = {}

    def refresh(self, partials: list[str] | None = None) -> None:
        """Pick up index changes (``add_increment`` / ``delete_docs``)
        without a restart: reload the reader (reusing loaded segments) and
        drop every scorer-side cache derived from it."""
        self.reader.reload(partials)
        self._dead = self.reader.tombstones
        self._facets = None
        self._mixed_leg_cache = {}
        self._term_vecs = {}
        self._group_vecs = {}
        self._phrase_cache = {}
        self._phrase_leg_cache = {}
        self._result_cache = {}

    def attach_positions(self, src) -> None:
        """Attach a positional-postings source for quoted-phrase clauses:
        a positional index dir (``build_position_index`` output; resident
        cached reader, increments/deletes auto-detected) or any object
        with ``fetch_terms(terms)`` (e.g. a ``PositionalEngine``). A dir
        path loads the WHOLE positional index into this process (a
        doc-partitioned dir included — the reader merges parts); serving
        pools past one node's heap should attach a ``PositionalEngine``,
        whose doc-partitioned broadcast keeps postings on its actors."""
        self.positions = src
        self._pos_sig = None
        self._phrase_cache = {}
        self._phrase_leg_cache = {}
        self._result_cache = {}

    def _check_positions_fresh(self) -> None:
        """Drop the phrase-derived caches when the attached positional
        source changed: a dir source is watched via its stat signature
        (``positions_sig`` — the same check ``positions_reader`` runs), an
        engine source via its ``postings_sig()`` generation counter
        (bumped by ``PositionalEngine.refresh``)."""
        src = self.positions
        if isinstance(src, str):
            from tangent_ray.index.positions import positions_sig

            sig = ("dir", positions_sig(src))
        else:
            hook = getattr(src, "postings_sig", None)
            if hook is None:
                return
            sig = ("obj", hook())
        if sig != self._pos_sig:
            if self._pos_sig is not None:
                self._phrase_cache = {}
                self._phrase_leg_cache = {}
                self._result_cache = {}
            self._pos_sig = sig

    def __call__(
        self, batch: pa.Table,
        mixed_bounds: dict[str, tuple[float, float]] | None = None,
    ) -> pa.Table:
        qids: list[str] = []
        ranks: list[np.ndarray] = []
        docids: list[np.ndarray] = []
        scores: list[np.ndarray] = []
        topks = (
            batch["topk"].to_pylist()
            if "topk" in batch.column_names
            else [self.topk] * batch.num_rows
        )
        kinds = (
            batch["kind"].to_pylist()
            if "kind" in batch.column_names
            else ["text"] * batch.num_rows
        )
        # optional search_after cursor columns (null = first page); a
        # cursor needs BOTH halves — a score without a docid cannot break
        # ties and silently paging from a fabricated (score, 0) cursor
        # would drop tied rows, so malformed cursors are rejected loudly
        if "after_score" in batch.column_names:
            if "after_docid" not in batch.column_names:
                raise ValueError(
                    "after_score without after_docid: a search_after "
                    "cursor is the (score, docid) pair of the previous "
                    "page's last row"
                )
            afters = []
            for s_, d_ in zip(
                batch["after_score"].to_pylist(),
                batch["after_docid"].to_pylist(),
            ):
                if (s_ is None) != (d_ is None):
                    raise ValueError(
                        "malformed search_after cursor: after_score and "
                        "after_docid must be both set or both null"
                    )
                afters.append(None if s_ is None else (float(s_), int(d_)))
        else:
            afters = [None] * batch.num_rows
        for qid, kind, text, k, after in zip(
            batch["query_id"].to_pylist(), kinds, batch["text"].to_pylist(),
            topks, afters,
        ):
            d, s = self.score_query(
                text, kind, int(k or self.topk), after=after,
                mixed_bounds=(mixed_bounds or {}).get(qid),
            )
            qids.extend([qid] * len(d))
            ranks.append(np.arange(1, len(d) + 1, dtype=np.int32))
            docids.append(d)
            scores.append(s)
        alld = np.concatenate(docids) if docids else np.empty(0, dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(qids, type=pa.string()),
                pa.array(
                    np.concatenate(ranks) if ranks else np.empty(0, dtype=np.int32),
                    type=pa.int32(),
                ),
                pa.array(alld.astype(np.int64), type=pa.int64()),
                pa.array(self.reader.dockey_of(alld), type=pa.string()),
                pa.array(
                    np.concatenate(scores) if scores else np.empty(0, dtype=np.float64),
                    type=pa.float64(),
                ),
            ],
            schema=RESULT_SCHEMA,
        )

    # ------------------------------------------------------------------
    def parse_query(self, text: str) -> tuple[list[str], Counter, int, int]:
        """Split a query into (text terms, tuple bag, qtc, n_formulae).

        Formula fragments are ``$...$`` SLT spans or ``<math>...</math>``
        Presentation MathML (the reference topic format, ``query.py:96-114``
        — converted through the MathML front end).
        """
        spans = _MATH_RE.findall(text)
        stripped = _MATH_RE.sub(" ", text)
        if "<math" in stripped or ":math" in stripped:
            from tangent_ray.tokenize.mathml import (
                MATHML_SPAN_RE,
                MathMLError,
                mathml_to_slt,
            )

            for m in MATHML_SPAN_RE.findall(stripped):
                try:
                    spans.append(mathml_to_slt(m).serialize())
                except MathMLError:
                    pass
            stripped = MATHML_SPAN_RE.sub(" ", stripped)
        _, terms, _, _, _ = tokenize_text(pa.array([stripped]), stem=self.cfg.stem)
        bag: Counter = Counter()
        qtc = 0
        n_formulae = 0
        for slt in spans:
            try:
                root = parse_slt(slt)
            except SLTParseError:
                continue
            n_formulae += 1
            for fr, to, rel, _loc in slt_tuples(root, self.cfg.window, self.cfg.eol):
                qtc += 1
                if is_wildcard(fr) and is_wildcard(to):
                    qtc -= 1  # unsupported both-var tuples (reference warns)
                    continue
                if is_wildcard(fr):
                    bag[("var", None, to, rel)] += 1
                elif is_wildcard(to):
                    bag[("var", fr, None, rel)] += 1
                else:
                    bag[tuple_term(fr, to, rel)] += 1
        return sorted(set(terms.to_pylist())), bag, qtc, n_formulae

    # -- boolean NOT -----------------------------------------------------
    #: ``-term``, ``-term*`` (negated prefix), ``-term~1`` (negated
    #: fuzzy), ``-{a,b}`` (negated group); the fuzzy alternative is first
    #: so ``-roam~1`` never half-parses as ``-roam`` + stray ``~1``
    _NEG_RE = re.compile(
        r"(?<![\w*?])-(/(?:\\.|[^/\\\s])+/"
        r"|[a-z0-9]+~\d?"
        r"|[a-z0-9*?]*[a-z0-9][a-z0-9*?]*"
        r"|\{[a-z0-9]+(?:[,|][a-z0-9]+)*\})",
        re.IGNORECASE,
    )

    def _split_negations(self, text: str) -> tuple[str, list[str]]:
        """Strip ``-term`` exclusions from the query text (outside $math$
        spans) and return (cleaned text, stemmed excluded terms).

        A negated wildcard ``-spar*`` / ``-t?st`` excludes docs containing
        ANY indexed term matching the glob (full expansion, no Lucene
        cap — exclusion must be complete or docs the user asked to drop
        still rank); ``-term~1`` likewise excludes every term within the
        edit distance; a negated group ``-{a,b}`` excludes all members. A
        lone trailing ``?`` is punctuation (``-beta?`` == ``-beta``),
        mirroring the positive-query rule."""
        # MathML-format topics (the reference query format) carry hyphens
        # in markup; NOT syntax applies only to plain/SLT-span queries
        if "-" not in text or "<math" in text or ":math" in text:
            return text, []
        pieces: list[str] = []
        raw: list[str] = []
        pos = 0
        for m in _MATH_RE.finditer(text):  # never rewrite inside a formula
            seg = text[pos : m.start()]
            raw.extend(g.lower() for g in self._NEG_RE.findall(seg))
            pieces.append(self._NEG_RE.sub(" ", seg))
            pieces.append(m.group(0))
            pos = m.end()
        seg = text[pos:]
        raw.extend(g.lower() for g in self._NEG_RE.findall(seg))
        pieces.append(self._NEG_RE.sub(" ", seg))
        negs: list[str] = []
        literals: list[str] = []
        for g in raw:
            if g.startswith("/"):
                # negated regexp: exclude the FULL match set (no cap)
                negs.extend(self.reader.expand_regexp(g[1:-1], 1 << 30))
            elif g.startswith("{"):
                literals.extend(t for t in re.split(r"[,|]", g[1:-1]) if t)
            elif "~" in g:
                # negated fuzzy: exclude the FULL expansion (no cap), the
                # same completeness rule as negated wildcards
                base, _, dd = g.partition("~")
                negs.extend(self.reader.expand_fuzzy(
                    base, 2 if dd == "" else min(int(dd), 2), 1 << 30
                ))
            elif g.endswith("?") and "*" not in g and "?" not in g[:-1]:
                literals.append(g[:-1])  # trailing ? = punctuation
            elif re.fullmatch(r"[a-z0-9]+\*", g):
                negs.extend(
                    self.reader.expand_prefix(g[:-1], 1 << 30)
                )  # pre-stemmed: indexed vocabulary
            elif "*" in g or "?" in g:
                negs.extend(self.reader.expand_wildcard(g, 1 << 30))
            else:
                literals.append(g)
        if self.cfg.stem and literals:
            from tangent_ray.tokenize.porter import porter_stem

            literals = [porter_stem(t) for t in literals]
        return "".join(pieces), sorted(set(negs + literals))

    def _excluded_docs(self, neg_terms: list[str]) -> np.ndarray:
        """Sorted unique docids containing ANY excluded term (bounded by
        those terms' df — decoded once per query from the postings)."""
        cand: list[np.ndarray] = []
        for term in neg_terms:
            for seg in self.reader.segments:
                for row in seg.lookup.get(term, ()):
                    cand.append(seg.postings(row)[0].astype(np.int64))
        if not cand:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(cand))

    # -- query expansion (prefix / synonym groups) + boosts + filters ----
    #: any glob token — ``te*m``, ``t?st``, ``*ing`` (Lucene
    #: WildcardQuery); a trailing-star-only token takes the prefix-range
    #: fast path, a LONE trailing ``?`` is treated as punctuation
    _WILD_RE = re.compile(
        r"(?<![\w*?])(?=[a-z0-9]*[*?])([a-z0-9*?]*[a-z0-9][a-z0-9*?]*)"
        r"(?:\^(\d+(?:\.\d+)?))?",
        re.IGNORECASE,
    )
    #: ``{a,b,c}`` / ``{a|b|c}`` — a query-time synonym group; ``^boost``
    _SYN_RE = re.compile(
        r"\{([a-z0-9]+(?:[,|][a-z0-9]+)*)\}(?:\^(\d+(?:\.\d+)?))?",
        re.IGNORECASE,
    )
    #: ``term^2`` — a boosted plain term (scored as a singleton group)
    _BOOST_RE = re.compile(r"(?<![\w^])([a-z0-9]+)\^(\d+(?:\.\d+)?)",
                           re.IGNORECASE)
    #: ``term~`` / ``term~1`` / ``term~2`` — Lucene FuzzyQuery (bare ``~``
    #: = 2, the Lucene default; larger digits clamp to 2); optional
    #: ``^boost``. Never fires inside ``"a b"~slop`` span-near syntax —
    #: the ``~`` there follows a quote, not a word character.
    _FUZZY_RE = re.compile(
        r"(?<![\w*?~])([a-z0-9]+)~(\d)?(?:\^(\d+(?:\.\d+)?))?(?![\w~])",
        re.IGNORECASE,
    )
    #: ``/pat/`` — Lucene RegexpQuery (implicitly anchored full match over
    #: the indexed vocabulary), optional ``^boost``; the body takes no
    #: whitespace and escapes ``/`` as ``\/``
    _REGEX_RE = re.compile(
        r"(?<![\w])/((?:\\.|[^/\\\s])+)/(?:\^(\d+(?:\.\d+)?))?"
    )
    #: ``#col:value`` — a metadata equality filter over the facet sidecar
    #: ``#col:value`` equality; ``#col>n`` / ``#col>=n`` / ``#col<n`` /
    #: ``#col<=n`` numeric range filters
    _FILTER_RE = re.compile(r"(?<!\w)#([A-Za-z_]\w*)(:|>=|<=|>|<)([^\s]+)")
    #: Lucene-style cap on prefix expansion (kept by global-df desc)
    prefix_max_expansions = 128

    # -- required (MUST) clauses -------------------------------------------
    #: ``+term`` — Lucene BooleanQuery MUST: the doc must contain the term
    #: (which still scores as an ordinary SHOULD term). Binds only to a
    #: plain term; ``+`` elsewhere is punctuation.
    #: the trailing lookahead also rejects word characters so a required
    #: wildcard like ``+table*`` cannot backtrack into a partial match
    #: (``+tabl``) — it falls through to the wildcard pass instead
    _MUST_RE = re.compile(r"(?<![\w*?~^\\])\+([a-z0-9]+)(?![a-z0-9*?~/])",
                          re.IGNORECASE)

    def _split_required(self, text: str) -> tuple[str, list[str]]:
        """Strip the ``+`` off ``+term`` tokens (outside $math$ spans) and
        return (text with the bare terms kept for scoring, stemmed
        required terms). Docs missing ANY required term are cut after
        scoring, survivor scores unchanged — Lucene MUST semantics where
        every other clause stays SHOULD."""
        if "+" not in text or "<math" in text or ":math" in text:
            return text, []
        req: list[str] = []

        def repl(m: re.Match) -> str:
            req.append(m.group(1).lower())
            return " " + m.group(1)

        pieces: list[str] = []
        pos = 0
        for m in _MATH_RE.finditer(text):  # never rewrite inside a formula
            pieces.append(self._MUST_RE.sub(repl, text[pos : m.start()]))
            pieces.append(m.group(0))
            pos = m.end()
        pieces.append(self._MUST_RE.sub(repl, text[pos:]))
        if req and self.cfg.stem:
            from tangent_ray.tokenize.porter import porter_stem

            req = [porter_stem(t) for t in req]
        return "".join(pieces), sorted(set(req))

    def _required_mask(self, d: np.ndarray, required: list[str]) -> np.ndarray:
        """Keep-mask: candidate contains EVERY required term (per-term
        postings union across this reader's segments; O(sum df))."""
        keep = np.ones(len(d), dtype=bool)
        for term in required:
            ids = [
                seg.postings(row)[0].astype(np.int64)
                for seg in self.reader.segments
                for row in seg.lookup.get(term, ())
            ]
            if not ids:
                return np.zeros(len(d), dtype=bool)
            have = np.unique(np.concatenate(ids))
            pos = np.minimum(np.searchsorted(have, d), len(have) - 1)
            keep &= have[pos] == d
            if not keep.any():
                break
        return keep

    # -- quoted phrases ---------------------------------------------------
    #: ``"a b"`` exact phrase, ``"a b"~2`` ordered slop (Lucene sloppy
    #: PhraseQuery, inOrder), ``"a b"^2`` boost, ``-"a b"`` prohibited
    #: phrase, ``+"a b"`` required phrase (scored AND must match); an
    #: optional leading ``-``/``+`` binds to the quote
    _PHRASE_RE = re.compile(
        r'([-+]?)"([^"]*)"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?'
    )

    def _split_phrases(
        self, text: str
    ) -> tuple[
        str,
        list[tuple[tuple[str, ...], int, float]],
        list[tuple[tuple[str, ...], int]],
    ]:
        """Strip quoted-phrase clauses from the query text (outside $math$
        spans) and return ``(cleaned text, phrases, negated phrases)``.

        ``phrases``: one ``(terms, slop, boost, required)`` per ``"a b"``
        / ``"a b"~slop`` / ``"a b"^boost`` / ``+"a b"`` clause — scored
        in ``score_query`` as a BM25 pseudo-term whose per-doc tf is the
        sloppy-phrase frequency (``phrase_doc_tfs``) and whose df is the
        phrase's global matching-doc count; a ``+`` (MUST) phrase also
        cuts candidates to its match set. ``negated``: ``(terms, slop)``
        per ``-"a b"`` — docs with an in-order match within slop are
        excluded (Lucene prohibited-phrase clause). Phrase terms are the
        SURFACE tokens (the positional sidecar is unstemmed), so a quoted
        word also serves as Lucene's "exact form" escape in stemmed
        indexes. Runs before the negation/extension splits, so quoted
        bodies are never rewritten by ``-term`` / wildcard / fuzzy syntax.
        """
        if '"' not in text or "<math" in text or ":math" in text:
            return text, [], []
        from tangent_ray.tokenize.text import split_tokens

        phrases: list[tuple[tuple[str, ...], int, float]] = []
        negs: list[tuple[tuple[str, ...], int]] = []

        def repl(m: re.Match) -> str:
            toks = tuple(
                split_tokens(pa.array([m.group(2)], pa.string()))[1]
                .to_pylist()
            )
            if not toks:  # empty quotes / pure punctuation: no-op clause
                return " "
            slop = int(m.group(3) or 0)
            if m.group(1) == "-":
                negs.append((toks, slop))
            else:
                phrases.append(
                    (toks, slop, float(m.group(4) or 1.0),
                     m.group(1) == "+")
                )
            return " "

        pieces: list[str] = []
        pos = 0
        for m in _MATH_RE.finditer(text):  # never rewrite inside a formula
            pieces.append(self._PHRASE_RE.sub(repl, text[pos : m.start()]))
            pieces.append(m.group(0))
            pos = m.end()
        pieces.append(self._PHRASE_RE.sub(repl, text[pos:]))
        return "".join(pieces), phrases, negs

    #: phrase postings cache entries kept hot per scorer
    PHRASE_CACHE = 256
    #: query-result cache entries (top-k rows each — tiny)
    RESULT_CACHE = 512

    def _phrase_tfs(
        self, terms: tuple[str, ...], slop: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Global (docids, sloppy tf) of one phrase clause, cached per
        (terms, slop) until ``refresh``/``attach_positions``."""
        got = self._phrase_cache.get((terms, slop))
        if got is None:
            if self.positions is None:
                raise ValueError(
                    f'phrase clause "{" ".join(terms)}" needs positional '
                    "postings: build_position_index into "
                    "<index_dir>/positions or attach_positions()"
                )
            from tangent_ray.index.positions import phrase_doc_tfs

            got = phrase_doc_tfs(self.positions, list(terms), slop)
            if len(self._phrase_cache) < self.PHRASE_CACHE:
                self._phrase_cache[(terms, slop)] = got
        return got

    def _doclen_of(
        self, docids: np.ndarray, phrase_terms: tuple[str, ...]
    ) -> tuple[np.ndarray, np.ndarray]:
        """(mask, dl) — BM25 doc lengths for the subset of ``docids``
        present in THIS reader's partials, gathered from the main-index
        postings of the rarest phrase term: a phrase-matched doc contains
        every phrase term (the positional tokenizer is ``split_tokens``,
        the index's is ``split_tokens`` + optional stem — same token set),
        and dl is a doc property, so any one posting yields it. Docs
        outside the held partials drop out of the mask — exactly the
        sharded-serving contract (each shard scores its own docs; the
        union over disjoint shards covers every doc once)."""
        terms = list(phrase_terms)
        if self.cfg.stem:
            from tangent_ray.tokenize.porter import porter_stem

            terms = [porter_stem(t) for t in terms]
        best = min(
            set(terms), key=lambda t: (self.reader.global_df(t), t)
        )
        ids_l: list[np.ndarray] = []
        dl_l: list[np.ndarray] = []
        for seg in self.reader.segments:
            for row in seg.lookup.get(best, ()):
                d, _tf, dls, _p = seg.postings(row)
                ids_l.append(d.astype(np.int64))
                dl_l.append(dls)
        if not ids_l:
            return np.zeros(len(docids), dtype=bool), np.empty(0)
        ids = np.concatenate(ids_l)
        dls = np.concatenate(dl_l).astype(np.float64)
        order = np.argsort(ids)
        ids, dls = ids[order], dls[order]
        pos = np.minimum(np.searchsorted(ids, docids), len(ids) - 1)
        mask = ids[pos] == docids
        return mask, dls[pos[mask]]

    def _phrase_leg(
        self, terms: tuple[str, ...], slop: int, boost: float
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """One phrase clause as a BM25 pseudo-term: (docids, contribution)
        over this reader's matching docs, or None when nothing matches.
        ``idf`` uses the phrase's GLOBAL df (the positional source is
        global), so sharded and unsharded scoring agree; tf saturates
        through the same ``_bm25_tfn`` kernel as ordinary terms. The
        masked (docids, tfn, df) triple is cached per (terms, slop) —
        boost and idf scale outside — because the dl gather costs O(df of
        the rarest phrase term) per call (measured 450 ms/query for a
        corpus-hot phrase at 20M turns without the cache)."""
        got = self._phrase_leg_cache.get((terms, slop))
        if got is None:
            pd, ptf = self._phrase_tfs(terms, slop)
            df = len(pd)  # global phrase df, before the partial-subset mask
            if df:
                mask, dls = self._doclen_of(pd, terms)
                pdm, ptfm = pd[mask], ptf[mask]
                tfn = self._bm25_tfn(ptfm.astype(np.float64), dls)
            else:
                pdm = np.empty(0, np.int64)
                tfn = np.empty(0, np.float64)
            got = (pdm, tfn, df)
            if len(self._phrase_leg_cache) < self.PHRASE_CACHE:
                self._phrase_leg_cache[(terms, slop)] = got
        pdm, tfn, df = got
        if not len(pdm):
            return None
        self.last_stats["postings"] += int(len(pdm))
        self.last_stats["terms"] += 1
        idf = _bm25_idf(self.reader.N, df)
        return pdm, boost * idf * tfn

    def _clause_match_counts(
        self,
        d: np.ndarray,
        terms: list[str],
        groups: list[tuple[tuple[str, ...], float]],
        phrase_docs: list[np.ndarray],
    ) -> np.ndarray:
        """Distinct-SHOULD-clause match counts per candidate docid: one
        count per plain term, per expansion group (any member matching
        counts the group once), and per matched phrase clause — the
        Lucene ``minimum_should_match`` clause set. Negations and
        metadata filters are not SHOULD clauses and never count."""
        term_plan, group_plan = self._plan_bm25(terms, groups)
        sets: list[np.ndarray] = list(phrase_docs)
        for _t, _df, _idf, rows in term_plan:
            ids = [seg.postings(row)[0].astype(np.int64)
                   for seg, row in rows]
            if ids:
                sets.append(np.unique(np.concatenate(ids)))
        for *_a, rows in group_plan:
            ids = [seg.postings(row)[0].astype(np.int64)
                   for seg, row in rows]
            if ids:
                sets.append(np.unique(np.concatenate(ids)))
        if not sets:
            return np.zeros(len(d), dtype=np.int64)
        alld = np.concatenate(sets)
        uniq, cnt = _group_sum(alld, np.ones(len(alld)))
        pos = np.minimum(np.searchsorted(uniq, d), len(uniq) - 1)
        out = cnt[pos].astype(np.int64)
        out[uniq[pos] != d] = 0
        return out

    def _split_extensions(
        self, text: str
    ) -> tuple[
        str, list[tuple[tuple[str, ...], float]], list[tuple[str, str, str]]
    ]:
        """Strip extended-syntax tokens from the query text (outside $math$
        spans) and return ``(cleaned text, groups, filters)``.

        ``groups``: one ``(member terms, boost)`` per ``prefix*``,
        ``{a,b,c}`` synonym group, fuzzy ``term~1`` (members =
        ``expand_fuzzy``: indexed terms within the edit distance, ranked
        distance asc then df desc), regexp ``/pat/`` (members =
        ``expand_regexp``: indexed terms fully matching the pattern), or
        boosted plain ``term^2``, scored
        with Lucene SynonymQuery semantics in ``_score_bm25`` (per-doc tf
        = sum of member tfs, df = max member df — union df is not
        derivable from per-term stats, and max keeps idf identical under
        sharded serving); the boost multiplies the group's contribution.
        Synonym members and boosted terms are stemmed like plain query
        terms; prefixes match the INDEXED (post-stem) vocabulary as-is.
        ``filters``: ``(col, op, value)`` triples from ``#col:value``
        equality and ``#col>n`` / ``#col>=n`` / ``#col<n`` / ``#col<=n``
        numeric range syntax, applied to candidates before the top-k cut.
        """
        # mirror _split_negations' guard: namespaced MathML (<m:math ...>)
        # must not have its markup rewritten as extension syntax either
        if (
            not any(c in text for c in "*{#^?~/")
            or "<math" in text
            or ":math" in text
        ):
            return text, [], []
        groups: list[tuple[tuple[str, ...], float]] = []
        filters: list[tuple[str, str, str]] = []

        def stemmed(members: list[str]) -> tuple[str, ...]:
            if self.cfg.stem:
                from tangent_ray.tokenize.porter import porter_stem

                members = [porter_stem(t) for t in members]
            return tuple(sorted(set(members)))

        def rewrite(seg: str) -> str:
            # regexes strip FIRST: a body like ``tabl.s*`` must never be
            # half-eaten by the wildcard/boost/fuzzy passes below
            def regexp(m: re.Match) -> str:
                members = self.reader.expand_regexp(
                    m.group(1).lower(), self.prefix_max_expansions
                )
                groups.append((tuple(members), float(m.group(2) or 1.0)))
                return " "

            seg = self._REGEX_RE.sub(regexp, seg)
            for col, op, val in self._FILTER_RE.findall(seg):
                filters.append((col, op, val))
            seg = self._FILTER_RE.sub(" ", seg)

            def fuzzy(m: re.Match) -> str:
                word = m.group(1).lower()
                d = 2 if m.group(2) is None else min(int(m.group(2)), 2)
                members = self.reader.expand_fuzzy(
                    word, d, self.prefix_max_expansions
                )
                groups.append((tuple(members), float(m.group(3) or 1.0)))
                return " "

            seg = self._FUZZY_RE.sub(fuzzy, seg)
            for body, boost in self._SYN_RE.findall(seg):
                members = [t.lower() for t in re.split(r"[,|]", body) if t]
                groups.append((stemmed(members), float(boost or 1.0)))
            seg = self._SYN_RE.sub(" ", seg)

            def wild(m: re.Match) -> str:
                pat, boost = m.group(1).lower(), m.group(2)
                if (
                    pat.endswith("?") and "*" not in pat
                    and "?" not in pat[:-1]
                ):
                    # "spark?" is almost always a question mark, not a
                    # single-char wildcard — keep the plain term (any
                    # ^boost re-parses in the boost pass below)
                    return pat[:-1] + (f"^{boost}" if boost else "")
                if re.fullmatch(r"[a-z0-9]+\*", pat):
                    members = self.reader.expand_prefix(
                        pat[:-1], self.prefix_max_expansions
                    )
                else:
                    members = self.reader.expand_wildcard(
                        pat, self.prefix_max_expansions
                    )
                groups.append((tuple(members), float(boost or 1.0)))
                return " "

            seg = self._WILD_RE.sub(wild, seg)
            for term, boost in self._BOOST_RE.findall(seg):
                groups.append((stemmed([term.lower()]), float(boost)))
            return self._BOOST_RE.sub(" ", seg)

        pieces: list[str] = []
        pos = 0
        for m in _MATH_RE.finditer(text):  # never rewrite inside a formula
            pieces.append(rewrite(text[pos : m.start()]))
            pieces.append(m.group(0))
            pos = m.end()
        pieces.append(rewrite(text[pos:]))
        return "".join(pieces), groups, filters

    def _facet_mask(self, docids: np.ndarray,
                    filters: list[tuple[str, str, str]]) -> np.ndarray:
        """AND of the ``#col:value`` equality / ``#col>n`` range filters
        over the candidate docids (facet-sidecar probe, no postings
        touched)."""
        if self._facets is None:
            from tangent_ray.query.facets import FacetCounter

            self._facets = FacetCounter(
                self.reader._index_dir, partials=self.reader.partials
            )
        keep = np.ones(len(docids), dtype=bool)
        for col, op, val in filters:
            keep &= self._facets.mask(docids, col, val, op=op)
        return keep

    def score_query(
        self, text: str, kind: str, k: int | None,
        after: tuple[float, int] | None = None,
        mixed_bounds: tuple[float, float] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k for a query; ``k=None`` returns the FULL filtered
        candidate set in ranked order (the field-collapsing /
        facet-counting pass — forces TAAT, no WAND truncation).
        ``after=(score, docid)`` — the last row of the previous page —
        returns the NEXT k rows of the same total (score desc, docid asc)
        order (Elasticsearch search_after pagination: a cursor filter,
        cheaper and consistent-under-refresh vs offset paging). The
        cursor disables WAND (pruning below the cursor needs the full
        candidate order), so deep paging pays one TAAT pass — the
        standard tradeoff."""
        import time

        t0 = time.perf_counter()
        # instrumentation counters — the reference's per-query `I` rows
        # (qt/post/expr/doc, mathindex.cpp:161-168,295-317)
        self.last_stats = {"postings": 0, "terms": 0, "candidates": 0}
        if self.positions is not None and '"' in text:
            # phrase clauses read the positional sidecar through per-scorer
            # caches — drop them when the sidecar changed underneath
            # (add_position_increment / delete_position_docs / compaction),
            # so phrase tfs/results track the live postings without an
            # explicit refresh()/attach_positions() call
            self._check_positions_fresh()
        rkey = None
        if kind == "text" and k is not None and mixed_bounds is None:
            rkey = (text, k, after)
            got = self._result_cache.get(rkey)
            if got is not None:
                self.last_stats["result_cached"] = True
                self.last_stats["qt_ms"] = (time.perf_counter() - t0) * 1e3
                return got[0].copy(), got[1].copy()
        # phase-1 text leg (keyed by the RAW query text, before the
        # negation/extension splits below rewrite ``text``)
        text_leg = (
            self._mixed_leg_cache.pop(text, None) if kind == "mixed" else None
        )
        # dead docs for THIS query: index tombstones plus the docs matching
        # any -term exclusion. Both classes share one mechanism: the TAAT /
        # fmeasure candidate sets are post-filtered below (exact — they are
        # complete), while the WAND loop checks self._dead at the pivot so
        # a dead doc can never inflate the pruning threshold.
        text, phrases, neg_phrases = self._split_phrases(text)
        text, required = self._split_required(text)
        if (phrases or neg_phrases) and kind != "text":
            raise ValueError(
                "quoted-phrase clauses are text-query syntax (kind="
                f"{kind!r}); quote handling inside $math$ spans is the "
                "SLT parser's"
            )
        text, neg_terms = self._split_negations(text)
        text, groups, filters = self._split_extensions(text)
        # ``#mm:N`` — minimum_should_match (Lucene/Solr mm): keep only docs
        # matching at least N distinct SHOULD clauses (terms, groups,
        # phrases). ``mm`` is a RESERVED filter column name; the cut
        # happens after scoring (survivor scores unchanged), like filters
        mm = 1
        if filters:
            kept_f = []
            for col, op, val in filters:
                if col == "mm" and op == ":":
                    mm = max(mm, int(val))
                else:
                    kept_f.append((col, op, val))
            filters = kept_f
        if mm > 1 and kind != "text":
            raise ValueError("#mm:N applies to text queries only")
        self._dead = self.reader.tombstones
        if neg_terms:
            excl = self._excluded_docs(neg_terms)
            self.last_stats["excluded_docs"] = int(excl.size)
            if excl.size:
                self._dead = (
                    np.union1d(self._dead, excl) if self._dead.size else excl
                )
        for nterms, nslop in neg_phrases:
            # prohibited phrase: exclusion must be complete, so the FULL
            # global match set joins the dead list (like negated wildcards)
            pd = self._phrase_tfs(nterms, nslop)[0]
            if pd.size:
                self._dead = (
                    np.union1d(self._dead, pd)
                    if self._dead.size
                    else np.sort(pd)
                )
        # bare '*' (or Lucene '*:*') — match-all: every live doc at
        # constant score 1.0, the filter-only browsing query. Needs the
        # docmap-derived dense docid view (resident, docid-rate).
        match_all = kind == "text" and text.split() in (["*"], ["*:*"])
        terms, bag, qtc, n_formulae = self.parse_query(text)
        # a cursor, a metadata filter, a phrase clause (merged after the
        # term pass), or k=None (a full-candidate caller) cuts/joins AFTER
        # scoring, so WAND's top-k truncation would under-fill the page —
        # force the full TAAT candidate set
        full_cand = (
            after is not None or bool(filters) or bool(phrases)
            or bool(required) or mm > 1 or k is None
        )
        if match_all:
            dd = self.reader.dense_docids()
            if dd is None:
                raise ValueError(
                    "match-all '*' needs the docmap sidecar (rebuild with "
                    "this version's build_index)"
                )
            d, s = dd, np.ones(len(dd), dtype=np.float64)
        elif kind == "text":
            d, s = self._score_bm25(terms, None if full_cand else k,
                                    groups=groups)
        elif kind == "math":
            d, s = self._score_fmeasure(bag, qtc)
        else:
            d, s = self._score_mixed(terms, bag, qtc, n_formulae,
                                     groups=groups, bounds=mixed_bounds,
                                     text_leg=text_leg)
        phrase_docs: list[np.ndarray] = []
        req_phrase: list[np.ndarray] = []
        if phrases:
            # phrase clauses merge as extra SHOULD legs: per-doc score =
            # term-leg sum + each phrase contribution (coalesce-sum fp
            # order, two-operand commutative). Both sides arrive sorted
            # unique, so the sort-free _fuse_legs merge applies — the
            # argsort-based _accumulate cost ~500 ms/query for a
            # corpus-hot phrase's multi-million-doc leg at 20M turns
            for pterms, pslop, pboost, preq in phrases:
                leg = self._phrase_leg(pterms, pslop, pboost)
                if preq:
                    # +"a b": candidates must match this phrase — cut on
                    # the GLOBAL match set (candidates are already
                    # shard-local, so the intersection is exact)
                    req_phrase.append(self._phrase_tfs(pterms, pslop)[0])
                if leg is not None:
                    d, s = _fuse_legs(d, s, leg[0], leg[1])
                    phrase_docs.append(leg[0])
        if mm > 1 and len(d):
            counts = self._clause_match_counts(
                d, terms, groups, phrase_docs
            )
            keep = counts >= mm
            self.last_stats["mm_cut"] = int(len(d) - keep.sum())
            d, s = d[keep], s[keep]
        if required and len(d):
            keep = self._required_mask(d, required)
            self.last_stats["must_cut"] = int(len(d) - keep.sum())
            d, s = d[keep], s[keep]
        for pd_req in req_phrase:
            if not len(d):
                break
            if not len(pd_req):
                d, s = d[:0], s[:0]
                break
            pos = np.minimum(np.searchsorted(pd_req, d), len(pd_req) - 1)
            keep = pd_req[pos] == d
            d, s = d[keep], s[keep]
        dead = self._dead
        if dead.size and len(d):
            from tangent_ray.util import sorted_lookup

            hit, _ = sorted_lookup(dead, d)
            if hit.any():
                d, s = d[~hit], s[~hit]
        if filters:
            # validate even with zero candidates: a typo'd facet column
            # must raise, not silently return [] for no-match terms
            keep = self._facet_mask(d, filters)
            self.last_stats["filtered_out"] = int(len(d) - keep.sum())
            d, s = d[keep], s[keep]
        if after is not None and len(d):
            a_s, a_d = float(after[0]), int(after[1])
            keep = (s < a_s) | ((s == a_s) & (d > a_d))
            d, s = d[keep], s[keep]
        self.last_stats["candidates"] = int(len(d))
        out = _topk(d, s, len(d) if k is None else k)
        self.last_stats["returned"] = int(len(out[0]))
        self.last_stats["qt_ms"] = (time.perf_counter() - t0) * 1000.0
        if rkey is not None and len(self._result_cache) < self.RESULT_CACHE:
            self._result_cache[rkey] = (out[0].copy(), out[1].copy())
        return out

    #: posting-count threshold above which multi-term text queries take the
    #: block-max WAND path instead of full TAAT accumulation
    wand_min_postings = 500_000
    #: WAND only when the rarest query term is at least this many times
    #: smaller than the posting union: the Python pivot loop costs ~10^3 a
    #: vectorized TAAT posting, so dynamic pruning pays ONLY when a selective
    #: term drives block skipping (measured: 2 hot terms over a 1.27M-turn
    #: corpus score in ~95 ms TAAT vs ~4 s doc-at-a-time WAND; even a ~5k-df
    #: driver term loses to TAAT by ~3x). 0 disables
    #: the check (tests force the WAND path).
    wand_drive_ratio = 1024
    #: runtime safety net: mid-flight, estimate the total pivot iterations
    #: from progress so far and bail out to TAAT when they exceed
    #: total_postings / this. 0 disables.
    wand_bailout_ratio = 256

    #: dense-rank TAAT fast path (top-k only): accumulate scores with ONE
    #: np.bincount over dense docid ranks instead of sorting 62-bit hash
    #: keys — cost is O(postings + N_dense), so it pays only for hot-term
    #: queries where the posting union is comparable to the reader's doc
    #: count (measured at 20.4M turns: the 28M-posting 3-hot-term query
    #: drops ~9 s -> ~1.3 s warm; a 1k-df query would instead pay an
    #: N-sized bincount for nothing, hence both gates).
    dense_min_postings = 2_000_000
    #: dense only when total_postings * this >= len(dense_docids)
    dense_ratio = 4

    # -- BM25 ------------------------------------------------------------
    def _score_bm25(
        self, terms: list[str], k: int | None = None,
        groups: list[tuple[tuple[str, ...], float]] = (),
    ) -> tuple[np.ndarray, np.ndarray]:
        r = self.reader
        term_plan, group_plan = self._plan_bm25(terms, groups)
        plan = [
            (idf, seg, row)
            for _t, _df, idf, rows in term_plan
            for seg, row in rows
        ]
        total_postings = sum(df for _t, df, _i, _r in term_plan) + sum(
            sdf for *_a, sdf, _r in group_plan
        )
        min_df = min(
            (df for _t, df, _i, _r in term_plan), default=1 << 62
        )
        self.last_stats["terms"] += len(term_plan) + len(group_plan)
        gplan = [
            (boost * idf, rows, m)
            for m, _df, idf, boost, _sdf, rows in group_plan
        ]
        if (
            not gplan
            and k is not None
            and len(terms) >= 2
            and len(plan) >= 2
            and total_postings >= self.wand_min_postings
            and min_df * self.wand_drive_ratio <= total_postings
        ):
            return self._score_bm25_wand(plan, k, total_postings)
        if (
            k is not None
            and len(term_plan) == 1
            and not gplan
            and plan
            and total_postings >= self.dense_min_postings
        ):
            # single-term top-k: a doc appears in exactly one row (rows of
            # one term are docid-disjoint across salt buckets and
            # partials), so there is NOTHING to accumulate — concat the
            # cached contributions and select. No docmap needed, no sort.
            ids = [seg.postings(row)[0].astype(np.int64)
                   for _i, seg, row in plan]
            ws = [seg.contrib(row, idf, self._bm25_tfn)
                  for idf, seg, row in plan]
            d = np.concatenate(ids)
            s = np.concatenate(ws)
            self.last_stats["postings"] += int(len(d))
            self.last_stats["dense_taat"] = (
                self.last_stats.get("dense_taat", 0) + 1
            )
            if self._dead.size and len(d):
                from tangent_ray.util import sorted_lookup

                hit, _ = sorted_lookup(self._dead, d)
                if hit.any():
                    d, s = d[~hit], s[~hit]
            return _topk(d, s, k)
        if k is not None and total_postings >= self.dense_min_postings:
            # hot-term top-k: k is not None guarantees no facet filter, no
            # search_after cursor and no full-candidate caller upstream
            # (score_query passes None for all three), so pre-filtering
            # dead docs and truncating to k here is exact — the same
            # contract the WAND branch already relies on
            dd = r.dense_docids()
            if (dd is not None and len(dd)
                    and total_postings * self.dense_ratio >= len(dd)):
                out = self._score_bm25_taat_dense(term_plan, gplan, k, dd)
                if out is not None:
                    return out
        if k is None and total_postings >= self.dense_min_postings:
            # full-candidate callers (facets / cursors / the mixed-fusion
            # text leg) still win the no-sort accumulation; dead docs are
            # NOT filtered here — the classic k=None contract leaves that
            # to score_query, and mixed-fusion bounds must see the raw
            # candidate set
            dd = r.dense_docids()
            if (dd is not None and len(dd)
                    and total_postings * self.dense_ratio >= len(dd)):
                scores = self._dense_scores(term_plan, gplan, dd)
                if scores is not None:
                    self.last_stats["dense_taat"] = (
                        self.last_stats.get("dense_taat", 0) + 1
                    )
                    cand = np.flatnonzero(scores > 0.0)
                    return dd[cand], scores[cand]
        return self._score_bm25_taat(plan, gplan)

    def _plan_bm25(
        self, terms: list[str],
        groups: list[tuple[tuple[str, ...], float]] = (),
    ) -> tuple[list, list]:
        """THE shared BM25 planning step of scoring and ``explain()``:
        ``(term_plan, group_plan)`` with zero-df entries dropped.
        ``term_plan``: ``(term, df, idf, seg_rows)``. ``group_plan``:
        ``(members, df_g, idf, boost, sum_dfs, seg_rows)`` — an expansion
        group (prefix / synonym / boosted term) scores as ONE pseudo-term:
        per-doc tf summed over members, idf from the max member df
        (Lucene SynonymQuery), contribution scaled by the ^boost; groups
        need a per-doc tf merge before saturation, so their presence
        forces the (exact) TAAT path."""
        r = self.reader
        tp = []
        for term in terms:  # sorted order fixes fp summation order
            df = r.global_df(term)
            if df == 0:
                continue
            rows = [
                (seg, row)
                for seg in r.segments
                for row in seg.lookup.get(term, ())
            ]
            tp.append((term, df, _bm25_idf(r.N, df), rows))
        gp = []
        for members, boost in groups:
            dfs = [r.global_df(t) for t in members]
            df_g = max(dfs, default=0)
            if df_g == 0:
                continue
            rows = [
                (seg, row)
                for t in members
                for seg in r.segments
                for row in seg.lookup.get(t, ())
            ]
            gp.append(
                (members, df_g, _bm25_idf(r.N, df_g), boost, sum(dfs), rows)
            )
        return tp, gp

    def _bm25_tfn(self, tf, dl):
        """The ONE BM25 saturation kernel (scalar or vector) shared by
        TAAT scoring and explain() — identical fp op order on both."""
        k1, b = self.cfg.k1, self.cfg.b
        return tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / self.reader.avgdl)
        )

    def _score_bm25_taat(
        self, plan: list[tuple[float, "Segment", int]],
        gplan: list[tuple[float, list[tuple["Segment", int]]]] = (),
    ) -> tuple[np.ndarray, np.ndarray]:
        cand: list[np.ndarray] = []
        contrib: list[np.ndarray] = []
        for idf, seg, row in plan:
            docs, tfs, dls, _ = seg.postings(row)
            self.last_stats["postings"] += len(docs)
            tfn = self._bm25_tfn(tfs.astype(np.float64), dls)
            cand.append(docs.astype(np.int64))
            contrib.append(idf * tfn)
        for idf, rows, *_m in gplan:
            # blended pseudo-term: merge the member postings per doc FIRST
            # (tf is summed before saturation — nonlinear, so this cannot
            # be folded into per-term contributions), then one BM25 kernel
            docs_l, tfs_l, dls_l = [], [], []
            for seg, row in rows:
                docs, tfs, dls, _ = seg.postings(row)
                self.last_stats["postings"] += len(docs)
                docs_l.append(docs.astype(np.int64))
                tfs_l.append(tfs.astype(np.float64))
                dls_l.append(dls.astype(np.float64))
            if not docs_l:
                continue
            docs = np.concatenate(docs_l)
            order = np.argsort(docs, kind="stable")
            d = docs[order]
            starts = np.concatenate(
                [[0], np.flatnonzero(d[1:] != d[:-1]) + 1]
            )
            uniq = d[starts]
            # tf sums are integer-valued floats -> order-exact regardless
            utf = np.add.reduceat(np.concatenate(tfs_l)[order], starts)
            udl = np.concatenate(dls_l)[order][starts]  # per-doc constant
            tfn = self._bm25_tfn(utf, udl)
            cand.append(uniq)
            contrib.append(idf * tfn)
        return _accumulate(cand, contrib)

    #: per-term dense vector cache entries kept hot (ids64 + contrib per
    #: posting: 16 B/posting resident for the hottest query terms)
    TERM_VEC_CACHE = 256

    def _dense_term_vec(
        self, term: str, rows, idf: float, all_docids: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """One TERM's (dense ids int64, per-posting contribution) — the
        term's salted/partial rows pre-concatenated once (rows of one term
        are docid-disjoint) and cached, so a warm hot-term query does zero
        per-query concat/astype memcpy (measured ~2.4 s of a 4.7 s query
        at 28M postings on this host). Cleared on refresh() with the
        row-level derived caches."""
        got = self._term_vecs.get(term)
        if got is None:
            # a subset (shard) reader can know a term's global df without
            # holding any of its rows — an empty vector, not an error
            if not rows:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            ids_l, w_l = [], []
            for seg, row in rows:
                dense = seg.postings_dense(row, all_docids)
                if dense is None:
                    return None
                ids_l.append(dense)
                w_l.append(seg.contrib(row, idf, self._bm25_tfn))
            got = (
                np.concatenate(ids_l).astype(np.int64, copy=False),
                np.concatenate(w_l),
            )
            if len(self._term_vecs) < self.TERM_VEC_CACHE:
                self._term_vecs[term] = got
        return got

    def _dense_scores(
        self, term_plan: list, gplan: list, all_docids: np.ndarray,
    ) -> np.ndarray | None:
        """The shared dense accumulation: full score vector over the dense
        rank space (one bincount per term over cached vectors, in-place
        sums in plan order — the classic concat fp order). None on docmap
        mismatch or an empty plan (caller falls back to classic)."""
        n_dense = len(all_docids)
        scores: np.ndarray | None = None
        for term, df, idf, rows in term_plan:
            tv = self._dense_term_vec(term, rows, idf, all_docids)
            if tv is None:
                return None
            if not len(tv[0]):  # term absent from this shard's partials
                continue
            self.last_stats["postings"] += int(len(tv[0]))
            st = np.bincount(tv[0], weights=tv[1], minlength=n_dense)
            scores = st if scores is None else np.add(scores, st, out=scores)
        for idf, rows, *mkey in gplan:
            gv = self._dense_group_vec(
                mkey[0] if mkey else None, rows, all_docids
            )
            if gv is None:
                return None
            nz, tfn, n_post = gv
            if not len(nz):
                continue
            self.last_stats["postings"] += n_post
            if scores is None:
                scores = np.zeros(n_dense)
            # nz is unique, so fancy += adds exactly once per doc, in
            # (terms-then-groups) order — the classic concat order
            scores[nz] += idf * tfn
        return scores

    def _dense_group_vec(
        self, mkey, rows, all_docids: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, int] | None:
        """One expansion group's dense leg: (nz ranks, tfn(summed tf, dl),
        total postings) — a pure function of the group members and the
        reader's stats (the ^boost and idf scale OUTSIDE), so it is cached
        per members-key exactly like ``_dense_term_vec`` caches terms.
        The merge this replaces per query is the group-cost hot spot: a
        128-member regexp group over a 1M-doc corpus concatenates ~2M
        postings per query without the cache. None on docmap mismatch."""
        got = self._group_vecs.get(mkey) if mkey is not None else None
        if got is not None:
            return got
        n_dense = len(all_docids)
        gi: list[np.ndarray] = []
        gtf: list[np.ndarray] = []
        gdl: list[np.ndarray] = []
        n_post = 0
        for seg, row in rows:
            dense = seg.postings_dense(row, all_docids)
            if dense is None:
                return None
            _d, tfs, dls, _p = seg.postings(row)
            n_post += len(dense)
            gi.append(dense.astype(np.int64))
            gtf.append(tfs.astype(np.float64))
            gdl.append(dls)
        if not gi:
            out = (
                np.empty(0, np.int64), np.empty(0, np.float64), 0,
            )
        else:
            ids = np.concatenate(gi)
            utf = np.bincount(
                ids, weights=np.concatenate(gtf), minlength=n_dense
            )
            dl_arr = np.zeros(n_dense)
            dl_arr[ids] = np.concatenate(gdl)  # per-doc constant
            nz = np.flatnonzero(utf)
            out = (nz, self._bm25_tfn(utf[nz], dl_arr[nz]), n_post)
        if mkey is not None and len(self._group_vecs) < self.TERM_VEC_CACHE:
            self._group_vecs[mkey] = out
        return out

    def _score_bm25_taat_dense(
        self, term_plan: list, gplan: list, k: int, all_docids: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """Hot-term top-k TAAT in dense rank space: one ``np.bincount``
        per term over cached dense-rank vectors replaces the 62-bit-key
        sort of ``_accumulate`` (O(postings + N·terms) vs O(postings log
        postings) with cache-hostile gathers). Bit-identical to the
        classic path: bincount starts each bin at +0.0 (``0.0 + x == x``
        for the positive contributions here) and per-term vectors sum in
        plan order, so every doc's fp summation order matches the
        concatenated-bincount classic path exactly; per-group tf sums are
        integer-exact; rank order == docid order so ``_topk`` tie-breaks
        agree; dead docs are zeroed before the cut exactly like the
        classic post-filter (the WAND branch's contract). Returns None
        when a row's docids are missing from the dense space (docmap
        mismatch) — caller falls back."""
        n_dense = len(all_docids)
        scores = self._dense_scores(term_plan, gplan, all_docids)
        if scores is None:
            return None
        dead = self._dead
        if dead.size:
            pos = np.minimum(
                np.searchsorted(all_docids, dead), n_dense - 1
            )
            scores[pos[all_docids[pos] == dead]] = 0.0
        self.last_stats["dense_taat"] = (
            self.last_stats.get("dense_taat", 0) + 1
        )
        # select straight off the dense scores vector: partition over N
        # beats flatnonzero + gather + partition over the (usually
        # comparable-sized) candidate set. Zeros (non-candidates, dead)
        # can only enter the kth cut when positives < k — the fallback.
        if k < n_dense:
            kth = np.partition(scores, n_dense - k)[n_dense - k]
            if kth > 0.0:
                idx = np.flatnonzero(scores >= kth)
                top_d, top_s = _topk(idx, scores[idx], k)
                return all_docids[top_d], top_s
        cand = np.flatnonzero(scores > 0.0)
        top_d, top_s = _topk(cand, scores[cand], k)
        return all_docids[top_d], top_s

    def explain(self, text: str, docid: int) -> pa.Table:
        """Per-term score breakdown of a text query against ONE document
        (Lucene's ``explain()``): a row per contributing query term,
        expansion group, or phrase clause with (term, kind, tf, df, idf,
        boost, tfn, contribution) — the contributions sum to the doc's
        score on the TAAT path exactly (same plan builder and saturation
        kernel; phrase rows use the same global-df idf and sloppy tf as
        ``_phrase_leg``). Negations (term or phrase), filters, ``#mm:N``
        shortfalls, unmet ``+`` required clauses, and index tombstones
        are reported as synthetic ``excluded``/``filtered``/``mm``/
        ``required``/``deleted`` rows when they remove the doc from
        results."""
        rows: list[dict] = []
        docid = int(docid)
        text, phrases, neg_phrases = self._split_phrases(text)
        text, required = self._split_required(text)
        text, neg_terms = self._split_negations(text)
        text, groups, filters = self._split_extensions(text)
        mm = 1
        if filters:
            kept_f = []
            for col, op, val in filters:
                if col == "mm" and op == ":":
                    mm = max(mm, int(val))
                else:
                    kept_f.append((col, op, val))
            filters = kept_f
        r = self.reader

        def doc_tf_dl(seg_rows) -> tuple[float, float]:
            tf_sum, dl_of = 0.0, 0.0
            for seg, row in seg_rows:
                docs, tfs, dls, _ = seg.postings(row)
                i = int(np.searchsorted(docs, docid))
                if i < len(docs) and docs[i] == docid:
                    tf_sum += float(tfs[i])
                    dl_of = float(dls[i])
            return tf_sum, dl_of

        def add(term, kind, tf, df, idf, boost, dl):
            tfn = float(self._bm25_tfn(tf, dl))
            rows.append(
                {
                    "term": term, "kind": kind, "tf": tf, "df": int(df),
                    "idf": idf, "boost": boost, "tfn": tfn,
                    "contribution": boost * idf * tfn,
                }
            )

        terms, _, _, _ = self.parse_query(text)
        term_plan, group_plan = self._plan_bm25(terms, groups)
        matched = 0  # distinct SHOULD clauses this doc matches (for #mm)
        for term, df, idf, seg_rows in term_plan:
            tf, dl = doc_tf_dl(seg_rows)
            if tf:
                add(term, "term", tf, df, idf, 1.0, dl)
                matched += 1
        for members, df_g, idf, boost, _sdf, seg_rows in group_plan:
            tf, dl = doc_tf_dl(seg_rows)
            if tf:
                add("|".join(members), "group", tf, df_g, idf, boost, dl)
                matched += 1

        def marker(term, kind):
            rows.append(
                {"term": term, "kind": kind, "tf": 0.0, "df": 0,
                 "idf": 0.0, "boost": 0.0, "tfn": 0.0, "contribution": 0.0}
            )

        def plabel(pterms, pslop):
            return '"' + " ".join(pterms) + '"' + (
                f"~{pslop}" if pslop else ""
            )

        for pterms, pslop, pboost, preq in phrases:
            pd, ptf = self._phrase_tfs(pterms, pslop)
            i = int(np.searchsorted(pd, docid))
            tf = float(ptf[i]) if i < len(pd) and pd[i] == docid else 0.0
            if tf:
                mask, dls = self._doclen_of(
                    np.array([docid], np.int64), pterms
                )
                add(plabel(pterms, pslop), "phrase", tf, len(pd),
                    float(_bm25_idf(r.N, len(pd))), pboost,
                    float(dls[0]) if mask[0] else 0.0)
                matched += 1
            elif preq:
                marker("+" + plabel(pterms, pslop), "required")
        for nterms, nslop in neg_phrases:
            pd = self._phrase_tfs(nterms, nslop)[0]
            i = int(np.searchsorted(pd, docid))
            if i < len(pd) and pd[i] == docid:
                marker("-" + plabel(nterms, nslop), "excluded")

        # membership probes, bounded per term — NOT _excluded_docs's full
        # decode+unique of every exclusion posting list for one doc
        def contains(term: str) -> bool:
            return doc_tf_dl(
                [
                    (seg, row)
                    for seg in r.segments
                    for row in seg.lookup.get(term, ())
                ]
            )[0] > 0

        if neg_terms and any(contains(t) for t in neg_terms):
            marker(" ".join(neg_terms), "excluded")
        for t in required:
            if not contains(t):
                marker("+" + t, "required")
        if mm > 1 and matched < mm:
            marker(f"#mm:{mm}", "mm")
        if filters:
            keep = self._facet_mask(np.array([docid], np.int64), filters)
            if not keep[0]:
                marker(" ".join(f"#{c}{o}{v}" for c, o, v in filters),
                       "filtered")
        ts = r.tombstones
        if ts.size:
            i = int(np.searchsorted(ts, docid))
            if i < len(ts) and ts[i] == docid:
                marker("", "deleted")
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("term", pa.string()), ("kind", pa.string()),
                    ("tf", pa.float64()), ("df", pa.int64()),
                    ("idf", pa.float64()), ("boost", pa.float64()),
                    ("tfn", pa.float64()), ("contribution", pa.float64()),
                ]
            ),
        )

    def _score_bm25_wand(
        self, plan: list[tuple[float, "Segment", int]], k: int,
        total_postings: int = 0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Block-max WAND over the compressed lists (the analogue of the
        reference's threshold-driven candidate skipping + galloping seek,
        ``mathindex.cpp:225-255`` / ``mathindexmid.h:100-132``).

        Exact: returns the identical result set as full TAAT (same floats —
        per-doc contributions are summed in the same ``plan`` order; the
        pruning bound uses per-block ``(max_tf, min_dl)`` score caps from
        the skip table, and ties with the k-th score are never pruned, so
        the (score desc, docid asc) tie-exact top-k is preserved).
        """
        import heapq

        k1, b = self.cfg.k1, self.cfg.b
        avgdl = self.reader.avgdl
        its = [
            _BMWIter(idf, seg, row, k1, b, avgdl, pos)
            for pos, (idf, seg, row) in enumerate(plan)
        ]
        its = [it for it in its if it.cur != _BMW_END]
        all_its = list(its)  # instrumentation: exhausted iterators included
        # candidates tied with the k-th score must survive pruning for the
        # docid-asc tie-break, so the heap stores (score, -docid) and the
        # prune condition is strictly-less-than the k-th *score*
        heap: list[tuple[float, int]] = []
        # mid-flight cost control: doc-at-a-time pivoting costs ~10^3 a
        # vectorized TAAT posting, so if the projected pivot count says the
        # pruning is not selective enough, restart as one TAAT pass (exact
        # either way; the probe cost is bounded by _WAND_PROBE iterations)
        _WAND_PROBE = 16384
        iters = 0
        all_postings = sum(int(it.ncum[-1]) for it in its)
        while True:
            iters += 1
            if (
                self.wand_bailout_ratio
                and iters % _WAND_PROBE == 0
                and total_postings
            ):
                passed = sum(it.progress() for it in its)
                if passed > 0:
                    est_total = iters * all_postings / passed
                    if est_total > total_postings / self.wand_bailout_ratio:
                        self.last_stats["wand_bailouts"] = (
                            self.last_stats.get("wand_bailouts", 0) + 1
                        )
                        return self._score_bm25_taat(plan)
            its.sort(key=lambda t: t.cur)
            threshold = heap[0][0] if len(heap) >= k else -np.inf
            acc = 0.0
            pivot_i = -1
            for i, it in enumerate(its):
                acc += it.gub
                if acc >= threshold:
                    pivot_i = i
                    break
            if pivot_i < 0:
                break
            pivot = its[pivot_i].cur
            if pivot == _BMW_END:
                break
            if its[0].cur == pivot:
                at_pivot = [t for t in its if t.cur == pivot]
                # dead pivot (tombstoned or -term excluded): advance past
                # without scoring — a dead doc in the heap would raise the
                # threshold and prune live results
                dead_arr = getattr(self, "_dead", self.reader.tombstones)
                deleted = False
                if dead_arr.size:
                    j = int(np.searchsorted(dead_arr, pivot))
                    deleted = j < dead_arr.size and int(dead_arr[j]) == pivot
                # block-max refinement: tighter bound from the blocks that
                # actually contain the pivot (all pivot-doc contributors)
                bub = 0.0 if deleted else sum(t.block_ub(pivot) for t in at_pivot)
                if deleted or bub < threshold:
                    for it in at_pivot:
                        it.advance_past(pivot)
                else:
                    # sum contributions in plan order -> float-identical
                    # to the TAAT accumulation
                    at_pivot.sort(key=lambda t: t.plan_pos)
                    score = 0.0
                    for it in at_pivot:
                        score += it.score_at()
                    entry = (score, -pivot)
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry > heap[0]:
                        heapq.heapreplace(heap, entry)
                    for it in at_pivot:
                        it.advance_past(pivot)
            else:
                for it in its:
                    if it.cur >= pivot:
                        break
                    it.advance_to(pivot)
            its = [it for it in its if it.cur != _BMW_END]
            if not its:
                break
        # postings actually visited (the reference's `I post` counter; the
        # bailout path doesn't reach here — TAAT counts its own full pass)
        self.last_stats["postings"] += sum(it.progress() for it in all_its)
        out = sorted(heap, key=lambda e: (-e[0], -e[1]))
        docids = np.array([-d for _, d in out], dtype=np.int64)
        scores = np.array([s for s, _ in out], dtype=np.float64)
        return docids, scores

    # -- tuple F-measure -------------------------------------------------
    def _score_fmeasure(self, bag: Counter, qtc: int) -> tuple[np.ndarray, np.ndarray]:
        if qtc == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        r = self.reader
        cand: list[np.ndarray] = []
        cc: list[np.ndarray] = []
        dtc_v: list[np.ndarray] = []  # element-wise parallel to cand
        used: dict[tuple[int, int], np.ndarray] = {}  # (seg, row) -> used tf per posting
        concrete = sorted((t, c) for t, c in bag.items() if not isinstance(t, tuple))
        varpats = sorted(
            ((t, c) for t, c in bag.items() if isinstance(t, tuple)),
            key=lambda kv: str(kv[0]),
        )
        for term, qtf in concrete:
            self.last_stats["terms"] += 1
            for si, seg in enumerate(r.segments):
                for row in seg.lookup.get(term, ()):
                    docs, tfs, dls, _ = seg.postings(row)
                    self.last_stats["postings"] += len(docs)
                    m = np.minimum(qtf, tfs).astype(np.float64)
                    used[(si, row)] = m
                    cand.append(docs.astype(np.int64))
                    cc.append(m)
                    dtc_v.append(dls.astype(np.float64))
        for pat, times in varpats:
            _, fr, to, rel = pat
            for si, seg in enumerate(r.segments):
                rows = seg.wildcard_rows(fr, to, rel)
                if not rows:
                    continue
                # ANY semantics, vectorized: each var occurrence contributes
                # max over its expansion set of min(times, remaining tf)
                # per doc (IDIterANY/IDIterIND, mathindexmid.h:134-167).
                # The winning row's tf is CONSUMED (the reference's shared
                # IDIterPL.rem decrement) so a later pattern expanding to
                # the same row sees the reduced remainder — without this a
                # doc tuple matched by two wildcard patterns double-counts
                # and F exceeds its bound of 1. Rows process in sorted-term
                # order with a strict max, so the winner is deterministic.
                rows = sorted(rows, key=lambda rw: seg.terms[rw])
                per_row: list[tuple[int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
                for row in rows:
                    docs, tfs, dls, _ = seg.postings(row)
                    rem = tfs.astype(np.float64) - used.get((si, row), 0.0)
                    avail = np.minimum(times, rem)
                    m = avail > 0
                    if m.any():
                        per_row.append(
                            (row, docs[m].astype(np.int64), avail[m],
                             dls[m].astype(np.float64), np.flatnonzero(m))
                        )
                if not per_row:
                    continue
                uniq = np.unique(np.concatenate([p[1] for p in per_row]))
                best = np.zeros(len(uniq))
                best_ri = np.full(len(uniq), -1, dtype=np.int64)
                best_pos = np.zeros(len(uniq), dtype=np.int64)
                dlm = np.zeros(len(uniq))
                for ri, (row, docs_m, avail_m, dls_m, pidx) in enumerate(per_row):
                    idx = np.searchsorted(uniq, docs_m)
                    upd = avail_m > best[idx]
                    ui = idx[upd]
                    best[ui] = avail_m[upd]
                    best_ri[ui] = ri
                    best_pos[ui] = pidx[upd]
                    np.maximum.at(dlm, idx, dls_m)
                for ri, (row, _d, _a, _dl, _p) in enumerate(per_row):
                    sel = best_ri == ri
                    if not sel.any():
                        continue
                    u = used.get((si, row))
                    if u is None:
                        n_post = len(seg.postings(row)[0])
                        u = used[(si, row)] = np.zeros(n_post)
                    elif np.isscalar(u) or u.ndim == 0:
                        n_post = len(seg.postings(row)[0])
                        u = used[(si, row)] = np.full(n_post, float(u))
                    np.add.at(u, best_pos[sel], best[sel])
                cand.append(uniq)
                cc.append(best)
                dtc_v.append(dlm)
        if not cand:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        # dtc_v mirrors cand element-wise, so ONE unique decomposition
        # drives both the cc sum and the dtc max (dtc = the doc's tuple
        # count, equal on every matched posting of a doc)
        dcat = np.concatenate(cand)
        if len(dcat) == 0:
            return dcat.astype(np.int64), np.empty(0, dtype=np.float64)
        order = np.argsort(dcat, kind="stable")
        d = dcat[order]
        bounds = np.flatnonzero(d[1:] != d[:-1])
        starts = np.concatenate([[0], bounds + 1])
        uniq = d[starts]
        # cc sums in input order (bincount — see _group_sum); max is
        # order-free so reduceat over the sorted gather is fine
        gid = np.empty(len(d), dtype=np.int64)
        gid_sorted = np.zeros(len(d), dtype=np.int64)
        gid_sorted[bounds + 1] = 1
        np.cumsum(gid_sorted, out=gid_sorted)
        gid[order] = gid_sorted
        ccs = np.bincount(gid, weights=np.concatenate(cc), minlength=len(uniq))
        dtc_of = np.maximum.reduceat(np.concatenate(dtc_v)[order], starts)
        scores = 2.0 * ccs / (dtc_of + qtc)
        return uniq, scores

    def _score_mixed(
        self, terms: list[str], bag: Counter, qtc: int, n_formulae: int,
        groups: list[tuple[tuple[str, ...], float]] = (),
        bounds: tuple[float, float] | None = None,
        text_leg: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        if qtc == 0 or n_formulae == 0:
            return self._score_bm25(terms, groups=groups)
        if not terms and not groups:
            return self._score_fmeasure(bag, qtc)
        # reference dynamic weight: #formulae/(#formulae + #keywords)
        # (utility/comp_query.py:255-291 with mDynamicWeight; an expansion
        # group counts as one keyword)
        mweight = n_formulae / (n_formulae + len(terms) + len(groups))
        # ``text_leg`` is the phase-1 result handed back by score_query so
        # the sharded two-phase protocol computes each text leg once
        dt, st = (
            text_leg if text_leg is not None
            else self._score_bm25(terms, groups=groups)
        )
        dm, sm = self._score_fmeasure(bag, qtc)
        # min-max normalize text scores into [0,1] (reference normalizes the
        # Solr scores before fusion — utility/comp_query.py:255-291).
        # ``bounds`` carries the GLOBAL (min, max) when this scorer holds
        # only a shard of the index: per-doc text scores are shard-location
        # independent (global idf via term_stats), so normalizing each
        # shard's candidates with the combined bounds reproduces the
        # unsharded fusion bit-for-bit (see ShardedEngine.search phase 1).
        if len(st):
            lo, hi = (st.min(), st.max()) if bounds is None else bounds
            st = (st - lo) / (hi - lo) if hi > lo else np.ones_like(st)
        return _fuse_legs(dt, (1 - mweight) * st, dm, mweight * sm)

    def mixed_text_bounds(self, batch: pa.Table) -> list[dict]:
        """Phase 1 of exact sharded mixed-query fusion: per query, the
        (min, max, count) of THIS shard's raw text-leg scores.

        ``_score_mixed`` min-max-normalizes the text leg over the global
        candidate set — collection-global state. Shard candidate sets are
        disjoint (a doc lives in exactly one partial) and per-doc scores
        use global idf, so the global (min, max) is exactly the
        combination of per-shard extrema; the driver folds these and fans
        fusion back out with ``mixed_bounds=`` instead of funneling mixed
        queries through a full-index worker (the round-4 20M-turn soak
        measured that funnel at ~3 s p99 vs ~21 ms p50).

        ``n == -1`` flags a query whose fuse path ignores bounds entirely
        (pure-text / pure-math fallback inside ``_score_mixed``).
        """
        rows: list[dict] = []
        # _score_bm25 updates the per-query instrumentation counters
        self.last_stats = {"postings": 0, "terms": 0, "candidates": 0}
        cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._mixed_leg_cache = cache  # wholesale replace: one batch live
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            t, _neg = self._split_negations(text)
            t, groups, _filters = self._split_extensions(t)
            terms, bag, qtc, n_formulae = self.parse_query(t)
            if qtc == 0 or n_formulae == 0 or (not terms and not groups):
                rows.append({"query_id": qid, "lo": 0.0, "hi": 0.0, "n": -1})
                continue
            dt, st = self._score_bm25(terms, groups=groups)
            cache[text] = (dt, st)
            if len(st):
                rows.append({
                    "query_id": qid, "lo": float(st.min()),
                    "hi": float(st.max()), "n": int(len(st)),
                })
            else:
                rows.append({"query_id": qid, "lo": 0.0, "hi": 0.0, "n": 0})
        return rows


def _fuse_legs(
    dt: np.ndarray, wt: np.ndarray, dm: np.ndarray, wm: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Union-fuse two (sorted unique docids, weighted scores) legs.

    Bit-identical to ``union1d + scatter-add math then text`` (each doc
    sums ``0 (+ math) (+ text)`` in that order) but without sorting the
    union: both legs arrive sorted, so every union position is an
    ``arange`` plus a searchsorted against the other leg's (small)
    complement — the union1d sort was the mixed-query fusion's cost at
    candidate scale."""
    if not len(dm):
        return dt, wt
    if not len(dt):
        return dm, wm
    pos = np.searchsorted(dt, dm)
    clam = np.minimum(pos, len(dt) - 1)
    shared = dt[clam] == dm
    extra = dm[~shared]  # sorted: dm is
    pos_dt = np.arange(len(dt), dtype=np.int64) + np.searchsorted(extra, dt)
    pos_ex = (
        np.arange(len(extra), dtype=np.int64) + np.searchsorted(dt, extra)
    )
    n_all = len(dt) + len(extra)
    alld = np.empty(n_all, dtype=np.int64)
    alld[pos_dt] = dt
    alld[pos_ex] = extra
    s = np.zeros(n_all)
    pos_dm = np.empty(len(dm), dtype=np.int64)
    pos_dm[shared] = pos_dt[clam[shared]]
    pos_dm[~shared] = pos_ex
    s[pos_dm] += wm  # positions unique per leg -> fancy += is exact
    s[pos_dt] += wt
    return alld, s


def _group_sum(docs: np.ndarray, vals: np.ndarray):
    """Sum ``vals`` per docid; returns (sorted unique docids, sums).

    Stable radix argsort to find the groups, then ``np.bincount`` over the
    derived inverse to sum them — for hot-term queries (millions of
    candidate postings) this measures 1.2-1.7x over
    ``np.unique(return_inverse)`` + ``np.add.at`` on this host.
    Bit-exact with ``add.at``: bincount walks the input left-to-right adding
    each value to its bin, the same fp op order ``add.at`` applies over the
    concatenated arrays (``add.reduceat`` would NOT be — it associates
    3-element groups right-to-left, a 1-ulp drift the WAND-identity and
    golden-replay pins reject).
    """
    if len(docs) == 0:
        return docs.astype(np.int64), vals.astype(np.float64)
    order = np.argsort(docs, kind="stable")
    d = docs[order]
    bounds = np.flatnonzero(d[1:] != d[:-1])
    uniq = d[np.concatenate([[0], bounds + 1])]
    gid = np.empty(len(d), dtype=np.int64)
    gid_sorted = np.zeros(len(d), dtype=np.int64)
    gid_sorted[bounds + 1] = 1
    np.cumsum(gid_sorted, out=gid_sorted)
    gid[order] = gid_sorted
    out = np.bincount(gid, weights=vals, minlength=len(uniq))
    return uniq, out


def _accumulate(cand: list[np.ndarray], contrib: list[np.ndarray]):
    """Sum contributions per docid; returns (sorted unique docids, scores)."""
    if not cand:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    docs = np.concatenate(cand)
    vals = np.concatenate(contrib)
    return _group_sum(docs, vals)


def _topk(docids: np.ndarray, scores: np.ndarray, k: int):
    """(score desc, docid asc) top-k — the reference heap's total order.

    Tie-exact: all candidates tied with the k-th score are kept for the
    docid-asc tie-break before truncation (the reference heap's comparator
    is (sc, then ex>) — ``mathindexbase.h:100`` — so equal scores resolve by
    ascending id there too).
    """
    n = len(docids)
    if n == 0:
        return docids.astype(np.int64), scores
    if n > k:
        kth = np.partition(scores, n - k)[n - k]
        mask = scores >= kth
        docids, scores = docids[mask], scores[mask]
    order = np.lexsort((docids, -scores))[:k]
    return docids[order].astype(np.int64), scores[order]


def search(
    queries, index_dir: str, *, concurrency: int | tuple[int, int] = 1, topk: int | None = None
):
    """Score a queries Dataset against an index; returns a result Dataset.

    ``queries`` may be a ``ray.data.Dataset``, a ``pyarrow.Table`` or a list
    of dicts. Each actor of the pool loads the segment set once.
    """
    import ray.data

    if isinstance(queries, list):
        queries = pa.Table.from_pylist(queries)
    if isinstance(queries, pa.Table):
        queries = ray.data.from_arrow(queries)
    n_actors = concurrency if isinstance(concurrency, int) else concurrency[1]
    if n_actors > 1:
        queries = queries.repartition(n_actors * 2)
    return queries.map_batches(
        QueryScorer,
        fn_constructor_args=(index_dir, topk),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=64,
    )


def search_sharded(
    queries,
    index_dir: str,
    *,
    n_shards: int = 2,
    concurrency_per_shard: int | tuple[int, int] = 1,
    topk: int | None = None,
    positions=None,
) -> pa.Table:
    """Sharded serving: each actor group holds a SUBSET of the partials
    (the scale path — one actor cannot hold a 10^12-turn index), scores the
    query set against its shard with exact global idf (term_stats sidecar),
    and the driver merges the per-shard top-k unions.

    Docs live in exactly one partial, so shard results are disjoint and the
    merge is a plain (score desc, docid asc) re-sort per query — the
    reference analogue is per-shard top-k heaps merged on the driver
    (SURVEY §2.6 K1). Results are identical to unsharded ``search``.

    ``mixed``-kind queries are scored by a full-index group: their
    math+text fusion min-max-normalizes over the candidate set, which is
    collection-global state (the reference likewise fuses driver-side AFTER
    both engines return — ``comp_query.py:255-291``). All shard groups run
    CONCURRENTLY as one unioned plan (each group is its own actor pool);
    the streaming executor schedules pools as resources allow, so a small
    cluster degrades to sequential groups instead of deadlocking.

    ``positions``: explicit positional source for quoted-phrase clauses.
    Pass a driver-built :class:`~tangent_ray.index.positions.
    PositionalEngine` so every shard scorer shares its resident part
    actors (engine handles pickle light) — without it each scorer actor
    lazily loads the FULL ``<index_dir>/positions`` sidecar on its first
    phrase query, an N-actors-x-positional-index memory cost that is fine
    single-node and wrong at cluster scale.
    """
    import ray.data

    if isinstance(queries, ray.data.Dataset):
        queries = pa.Table.from_pylist(queries.take_all())
    if isinstance(queries, list):
        queries = pa.Table.from_pylist(queries)

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    partials = manifest["partials"]
    n_shards = max(1, min(n_shards, len(partials)))
    groups: list[list[str] | None] = [partials[i::n_shards] for i in range(n_shards)]

    default_k = topk or EngineConfig.from_json(manifest["config"]).topk
    topk_of = {
        r["query_id"]: int(r.get("topk") or default_k) for r in queries.to_pylist()
    }

    kinds = queries["kind"] if "kind" in queries.column_names else None
    if kinds is not None:
        import pyarrow.compute as pc_

        is_mixed = pc_.equal(kinds, "mixed")
        shardable = queries.filter(pc_.invert(is_mixed))
        mixed = queries.filter(is_mixed)
    else:
        shardable, mixed = queries, queries.slice(0, 0)

    jobs: list[tuple[pa.Table, list[str] | None]] = [
        (shardable, g) for g in groups if shardable.num_rows
    ]
    if mixed.num_rows:
        jobs.append((mixed, None))  # full-index group for fusion queries
    shard_ds = [
        ray.data.from_arrow(qt).map_batches(
            QueryScorer,
            fn_constructor_args=(index_dir, topk),
            # ``positions``: an explicit positional source for phrase
            # clauses — pass a driver-built PositionalEngine so EVERY
            # shard scorer shares its resident part actors (the handle
            # pickles light) instead of each actor lazily loading the
            # whole positional index (N x corpus-positional memory)
            fn_constructor_kwargs={"partials": group,
                                   "positions": positions},
            batch_format="pyarrow",
            concurrency=concurrency_per_shard,
            batch_size=64,
        )
        for qt, group in jobs
    ]
    if not shard_ds:
        return RESULT_SCHEMA.empty_table()
    # one plan: every group's pool executes concurrently, results stream
    # into a single tiny top-k union
    whole = shard_ds[0]
    for d in shard_ds[1:]:
        whole = whole.union(d)
    # Arrow-native merge (bounded: shards x queries x topk rows): one
    # concat + sort, then a vectorized per-query rank/cut — no pylist or
    # pandas round-trip. (score, docid) is a total order per query (docs
    # live in exactly one shard), so the re-sort reproduces ``search``.
    import ray as _ray

    tabs = [t for t in _ray.get(whole.to_arrow_refs()) if t.num_rows]
    return merge_shard_results(tabs, topk_of, default_k)


def merge_shard_results(
    tabs: list[pa.Table], topk_of: dict[str, int], default_k: int
) -> pa.Table:
    """Merge disjoint per-shard result tables into global per-query top-k.

    Bounded input (shards x queries x topk rows). Docs live in exactly one
    shard, so (score desc, docid asc) is a total order per query and one
    concat + sort + vectorized rank/cut reproduces unsharded ``search``.
    Shared by ``search_sharded`` (per-call pools) and the resident
    ``ShardedEngine`` so both merges are the same code path."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return RESULT_SCHEMA.empty_table()
    merged = pa.concat_tables(
        [t.select(RESULT_SCHEMA.names).cast(RESULT_SCHEMA) for t in tabs]
    ).sort_by(
        [("query_id", "ascending"), ("score", "descending"),
         ("docid", "ascending")]
    )
    qids = merged["query_id"].to_numpy(zero_copy_only=False)
    new = np.concatenate([[True], qids[1:] != qids[:-1]])
    starts = np.flatnonzero(new)
    run_id = np.cumsum(new) - 1
    rank = np.arange(len(qids)) - starts[run_id] + 1
    ks = np.array(
        [topk_of.get(q, default_k) for q in qids[starts]], dtype=np.int64
    )
    keep = rank <= ks[run_id]
    out = merged.filter(pa.array(keep))
    i = out.column_names.index("rank")
    return out.set_column(
        i, "rank", pa.array(rank[keep].astype(np.int32), type=pa.int32())
    )
