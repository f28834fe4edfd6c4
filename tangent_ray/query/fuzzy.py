"""Fuzzy term suggestions: SymSpell-style deletes index over the lexicon.

"Did you mean" for misspelled query terms, built on the public SymSpell
idea (Garbe 2012): if ``lev(q, t) <= d`` then some ``<=d``-deletion variant
of ``q`` equals some ``<=d``-deletion variant of ``t`` — so indexing every
term's deletion variants turns fuzzy lookup into exact hash probes, no
vocabulary scan at query time. Candidates from the probe are then verified
with TRUE Levenshtein distance (the DuckDB ``levenshtein()`` twin in tests
checks against a full-scan oracle) and ranked ``(distance asc, df desc,
term asc)``.

Scale shape:

- ``build_suggest_index`` is a ``map_batches`` pass over the
  ``term_stats.parquet`` lexicon sidecar (text terms only — never the
  math-tuple vocabulary): each term emits its deletion variants as a
  64-bit ``md5_u64`` hash (the engine-shared string hash), written as one
  sorted (dhash, term, df) parquet. Variant count is ~``1 + L + L(L-1)/2``
  per term at d=2 — the index is a build-once artifact proportional to the
  lexicon, not the corpus.
- ``Suggester`` loads the sidecar once (sorted uint64 array +
  dictionary-encoded terms) and probes by searchsorted — O(variants(q) *
  log V) per lookup. Hash collisions only ever ADD candidates; the exact
  Levenshtein verify removes them, so collisions cost time, never
  correctness.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tangent_ray.tokenize.text import md5_u64

SUGGEST_NAME = "suggest.parquet"

#: guard against degenerate lexicon entries: deletion-variant count is
#: quadratic in term length at d=2, and a 200-char "term" is junk anyway
MAX_TERM_LEN = 32


def _delete_variants(word: str, max_edit: int) -> set[str]:
    """All strings reachable from ``word`` by at most ``max_edit``
    single-character deletions (including ``word`` itself)."""
    out = {word}
    frontier = {word}
    for _ in range(max_edit):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                v = w[:i] + w[i + 1 :]
                if v not in out:
                    nxt.add(v)
        out |= nxt
        frontier = nxt
    return out


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein distance (insert/delete/substitute, unit costs) —
    the same definition as DuckDB's ``levenshtein()``."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def _partials_fingerprint(index_dir: str) -> str:
    """Stable hash of the manifest's partial list — the suggest sidecar's
    staleness key (an ``add_increment``/``compact_index`` changes it)."""
    import hashlib
    import json

    with open(os.path.join(index_dir, "manifest.json")) as f:
        partials = sorted(json.load(f)["partials"])
    return hashlib.blake2b(
        "\x00".join(partials).encode(), digest_size=8
    ).hexdigest()


def build_suggest_index(
    index_dir: str, max_edit: int = 2, min_df: int = 1
) -> str:
    """Build the deletes sidecar from the index's ``term_stats.parquet``
    lexicon; returns the sidecar path. One distributed pass; output sorted
    by variant hash for searchsorted probes."""
    import ray
    import ray.data

    stats = os.path.join(index_dir, "term_stats.parquet")
    if not os.path.exists(stats):
        raise FileNotFoundError(
            "build_suggest_index needs term_stats.parquet (run finalize_index)"
        )

    def variants(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], 0))
        if min_df > 1:
            t = t.filter(pc.greater_equal(t["df"], min_df))
        words: list[str] = []
        terms: list[str] = []
        dfs: list[int] = []
        for w, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
            if not w or len(w) > MAX_TERM_LEN:
                continue
            for v in _delete_variants(w, max_edit):
                words.append(v)
                terms.append(w)
                dfs.append(int(df))
        if not words:
            return pa.table(
                {
                    "dhash": pa.array([], pa.uint64()),
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                }
            )
        h = md5_u64(pa.array(words, pa.string()))
        return pa.table(
            {
                "dhash": pa.array(h, pa.uint64()),
                "term": pa.array(terms, pa.string()),
                "df": pa.array(dfs, pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ray.data.read_parquet(stats, columns=["term", "kind", "df"])
            .map_batches(variants, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    out_path = os.path.join(index_dir, SUGGEST_NAME)
    # self-describing: purge_deletes rebuilds the sidecar with the SAME
    # parameters after postings change (df ranks / vanished terms go
    # stale); the partials fingerprint lets Suggester detect an index
    # that grew via add_increment since the sidecar was built
    meta = {
        b"max_edit": str(max_edit).encode(),
        b"min_df": str(min_df).encode(),
        b"partials": _partials_fingerprint(index_dir).encode(),
    }
    if not parts:
        merged = pa.table(
            {
                "dhash": pa.array([], pa.uint64()),
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            }
        )
    else:
        merged = pa.concat_tables(parts).combine_chunks()
        merged = merged.take(
            pc.sort_indices(merged, sort_keys=[("dhash", "ascending")])
        )
    tmp = out_path + ".tmp"
    pq.write_table(merged.replace_schema_metadata(meta), tmp)
    os.replace(tmp, out_path)
    return out_path


class Suggester:
    """Loaded deletes index: ``suggest(word)`` -> ranked corrections.

    STALE-SAFE: the sidecar records the partial list it was built from;
    if the index has since grown (``add_increment``) or been compacted,
    loading raises with a rebuild hint — suggestions silently missing
    the new increments' vocabulary are worse than a loud error. Pass
    ``allow_stale=True`` to serve the old vocabulary knowingly."""

    def __init__(self, index_dir: str, max_edit: int = 2,
                 allow_stale: bool = False):
        t = pq.read_table(os.path.join(index_dir, SUGGEST_NAME))
        meta = t.schema.metadata or {}
        built_from = meta.get(b"partials")
        if built_from is not None and not allow_stale:
            now = _partials_fingerprint(index_dir).encode()
            if built_from != now:
                raise ValueError(
                    "suggest sidecar is stale (index partials changed "
                    "since it was built) — re-run build_suggest_index, "
                    "or pass allow_stale=True"
                )
        self.dhash = t["dhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.terms = t["term"].combine_chunks()
        self.dfs = t["df"].to_numpy(zero_copy_only=False)
        self.max_edit = max_edit

    def suggest(
        self, word: str, max_edit: int | None = None, topn: int = 5
    ) -> list[tuple[str, int, int]]:
        """Ranked [(term, distance, df)] with ``distance <= max_edit``,
        ordered (distance asc, df desc, term asc), ``word`` itself excluded."""
        d = self.max_edit if max_edit is None else min(max_edit, self.max_edit)
        word = word.lower()
        probes = sorted(_delete_variants(word, d))
        h = md5_u64(pa.array(probes, pa.string()))
        h.sort()
        lo = np.searchsorted(self.dhash, h, side="left")
        hi = np.searchsorted(self.dhash, h, side="right")
        cand_idx: set[int] = set()
        for a, b in zip(lo, hi):
            cand_idx.update(range(int(a), int(b)))
        best: dict[str, tuple[int, int]] = {}
        for i in cand_idx:
            t = self.terms[i].as_py()
            if t == word or t in best:
                continue
            dist = levenshtein(word, t)
            if dist <= d:
                best[t] = (dist, int(self.dfs[i]))
        ranked = sorted(
            ((t, dist, df) for t, (dist, df) in best.items()),
            key=lambda r: (r[1], -r[2], r[0]),
        )
        return ranked[:topn]


def _text_lexicon(index_dir: str) -> tuple[np.ndarray, bool]:
    """Sorted text-term array from ``term_stats.parquet`` plus the index's
    stem flag — the O(lexicon) df probe ``suggest_rewrite`` needs (never
    the full IndexReader, which loads every partial's postings bytes)."""
    import json

    t = pq.read_table(
        os.path.join(index_dir, "term_stats.parquet"), columns=["term", "kind"]
    )
    t = t.filter(pc.equal(t["kind"], 0)).combine_chunks()
    terms = np.sort(t["term"].to_numpy(zero_copy_only=False))
    with open(os.path.join(index_dir, "manifest.json")) as f:
        cfg = json.loads(json.load(f)["config"])
    return terms, bool(cfg.get("stem", True))


def suggest_rewrite(
    index_dir: str, query_text: str, suggester: Suggester | None = None
) -> tuple[str, dict[str, str]]:
    """Rewrite the UNKNOWN text terms of a query to their best correction.

    A term is unknown when it does not appear in the lexicon sidecar
    (term_stats.parquet — O(lexicon), never the postings). Math spans are
    left untouched, and MathML-format topics are returned verbatim (their
    markup tokens are not text terms to correct). Returns (rewritten text,
    {original: correction}); terms with no suggestion stay as-is. Use
    before ``search`` for a did-you-mean flow."""
    import re as _re

    from tangent_ray.query.scorer import _MATH_RE
    from tangent_ray.tokenize.porter import porter_stem

    if "<math" in query_text or ":math" in query_text:
        return query_text, {}
    terms_sorted, stem = _text_lexicon(index_dir)

    def known(t: str) -> bool:
        i = int(np.searchsorted(terms_sorted, t))
        return i < len(terms_sorted) and terms_sorted[i] == t

    if suggester is None:
        suggester = Suggester(index_dir)
    fixes: dict[str, str] = {}

    def fix_segment(seg: str) -> str:
        def repl(m: "_re.Match[str]") -> str:
            w = m.group(0)
            lw = w.lower()
            if known(porter_stem(lw) if stem else lw):
                return w
            # a stemmed index suggests STEMS; keep only corrections whose
            # re-tokenized form is actually indexed (stemming a stem can
            # produce a different string — e.g. an unstable suffix)
            for cand, _dist, _df in suggester.suggest(lw, topn=5):
                if known(porter_stem(cand) if stem else cand):
                    fixes[w] = cand
                    return cand
            return w

        return _re.sub(r"[A-Za-z0-9]+", repl, seg)

    pieces: list[str] = []
    pos = 0
    for m in _MATH_RE.finditer(query_text):
        pieces.append(fix_segment(query_text[pos : m.start()]))
        pieces.append(m.group(0))
        pos = m.end()
    pieces.append(fix_segment(query_text[pos:]))
    return "".join(pieces), fixes
