"""Result snippets: best-window excerpts with query-term highlighting.

The reference's HTML SERP (S15, ``scripts/``) lists hits without context;
every production engine pairs a hit with a keyword-in-context excerpt
(Lucene's Highlighter/unified highlighter is the public model). This stage
adds that: for each (query, matched doc) pair, the window of ``width``
tokens containing the most DISTINCT query terms (ties: most total hits,
then earliest start) is extracted from the ORIGINAL text (casing and
punctuation preserved) with matched tokens wrapped in ``<em>``.

Scale shape: results are bounded (k docs per query), so the heavy side is
the corpus — one pruned, filtered streaming scan. The (docid -> queries)
map is ``ray.put`` once and probed per batch; snippet extraction runs only
on matched rows (k x queries total across the whole job), so the per-doc
Python window sweep is bounded work, never O(corpus). Matching honours the
engine's retrieval semantics: surface tokens are compared STEMMED when the
index was built with stemming, so a query for "merging" highlights
"merge", "merged", "merges" — exactly the tokens BM25 counted.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from tangent_ray.tokenize.porter import porter_stem

#: matched on the ORIGINAL text (case-insensitive) so character offsets
#: stay valid — lowercasing first can change string length (e.g. U+0130)
#: and shift every subsequent span
_TOKEN_RE = re.compile(r"[a-zA-Z0-9]+")
_SLT_SPAN_RE = re.compile(r"\$[^$]*\$")

SNIPPET_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("docid", pa.int64()),
        ("snippet", pa.string()),
        ("highlighted", pa.string()),
        ("n_hits", pa.int64()),
        ("n_distinct", pa.int64()),
    ]
)


def query_match_spec(
    text: str, stem: bool = True
) -> tuple[frozenset[str], tuple[str, ...]]:
    """(terms, glob patterns) a snippet should highlight for a query —
    extension syntax parsed with the SCORER'S OWN regexes so the two
    surfaces cannot drift: ``-term``/``-pre*``/``-{a,b}`` negations and
    ``#col:value`` filters never highlight, ``{a,b}`` members and
    ``term^2`` boosted terms highlight like plain terms, and any glob
    token (``pre*`` / ``te*m`` / ``t?st``) becomes a pattern matched
    against the (stemmed) doc tokens — mirroring wildcard expansion over
    the stemmed vocabulary; a lone trailing ``?`` is punctuation, like
    the scorer. Math spans ($...$ SLT and Presentation MathML) are
    stripped first, exactly as the scorer's parse_query does."""
    from tangent_ray.query.scorer import QueryScorer

    text = _SLT_SPAN_RE.sub(" ", text)
    if "<math" in text or ":math" in text:
        from tangent_ray.tokenize.mathml import MATHML_SPAN_RE

        text = MATHML_SPAN_RE.sub(" ", text)
    text = QueryScorer._NEG_RE.sub(" ", text)
    text = QueryScorer._FILTER_RE.sub(" ", text)
    extra: list[str] = []
    for body, _boost in QueryScorer._SYN_RE.findall(text):
        extra.extend(t.lower() for t in re.split(r"[,|]", body) if t)
    text = QueryScorer._SYN_RE.sub(" ", text)
    patterns: list[str] = []

    def _wild(m: re.Match) -> str:
        pat = m.group(1).lower()
        if pat.endswith("?") and "*" not in pat and "?" not in pat[:-1]:
            return pat[:-1]  # lone trailing ? is punctuation (scorer rule)
        patterns.append(pat)
        return " "

    text = QueryScorer._WILD_RE.sub(_wild, text)
    for term, _b in QueryScorer._BOOST_RE.findall(text):
        extra.append(term.lower())
    text = QueryScorer._BOOST_RE.sub(" ", text)
    toks = [t.lower() for t in _TOKEN_RE.findall(text)] + extra
    if stem:
        toks = [porter_stem(t) for t in toks]
    return frozenset(toks), tuple(sorted(set(patterns)))


def query_terms(text: str, stem: bool = True) -> frozenset[str]:
    """The distinct (optionally stemmed) highlightable TEXT terms of a
    query string (see ``query_match_spec`` — glob patterns excluded)."""
    return query_match_spec(text, stem=stem)[0]


def best_window(
    hit_idx: np.ndarray, hit_term: list[str], width: int
) -> tuple[int, int, int, int]:
    """Best token window over one doc's query-term hits.

    ``hit_idx``: sorted token indices of the hits; ``hit_term`` the matched
    (stemmed) term per hit. Returns (lo, hi, n_hits, n_distinct) — the
    inclusive hit range of the window maximizing (distinct terms, total
    hits, -start): a two-pointer sweep, O(hits)."""
    best = (-1, -1, 0, 0)
    counts: dict[str, int] = {}
    lo = 0
    for hi in range(len(hit_idx)):
        counts[hit_term[hi]] = counts.get(hit_term[hi], 0) + 1
        while hit_idx[hi] - hit_idx[lo] >= width:
            t = hit_term[lo]
            counts[t] -= 1
            if not counts[t]:
                del counts[t]
            lo += 1
        cand = (len(counts), hi - lo + 1)
        if cand > (best[3], best[2]):
            best = (lo, hi, hi - lo + 1, len(counts))
    return best


def extract_snippet(
    text: str, terms: frozenset[str], width: int = 24, stem: bool = True,
    patterns: tuple[str, ...] = (),
) -> tuple[str, str, int, int] | None:
    """(snippet, highlighted, n_hits, n_distinct) for one doc, or None when
    no query term occurs. The snippet spans ``width`` tokens centred on the
    best window, cut at token boundaries of the ORIGINAL text. A token
    hits when it equals a query term OR full-matches a ``patterns`` glob
    (the ``pre*`` / ``te*m`` / ``t?st`` highlight rule)."""
    import fnmatch

    spans = [(m.start(), m.end(), m.group().lower()) for m in _TOKEN_RE.finditer(text)]
    if not spans:
        return None
    rxs = [re.compile(fnmatch.translate(p)) for p in patterns]
    toks = [porter_stem(t) if stem else t for t in (s[2] for s in spans)]
    hit_mask = np.fromiter(
        (
            t in terms or any(rx.match(t) for rx in rxs)
            for t in toks
        ),
        dtype=bool, count=len(toks),
    )
    hits = np.flatnonzero(hit_mask)
    if not len(hits):
        return None
    lo, hi, n_hits, n_distinct = best_window(
        hits, [toks[i] for i in hits], width
    )
    first, last = int(hits[lo]), int(hits[hi])
    # widen symmetrically to ~width tokens of context
    pad = max(0, width - (last - first + 1)) // 2
    w_lo = max(0, first - pad)
    w_hi = min(len(spans) - 1, last + pad)
    c_lo, c_hi = spans[w_lo][0], spans[w_hi][1]
    raw = text[c_lo:c_hi]
    # highlight matched tokens inside the excerpt (char spans are relative)
    parts: list[str] = []
    cur = 0
    for i in range(w_lo, w_hi + 1):
        if not hit_mask[i]:
            continue
        s, e = spans[i][0] - c_lo, spans[i][1] - c_lo
        parts.append(raw[cur:s])
        parts.append("<em>" + raw[s:e] + "</em>")
        cur = e
    parts.append(raw[cur:])
    prefix = "…" if c_lo > 0 else ""
    suffix = "…" if c_hi < len(text) else ""
    return (
        prefix + raw + suffix,
        prefix + "".join(parts) + suffix,
        int(n_hits),
        int(n_distinct),
    )


def snippets_for_results(
    results: pa.Table,
    queries: pa.Table,
    corpus_files: list[str],
    corpus=None,
    width: int = 24,
    stem: bool = True,
    stored=None,
) -> pa.Table:
    """Snippet rows for every (query_id, docid) result pair.

    ``results`` needs (query_id, docid); ``queries`` (query_id, text) — the
    text queries' term sets drive matching (math-only queries produce no
    text terms and are skipped).

    Two text-access paths: with ``stored`` (a
    :class:`~tangent_ray.sources.stored.StoredFields` handle or its dir —
    the serving path) the k result texts come from a row-group-pruned
    O(results) lookup, no Ray job; without it, one filtered streaming scan
    of ``corpus_files`` (right for one-off batch calls; the scan is
    corpus-rate)."""
    import ray
    import ray.data

    if corpus is None:
        from tangent_ray.sources.corpus import TranscriptsCorpus

        corpus = TranscriptsCorpus()

    terms_by_query = {
        qid: query_match_spec(text, stem=stem)
        for qid, text in zip(
            queries["query_id"].to_pylist(), queries["text"].to_pylist()
        )
    }
    doc_queries: dict[int, list[str]] = {}
    for qid, docid in zip(
        results["query_id"].to_pylist(), results["docid"].to_pylist()
    ):
        terms, patterns = terms_by_query.get(qid, (frozenset(), ()))
        if terms or patterns:
            doc_queries.setdefault(int(docid), []).append(qid)
    if not doc_queries:
        return SNIPPET_SCHEMA.empty_table()

    if stored is not None:
        if isinstance(stored, str):
            from tangent_ray.sources.stored import StoredFields

            stored = StoredFields(stored)
        texts_of = stored.texts(list(doc_queries))
        rows = []
        for docid, qids in doc_queries.items():
            text = texts_of.get(docid)
            if text is None:
                continue
            for qid in qids:
                q_terms, q_patterns = terms_by_query[qid]
                got = extract_snippet(text, q_terms, width=width, stem=stem,
                                      patterns=q_patterns)
                if got is None:
                    continue
                snip, hl, n_hits, n_distinct = got
                rows.append(
                    {
                        "query_id": qid,
                        "docid": docid,
                        "snippet": snip,
                        "highlighted": hl,
                        "n_hits": n_hits,
                        "n_distinct": n_distinct,
                    }
                )
        if not rows:
            return SNIPPET_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=SNIPPET_SCHEMA).sort_by(
            [("query_id", "ascending"), ("docid", "ascending")]
        )

    map_ref = ray.put((doc_queries, terms_by_query))
    wanted = np.fromiter(doc_queries, dtype=np.int64)
    wanted.sort()

    def per_batch(batch: pa.Table) -> pa.Table:
        dq, tq = ray.get(map_ref)
        ids = corpus.docids(batch)
        pos = np.searchsorted(wanted, ids)
        pos_c = np.minimum(pos, len(wanted) - 1)
        mask = (pos < len(wanted)) & (wanted[pos_c] == ids)
        if not mask.any():
            return SNIPPET_SCHEMA.empty_table()
        texts = corpus.texts(batch)
        rows = []
        for i in np.flatnonzero(mask):
            text = texts[i].as_py() or ""
            for qid in dq[int(ids[i])]:
                q_terms, q_patterns = tq[qid]
                got = extract_snippet(text, q_terms, width=width, stem=stem,
                                      patterns=q_patterns)
                if got is None:
                    continue
                snip, hl, n_hits, n_distinct = got
                rows.append(
                    {
                        "query_id": qid,
                        "docid": int(ids[i]),
                        "snippet": snip,
                        "highlighted": hl,
                        "n_hits": n_hits,
                        "n_distinct": n_distinct,
                    }
                )
        if not rows:
            return SNIPPET_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=SNIPPET_SCHEMA)

    parts = [
        t
        for t in ray.get(
            ray.data.read_parquet(corpus_files, columns=list(corpus.columns))
            .map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return SNIPPET_SCHEMA.empty_table()
    out = pa.concat_tables(parts).combine_chunks()
    return out.sort_by([("query_id", "ascending"), ("docid", "ascending")])
