"""The per-batch tokenizer stage: Arrow batch in -> (term, docid, ...) rows out.

This is the map side of the index build — the Ray-native replacement for the
reference's per-process document pipeline (read -> MathExtractor ->
Version03Index.add, ``index.py:68-127``) and the C++ tuple expansion
(``mathindexmid.h:41-75``). Passed to ``Dataset.map_batches(TokenizeBatch,
batch_format="pyarrow", concurrency=N)`` it runs as an actor pool: regexes
and the SLT-template tuple cache are built once per actor (``__init__``),
each call processes one zero-copy Arrow batch.

Output rows (one per distinct (doc, term)):

====== ======= ====================================================
column type    meaning
====== ======= ====================================================
term   string  text token (stemmed) or serialized symbol-pair tuple
kind   int8    0 = text term, 1 = math tuple term, 3 = problem marker
docid  int64   deterministic document id (see tangent_ray.docids)
tf     int32   term frequency within the document
dl     int32   doc length in the term's namespace (text tokens / tuples)
pos1   int32   first occurrence position (1-based; span ordinal for math)
bucket int32   docid-range salt bucket for the postings shuffle
====== ======= ====================================================

Math fragments are ``$...$`` spans (the reference's extraction regex family,
``math/math_extractor.py:26-31``) holding canonical SLT strings; identical
SLTs within a doc are deduplicated and their tuples counted once, with the
first span ordinal kept (reference per-doc dedup + positions,
``math/math_extractor.py:201-211``). Unparseable fragments are counted as
problem rows (the analogue of ``Stats.problem_files``, ``index.py:119-123``)
and never reach the postings.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tangent_ray.config import EngineConfig
from tangent_ray.sources.corpus import Corpus, corpus_from_json
from tangent_ray.tokenize.slt import SLTParseError, parse_slt, slt_tuples, tuple_term
from tangent_ray.tokenize.text import tokenize_text

KIND_TEXT = 0
KIND_MATH = 1
KIND_PROBLEM = 3
#: per-doc formula-count pseudo-rows (kind 4): tf carries the doc's
#: parsed formula INSTANCES (``\x02expr_inst``) / per-doc UNIQUE
#: expressions (``\x02expr_uniq``) so the build manifest reports the
#: reference indexer's expression totals (log1.txt:171-179 — e.g. 644
#: unique / 846 instances on the bundled smoke corpus) without a second
#: corpus pass. The \x02 prefix can never tokenize out of a query, the
#: same isolation rule as PROBLEM_TERM.
KIND_EXPR = 4
EXPR_INST_TERM = "\x02expr_inst"
EXPR_UNIQ_TERM = "\x02expr_uniq"
PROBLEM_TERM = "\x02problem"

_MATH_RE = re.compile(r"\$([^$]+)\$")

TOKEN_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("kind", pa.int8()),
        ("docid", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
        ("pos1", pa.int32()),
        ("bucket", pa.int32()),
    ]
)


class TokenizeBatch:
    def __init__(self, cfg: EngineConfig, corpus: Corpus | str, num_shards: int = 0):
        self.cfg = cfg
        self.corpus = corpus_from_json(corpus) if isinstance(corpus, str) else corpus
        self._tuple_cache: dict[str, Counter | None] = {}
        bits = cfg.salt_bits
        self._bucket_shift = np.uint64(63 - bits) if bits > 0 else None
        #: when > 0, a build-shard column (crc32(term) % num_shards) is
        #: appended so the build needs no separate shard-assignment pass
        self.num_shards = num_shards

    # -- math ------------------------------------------------------------
    _mathml_cache: dict[str, str | None]

    def _slt_of_mathml(self, xml: str) -> str | None:
        """Canonical SLT string of one ``<math>`` span (cached), or None."""
        cache = getattr(self, "_mathml_cache", None)
        if cache is None:
            cache = self._mathml_cache = {}
        if xml in cache:
            return cache[xml]
        from tangent_ray.tokenize.mathml import MathMLError, mathml_to_slt

        try:
            got: str | None = mathml_to_slt(xml).serialize()
        except MathMLError:
            got = None
        cache[xml] = got
        return got

    def _spans_of(self, text: str) -> list[str | None]:
        """All math fragments of a doc as SLT strings, in document order.

        ``$...$`` spans carry SLT syntax directly; ``<math>...</math>`` spans
        are converted through the MathML front end. ``None`` marks an
        unconvertible fragment (counted as a problem row by the caller).
        """
        spans: list[tuple[int, str | None]] = [
            (m.start(), m.group(1)) for m in _MATH_RE.finditer(text)
        ]
        if "<" in text and ("<math" in text or ":math" in text):
            from tangent_ray.tokenize.mathml import MATHML_SPAN_RE

            spans.extend(
                (m.start(), self._slt_of_mathml(m.group(0)))
                for m in MATHML_SPAN_RE.finditer(text)
            )
            spans.sort(key=lambda p: p[0])
        return [s for _, s in spans]

    def _tuples_of(self, slt: str) -> Counter | None:
        """Tuple-term bag of one SLT string (cached across docs/batches)."""
        got = self._tuple_cache.get(slt)
        if got is None and slt not in self._tuple_cache:
            try:
                root = parse_slt(slt)
                tups = slt_tuples(root, self.cfg.window, self.cfg.eol)
                got = Counter(
                    tuple_term(fr, to, rel)
                    for fr, to, rel, _loc in tups
                    if len(fr) + len(to) + len(rel) <= self.cfg.max_token_len
                )
            except SLTParseError:
                got = None
            self._tuple_cache[slt] = got
        return got

    def _math_rows(
        self, texts: pa.Array, docids: np.ndarray
    ) -> tuple[list[str], list[int], list[int], list[int], list[int], list[int]]:
        """Python-side math path; runs only on rows containing '$'."""
        terms: list[str] = []
        kinds: list[int] = []
        out_doc: list[int] = []
        tfs: list[int] = []
        dls: list[int] = []
        pos1s: list[int] = []
        has = pc.or_(
            pc.or_(
                pc.match_substring(texts, "$"),
                pc.match_substring(texts, "<math"),
            ),
            # namespace-prefixed MathML (<m:math ...>, the NTCIR topic /
            # arXiv xhtml convention) — cheap superset filter, _spans_of
            # does the precise span work
            pc.match_substring(texts, ":math"),
        ).to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(has):
            text = texts[i].as_py()
            spans = self._spans_of(text)
            if not spans:
                continue
            seen: dict[str, int] = {}
            parsed_ok: dict[str, bool] = {}
            bag: Counter = Counter()
            first_pos: dict[str, int] = {}
            problems = 0
            inst_ok = 0
            for ordinal, slt in enumerate(spans):
                if slt is None:
                    problems += 1
                    continue
                if slt in seen:
                    if parsed_ok[slt]:
                        inst_ok += 1  # duplicate INSTANCE of a good expr
                    continue
                seen[slt] = ordinal
                tups = self._tuples_of(slt)
                parsed_ok[slt] = tups is not None
                if tups is None:
                    problems += 1
                    continue
                inst_ok += 1
                for t, c in tups.items():
                    bag[t] += c
                    first_pos.setdefault(t, ordinal + 1)
            mdl = sum(bag.values())
            did = int(docids[i])
            for t, c in bag.items():
                terms.append(t)
                kinds.append(KIND_MATH)
                out_doc.append(did)
                tfs.append(c)
                dls.append(mdl)
                pos1s.append(first_pos[t])
            if inst_ok:
                uniq_ok = sum(parsed_ok.values())
                for pseudo, val in (
                    (EXPR_INST_TERM, inst_ok),
                    (EXPR_UNIQ_TERM, uniq_ok),
                ):
                    terms.append(pseudo)
                    kinds.append(KIND_EXPR)
                    out_doc.append(did)
                    tfs.append(val)
                    dls.append(0)
                    pos1s.append(0)
            if problems:
                terms.append(PROBLEM_TERM)
                kinds.append(KIND_PROBLEM)
                out_doc.append(did)
                tfs.append(problems)
                dls.append(0)
                pos1s.append(0)
        return terms, kinds, out_doc, tfs, dls, pos1s

    # -- main ------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        corpus = self.corpus
        docids = corpus.docids(batch)
        texts = corpus.texts(batch)

        math_cols = None
        if self.cfg.math:
            math_cols = self._math_rows(texts, docids)
            # strip math spans before text tokenization so SLT/MathML syntax
            # does not leak into text terms
            texts = pc.replace_substring_regex(texts, r"\$[^$]*\$", " ")
            if pc.any(pc.match_substring(texts, "<math")).as_py():
                texts = pc.replace_substring_regex(
                    texts, r"(?si)<(?:\w+:)?math(?:\s[^>]*)?>.*?</(?:\w+:)?math>", " "
                )

        rows, terms, tf, pos1, dl = tokenize_text(texts, stem=self.cfg.stem)
        if self.cfg.max_token_len < 32767:
            keep = pc.less_equal(pc.utf8_length(terms), self.cfg.max_token_len)
            if not pc.all(keep).as_py():
                keepn = keep.to_numpy(zero_copy_only=False)
                rows, tf, pos1 = rows[keepn], tf[keepn], pos1[keepn]
                terms = terms.filter(keep)

        out_term = [terms]
        out_kind = [np.zeros(len(rows), dtype=np.int8)]
        out_docid = [docids[rows]]
        out_tf = [tf]
        out_dl = [dl[rows]]
        out_pos1 = [pos1]
        if math_cols and math_cols[0]:
            mt, mk, md, mf, ml, mp = math_cols
            out_term.append(pa.array(mt, type=pa.string()))
            out_kind.append(np.asarray(mk, dtype=np.int8))
            out_docid.append(np.asarray(md, dtype=np.int64))
            out_tf.append(np.asarray(mf, dtype=np.int32))
            out_dl.append(np.asarray(ml, dtype=np.int32))
            out_pos1.append(np.asarray(mp, dtype=np.int32))

        term_arr = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_term])
        docid_arr = np.concatenate(out_docid).astype(np.int64)
        if self._bucket_shift is not None:
            bucket = (docid_arr.astype(np.uint64) >> self._bucket_shift).astype(np.int32)
            # non-power-of-two salt_buckets: the top-bits range is
            # 2^salt_bits > salt_buckets; clip (not modulo — buckets must
            # stay ordered docid ranges for the concat merge) so skey never
            # bleeds into the next shard's key space
            np.minimum(bucket, np.int32(self.cfg.salt_buckets - 1), out=bucket)
        else:
            bucket = np.zeros(len(docid_arr), dtype=np.int32)
        out = pa.Table.from_arrays(
            [
                term_arr,
                pa.array(np.concatenate(out_kind), type=pa.int8()),
                pa.array(docid_arr, type=pa.int64()),
                pa.array(np.concatenate(out_tf).astype(np.int32), type=pa.int32()),
                pa.array(np.concatenate(out_dl).astype(np.int32), type=pa.int32()),
                pa.array(np.concatenate(out_pos1).astype(np.int32), type=pa.int32()),
                pa.array(bucket, type=pa.int32()),
            ],
            schema=TOKEN_SCHEMA,
        )
        if self.num_shards:
            from tangent_ray.index.build import term_shards

            # single fused int32 shuffle key (shard * n_buckets + bucket):
            # a one-column int sort halves the shuffle cost vs a two-column key
            shard = term_shards(term_arr, self.num_shards)
            n_buckets = max(1, self.cfg.salt_buckets)
            skey = shard * np.int32(n_buckets) + bucket
            out = out.append_column("skey", pa.array(skey, type=pa.int32()))
        return out
