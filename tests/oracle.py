"""Slow, obviously-correct pure-Python retrieval oracle (no Ray).

Mirrors FIXTURES.md §4: dict-of-lists index; identical tokenizer primitives
and scoring formulas as the engine, but naive single-threaded accumulation.
Engine output must be rank-identical (same docids, same scores to 1e-9,
same order)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyarrow as pa

from tangent_ray.config import EngineConfig
from tangent_ray.docids import dockey_to_docid
from tangent_ray.tokenize.slt import (
    SLTParseError,
    is_wildcard,
    parse_slt,
    parse_tuple_term,
    slt_tuples,
    tuple_term,
    is_tuple_term,
)
from tangent_ray.tokenize.text import tokenize_text

MATH_RE = re.compile(r"\$([^$]+)\$")


def _extract_spans(text: str) -> tuple[list[str], str]:
    """All math fragments as SLT strings ($...$ + MathML), stripped text."""
    spans = MATH_RE.findall(text)
    stripped = MATH_RE.sub(" ", text)
    if "<math" in stripped:
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
    return spans, stripped


class OracleIndex:
    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.text_post: dict[str, dict[int, int]] = defaultdict(dict)
        self.math_post: dict[str, dict[int, int]] = defaultdict(dict)
        self.dl: dict[int, int] = {}
        self.mdl: dict[int, int] = {}
        self.N = 0

    def add_doc(self, docid: int, text: str) -> None:
        self.N += 1
        cfg = self.cfg
        if cfg.math:
            spans, text = _extract_spans(text)
            seen = set()
            bag: Counter = Counter()
            for slt in spans:
                if slt in seen:
                    continue
                seen.add(slt)
                try:
                    root = parse_slt(slt)
                except SLTParseError:
                    continue
                for fr, to, rel, _ in slt_tuples(root, cfg.window, cfg.eol):
                    bag[tuple_term(fr, to, rel)] += 1
            self.mdl[docid] = sum(bag.values())
            for t, c in bag.items():
                self.math_post[t][docid] = c
        _, terms, tfs, _, _ = tokenize_text(pa.array([text]), stem=cfg.stem)
        self.dl[docid] = int(tfs.sum())
        for t, c in zip(terms.to_pylist(), tfs):
            self.text_post[t][docid] = int(c)

    def add_transcripts(self, table: pa.Table) -> None:
        for row in table.to_pylist():
            self.add_doc(
                dockey_to_docid(f"{row['conv_id']}:{row['turn_idx']}"), row["text"]
            )

    # -- scoring ---------------------------------------------------------
    def avgdl(self) -> float:
        return max(sum(self.dl.values()) / max(self.N, 1), 1e-9)

    def bm25(self, terms: list[str]) -> dict[int, float]:
        k1, b = self.cfg.k1, self.cfg.b
        avgdl = self.avgdl()
        scores: dict[int, float] = defaultdict(float)
        for t in sorted(set(terms)):
            post = self.text_post.get(t)
            if not post:
                continue
            idf = math.log(1.0 + (self.N - len(post) + 0.5) / (len(post) + 0.5))
            for d, tf in post.items():
                tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * self.dl[d] / avgdl))
                scores[d] += idf * tfn
        return dict(scores)

    def fmeasure(self, bag: Counter, qtc: int) -> dict[int, float]:
        cc: dict[int, float] = defaultdict(float)
        used: dict[tuple[str, int], int] = {}
        concrete = sorted((t, c) for t, c in bag.items() if not isinstance(t, tuple))
        varpats = sorted(
            ((t, c) for t, c in bag.items() if isinstance(t, tuple)),
            key=lambda kv: str(kv[0]),
        )
        for t, qtf in concrete:
            for d, tf in self.math_post.get(t, {}).items():
                m = min(qtf, tf)
                cc[d] += m
                used[(t, d)] = m
        for pat, times in varpats:
            _, fr, to, rel = pat
            # per doc keep (best avail, winning term) — sorted-term order,
            # strict max, so the winner matches the engine deterministically
            per_doc: dict[int, tuple[float, str]] = {}
            for t in sorted(self.math_post):
                tfr, tto, trel = parse_tuple_term(t)
                if trel != rel:
                    continue
                if fr is None and tto != to:
                    continue
                if to is None and tfr != fr:
                    continue
                if fr is not None and to is not None:
                    continue
                for d, tf in self.math_post[t].items():
                    avail = min(times, tf - used.get((t, d), 0))
                    if avail > 0 and avail > per_doc.get(d, (0, ""))[0]:
                        per_doc[d] = (avail, t)
            for d, (v, t) in per_doc.items():
                cc[d] += v
                # consume the winner's tf (the reference's shared
                # IDIterPL.rem decrement across IND iterators)
                used[(t, d)] = used.get((t, d), 0) + v
        return {d: 2.0 * v / (self.mdl[d] + qtc) for d, v in cc.items() if v > 0}

    def parse_query(self, text: str):
        cfg = self.cfg
        spans, stripped = _extract_spans(text)
        _, terms, _, _, _ = tokenize_text(pa.array([stripped]), stem=cfg.stem)
        bag: Counter = Counter()
        qtc = 0
        n_formulae = 0
        for slt in spans:
            try:
                root = parse_slt(slt)
            except SLTParseError:
                continue
            n_formulae += 1
            for fr, to, rel, _ in slt_tuples(root, cfg.window, cfg.eol):
                if is_wildcard(fr) and is_wildcard(to):
                    continue
                qtc += 1
                if is_wildcard(fr):
                    bag[("var", None, to, rel)] += 1
                elif is_wildcard(to):
                    bag[("var", fr, None, rel)] += 1
                else:
                    bag[tuple_term(fr, to, rel)] += 1
        return sorted(set(terms.to_pylist())), bag, qtc, n_formulae

    def search(self, text: str, kind: str, k: int) -> list[tuple[int, float]]:
        terms, bag, qtc, n_formulae = self.parse_query(text)
        if kind == "text":
            scores = self.bm25(terms)
        elif kind == "math":
            scores = self.fmeasure(bag, qtc) if qtc else {}
        else:
            if qtc == 0 or n_formulae == 0:
                scores = self.bm25(terms)
            elif not terms:
                scores = self.fmeasure(bag, qtc)
            else:
                st = self.bm25(terms)
                sm = self.fmeasure(bag, qtc)
                mweight = n_formulae / (n_formulae + len(terms))
                if st:
                    lo, hi = min(st.values()), max(st.values())
                    st = {
                        d: (v - lo) / (hi - lo) if hi > lo else 1.0
                        for d, v in st.items()
                    }
                scores = defaultdict(float)
                for d, v in sm.items():
                    scores[d] += mweight * v
                for d, v in st.items():
                    scores[d] += (1 - mweight) * v
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
