"""HTML SERP writer (S15) with an SLT -> Presentation-MathML renderer.

The reference emits per-query HTML result pages with the matched formulas
rendered as MathML (``ranking/query.py:530-1105``, ~600 LoC of templated
HTML + graphviz). This is an independent minimal SERP: one self-contained
HTML page per query listing the ranked documents, scores and matched
expressions, with formulas rendered by inverting our MathML->SLT parser
(:mod:`tangent_ray.tokenize.mathml`) — the emitted MathML parses back to
the identical SLT string (round-trip asserted in ``tests/test_serp.py``).

Presentation only: runs driver-side over top-k result tables (bounded
rows), never inside a data pipeline.
"""

from __future__ import annotations

import html
import os
import re
from xml.sax.saxutils import escape, quoteattr

import pyarrow as pa

from tangent_ray.tokenize.slt import SLTNode, parse_slt

_MAT_RE = re.compile(r"^M!(.*?)(\d+)x(\d+)$")


def _edges(node: SLTNode) -> dict[str, SLTNode]:
    return {c.ty: c for c in node.children}


def _cells(node: SLTNode) -> list[SLTNode]:
    """Row-major cell heads of a matrix node (w child + its e-chain)."""
    out: list[SLTNode] = []
    cur = _edges(node).get("w")
    while cur is not None:
        out.append(cur)
        cur = _edges(cur).get("e")
    return out


def _chain_xml(node: SLTNode | None) -> str:
    """Render a node and its n-chain; multiple items wrap in <mrow>."""
    items: list[str] = []
    cur = node
    while cur is not None:
        items.append(_one_xml(cur))
        cur = _edges(cur).get("n")
    if not items:
        return "<mrow/>"
    if len(items) == 1:
        return items[0]
    return "<mrow>" + "".join(items) + "</mrow>"


def _core_xml(node: SLTNode) -> str:
    te = node.te
    e = _edges(node)
    if te.startswith("V!"):
        return f"<mi>{escape(te[2:])}</mi>"
    if te.startswith("N!"):
        return f"<mn>{escape(te[2:])}</mn>"
    if te.startswith("T!"):
        return f"<mtext>{escape(te[2:])}</mtext>"
    if te.startswith("E!"):
        return f"<merror><mtext>{escape(te[2:])}</mtext></merror>"
    if te.startswith("?"):
        return f"<mqvar name={quoteattr(te[1:])}/>"
    if te == "W!":
        return "<mspace/>"
    if te == "F!":
        num = _chain_xml(e.get("o"))
        den = _chain_xml(e.get("u"))
        return f"<mfrac>{num}{den}</mfrac>"
    if te == "R!":
        body = _chain_xml(e.get("w"))
        idx = e.get("c")
        if idx is not None:
            return f"<mroot>{body}{_chain_xml(idx)}</mroot>"
        return f"<msqrt>{body}</msqrt>"
    m = _MAT_RE.match(te)
    if m:
        fences, rows, cols = m.group(1), int(m.group(2)), int(m.group(3))
        cells = [_chain_xml(c) for c in _cells(node)]
        if fences:
            half = len(fences) // 2
            op, cl = fences[:half] or "(", fences[half:] or ")"
            return (
                f"<mfenced open={quoteattr(op)} close={quoteattr(cl)}>"
                + "".join(cells)
                + "</mfenced>"
            )
        body = []
        for r in range(rows):
            row = cells[r * cols : (r + 1) * cols]
            body.append("<mtr>" + "".join(f"<mtd>{c}</mtd>" for c in row) + "</mtr>")
        return "<mtable>" + "".join(body) + "</mtable>"
    return f"<mo>{escape(te)}</mo>"


def _one_xml(node: SLTNode) -> str:
    """Core element plus its script/prescript wrappers (no n-chain)."""
    te = node.te
    e = _edges(node)
    out = _core_xml(node)
    consumed = {"n", "e"}
    if te == "F!":
        consumed |= {"o", "u"}
    elif te == "R!":
        consumed |= {"w", "c"}
    elif _MAT_RE.match(te):
        consumed |= {"w"}

    sub = e.get("b") if "b" not in consumed else None
    sup = e.get("a") if "a" not in consumed else None
    if sub is not None and sup is not None:
        out = f"<msubsup>{out}{_chain_xml(sub)}{_chain_xml(sup)}</msubsup>"
    elif sub is not None:
        out = f"<msub>{out}{_chain_xml(sub)}</msub>"
    elif sup is not None:
        out = f"<msup>{out}{_chain_xml(sup)}</msup>"

    under = e.get("u") if "u" not in consumed else None
    over = e.get("o") if "o" not in consumed else None
    if under is not None and over is not None:
        out = f"<munderover>{out}{_chain_xml(under)}{_chain_xml(over)}</munderover>"
    elif under is not None:
        out = f"<munder>{out}{_chain_xml(under)}</munder>"
    elif over is not None:
        out = f"<mover>{out}{_chain_xml(over)}</mover>"

    pre_b = e.get("d") if te != "R!" else None
    pre_a = e.get("c") if te != "R!" else None
    if pre_b is not None or pre_a is not None:
        parts = [out, "<mprescripts/>"]
        parts.append(_chain_xml(pre_b) if pre_b is not None else "<none/>")
        parts.append(_chain_xml(pre_a) if pre_a is not None else "<none/>")
        out = "<mmultiscripts>" + "".join(parts) + "</mmultiscripts>"
    return out


def slt_to_mathml(slt: str | SLTNode, display: str = "inline") -> str:
    """Presentation MathML of an SLT string; parses back to the same SLT."""
    root = parse_slt(slt) if isinstance(slt, str) else slt
    return f'<math display="{display}">' + _chain_xml(root) + "</math>"


_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #ccc; padding: 4px 10px; text-align: left; }}
.score {{ font-variant-numeric: tabular-nums; }}
.snippet {{ color: #555; font-size: 0.9em; margin-top: 2px; }}
.snippet em {{ background: #ffef9e; font-style: normal; }}
</style></head>
<body>
<h1>{title}</h1>
<p>Query: {query}</p>
<table>
<tr><th>rank</th><th>document</th><th>score</th><th>expression</th></tr>
{rows}
</table>
</body></html>
"""


_SPAN_RE = re.compile(r"\$(\[.*?\])\$")


def _math_or_text(text: str) -> str:
    """Render $...$ SLT spans of a query/result string as MathML.

    Spans are matched on the RAW text and only the non-math segments are
    HTML-escaped — escaping first would double-escape SLT symbol entities
    (``&lsqb;`` -> ``&amp;lsqb;``) before they reach the parser."""
    out: list[str] = []
    pos = 0
    for m in _SPAN_RE.finditer(text):
        out.append(html.escape(text[pos : m.start()]))
        try:
            out.append(slt_to_mathml(m.group(1)))
        except Exception:
            out.append(html.escape(m.group(0)))
        pos = m.end()
    out.append(html.escape(text[pos:]))
    return "".join(out)


_EM_RE = re.compile(r"</?em>")


def _escape_highlighted(snippet: str) -> str:
    """HTML-escape a highlighted snippet while preserving its <em> marks.

    ``extract_snippet`` builds the highlight from RAW corpus text — any
    markup in the document must not reach the page unescaped."""
    out: list[str] = []
    pos = 0
    for m in _EM_RE.finditer(snippet):
        out.append(html.escape(snippet[pos : m.start()]))
        out.append(m.group())  # the <em>/</em> marks themselves stay live
        pos = m.end()
    out.append(html.escape(snippet[pos:]))
    return "".join(out)


def render_serp(query_id: str, query_text: str, rows: list[dict]) -> str:
    """One HTML page: ranked rows of (rank, dockey/docid, score[, slt,
    highlighted])."""
    body = []
    for r in rows:
        doc = html.escape(str(r.get("dockey") or r.get("docid") or ""))
        if r.get("highlighted"):
            doc += (
                '<div class="snippet">'
                + _escape_highlighted(r["highlighted"])
                + "</div>"
            )
        score = html.escape(str(r.get("score", r.get("mss_h", ""))))
        expr = r.get("slt") or r.get("expression") or ""
        expr_xml = ""
        if expr:
            try:
                expr_xml = slt_to_mathml(expr)
            except Exception:
                expr_xml = html.escape(expr)
        body.append(
            f"<tr><td>{html.escape(str(r.get('rank', '')))}</td><td>{doc}</td>"
            f"<td class=\"score\">{score}</td><td>{expr_xml}</td></tr>"
        )
    return _PAGE.format(
        title=f"Results — {html.escape(query_id)}",
        query=_math_or_text(query_text),
        rows="\n".join(body),
    )


def write_serp(results: pa.Table, queries: pa.Table, out_dir: str,
               snippets: pa.Table | None = None) -> list[str]:
    """Write one SERP page per query; returns the file paths.

    ``results`` needs (query_id, rank, ...) columns as produced by
    ``search``/``rerank_search``; ``queries`` needs (query_id, text).
    ``snippets`` (optional, from ``query.snippets.snippets_for_results``)
    adds a highlighted keyword-in-context excerpt under each hit."""
    os.makedirs(out_dir, exist_ok=True)
    qtext = {
        r["query_id"]: r["text"] for r in queries.select(["query_id", "text"]).to_pylist()
    }
    snip: dict[tuple[str, int], str] = {}
    if snippets is not None:
        snip = {
            (r["query_id"], r["docid"]): r["highlighted"]
            for r in snippets.to_pylist()
        }
    by_q: dict[str, list[dict]] = {}
    for r in results.to_pylist():
        if snip:
            hl = snip.get((r["query_id"], r.get("docid")))
            if hl:
                r = dict(r, highlighted=hl)
        by_q.setdefault(r["query_id"], []).append(r)
    paths = []
    for qid, rows in sorted(by_q.items()):
        rows.sort(key=lambda r: r.get("rank", 0))
        page = render_serp(qid, qtext.get(qid, ""), rows)
        path = os.path.join(out_dir, f"serp_{qid}.html")
        with open(path, "w") as f:
            f.write(page)
        paths.append(path)
    return paths
