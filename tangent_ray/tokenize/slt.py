"""Symbol Layout Tree (SLT) strings: parse, serialize, symbol-pair tuples.

The reference represents every math formula as an SLT — a tree whose nodes
are typed symbols (``N!`` number, ``V!`` variable, ``T!`` text, ``F!``
fraction, ``R!`` radical, ``M!…`` matrix, bare operator, ``?x`` wildcard —
``math/mathsymbol.py:374-386``) and whose edges carry one of 9 labels
``n a b o u w c d e`` (next/above/below/over/under/within/pre-above/
pre-below/element). Its canonical serialization is the bracket string
``[tag[next…],a[…],b[…]…]`` (``math/mathsymbol.py:688-708``), which both the
Python front end and the C++ engine re-parse and round-trip-verify
(``mathindexmid.h:41-75``).

This module is an independent Python implementation of the same grammar and
of the authoritative tuple expansion (``ExprNode::tuples``,
``mathindexmid.h:33-34``):

- a *pair tuple* ``(ancestor, descendant, path, loc)`` is emitted for every
  node pair within ``window`` edges; ``path`` is the concatenation of edge
  labels from ancestor to descendant; ``loc`` is the ancestor's path from the
  root, run-length encoded when >= 6 chars (``runl``, ``mathindexmid.h:20``);
- descendants that are error nodes inside a ``w`` edge are skipped
  (``ty!='w' || te!="E!"``);
- an *end-of-line (EOL) tuple* ``(symbol, "0!", "n")`` is emitted for every
  node without an ``n``-child (and not ``E!``), gated by the EOL mode:
  ``all`` always, ``small`` only when the tree height is <= 1
  (``heightGT``), ``none`` never (``mathindex.cpp:13-19``);
- ``window == 0`` means unbounded (``mathindex.cpp:385``).

Locations do not participate in index/query matching (the reference lexicon
keys tuples by (from, to, path) only — ``tokentuple``, ``mathindexbase.h``);
they are carried for output fidelity.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SLTNode:
    te: str  # symbol, e.g. "V!x", "N!2", "+", "?v"
    ty: str = "-"  # edge label from parent: one of "nabouwcde", "-" for root
    children: list["SLTNode"] = field(default_factory=list)

    def height_gt(self, h: int) -> bool:
        if h <= 0 and self.children:
            return True
        return any(c.height_gt(h - 1) for c in self.children)

    def serialize(self) -> str:
        out: list[str] = []
        self._ser(out)
        return "".join(out)

    def _ser(self, out: list[str]) -> None:
        if self.ty not in ("n", "-"):
            out.append(",")
            out.append(self.ty)
        out.append("[")
        out.append(self.te)
        for c in self.children:
            c._ser(out)
        out.append("]")


class SLTParseError(ValueError):
    pass


def runl(s: str) -> str:
    """Run-length encode strings of length >= 6 (``runl``, mathindexmid.h:20)."""
    if len(s) < 6:
        return s
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        j = i
        while j < n and s[j] == s[i]:
            j += 1
        out.append(f"{j - i}{s[i]}")
        i = j
    return "".join(out)


def parse_slt(s: str) -> SLTNode:
    """Parse a canonical SLT bracket string; verifies the round trip."""
    root = SLTNode(te="", ty="-")
    i = _parse_rec(s, 0, root, first=True, ty="n")
    if i != len(s):
        raise SLTParseError(f"trailing characters at {i} in {s!r}")
    if root.serialize() != s:
        raise SLTParseError(f"round-trip mismatch for {s!r} -> {root.serialize()!r}")
    return root


def _parse_rec(s: str, i: int, parent: SLTNode, first: bool, ty: str) -> int:
    if i >= len(s):
        return i
    if s[i] != "[":
        raise SLTParseError(f"expected '[' at {i} in {s!r}")
    i += 1
    end = _next_ctl(s, i)
    if end <= i:
        raise SLTParseError(f"empty symbol at {i} in {s!r}")
    if first:
        node = parent
        node.te = s[i:end]
    else:
        node = SLTNode(te=s[i:end], ty=ty)
        parent.children.append(node)
    cc = s[end]
    if cc == "[":
        i = _parse_rec(s, end, node, first=False, ty="n")
    elif cc == ",":
        i = end + 1
    elif cc == "]":
        return end + 1
    # remaining elements: either ",", "]" or a single-char edge type then "["
    while True:
        end = _next_ctl(s, i)
        cc = s[end]
        if cc == "[":
            if end != i + 1:
                raise SLTParseError(f"bad edge label at {i} in {s!r}")
            i = _parse_rec(s, end, node, first=False, ty=s[i])
        elif cc == ",":
            if end != i:
                raise SLTParseError(f"unexpected value before ',' at {i} in {s!r}")
            i += 1
        elif cc == "]":
            if end != i:
                raise SLTParseError(f"unexpected value before ']' at {i} in {s!r}")
            return i + 1


def _next_ctl(s: str, i: int) -> int:
    n = len(s)
    j = i
    while j < n and s[j] not in "[,]":
        j += 1
    if j >= n:
        raise SLTParseError(f"unterminated expression in {s!r}")
    return j


def _pairs_from(
    node: SLTNode, w: int, loc: str, from_te: str, rel: str, out: list[tuple[str, str, str, str]]
) -> None:
    rel = rel + node.ty
    if not (node.ty == "w" and node.te == "E!"):
        out.append((from_te, node.te, rel, runl(loc)))
    w -= 1
    if w <= 0:
        return
    for c in node.children:
        _pairs_from(c, w, loc, from_te, rel, out)


def _anchors(
    node: SLTNode, w: int, eol: bool, loc: str, out: list[tuple[str, str, str, str]]
) -> None:
    loc = loc + node.ty
    for c in node.children:
        _pairs_from(c, w, loc, node.te, "", out)
    if eol and node.te != "E!" and not any(c.ty == "n" for c in node.children):
        out.append((node.te, "0!", "n", runl(loc)))
    for c in node.children:
        _anchors(c, w, eol, "" if node.ty == "-" else loc, out)


def slt_tuples(
    root: SLTNode, window: int = 1, eol: str = "small"
) -> list[tuple[str, str, str, str]]:
    """All symbol-pair tuples ``(from, to, path, loc)`` of an SLT.

    ``window`` counts edges (0 = unbounded); ``eol`` in {"none","small","all"}.
    Order and content mirror ``ExprNode::tuples`` (mathindexmid.h:33-34).
    """
    w = window if window > 0 else 1 << 30
    emit_eol = eol == "all" or (eol == "small" and not root.height_gt(1))
    out: list[tuple[str, str, str, str]] = []
    _anchors(root, w, emit_eol, "", out)
    return out


_SEP = "\x1f"


def tuple_term(fr: str, to: str, rel: str) -> str:
    """Serialize a (from, to, path) tuple into a single index term string.

    Locations are excluded, matching the reference lexicon key
    (``tokentuple`` is (fr, to, rl) only). MathML symbols never contain the
    separator (the reference's ``clean()`` escaping — ``mathsymbol.py:289-304``
    — strips control characters), but the ``$...$`` SLT path takes raw
    corpus text, so a stray ``\\x1f`` is sanitized here to keep the mapping
    injective (``parse_tuple_term`` depends on exactly two separators) and
    tuple terms distinct from plain ``[a-z0-9]+`` text terms.
    """
    if _SEP in fr:
        fr = fr.replace(_SEP, " ")
    if _SEP in to:
        to = to.replace(_SEP, " ")
    return f"{fr}{_SEP}{to}{_SEP}{rel}"


def parse_tuple_term(term: str) -> tuple[str, str, str]:
    fr, to, rel = term.split(_SEP)
    return fr, to, rel


def is_tuple_term(term: str) -> bool:
    return _SEP in term


def is_wildcard(sym: str) -> bool:
    """Wildcard symbols start with '?' (``?name`` — mathsymbol.py:680-684)."""
    return sym.startswith("?")
