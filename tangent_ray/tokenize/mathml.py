"""Presentation-MathML -> Symbol Layout Tree conversion (operators M2/M4/M5).

An independent implementation of the reference's MathML front end
(``math/mathsymbol.py:267-686`` parse_from_mathml + ``math_extractor.py``
isolation), covering the presentation elements the reference handles:

mi/mn/mo/mtext/ms/mspace, mrow/mpadded/mstyle, parenthesized rows ->
fenced matrices, mfenced, mfrac, msqrt/mroot, msub/msup/msubsup (with the
operator split: operator bases take under/over, symbol bases take
below/above), munder/mover/munderover, mtable/mtr/mtd, mmultiscripts
(incl. prescripts), menclose, mphantom/none, merror -> ``E!``, and query
wildcards (``mws:qvar`` and ``qvar``) -> ``?name``.

Symbol typing conventions (``mathsymbol.py:374-386``): ``V!`` identifier,
``N!`` number, ``T!`` text, ``W!`` whitespace, bare string = operator,
``F!`` fraction, ``R!`` radical, ``M!<fences><r>x<c>`` matrix/fenced group,
``E!`` error, ``?name`` wildcard. ``clean()`` escaping
(``mathsymbol.py:289-304``): tab/nl/cr to literal backslash escapes,
``?``->``&quest;``, ``,``->``&comma;``, ``[``/``]``->``&lsqb;``/``&rsqb;``;
invisible operators U+2061..2064 become ``W!``.

Edge slots serialize in the reference ``build_str`` order
(``mathsymbol.py:688-702``): next (unlabeled), then a b o u c d w e.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from tangent_ray.tokenize.slt import SLTNode


class MathMLError(ValueError):
    pass


_EDGE_ORDER = [
    ("above", "a"), ("below", "b"), ("over", "o"), ("under", "u"),
    ("pre_above", "c"), ("pre_below", "d"), ("within", "w"), ("element", "e"),
]

_CLEAN_MAP = {
    9: r"\t", 10: r"\n", 13: r"\r",
    ord("?"): "&quest;", ord(","): "&comma;",
    ord("["): "&lsqb;", ord("]"): "&rsqb;",
}

_INVISIBLE = {"⁡", "⁢", "⁣", "⁤"}


def clean(text: str | None) -> str:
    if not text:
        return ""
    t = text.strip()
    if t in _INVISIBLE:
        return ""
    return t.translate(_CLEAN_MAP)


class MMLNode:
    __slots__ = (
        "tag", "next", "above", "below", "over", "under",
        "pre_above", "pre_below", "within", "element",
    )

    def __init__(self, tag: str):
        self.tag = tag
        for s in (
            "next", "above", "below", "over", "under",
            "pre_above", "pre_below", "within", "element",
        ):
            setattr(self, s, None)

    # -- conversion to the engine's SLTNode ------------------------------
    def to_slt(self, ty: str = "-") -> SLTNode:
        node = SLTNode(te=self.tag, ty=ty)
        if self.next is not None:
            node.children.append(self.next.to_slt("n"))
        for slot, label in _EDGE_ORDER:
            child = getattr(self, slot)
            if child is not None:
                node.children.append(child.to_slt(label))
        return node

    def last_next(self) -> "MMLNode":
        n = self
        while n.next is not None:
            n = n.next
        return n

    def last_element(self) -> "MMLNode":
        n = self
        while n.element is not None:
            n = n.element
        return n


def _localname(tag: str) -> str:
    if tag.startswith("{"):
        return tag.rsplit("}", 1)[1]
    return tag


_OPEN_FENCES = set("({|∥") | {"&lsqb;"}
_CLOSE_FENCES = set(")}|∥") | {"&rsqb;"}


def _is_ignorable(n) -> bool:
    if n is None:
        return True
    if n == "PreScript":
        return False
    return n.tag in ("W!", "") and all(
        getattr(n, s) is None
        for s in ("next", "above", "below", "over", "under",
                  "pre_above", "pre_below", "within", "element")
    )


def _is_symbol_base(n: MMLNode) -> bool:
    """True when the script base is NOT an operator (typed symbols and
    wildcards take below/above; operators take under/over —
    the reference's sub/sup vs under/over split)."""
    return n.tag.startswith("?") or (len(n.tag) > 1 and n.tag[1] == "!")


def _chain(children: list[MMLNode | None]) -> MMLNode | None:
    children = [c for c in children if c is not None and c != "PreScript"]
    if not children:
        return None
    head = children[0]
    cur = head
    for c in children[1:]:
        cur = cur.last_next()
        cur.next = c
    return head


def _make_matrix(rows: list[MMLNode | None]) -> MMLNode:
    """M!RxC over row cell-chains linked by element edges (reference
    make_matrix, mathsymbol.py:237-265)."""
    n_rows = len(rows)
    n_cols = 0
    if n_rows and rows[0] is not None:
        n_cols = 1
        e = rows[0]
        while e.element is not None:
            n_cols += 1
            e = e.element
    root = MMLNode(f"M!{n_rows}x{n_cols}")
    if n_rows:
        first = rows[0] if rows[0] is not None else MMLNode("W!")
        root.within = first
        tail = first.last_element()
        for r in rows[1:]:
            tail.element = r if r is not None else MMLNode("W!")
            tail = tail.last_element()
    return root


def _fenced(opening: str, closing: str, cells: list[MMLNode | None]) -> MMLNode:
    cells = [c if c is not None else MMLNode("W!") for c in cells]
    root = MMLNode(f"M!{opening}{closing}1x{len(cells)}")
    if cells:
        root.within = cells[0]
        tail = cells[0].last_element()
        for c in cells[1:]:
            tail.element = c
            tail = tail.last_element()
    return root


def _split_cells(children: list[MMLNode]) -> list[MMLNode]:
    """Split a next-chain candidate list on comma separators into cells."""
    cells: list[list[MMLNode]] = [[]]
    for c in children:
        if c.tag in (",", "&comma;", ";"):
            cells.append([])
        else:
            cells[-1].append(c)
    return [_chain(c) or MMLNode("W!") for c in cells]


def _script(children: list, base_slots: tuple[str, ...], op_slots: tuple[str, ...],
            scripts_idx: tuple[int, ...]):
    base = children[0]
    if _is_ignorable(base):
        base = MMLNode("W!")
    if _is_symbol_base(base):
        slots = base_slots
    else:
        slots = op_slots
    if base.next is not None or any(getattr(base, s) is not None for s in slots):
        base = _make_matrix([base])
    for slot, idx in zip(slots, scripts_idx):
        setattr(base, slot, children[idx])
    return base


def parse_element(elem: ET.Element):
    """Recursive MathML -> MMLNode ('PreScript' sentinel for mprescripts)."""
    tag = _localname(elem.tag)
    if tag in ("math", "semantics", "mstyle"):
        parsed = [parse_element(c) for c in elem]
        children = [c for c in parsed if not _is_ignorable(c) and c != "PreScript"]
        if not children:
            # an expression whose every child reduced to whitespace (e.g.
            # LaTeXML's "~{}" -> empty <mi/>) is still an expression: the
            # reference keeps it as a bare W! node (mathsymbol.py:381)
            if any(c is not None and c != "PreScript" for c in parsed):
                return MMLNode("W!")
            return None
        return _chain(children) if tag != "semantics" else children[0]
    if tag in ("annotation", "annotation-xml"):
        return None
    if tag in ("mrow", "mpadded"):
        children = [parse_element(c) for c in elem]
        children = [c for c in children if not _is_ignorable(c)]
        if not children:
            return None
        if (
            len(children) > 2
            and children[0].tag in _OPEN_FENCES
            and children[-1].tag in _CLOSE_FENCES
        ):
            cells = _split_cells(children[1:-1])
            return _fenced(children[0].tag, children[-1].tag, cells)
        return _chain(children)
    if tag == "mfenced":
        children = [parse_element(c) for c in elem]
        children = [c for c in children if not _is_ignorable(c)]
        opening = clean(elem.attrib.get("open", "(")) or "("
        closing = clean(elem.attrib.get("close", ")")) or ")"
        return _fenced(opening, closing, children or [MMLNode("W!")])
    if tag == "mn":
        c = clean(elem.text)
        return MMLNode("N!" + c if c else "W!")
    if tag == "mi":
        c = clean(elem.text)
        return MMLNode("V!" + c if c else "W!")
    if tag == "mo":
        c = clean(elem.text)
        return MMLNode(c) if c else MMLNode("W!")
    if tag in ("mtext", "ms"):
        c = clean(elem.text)
        return MMLNode("T!" + c if c else "W!")
    if tag == "mspace":
        return MMLNode("W!")
    if tag in ("mphantom", "none"):
        return MMLNode("W!")
    if tag == "merror":
        return MMLNode("E!" + clean("".join(elem.itertext())))
    if tag in ("qvar", "mqvar"):
        name = elem.attrib.get("name") or clean(elem.text)
        return MMLNode("?" + name)
    if tag == "mfrac":
        ch = [parse_element(c) for c in elem]
        if len(ch) != 2:
            return _chain([c for c in ch if not _is_ignorable(c)])
        node = MMLNode("F!")
        node.over, node.under = ch[0], ch[1]
        return node
    if tag == "msqrt":
        ch = [parse_element(c) for c in elem]
        ch = [c for c in ch if c is not None]
        node = MMLNode("R!")
        node.within = _chain(ch) or MMLNode("W!")
        return node
    if tag == "mroot":
        ch = [parse_element(c) for c in elem]
        if len(ch) != 2:
            return _chain([c for c in ch if not _is_ignorable(c)])
        node = MMLNode("R!")
        node.within, node.pre_above = ch[0], ch[1]
        return node
    if tag == "msub":
        ch = [parse_element(c) for c in elem]
        if len(ch) != 2:
            return _chain([c for c in ch if not _is_ignorable(c)])
        return _script(ch, ("below",), ("under",), (1,))
    if tag == "msup":
        ch = [parse_element(c) for c in elem]
        if len(ch) != 2:
            return _chain([c for c in ch if not _is_ignorable(c)])
        return _script(ch, ("above",), ("over",), (1,))
    if tag == "msubsup":
        ch = [parse_element(c) for c in elem]
        if len(ch) != 3:
            return _chain([c for c in ch if not _is_ignorable(c)])
        return _script(ch, ("below", "above"), ("under", "over"), (1, 2))
    if tag == "munder":
        ch = [parse_element(c) for c in elem]
        if len(ch) != 2:
            return _chain([c for c in ch if not _is_ignorable(c)])
        return _script(ch, ("under",), ("under",), (1,))
    if tag == "mover":
        ch = [parse_element(c) for c in elem]
        if len(ch) != 2:
            return _chain([c for c in ch if not _is_ignorable(c)])
        return _script(ch, ("over",), ("over",), (1,))
    if tag == "munderover":
        ch = [parse_element(c) for c in elem]
        if len(ch) != 3:
            return _chain([c for c in ch if not _is_ignorable(c)])
        return _script(ch, ("under", "over"), ("under", "over"), (1, 2))
    if tag == "mtd":
        ch = [parse_element(c) for c in elem]
        return _chain([c for c in ch if c is not None]) or MMLNode("W!")
    if tag == "mtr":
        cells = [parse_element(c) for c in elem]
        cells = [c if c is not None else MMLNode("W!") for c in cells]
        if not cells:
            return MMLNode("W!")
        cur = cells[0]
        for c in cells[1:]:
            cur = cur.last_element()
            cur.element = c
        return cells[0]
    if tag == "mtable":
        rows = [parse_element(c) for c in elem]
        return _make_matrix(rows)
    if tag == "mprescripts":
        return "PreScript"
    if tag == "mmultiscripts":
        ch = [parse_element(c) for c in elem]
        if not ch:
            return None
        base = ch[0] if not _is_ignorable(ch[0]) else MMLNode("W!")
        try:
            pre = ch.index("PreScript")
        except ValueError:
            pre = len(ch)
        def _chain_pairs(items, lo_slot, hi_slot):
            subs = items[0::2]
            sups = items[1::2]
            setattr(base, lo_slot, _chain([s for s in subs if not _is_ignorable(s)]))
            setattr(base, hi_slot, _chain([s for s in sups if not _is_ignorable(s)]))
        if pre > 1:
            _chain_pairs(ch[1:pre], "below", "above")
        if pre < len(ch) - 1:
            _chain_pairs(ch[pre + 1 :], "pre_below", "pre_above")
        return base
    if tag == "menclose":
        node = MMLNode(elem.attrib.get("notation", "longdiv"))
        ch = [parse_element(c) for c in elem]
        ch = [c for c in ch if c is not None]
        if ch:
            node.within = _chain(ch)
        return node
    raise MathMLError(f"unknown MathML element <{tag}>")


_CONTENT_TAGS = {"apply", "ci", "cn", "csymbol", "cerror", "share", "bind"}


def isolate_presentation(math_elem: ET.Element) -> ET.Element:
    """Pick the Presentation-MathML subtree (reference
    ``math_extractor.py:76-109``): prefer
    ``annotation-xml[encoding="MathML-Presentation"]``, else the non-content
    child of ``semantics``, else the element itself."""
    for sem in math_elem.iter():
        if _localname(sem.tag) != "semantics":
            continue
        for ann in sem:
            if (
                _localname(ann.tag) == "annotation-xml"
                and ann.attrib.get("encoding", "") == "MathML-Presentation"
            ):
                wrap = ET.Element("math")
                wrap.extend(list(ann))
                return wrap
        pres = [
            c for c in sem
            if _localname(c.tag) not in ("annotation", "annotation-xml")
            and _localname(c.tag) not in _CONTENT_TAGS
        ]
        if pres:
            wrap = ET.Element("math")
            wrap.extend(pres)
            return wrap
    return math_elem


#: ``<math>...</math>`` span finder — DOTALL + namespace-prefix tolerant,
#: the reference's extraction regex family (``math_extractor.py:26-31``)
MATHML_SPAN_RE = re.compile(
    # case-sensitive: MathML elements are lowercase by spec; LaTeXML wraps
    # them in a capital-M <Math> element that must NOT anchor a span (it
    # would end at the inner </m:math> and leave unbalanced XML)
    r"<(?:\w+:)?math(?:\s[^>]*)?>.*?</(?:\w+:)?math>",
    re.DOTALL,
)

_NS_DECL_RE = re.compile(r"xmlns(:\w+)?=\"[^\"]*\"")
_NS_PREFIX_RE = re.compile(r"<(/?)(\w+):")


def mathml_to_slt(xml_str: str) -> SLTNode:
    """Parse a ``<math>...</math>`` string into an SLT root.

    Namespace prefixes are normalized away first (the reference strips
    namespaces with regexes too — ``math_extractor.py:60-73``).
    """
    src = _NS_PREFIX_RE.sub(r"<\1", _NS_DECL_RE.sub("", xml_str))
    try:
        elem = ET.fromstring(src)
    except ET.ParseError as e:
        raise MathMLError(f"bad MathML: {e}") from e
    elem = isolate_presentation(elem)
    node = parse_element(elem)
    if node is None or node == "PreScript":
        raise MathMLError("empty MathML expression")
    slt = node.to_slt("-")
    return slt
