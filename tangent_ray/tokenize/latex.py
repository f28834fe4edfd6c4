"""Minimal LaTeX math -> SLT conversion (operator M3, partial).

The reference shells out to the external ``latexmlmath`` binary for
LaTeX input (``math_extractor.py``; unavailable both here and in the
reference's own bundled runs — its 4 ``.tex`` test files are the
"problem files" of ``log1.txt:177``). This is an independent native
parser for the common constructs, emitting the SAME SLT conventions as
the Presentation-MathML path (it reuses :mod:`tangent_ray.tokenize.mathml`'s
node builders, so ``\\frac{x}{y}`` and ``frac.mml`` serialize
identically — asserted in ``tests/test_latex.py`` against the bundled
``.tex``/``.mml`` twin files):

- numbers -> ``N!``, letters -> ``V!``, everything else an operator;
- ``\\frac{a}{b}`` -> ``F!`` over/under; ``\\sqrt{x}`` / ``\\sqrt[n]{x}``
  -> ``R!`` within (+ pre-above index);
- ``^`` / ``_`` scripts with the operator-base split (symbol bases take
  above/below, operator bases over/under);
- ``\\begin{<x>matrix}`` environments with ``&`` / ``\\\\`` ->
  ``M!RxC`` (+ the fence wrapper ``M!()1x1`` etc. for p/b/B/v/V forms);
- ``\\left( ... \\right)`` and literal parenthesized groups are kept as
  plain operator tokens (the MathML path's fenced-row detection applies
  to ``mrow`` structure, not flat token streams);
- Greek letters and common function names from a small command table.

Full LaTeX (ams environments, macros, text mode) stays out of scope —
LaTeXML is a compiler; this covers the constructs that occur in math
fragments of a text corpus.
"""

from __future__ import annotations

import re

from tangent_ray.tokenize.mathml import (
    MMLNode,
    _chain,
    _fenced,
    _make_matrix,
    _script,
    clean,
)
from tangent_ray.tokenize.slt import SLTNode

_GREEK = {
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ", "epsilon": "ϵ",
    "zeta": "ζ", "eta": "η", "theta": "θ", "iota": "ι", "kappa": "κ",
    "lambda": "λ", "mu": "μ", "nu": "ν", "xi": "ξ", "pi": "π", "rho": "ρ",
    "sigma": "σ", "tau": "τ", "upsilon": "υ", "phi": "φ", "chi": "χ",
    "psi": "ψ", "omega": "ω",
    "Gamma": "Γ", "Delta": "Δ", "Theta": "Θ", "Lambda": "Λ", "Xi": "Ξ",
    "Pi": "Π", "Sigma": "Σ", "Phi": "Φ", "Psi": "Ψ", "Omega": "Ω",
}

_OPS = {
    "pm": "±", "mp": "∓", "times": "×", "div": "÷", "cdot": "⋅",
    "le": "≤", "leq": "≤", "ge": "≥", "geq": "≥", "ne": "≠", "neq": "≠",
    "approx": "≈", "equiv": "≡", "sim": "∼", "propto": "∝",
    "in": "∈", "notin": "∉", "subset": "⊂", "subseteq": "⊆",
    "cup": "∪", "cap": "∩", "to": "→", "rightarrow": "→",
    "leftarrow": "←", "Rightarrow": "⇒", "infty": "∞", "partial": "∂",
    "nabla": "∇", "sum": "∑", "prod": "∏", "int": "∫", "ldots": "…",
    "cdots": "⋯", "dots": "…", "prime": "′", "circ": "∘", "ast": "*",
    "star": "⋆", "oplus": "⊕", "otimes": "⊗", "wedge": "∧", "vee": "∨",
    "forall": "∀", "exists": "∃", "neg": "¬", "mid": "∣",
}

_FUNCS = {
    "sin", "cos", "tan", "cot", "sec", "csc", "log", "ln", "exp", "lim",
    "max", "min", "sup", "inf", "det", "gcd", "arg", "sinh", "cosh", "tanh",
}

_MATRIX_FENCES = {
    "matrix": None,
    "pmatrix": ("(", ")"),
    "bmatrix": ("[", "]"),
    "Bmatrix": ("{", "}"),
    "vmatrix": ("|", "|"),
    "Vmatrix": ("∥", "∥"),
}

_TOKEN_RE = re.compile(
    r"\\begin\{(\w+)\}|\\end\{(\w+)\}|\\\\|\\([a-zA-Z]+)|\\(.)"
    r"|(\d+(?:\.\d+)?)|([a-zA-Z])|(\s+)|(.)",
    re.DOTALL,
)


class LaTeXError(ValueError):
    pass


def _tokenize(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for m in _TOKEN_RE.finditer(src):
        beg, end, cmd, esc, num, letter, ws, other = m.groups()
        if beg is not None:
            out.append(("begin", beg))
        elif end is not None:
            out.append(("end", end))
        elif m.group(0) == "\\\\":
            out.append(("rowsep", "\\\\"))
        elif cmd is not None:
            out.append(("cmd", cmd))
        elif esc is not None:
            out.append(("op", esc))  # \{  \}  \,  etc.
        elif num is not None:
            out.append(("num", num))
        elif letter is not None:
            out.append(("var", letter))
        elif ws is not None:
            continue
        else:
            out.append(("op", other))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    # -- grammar ----------------------------------------------------------

    def parse_chain(self, stop: set[str]) -> MMLNode | None:
        """A horizontal run of atoms (with postfix scripts) up to a stop."""
        nodes: list[MMLNode] = []
        while True:
            t = self.peek()
            if t is None or t[0] in stop or (t[0] == "op" and t[1] in stop):
                break
            nodes.append(self.parse_scripted())
        return _chain([n for n in nodes if n is not None])

    def parse_scripted(self) -> MMLNode | None:
        base = self.parse_atom()
        below = above = None
        while True:
            t = self.peek()
            if t == ("op", "^") and above is None:
                self.next()
                above = self.parse_group_or_atom()
            elif t == ("op", "_") and below is None:
                self.next()
                below = self.parse_group_or_atom()
            else:
                break
        if below is None and above is None:
            return base
        if base is None:
            base = MMLNode("W!")
        children = [base]
        slots_idx = []
        if below is not None:
            children.append(below)
            slots_idx.append(len(children) - 1)
        if above is not None:
            children.append(above)
            slots_idx.append(len(children) - 1)
        base_slots = tuple(
            s for s, v in (("below", below), ("above", above)) if v is not None
        )
        op_slots = tuple(
            s for s, v in (("under", below), ("over", above)) if v is not None
        )
        return _script(children, base_slots, op_slots, tuple(slots_idx))

    def parse_group_or_atom(self) -> MMLNode | None:
        t = self.peek()
        if t == ("op", "{"):
            return self.parse_braced()
        return self.parse_atom()

    def parse_braced(self) -> MMLNode | None:
        t = self.next()
        if t != ("op", "{"):
            raise LaTeXError(f"expected '{{' got {t}")
        inner = self.parse_chain({"}"})
        t = self.peek()
        if t != ("op", "}"):
            raise LaTeXError("unterminated group")
        self.next()
        return inner

    def parse_atom(self) -> MMLNode | None:
        t = self.peek()
        if t is None:
            return None
        kind, val = t
        if kind == "num":
            self.next()
            return MMLNode("N!" + clean(val))
        if kind == "var":
            self.next()
            return MMLNode("V!" + clean(val))
        if kind == "op":
            if val == "{":
                return self.parse_braced()
            self.next()
            return MMLNode(clean(val))
        if kind == "begin":
            return self.parse_matrix()
        if kind == "cmd":
            self.next()
            if val == "frac":
                node = MMLNode("F!")
                node.over = self.parse_group_or_atom()
                node.under = self.parse_group_or_atom()
                return node
            if val == "sqrt":
                node = MMLNode("R!")
                if self.peek() == ("op", "["):
                    self.next()
                    node.pre_above = self.parse_chain({"]"})
                    self.next()  # ']'
                node.within = self.parse_group_or_atom() or MMLNode("W!")
                return node
            if val in ("left", "right"):
                return None  # sizing hint; the fence token itself follows
            if val in _GREEK:
                return MMLNode("V!" + _GREEK[val])
            if val in _OPS:
                return MMLNode(_OPS[val])
            if val in _FUNCS:
                return MMLNode("V!" + val)
            if val in ("quad", "qquad", ",", ";", "!", " "):
                return MMLNode("W!")
            # unknown command: keep its name as an operator token (clean()
            # escapes anything structural)
            return MMLNode(clean("\\" + val))
        raise LaTeXError(f"unexpected token {t}")

    def parse_matrix(self) -> MMLNode:
        _, env = self.next()
        if env not in _MATRIX_FENCES:
            raise LaTeXError(f"unsupported environment {env!r}")
        rows: list[MMLNode | None] = []
        cells: list[MMLNode | None] = []
        while True:
            cell = self.parse_chain({"&", "rowsep", "end"})
            t = self.peek()
            if t is None:
                raise LaTeXError(f"unterminated environment {env!r}")
            if t == ("op", "&"):
                self.next()
                cells.append(cell)
                continue
            if t[0] == "rowsep":
                self.next()
                cells.append(cell)
                rows.append(_row(cells))
                cells = []
                continue
            if t[0] == "end":
                self.next()
                if not (cell is None and not cells):
                    cells.append(cell)
                    rows.append(_row(cells))
                break
        inner = _make_matrix(rows)
        fences = _MATRIX_FENCES[env]
        if fences is None:
            return inner
        return _fenced(clean(fences[0]), clean(fences[1]), [inner])

    def parse(self) -> MMLNode:
        node = self.parse_chain(set())
        if self.peek() is not None:
            raise LaTeXError(f"trailing tokens at {self.i}")
        if node is None:
            raise LaTeXError("empty expression")
        return node


def _row(cells: list[MMLNode | None]) -> MMLNode | None:
    cells = [c if c is not None else MMLNode("W!") for c in cells]
    if not cells:
        return None
    head = cells[0]
    cur = head
    for c in cells[1:]:
        cur = cur.last_element()
        cur.element = c
    return head


def latex_to_slt(src: str) -> SLTNode:
    """Parse a LaTeX math fragment into an SLT root."""
    node = _Parser(_tokenize(src)).parse()
    return node.to_slt("-")
