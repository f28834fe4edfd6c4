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
  ``array`` (colspec skipped), ``cases`` (opening-fence chain, like
  LaTeXML's ``mrow(mo "{", mtable)``), and the ams alignment
  environments (``aligned``/``align``/``gather``/``split``) as bare
  tables;
- ``\\left( ... \\right)`` and literal parenthesized groups are kept as
  plain operator tokens (the MathML path's fenced-row detection applies
  to ``mrow`` structure, not flat token streams); ``\\left.`` /
  ``\\right.`` null delimiters emit nothing;
- accents (``\\hat``/``\\bar``/``\\vec``/``\\tilde``/…) as
  mover/munder scripts, postfix primes as msup, ``\\binom`` as the
  fenced ``F!`` LaTeXML produces, ``\\text``/``\\mbox`` as ``T!`` text
  tokens, ``\\operatorname``/all-letter ``\\mathrm`` groups as single
  identifiers, ``\\mathbb``/``\\mathcal``/``\\mathfrak`` via the
  dedicated Unicode alphabets;
- Greek letters, letter-like symbols and common function/operator names
  from command tables; spacing commands and pure layout commands
  (``\\limits``, ``\\displaystyle``, ``\\,``) are dropped the way the
  MathML path drops ``mspace``.

Every construct above is asserted to serialize IDENTICALLY to the
MathML path on the equivalent Presentation-MathML markup
(``tests/test_latex.py``). Full LaTeX (user macros, text mode) stays
out of scope — LaTeXML is a compiler; this covers the constructs that
occur in math fragments of a text corpus.
"""

from __future__ import annotations

import re

from tangent_ray.tokenize.mathml import (
    MMLNode,
    _chain,
    _fenced,
    _is_ignorable,
    _make_matrix,
    _script,
    clean,
)
from tangent_ray.tokenize.slt import SLTNode

_GREEK = {
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ", "epsilon": "ϵ",
    "zeta": "ζ", "eta": "η", "theta": "θ", "iota": "ι", "kappa": "κ",
    "lambda": "λ", "mu": "μ", "nu": "ν", "xi": "ξ", "pi": "π", "rho": "ρ",
    # TeX \phi is the straight PHI SYMBOL, \varphi the loopy letter —
    # same symbol-vs-letter split as the \epsilon/\varepsilon pair
    "sigma": "σ", "tau": "τ", "upsilon": "υ", "phi": "ϕ", "chi": "χ",
    "psi": "ψ", "omega": "ω",
    "Gamma": "Γ", "Delta": "Δ", "Theta": "Θ", "Lambda": "Λ", "Xi": "Ξ",
    "Pi": "Π", "Sigma": "Σ", "Phi": "Φ", "Psi": "Ψ", "Omega": "Ω",
    "varepsilon": "ε", "vartheta": "ϑ", "varpi": "ϖ", "varrho": "ϱ",
    "varsigma": "ς", "varphi": "φ",
    # letter-LIKE symbols (identifiers, not operators)
    "aleph": "ℵ", "hbar": "ℏ", "ell": "ℓ", "Re": "ℜ", "Im": "ℑ",
    "wp": "℘", "imath": "ı", "jmath": "ȷ",
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
    "emptyset": "∅", "varnothing": "∅", "angle": "∠", "perp": "⊥",
    "parallel": "∥", "simeq": "≃", "cong": "≅", "ll": "≪", "gg": "≫",
    "langle": "⟨", "rangle": "⟩", "lfloor": "⌊", "rfloor": "⌋",
    "lceil": "⌈", "rceil": "⌉", "setminus": "∖", "bullet": "•",
    "dagger": "†", "mapsto": "↦", "iff": "⇔", "Leftrightarrow": "⇔",
    "leftrightarrow": "↔", "uparrow": "↑", "downarrow": "↓",
    "supset": "⊃", "supseteq": "⊇", "ni": "∋", "vdash": "⊢",
    "models": "⊨", "top": "⊤", "bot": "⊥", "therefore": "∴",
    "because": "∵", "implies": "⇒", "land": "∧", "lor": "∨",
    "lnot": "¬", "sqcup": "⊔", "sqcap": "⊓", "odot": "⊙",
    "ominus": "⊖", "oslash": "⊘", "bigcup": "⋃", "bigcap": "⋂",
    "bigoplus": "⨁", "bigotimes": "⨂", "coprod": "∐", "oint": "∮",
    "iint": "∬", "iiint": "∭", "nmid": "∤", "bmod": "mod",
    "vdots": "⋮", "ddots": "⋱", "triangle": "△", "nearrow": "↗",
    "searrow": "↘", "hookrightarrow": "↪", "longrightarrow": "⟶",
    "Longrightarrow": "⟹", "longmapsto": "⟼",
}

_FUNCS = {
    "sin", "cos", "tan", "cot", "sec", "csc", "log", "ln", "exp", "lim",
    "max", "min", "sup", "inf", "det", "gcd", "arg", "sinh", "cosh", "tanh",
    "arcsin", "arccos", "arctan", "coth", "deg", "dim", "hom", "ker",
    "lg", "liminf", "limsup", "Pr",
}

# accents: \hat{x} is LaTeXML's mover(x, op) — same _script call as the
# MathML path's <mover>, so twins serialize identically
_ACCENTS_OVER = {
    "hat": "^", "widehat": "^", "bar": "¯", "overline": "¯",
    "tilde": "~", "widetilde": "~", "vec": "→", "overrightarrow": "→",
    "dot": "˙", "ddot": "¨", "breve": "˘", "check": "ˇ",
    "acute": "´", "grave": "`", "overbrace": "⏞",
}
_ACCENTS_UNDER = {"underline": "¯", "underbrace": "⏟"}

# style commands are presentation-only (the MathML path ignores
# mathvariant); an all-letter argument merges to ONE identifier the way
# LaTeXML emits a single <mi>max</mi>
_STYLES = {
    "mathrm", "mathbf", "mathit", "mathsf", "mathtt", "boldsymbol", "bm",
    "mathnormal",
}
# ...except the alphabets with dedicated Unicode code points, where
# LaTeXML substitutes the styled character into the <mi>
_BB_EXC = {"C": "ℂ", "H": "ℍ", "N": "ℕ", "P": "ℙ", "Q": "ℚ", "R": "ℝ",
           "Z": "ℤ"}
_CAL_EXC = {"B": "ℬ", "E": "ℰ", "F": "ℱ", "H": "ℋ", "I": "ℐ", "L": "ℒ",
            "M": "ℳ", "R": "ℛ", "e": "ℯ", "g": "ℊ", "o": "ℴ"}
_FRAK_EXC = {"C": "ℭ", "H": "ℌ", "I": "ℑ", "R": "ℜ", "Z": "ℨ"}


def _styled_letter(c: str, style: str) -> str:
    if style == "mathbb":
        if c in _BB_EXC:
            return _BB_EXC[c]
        if c.isupper():
            return chr(0x1D538 + ord(c) - ord("A"))
        if c.islower():
            return chr(0x1D552 + ord(c) - ord("a"))
        if c.isdigit():
            return chr(0x1D7D8 + ord(c) - ord("0"))
    elif style == "mathcal":
        if c in _CAL_EXC:
            return _CAL_EXC[c]
        if c.isupper():
            return chr(0x1D49C + ord(c) - ord("A"))
        if c.islower():
            return chr(0x1D4B6 + ord(c) - ord("a"))
    elif style == "mathfrak":
        if c in _FRAK_EXC:
            return _FRAK_EXC[c]
        if c.isupper():
            return chr(0x1D504 + ord(c) - ord("A"))
        if c.islower():
            return chr(0x1D51E + ord(c) - ord("a"))
    return c


_ALPHABETS = {"mathbb", "mathcal", "mathfrak"}

_MATRIX_FENCES = {
    "matrix": None,
    "smallmatrix": None,
    "pmatrix": ("(", ")"),
    "bmatrix": ("[", "]"),
    "Bmatrix": ("{", "}"),
    "vmatrix": ("|", "|"),
    "Vmatrix": ("∥", "∥"),
}
# bare (fence-less) alignment environments — all mtable in LaTeXML
_BARE_ENVS = {"array", "aligned", "align", "align*", "alignat", "alignat*",
              "alignedat", "gathered", "gather", "gather*", "split",
              "eqnarray", "eqnarray*"}
# environments with a mandatory layout argument after \begin{...}
_ARG_ENVS = {"alignat", "alignat*", "alignedat"}
# cases: LaTeXML emits mrow(mo "{", mtable) — an OPENING fence only, which
# the MathML path keeps as a flat chain (fenced-row detection needs both)

# pure layout commands with no MathML output — dropped at tokenize time so
# they can't sit between a base and its scripts (\sum\limits_{i})
_DROP_CMDS = {"limits", "nolimits", "displaystyle", "textstyle",
              "scriptstyle", "scriptscriptstyle", "mathstrut", "strut",
              "nonumber", "notag", "allowbreak"}
# escaped spacing characters (\, \; \! \: "\ ") — mspace in LaTeXML,
# ignorable in the MathML path's chains
_SPACING_ESC = set(",;!: \t\n")

_TOKEN_RE = re.compile(
    r"\\(?:text|textrm|textbf|textit|textsf|texttt|mbox|hbox)\s*\{([^{}]*)\}"
    r"|\\operatorname\*?\s*\{([^{}]*)\}"
    r"|\\begin\{(\w+\*?)\}|\\end\{(\w+\*?)\}|\\\\|\\([a-zA-Z]+)|\\(.)"
    r"|(\d+(?:\.\d+)?)|([a-zA-Z])|(\s+)|(.)",
    re.DOTALL,
)


class LaTeXError(ValueError):
    pass


def _tokenize(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for m in _TOKEN_RE.finditer(src):
        text, opname, beg, end, cmd, esc, num, letter, ws, other = m.groups()
        if text is not None:
            out.append(("text", text))
        elif opname is not None:
            out.append(("opname", opname))
        elif beg is not None:
            out.append(("begin", beg))
        elif end is not None:
            out.append(("end", end))
        elif m.group(0) == "\\\\":
            out.append(("rowsep", "\\\\"))
        elif cmd is not None:
            if cmd not in _DROP_CMDS:
                out.append(("cmd", cmd))
        elif esc is not None:
            # \{ \} are LITERAL braces (operator tokens), distinct from the
            # group braces the parser structures on; \, etc. are spacing
            if esc in _SPACING_ESC:
                continue
            if esc == "|":
                out.append(("esc", "∥"))
            else:
                out.append(("esc", esc))
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
        if self.i >= len(self.toks):
            raise LaTeXError("unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _skip_braced_group(self) -> None:
        """Consume a balanced ``{ ... }`` group without emitting nodes
        (layout arguments: array colspec, alignat column count)."""
        if self.peek() != ("op", "{"):
            return
        depth = 0
        while True:
            t = self.next()  # raises LaTeXError at end of input
            if t == ("op", "{"):
                depth += 1
            elif t == ("op", "}"):
                depth -= 1
                if depth == 0:
                    return

    # -- grammar ----------------------------------------------------------

    def parse_chain(self, stop: set[str]) -> MMLNode | None:
        """A horizontal run of atoms (with postfix scripts) up to a stop.
        Bare whitespace nodes are dropped, mirroring the MathML path's
        mrow/mstyle chains (``_is_ignorable``)."""
        nodes: list[MMLNode] = []
        while True:
            t = self.peek()
            if t is None or t[0] in stop or (t[0] == "op" and t[1] in stop):
                break
            nodes.append(self.parse_scripted())
        return _chain([n for n in nodes if not _is_ignorable(n)])

    def parse_scripted(self) -> MMLNode | None:
        base = self.parse_atom()
        below = above = None
        primes = 0
        while True:
            t = self.peek()
            if t == ("op", "^") and above is None:
                self.next()
                above = self.parse_group_or_atom()
            elif t == ("op", "_") and below is None:
                self.next()
                below = self.parse_group_or_atom()
            elif t == ("op", "'"):
                self.next()
                primes += 1
            else:
                break
        if primes:
            # x' is msup(x, ′) in LaTeXML; repeated primes share one <mo>
            p = MMLNode("′" * primes)
            above = p if above is None else _chain([p, above])
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

    def _all_letter_group(self) -> str | None:
        """If the next tokens are ``{ letters }``, consume and return the
        letters; a single letter atom also qualifies. None = not pure
        letters (nothing consumed)."""
        t = self.peek()
        if t is not None and t[0] == "var":
            self.next()
            return t[1]
        if t != ("op", "{"):
            return None
        j = self.i + 1
        letters: list[str] = []
        while j < len(self.toks) and self.toks[j][0] == "var":
            letters.append(self.toks[j][1])
            j += 1
        if letters and j < len(self.toks) and self.toks[j] == ("op", "}"):
            self.i = j + 1
            return "".join(letters)
        return None

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
        if kind == "text":
            self.next()
            c = clean(val)
            return MMLNode("T!" + c if c else "W!")  # <mtext>
        if kind == "opname":
            self.next()
            c = clean(val)
            return MMLNode("V!" + c if c else "W!")  # <mi>name</mi>
        if kind == "esc":
            self.next()
            return MMLNode(clean(val))  # literal \{ \} \| \$ \% ...
        if kind == "op":
            if val == "{":
                return self.parse_braced()
            self.next()
            return MMLNode(clean(val))
        if kind == "begin":
            return self.parse_matrix()
        if kind == "cmd":
            self.next()
            if val in ("frac", "dfrac", "tfrac", "cfrac"):
                node = MMLNode("F!")
                node.over = self.parse_group_or_atom()
                node.under = self.parse_group_or_atom()
                return node
            if val in ("binom", "dbinom", "tbinom"):
                # LaTeXML: mrow(mo "(", mfrac[linethickness=0], mo ")") —
                # the MathML path turns that into a fenced 1x1 wrapper
                node = MMLNode("F!")
                node.over = self.parse_group_or_atom()
                node.under = self.parse_group_or_atom()
                return _fenced("(", ")", [node])
            if val == "sqrt":
                node = MMLNode("R!")
                if self.peek() == ("op", "["):
                    self.next()
                    node.pre_above = self.parse_chain({"]"})
                    self.next()  # ']'
                node.within = self.parse_group_or_atom() or MMLNode("W!")
                return node
            if val in ("left", "right"):
                # sizing hint; the fence token itself follows — except the
                # null delimiter "\left." / "\right." which emits nothing
                if self.peek() == ("op", "."):
                    self.next()
                return None
            if val in _ACCENTS_OVER:
                base = self.parse_group_or_atom() or MMLNode("W!")
                return _script(
                    [base, MMLNode(clean(_ACCENTS_OVER[val]))],
                    ("over",), ("over",), (1,),
                )
            if val in _ACCENTS_UNDER:
                base = self.parse_group_or_atom() or MMLNode("W!")
                return _script(
                    [base, MMLNode(clean(_ACCENTS_UNDER[val]))],
                    ("under",), ("under",), (1,),
                )
            if val in _STYLES:
                letters = self._all_letter_group()
                if letters is not None:
                    return MMLNode("V!" + clean(letters))
                return self.parse_group_or_atom()  # style is transparent
            if val in _ALPHABETS:
                letters = self._all_letter_group()
                if letters is not None:
                    mapped = "".join(_styled_letter(c, val) for c in letters)
                    return MMLNode("V!" + clean(mapped))
                return self.parse_group_or_atom()
            if val in _GREEK:
                return MMLNode("V!" + _GREEK[val])
            if val in _OPS:
                return MMLNode(_OPS[val])
            if val in _FUNCS:
                return MMLNode("V!" + val)
            if val in ("quad", "qquad"):
                return MMLNode("W!")
            if val in ("text", "textrm", "textbf", "textit", "textsf",
                       "texttt", "mbox", "hbox", "operatorname"):
                # the tokenizer captures these with a flat-brace argument;
                # reaching here means nested braces (or a missing brace) —
                # fail loudly rather than indexing text content as math
                raise LaTeXError(f"\\{val}: argument must be a flat group")
            # unknown command: keep its name as an operator token (clean()
            # escapes anything structural)
            return MMLNode(clean("\\" + val))
        raise LaTeXError(f"unexpected token {t}")

    def parse_matrix(self) -> MMLNode:
        _, env = self.next()
        if env not in _MATRIX_FENCES and env not in _BARE_ENVS and env != "cases":
            raise LaTeXError(f"unsupported environment {env!r}")
        if env == "array":
            # skip the optional [pos] and the mandatory {colspec} — pure
            # layout, no MathML output
            if self.peek() == ("op", "["):
                while self.peek() != ("op", "]"):
                    self.next()  # raises LaTeXError at end of input
                self.next()
            self._skip_braced_group()
        elif env in _ARG_ENVS:
            self._skip_braced_group()  # {n} column count — pure layout
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
        if env == "cases":
            # LaTeXML: mrow(mo "{", mtable) — an opening fence only; the
            # MathML path keeps that as a flat chain (its fenced-row
            # detection requires BOTH fences)
            return _chain([MMLNode(clean("{")), inner])
        fences = _MATRIX_FENCES.get(env)  # bare envs: no fences
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
