"""Turtle 1.1 parser — pure Python, deterministic, dependency-free.

Covers the grammar subset used by SHACL shapes graphs (which is essentially
all of Turtle): @prefix/@base/PREFIX/BASE (case-insensitive,
reference parity: tests/Characterization/ShaclParserTest.php:296-363),
prefixed names, IRI refs with \\u escapes, anonymous + labeled blank nodes,
blank-node property lists, collections, 'a', numeric/boolean literals,
single/triple-quoted strings with escapes, language tags, typed literals.

Output: list of (subject, predicate, object) term-tuples (see terms.py) in
document encounter order — order matters because the reference's label maps
are first-wins (ShaclShapeProcessor.php:299-313).

Anonymous blank nodes get deterministic labels ``_:b{n}`` in encounter order
so repeated parses of the same bytes yield identical triples (needed for the
byte-level resume/lineage invariants).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from .terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    bnode,
    iri,
    literal,
)


class TurtleParseError(ValueError):
    pass


# --- tokenizer -------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>[ \t\r\n]+)
  | (?P<COMMENT>\#[^\r\n]*)
  | (?P<QT_OPEN><<)
  | (?P<QT_CLOSE>>>)
  | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<STRING_LONG_DQ>\"\"\"(?:[^"\\]|\\.|\"(?!\"\")|\"\"(?!\"))*\"\"\")
  | (?P<STRING_LONG_SQ>'''(?:[^'\\]|\\.|'(?!'')|''(?!'))*''')
  | (?P<STRING_DQ>"(?:[^"\\\r\n]|\\.)*")
  | (?P<STRING_SQ>'(?:[^'\\\r\n]|\\.)*')
  | (?P<PREFIX_DIRECTIVE>@[pP][rR][eE][fF][iI][xX](?![a-zA-Z0-9-]))
  | (?P<BASE_DIRECTIVE>@[bB][aA][sS][eE](?![a-zA-Z0-9-]))
  | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<DOUBLE>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
  | (?P<DECIMAL>[+-]?\d*\.\d+)
  | (?P<INTEGER>[+-]?\d+)
  | (?P<BLANK_NODE>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
  | (?P<HATHAT>\^\^)
  | (?P<PNAME>[A-Za-z_][A-Za-z0-9_.-]*?:[A-Za-z0-9_:%\\./+#-]*[A-Za-z0-9_:%/+#-]|[A-Za-z_][A-Za-z0-9_.-]*?:|:[A-Za-z0-9_:%\\./+#-]*[A-Za-z0-9_:%/+#-]|:)
  | (?P<KEYWORD>[A-Za-z][A-Za-z]*)
  | (?P<PUNCT>[;,.\[\](){}])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}

_UESC_RE = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})|\\(.)")


def _unescape(s: str) -> str:
    def repl(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        c = m.group(3)
        if c in _ESCAPES:
            return _ESCAPES[c]
        raise TurtleParseError(f"bad escape \\{c}")

    return _UESC_RE.sub(repl, s)


def _tokenize(text: str):
    pos, n = 0, len(text)
    tokens = []
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise TurtleParseError(f"unexpected character {text[pos]!r} at offset {pos}")
        kind = m.lastgroup
        if kind not in ("WS", "COMMENT"):
            tokens.append((kind, m.group(), pos))
        pos = m.end()
    tokens.append(("EOF", "", n))
    return tokens


_NT_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _ser_term(t: tuple) -> str:
    """N-Triples spelling of a term for the quoted-triple canonical form
    (nested quoted triples recurse)."""
    value, kind = t[0], t[1]
    if kind == "iri":
        return f"<{value}>"
    if kind == "bnode":
        return value
    if kind == "triple":
        return value
    lex = "".join(_NT_ESC.get(c, c) for c in value)
    if t[3]:
        return f'"{lex}"@{t[3]}'
    if t[2]:
        return f'"{lex}"^^<{t[2]}>'
    return f'"{lex}"'


# --- parser ----------------------------------------------------------------


class TurtleParser:
    def __init__(self, text: str, base: str = ""):
        self.tokens = _tokenize(text)
        self.i = 0
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple] = []
        self._bnode_n = 0

    # token helpers
    def _peek(self):
        return self.tokens[self.i]

    def _next(self):
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def _expect_punct(self, ch: str):
        kind, val, pos = self._next()
        if kind != "PUNCT" or val != ch:
            raise TurtleParseError(f"expected {ch!r} got {val!r} at {pos}")

    def _new_bnode(self):
        self._bnode_n += 1
        return bnode(f"_:b{self._bnode_n}")

    def _emit(self, s, p, o):
        self.triples.append((s, p, o))

    # entry
    def parse(self):
        while True:
            kind, val, pos = self._peek()
            if kind == "EOF":
                break
            if kind == "PREFIX_DIRECTIVE":
                self._next()
                self._prefix_decl(require_dot=True)
            elif kind == "BASE_DIRECTIVE":
                self._next()
                self._base_decl(require_dot=True)
            elif kind == "KEYWORD" and val.upper() == "PREFIX":
                self._next()
                self._prefix_decl(require_dot=False)
            elif kind == "KEYWORD" and val.upper() == "BASE":
                self._next()
                self._base_decl(require_dot=False)
            else:
                self._triples_block()
        return self.triples

    def _prefix_decl(self, require_dot: bool):
        kind, val, pos = self._next()
        if kind != "PNAME" or not val.endswith(":"):
            # PNAME token may capture 'p:' exactly; a bare ':' is the empty prefix
            if not (kind == "PNAME" and val.endswith(":")):
                raise TurtleParseError(f"expected prefix name at {pos}, got {val!r}")
        prefix = val[:-1]
        kind2, val2, pos2 = self._next()
        if kind2 != "IRIREF":
            raise TurtleParseError(f"expected IRI in prefix decl at {pos2}")
        ns = self._resolve_iri(_unescape(val2[1:-1]))
        if prefix != "":
            self.prefixes[prefix] = ns
        else:
            self.prefixes[""] = ns
        if require_dot:
            self._expect_punct(".")
        elif self._peek()[:2] == ("PUNCT", "."):
            self._next()

    def _base_decl(self, require_dot: bool):
        kind, val, pos = self._next()
        if kind != "IRIREF":
            raise TurtleParseError(f"expected IRI in base decl at {pos}")
        self.base = self._resolve_iri(_unescape(val[1:-1]))
        if require_dot:
            self._expect_punct(".")
        elif self._peek()[:2] == ("PUNCT", "."):
            self._next()

    def _resolve_iri(self, ref: str) -> str:
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", ref):
            return urljoin(self.base, ref)
        return ref

    def _triples_block(self):
        kind, val, pos = self._peek()
        if kind == "PUNCT" and val == "[":
            subj = self._bnode_property_list()
            # subject-only bnode property list may be followed directly by '.'
            if self._peek()[:2] == ("PUNCT", "."):
                self._next()
                return
            self._predicate_object_list(subj)
            self._expect_punct(".")
            return
        if kind == "PUNCT" and val == "(":
            subj = self._collection()
            self._predicate_object_list(subj)
            self._expect_punct(".")
            return
        subj = self._subject()
        self._predicate_object_list(subj)
        self._expect_punct(".")

    def _quoted_triple(self):
        """RDF-star quoted triple ``<< s p o >>`` (W3C RDF 1.2 Turtle
        quoted-triple syntax, subject/object positions; the ``{| |}``
        annotation shorthand is not supported). Returns an opaque term of
        kind 'triple' whose value is the canonical serialized form —
        inner terms N-Triples-spelled, single-space separated — so the
        term survives the string-typed triples schema and downstream
        operators (kgforge.operators.rdfstar) can reify it losslessly."""
        self._next()  # consume <<
        s = self._subject()
        p = self._predicate()
        o = self._object()
        kind, val, pos = self._next()
        if kind != "QT_CLOSE":
            raise TurtleParseError(f"expected >> got {val!r} at {pos}")
        return (f"<< {_ser_term(s)} {_ser_term(p)} {_ser_term(o)} >>", "triple", "", "")

    def _subject(self):
        kind, val, pos = self._peek()
        if kind == "QT_OPEN":
            return self._quoted_triple()
        kind, val, pos = self._next()
        if kind == "IRIREF":
            return iri(self._resolve_iri(_unescape(val[1:-1])))
        if kind == "PNAME":
            return iri(self._expand_pname(val, pos))
        if kind == "BLANK_NODE":
            return bnode(val)
        raise TurtleParseError(f"bad subject {val!r} at {pos}")

    def _predicate(self):
        kind, val, pos = self._next()
        if kind == "KEYWORD" and val == "a":
            return iri(RDF_TYPE)
        if kind == "IRIREF":
            return iri(self._resolve_iri(_unescape(val[1:-1])))
        if kind == "PNAME":
            return iri(self._expand_pname(val, pos))
        raise TurtleParseError(f"bad predicate {val!r} at {pos}")

    def _predicate_object_list(self, subj):
        while True:
            pred = self._predicate()
            self._object_list(subj, pred)
            kind, val, _ = self._peek()
            if kind == "PUNCT" and val == ";":
                self._next()
                # allow trailing ';' before '.' or ']'
                k2, v2, _ = self._peek()
                if k2 == "PUNCT" and v2 in (".", "]", ";"):
                    while self._peek()[:2] == ("PUNCT", ";"):
                        self._next()
                    k2, v2, _ = self._peek()
                    if k2 == "PUNCT" and v2 in (".", "]"):
                        return
                continue
            return

    def _object_list(self, subj, pred):
        while True:
            obj = self._object()
            self._emit(subj, pred, obj)
            if self._peek()[:2] == ("PUNCT", ","):
                self._next()
                continue
            return

    def _object(self):
        kind, val, pos = self._peek()
        if kind == "QT_OPEN":
            return self._quoted_triple()
        if kind == "PUNCT" and val == "[":
            return self._bnode_property_list()
        if kind == "PUNCT" and val == "(":
            return self._collection()
        self._next()
        if kind == "IRIREF":
            return iri(self._resolve_iri(_unescape(val[1:-1])))
        if kind == "PNAME":
            return iri(self._expand_pname(val, pos))
        if kind == "BLANK_NODE":
            return bnode(val)
        if kind in ("STRING_DQ", "STRING_SQ", "STRING_LONG_DQ", "STRING_LONG_SQ"):
            if kind.startswith("STRING_LONG"):
                lex = _unescape(val[3:-3])
            else:
                lex = _unescape(val[1:-1])
            nk, nv, npos = self._peek()
            if nk == "LANGTAG":
                self._next()
                return literal(lex, "", nv[1:].lower())
            if nk == "HATHAT":
                self._next()
                dk, dv, dpos = self._next()
                if dk == "IRIREF":
                    dt = self._resolve_iri(_unescape(dv[1:-1]))
                elif dk == "PNAME":
                    dt = self._expand_pname(dv, dpos)
                else:
                    raise TurtleParseError(f"bad datatype at {dpos}")
                return literal(lex, dt, "")
            return literal(lex, "", "")
        if kind == "INTEGER":
            return literal(val, XSD_INTEGER, "")
        if kind == "DECIMAL":
            return literal(val, XSD_DECIMAL, "")
        if kind == "DOUBLE":
            return literal(val, XSD_DOUBLE, "")
        if kind == "KEYWORD" and val in ("true", "false"):
            return literal(val, XSD_BOOLEAN, "")
        raise TurtleParseError(f"bad object {val!r} at {pos}")

    def _bnode_property_list(self):
        self._expect_punct("[")
        node = self._new_bnode()
        kind, val, _ = self._peek()
        if kind == "PUNCT" and val == "]":
            self._next()
            return node
        self._predicate_object_list(node)
        self._expect_punct("]")
        return node

    def _collection(self):
        self._expect_punct("(")
        items = []
        while True:
            kind, val, _ = self._peek()
            if kind == "PUNCT" and val == ")":
                self._next()
                break
            items.append(self._object())
        if not items:
            return iri(RDF_NIL)
        head = self._new_bnode()
        cur = head
        for idx, item in enumerate(items):
            self._emit(cur, iri(RDF_FIRST), item)
            if idx == len(items) - 1:
                self._emit(cur, iri(RDF_REST), iri(RDF_NIL))
            else:
                nxt = self._new_bnode()
                self._emit(cur, iri(RDF_REST), nxt)
                cur = nxt
        return head

    def _expand_pname(self, pname: str, pos: int) -> str:
        prefix, _, local = pname.partition(":")
        if prefix not in self.prefixes:
            raise TurtleParseError(f"undefined prefix {prefix!r}: at {pos}")
        # PN_LOCAL escapes (\~ \. etc.)
        local = re.sub(r"\\(.)", r"\1", local)
        return self.prefixes[prefix] + local


def parse_turtle(text: str, base: str = "") -> tuple[list[tuple], dict[str, str]]:
    """Parse Turtle text → (triples, prefixes)."""
    p = TurtleParser(text, base=base)
    triples = p.parse()
    return triples, dict(p.prefixes)
