"""TriG parser: Turtle + named-graph blocks (W3C RDF 1.2/1.1 TriG).

TriG (https://www.w3.org/TR/trig/) is Turtle extended with graph
statements, completing the repo's W3C concrete-syntax set (Turtle,
N-Triples, N-Quads, RDF/XML, JSON-LD, RDFa, microdata — reference scope is
Turtle-family input only, src/ShaclParser.php):

    @prefix ex: <http://e/> .
    ex:s ex:p ex:o .                  # default graph, plain Turtle
    GRAPH ex:g1 { ex:s ex:p ex:o . }  # named graph, GRAPH keyword
    ex:g2 { ex:s ex:p ex:o }          # named graph, bare label form
    { ex:s ex:p ex:o . }              # explicit default-graph block

Implementation: a thin subclass of the hand-written TurtleParser — every
term/list/collection production is inherited; this module adds only the
block grammar (label lookahead, optional final '.' before '}', graph
scoping for emitted triples). Emits quads (s, p, o, graph) in the same
shape as rdf.nquads, so operators/quads.py consumes both identically.
"""

from __future__ import annotations


from .turtle import TurtleParseError, TurtleParser, _unescape


class TrigParser(TurtleParser):
    def __init__(self, text: str, base: str = ""):
        super().__init__(text, base=base)
        self.quads: list[tuple] = []
        self._graph = ""  # '' = default graph, like rdf.nquads

    def _emit(self, s, p, o):
        self.quads.append((s, p, o, self._graph))

    def _peek2(self):
        if self.i + 1 < len(self.tokens):
            return self.tokens[self.i + 1]
        return self.tokens[-1]

    def parse_quads(self) -> list[tuple]:
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
            elif kind == "KEYWORD" and val.upper() == "GRAPH":
                self._next()
                label = self._graph_label()
                self._graph_block(label)
            elif kind == "PUNCT" and val == "{":
                self._graph_block("")
            elif (
                kind in ("IRIREF", "PNAME", "BLANK_NODE")
                and self._peek2()[:2] == ("PUNCT", "{")
            ):
                label = self._graph_label()
                self._graph_block(label)
            else:
                self._graph = ""
                self._triples_block()
        return self.quads

    def _graph_label(self) -> str:
        kind, val, pos = self._next()
        if kind == "IRIREF":
            return self._resolve_iri(_unescape(val[1:-1]))
        if kind == "PNAME":
            return self._expand_pname(val, pos)
        if kind == "BLANK_NODE":
            return val
        raise TurtleParseError(f"bad graph label {val!r} at {pos}")

    def _graph_block(self, label: str):
        self._expect_punct("{")
        prev = self._graph
        self._graph = label
        while True:
            kind, val, pos = self._peek()
            if kind == "PUNCT" and val == "}":
                self._next()
                break
            if kind == "EOF":
                raise TurtleParseError(f"unterminated graph block for {label!r}")
            self._graph_statement()
        self._graph = prev

    def _graph_statement(self):
        """One triples statement inside a block: same productions as
        Turtle's _triples_block, but the trailing '.' is optional before
        '}' (TriG triplesBlock grammar)."""
        kind, val, pos = self._peek()
        if kind == "PUNCT" and val == "[":
            subj = self._bnode_property_list()
            nxt = self._peek()[:2]
            if nxt == ("PUNCT", "."):
                self._next()
                return
            if nxt == ("PUNCT", "}"):
                return
            self._predicate_object_list(subj)
        elif kind == "PUNCT" and val == "(":
            subj = self._collection()
            self._predicate_object_list(subj)
        else:
            subj = self._subject()
            self._predicate_object_list(subj)
        nxt = self._peek()[:2]
        if nxt == ("PUNCT", "."):
            self._next()
        elif nxt != ("PUNCT", "}"):
            raise TurtleParseError(
                f"expected '.' or '}}' after triples in graph block, got {nxt[1]!r}"
            )


def parse_trig(text: str, base: str = "") -> tuple[list[tuple], dict[str, str]]:
    """Parse TriG text -> ([(s_term, p_term, o_term, graph_str), ...],
    prefixes). graph_str is '' for the default graph, matching
    rdf.nquads.parse_nquads."""
    p = TrigParser(text, base=base)
    quads = p.parse_quads()
    return quads, dict(p.prefixes)


def trig_default_graph(text: str, base: str = "") -> tuple[list[tuple], dict[str, str]]:
    """Triple view: the MERGED graph (union of default + named graphs) —
    what a triple-only consumer sees; graph provenance drops away."""
    quads, prefixes = parse_trig(text, base=base)
    return [(s, p, o) for s, p, o, _g in quads], prefixes
