"""N-Quads parser (RFC-style line format: N-Triples + optional graph label).

W3C N-Quads (https://www.w3.org/TR/n-quads/): each line is
``subject predicate object [graphLabel] .`` where graphLabel is an IRI or
blank node; a line without a graph label asserts into the default graph
(spelled '' here). This is the interchange format for NAMED-GRAPH (quad)
data — per-source graphs, provenance partitions, dataset dumps — which the
triple formats can't carry.

Reference anchor: parser-shacl stops at triple formats
(/root/reference/src — Turtle/JSON-LD/RDFa input only); quads extend the
corpus model the same way the engine's other additions do.
"""

from __future__ import annotations

import re

from .terms import bnode, iri, literal
from .turtle import TurtleParseError, _unescape

_QUAD_RE = re.compile(
    r"""^[ \t]*
    (?:<(?P<s_iri>[^>]*)>|(?P<s_bn>_:[A-Za-z0-9_][A-Za-z0-9_.-]*))
    [ \t]+<(?P<p>[^>]*)>[ \t]+
    (?:<(?P<o_iri>[^>]*)>
      |(?P<o_bn>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
      |"(?P<o_lit>(?:[^"\\]|\\.)*)"
        (?:\^\^<(?P<o_dt>[^>]*)>|@(?P<o_lang>[a-zA-Z]+(?:-[a-zA-Z0-9]+)*))?
    )
    (?:[ \t]+(?:<(?P<g_iri>[^>]*)>|(?P<g_bn>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)))?
    [ \t]*\.[ \t]*$""",
    re.VERBOSE,
)


def parse_nquads(text: str) -> tuple[list[tuple], dict[str, str]]:
    """-> ([(s_term, p_term, o_term, graph_str), ...], {}). graph_str is the
    graph IRI / bnode label, or '' for the default graph."""
    quads = []
    for ln, line in enumerate(text.split("\n"), 1):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _QUAD_RE.match(line)
        if m is None:
            raise TurtleParseError(f"bad N-Quads line {ln}: {line[:80]!r}")
        s = (
            iri(_unescape(m.group("s_iri")))
            if m.group("s_iri") is not None
            else bnode(m.group("s_bn"))
        )
        p = iri(_unescape(m.group("p")))
        if m.group("o_iri") is not None:
            o = iri(_unescape(m.group("o_iri")))
        elif m.group("o_bn") is not None:
            o = bnode(m.group("o_bn"))
        else:
            o = literal(
                _unescape(m.group("o_lit")),
                _unescape(m.group("o_dt")) if m.group("o_dt") else "",
                (m.group("o_lang") or "").lower(),
            )
        if m.group("g_iri") is not None:
            g = _unescape(m.group("g_iri"))
        elif m.group("g_bn") is not None:
            g = m.group("g_bn")
        else:
            g = ""
        quads.append((s, p, o, g))
    return quads, {}
