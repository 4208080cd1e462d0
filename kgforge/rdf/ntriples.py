"""N-Triples parser (line-oriented subset of Turtle; quoted-triple
N-Triples-star lines delegate to the Turtle parser)."""

from __future__ import annotations

import re

from .terms import bnode, iri, literal
from .turtle import TurtleParseError, _unescape

_LINE_RE = re.compile(
    r"""^[ \t]*
    (?:<(?P<s_iri>[^>]*)>|(?P<s_bn>_:[A-Za-z0-9_][A-Za-z0-9_.-]*))
    [ \t]+<(?P<p>[^>]*)>[ \t]+
    (?:<(?P<o_iri>[^>]*)>
      |(?P<o_bn>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
      |"(?P<o_lit>(?:[^"\\]|\\.)*)"
        (?:\^\^<(?P<o_dt>[^>]*)>|@(?P<o_lang>[a-zA-Z]+(?:-[a-zA-Z0-9]+)*))?
    )
    [ \t]*\.[ \t]*$""",
    re.VERBOSE,
)


def parse_ntriples(text: str) -> tuple[list[tuple], dict[str, str]]:
    triples = []
    for ln, line in enumerate(text.split("\n"), 1):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _LINE_RE.match(line)
        if m is None:
            if "<<" in line:
                # N-Triples-star quoted-triple line (RDF 1.2): every
                # N-Triples statement is valid Turtle, so the one syntax
                # the line regex can't express delegates to the Turtle
                # parser's recursive quoted-triple support
                from .turtle import parse_turtle

                try:
                    star_triples, _ = parse_turtle(line)
                except TurtleParseError as ex:
                    raise TurtleParseError(
                        f"bad N-Triples line {ln}: {line[:80]!r} ({ex})"
                    ) from None
                triples.extend(star_triples)
                continue
            raise TurtleParseError(f"bad N-Triples line {ln}: {line[:80]!r}")
        s = iri(_unescape(m.group("s_iri"))) if m.group("s_iri") is not None else bnode(m.group("s_bn"))
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
        triples.append((s, p, o))
    return triples, {}
