"""Minimal JSON-LD 1.0 → triples expansion.

Covers the subset that appears in web-embedded ``<script
type="application/ld+json">`` blocks (schema.org-style) and in the engine's
synthetic fixtures: @context prefix/term maps, @id/@type/@graph, nested node
objects, arrays, value objects {@value,@language,@type}, @vocab, and
compact IRIs. Format detection parity: JSON-LD recognized by the presence of
@context (/root/reference/tests/Characterization/ShaclParserTest.php:197-290).
"""

from __future__ import annotations

import json
import re

from .terms import RDF_TYPE, XSD_BOOLEAN, XSD_DOUBLE, XSD_INTEGER, bnode, iri, literal

_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


class JsonLdError(ValueError):
    pass


class _Expander:
    def __init__(self):
        self.triples: list[tuple] = []
        self._bnode_n = 0

    def _new_bnode(self):
        self._bnode_n += 1
        return bnode(f"_:j{self._bnode_n}")

    def _ctx_from(self, ctx_val, parent: dict) -> dict:
        ctx = dict(parent)
        if ctx_val is None:
            return ctx
        items = ctx_val if isinstance(ctx_val, list) else [ctx_val]
        for item in items:
            if not isinstance(item, dict):
                continue  # remote contexts unsupported; skip deterministically
            for k, v in item.items():
                if k == "@vocab":
                    ctx["@vocab"] = v
                elif k == "@base":
                    ctx["@base"] = v
                elif isinstance(v, str):
                    ctx[k] = {"@id": v}
                elif isinstance(v, dict) and "@id" in v:
                    ctx[k] = v
        return ctx

    def _expand_iri(self, value: str, ctx: dict, vocab: bool = False):
        if value.startswith("_:"):
            return bnode(value)
        if value in ctx and isinstance(ctx[value], dict):
            mapped = ctx[value]["@id"]
            if mapped != value:
                return self._expand_iri(mapped, ctx, vocab=False)
            return iri(mapped)
        if ":" in value:
            prefix, _, local = value.partition(":")
            if prefix in ctx and isinstance(ctx[prefix], dict):
                return iri(ctx[prefix]["@id"] + local)
            if _ABS_IRI_RE.match(value):
                return iri(value)
        if vocab and "@vocab" in ctx:
            return iri(ctx["@vocab"] + value)
        if "@base" in ctx:
            return iri(ctx["@base"] + value)
        return iri(value)

    def _node_subject(self, node: dict, ctx: dict):
        nid = node.get("@id")
        if isinstance(nid, str):
            return self._expand_iri(nid, ctx)
        return self._new_bnode()

    def expand_node(self, node: dict, ctx: dict):
        ctx = self._ctx_from(node.get("@context"), ctx)
        if "@graph" in node:
            for item in _as_list(node["@graph"]):
                if isinstance(item, dict):
                    self.expand_node(item, ctx)
            # a node with @graph may still carry its own properties
        subj = self._node_subject(node, ctx)
        for key, val in node.items():
            if key in ("@context", "@id", "@graph"):
                continue
            if key == "@type":
                for t in _as_list(val):
                    if isinstance(t, str):
                        self.triples.append((subj, iri(RDF_TYPE), self._expand_iri(t, ctx, vocab=True)))
                continue
            if key.startswith("@"):
                continue
            pred = self._expand_iri(key, ctx, vocab=True)
            term_def = ctx.get(key) if isinstance(ctx.get(key), dict) else {}
            for v in _as_list(val):
                obj = self._expand_value(v, ctx, term_def)
                if obj is not None:
                    self.triples.append((subj, pred, obj))
        return subj

    def _expand_value(self, v, ctx: dict, term_def: dict):
        if isinstance(v, dict):
            if "@value" in v:
                lex = v["@value"]
                if isinstance(lex, bool):
                    return literal("true" if lex else "false", XSD_BOOLEAN)
                if isinstance(lex, int):
                    return literal(str(lex), XSD_INTEGER)
                if isinstance(lex, float):
                    return literal(repr(lex), XSD_DOUBLE)
                lang = v.get("@language", "")
                dt = v.get("@type", "")
                dt_iri = self._expand_iri(dt, ctx, vocab=True)[0] if dt else ""
                return literal(str(lex), dt_iri, (lang or "").lower())
            if "@list" in v:
                return self._expand_list(_as_list(v["@list"]), ctx, term_def)
            return self.expand_node(v, ctx)
        if isinstance(v, bool):
            return literal("true" if v else "false", XSD_BOOLEAN)
        if isinstance(v, int):
            return literal(str(v), XSD_INTEGER)
        if isinstance(v, float):
            return literal(repr(v), XSD_DOUBLE)
        if isinstance(v, str):
            if term_def.get("@type") == "@id":
                return self._expand_iri(v, ctx)
            lang = term_def.get("@language", "")
            return literal(v, "", (lang or "").lower())
        return None

    def _expand_list(self, items, ctx, term_def):
        from .terms import RDF_FIRST, RDF_NIL, RDF_REST

        if not items:
            return iri(RDF_NIL)
        head = self._new_bnode()
        cur = head
        for idx, item in enumerate(items):
            obj = self._expand_value(item, ctx, term_def)
            if obj is not None:
                self.triples.append((cur, iri(RDF_FIRST), obj))
            if idx == len(items) - 1:
                self.triples.append((cur, iri(RDF_REST), iri(RDF_NIL)))
            else:
                nxt = self._new_bnode()
                self.triples.append((cur, iri(RDF_REST), nxt))
                cur = nxt
        return head


def _as_list(v):
    return v if isinstance(v, list) else [v]


def parse_jsonld(text: str) -> tuple[list[tuple], dict[str, str]]:
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise JsonLdError(f"invalid JSON: {e}") from e
    exp = _Expander()
    prefixes: dict[str, str] = {}
    nodes = doc if isinstance(doc, list) else [doc]
    for node in nodes:
        if isinstance(node, dict):
            ctx = exp._ctx_from(node.get("@context"), {})
            for k, v in ctx.items():
                if not k.startswith("@") and isinstance(v, dict) and v["@id"].endswith(("/", "#")):
                    prefixes[k] = v["@id"]
            exp.expand_node(node, {})
    return exp.triples, prefixes
