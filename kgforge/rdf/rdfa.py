"""Minimal RDFa-lite extraction from HTML — pure Python, regex tag scanner.

Supports the RDFa-lite attribute set found on Common-Crawl-style pages:
``vocab``, ``prefix``, ``typeof``, ``property``, ``resource``, ``about``,
``href``/``src``, ``content``, ``datatype``, plus inherited subject context
through element nesting. No external HTML parser exists in the runtime, so
this uses a deterministic tag tokenizer with a frame stack.

The reference parses RDF *content strings* only; RDFa handling is part of the
engine's web-page generalization (BASELINE.json north_star: "Turtle/RDFa/
JSON-LD triple extraction").
"""

from __future__ import annotations

import re
from html import unescape as html_unescape

from .terms import RDF_TYPE, bnode, iri, literal

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>", re.S)
_ATTR_RE = re.compile(r"([a-zA-Z_:][a-zA-Z0-9_:.-]*)\s*=\s*(\"[^\"]*\"|'[^']*')")
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")

_DEFAULT_PREFIXES = {
    "schema": "http://schema.org/",
    "dc": "http://purl.org/dc/elements/1.1/",
    "dcterms": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "sh": "http://www.w3.org/ns/shacl#",
    "og": "http://ogp.me/ns#",
}


def _parse_attrs(raw: str) -> dict[str, str]:
    return {k.lower(): html_unescape(v[1:-1]) for k, v in _ATTR_RE.findall(raw)}


class _Frame:
    __slots__ = ("tag", "subject", "vocab", "prefixes", "capture", "pred", "lang", "dt")

    def __init__(self, tag, subject, vocab, prefixes):
        self.tag = tag
        self.subject = subject
        self.vocab = vocab
        self.prefixes = prefixes
        self.capture = None  # list[str] when collecting literal text
        self.pred = None
        self.lang = ""
        self.dt = ""


def parse_rdfa(html: str, base: str = "") -> tuple[list[tuple], dict[str, str]]:
    triples: list[tuple] = []
    bnode_n = 0

    def new_bnode():
        nonlocal bnode_n
        bnode_n += 1
        return bnode(f"_:r{bnode_n}")

    def expand(curie: str, vocab: str, prefixes: dict, is_term_ok: bool):
        curie = curie.strip()
        if not curie:
            return None
        if ":" in curie:
            pfx, _, local = curie.partition(":")
            if pfx in prefixes:
                return iri(prefixes[pfx] + local)
            if _ABS_IRI_RE.match(curie):
                return iri(curie)
        if is_term_ok and vocab:
            return iri(vocab + curie)
        return None

    def resolve_ref(ref: str, vocab: str, prefixes: dict):
        ref = ref.strip()
        if ref.startswith("_:"):
            return bnode(ref)
        if ":" in ref:
            pfx, _, local = ref.partition(":")
            # declared CURIE prefixes beat the generic scheme check
            if pfx in prefixes and not local.startswith("//"):
                return iri(prefixes[pfx] + local)
        if _ABS_IRI_RE.match(ref):
            return iri(ref)
        if base:
            from urllib.parse import urljoin

            return iri(urljoin(base, ref))
        return iri(ref)

    root = _Frame("", iri(base) if base else new_bnode(), "", dict(_DEFAULT_PREFIXES))
    stack = [root]
    pos = 0
    for m in _TAG_RE.finditer(html):
        text = html[pos : m.start()]
        if text:
            for fr in stack:
                if fr.capture is not None:
                    fr.capture.append(text)
        pos = m.end()
        closing, tag, rawattrs, selfclose = m.groups()
        tag = tag.lower()
        if closing:
            # pop to matching tag
            for idx in range(len(stack) - 1, 0, -1):
                if stack[idx].tag == tag:
                    while len(stack) > idx:
                        fr = stack.pop()
                        _finish_frame(fr, triples)
                    break
            continue
        if tag in ("script", "style"):
            # skip contents entirely
            end = re.search(rf"</{tag}\s*>", html[pos:], re.I)
            if end:
                pos += end.end()
            continue
        parent = stack[-1]
        attrs = _parse_attrs(rawattrs)
        prefixes = parent.prefixes
        if "prefix" in attrs:
            prefixes = dict(prefixes)
            toks = attrs["prefix"].split()
            for i in range(0, len(toks) - 1, 2):
                if toks[i].endswith(":"):
                    prefixes[toks[i][:-1]] = toks[i + 1]
        vocab = attrs.get("vocab", parent.vocab).strip() if ("vocab" in attrs or parent.vocab) else ""

        frame = _Frame(tag, parent.subject, vocab, prefixes)
        frame.lang = attrs.get("lang", "")

        new_subject = None
        if "about" in attrs:
            new_subject = resolve_ref(attrs["about"], vocab, prefixes)
        resource_term = None
        for key in ("resource", "href", "src"):
            if key in attrs:
                resource_term = resolve_ref(attrs[key], vocab, prefixes)
                break

        prop_terms = []
        if "property" in attrs:
            for p in attrs["property"].split():
                t = expand(p, vocab, prefixes, is_term_ok=True)
                if t is not None:
                    prop_terms.append(t)

        typeof_terms = []
        if "typeof" in attrs:
            for t in attrs["typeof"].split():
                tt = expand(t, vocab, prefixes, is_term_ok=True)
                if tt is not None:
                    typeof_terms.append(tt)

        if new_subject is not None:
            frame.subject = new_subject
        elif typeof_terms and not prop_terms:
            # typeof without about/property starts a new (resource or bnode) subject
            frame.subject = resource_term if resource_term is not None else new_bnode()
        emitted_obj = None
        if prop_terms:
            if resource_term is not None or typeof_terms:
                obj = resource_term if resource_term is not None else new_bnode()
                for pt in prop_terms:
                    triples.append((parent.subject if new_subject is None else new_subject, pt, obj))
                frame.subject = obj
                emitted_obj = obj
            elif "content" in attrs:
                subj = new_subject if new_subject is not None else parent.subject
                dt = attrs.get("datatype", "")
                dt_term = expand(dt, vocab, prefixes, is_term_ok=True) if dt else None
                for pt in prop_terms:
                    triples.append(
                        (subj, pt, literal(attrs["content"], dt_term[0] if dt_term else "", frame.lang.lower()))
                    )
            else:
                # literal from element text — start capture
                frame.capture = []
                frame.pred = prop_terms
                dt = attrs.get("datatype", "")
                dt_term = expand(dt, vocab, prefixes, is_term_ok=True) if dt else None
                frame.dt = dt_term[0] if dt_term else ""

        subject_for_types = emitted_obj if emitted_obj is not None else frame.subject
        for tt in typeof_terms:
            triples.append((subject_for_types, iri(RDF_TYPE), tt))

        if selfclose or tag in _VOID_TAGS:
            _finish_frame(frame, triples)
        else:
            stack.append(frame)

    while len(stack) > 1:
        _finish_frame(stack.pop(), triples)

    return triples, dict(root.prefixes)


def _finish_frame(fr: _Frame, triples: list):
    if fr.capture is not None and fr.pred:
        text = html_unescape(re.sub(r"\s+", " ", "".join(fr.capture)).strip())
        for pt in fr.pred:
            triples.append((fr.subject, pt, literal(text, fr.dt, fr.lang.lower())))
