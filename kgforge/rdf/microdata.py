"""HTML microdata extraction (itemscope/itemtype/itemprop/itemid) — pure
Python, regex tag scanner, mapped to RDF per the W3C "Microdata to RDF"
note's core algorithm.

Microdata is the third embedded-structured-data syntax on Common-Crawl-style
pages alongside JSON-LD and RDFa (and historically the most common one for
schema.org markup), so a corpus-scale triple builder must read it
(BASELINE.json north_star: "Turtle/RDFa/JSON-LD triple extraction" — this
generalizes the same per-page scan). The reference parses RDF content
strings only (/root/reference/src/ShaclParser.php:34-43); HTML syntaxes are
part of this engine's web-page generalization, sharing the per-payload
parser contract of `kgforge.rdf.detect` (content -> (triples, prefixes)).

Mapping rules implemented (the subset that covers real-world schema.org
markup; deliberate omissions documented at the end):

- ``itemscope`` starts an item. Its subject is ``itemid`` (resolved against
  ``base`` when relative) if present, else a fresh blank node ``_:mN``
  (N = document encounter order, 1-based).
- ``itemtype`` (space-separated absolute IRIs) emits one ``rdf:type``
  triple per token and sets the item's property vocabulary: the type IRI
  truncated after its last ``/`` or ``#``.
- ``itemprop`` (space-separated names) on an element inside an item emits
  one triple per name with predicate = absolute IRI if the name contains
  ``:`` and looks absolute, else vocabulary + name (``http://schema.org/``
  + ``name`` for schema.org types), else skipped when no vocabulary is in
  scope.
- Property VALUE per the element kind:
  - also ``itemscope``        -> the nested item's subject (item-valued
    property; nesting recurses through the frame stack)
  - a/area/link               -> IRI from ``href``
  - img/audio/video/embed/iframe/source/track -> IRI from ``src``
  - object                    -> IRI from ``data``
  - meta                      -> string literal from ``content``
  - time                      -> ``datetime`` attribute if present, else
                                 descendant text
  - data                      -> ``value`` attribute if present, else text
  - anything else             -> descendant text content (entity-decoded,
                                 script/style excluded, stripped)
  URL-kind values resolve against ``base`` when relative; an element whose
  URL attribute is missing emits nothing (spec: no value).

- ``itemref`` (cross-element property grafting by id): supported one level
  deep — referenced elements (and their subtrees) are replayed with the
  referring item as context, exactly as if they were its children. Itemrefs
  found *inside* a referenced fragment are deliberately not chased (the
  spec's loop guard, trivially sufficient at one level), and a fragment
  that is also inside the item's own subtree would double-emit (the spec
  forbids authoring that shape).

Omissions (disclosed, not silent): per-property language tags (microdata
has no lang-tag story in the RDF note's core mapping; literals emit with
lang='').
"""

from __future__ import annotations

import re
from html import unescape as html_unescape
from urllib.parse import urljoin

from .terms import RDF_TYPE, bnode, iri, literal

_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>", re.S
)
_ATTR_RE = re.compile(r"([a-zA-Z_:][a-zA-Z0-9_:.-]*)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+))?")
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")

# element -> URL-bearing attribute (microdata spec "URL property elements")
_URL_ATTR = {
    "a": "href",
    "area": "href",
    "link": "href",
    "img": "src",
    "audio": "src",
    "video": "src",
    "embed": "src",
    "iframe": "src",
    "source": "src",
    "track": "src",
    "object": "data",
}


def _parse_attrs(raw: str) -> dict[str, str]:
    out = {}
    for k, v in _ATTR_RE.findall(raw):
        if v and v[0] in "\"'":
            v = v[1:-1]
        out[k.lower()] = html_unescape(v)
    return out


def _vocab_of(type_iri: str) -> str:
    """Property vocabulary base: the type IRI up to and including its last
    '/' or '#' (schema.org types -> 'http://schema.org/')."""
    cut = max(type_iri.rfind("/"), type_iri.rfind("#"))
    return type_iri[: cut + 1] if cut >= 0 else type_iri


class _Frame:
    __slots__ = ("tag", "item", "vocab", "capture", "pending")

    def __init__(self, tag, item, vocab):
        self.tag = tag
        self.item = item  # current item subject term (or None)
        self.vocab = vocab  # property vocabulary in scope
        self.capture = None  # list[str] when collecting a text literal
        self.pending = None  # (subject, [pred terms]) awaiting captured text


def parse_microdata(html: str, base: str = "") -> tuple[list[tuple], dict[str, str]]:
    """html -> (triples, prefixes). Prefix map is always empty (microdata
    has no prefix mechanism); returned for parser-contract parity."""
    triples: list[tuple] = []
    bnode_n = 0

    def new_bnode():
        nonlocal bnode_n
        bnode_n += 1
        return bnode(f"_:m{bnode_n}")

    def resolve_url(ref: str):
        ref = ref.strip()
        if _ABS_IRI_RE.match(ref):
            return iri(ref)
        if base:
            return iri(urljoin(base, ref))
        return iri(ref)

    def prop_iri(name: str, vocab: str):
        name = name.strip()
        if not name:
            return None
        if _ABS_IRI_RE.match(name) and ("/" in name or "#" in name):
            return iri(name)
        if vocab:
            return iri(vocab + name)
        return None

    # itemref work list: (subject, vocab, [element ids]) gathered during the
    # main walk, replayed over the referenced fragments afterwards
    pending_refs: list[tuple] = []

    def walk(chunk: str, root: _Frame, collect_refs: bool) -> None:
        stack = [root]
        pos = 0
        for m in _TAG_RE.finditer(chunk):
            text = chunk[pos : m.start()]
            if text:
                for fr in stack:
                    if fr.capture is not None:
                        fr.capture.append(text)
            pos = m.end()
            closing, tag, rawattrs, selfclose = m.groups()
            tag = tag.lower()
            if closing:
                for idx in range(len(stack) - 1, 0, -1):
                    if stack[idx].tag == tag:
                        while len(stack) > idx:
                            _finish(stack.pop(), triples)
                        break
                continue
            if tag in ("script", "style"):
                end = re.search(rf"</{tag}\s*>", chunk[pos:], re.I)
                if end:
                    pos += end.end()
                continue

            parent = stack[-1]
            attrs = _parse_attrs(rawattrs)
            frame = _Frame(tag, parent.item, parent.vocab)

            is_scope = "itemscope" in attrs
            prop_names = attrs.get("itemprop", "").split()

            subject = None
            vocab = parent.vocab
            if is_scope:
                itemid = attrs.get("itemid", "").strip()
                subject = resolve_url(itemid) if itemid else new_bnode()
                types = [t for t in attrs.get("itemtype", "").split() if _ABS_IRI_RE.match(t)]
                for t in types:
                    triples.append((subject, iri(RDF_TYPE), iri(t)))
                vocab = _vocab_of(types[0]) if types else parent.vocab
                frame.item = subject
                frame.vocab = vocab
                refs = attrs.get("itemref", "").split()
                if refs and collect_refs:
                    pending_refs.append((subject, vocab, refs))

            if prop_names and parent.item is not None:
                preds = [p for p in (prop_iri(n, parent.vocab) for n in prop_names) if p]
                if preds:
                    if is_scope:
                        for p in preds:
                            triples.append((parent.item, p, subject))
                    elif tag in _URL_ATTR:
                        ref = attrs.get(_URL_ATTR[tag], "").strip()
                        if ref:
                            val = resolve_url(ref)
                            for p in preds:
                                triples.append((parent.item, p, val))
                    elif tag == "meta":
                        val = literal(attrs.get("content", ""))
                        for p in preds:
                            triples.append((parent.item, p, val))
                    elif tag == "time" and attrs.get("datetime", "").strip():
                        val = literal(attrs["datetime"].strip())
                        for p in preds:
                            triples.append((parent.item, p, val))
                    elif tag == "data" and attrs.get("value", "").strip():
                        val = literal(attrs["value"].strip())
                        for p in preds:
                            triples.append((parent.item, p, val))
                    else:
                        # text-valued: capture descendant text until close tag
                        frame.capture = []
                        frame.pending = (parent.item, preds)

            if tag in _VOID_TAGS or selfclose:
                _finish(frame, triples)
            else:
                stack.append(frame)

        while len(stack) > 1:
            _finish(stack.pop(), triples)

    walk(html, _Frame("", None, ""), collect_refs=True)

    if pending_refs:
        frags = _id_fragments(html)
        for subject, vocab, refs in pending_refs:
            for rid in refs:
                frag = frags.get(rid)
                if frag is not None:
                    # one-level replay: the fragment's own itemscopes emit
                    # normally, but their itemrefs are NOT chased (loop guard)
                    walk(frag, _Frame("", subject, vocab), collect_refs=False)
    return triples, {}


def _id_fragments(html: str) -> dict[str, str]:
    """id attribute -> the element's outer HTML (open tag through matching
    close; the single tag itself for void/self-closing elements). First id
    wins; elements never explicitly closed extend to their parent's close."""
    frags: dict[str, str] = {}
    open_stack: list[tuple] = []  # (tag, id_or_None, start_offset)
    pos = 0
    for m in _TAG_RE.finditer(html):
        if m.start() < pos:  # inside a skipped script/style body
            continue
        pos = m.end()
        closing, tag, rawattrs, selfclose = m.groups()
        tag = tag.lower()
        if closing:
            for idx in range(len(open_stack) - 1, -1, -1):
                if open_stack[idx][0] == tag:
                    for _t, eid, start in open_stack[idx:]:
                        if eid is not None and eid not in frags:
                            frags[eid] = html[start : m.end()]
                    del open_stack[idx:]
                    break
            continue
        if tag in ("script", "style"):
            end = re.search(rf"</{tag}\s*>", html[pos:], re.I)
            if end:
                pos += end.end()
            continue
        eid = _parse_attrs(rawattrs).get("id", "").strip() or None
        if tag in _VOID_TAGS or selfclose:
            if eid is not None and eid not in frags:
                frags[eid] = html[m.start() : m.end()]
        else:
            open_stack.append((tag, eid, m.start()))
    for _t, eid, start in open_stack:
        if eid is not None and eid not in frags:
            frags[eid] = html[start:]
    return frags


def _finish(frame: _Frame, triples: list) -> None:
    if frame.pending is not None and frame.capture is not None:
        subj, preds = frame.pending
        text = html_unescape("".join(frame.capture)).strip()
        val = literal(text)
        for p in preds:
            triples.append((subj, p, val))
        frame.pending = None
        frame.capture = None
