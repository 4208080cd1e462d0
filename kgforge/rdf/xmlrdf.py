"""Minimal RDF/XML parser via stdlib ElementTree.

Handles the common serialization shapes: rdf:RDF root, rdf:Description and
typed node elements, rdf:about / rdf:nodeID / rdf:ID, property elements with
rdf:resource / rdf:nodeID / rdf:datatype / xml:lang, nested node elements,
rdf:parseType="Resource", and literal text content. Exotic features
(rdf:parseType="Collection"/"Literal", reification, xml:base chains) are out
of scope — the reference corpus is Turtle; RDF/XML support exists for the
format-detection path (detected via '<rdf:RDF',
/root/reference/tests/Characterization/ShaclParserTest.php:197-290).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from .terms import RDF_NS, RDF_TYPE, bnode, iri, literal

_XML_NS = "http://www.w3.org/XML/1998/namespace"


class RdfXmlError(ValueError):
    pass


def _split(tag: str) -> str:
    """'{ns}local' -> 'nslocal' full IRI."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns + local
    return tag


def parse_rdfxml(text: str) -> tuple[list[tuple], dict[str, str]]:
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RdfXmlError(f"invalid XML: {e}") from e

    triples: list[tuple] = []
    counter = [0]

    def new_bnode():
        counter[0] += 1
        return bnode(f"_:x{counter[0]}")

    def node_subject(el):
        about = el.get(f"{{{RDF_NS}}}about")
        if about is not None:
            return iri(about)
        node_id = el.get(f"{{{RDF_NS}}}nodeID")
        if node_id is not None:
            return bnode("_:" + node_id)
        rid = el.get(f"{{{RDF_NS}}}ID")
        if rid is not None:
            return iri("#" + rid)
        return new_bnode()

    def parse_node(el):
        subj = node_subject(el)
        tag_iri = _split(el.tag)
        if tag_iri != RDF_NS + "Description":
            triples.append((subj, iri(RDF_TYPE), iri(tag_iri)))
        for k, v in el.attrib.items():
            kf = _split(k)
            if kf.startswith(RDF_NS) or kf.startswith(_XML_NS):
                continue
            triples.append((subj, iri(kf), literal(v)))
        for prop_el in el:
            parse_property(subj, prop_el)
        return subj

    def parse_property(subj, el):
        pred = iri(_split(el.tag))
        res = el.get(f"{{{RDF_NS}}}resource")
        if res is not None:
            triples.append((subj, pred, iri(res)))
            return
        node_id = el.get(f"{{{RDF_NS}}}nodeID")
        if node_id is not None:
            triples.append((subj, pred, bnode("_:" + node_id)))
            return
        parse_type = el.get(f"{{{RDF_NS}}}parseType")
        children = list(el)
        if parse_type == "Resource":
            inner = new_bnode()
            triples.append((subj, pred, inner))
            for sub in children:
                parse_property(inner, sub)
            return
        if children:
            obj = parse_node(children[0])
            triples.append((subj, pred, obj))
            return
        dt = el.get(f"{{{RDF_NS}}}datatype") or ""
        lang = el.get(f"{{{_XML_NS}}}lang") or ""
        triples.append((subj, pred, literal(el.text or "", dt, lang.lower())))

    root_tag = _split(root.tag)
    prefixes: dict[str, str] = {}
    # best-effort prefix capture from the raw header
    for m in re.finditer(r'xmlns:([A-Za-z_][\w.-]*)="([^"]+)"', text):
        prefixes[m.group(1)] = m.group(2)
    if root_tag == RDF_NS + "RDF":
        for child in root:
            parse_node(child)
    else:
        parse_node(root)
    return triples, prefixes
