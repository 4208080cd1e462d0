"""HTML microdata extraction (itemscope/itemprop/itemtype/itemid) — unit
tests for the W3C "Microdata to RDF" core mapping in
kgforge/rdf/microdata.py, plus payload-detection wiring through
kgforge.html.find_rdf_payloads and kgforge.rdf.detect.parse_rdf.

The reference parses RDF content strings only
(/root/reference/src/ShaclParser.php:34-43); microdata is part of this
engine's web-page generalization (BASELINE.json north_star: embedded
structured data on Common-Crawl-style pages).
"""

from kgforge.html import find_rdf_payloads
from kgforge.rdf.detect import parse_rdf
from kgforge.rdf.microdata import parse_microdata
from kgforge.rdf.terms import RDF_TYPE

SCHEMA = "http://schema.org/"


def triples(html, base=""):
    ts, prefixes = parse_microdata(html, base)
    assert prefixes == {}
    return ts


def spo(ts):
    return [(s[0], p[0], o[0]) for s, p, o in ts]


def test_itemid_subject_type_and_text_property():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Person" itemid="http://ex.org/p1">'
        '<span itemprop="name">Alice</span></div>'
    )
    assert spo(ts) == [
        ("http://ex.org/p1", RDF_TYPE, SCHEMA + "Person"),
        ("http://ex.org/p1", SCHEMA + "name", "Alice"),
    ]
    # object term kinds: type object is an IRI, name object is a literal
    assert ts[0][2][1] == "iri" and ts[1][2][1] == "literal"


def test_bnode_subject_when_no_itemid():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Thing">'
        '<b itemprop="name">X</b></div>'
    )
    subj = ts[0][0]
    assert subj == ("_:m1", "bnode", "", "")
    assert spo(ts)[1] == ("_:m1", SCHEMA + "name", "X")


def test_text_value_includes_descendants_and_decodes_entities():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Thing">'
        '<span itemprop="name"> A &amp; <b>B</b> C </span></div>'
    )
    assert spo(ts)[1][2] == "A & B C"


def test_url_elements_resolve_against_base():
    html = (
        '<div itemscope itemtype="http://schema.org/Thing">'
        '<a itemprop="url" href="/x">x</a>'
        '<img itemprop="image" src="i.png">'
        '<object itemprop="o" data="d.bin"></object></div>'
    )
    vals = {p[0]: (o[0], o[1]) for _, p, o in triples(html, base="http://ex.org/dir/page")}
    assert vals[SCHEMA + "url"] == ("http://ex.org/x", "iri")
    assert vals[SCHEMA + "image"] == ("http://ex.org/dir/i.png", "iri")
    assert vals[SCHEMA + "o"] == ("http://ex.org/dir/d.bin", "iri")
    # without base the relative ref passes through untouched
    assert spo(triples(html))[1][2] == "/x"


def test_url_element_with_missing_attr_emits_nothing():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Thing">'
        '<a itemprop="url">no href</a></div>'
    )
    assert [p for _, p, _ in spo(ts)] == [RDF_TYPE]


def test_meta_time_data_value_attributes():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Thing">'
        '<meta itemprop="sku" content="S-1">'
        '<time itemprop="born" datetime="1990-01-02">Jan 2</time>'
        '<time itemprop="seen">yesterday</time>'
        '<data itemprop="n" value="42">forty-two</data></div>'
    )
    vals = {p: o for _, p, o in spo(ts)}
    assert vals[SCHEMA + "sku"] == "S-1"
    assert vals[SCHEMA + "born"] == "1990-01-02"
    assert vals[SCHEMA + "seen"] == "yesterday"  # no datetime -> text
    assert vals[SCHEMA + "n"] == "42"


def test_nested_item_links_parent_to_child():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Person" itemid="http://ex.org/p">'
        '<div itemprop="address" itemscope itemtype="http://schema.org/PostalAddress">'
        '<span itemprop="addressLocality">Springfield</span></div></div>'
    )
    rows = spo(ts)
    assert ("http://ex.org/p", SCHEMA + "address", "_:m1") in rows
    assert ("_:m1", RDF_TYPE, SCHEMA + "PostalAddress") in rows
    assert ("_:m1", SCHEMA + "addressLocality", "Springfield") in rows


def test_multiple_itemprops_and_itemtypes():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Book http://schema.org/CreativeWork" '
        'itemid="http://ex.org/b">'
        '<span itemprop="name alternateName">T</span></div>'
    )
    rows = spo(ts)
    assert ("http://ex.org/b", RDF_TYPE, SCHEMA + "Book") in rows
    assert ("http://ex.org/b", RDF_TYPE, SCHEMA + "CreativeWork") in rows
    assert ("http://ex.org/b", SCHEMA + "name", "T") in rows
    assert ("http://ex.org/b", SCHEMA + "alternateName", "T") in rows


def test_vocabulary_from_hash_type_and_absolute_itemprop():
    ts = triples(
        '<div itemscope itemtype="http://ex.org/vocab#Widget" itemid="http://ex.org/w">'
        '<span itemprop="size">L</span>'
        '<span itemprop="http://purl.org/dc/terms/title">D</span></div>'
    )
    rows = spo(ts)
    assert ("http://ex.org/w", "http://ex.org/vocab#size", "L") in rows
    assert ("http://ex.org/w", "http://purl.org/dc/terms/title", "D") in rows


def test_itemprop_without_vocabulary_is_skipped():
    ts = triples('<p itemscope><span itemprop="x">no vocab</span></p>')
    assert ts == []


def test_itemprop_outside_any_item_is_ignored():
    assert triples('<span itemprop="name">loose</span>') == []


def test_script_and_style_text_not_captured():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Thing">'
        '<span itemprop="name">A<script>var x="EVIL";</script><style>p{}</style>B</span>'
        "</div>"
    )
    assert spo(ts)[1][2] == "AB"


def test_self_closing_and_void_tags_inside_capture():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Thing">'
        '<span itemprop="name">A<br>B<hr/>C</span></div>'
    )
    assert spo(ts)[1][2] == "ABC"


def test_sibling_items_get_distinct_bnodes():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Thing"><i itemprop="name">a</i></div>'
        '<div itemscope itemtype="http://schema.org/Thing"><i itemprop="name">b</i></div>'
    )
    names = {s: o for s, p, o in spo(ts) if p == SCHEMA + "name"}
    assert names == {"_:m1": "a", "_:m2": "b"}


def test_invalid_itemtype_token_ignored_keeps_parent_vocab():
    # a relative itemtype is not an absolute IRI: no rdf:type, no new vocab
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Person" itemid="http://ex.org/p">'
        '<div itemprop="knows" itemscope itemtype="Person2">'
        '<span itemprop="name">B</span></div></div>'
    )
    rows = spo(ts)
    assert ("http://ex.org/p", SCHEMA + "knows", "_:m1") in rows
    # nested item inherits schema.org vocabulary from the parent scope
    assert ("_:m1", SCHEMA + "name", "B") in rows
    assert all(o != "Person2" for _, _, o in rows)


def test_find_rdf_payloads_flags_microdata():
    html = '<html><body><div itemscope itemtype="http://schema.org/Thing"></div></body></html>'
    payloads = find_rdf_payloads(html)
    assert [fmt for fmt, _ in payloads] == ["microdata"]
    ts, _prefixes, fmt = parse_rdf(payloads[0][1], payloads[0][0])
    assert fmt == "microdata"
    assert spo(ts) == [("_:m1", RDF_TYPE, SCHEMA + "Thing")]


def test_jsonld_script_body_not_double_scanned_for_microdata():
    # 'itemscope' inside a script payload must not trigger the microdata path
    html = (
        '<html><body><script type="application/ld+json">'
        '{"@id": "http://ex.org/x", "http://ex.org/p": "itemscope"}'
        "</script></body></html>"
    )
    assert [fmt for fmt, _ in find_rdf_payloads(html)] == ["json-ld"]


def test_itemref_grafts_external_properties():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Person" '
        'itemid="http://ex.org/p" itemref="extra meta1"></div>'
        '<p id="extra"><span itemprop="jobTitle">Engineer</span></p>'
        '<meta id="meta1" itemprop="age" content="30">'
    )
    rows = spo(ts)
    assert ("http://ex.org/p", SCHEMA + "jobTitle", "Engineer") in rows
    assert ("http://ex.org/p", SCHEMA + "age", "30") in rows


def test_itemref_root_element_itself_carries_itemprop():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Person" '
        'itemid="http://ex.org/p" itemref="n"></div>'
        '<span id="n" itemprop="name">Ada</span>'
    )
    assert ("http://ex.org/p", SCHEMA + "name", "Ada") in spo(ts)


def test_itemref_shared_by_two_items():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Person" itemid="http://ex.org/a" itemref="n"></div>'
        '<div itemscope itemtype="http://schema.org/Person" itemid="http://ex.org/b" itemref="n"></div>'
        '<meta id="n" itemprop="memberOf" content="Team">'
    )
    rows = spo(ts)
    assert ("http://ex.org/a", SCHEMA + "memberOf", "Team") in rows
    assert ("http://ex.org/b", SCHEMA + "memberOf", "Team") in rows


def test_itemref_missing_id_and_nested_itemref_not_chased():
    ts = triples(
        '<div itemscope itemtype="http://schema.org/Person" '
        'itemid="http://ex.org/p" itemref="ghost frag"></div>'
        '<div id="frag">'
        '<div itemprop="knows" itemscope itemtype="http://schema.org/Person" itemref="frag2">'
        '<span itemprop="name">B</span></div></div>'
        '<meta id="frag2" itemprop="age" content="9">'
    )
    rows = spo(ts)
    # the fragment's itemscope is an item of the document in its own right
    # (_:m1, parsed by the main walk, linked to nothing) AND is replayed as
    # the referring item's property value (_:m2)
    assert ("http://ex.org/p", SCHEMA + "knows", "_:m2") in rows
    assert ("_:m2", SCHEMA + "name", "B") in rows
    assert ("_:m1", SCHEMA + "name", "B") in rows
    # ...but its own itemref is NOT chased (one-level loop guard): the
    # main-walk item grafts frag2's property, the replayed copy does not
    assert ("_:m1", SCHEMA + "age", "9") in rows
    assert ("_:m2", SCHEMA + "age", "9") not in rows


def test_itemref_vocab_inherited_from_referring_item():
    ts = triples(
        '<div itemscope itemtype="http://ex.org/v#Widget" '
        'itemid="http://ex.org/w" itemref="sz"></div>'
        '<span id="sz" itemprop="size">L</span>'
    )
    assert ("http://ex.org/w", "http://ex.org/v#size", "L") in spo(ts)
