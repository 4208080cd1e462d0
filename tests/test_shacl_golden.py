"""Golden-parity tests: expectations transcribed from the reference's
conformance + unit suites (/root/reference/tests/Conformance/
ShaclConformanceTest.php, tests/Unit/Extractors/*.php) and run against OUR
extractor over the reference's own fixture files (read at runtime, read-only).
"""

import glob

import pytest

from kgforge.rdf.detect import parse_rdf
from kgforge.shacl.extractor import (
    determine_property_type,
    extract_cardinality,
    extract_range_from_shape,
    extract_shapes_from_triples,
)

FIX = "/root/reference/tests/Fixtures/W3c"
EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
SH = "http://www.w3.org/ns/shacl#"


def shapes_from(path: str) -> dict:
    with open(path) as fh:
        triples, _, fmt = parse_rdf(fh.read())
    assert fmt == "turtle"
    return extract_shapes_from_triples(triples)


def ps_by_path(shape: dict) -> dict:
    return {ps["path"] if isinstance(ps["path"], str) else ps["path"]["type"]: ps for ps in shape["property_shapes"]}


# --- targets (ShaclConformanceTest.php:20-101) ---


def test_target_class_001():
    shapes = shapes_from(f"{FIX}/targetClass-001.ttl")
    s = shapes[EX + "PersonShape"]
    assert s["uri"] == EX + "PersonShape"
    assert s["target_class"] == EX + "Person"
    assert s["target_classes"] == [EX + "Person"]
    assert s["label"] == "Person Shape"
    assert s["description"] == "A shape targeting the Person class"
    assert len(s["property_shapes"]) == 1
    ps = s["property_shapes"][0]
    assert ps["path"] == EX + "name"
    assert ps["datatype"] == XSD + "string"
    assert ps["minCount"] == "1" and ps["maxCount"] == "1"
    assert s["metadata"]["source"] == "shacl_parser"
    assert SH + "NodeShape" in s["metadata"]["types"]


def test_target_node_001():
    s = shapes_from(f"{FIX}/targetNode-001.ttl")[EX + "AliceShape"]
    assert s["target_node"] == EX + "Alice"
    assert s["target_nodes"] == [EX + "Alice"]
    assert s["label"] == "Alice Shape"


def test_target_subjects_of_001():
    s = shapes_from(f"{FIX}/targetSubjectsOf-001.ttl")[EX + "HasNameShape"]
    assert s["target_subjects_of"] == [EX + "name"]
    assert s["label"] == "Has Name Shape"


def test_target_objects_of_001():
    s = shapes_from(f"{FIX}/targetObjectsOf-001.ttl")[EX + "KnownByShape"]
    assert s["target_objects_of"] == [EX + "knows"]
    assert s["label"] == "Known By Shape"


def test_implicit_target_001():
    s = shapes_from(f"{FIX}/implicitTarget-001.ttl")[EX + "Person"]
    assert EX + "Person" in s["target_classes"]
    assert "http://www.w3.org/2000/01/rdf-schema#Class" in s["metadata"]["types"]
    assert SH + "NodeShape" in s["metadata"]["types"]


# --- core constraints (ShaclConformanceTest.php:110-345) ---


def test_datatype_001():
    s = shapes_from(f"{FIX}/datatype-001.ttl")[EX + "DatatypeShape"]
    assert len(s["property_shapes"]) == 3
    ps = ps_by_path(s)
    assert ps[EX + "name"]["datatype"] == XSD + "string"
    assert ps[EX + "age"]["datatype"] == XSD + "integer"
    assert ps[EX + "birthDate"]["datatype"] == XSD + "date"


def test_class_001():
    ps = ps_by_path(shapes_from(f"{FIX}/class-001.ttl")[EX + "PersonShape"])
    assert ps[EX + "address"]["class"] == EX + "Address"
    assert ps[EX + "knows"]["class"] == EX + "Person"
    assert ps[EX + "address"]["classes"] == [EX + "Address"]


def test_node_kind_001():
    ps = ps_by_path(shapes_from(f"{FIX}/nodeKind-001.ttl")[EX + "ResourceShape"])
    assert ps[EX + "identifier"]["nodeKind"] == SH + "IRI"
    assert ps[EX + "label"]["nodeKind"] == SH + "Literal"
    assert ps[EX + "related"]["nodeKind"] == SH + "BlankNodeOrIRI"


def test_min_max_count_001():
    ps = ps_by_path(shapes_from(f"{FIX}/minCount-maxCount-001.ttl")[EX + "CardinalityShape"])
    assert ps[EX + "name"]["minCount"] == "1" and ps[EX + "name"]["maxCount"] == "1"
    assert ps[EX + "email"]["minCount"] == "0" and ps[EX + "email"]["maxCount"] == "3"
    assert "minCount" not in ps[EX + "nickname"]
    assert ps[EX + "nickname"]["maxCount"] == "5"


def test_string_constraints_001():
    ps = ps_by_path(shapes_from(f"{FIX}/stringConstraints-001.ttl")[EX + "StringShape"])
    assert ps[EX + "name"]["minLength"] == "1"
    assert ps[EX + "name"]["maxLength"] == "100"
    assert "@" in ps[EX + "email"]["pattern"]
    assert ps[EX + "email"]["flags"] == "i"


def test_value_range_001():
    ps = ps_by_path(shapes_from(f"{FIX}/valueRange-001.ttl")[EX + "ValueRangeShape"])
    assert ps[EX + "temperature"]["minInclusive"] == "-273.15"
    assert ps[EX + "temperature"]["maxInclusive"] == "1000"
    assert ps[EX + "score"]["minExclusive"] == "0"
    assert ps[EX + "score"]["maxExclusive"] == "100"


def test_pair_constraints_001():
    ps = ps_by_path(shapes_from(f"{FIX}/pairConstraints-001.ttl")[EX + "PairShape"])
    assert ps[EX + "email"]["equals"] == EX + "primaryEmail"
    assert ps[EX + "nickname"]["disjoint"] == EX + "name"
    assert ps[EX + "startDate"]["lessThan"] == EX + "endDate"
    assert ps[EX + "minAge"]["lessThanOrEquals"] == EX + "maxAge"


def test_has_value_001():
    s = shapes_from(f"{FIX}/hasValue-001.ttl")[EX + "HasValueShape"]
    assert len(s["property_shapes"]) == 1
    assert s["property_shapes"][0]["hasValue"] == "active"


def test_in_001():
    s = shapes_from(f"{FIX}/in-001.ttl")[EX + "InShape"]
    assert s["property_shapes"][0]["in"] == ["Male", "Female", "Other"]


def test_node_001_with_implicit_discovery():
    shapes = shapes_from(f"{FIX}/node-001.ttl")
    assert EX + "PersonShape" in shapes
    assert EX + "AddressShape" in shapes  # discovered via sh:node fixpoint
    assert shapes[EX + "PersonShape"]["property_shapes"][0]["node"] == EX + "AddressShape"


def test_qualified_value_shape_001():
    s = shapes_from(f"{FIX}/qualifiedValueShape-001.ttl")[EX + "QualifiedShape"]
    ps = s["property_shapes"][0]
    assert ps["path"] == EX + "address"
    assert isinstance(ps["qualifiedValueShape"], str)  # blank-node id
    assert ps["qualifiedMinCount"] == "1"
    assert ps["qualifiedMaxCount"] == "2"


# --- logical constraints (ShaclConformanceTest.php:352-414) ---


def test_logical_not_001():
    ps = shapes_from(f"{FIX}/logical-not-001.ttl")[EX + "NotStringShape"]["property_shapes"][0]
    assert ps["sh_not"]["datatype"] == XSD + "string"


def test_logical_and_001():
    ps = shapes_from(f"{FIX}/logical-and-001.ttl")[EX + "AndShape"]["property_shapes"][0]
    assert len(ps["sh_and"]) == 2
    assert ps["sh_and"][0]["datatype"] == XSD + "string"
    assert ps["sh_and"][1]["minLength"] == "1"


def test_logical_or_001():
    ps = shapes_from(f"{FIX}/logical-or-001.ttl")[EX + "OrShape"]["property_shapes"][0]
    assert len(ps["sh_or"]) == 2
    assert ps["sh_or"][0]["datatype"] == XSD + "date"
    assert ps["sh_or"][1]["datatype"] == XSD + "dateTime"


def test_logical_xone_001():
    ps = shapes_from(f"{FIX}/logical-xone-001.ttl")[EX + "XoneShape"]["property_shapes"][0]
    assert len(ps["sh_xone"]) == 2
    assert ps["sh_xone"][0]["datatype"] == XSD + "string"
    assert ps["sh_xone"][1]["datatype"] == XSD + "integer"


# --- shape recognition (ShaclConformanceTest.php:422-530) ---


def test_node_shape_explicit_001():
    s = shapes_from(f"{FIX}/nodeShape-explicit-001.ttl")[EX + "ExplicitShape"]
    assert s["label"] == "Explicit Node Shape"
    assert s["description"] == "A shape with explicit sh:NodeShape type"
    assert s["target_class"] == EX + "Thing"


def test_node_shape_by_target_001():
    s = shapes_from(f"{FIX}/nodeShape-byTarget-001.ttl")[EX + "ImpliedByTarget"]
    assert s["target_class"] == EX + "Animal"
    assert s["label"] == "Implied by target"


def test_node_shape_by_constraint_001():
    s = shapes_from(f"{FIX}/nodeShape-byConstraint-001.ttl")[EX + "ImpliedByConstraint"]
    assert len(s["property_shapes"]) == 1
    assert s["severity"] == "violation"
    assert s["severity_iri"] is None


def test_node_shape_with_property_shapes_001():
    ps = ps_by_path(shapes_from(f"{FIX}/nodeShape-withPropertyShapes-001.ttl")[EX + "FullShape"])
    fn = ps[EX + "firstName"]
    assert fn["name"] == "first name"
    assert fn["description"] == "The given name"
    assert fn["datatype"] == XSD + "string"
    assert (fn["minCount"], fn["maxCount"], fn["minLength"], fn["maxLength"]) == ("1", "1", "1", "50")
    age = ps[EX + "age"]
    assert age["name"] == "age"
    assert age["datatype"] == XSD + "integer"
    assert age["minInclusive"] == "0" and age["maxInclusive"] == "150"


def test_node_shape_deactivated_001():
    s = shapes_from(f"{FIX}/nodeShape-deactivated-001.ttl")[EX + "DeactivatedShape"]
    assert s["deactivated"] is True
    assert s["label"] == "Deactivated Shape"


def test_node_shape_severity_001():
    shapes = shapes_from(f"{FIX}/nodeShape-severity-001.ttl")
    assert shapes[EX + "ViolationShape"]["severity"] == "violation"
    assert shapes[EX + "ViolationShape"]["severity_iri"] == SH + "Violation"
    assert shapes[EX + "WarningShape"]["severity"] == "warning"
    assert shapes[EX + "WarningShape"]["severity_iri"] == SH + "Warning"
    assert shapes[EX + "InfoShape"]["severity"] == "info"
    assert shapes[EX + "InfoShape"]["severity_iri"] == SH + "Info"


def test_closed_001():
    s = shapes_from(f"{FIX}/closed-001.ttl")[EX + "ClosedShape"]
    assert s["target_class"] == EX + "Person"
    assert s["constraints"]["closed"] is True
    assert s["property_shapes"][0]["path"] == EX + "name"


# --- paths (fixtures path-*.ttl; union type per ShaclPropertyAnalyzer.php:326-437) ---


def test_path_predicate_001():
    shapes = shapes_from(f"{FIX}/path-predicate-001.ttl")
    s = next(iter(shapes.values()))
    assert isinstance(s["property_shapes"][0]["path"], str)


@pytest.mark.parametrize(
    "fixture,ptype",
    [
        ("path-inverse-001", "inverse"),
        ("path-alternative-001", "alternative"),
        ("path-sequence-001", "sequence"),
        ("path-zeroOrMore-001", "zeroOrMore"),
        ("path-oneOrMore-001", "oneOrMore"),
        ("path-zeroOrOne-001", "zeroOrOne"),
    ],
)
def test_complex_paths(fixture, ptype):
    shapes = shapes_from(f"{FIX}/{fixture}.ttl")
    found = [
        ps["path"]
        for s in shapes.values()
        for ps in s["property_shapes"]
        if isinstance(ps["path"], dict) and ps["path"]["type"] == ptype
    ]
    assert found, f"no {ptype} path extracted from {fixture}"
    p = found[0]
    if ptype in ("alternative", "sequence"):
        assert len(p["paths"]) >= 2
    else:
        assert p["path"]


def test_nested_path_composition():
    # inline case from ShaclPropertyAnalyzerTest.php:197-235
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:property [ sh:path [ sh:zeroOrMorePath [ sh:inversePath ex:parent ] ] ] ."""
    triples, _, _ = parse_rdf(ttl)
    ps = extract_shapes_from_triples(triples)[EX + "S"]["property_shapes"][0]
    assert ps["path"] == {"type": "zeroOrMore", "path": {"type": "inverse", "path": EX + "parent"}}


# --- stringly-typed coercions (ShaclPropertyAnalyzerTest.php:289-556) ---


def test_unique_lang_true_becomes_string_1():
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ;
    sh:property [ sh:path ex:name ; sh:uniqueLang true ] ."""
    triples, _, _ = parse_rdf(ttl)
    ps = extract_shapes_from_triples(triples)[EX + "PersonShape"]["property_shapes"][0]
    assert ps["uniqueLang"] == "1"


def test_order_and_deactivated_stringly():
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
    sh:property [ sh:path ex:a ; sh:order 1 ; sh:deactivated true ;
                  sh:qualifiedValueShapesDisjoint true ; sh:minInclusive 0 ] ."""
    triples, _, _ = parse_rdf(ttl)
    ps = extract_shapes_from_triples(triples)[EX + "S"]["property_shapes"][0]
    assert ps["order"] == "1"
    assert ps["deactivated"] == "1"
    assert ps["qualifiedValueShapesDisjoint"] == "1"
    assert ps["minInclusive"] == "0"


def test_language_in_and_nil():
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
    sh:property [ sh:path ex:name ; sh:languageIn ( "en" "nl" "de" ) ] ;
    sh:property [ sh:path ex:other ; sh:in () ] ."""
    triples, _, _ = parse_rdf(ttl)
    pss = extract_shapes_from_triples(triples)[EX + "S"]["property_shapes"]
    by_path = {ps["path"]: ps for ps in pss}
    assert by_path[EX + "name"]["languageIn"] == ["en", "nl", "de"]
    assert "in" not in by_path[EX + "other"]  # rdf:nil -> key omitted


def test_multilingual_first_wins_and_en_preference():
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; rdfs:label "Persoon"@nl, "Person"@en, "Zweite"@nl ."""
    triples, _, _ = parse_rdf(ttl)
    s = extract_shapes_from_triples(triples)[EX + "S"]
    assert s["labels"] == {"nl": "Persoon", "en": "Person"}
    assert s["label"] == "Person"


def test_implicit_shape_fixpoint_chain():
    # transcribed from ShaclShapeProcessorTest.php:918-1049 behavior
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:A a sh:NodeShape ; sh:property [ sh:path ex:p ; sh:node ex:B ] .
ex:B sh:property [ sh:path ex:q ; sh:node ex:C ] .
ex:C sh:targetClass ex:T ."""
    triples, _, _ = parse_rdf(ttl)
    shapes = extract_shapes_from_triples(triples)
    assert set(shapes) >= {EX + "A", EX + "B", EX + "C"}


def test_sparql_constraints():
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:sparql [
    sh:select "SELECT $this WHERE { $this ex:p ?v }" ;
    sh:message "bad"@en ; sh:message "slecht"@nl ;
    sh:prefixes [ sh:declare [ sh:prefix "ex" ; sh:namespace "http://example.org/"^^<http://www.w3.org/2001/XMLSchema#anyURI> ] ]
  ] ."""
    triples, _, _ = parse_rdf(ttl)
    s = extract_shapes_from_triples(triples)[EX + "S"]
    assert len(s["sparql_constraints"]) == 1
    c = s["sparql_constraints"][0]
    assert c["select"].startswith("SELECT $this")
    assert c["messages"] == {"en": "bad", "nl": "slecht"}
    assert c["deactivated"] is False
    assert c["prefixes"] == {"ex": EX}


def test_node_level_logical_constraints():
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:and ( ex:A ex:B ) ; sh:not ex:N ;
  sh:closed true ; sh:ignoredProperties ( ex:ig1 ex:ig2 ) ."""
    triples, _, _ = parse_rdf(ttl)
    c = extract_shapes_from_triples(triples)[EX + "S"]["constraints"]
    assert c["and"] == [EX + "A", EX + "B"]
    assert c["not"] == EX + "N"
    assert c["closed"] is True
    assert c["ignoredProperties"] == [EX + "ig1", EX + "ig2"]


# --- derived APIs F1-F3 (ShaclPropertyAnalyzerTest.php:909-1104) ---


def test_extract_range():
    assert extract_range_from_shape({"datatype": "d", "class": "c"}) == ["d", "c"]
    assert extract_range_from_shape(
        {"sh_or": [{"class": "c1"}, {"datatype": "d1"}], "sh_not": {"class": "c1"}}
    ) == ["c1", "d1"]
    assert extract_range_from_shape({}) == []


def test_determine_property_type_precedence():
    assert determine_property_type({"class": "x"}) == "object"
    assert determine_property_type({"node": "x"}) == "object"
    assert determine_property_type({"nodeKind": SH + "IRI"}) == "object"
    assert determine_property_type({"nodeKind": SH + "Literal"}) == "datatype"
    # explicit datatype beats logical object hints (ShaclPropertyAnalyzerTest.php:1038-1047)
    assert determine_property_type({"datatype": "d", "sh_or": [{"class": "c"}]}) == "datatype"
    assert determine_property_type({"sh_or": [{"class": "c"}]}) == "object"
    assert determine_property_type({"sh_not": {"nodeKind": SH + "BlankNode"}}) == "object"
    assert determine_property_type({}) == "datatype"


def test_extract_cardinality():
    assert extract_cardinality({"minCount": "1", "maxCount": "1"}) == "1"
    assert extract_cardinality({"minCount": "1", "maxCount": "3"}) == "1..3"
    assert extract_cardinality({"minCount": "1"}) == "1..n"
    assert extract_cardinality({"maxCount": "1"}) == "0..1"
    assert extract_cardinality({}) is None


# --- application profiles (ShaclApplicationProfileTest.php highlights) ---


def test_dcat_ap_profile():
    # expectations from ShaclApplicationProfileTest.php:33-93
    shapes = shapes_from("/root/reference/tests/Fixtures/Shacl/DcatAp/dcat-ap_2.1.1.ttl")
    assert len(shapes) >= 5
    catalog = shapes["http://www.w3.org/ns/dcat#Catalog"]
    assert len(catalog["property_shapes"]) >= 10
    assert "http://www.w3.org/ns/dcat#Dataset" in shapes
    assert "http://www.w3.org/ns/dcat#Distribution" in shapes
    assert "http://data.europa.eu/r5r#DateOrDateTimeDataType" in shapes
    class_constrained = [
        ps
        for s in shapes.values()
        for ps in s["property_shapes"]
        if "class" in ps
    ]
    assert len(class_constrained) >= 3


def test_all_fixture_files_extract_shapes():
    for f in sorted(glob.glob("/root/reference/tests/Fixtures/**/*.ttl", recursive=True)):
        shapes = shapes_from(f)
        assert isinstance(shapes, dict)
        assert shapes, f"no shapes from {f}"


def _prefixes_from(path: str) -> dict:
    with open(path) as fh:
        _triples, prefixes, _fmt = parse_rdf(fh.read())
    return prefixes


def test_dcat_ap_profile_values():
    """Content assertions from ShaclApplicationProfileTest.php:20-103 beyond
    the shape-count smoke above: label, per-shape class constraints, and the
    extracted prefix map."""
    path = "/root/reference/tests/Fixtures/Shacl/DcatAp/dcat-ap_2.1.1.ttl"
    shapes = shapes_from(path)
    date_shape = shapes["http://data.europa.eu/r5r#DateOrDateTimeDataType"]
    assert date_shape["label"] == "Date time date disjunction"
    catalog = shapes["http://www.w3.org/ns/dcat#Catalog"]
    assert catalog["uri"] == "http://www.w3.org/ns/dcat#Catalog"
    catalog_class_ps = [ps for ps in catalog["property_shapes"] if ps.get("class")]
    assert len(catalog_class_ps) >= 3  # hasPart, isPartOf, license, ...
    prefixes = _prefixes_from(path)
    for p in ("sh", "dcat", "dct"):
        assert p in prefixes, p


def test_adms_ap_profile():
    """ShaclApplicationProfileTest.php:113-172 (ADMS-AP 2.0.0)."""
    shapes = shapes_from("/root/reference/tests/Fixtures/Shacl/AdmsAp/adms-ap_2.0.0.ttl")
    assert len(shapes) >= 3
    asset = shapes["http://www.w3.org/ns/adms#Asset"]
    assert asset["target_class"] == "http://www.w3.org/ns/adms#Asset"
    assert asset["label"] == "Asset Shape"
    assert len(asset["property_shapes"]) >= 5
    dist = shapes["http://www.w3.org/ns/adms#AssetDistribution"]
    assert dist["target_class"] == "http://www.w3.org/ns/adms#AssetDistribution"
    assert dist["property_shapes"]
    issued = next(
        (ps for ps in asset["property_shapes"]
         if ps.get("path") == "http://purl.org/dc/terms/issued"),
        None,
    )
    assert issued is not None
    assert len(issued["sh_or"]) == 2


def test_nlsbb_skos_ap_profile():
    """ShaclApplicationProfileTest.php:182-228 (NL-SBB SKOS-AP-NL)."""
    shapes = shapes_from("/root/reference/tests/Fixtures/Shacl/NlSbb/skos-ap-nl.ttl")
    assert len(shapes) == 5
    concept = shapes["http://nlbegrip.nl/def/skosapnl#Concept"]
    assert concept["target_class"] == "http://www.w3.org/2004/02/skos/core#Concept"
    assert concept["label"] == "Begrip"
    assert concept["labels"]["nl"] == "Begrip"
    srcdoc = shapes["http://nlbegrip.nl/def/skosapnl#SourceDocument"]
    assert srcdoc["target_objects_of"] == ["http://purl.org/dc/terms/source"]
    assert srcdoc["label"] == "Brondocument"


def test_topbraid_person_profile():
    """ShaclApplicationProfileTest.php:238-383 (TopBraid person example):
    named property shapes surface as top-level shapes AND expand inline,
    per-property-shape severities, sh:or/in/pattern/flags values."""
    shapes = shapes_from("/root/reference/tests/Fixtures/Shacl/TopBraid/person.ttl")
    for uri in ("PersonShape", "AddressShape", "EmployeeShape", "PersonShape-firstName"):
        assert f"http://example.org/ns#{uri}" in shapes, uri

    person = shapes["http://example.org/ns#PersonShape"]
    assert person["target_class"] == "http://example.org/ns#Person"
    assert person["label"] == "Person Shape"
    assert person["property_shapes"]

    address = shapes["http://example.org/ns#AddressShape"]
    assert address["target_class"] == "http://example.org/ns#Address"
    assert len(address["property_shapes"]) >= 4

    employee = shapes["http://example.org/ns#EmployeeShape"]
    assert employee["target_class"] == "http://example.org/ns#Employee"
    assert employee["label"] == "Employee Shape"
    assert employee["property_shapes"]

    by_path = {ps.get("path"): ps for ps in person["property_shapes"]}
    birth = by_path["http://example.org/ns#birthDate"]
    assert len(birth["sh_or"]) == 2
    gender = by_path["http://example.org/ns#gender"]
    assert "Male" in gender["in"] and "Female" in gender["in"]
    email = by_path["http://example.org/ns#email"]
    assert "@" in email["pattern"]
    assert email["flags"] == "i"

    age_shape = shapes["http://example.org/ns#PersonShape-age"]
    assert age_shape["severity"] == "warning"
    assert age_shape["severity_iri"] == "http://www.w3.org/ns/shacl#Warning"
    fn_shape = shapes["http://example.org/ns#PersonShape-firstName"]
    assert fn_shape["severity"] == "violation"
    assert fn_shape["severity_iri"] == "http://www.w3.org/ns/shacl#Violation"
    addr_shape = shapes["http://example.org/ns#PersonShape-address"]
    assert addr_shape["severity"] == "info"
    assert addr_shape["severity_iri"] == "http://www.w3.org/ns/shacl#Info"
