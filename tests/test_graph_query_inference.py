"""Triangle counting, k-hop BFS, SPARQL SELECT, and RDFS inference —
hand-computable golden cases independent of the fixture corpus."""

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


# ------------------------------------------------------------- triangles


def test_triangle_counts_golden(spark):
    from kgforge.operators.graph import triangle_counts

    # K4 on {a,b,c,d} (4 triangles, each node in 3) plus a pendant edge d-e
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
    ]
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_counts_dedup_and_orientation(spark):
    from kgforge.operators.graph import triangle_counts

    # duplicate + reversed edges and a self-loop must not change the count
    pairs = [
        ("a", "b"), ("b", "a"), ("a", "b"),
        ("b", "c"), ("a", "c"), ("c", "c"),
    ]
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_counts_hub(spark):
    from kgforge.operators.graph import triangle_counts

    # star hub (no triangles among leaves) + one closing edge -> exactly 1
    pairs = [("hub", f"n{i}") for i in range(20)] + [("n0", "n1")]
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got == {"hub": 1, "n0": 1, "n1": 1}


# ------------------------------------------------------------------ k-hop


def test_k_hop_path_graph(spark):
    from kgforge.operators.graph import k_hop

    # path a-b-c-d-e, seed a, 3 hops; min-dist must win over longer routes
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c")]
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["hops"] for r in k_hop(_edges(spark, pairs), seeds, max_hops=3).collect()}
    # a-c is a direct edge, so c is 1 hop (not 2 via b); e is 3 via c-d
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_k_hop_multi_seed_and_isolated(spark):
    from kgforge.operators.graph import k_hop

    pairs = [("a", "b"), ("c", "d")]
    seeds = spark.createDataFrame([("a",), ("z",)], "node string")
    got = {r["node"]: r["hops"] for r in k_hop(_edges(spark, pairs), seeds, max_hops=2).collect()}
    # z isn't in the graph: stays at hop 0; c/d unreachable: absent
    assert got == {"a": 0, "z": 0, "b": 1}


# --------------------------------------------------------- sparql_select


def _triples_df(spark, rows):
    data = [
        (s, p, {"value": o, "kind": k, "datatype": "", "lang": ""})
        for (s, p, o, k) in rows
    ]
    return spark.createDataFrame(
        data,
        "subject string, predicate string, "
        "object struct<value:string,kind:string,datatype:string,lang:string>",
    ).select(
        F.lit("u://x").alias("url"), "subject", "predicate", "object",
        F.lit("ok").alias("status"),
    )


KNOWS, AGE, NAME = "ex:knows", "ex:age", "ex:name"


def test_sparql_select_join_and_filter(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p1", AGE, "45", "literal"),
        ("p2", KNOWS, "p3", "iri"),
        ("p2", AGE, "30", "literal"),
        ("p3", AGE, "unknown", "literal"),
        ("p3", KNOWS, "p1", "iri"),
    ])
    q = f"""SELECT DISTINCT ?s ?o ?age WHERE {{
        ?s <{KNOWS}> ?o . ?s <{AGE}> ?age . FILTER (?age >= 40)
    }}"""
    got = [tuple(r) for r in sparql_select(t, q).orderBy("s").collect()]
    assert got == [("p1", "p2", "45")]  # p2 under 40; p3 non-numeric age


def test_sparql_select_var_chain(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p2", KNOWS, "p3", "iri"),
        ("p3", NAME, "Cyn", "literal"),
    ])
    # friend-of-friend name: two hops through ?m
    q = f"""SELECT ?s ?name WHERE {{
        ?s <{KNOWS}> ?m . ?m <{KNOWS}> ?e . ?e <{NAME}> ?name .
    }}"""
    got = [tuple(r) for r in sparql_select(t, q).collect()]
    assert got == [("p1", "Cyn")]


def test_sparql_select_constant_anchor_and_distinct(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p1", KNOWS, "p2", "iri"),  # duplicate assertion (two pages)
        ("p1", NAME, "Ann", "literal"),
    ])
    q = f"SELECT DISTINCT ?o WHERE {{ <p1> <{KNOWS}> ?o . }}"
    assert [r["o"] for r in sparql_select(t, q).collect()] == ["p2"]


def test_sparql_select_rejects_cartesian_and_unbound(spark):
    from kgforge.operators.sparql import SparqlUnsupported, sparql_select

    t = _triples_df(spark, [("p1", KNOWS, "p2", "iri")])
    with pytest.raises(SparqlUnsupported):
        sparql_select(t, f"SELECT ?a ?c WHERE {{ ?a <{KNOWS}> ?b . ?c <{NAME}> ?d . }}").collect()
    with pytest.raises(SparqlUnsupported):
        sparql_select(t, f"SELECT ?zzz WHERE {{ ?a <{KNOWS}> ?b . }}")


def test_sparql_select_prefixes_and_contains(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", "http://ex.org/name", "Ann Smith", "literal"),
        ("p2", "http://ex.org/name", "Bob", "literal"),
    ])
    q = """SELECT ?s WHERE { ?s ex:name ?n . FILTER (CONTAINS(?n, "Smith")) }"""
    got = sparql_select(t, q, prefixes={"ex": "http://ex.org/"}).collect()
    assert [r["s"] for r in got] == ["p1"]


# ------------------------------------- UNION / VALUES / ORDER-LIMIT / CONSTRUCT


def test_sparql_union_pads_unbound_vars(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("a", KNOWS, "b", "iri"),
        ("a", NAME, "Ann", "literal"),
        ("c", NAME, "Cyn", "literal"),
    ])
    # W3C §7: branch solutions need not bind the same variables — ?n is
    # NULL for knows-branch rows, ?y NULL (dropped) for name-branch rows
    q = f"""SELECT DISTINCT ?x ?n WHERE {{
        {{ ?x <{KNOWS}> ?y }} UNION {{ ?x <{NAME}> ?n }}
    }}"""
    got = {(r["x"], r["n"]) for r in sparql_select(t, q).collect()}
    assert got == {("a", None), ("a", "Ann"), ("c", "Cyn")}


def test_sparql_union_with_branch_filters_and_agg(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("a", KNOWS, "b", "iri"),
        ("b", KNOWS, "c", "iri"),
        ("a", AGE, "45", "literal"),
        ("b", AGE, "17", "literal"),
    ])
    # incoming-or-outgoing degree of each node, via a symmetric UNION
    q = f"""SELECT ?x (COUNT(?e) AS ?deg) WHERE {{
        {{ ?x <{KNOWS}> ?e }} UNION {{ ?e <{KNOWS}> ?x }}
    }} GROUP BY ?x"""
    got = {(r["x"], r["deg"]) for r in sparql_select(t, q).collect()}
    assert got == {("a", 1), ("b", 2), ("c", 1)}


def test_sparql_values_restricts_bound_var(spark):
    from kgforge.operators.sparql import SparqlUnsupported, sparql_select

    t = _triples_df(spark, [
        ("a", AGE, "45", "literal"),
        ("b", AGE, "17", "literal"),
        ("c", AGE, "30", "literal"),
    ])
    q = f"""SELECT ?x ?age WHERE {{ ?x <{AGE}> ?age . VALUES ?x {{ <a> <c> }} }}"""
    got = {tuple(r) for r in sparql_select(t, q).collect()}
    assert got == {("a", "45"), ("c", "30")}
    with pytest.raises(SparqlUnsupported):
        sparql_select(t, f"SELECT ?x WHERE {{ ?x <{AGE}> ?a . VALUES ?z {{ <a> }} }}")


def test_sparql_order_by_limit(spark):
    from kgforge.operators.sparql import SparqlUnsupported, sparql_select

    t = _triples_df(spark, [
        ("a", NAME, "Ann", "literal"),
        ("b", NAME, "Bob", "literal"),
        ("c", NAME, "Cyn", "literal"),
    ])
    q = f"SELECT ?x ?n WHERE {{ ?x <{NAME}> ?n }} ORDER BY DESC(?n) LIMIT 2"
    assert [r["n"] for r in sparql_select(t, q).collect()] == ["Cyn", "Bob"]
    q2 = f"SELECT ?x ?n WHERE {{ ?x <{NAME}> ?n }} ORDER BY ?x LIMIT 1"
    assert [tuple(r) for r in sparql_select(t, q2).collect()] == [("a", "Ann")]
    with pytest.raises(SparqlUnsupported):
        sparql_select(t, f"SELECT ?x WHERE {{ ?x <{NAME}> ?n }} ORDER BY ?n")


def test_sparql_construct_symmetric_closure(spark):
    from kgforge.operators.sparql import sparql_construct

    t = _triples_df(spark, [
        ("a", KNOWS, "b", "iri"),
        ("b", KNOWS, "a", "iri"),  # already symmetric: set semantics dedup
        ("b", KNOWS, "c", "iri"),
    ])
    q = f"""CONSTRUCT {{ ?s <{KNOWS}> ?o . ?o <{KNOWS}> ?s }}
            WHERE {{ ?s <{KNOWS}> ?o }}"""
    got = {tuple(r) for r in sparql_construct(t, q).collect()}
    assert got == {
        ("a", KNOWS, "b"), ("b", KNOWS, "a"),
        ("b", KNOWS, "c"), ("c", KNOWS, "b"),
    }


def test_sparql_construct_typing_rule_with_filter(spark):
    from kgforge.operators.sparql import sparql_construct

    t = _triples_df(spark, [
        ("a", AGE, "45", "literal"),
        ("b", AGE, "17", "literal"),
    ])
    # enrichment rule: adults get a type assertion; 'a' expands to rdf:type
    q = f"""CONSTRUCT {{ ?s a <ex:Adult> }}
            WHERE {{ ?s <{AGE}> ?age . FILTER (?age >= 18) }}"""
    got = [tuple(r) for r in sparql_construct(t, q).collect()]
    assert got == [
        ("a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "ex:Adult")
    ]


def test_sparql_construct_rejects_unbound_template_var(spark):
    from kgforge.operators.sparql import SparqlUnsupported, sparql_construct

    t = _triples_df(spark, [("a", KNOWS, "b", "iri")])
    with pytest.raises(SparqlUnsupported):
        sparql_construct(
            t, f"CONSTRUCT {{ ?s <{NAME}> ?nope }} WHERE {{ ?s <{KNOWS}> ?o }}"
        )


# -------------------------------------------------------------- inference


def test_subclass_closure_chain_and_diamond(spark):
    from kgforge.operators.inference import subclass_closure

    onto = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "D"), ("X", "B")],
        "sub string, sup string",
    )
    got = {(r["sub"], r["sup"]) for r in subclass_closure(onto).collect()}
    assert got == {
        ("A", "B"), ("B", "C"), ("C", "D"), ("X", "B"),
        ("A", "C"), ("A", "D"), ("B", "D"), ("X", "C"), ("X", "D"),
    }


def test_subclass_closure_cycle_terminates(spark):
    from kgforge.operators.inference import subclass_closure

    onto = spark.createDataFrame([("A", "B"), ("B", "A")], "sub string, sup string")
    got = {(r["sub"], r["sup"]) for r in subclass_closure(onto).collect()}
    assert got == {("A", "B"), ("B", "A"), ("A", "A"), ("B", "B")}


def test_rdfs_type_closure(spark):
    from kgforge.operators.inference import rdfs_type_closure

    types = spark.createDataFrame(
        [("e1", "Person"), ("e2", "Org"), ("e3", "Person"), ("e3", "Org")],
        "entity string, cls string",
    )
    onto = spark.createDataFrame(
        [("Person", "Agent"), ("Org", "Agent"), ("Agent", "Thing")],
        "sub string, sup string",
    )
    got = {(r["entity"], r["cls"]) for r in rdfs_type_closure(types, onto).collect()}
    assert got == {
        ("e1", "Person"), ("e1", "Agent"), ("e1", "Thing"),
        ("e2", "Org"), ("e2", "Agent"), ("e2", "Thing"),
        # e3 has both direct types but each inferred row appears once
        ("e3", "Person"), ("e3", "Org"), ("e3", "Agent"), ("e3", "Thing"),
    }


def test_domain_range_types(spark):
    from kgforge.operators.inference import domain_range_types

    t = _triples_df(spark, [
        ("e1", "ex:employs", "e2", "iri"),
        ("e1", "ex:name", "Acme", "literal"),
    ])
    domains = spark.createDataFrame([("ex:employs", "Org")], "predicate string, cls string")
    ranges = spark.createDataFrame([("ex:employs", "Person")], "predicate string, cls string")
    got = {(r["entity"], r["cls"]) for r in domain_range_types(t, domains, ranges).collect()}
    assert got == {("e1", "Org"), ("e2", "Person")}


# ----------------------------------------- sparql_select: extended grammar


def test_sparql_select_aggregate_group_by(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p1", KNOWS, "p3", "iri"),
        ("p2", KNOWS, "p3", "iri"),
        ("p1", "a", "Person", "iri"),
        ("p2", "a", "Person", "iri"),
    ])
    q = """SELECT ?cls (COUNT(?o) AS ?n) WHERE {
        ?s <ex:knows> ?o . ?s <a> ?cls .
    } GROUP BY ?cls"""
    got = [(r["cls"], r["n"]) for r in sparql_select(t, q).collect()]
    assert got == [("Person", 3)]


def test_sparql_select_count_distinct_and_multiset(spark):
    from kgforge.operators.sparql import sparql_select

    # duplicate assertion -> multiset COUNT sees 2, COUNT DISTINCT sees 1
    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p1", KNOWS, "p2", "iri"),
    ])
    q1 = f"SELECT (COUNT(?o) AS ?n) WHERE {{ ?s <{KNOWS}> ?o . }}"
    q2 = f"SELECT (COUNT(DISTINCT ?o) AS ?n) WHERE {{ ?s <{KNOWS}> ?o . }}"
    assert sparql_select(t, q1).collect()[0]["n"] == 2
    assert sparql_select(t, q2).collect()[0]["n"] == 1


def test_sparql_select_sum_avg(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", AGE, "10", "literal"),
        ("p2", AGE, "30", "literal"),
        ("p3", AGE, "unknown", "literal"),  # non-numeric -> NULL, skipped
    ])
    q = f"SELECT (SUM(?a) AS ?total) (AVG(?a) AS ?mean) WHERE {{ ?s <{AGE}> ?a . }}"
    row = sparql_select(t, q).collect()[0]
    assert row["total"] == 40.0 and row["mean"] == 20.0


def test_sparql_select_optional_left_join(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", "a", "Person", "iri"),
        ("p2", "a", "Person", "iri"),
        ("p1", KNOWS, "p2", "iri"),
    ])
    q = f"""SELECT DISTINCT ?s ?o WHERE {{
        ?s <a> <Person> . OPTIONAL {{ ?s <{KNOWS}> ?o }}
    }}"""
    got = {(r["s"], r["o"]) for r in sparql_select(t, q).collect()}
    assert got == {("p1", "p2"), ("p2", None)}


def test_sparql_select_optional_with_filter(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", "a", "Person", "iri"),
        ("p1", AGE, "30", "literal"),
        ("p2", "a", "Person", "iri"),
        ("p2", AGE, "99", "literal"),
    ])
    # the filter applies INSIDE the optional group: p2's age fails it, so
    # p2 keeps a NULL age rather than being dropped
    q = f"""SELECT DISTINCT ?s ?age WHERE {{
        ?s <a> <Person> . OPTIONAL {{ ?s <{AGE}> ?age . FILTER (?age < 50) }}
    }}"""
    got = {(r["s"], r["age"]) for r in sparql_select(t, q).collect()}
    assert got == {("p1", "30"), ("p2", None)}


def test_sparql_select_sequence_path(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p2", KNOWS, "p3", "iri"),
        ("p3", NAME, "Cyn", "literal"),
    ])
    q = f"SELECT ?s ?n WHERE {{ ?s <{KNOWS}>/<{KNOWS}>/<{NAME}> ?n . }}"
    got = [tuple(r) for r in sparql_select(t, q).collect()]
    assert got == [("p1", "Cyn")]


def test_sparql_select_inverse_path(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
    ])
    # ^knows from p2 reaches whoever knows p2
    q = f"SELECT ?who WHERE {{ <p2> ^<{KNOWS}> ?who . }}"
    assert [r["who"] for r in sparql_select(t, q).collect()] == ["p1"]
    # inverse inside a sequence: ?a knows ?b, then back — identity pairs
    q2 = f"SELECT DISTINCT ?a ?c WHERE {{ ?a <{KNOWS}>/^<{KNOWS}> ?c . }}"
    got = {(r["a"], r["c"]) for r in sparql_select(t, q2).collect()}
    assert got == {("p1", "p1")}


def test_sparql_select_group_by_validation(spark):
    from kgforge.operators.sparql import SparqlUnsupported, sparql_select

    t = _triples_df(spark, [("p1", KNOWS, "p2", "iri")])
    with pytest.raises(SparqlUnsupported):
        sparql_select(t, f"SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s <{KNOWS}> ?o . }}")
    with pytest.raises(SparqlUnsupported):
        sparql_select(t, f"SELECT ?s WHERE {{ ?s <{KNOWS}> ?o . }} GROUP BY ?s")


def test_sparql_select_full_iri_paths(spark):
    """Regression: IRIs contain '/' — path tokenization must never split
    inside angle brackets."""
    from kgforge.operators.sparql import sparql_select

    K = "http://schema.org/knows"
    t = _triples_df(spark, [
        ("p1", K, "p2", "iri"),
        ("p2", K, "p3", "iri"),
    ])
    q = f"SELECT DISTINCT ?s ?ff WHERE {{ ?s <{K}>/<{K}> ?ff . }}"
    assert [tuple(r) for r in sparql_select(t, q).collect()] == [("p1", "p3")]
    q2 = f"SELECT ?who WHERE {{ <p2> ^<{K}> ?who . }}"
    assert [r["who"] for r in sparql_select(t, q2).collect()] == ["p1"]


def test_sparql_filter_not_exists_anti_join(spark):
    from kgforge.operators.sparql import sparql_select

    # knowers with NO inbound knows edge (never the object of knows)
    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p2", KNOWS, "p3", "iri"),
        ("p4", KNOWS, "p1", "iri"),
    ])
    q = f"""SELECT ?s WHERE {{
        ?s <{KNOWS}> ?o .
        FILTER NOT EXISTS {{ ?in <{KNOWS}> ?s }}
    }}"""
    got = sorted(r.s for r in sparql_select(t, q).collect())
    assert got == ["p4"]


def test_sparql_filter_exists_semi_join_keeps_multiplicity(spark):
    from kgforge.operators.sparql import sparql_select

    # EXISTS must restrict, not widen: p1 has TWO knows edges and ONE
    # inbound edge (from p9); both its solutions survive exactly once.
    # p9 itself has no inbound edge, so its solution drops.
    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p1", KNOWS, "p3", "iri"),
        ("p9", KNOWS, "p1", "iri"),
        ("p2", KNOWS, "p3", "iri"),  # p2's inbound comes from p1
    ])
    q = f"""SELECT ?s ?o WHERE {{
        ?s <{KNOWS}> ?o .
        FILTER EXISTS {{ ?in <{KNOWS}> ?s }}
    }}"""
    got = sorted((r.s, r.o) for r in sparql_select(t, q).collect())
    assert got == [("p1", "p2"), ("p1", "p3"), ("p2", "p3")]


def test_sparql_exists_with_inner_filter_and_shared_reject(spark):
    from kgforge.operators.sparql import sparql_select, SparqlUnsupported
    import pytest as _pytest

    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p1", AGE, "50", "literal"),
        ("p2", KNOWS, "p3", "iri"),
        ("p2", AGE, "20", "literal"),
    ])
    # inner FILTER applies inside the EXISTS group
    q = f"""SELECT ?s WHERE {{
        ?s <{KNOWS}> ?o .
        FILTER EXISTS {{ ?s <{AGE}> ?a . FILTER (?a >= 40) }}
    }}"""
    assert [r.s for r in sparql_select(t, q).collect()] == ["p1"]
    # an EXISTS group sharing no variable with the outer BGP is refused
    with _pytest.raises(SparqlUnsupported):
        sparql_select(t, f"""SELECT ?s WHERE {{
            ?s <{KNOWS}> ?o . FILTER NOT EXISTS {{ ?x <{AGE}> ?y }}
        }}""").collect()


def test_sparql_ask(spark):
    from kgforge.operators.sparql import sparql_ask

    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p1", AGE, "50", "literal"),
    ])
    assert sparql_ask(t, f"ASK {{ ?s <{KNOWS}> ?o }}") is True
    assert sparql_ask(t, f"ASK WHERE {{ ?s <{AGE}> ?a . FILTER (?a >= 60) }}") is False
    assert sparql_ask(t, f"""ASK {{
        ?s <{KNOWS}> ?o . FILTER NOT EXISTS {{ ?z <{KNOWS}> ?s }}
    }}""") is True


def test_sparql_minus_equals_not_exists(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", KNOWS, "p2", "iri"),
        ("p2", KNOWS, "p3", "iri"),
        ("p4", KNOWS, "p1", "iri"),
    ])
    q_minus = f"""SELECT ?s WHERE {{
        ?s <{KNOWS}> ?o . MINUS {{ ?in <{KNOWS}> ?s }}
    }}"""
    q_ne = f"""SELECT ?s WHERE {{
        ?s <{KNOWS}> ?o . FILTER NOT EXISTS {{ ?in <{KNOWS}> ?s }}
    }}"""
    got_minus = sorted(r.s for r in sparql_select(t, q_minus).collect())
    got_ne = sorted(r.s for r in sparql_select(t, q_ne).collect())
    assert got_minus == got_ne == ["p4"]


def test_sparql_bind_concat_and_functions(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", NAME, "Ada", "literal"),
        ("p2", NAME, "Grace", "literal"),
    ])
    q = f"""SELECT ?s ?label ?n WHERE {{
        ?s <{NAME}> ?name .
        BIND(CONCAT(UCASE(?s), "#", LCASE(?name)) AS ?label)
        BIND(STRLEN(?label) AS ?n)
    }}"""
    got = {tuple(r) for r in sparql_select(t, q).collect()}
    assert got == {("p1", "P1#ada", 6), ("p2", "P2#grace", 8)}


def test_sparql_bind_chained_and_filterable(spark):
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", AGE, "45", "literal"),
        ("p2", AGE, "30", "literal"),
    ])
    # later BIND references the earlier one; FILTER sees the BIND var
    q = f"""SELECT ?s ?tag WHERE {{
        ?s <{AGE}> ?age .
        BIND(SUBSTR(?age, 1, 1) AS ?decade)
        BIND(CONCAT("d", ?decade) AS ?tag)
        FILTER (?tag = "d4")
    }}"""
    got = [tuple(r) for r in sparql_select(t, q).collect()]
    assert got == [("p1", "d4")]


def test_sparql_bind_rejections(spark):
    import pytest as _pt

    from kgforge.operators.sparql import SparqlUnsupported, sparql_select

    t = _triples_df(spark, [("p1", NAME, "Ada", "literal")])
    with _pt.raises(SparqlUnsupported):  # unbound var in BIND
        sparql_select(t, f"SELECT ?x WHERE {{ ?s <{NAME}> ?n . BIND(UCASE(?zz) AS ?x) }}")
    with _pt.raises(SparqlUnsupported):  # re-binding an existing var
        sparql_select(t, f"SELECT ?n WHERE {{ ?s <{NAME}> ?n . BIND(UCASE(?s) AS ?n) }}")
    with _pt.raises(SparqlUnsupported):  # BIND inside OPTIONAL
        sparql_select(
            t,
            f"SELECT ?s WHERE {{ ?s <{NAME}> ?n . "
            f"OPTIONAL {{ ?s <{AGE}> ?a . BIND(UCASE(?a) AS ?x) }} }}",
        )


def test_sparql_describe_iri_and_var_forms(spark):
    from kgforge.operators.sparql import sparql_describe

    t = _triples_df(spark, [
        ("p1", NAME, "Ada", "literal"),
        ("p1", AGE, "45", "literal"),
        ("p1", KNOWS, "p2", "iri"),
        ("p2", NAME, "Grace", "literal"),
        ("p3", NAME, "Alan", "literal"),
        ("p1", NAME, "Ada", "literal"),  # duplicate assertion -> one row
    ])
    by_iri = {tuple(r) for r in sparql_describe(t, "DESCRIBE <p1>").collect()}
    assert by_iri == {
        ("p1", NAME, "Ada"),
        ("p1", AGE, "45"),
        ("p1", KNOWS, "p2"),
    }
    two = {tuple(r) for r in sparql_describe(t, "DESCRIBE <p2> <p3>").collect()}
    assert two == {("p2", NAME, "Grace"), ("p3", NAME, "Alan")}
    # var form: subjects known by p1
    by_var = {
        tuple(r)
        for r in sparql_describe(
            t, f"DESCRIBE ?o WHERE {{ ?s <{KNOWS}> ?o }}"
        ).collect()
    }
    assert by_var == {("p2", NAME, "Grace")}


def test_sparql_describe_rejections(spark):
    import pytest as _pt

    from kgforge.operators.sparql import SparqlUnsupported, sparql_describe

    t = _triples_df(spark, [("p1", NAME, "Ada", "literal")])
    with _pt.raises(SparqlUnsupported):  # two vars
        sparql_describe(t, f"DESCRIBE ?a ?b WHERE {{ ?a <{KNOWS}> ?b }}")
    with _pt.raises(SparqlUnsupported):  # var without WHERE
        sparql_describe(t, "DESCRIBE ?a")
    with _pt.raises(SparqlUnsupported):  # iri with WHERE
        sparql_describe(t, f"DESCRIBE <p1> WHERE {{ ?s <{NAME}> ?n }}")


# ------------------------------------------- property-path closures + alternation


def test_sparql_path_closure_plus(spark):
    """p+ over a 5-node chain with a detached pair: all forward-reachable
    ordered pairs, nothing across the gap (bounded path-doubling)."""
    from kgforge.operators.sparql import sparql_select

    rows = [(f"n{i}", "ex:next", f"n{i+1}", "iri") for i in range(4)]
    rows += [("z0", "ex:next", "z1", "iri")]
    out = sparql_select(
        _triples_df(spark, rows),
        "SELECT DISTINCT ?s ?t WHERE { ?s <ex:next>+ ?t }",
    )
    got = {(r["s"], r["t"]) for r in out.collect()}
    want = {(f"n{i}", f"n{j}") for i in range(5) for j in range(5) if i < j}
    want |= {("z0", "z1")}
    assert got == want


def test_sparql_path_closure_star_zero_length(spark):
    """p* adds the zero-length arm: (x, x) for EVERY graph term (subjects
    and objects of any predicate, W3C §9.3), plus the p+ pairs."""
    from kgforge.operators.sparql import sparql_select

    rows = [
        ("a", "ex:next", "b", "iri"),
        ("b", "ex:next", "c", "iri"),
        ("q", "ex:other", "r", "iri"),  # terms only; no ex:next edges
    ]
    out = sparql_select(
        _triples_df(spark, rows),
        "SELECT DISTINCT ?s ?t WHERE { ?s <ex:next>* ?t }",
    )
    got = {(r["s"], r["t"]) for r in out.collect()}
    want = {(x, x) for x in "abcqr"} | {("a", "b"), ("a", "c"), ("b", "c")}
    assert got == want


def test_sparql_path_alternation_and_closure_over_alt(spark):
    """(p|q) is one predicate-isin pattern; (p|q)+ closes over the UNION
    edge set — a path may mix the two predicates."""
    from kgforge.operators.sparql import sparql_select

    rows = [
        ("a", "ex:p", "b", "iri"),
        ("b", "ex:q", "c", "iri"),
        ("c", "ex:r", "d", "iri"),  # not in the alternation
    ]
    t = _triples_df(spark, rows)
    one = sparql_select(t, "SELECT DISTINCT ?s ?t WHERE { ?s (<ex:p>|<ex:q>) ?t }")
    assert {(r["s"], r["t"]) for r in one.collect()} == {("a", "b"), ("b", "c")}
    closed = sparql_select(t, "SELECT DISTINCT ?s ?t WHERE { ?s (<ex:p>|<ex:q>)+ ?t }")
    assert {(r["s"], r["t"]) for r in closed.collect()} == {
        ("a", "b"), ("b", "c"), ("a", "c")
    }
    # inverse-of-alternation is refused (either arm of the compiler: the
    # statement fails to parse, or the desugar rejects the ^ marker)
    with pytest.raises(Exception, match="alternation|no basic graph patterns"):
        sparql_select(t, "SELECT ?s ?t WHERE { ?s ^(<ex:p>|<ex:q>) ?t }")


# ----------------------- negated sets / p? / GROUP_CONCAT / SAMPLE / HAVING


def test_sparql_negated_property_set(spark):
    """!p and !(p|q) match any predicate OUTSIDE the set (W3C §9.1
    NegatedPropertySet) — compiled as one NOT-isin on the fact scan."""
    from kgforge.operators.sparql import SparqlUnsupported, sparql_select

    t = _triples_df(spark, [
        ("a", "ex:p", "b", "iri"),
        ("b", "ex:q", "c", "iri"),
        ("c", "ex:r", "d", "iri"),
    ])
    got = sparql_select(t, "SELECT DISTINCT ?s ?t WHERE { ?s !<ex:p> ?t }")
    assert {(r["s"], r["t"]) for r in got.collect()} == {("b", "c"), ("c", "d")}
    got = sparql_select(t, "SELECT DISTINCT ?s ?t WHERE { ?s !(<ex:p>|<ex:q>) ?t }")
    assert {(r["s"], r["t"]) for r in got.collect()} == {("c", "d")}
    # closure over a negated set is refused, not silently misread
    with pytest.raises(SparqlUnsupported, match="negated"):
        sparql_select(t, "SELECT ?s ?t WHERE { ?s !(<ex:p>|<ex:q>)+ ?t }")


def test_sparql_zero_or_one_path(spark):
    """p? = the edge set plus the zero-length arm (x,x) for every graph
    term (W3C §9.3 ZeroOrOnePath) — no path-doubling ladder in the plan."""
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("a", "ex:p", "b", "iri"),
        ("b", "ex:p", "c", "iri"),
        ("x", "ex:q", "y", "iri"),  # q-edge: contributes only zero arms
    ])
    got = sparql_select(t, "SELECT DISTINCT ?s ?t WHERE { ?s <ex:p>? ?t }")
    assert {(r["s"], r["t"]) for r in got.collect()} == {
        ("a", "b"), ("b", "c"),
        ("a", "a"), ("b", "b"), ("c", "c"), ("x", "x"), ("y", "y"),
    }
    # in a sequence: knows/p? keeps the endpoint and its one-step extension
    got = sparql_select(t, "SELECT DISTINCT ?s ?t WHERE { ?s <ex:p>/<ex:p>? ?t }")
    assert {(r["s"], r["t"]) for r in got.collect()} == {
        ("a", "b"), ("a", "c"), ("b", "c")
    }


def test_sparql_group_concat_and_sample(spark):
    """GROUP_CONCAT sorts each group's values (deterministic, spec-valid);
    DISTINCT dedups before the sort; SAMPLE takes min. SEPARATOR escapes
    unquote (\\" -> ")."""
    from kgforge.operators.sparql import SparqlUnsupported, sparql_select

    t = _triples_df(spark, [
        ("a", KNOWS, "z", "iri"),
        ("a", KNOWS, "b", "iri"),
        ("a", KNOWS, "b", "iri"),
        ("c", KNOWS, "d", "iri"),
    ])
    q = ('SELECT ?s (GROUP_CONCAT(?o; SEPARATOR=",") AS ?os) WHERE '
         f"{{ ?s <{KNOWS}> ?o }} GROUP BY ?s ORDER BY ?s")
    got = [(r["s"], r["os"]) for r in sparql_select(t, q).collect()]
    assert got == [("a", "b,b,z"), ("c", "d")]
    q = ('SELECT ?s (GROUP_CONCAT(DISTINCT ?o; SEPARATOR="|") AS ?os) WHERE '
         f"{{ ?s <{KNOWS}> ?o }} GROUP BY ?s ORDER BY ?s")
    got = [(r["s"], r["os"]) for r in sparql_select(t, q).collect()]
    assert got == [("a", "b|z"), ("c", "d")]
    # default separator is a single space (W3C §18.5.1.7)
    q = ("SELECT ?s (GROUP_CONCAT(?o) AS ?os) WHERE "
         f"{{ ?s <{KNOWS}> ?o }} GROUP BY ?s ORDER BY ?s")
    assert [r["os"] for r in sparql_select(t, q).collect()] == ["b b z", "d"]
    q = ("SELECT ?s (SAMPLE(?o) AS ?one) WHERE "
         f"{{ ?s <{KNOWS}> ?o }} GROUP BY ?s ORDER BY ?s")
    got = [(r["s"], r["one"]) for r in sparql_select(t, q).collect()]
    assert got == [("a", "b"), ("c", "d")]
    with pytest.raises(SparqlUnsupported, match="SEPARATOR"):
        sparql_select(t, 'SELECT ?s (COUNT(?o; SEPARATOR=",") AS ?n) WHERE '
                      f"{{ ?s <{KNOWS}> ?o }} GROUP BY ?s")


def test_sparql_having(spark):
    """HAVING filters the aggregated solutions on a projected alias;
    refused without an aggregate or over an unprojected name."""
    from kgforge.operators.sparql import SparqlUnsupported, sparql_select

    t = _triples_df(spark, [
        ("a", KNOWS, "b", "iri"),
        ("a", KNOWS, "c", "iri"),
        ("d", KNOWS, "e", "iri"),
    ])
    q = ("SELECT ?s (COUNT(?o) AS ?n) WHERE "
         f"{{ ?s <{KNOWS}> ?o }} GROUP BY ?s HAVING (?n >= 2) ORDER BY ?s")
    got = [(r["s"], r["n"]) for r in sparql_select(t, q).collect()]
    assert got == [("a", 2)]
    # string-typed HAVING over a GROUP_CONCAT alias also works
    q = ('SELECT ?s (GROUP_CONCAT(?o; SEPARATOR=",") AS ?os) WHERE '
         f"{{ ?s <{KNOWS}> ?o }} GROUP BY ?s HAVING (?os = \"b,c\")")
    assert [r["s"] for r in sparql_select(t, q).collect()] == ["a"]
    with pytest.raises(SparqlUnsupported, match="HAVING"):
        sparql_select(t, f"SELECT ?s ?o WHERE {{ ?s <{KNOWS}> ?o }} HAVING (?o > 1)")
    with pytest.raises(SparqlUnsupported, match="HAVING"):
        sparql_select(t, "SELECT ?s (COUNT(?o) AS ?n) WHERE "
                      f"{{ ?s <{KNOWS}> ?o }} GROUP BY ?s HAVING (?zzz > 1)")


def test_sparql_filter_connectives(spark):
    """FILTER boolean connectives (W3C §17.4.1): || / && / ! with parens;
    string literals containing '&&' must not split."""
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", AGE, "25", "literal"),
        ("p2", AGE, "45", "literal"),
        ("p3", AGE, "65", "literal"),
        ("p4", AGE, "n/a", "literal"),
        ("amp", NAME, "a && b", "literal"),
    ])
    q = f"SELECT ?s WHERE {{ ?s <{AGE}> ?a . FILTER (?a < 30 || ?a > 60) }}"
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"p1", "p3"}
    q = f"SELECT ?s WHERE {{ ?s <{AGE}> ?a . FILTER (?a > 30 && ?a < 60) }}"
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"p2"}
    q = f"SELECT ?s WHERE {{ ?s <{AGE}> ?a . FILTER (!(?a < 60)) }}"
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"p3"}
    # nesting: (A && B) || C
    q = (f"SELECT ?s WHERE {{ ?s <{AGE}> ?a . "
         "FILTER ((?a > 20 && ?a < 30) || ?a = 65) }")
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"p1", "p3"}
    # '&&' inside a CONTAINS string literal is not a connective
    q = f'SELECT ?s WHERE {{ ?s <{NAME}> ?n . FILTER (CONTAINS(?n, "&& b")) }}'
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"amp"}


def test_sparql_filter_in_strstarts_strends(spark):
    """FILTER ?x IN (...) / NOT IN / STRSTARTS / STRENDS."""
    from kgforge.operators.sparql import sparql_select

    t = _triples_df(spark, [
        ("p1", NAME, "Ann", "literal"),
        ("p2", NAME, "Bob", "literal"),
        ("p3", NAME, "Annette", "literal"),
    ])
    q = f'SELECT ?s WHERE {{ ?s <{NAME}> ?n . FILTER (?n IN ("Ann", "Bob")) }}'
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"p1", "p2"}
    q = f'SELECT ?s WHERE {{ ?s <{NAME}> ?n . FILTER (?n NOT IN ("Ann", "Bob")) }}'
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"p3"}
    q = f'SELECT ?s WHERE {{ ?s <{NAME}> ?n . FILTER (STRSTARTS(?n, "Ann")) }}'
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"p1", "p3"}
    q = f'SELECT ?s WHERE {{ ?s <{NAME}> ?n . FILTER (STRENDS(?n, "tte")) }}'
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"p3"}
    # connective composition with IN
    q = (f'SELECT ?s WHERE {{ ?s <{NAME}> ?n . '
         f'FILTER (?n IN ("Bob") || STRENDS(?n, "tte")) }}')
    assert {r["s"] for r in sparql_select(t, q).collect()} == {"p2", "p3"}


def test_sparql_subquery(spark):
    """One-level subqueries (W3C §12): the inner SELECT evaluates
    bottom-up (aggregation + modifiers inside), joins the outer group on
    shared projected vars, and exports fresh aliases; deeper nesting and
    disjoint subqueries are refused."""
    from kgforge.operators.sparql import SparqlUnsupported, sparql_select

    t = _triples_df(spark, [
        ("a", KNOWS, "b", "iri"),
        ("a", KNOWS, "c", "iri"),
        ("b", KNOWS, "c", "iri"),
        ("a", NAME, "Ann", "literal"),
        ("b", NAME, "Bob", "literal"),
        ("c", NAME, "Cyn", "literal"),
    ])
    q = f"""SELECT ?s ?nm ?n WHERE {{
        ?s <{NAME}> ?nm .
        {{ SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s <{KNOWS}> ?o }} GROUP BY ?s }}
    }}"""
    got = {(r["s"], r["nm"], r["n"]) for r in sparql_select(t, q).collect()}
    # c knows nobody -> inner join drops it
    assert got == {("a", "Ann", 2), ("b", "Bob", 1)}
    # subquery HAVING composes
    q = f"""SELECT ?s ?nm ?n WHERE {{
        ?s <{NAME}> ?nm .
        {{ SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s <{KNOWS}> ?o }}
          GROUP BY ?s HAVING (?n >= 2) }}
    }}"""
    assert [r["s"] for r in sparql_select(t, q).collect()] == ["a"]
    with pytest.raises(SparqlUnsupported, match="one level"):
        sparql_select(t, f"""SELECT ?s WHERE {{ ?s <{NAME}> ?x .
          {{ SELECT ?s WHERE {{ ?s <{KNOWS}> ?y .
            {{ SELECT ?s WHERE {{ ?s <{KNOWS}> ?z }} }} }} }} }}""")
    with pytest.raises(SparqlUnsupported, match="shares no"):
        sparql_select(t, f"""SELECT ?x WHERE {{ ?x <{NAME}> ?nm .
          {{ SELECT ?q (COUNT(?o) AS ?n) WHERE {{ ?q <{KNOWS}> ?o }} GROUP BY ?q }} }}""")


def _iri_triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, {"value": o, "kind": k, "datatype": None, "lang": None})
         for (s, p, o, k) in rows],
        "subject string, predicate string, "
        "object struct<value:string,kind:string,datatype:string,lang:string>",
    )


def test_owl_inverse_both_directions(spark):
    from kgforge.operators.inference import owl_property_inference

    t = _iri_triples(spark, [
        ("a", "p:knows", "b", "iri"),
        ("c", "p:knownBy", "d", "iri"),
        ("e", "p:knows", "lit", "literal"),   # literal object: no entailment
    ])
    ax = spark.createDataFrame(
        [("p:knows", "inverseOf", "p:knownBy")], "p string, axiom string, q string"
    )
    got = {(r["subject"], r["predicate"], r["object"])
           for r in owl_property_inference(t, ax).collect()}
    assert got == {("b", "p:knownBy", "a"), ("d", "p:knows", "c")}


def test_owl_symmetric_delta_excludes_asserted(spark):
    from kgforge.operators.inference import owl_property_inference

    t = _iri_triples(spark, [
        ("a", "p:adj", "b", "iri"),
        ("b", "p:adj", "a", "iri"),   # mutual already asserted
        ("a", "p:adj", "c", "iri"),
    ])
    ax = spark.createDataFrame(
        [("p:adj", "symmetric", None)], "p string, axiom string, q string"
    )
    got = {(r["subject"], r["predicate"], r["object"])
           for r in owl_property_inference(t, ax).collect()}
    assert got == {("c", "p:adj", "a")}
