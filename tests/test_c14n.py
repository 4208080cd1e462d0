"""Canonical N-Triples: bnode relabel/order invariance + round-trip."""

from pyspark.sql import types as T


def _term(v, k, dt=None, lang=None):
    return {"value": v, "kind": k, "datatype": dt, "lang": lang}


_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("predicate", T.StringType()),
        T.StructField(
            "object",
            T.StructType(
                [
                    T.StructField("value", T.StringType()),
                    T.StructField("kind", T.StringType()),
                    T.StructField("datatype", T.StringType()),
                    T.StructField("lang", T.StringType()),
                ]
            ),
        ),
    ]
)


def _lines(rows, spark):
    from kgforge.rdf.c14n import canonical_ntriples

    out = {}
    df = spark.createDataFrame(rows, _SCHEMA)
    for r in canonical_ntriples(df).collect():
        out.setdefault(r["url"], []).append(r["line"])
    return {k: sorted(v) for k, v in out.items()}


def test_canonical_invariant_to_bnode_labels_and_order(spark):
    rows = [
        # chain s -p-> b1 -p-> b2 -q-> "x"
        ("A", "http://a/s", "http://p/p", _term("b1", "bnode")),
        ("A", "_:b1", "http://p/p", _term("b2", "bnode")),
        ("A", "_:b2", "http://p/q", _term("x", "literal")),
        # same graph: labels swapped AND triples reordered
        ("B", "_:b2", "http://p/p", _term("b1", "bnode")),
        ("B", "_:b1", "http://p/q", _term("x", "literal")),
        ("B", "http://a/s", "http://p/p", _term("b2", "bnode")),
    ]
    lines = _lines(rows, spark)
    assert lines["A"] == lines["B"]
    assert any("_:c0" in ln for ln in lines["A"])


def test_canonical_automorphic_bnodes_stable(spark):
    rows = [
        ("C", "http://a/s", "http://p/p", _term("m", "bnode")),
        ("C", "http://a/s", "http://p/p", _term("n", "bnode")),
        ("D", "http://a/s", "http://p/p", _term("q", "bnode")),
        ("D", "http://a/s", "http://p/p", _term("p", "bnode")),
    ]
    lines = _lines(rows, spark)
    assert lines["C"] == lines["D"]


def test_canonical_distinguishes_different_graphs(spark):
    rows = [
        ("A", "http://a/s", "http://p/p", _term("b1", "bnode")),
        ("A", "_:b1", "http://p/q", _term("x", "literal")),
        # E differs: the literal hangs off a SECOND bnode
        ("E", "http://a/s", "http://p/p", _term("b1", "bnode")),
        ("E", "_:b2", "http://p/q", _term("x", "literal")),
    ]
    lines = _lines(rows, spark)
    assert lines["A"] != lines["E"]


def test_canonical_lines_reparse_to_original_graph(spark):
    from kgforge.rdf.ntriples import parse_ntriples

    rows = [
        ("A", "http://a/s", "http://p/p", _term("b1", "bnode")),
        ("A", "_:b1", "http://p/q", _term("he said \"hi\"\n", "literal")),
        ("A", "_:b1", "http://p/r", _term("tag", "literal", None, "en")),
    ]
    lines = _lines(rows, spark)["A"]
    parsed, prefixes = parse_ntriples("\n".join(lines))
    assert len(parsed) == 3
    # the escaped literal round-trips byte-identically
    lits = {o[0] for (_, _, o) in parsed if o[1] == "literal"}
    assert 'he said "hi"\n' in lits
