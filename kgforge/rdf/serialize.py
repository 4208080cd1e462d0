"""N-Triples serialization: triples DataFrame -> RDF lines / text sink.

The KG's interoperable export surface (reference scope: parser-shacl only
READS RDF — src/ShaclParser.php — emitting it back out is part of the
corpus-scale generalization: downstream consumers load the constructed
graph into any triple store). N-Triples is the one W3C RDF syntax that is
line-per-triple, which makes it the natural Spark sink format: every line
is independent, so serialization is a pure codegen expression (concat +
replace chains — no UDF) and the write is an embarrassingly parallel
``df.write.text`` with no cross-partition coordination, any partition
count, any order.

Escaping per the N-Triples grammar (https://www.w3.org/TR/n-triples/
ECHAR): backslash first, then quote, LF, CR, TAB. Literals carry
``@lang`` when a language tag is present (rdf:langString is implied and
never written), else ``^^<datatype>`` when the datatype is non-empty and
not xsd:string (xsd:string is the implicit default the spec says to
omit). Blank nodes pass through their ``_:label`` spelling.

Round-trip invariant: ``kgforge.rdf.ntriples.parse_ntriples`` re-parses
every emitted line to the original term tuples (tests/test_turtle.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def escape_literal_col(col):
    """N-Triples ECHAR escaping as a codegen replace chain (order matters:
    backslash first so injected escapes are not re-escaped)."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def _resource(col):
    return F.when(col.startswith("_:"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def ntriples_line_col(subject, predicate, obj):
    """One N-Triples line from (subject str, predicate str, object struct
    (value, kind, datatype, lang)) — the repo's TRIPLE schema object."""
    o_val, kind = obj["value"], obj["kind"]
    dt, lang = obj["datatype"], obj["lang"]
    tag = (
        F.when((lang.isNotNull()) & (lang != ""), F.concat(F.lit("@"), lang))
        .when(
            (dt.isNotNull()) & (dt != "") & (dt != XSD_STRING),
            F.concat(F.lit("^^<"), dt, F.lit(">")),
        )
        .otherwise(F.lit(""))
    )
    rendered = (
        F.when(kind == "iri", F.concat(F.lit("<"), o_val, F.lit(">")))
        .when(
            kind == "bnode",
            F.when(o_val.startswith("_:"), o_val).otherwise(
                F.concat(F.lit("_:"), o_val)
            ),
        )
        .otherwise(F.concat(F.lit('"'), escape_literal_col(o_val), F.lit('"'), tag))
    )
    return F.concat(
        _resource(subject),
        F.lit(" "),
        F.lit("<"),
        predicate,
        F.lit("> "),
        rendered,
        F.lit(" ."),
    )


def to_ntriples_lines(triples: DataFrame) -> DataFrame:
    """(subject, predicate, object struct) -> single-column (line) DF."""
    return triples.select(
        ntriples_line_col(
            F.col("subject"), F.col("predicate"), F.col("object")
        ).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str, partitions: int | None = None):
    """Materialize the graph as partitioned .nt part-files. Each output
    file is independently valid N-Triples, so downstream loaders can
    ingest parts in parallel; ``partitions`` sizes files for the target
    store (None keeps the upstream partitioning — no extra shuffle)."""
    lines = to_ntriples_lines(triples).withColumnRenamed("line", "value")
    if partitions is not None:
        lines = lines.repartition(partitions)
    lines.write.mode("overwrite").text(path)
