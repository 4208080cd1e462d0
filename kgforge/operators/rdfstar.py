"""RDF-star (RDF 1.2) quoted-triple handling over the corpus triples.

The Turtle parser (kgforge/rdf/turtle.py) emits quoted triples
``<< s p o >>`` as opaque terms of kind='triple' whose value is the
canonical single-space N-Triples spelling. That keeps the string-typed
triples schema intact, but SQL-shaped downstream consumers (SPARQL
compilation, validation, profiling) want PLAIN triples — ``unstar``
lowers every quoted-triple occurrence to W3C standard reification
(rdf:Statement + rdf:subject/predicate/object) with a deterministic
skolem statement IRI ``urn:star:<md5 of the canonical form>`` so the
SAME quoted triple reifies to the SAME node corpus-wide (and a DuckDB
oracle can recompute the node with ``md5()``).

Reference parity note: the reference parser (EasyRdf-based) predates
RDF-star entirely; this is new surface, spec-public (W3C RDF 1.2 WD).

Scale shape: everything is codegen — startswith/regexp_extract branches
plus one distinct over the (url, canonical-form) pairs for the
reification quadruples; no Python, no joins, map-side until that one
dedup agg.

Limitations (documented, deliberate): inner SUBJECT/PREDICATE terms must
be IRIs for reification (quoted triples with bnode/nested inner subjects
keep their skolem node but emit no expansion rows); literal lexical
forms keep their N-Triples escaping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_S_RE = r"^<< <([^>]*)> "
_P_RE = r"^<< <[^>]*> <([^>]*)> "
_O_RE = r"^<< <[^>]*> <[^>]*> (.*) >>$"


def _skolem(col):
    return F.concat(F.lit("urn:star:"), F.md5(col))


def _obj_struct(value, kind, datatype=None, lang=None):
    return F.struct(
        value.alias("value"),
        kind.alias("kind"),
        (datatype if datatype is not None else F.lit(None).cast("string")).alias(
            "datatype"
        ),
        (lang if lang is not None else F.lit(None).cast("string")).alias("lang"),
    )


def unstar(triples: DataFrame) -> DataFrame:
    """Lower RDF-star quoted triples to standard reification.

    - a quoted triple in SUBJECT position (serialized ``<< ... >>``
      string) or OBJECT position (kind='triple') is replaced by its
      skolem statement IRI in place;
    - per distinct (url, quoted form): four reification triples
      (stmt rdf:type rdf:Statement; stmt rdf:subject s; stmt
      rdf:predicate p; stmt rdf:object o) are appended with seq = -1 and
      the page's fmt/status provenance.

    Plain triples pass through byte-identical, so ``unstar`` is safe to
    run unconditionally after parse.
    """
    star_s = F.col("subject").startswith("<< ")
    star_o = F.col("object.kind") == "triple"

    lowered = triples.withColumn(
        "subject", F.when(star_s, _skolem(F.col("subject"))).otherwise(F.col("subject"))
    ).withColumn(
        "object",
        F.when(
            star_o, _obj_struct(_skolem(F.col("object.value")), F.lit("iri"))
        ).otherwise(F.col("object")),
    )

    qts = (
        triples.filter(star_s)
        .select("url", F.col("subject").alias("qt"), "fmt", "status")
        .unionByName(
            triples.filter(star_o).select(
                "url", F.col("object.value").alias("qt"), "fmt", "status"
            )
        )
        .groupBy("url", "qt")
        .agg(F.first("fmt").alias("fmt"), F.first("status").alias("status"))
    )

    s_in = F.regexp_extract("qt", _S_RE, 1)
    p_in = F.regexp_extract("qt", _P_RE, 1)
    o_raw = F.regexp_extract("qt", _O_RE, 1)
    # object term kind branches over the canonical spelling
    o_term = (
        F.when(o_raw.startswith("<"), _obj_struct(
            F.regexp_extract(o_raw, r"^<([^>]*)>$", 1), F.lit("iri")))
        .when(o_raw.startswith("_:"), _obj_struct(o_raw, F.lit("bnode")))
        .otherwise(
            _obj_struct(
                F.regexp_extract(o_raw, r'^"((?:[^"\\]|\\.)*)"', 1),
                F.lit("literal"),
                datatype=F.nullif(
                    F.regexp_extract(o_raw, r"\^\^<([^>]*)>$", 1), F.lit("")
                ),
                lang=F.nullif(
                    F.regexp_extract(o_raw, r"@([A-Za-z0-9-]+)$", 1), F.lit("")
                ),
            )
        )
    )
    expandable = (s_in != "") & (p_in != "") & (o_raw != "")
    stmt = _skolem(F.col("qt"))
    base = qts.filter(expandable).select(
        "url", stmt.alias("stmt"), s_in.alias("s_in"), p_in.alias("p_in"),
        o_term.alias("o_term"), "fmt", "status",
    )
    reif = base.select(
        "url",
        F.lit(-1).cast("long").alias("seq"),
        F.col("stmt").alias("subject"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(RDF_NS + "type").alias("predicate"),
                    _obj_struct(F.lit(RDF_NS + "Statement"), F.lit("iri")).alias("object"),
                ),
                F.struct(
                    F.lit(RDF_NS + "subject").alias("predicate"),
                    _obj_struct(F.col("s_in"), F.lit("iri")).alias("object"),
                ),
                F.struct(
                    F.lit(RDF_NS + "predicate").alias("predicate"),
                    _obj_struct(F.col("p_in"), F.lit("iri")).alias("object"),
                ),
                F.struct(
                    F.lit(RDF_NS + "object").alias("predicate"),
                    F.col("o_term").alias("object"),
                ),
            )
        ).alias("po"),
        "fmt",
        "status",
    ).select(
        "url", "seq", "subject",
        F.col("po.predicate").alias("predicate"),
        F.col("po.object").alias("object"),
        "fmt", "status", F.lit(None).cast("string").alias("error"),
    )
    return lowered.unionByName(reif)
