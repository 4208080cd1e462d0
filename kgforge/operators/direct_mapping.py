"""Relational -> RDF triples per the W3C Direct Mapping (RDB2RDF).

A corpus-scale KG is rarely built from web pages alone: the entity backbone
(product catalogs, org charts, geo tables) usually lives in relational /
columnar tables, and the KG-construction pipeline must lift those into the
same (subject, predicate, object) stream the page parsers emit so fusion,
validation and materialization see ONE triple model. The reference only
parses RDF content strings (/root/reference/src/ShaclParser.php:34-43);
this operator is the structured-source half of the engine's corpus
generalization, mirroring the W3C "A Direct Mapping of Relational Data to
RDF" recommendation (2012-09-27):

- **Row node**: ``<base><Table>/<pk>=<value>`` — composite keys join the
  ``col=value`` pairs with ``;`` in the order given.
- **Row type**: one ``rdf:type <base><Table>`` triple per row.
- **Literal triples**: one per non-NULL column, predicate
  ``<base><Table>#<column>``, object = lexical form with the XSD datatype
  implied by the Spark column type (integral -> xsd:integer,
  float/double -> xsd:double, decimal -> xsd:decimal, boolean ->
  xsd:boolean, date -> xsd:date, timestamp -> xsd:dateTime, string ->
  plain literal). NULL columns emit nothing (DM §2.2: no triple).
- **Reference triples**: for each declared foreign key, predicate
  ``<base><Table>#ref-<fkcol>``, object = the *referenced* row node built
  from the local FK value (DM references the target's primary key, so the
  target IRI is a pure function of the local value — NO join is needed,
  which is what makes this a map-only stage at any scale).

Scale shape: the whole mapping is ONE codegen projection — an array of
(predicate, object, kind, datatype) structs exploded to rows — so it fuses
into the parquet scan (WholeStageCodegen, no shuffle, no UDF). A table with
C columns fans out to at most C+1+|FK| triples per row, linearly.

IRI safety: key and table/column names are percent-encoded for the
characters that would break an IRI or the row-node grammar itself
(``% < > " { } | \\ ^ `` + space, ``# ? ; = &`` and control chars are the
practically-occurring set; ``%`` first so encodings don't double-encode).
Everything stays inside ``regexp_replace``/``concat`` codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# percent-encode set: '%' MUST be first (no double-encoding after it)
_ENC = [
    ("%", "%25"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("\\", "%5C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("#", "%23"),
    ("?", "%3F"),
    (";", "%3B"),
    ("=", "%3D"),
    ("&", "%26"),
]


def _iri_safe(col: Column) -> Column:
    out = col.cast("string")
    for ch, rep in _ENC:
        out = F.replace(out, F.lit(ch), F.lit(rep))
    return out


def _xsd_datatype(dt: T.DataType) -> str:
    """Spark column type -> XSD datatype IRI ('' = plain string literal)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return XSD + "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return XSD + "double"
    if isinstance(dt, T.DecimalType):
        return XSD + "decimal"
    if isinstance(dt, T.BooleanType):
        return XSD + "boolean"
    if isinstance(dt, T.DateType):
        return XSD + "date"
    if isinstance(dt, T.TimestampType):
        return XSD + "dateTime"
    return ""


def _lexical(col: Column, dt: T.DataType) -> Column:
    """Canonical lexical form per XSD (timestamps ISO-8601 with 'T';
    booleans 'true'/'false' — Spark's string cast already does both)."""
    if isinstance(dt, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")
    return col.cast("string")


def row_node(table: str, pk: list[str], base: str) -> Column:
    """The DM row-node IRI as a codegen expression over the pk columns."""
    parts: list[Column] = [F.lit(f"{base}{table}/")]
    for j, c in enumerate(pk):
        if j:
            parts.append(F.lit(";"))
        parts.append(F.lit(f"{c}="))
        parts.append(_iri_safe(F.col(c)))
    return F.concat(*parts)


def direct_map_table(
    df: DataFrame,
    table: str,
    pk: list[str],
    base: str = "http://kg.example.org/dm/",
    fks: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """df -> triples (subject, predicate, object, object_kind, datatype).

    ``fks`` maps a local column -> (target_table, target_pk_column); each
    produces a ``#ref-<col>`` triple whose object is the target row node
    built from the local value (map-only: DM guarantees FK -> target PK).
    """
    fks = fks or {}
    cell = (
        "predicate string, object string, object_kind string, datatype string"
    )

    def rec(pred, obj, kind, datatype) -> Column:
        return F.when(
            obj.isNotNull(),
            F.struct(
                F.lit(pred).alias("predicate"),
                obj.alias("object"),
                F.lit(kind).alias("object_kind"),
                F.lit(datatype).alias("datatype"),
            ),
        )

    cells: list[Column] = [
        rec(RDF_TYPE, F.lit(f"{base}{table}"), "iri", "")
    ]
    for field in df.schema.fields:
        dtype = _xsd_datatype(field.dataType)
        cells.append(
            rec(
                f"{base}{table}#{field.name}",
                _lexical(F.col(field.name), field.dataType),
                "literal",
                dtype,
            )
        )
    for col, (ttable, tpk) in fks.items():
        target = F.concat(
            F.lit(f"{base}{ttable}/{tpk}="), _iri_safe(F.col(col))
        )
        cells.append(
            rec(
                f"{base}{table}#ref-{col}",
                F.when(F.col(col).isNotNull(), target),
                "iri",
                "",
            )
        )

    exploded = df.select(
        row_node(table, pk, base).alias("subject"),
        F.explode(
            F.filter(
                F.array(*cells).cast(f"array<struct<{cell}>>"),
                lambda c: c.isNotNull(),
            )
        ).alias("t"),
    )
    return exploded.select(
        "subject", "t.predicate", "t.object", "t.object_kind", "t.datatype"
    )
