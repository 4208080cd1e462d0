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


def _template_col(template: str) -> Column:
    """R2RML rr:template expansion: '{col}' placeholders -> IRI-safe
    column values concatenated with the literal segments; NULL-guarded —
    any referenced NULL column makes the whole term NULL (R2RML §11.1:
    the term map generates no RDF term)."""
    import re as _re

    parts = _re.split(r"\{([^{}]+)\}", template)
    segs: list[Column] = []
    refs: list[str] = []
    for i, p in enumerate(parts):
        if i % 2 == 0:
            if p:
                segs.append(F.lit(p))
        else:
            refs.append(p)
            segs.append(_iri_safe(F.col(p)))
    if not segs:
        return F.lit(None).cast("string")
    out = F.concat(*segs)
    for r in refs:
        out = F.when(F.col(r).isNotNull(), out)
    return out


def r2rml_map_table(
    df: DataFrame,
    subject_template: str,
    predicate_object_maps: list[dict],
    subject_class: str | None = None,
) -> DataFrame:
    """Custom relational -> RDF lifting per W3C R2RML (2012-09-27), the
    configurable sibling of :func:`direct_map_table` (which hard-codes
    the Direct Mapping's naming): a triples map with an rr:template
    subject and a list of predicate-object maps, each one of

    - ``{"predicate": IRI, "column": name}`` — literal object, XSD
      datatype inferred from the Spark column type (override with
      ``"datatype"``),
    - ``{"predicate": IRI, "template": "...{col}..."}`` — IRI object
      built from the template,
    - ``{"predicate": IRI, "constant": value, "kind": "iri"|"literal"}``
      — constant term.

    An optional ``subject_class`` emits one rdf:type triple per row
    (rr:class). NULL semantics follow R2RML §11: any term map whose
    referenced column is NULL generates no triple, and a NULL subject
    suppresses the whole row's triples. Returns the same flat
    (subject, predicate, object, object_kind, datatype) stream as the
    direct mapping, so both sources feed one fusion/validation path.

    Scale shape: identical to the direct mapping — the whole triples map
    compiles to ONE codegen array+explode projection fused into the
    scan; no shuffle, no UDF, no join (reference object maps that would
    need a join are out of the subset; model them as IRI templates over
    the local FK value, which R2RML's joint-less shortcut also blesses).
    """
    cell = (
        "predicate string, object string, object_kind string, datatype string"
    )
    by_name = {f.name: f.dataType for f in df.schema.fields}

    def rec(pred: str, obj: Column, kind: str, datatype: str) -> Column:
        return F.when(
            obj.isNotNull(),
            F.struct(
                F.lit(pred).alias("predicate"),
                obj.alias("object"),
                F.lit(kind).alias("object_kind"),
                F.lit(datatype).alias("datatype"),
            ),
        )

    cells: list[Column] = []
    if subject_class:
        cells.append(rec(RDF_TYPE, F.lit(subject_class), "iri", ""))
    for pom in predicate_object_maps:
        pred = pom["predicate"]
        if "column" in pom:
            col = pom["column"]
            if col not in by_name:
                raise ValueError(f"unknown column in object map: {col!r}")
            dt = by_name[col]
            cells.append(
                rec(
                    pred,
                    _lexical(F.col(col), dt),
                    "literal",
                    pom.get("datatype", _xsd_datatype(dt)),
                )
            )
        elif "template" in pom:
            cells.append(rec(pred, _template_col(pom["template"]), "iri", ""))
        elif "constant" in pom:
            kind = pom.get("kind", "iri")
            cells.append(
                rec(pred, F.lit(str(pom["constant"])), kind,
                    pom.get("datatype", ""))
            )
        else:
            raise ValueError(
                f"object map needs column/template/constant: {pom!r}"
            )

    exploded = df.select(
        _template_col(subject_template).alias("subject"),
        F.explode(
            F.filter(
                F.array(*cells).cast(f"array<struct<{cell}>>"),
                lambda c: c.isNotNull(),
            )
        ).alias("t"),
    ).filter(F.col("subject").isNotNull())
    return exploded.select(
        "subject", "t.predicate", "t.object", "t.object_kind", "t.datatype"
    )
