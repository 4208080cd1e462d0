"""Typed-literal normalization: canonicalize xsd-typed object values.

The reference treats every literal as an opaque string (its Turtle parser
keeps lexical forms verbatim and no stage ever interprets a datatype
beyond sh:datatype string-equality). A web-scale KG can't: pages spell the
same fact "042", "+42", "42.0"; booleans arrive as "1"/"true"; dates in
canonical and junk forms — so downstream joins/aggregations need ONE
canonical value per literal plus a validity verdict (an invalid lexical
form for its declared datatype is a data-quality signal the fusion and
validation stages both consume).

Everything here is codegen projection — try_cast / rlike / date functions,
no UDF, no shuffle: normalization is a map-only stage that fuses into
whatever scan or join precedes it (WholeStageCodegen keeps it free at
100 TB).

Canonical forms (documented choices, mirrored by the DuckDB oracle):
- numeric xsd types -> ``num_value`` DOUBLE (the canonical join key;
  lexical re-serialization is deliberately NOT produced — engines differ
  on float formatting, doubles don't),
- xsd:boolean -> ``bool_value`` ("true"/"1" -> true, "false"/"0" ->
  false per the XSD 1.1 boolean lexical space; anything else invalid),
- xsd:date -> ``epoch_day`` INT (days since 1970-01-01; strict
  yyyy-MM-dd, junk -> invalid),
- language tags -> ``lang_canonical`` (BCP 47 case convention: language
  lowercase, 2-letter region uppercase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"

_NUMERIC_TYPES = [
    XSD + t
    for t in (
        "integer", "int", "long", "short", "byte", "decimal", "double",
        "float", "nonNegativeInteger", "positiveInteger",
        "nonPositiveInteger", "negativeInteger", "unsignedInt",
        "unsignedLong", "unsignedShort", "unsignedByte",
    )
]
_INTEGER_TYPES = [t for t in _NUMERIC_TYPES if "decimal" not in t
                  and "double" not in t and "float" not in t]

__all__ = ["normalize_literals", "XSD"]


def normalize_literals(triples: DataFrame) -> DataFrame:
    """Append canonical-value columns to a triples DataFrame:

    lit_kind ('numeric' | 'boolean' | 'date' | 'string' | 'non_literal'),
    num_value (double, numeric types), bool_value (boolean), epoch_day
    (int, xsd:date), lang_canonical (BCP 47 casing), valid (false iff the
    lexical form does not parse for its declared datatype; non-literals
    and plain strings are vacuously valid)."""
    kind = F.col("object.kind")
    val = F.col("object.value")
    dt = F.col("object.datatype")
    lang = F.col("object.lang")

    is_lit = kind == "literal"
    lit_kind = (
        F.when(~is_lit, F.lit("non_literal"))
        .when(dt.isin(_NUMERIC_TYPES), F.lit("numeric"))
        .when(dt == XSD + "boolean", F.lit("boolean"))
        .when(dt == XSD + "date", F.lit("date"))
        .otherwise(F.lit("string"))
    )
    # integers reject fractional lexical forms ("42.5" is not an integer);
    # floating types accept the full double grammar via try_cast
    int_ok = val.rlike(r"^[+-]?\d+$")
    num_value = F.when(
        lit_kind == "numeric",
        F.when(dt.isin(_INTEGER_TYPES) & ~int_ok, F.lit(None)).otherwise(
            val.try_cast("double")
        ),
    )
    bool_value = F.when(
        lit_kind == "boolean",
        F.when(val.isin("true", "1"), F.lit(True)).when(
            val.isin("false", "0"), F.lit(False)
        ),
    )
    # strict ISO date only: try_cast would accept e.g. bare years
    date_ok = val.rlike(r"^\d{4}-\d{2}-\d{2}$")
    epoch_day = F.when(
        lit_kind == "date",
        F.when(date_ok, F.datediff(val.try_cast("date"), F.lit("1970-01-01"))),
    ).cast("int")
    # BCP 47 casing: language lowercase, 2-letter region uppercase
    parts = F.split(lang, "-")
    region = F.element_at(parts, 2)
    lang_canonical = F.when(
        (lang.isNotNull()) & (lang != ""),
        F.when(
            (F.size(parts) == 2) & (F.length(region) == 2),
            F.concat(F.lower(F.element_at(parts, 1)), F.lit("-"), F.upper(region)),
        ).otherwise(F.lower(lang)),
    )
    valid = (
        F.when(lit_kind == "numeric", num_value.isNotNull())
        .when(lit_kind == "boolean", bool_value.isNotNull())
        .when(lit_kind == "date", epoch_day.isNotNull())
        .otherwise(F.lit(True))
    )
    return (
        triples.withColumn("lit_kind", lit_kind)
        .withColumn("num_value", num_value)
        .withColumn("bool_value", bool_value)
        .withColumn("epoch_day", epoch_day)
        .withColumn("lang_canonical", lang_canonical)
        .withColumn("valid", valid)
    )
