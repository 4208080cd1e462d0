"""F1-F3 derived APIs as pure Spark column expressions over the
PROPERTY_SHAPE_STRUCT (reference: ShaclPropertyAnalyzer.php:90-215).

These are the engine's equivalents of the reference's three public
post-parse helpers, usable directly in selects over the shapes DataFrame:

    shapes.select(F.explode("property_shapes").alias("ps")) \
          .select(range_from_shape_col("ps"), property_type_col("ps"),
                  cardinality_col("ps"))
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..rdf.terms import SH

_OBJECT_NODE_KINDS = [SH + "IRI", SH + "BlankNode", SH + "BlankNodeOrIRI"]


def _inline_ranges(items: Column) -> Column:
    """classes ∪ datatypes from an array<inline-shape struct> column."""
    return F.flatten(
        F.transform(
            F.coalesce(items, F.array()),
            lambda it: F.array_compact(F.array(it["class"], it["datatype"])),
        )
    )


def range_from_shape_col(ps) -> Column:
    """F1: datatype ∪ class ∪ logical classes/datatypes, order-preserving
    dedup (ShaclPropertyAnalyzer.php:90-131)."""
    ps = F.col(ps) if isinstance(ps, str) else ps
    parts = F.concat(
        F.array_compact(F.array(ps["datatype"], ps["class"])),
        _inline_ranges(ps["sh_or"]),
        _inline_ranges(ps["sh_and"]),
        _inline_ranges(ps["sh_xone"]),
        F.array_compact(F.array(ps["sh_not"]["class"], ps["sh_not"]["datatype"])),
    )
    return F.array_distinct(parts).alias("ranges")


def _inline_has_object(items: Column) -> Column:
    return F.exists(
        F.coalesce(items, F.array()),
        lambda it: it["class"].isNotNull()
        | it["node"].isNotNull()
        | it["nodeKind"].isin(_OBJECT_NODE_KINDS),
    )


def property_type_col(ps) -> Column:
    """F2: 'object' | 'datatype'. Precedence preserved: class/node/nodeKind
    beat datatype; explicit datatype beats logical hints
    (ShaclPropertyAnalyzer.php:138-186)."""
    ps = F.col(ps) if isinstance(ps, str) else ps
    not_obj = (
        ps["sh_not"]["class"].isNotNull()
        | ps["sh_not"]["node"].isNotNull()
        | ps["sh_not"]["nodeKind"].isin(_OBJECT_NODE_KINDS)
    )
    return (
        F.when(ps["class"].isNotNull() | ps["node"].isNotNull(), F.lit("object"))
        .when(ps["nodeKind"].isin(_OBJECT_NODE_KINDS), F.lit("object"))
        .when(ps["datatype"].isNotNull(), F.lit("datatype"))
        .when(
            _inline_has_object(ps["sh_or"])
            | _inline_has_object(ps["sh_and"])
            | _inline_has_object(ps["sh_xone"]),
            F.lit("object"),
        )
        .when(F.coalesce(not_obj, F.lit(False)), F.lit("object"))
        .otherwise(F.lit("datatype"))
        .alias("property_type")
    )


def cardinality_col(ps) -> Column:
    """F3: '1' | '1..3' | '1..n' | '0..1' | NULL
    (ShaclPropertyAnalyzer.php:193-215)."""
    ps = F.col(ps) if isinstance(ps, str) else ps
    mn, mx = ps["minCount"], ps["maxCount"]
    return (
        F.when(mn.isNull() & mx.isNull(), F.lit(None).cast("string"))
        .when(mn.isNotNull() & mx.isNotNull() & (mn == mx), mn)
        .when(mn.isNotNull() & mx.isNotNull(), F.concat(mn, F.lit(".."), mx))
        .when(mn.isNotNull(), F.concat(mn, F.lit("..n")))
        .otherwise(F.concat(F.lit("0.."), mx))
        .alias("cardinality")
    )
