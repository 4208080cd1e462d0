"""SHACL shape INDUCTION: infer candidate shapes from the corpus itself.

The reference only parses shapes humans wrote (its whole pipeline is
shapes-as-input — src/Service/ShaclDocumentParser.php). Web-scale KG
construction needs the inverse too: given millions of extracted triples,
propose the shape each class ALREADY satisfies — per (class, predicate)
coverage, observed cardinality bounds, dominant node kind / datatype, and
an sh:in candidate when the value vocabulary is tiny. ``induced_to_ttl``
serializes the result as SHACL Turtle the engine's OWN parser/extractor
re-ingests, so an induced shape feeds straight back through the validator
(validate.py) as a data-quality regression gate: "new crawl batches must
keep satisfying the shape the old corpus established"
(round-trip-tested: tests/test_induction.py).

Scale design: everything is hash aggregates over strictly shrinking keys —
(subject, predicate) -> (class, predicate) -> done — with map-side partial
combine at each step; the class-membership table joins AFTER the
per-subject aggregation (post-agg cardinality, AQE broadcasts it when
small). The sh:in candidate list is an array_sort(collect_set) capped by
``max_in_values`` BEFORE collection via a conditional: values are only
collected for keys whose running distinct count can still qualify — a
two-pass plan (distinct-count pass, then a semi-joined collect pass over
qualifying keys only) so a high-cardinality predicate (e.g. schema:name)
never builds a giant array state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rdf.terms import RDF_TYPE, XSD_STRING

__all__ = ["induce_shapes", "induced_to_ttl", "shape_drift"]


def induce_shapes(
    triples: DataFrame,
    max_in_values: int = 5,
    min_members: int = 1,
) -> DataFrame:
    """Per (target_class, path): induced shape statistics.

    Output columns: target_class, path, n_members (class size), n_subjects
    (members asserting the path), coverage (share), min_count (0 when any
    member lacks the path, else the smallest observed per-subject
    cardinality), max_count, n_distinct_values, node_kind ('iri',
    'literal', or 'mixed' — the observed object kinds), in_values (sorted
    comma-joined value list when n_distinct_values <= ``max_in_values``,
    else NULL: an sh:in candidate), datatype (the single effective literal
    datatype when every object is a literal of ONE datatype — explicit, or
    xsd:string for plain literals, matching the validator's defaulting —
    else NULL), object_class + object_class_share (dominant class among
    TYPED IRI objects and its share of ALL IRI objects: share 1.0 means
    sh:class is safe to propose, untyped objects dilute it). Classes with
    fewer than ``min_members`` members are dropped (too little evidence
    to induce from).
    """
    types = (
        triples.filter(F.col("predicate") == RDF_TYPE)
        .select("subject", F.col("object.value").alias("target_class"))
        .distinct()
    )
    members = types.groupBy("target_class").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    if min_members > 1:
        members = members.filter(F.col("n_members") >= min_members)

    facts = triples.filter(F.col("predicate") != RDF_TYPE).select(
        "subject",
        F.col("predicate").alias("path"),
        F.col("object.value").alias("value"),
        F.col("object.kind").alias("kind"),
        # effective literal datatype, with the SAME defaulting the
        # validator's datatype check uses (validate.py o_dt: explicit
        # datatype, else xsd:string) so an induced sh:datatype is
        # guaranteed to round-trip through the executor without flagging
        # the corpus it was induced from
        F.when(
            F.col("object.kind") == "literal",
            F.coalesce(
                F.when(F.col("object.datatype") != "", F.col("object.datatype")),
                F.lit(XSD_STRING),
            ),
        ).alias("eff_dt"),
    )
    # per-subject cardinality first: the (class, path) agg then runs over
    # one row per (subject, path), not one per triple
    per_subj = facts.groupBy("subject", "path").agg(
        F.count(F.lit(1)).alias("card"),
        F.count_distinct("value").alias("n_vals"),
        F.max((F.col("kind") == "iri").cast("int")).alias("any_iri"),
        F.max((F.col("kind") != "iri").cast("int")).alias("any_lit"),
    )
    classed = per_subj.join(types, on="subject", how="inner")
    stats = classed.groupBy("target_class", "path").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.min("card").alias("observed_min"),
        F.max("card").alias("max_count"),
        F.max("any_iri").alias("any_iri"),
        F.max("any_lit").alias("any_lit"),
    )
    # distinct values per (class, path): aggregate the VALUE level
    # separately so the cardinality pass above never carries value strings
    val_stats = (
        facts.join(types, on="subject", how="inner")
        .groupBy("target_class", "path")
        .agg(
            F.count_distinct("value").alias("n_distinct_values"),
            # datatype uniformity (count_distinct ignores the NULL eff_dt
            # of non-literal rows) + how many objects are IRIs (the
            # sh:class share denominator)
            F.count_distinct("eff_dt").alias("n_distinct_dt"),
            F.max("eff_dt").alias("_any_dt"),
            F.sum((F.col("kind") == "iri").cast("long")).alias("n_iri_objs"),
        )
    )
    # sh:class evidence: typed IRI objects -> dominant object class per
    # (class, path) via a combinable max(struct) argmax; share is measured
    # against ALL IRI objects, so untyped objects dilute it and 1.0 really
    # means "safe to propose sh:class". Same shuffle key family as the
    # other aggs; the type relation joins on the OBJECT slot here.
    obj_classes = (
        facts.filter(F.col("kind") == "iri")
        .join(
            types.select(
                F.col("subject").alias("_obj_ent"),
                F.col("target_class").alias("object_class"),
            ),
            F.col("value") == F.col("_obj_ent"),
            "inner",
        )
        .join(types, on="subject", how="inner")
        .groupBy("target_class", "path", "object_class")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("target_class", "path")
        .agg(F.max(F.struct(F.col("n"), F.col("object_class"))).alias("_dom"))
    )
    # sh:in candidates: collect values ONLY for qualifying keys (semi-join
    # prefilter) so unbounded vocabularies never build array state
    small = val_stats.filter(F.col("n_distinct_values") <= max_in_values).select(
        "target_class", "path"
    )
    in_lists = (
        facts.join(types, on="subject", how="inner")
        .join(small, on=["target_class", "path"], how="left_semi")
        .groupBy("target_class", "path")
        .agg(
            F.array_join(F.array_sort(F.collect_set("value")), ",").alias(
                "in_values"
            )
        )
    )
    out = (
        stats.join(members, on="target_class", how="inner")
        .join(val_stats, on=["target_class", "path"], how="inner")
        .join(in_lists, on=["target_class", "path"], how="left")
        .join(obj_classes, on=["target_class", "path"], how="left")
        .select(
            "target_class",
            "path",
            "n_members",
            "n_subjects",
            (
                F.col("n_subjects").cast("double")
                / F.col("n_members").cast("double")
            ).alias("coverage"),
            F.when(F.col("n_subjects") < F.col("n_members"), F.lit(0))
            .otherwise(F.col("observed_min"))
            .cast("long")
            .alias("min_count"),
            "max_count",
            "n_distinct_values",
            F.when(
                (F.col("any_iri") == 1) & (F.col("any_lit") == 1), F.lit("mixed")
            )
            .when(F.col("any_iri") == 1, F.lit("iri"))
            .otherwise(F.lit("literal"))
            .alias("node_kind"),
            "in_values",
            F.when(
                (F.col("any_iri") == 0) & (F.col("n_distinct_dt") == 1),
                F.col("_any_dt"),
            ).alias("datatype"),
            F.col("_dom.object_class").alias("object_class"),
            F.when(
                F.col("n_iri_objs") > 0,
                F.round(
                    F.coalesce(F.col("_dom.n"), F.lit(0)) / F.col("n_iri_objs"), 6
                ),
            ).alias("object_class_share"),
        )
    )
    return out


def _ttl_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _get(row, field):
    """Field access tolerant of rows collected before the datatype /
    object-class columns existed (older persisted stats tables)."""
    try:
        return row[field]
    except (KeyError, ValueError):
        return None


def induced_to_ttl(induced_rows, strict_counts: bool = True) -> str:
    """Serialize induced shape statistics as SHACL Turtle the engine's OWN
    parser/extractor accepts — closing the loop: corpus -> induce ->
    shapes -> validate, so new crawl batches can be gated on "keep
    satisfying the shape the old corpus established".

    ``induced_rows``: collected rows of :func:`induce_shapes` (schema-level
    metadata — cardinality is bounded by the ontology, not the corpus, so
    the driver-side collect is legitimate like the SPARQL query-text
    collect). Per (class, path): sh:minCount (omitted when 0), sh:maxCount
    (omitted when ``strict_counts`` is False), sh:nodeKind sh:IRI /
    sh:Literal (omitted for mixed), and sh:in for qualifying small
    vocabularies (omitted for mixed kinds — the list would need per-value
    kinds).
    """
    by_class: dict[str, list] = {}
    for r in induced_rows:
        by_class.setdefault(r["target_class"], []).append(r)
    lines = [
        "@prefix sh: <http://www.w3.org/ns/shacl#> .",
        "",
    ]
    for n, cls in enumerate(sorted(by_class)):
        props = []
        for r in sorted(by_class[cls], key=lambda r: r["path"]):
            fields = [f"sh:path <{r['path']}>"]
            if r["min_count"] and r["min_count"] > 0:
                fields.append(f"sh:minCount {int(r['min_count'])}")
            if strict_counts:
                fields.append(f"sh:maxCount {int(r['max_count'])}")
            if r["node_kind"] == "iri":
                fields.append("sh:nodeKind sh:IRI")
                # sh:class only when EVERY IRI object carries the dominant
                # class (share 1.0) — the validator executes sh:class as a
                # typing join, so anything weaker would flag the corpus the
                # shape was induced from
                if (
                    _get(r, "object_class") is not None
                    and _get(r, "object_class_share") == 1.0
                ):
                    fields.append(f"sh:class <{r['object_class']}>")
            elif r["node_kind"] == "literal":
                fields.append("sh:nodeKind sh:Literal")
                if _get(r, "datatype") is not None:
                    fields.append(f"sh:datatype <{r['datatype']}>")
            if r["in_values"] is not None and r["node_kind"] != "mixed":
                vals = r["in_values"].split(",")
                if r["node_kind"] == "iri":
                    spelled = " ".join(f"<{v}>" for v in vals)
                else:
                    spelled = " ".join(f'"{_ttl_escape(v)}"' for v in vals)
                fields.append(f"sh:in ( {spelled} )")
            props.append("    sh:property [ " + " ; ".join(fields) + " ]")
        lines.append(f"<urn:induced:shape:{n}>")
        lines.append("    a sh:NodeShape ;")
        lines.append(f"    sh:targetClass <{cls}> ;")
        lines.append(" ;\n".join(props) + " .")
        lines.append("")
    return "\n".join(lines)


def shape_drift(
    old_triples: DataFrame, new_triples: DataFrame, max_in_values: int = 5
) -> DataFrame:
    """Schema-drift monitor between two crawl snapshots: induce the shape
    statistics of BOTH corpora and diff them per (target_class, path) —
    the alert a KG operator wants when a source site redesigns ("Product
    pages stopped carrying price", "author became multi-valued", "ids
    turned from IRIs into literals").

    change ∈ added (path first seen in the new snapshot) / removed /
    changed (coverage — rounded to 6 — min/max cardinality, node kind, or
    induced datatype moved) / stable. Both induced tables are
    schema-sized, so the full-outer join is trivially broadcastable; all
    corpus-scale work happens inside the two :func:`induce_shapes` calls.

    Output: target_class, path, change, then old/new pairs of coverage,
    min_count, max_count, node_kind, datatype.
    """
    cols = ["coverage", "min_count", "max_count", "node_kind", "datatype"]

    def side(t, tag):
        ind = induce_shapes(t, max_in_values=max_in_values)
        sel = [F.col("target_class"), F.col("path")]
        for c in cols:
            v = F.round(F.col(c), 6) if c == "coverage" else F.col(c)
            sel.append(v.alias(f"{c}_{tag}"))
        return ind.select(*sel).withColumn(f"_present_{tag}", F.lit(True))

    o, n = side(old_triples, "old"), side(new_triples, "new")
    joined = o.join(n, ["target_class", "path"], "full_outer")
    differs = F.lit(False)
    for c in cols:
        differs = differs | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    change = (
        F.when(F.col("_present_old").isNull(), F.lit("added"))
        .when(F.col("_present_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("stable"))
    )
    out_cols = ["target_class", "path", change.alias("change")]
    for c in cols:
        out_cols += [f"{c}_old", f"{c}_new"]
    return joined.select(*out_cols)
