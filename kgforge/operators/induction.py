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

from ..rdf.terms import RDF_TYPE

__all__ = ["induce_shapes", "induced_to_ttl"]


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
    else NULL: an sh:in candidate). Classes with fewer than ``min_members``
    members are dropped (too little evidence to induce from).
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
        .agg(F.count_distinct("value").alias("n_distinct_values"))
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
        )
    )
    return out


def _ttl_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


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
            elif r["node_kind"] == "literal":
                fields.append("sh:nodeKind sh:Literal")
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
