"""Corpus-level KG profiling: VoID-style property-partition statistics.

The W3C VoID vocabulary (public spec, https://www.w3.org/TR/void/)
describes a dataset by its *property partitions*: per predicate, how many
triples, how many documents carry it, the per-document cardinality
envelope, and what kinds of objects it takes. This is the first report a
KG-construction run produces — it tells curation which predicates are
mis-extracted (a literal showing up on an IRI-valued predicate, a
supposedly single-valued predicate with max_per_doc 40) before any
downstream join runs.

Reference parity note: the reference (parser-shacl) reports per-file
resource counts only (`src/ShaclParser.php` result metadata); the
corpus-level partition rollup is the Spark-native generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def predicate_profile(triples: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-predicate VoID property-partition statistics.

    Output columns: predicate, n (total triples), n_docs (documents
    asserting it), max_per_doc (largest per-document cardinality),
    obj_kinds (sorted comma-joined distinct object kinds — 'iri',
    'literal', 'bnode'; more than one entry flags a mixed-kind predicate,
    usually an extraction bug).

    Scale shape: two stacked map-side-combinable aggregations — the first
    keyed (url, predicate) so the second runs over one row per document
    per predicate, never per triple; the kind set rides along as a
    collect_set bounded by 3 distinct values. No windows, no collects:
    the result is predicate-cardinality-sized (vocabulary rows, not
    corpus rows), so it broadcasts anywhere downstream.
    """
    per_doc = triples.groupBy(url_col, "predicate").agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_set(F.col("object.kind")).alias("kinds"),
    )
    return per_doc.groupBy("predicate").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("n").cast("bigint").alias("max_per_doc"),
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_set("kinds")))), ","
        ).alias("obj_kinds"),
    )
