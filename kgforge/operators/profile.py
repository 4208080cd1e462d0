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


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def schema_graph(triples: DataFrame, untyped: str = "urn:kgforge:untyped") -> DataFrame:
    """Class-level schema graph (VoID-linkset style): roll the instance
    triples up to (subject_type, predicate, object_type, n) edges between
    CLASSES, the one-page map of what the corpus KG actually contains.

    Type resolution: rdf:type assertions anywhere in the corpus type a
    term globally; untyped IRI/bnode terms fall into ``untyped``. Literal
    objects roll up as 'literal:<datatype>' (plain strings default to
    xsd:string per RDF 1.1). rdf:type triples themselves are the rollup's
    input, not its edges, so they are excluded. A multi-typed term
    contributes one edge per type pair — standard linkset semantics.

    Scale shape: the type side is vocabulary-sized after its dedup
    (distinct (term, class)), so BOTH resolution joins broadcast when the
    class assertion set fits (AQE decides); the rollup itself is one
    map-side-combinable agg whose key space is |classes|^2 *
    |predicates| — schema-sized, not corpus-sized. The reference parser
    has no instance data at all (shapes only); this is the corpus-scale
    report its sh:targetClass world implies.
    """
    types = (
        triples.filter(F.col("predicate") == RDF_TYPE)
        .select(F.col("subject").alias("term"), F.col("object.value").alias("cls"))
        .distinct()
    )
    inst = triples.filter(F.col("predicate") != RDF_TYPE)
    st = types.select(F.col("term").alias("subject"), F.col("cls").alias("subject_type"))
    ot = types.select(F.col("term").alias("_ov"), F.col("cls").alias("_ocls"))
    lit_type = F.concat(
        F.lit("literal:"),
        F.coalesce(
            F.col("object.datatype"),
            F.when(
                F.col("object.lang").isNotNull() & (F.col("object.lang") != ""),
                F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"),
            ).otherwise(F.lit("http://www.w3.org/2001/XMLSchema#string")),
        ),
    )
    resolved = (
        inst.join(st, "subject", "left")
        .join(ot, inst["object.value"] == F.col("_ov"), "left")
        .select(
            F.coalesce(F.col("subject_type"), F.lit(untyped)).alias("subject_type"),
            "predicate",
            F.when(F.col("object.kind") == "literal", lit_type)
            .otherwise(F.coalesce(F.col("_ocls"), F.lit(untyped)))
            .alias("object_type"),
        )
    )
    return resolved.groupBy("subject_type", "predicate", "object_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def key_skew(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Join-key skew report: the pre-flight diagnostic every big shuffle
    wants. For the top_n heaviest values of ``key_col``: (key, n_rows,
    share, skew_factor, suggested_salt) where share = n_rows/total,
    skew_factor = n_rows / mean-rows-per-key, and suggested_salt =
    ceil(skew_factor) clamped to >= 1 — the salting fan-out that would
    level that key to the average (rounds to 6 on the ratios).

    Scale shape: one map-side-combinable count agg keyed by the key, one
    one-row global agg broadcast-crossed back, TakeOrderedAndProject for
    the top_n — no window over the full key space, no collect. Run it on
    the build side of a planned join; skew_factor >~ 10 on a key that
    also dominates the probe side is the AQE-skew-join / salting signal.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).persist()
    totals = counts.agg(
        F.sum("n_rows").cast("double").alias("_tot"),
        F.count(F.lit(1)).cast("double").alias("_nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col("key").cast("string").alias("key"),
            "n_rows",
            F.round(F.col("n_rows") / F.col("_tot"), 6).alias("share"),
            F.round(F.col("n_rows") * F.col("_nkeys") / F.col("_tot"), 6).alias(
                "skew_factor"
            ),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("n_rows") * F.col("_nkeys") / F.col("_tot")),
            ).cast("bigint").alias("suggested_salt"),
        )
        .orderBy(F.desc("n_rows"), "key")
        .limit(top_n)
    )


def characteristic_sets(
    triples: DataFrame, include_bnodes: bool = False
) -> DataFrame:
    """Characteristic sets (Neumann & Moerkotte, ICDE 2011): group
    subjects by their DISTINCT sorted predicate set — the structure
    RDF stores keep for join-cardinality estimation, and a one-table
    summary of how heterogeneous the emitted graph's entity shapes are
    (the empirical cousin of the induced SHACL shapes). Returns
    (cset, n_subjects, n_triples) with the predicate set '|'-joined in
    sorted order.

    Blank-node subjects are EXCLUDED by default: their '_:' labels are
    document-scoped, so grouping them by bare label across documents
    would conflate unrelated nodes (skolemize first if you need them).

    Scale shape: two stacked combinable hash aggregations — subject-keyed
    (collect_set bounded by the per-subject predicate vocabulary, tens
    not millions), then cset-keyed on a schema-sized relation. Nothing
    else shuffles.
    """
    base = triples.filter(F.col("subject").isNotNull())
    if not include_bnodes:
        base = base.filter(~F.col("subject").startswith("_:"))
    per_subj = base.groupBy("subject").agg(
        F.array_join(F.array_sort(F.collect_set("predicate")), "|").alias(
            "cset"
        ),
        F.count(F.lit(1)).cast("bigint").alias("_nt"),
    )
    return per_subj.groupBy("cset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
        F.sum("_nt").cast("bigint").alias("n_triples"),
    )
