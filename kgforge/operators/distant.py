"""Distant-supervision relation labeling (Mintz et al. 2009).

The standard way to mint relation-extraction training data from a KG +
corpus without human labels: every document that co-mentions an entity
pair becomes a training candidate for that pair; the pair's KG relations
(if any) label it positive, pairs absent from the KG are the negative
pool. Generalizes parser-shacl's per-file extraction scope
(src/ShaclParser.php parses one document; it never joins documents
against a fact table) into the corpus x KG join a training-data pipeline
needs.

Scale shape: co-mention pairs come from ``graph.comention_pairs`` (one
doc-keyed agg + codegen pair expansion, fan-out capped per doc — never a
doc-keyed self-join); facts are normalized to unordered keys ONCE
(least/greatest + direction flag) so the label join is a single
hash-equi-join on (entity_a, entity_b) — no OR-condition join, which
would force a nested-loop. Multiple relations between a pair aggregate
into a sorted relation list before the join (facts-table-sized agg), so
output stays one row per (doc, pair) with a deterministic label column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalize_facts(
    facts: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Directed facts (subj, pred, obj) -> one row per unordered pair:
    (entity_a, entity_b, relations) with entity_a < entity_b and
    ``relations`` the sorted distinct list of 'pred' / 'pred^-1' strings
    ('^-1' marks facts whose subject is entity_b — direction survives
    normalization). Self-loops (subj = obj) are dropped: a co-mention
    pair never has equal members."""
    lo = F.least(F.col(subj_col), F.col(obj_col))
    hi = F.greatest(F.col(subj_col), F.col(obj_col))
    rel = F.when(
        F.col(subj_col) < F.col(obj_col), F.col(pred_col)
    ).otherwise(F.concat(F.col(pred_col), F.lit("^-1")))
    return (
        facts.filter(F.col(subj_col) != F.col(obj_col))
        .select(lo.alias("entity_a"), hi.alias("entity_b"), rel.alias("rel"))
        .groupBy("entity_a", "entity_b")
        .agg(F.array_sort(F.collect_set("rel")).alias("relations"))
    )


def distant_supervision_pairs(
    mentions: DataFrame,
    facts: DataFrame,
    doc_col: str = "url",
    entity_col: str = "entity_id",
    max_entities_per_doc: int | None = 200,
    positives_only: bool = False,
) -> DataFrame:
    """(doc, entity_a, entity_b, relations, label): every co-mentioned
    unordered entity pair per document, labeled positive when the KG
    holds at least one fact between the pair (``relations`` then carries
    the sorted relation list, direction-marked), negative otherwise
    (relations = [] — the hard-negative pool for RE training; sample it
    downstream with sampling.stratified_sample). ``positives_only``
    switches the label join from left to inner for pipelines that only
    want supervised mentions."""
    from .graph import comention_pairs

    pairs = comention_pairs(mentions, doc_col, entity_col, max_entities_per_doc)
    nf = normalize_facts(facts)
    how = "inner" if positives_only else "left"
    out = pairs.join(nf, ["entity_a", "entity_b"], how)
    return out.select(
        doc_col,
        "entity_a",
        "entity_b",
        F.coalesce("relations", F.array().cast("array<string>")).alias("relations"),
        F.col("relations").isNotNull().alias("label")
        if not positives_only
        else F.lit(True).alias("label"),
    )
