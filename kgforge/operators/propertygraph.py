"""RDF -> labeled-property-graph (LPG) export.

Downstream graph stacks (Neo4j/openCypher, GraphFrames, most graph-ML
tooling) consume NODES and RELATIONSHIPS tables, not triples. The
standard projection (the one neosemantics and the Amazon Neptune RDF/LPG
bridge use):

- rdf:type IRI objects -> node LABELS (not edges, not nodes);
- literal-object triples -> node PROPERTIES;
- IRI/bnode-object triples (minus rdf:type) -> RELATIONSHIPS, typed by
  predicate;
- every subject and every relationship endpoint is a node — including
  object-only nodes (a bulk importer needs both endpoints present).

Determinism: labels are the sorted-distinct '|'-join; properties are
sorted-distinct "pred=value" pairs ';'-joined — pure codegen
(collect_set + array_sort + array_join), no Python, oracle-replayable.

Scale shape: one corpus scan split by object kind (three filters over
the same shuffle-free projection), one node-keyed aggregation for
labels/properties, one distinct for relationships, and one union+distinct
for the node id space. Everything is keyed on node/edge — the LPG tables
partition exactly like the S/P/O sink tables they sit beside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

__all__ = ["to_property_graph"]


def to_property_graph(
    triples: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Triples -> (nodes, relationships).

    nodes: (node_id, labels, properties, n_props, out_degree) — labels =
    sorted '|'-joined rdf:type IRIs, properties = sorted ';'-joined
    "pred=value" literal pairs, out_degree = distinct outgoing
    relationships. relationships: (src, rel_type, dst), distinct.
    """
    base = triples.filter(F.col("subject").isNotNull()).select(
        "subject", "predicate", "object"
    )
    labels = (
        base.filter(
            (F.col("predicate") == RDF_TYPE)
            & (F.col("object.kind") == "iri")
        )
        .select("subject", F.col("object.value").alias("label"))
        .groupBy("subject")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("label")), "|"
            ).alias("labels")
        )
    )
    props = (
        base.filter(F.col("object.kind") == "literal")
        .select(
            "subject",
            F.concat_ws(
                "=", "predicate", F.col("object.value")
            ).alias("kv"),
        )
        .groupBy("subject")
        .agg(
            F.array_sort(F.collect_set("kv")).alias("_ps"),
        )
        .select(
            "subject",
            F.array_join("_ps", ";").alias("properties"),
            F.size("_ps").cast("bigint").alias("n_props"),
        )
    )
    rels = (
        base.filter(
            (F.col("predicate") != RDF_TYPE)
            & (F.col("object.kind").isin("iri", "bnode"))
        )
        .select(
            F.col("subject").alias("src"),
            F.col("predicate").alias("rel_type"),
            F.col("object.value").alias("dst"),
        )
        .distinct()
    )
    out_deg = rels.groupBy(F.col("src").alias("subject")).agg(
        F.count(F.lit(1)).cast("bigint").alias("out_degree")
    )
    ids = (
        base.select(F.col("subject").alias("node_id"))
        .unionAll(rels.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    nodes = (
        ids.join(labels.withColumnRenamed("subject", "node_id"), "node_id", "left")
        .join(props.withColumnRenamed("subject", "node_id"), "node_id", "left")
        .join(out_deg.withColumnRenamed("subject", "node_id"), "node_id", "left")
        .select(
            "node_id",
            F.coalesce("labels", F.lit("")).alias("labels"),
            F.coalesce("properties", F.lit("")).alias("properties"),
            F.coalesce("n_props", F.lit(0)).cast("bigint").alias("n_props"),
            F.coalesce("out_degree", F.lit(0)).cast("bigint").alias("out_degree"),
        )
    )
    return nodes, rels
