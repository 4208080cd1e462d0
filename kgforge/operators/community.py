"""Synchronous label propagation (community detection), Raghavan et al. 2007.

Deterministic SYNCHRONOUS variant: every node simultaneously adopts the most
frequent label among its neighbors, ties broken by smallest label — so the
result is a pure function of the graph and the iteration count (the
classical asynchronous LPA is order-dependent and unreproducible, useless
for an oracle or a resumable pipeline). Labels start as the node's own id;
after k rounds, densely connected hosts share a label.

Scale: each round is one equi-join (labels are re-sent along edges) + one
combinable count aggregate + one combinable min(struct(-count, label))
argmax — the same no-window argmax idiom as fusion.py, so hot nodes
(skewed in-degree) collapse map-side. Labels persist each round and the
lineage is localCheckpointed so k rounds never recompute round 1. Rounds
are a fixed small k (LPA converges in a handful of sweeps; fixed k keeps
the job deterministic and the oracle unrollable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["label_propagation"]


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, label) after `iterations` synchronous LPA rounds over the
    undirected view of `edges`. Isolated nodes don't occur (every node has
    at least the edge that introduced it)."""
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    und = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .unionByName(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
        .distinct()
    )
    labels = und.select(F.col("_s").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for i in range(iterations):
        msgs = und.join(labels, und["_s"] == labels["node"]).select(
            F.col("_d").alias("node"), "label"
        )
        counts = msgs.groupBy("node", "label").agg(F.count("*").alias("_c"))
        best = counts.groupBy("node").agg(
            F.min(F.struct((-F.col("_c")).alias("nc"), F.col("label").alias("l"))).alias("_b")
        )
        labels = best.select("node", F.col("_b.l").alias("label"))
        if (i + 1) % 3 == 0 and i + 1 < iterations:
            labels = labels.localCheckpoint(eager=False)
    return labels
