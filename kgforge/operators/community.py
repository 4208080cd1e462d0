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
    # iterative-operator idiom (same as the BFS/CC loops): the edge view
    # is referenced by EVERY unrolled round, and each round's plan nests
    # the previous round's — without eager checkpoints the upstream edge
    # producer (often a parse-derived link extraction) re-executes once
    # per round per branch at action time. One edge-sized materialization
    # + one node-sized one per round replaces that.
    und = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .unionByName(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
        .distinct()
        .localCheckpoint(eager=True)
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
        if i + 1 < iterations:
            labels = labels.localCheckpoint(eager=True)
    return labels


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity Q of a partition over the UNDIRECTED simple
    graph (Newman & Girvan 2004): Q = Σ_c (e_c/m − (D_c/2m)²) — the
    standard "was this community detection any good" number. Returns ONE
    row (n_edges, n_communities, intra_edges, modularity).

    Exactness regime: the sum is computed as ONE exact integer numerator
    Σ_c (4·m·e_c − D_c²) over decimal(38,0) (DuckDB: int128) and divided
    by 4m² in a single int→double cast + IEEE division — no
    order-dependent float accumulation, so the oracle replays Q
    bit-for-bit. Edges normalize to a distinct a<b set (self-loops
    dropped); communities are counted over nodes that carry degree.

    Scale shape: one distinct on the edge set, two node-keyed joins to
    label endpoints, then everything is community-keyed combinable
    aggregation collapsing to ONE row — no windows, no collects; m
    travels as a 1-row crossJoin-broadcast, never a driver value.
    """
    # both inputs are read three times below (m / endpoint labels / degree
    # side); an eager localCheckpoint cuts the upstream lineage ONCE so an
    # expensive producer (an LPA fixpoint, a parse-derived edge list) is
    # not re-executed per branch — the same idiom as the BFS/CC operators
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    mrow = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    lab = assign.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("community")
    ).localCheckpoint(eager=True)
    la = lab.select(F.col("node").alias("a"), F.col("community").alias("la"))
    lb = lab.select(F.col("node").alias("b"), F.col("community").alias("lb"))
    labeled = e.join(la, "a").join(lb, "b")
    ec = (
        labeled.filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    dc = (
        deg.join(lab, "node")
        .groupBy("community")
        .agg(F.sum("d").cast("bigint").alias("d_c"))
    )
    terms = dc.join(ec, "community", "left").select(
        "community",
        F.coalesce("e_c", F.lit(0)).cast("bigint").alias("e_c"),
        "d_c",
    )
    DEC = "decimal(38,0)"
    agg = terms.crossJoin(F.broadcast(mrow)).agg(
        F.sum(
            F.lit(4).cast(DEC) * F.col("m").cast(DEC) * F.col("e_c").cast(DEC)
            - F.col("d_c").cast(DEC) * F.col("d_c").cast(DEC)
        ).alias("num"),
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.sum("e_c").cast("bigint").alias("intra_edges"),
        F.first("m").alias("m"),
    )
    denom = (
        F.lit(4).cast(DEC) * F.col("m").cast(DEC) * F.col("m").cast(DEC)
    ).cast("double")
    return agg.select(
        F.col("m").alias("n_edges"),
        "n_communities",
        "intra_edges",
        F.when(
            F.col("m") > 0,
            F.round(F.col("num").cast("double") / denom, 6),
        ).alias("modularity"),
    )
