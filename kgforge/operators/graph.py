"""Graph analytics over DataFrame edge lists: weighted PageRank.

The KG pipeline's canonical graph (and any web-derived graph: link graphs,
user-interaction graphs) needs importance scoring at corpus scale. This is
the standard power-iteration PageRank expressed as pure DataFrame ops so
Catalyst/AQE manage the physical plan:

- one shuffle join per iteration (ranks keyed by node joined to the
  transition table keyed by src) + one dst-keyed aggregation — both
  map-side-combined, skew split by AQE;
- the normalized transition table is built once and persisted (reused by
  every iteration);
- NO dangling-node scalar collect per iteration: callers pass (or build via
  ``symmetrize=True``) an edge set where every node has out-degree >= 1,
  which makes the per-iteration dangling-mass reduction (a driver round
  trip that serializes the loop) unnecessary. Sanity-checked cheaply by
  construction, not by a job.
- iterations are unrolled lazily (one action at the end); for deep
  iteration counts at 100 TB, localCheckpoint every ~5 iterations to cut
  lineage — fixed iteration counts here are small (3-10).

At 10^12-edge scale each iteration is exactly one co-partitioned shuffle;
ranks and edges can be pre-bucketed by node for shuffle-free reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalize_edges(edges: DataFrame, symmetrize: bool = False) -> DataFrame:
    """(src, dst, weight) -> (src, dst, p) row-stochastic transition table:
    p = weight / total outgoing weight of src. With ``symmetrize`` every
    edge is mirrored first, which guarantees out-degree >= 1 for every
    node (no dangling mass — see module docstring)."""
    e = edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
    e = e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    out = e.groupBy("src").agg(F.sum("weight").alias("wout"))
    return e.join(out, "src").select(
        "src", "dst", (F.col("weight") / F.col("wout")).alias("p")
    )


def pagerank(
    transitions: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Transition table (src, dst, p) -> (node, pr) after a FIXED number of
    power iterations from the uniform start vector.

    pr_{k+1}(v) = (1-d)/n + d * sum_{(u,v)} pr_k(u) * p(u,v)

    Requires every node to have out-degree >= 1 (use ``normalize_edges``
    with symmetrize=True, or a graph known to be dangling-free); the
    formula above then conserves probability mass exactly, and no
    per-iteration driver reduction is needed.
    """
    t = transitions.persist()
    nodes = (
        t.select(F.col("src").alias("node"))
        .union(t.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            t.join(ranks, t["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("mass"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("mass", F.lit(0.0))).alias("pr"),
            )
        )
    # t/nodes stay persisted: the returned plan references them in every
    # unrolled iteration — the caller's single action fills each cache on
    # first scan and every later iteration hits it. (An unpersist here
    # would run BEFORE that action and silently disable both caches.)
    return ranks


def user_event_graph(events: DataFrame) -> DataFrame:
    """events -> weighted bipartite edge list user -> event_type (edge
    weight = interaction count), node ids namespaced so the two sides
    can't collide. The symmetric closure of this graph is the standard
    input for co-occurrence importance scoring."""
    return (
        events.groupBy("user_id", "event_type")
        .agg(F.count("*").cast("double").alias("weight"))
        .select(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
            F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
            "weight",
        )
    )
