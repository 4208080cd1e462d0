"""Deterministic random-walk generation (DeepWalk/node2vec corpus prep).

Graph-embedding models train on random-walk "sentences"; generating the walk
corpus over a billion-edge graph is a data-pipeline job. Walks here are
PSEUDO-random and fully deterministic: step t of walk w from start node s
picks neighbor index md5(s ␟ w ␟ t ␟ seed) mod degree(current) — uniform
over the current node's neighbors, reproducible across runs/engines
(md5-hex→int64 is the repo's cross-engine hash convention), and therefore
resumable and oracle-checkable, unlike rand()-seeded walks whose results
depend on partition layout.

Scale:
- The neighbor index (per-node 0-based rank of each neighbor) is a window
  partitioned BY NODE — partition size = degree, never a global sort.
- Each step is two equi-joins keyed by the current node (degree lookup +
  indexed-neighbor lookup); walk_length is a small constant, so the whole
  job is O(walk_length) joins with state size |V|·num_walks rows.
- Hot nodes (high in-walk traffic) are read-side skew on the neighbor
  table — AQE skew-join territory, no driver involvement anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["random_walks"]

_SEP = "\x1f"


def _hash_mod(*cols, mod_col):
    h = F.conv(F.substring(F.md5(F.concat_ws(_SEP, *cols)), 1, 15), 16, 10).cast("long")
    return F.pmod(h, mod_col)


def random_walks(
    edges: DataFrame,
    num_walks: int = 2,
    walk_length: int = 3,
    seed: int = 13,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One row per (start node, walk_id): the walk as a '>'-joined path
    string over the undirected view of `edges`. Every node starts
    `num_walks` walks of exactly `walk_length` steps (undirected graphs
    have no dead ends)."""
    if walk_length < 1 or num_walks < 1:
        raise ValueError("walk_length and num_walks must be >= 1")
    und = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .unionByName(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
        .distinct()
    )
    w_nbr = Window.partitionBy("_s").orderBy("_d")
    nbr = und.select(
        "_s", "_d", (F.row_number().over(w_nbr) - 1).cast("long").alias("_i")
    )
    deg = und.groupBy("_s").agg(F.count("*").cast("long").alias("_deg"))

    state = (
        und.select(F.col("_s").alias("start"))
        .distinct()
        .select(
            "start",
            F.explode(F.sequence(F.lit(1), F.lit(num_walks))).alias("walk_id"),
        )
        .withColumn("walk_id", F.col("walk_id").cast("long"))
        .withColumn("_cur", F.col("start"))
        .withColumn("path", F.col("start"))
    )
    for t in range(1, walk_length + 1):
        state = (
            state.join(deg, state["_cur"] == deg["_s"])
            .withColumn(
                "_pick",
                _hash_mod(
                    F.col("start"),
                    F.col("walk_id").cast("string"),
                    F.lit(str(t)),
                    F.lit(str(seed)),
                    mod_col=F.col("_deg"),
                ),
            )
            .drop("_s", "_deg")
        )
        state = (
            state.join(
                nbr,
                (state["_cur"] == nbr["_s"]) & (state["_pick"] == nbr["_i"]),
            )
            .select(
                "start",
                "walk_id",
                F.col("_d").alias("_cur"),
                F.concat_ws(">", "path", "_d").alias("path"),
            )
        )
    return state.select("start", "walk_id", "path")
