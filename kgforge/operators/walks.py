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

__all__ = ["node2vec_walks", "random_walks"]

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


def _uniform01(*cols) -> F.Column:
    h = F.conv(F.substring(F.md5(F.concat_ws(_SEP, *cols)), 1, 15), 16, 10).cast(
        "long"
    )
    return (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))


def _pow_exact(u, e: float):
    """u^e through exactly-rounded IEEE ops where possible: e in
    {0.5, 1, 2} uses sqrt / identity / multiply (all correctly rounded,
    so Spark and any SQL engine bit-agree); other exponents fall back to
    pow (near-correctly-rounded — document the oracle rounding)."""
    if e == 1.0:
        return u
    if e == 2.0:
        return u * u
    if e == 0.5:
        return F.sqrt(u)
    return F.pow(u, F.lit(float(e)))


def node2vec_walks(
    edges: DataFrame,
    num_walks: int = 2,
    walk_length: int = 3,
    p: float = 2.0,
    q: float = 0.5,
    seed: int = 13,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Second-order biased walks (Grover & Leskovec 2016): from (prev,
    cur), candidate x weighs 1/p if x = prev (return), 1 if x is a
    neighbor of prev (BFS-ish), 1/q otherwise (DFS-ish). The weighted
    pick is the Efraimidis-Spirakis argmax — key(x) = u_x^(1/w_x) with
    u_x a per-candidate md5 uniform — so walks stay DETERMINISTIC and
    engine-replayable like ``random_walks``. With p in {2} and q in
    {0.5} the exponents hit exactly-rounded IEEE paths (u*u / sqrt(u)),
    making the oracle comparison bitwise.

    Scale: step t joins the walk state to the neighbor table (fan-out =
    degree, AQE-skew territory) and reduces back with ONE combinable
    min(struct) argmax per walk; the prev-neighbor test is an equi-join
    against the (deduped, persisted) edge set on (prev, x) — never an
    OR-join or a collected adjacency. State stays |V|*num_walks rows.
    Step 1 has no prev and picks uniformly (exactly ``random_walks``'s
    arithmetic).
    """
    if walk_length < 1 or num_walks < 1:
        raise ValueError("walk_length and num_walks must be >= 1")
    und = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .unionByName(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
        .distinct()
        # eager: read every step (neighbor expansion + prev-adjacency
        # test); a lazy persist would let the single final action race
        # the upstream lineage across tasks before the cache fills
        .localCheckpoint(eager=True)
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
    )
    # step 1: uniform (no prev) — random_walks' exact arithmetic
    state = (
        state.join(deg, state["start"] == deg["_s"])
        .withColumn(
            "_pick",
            _hash_mod(
                F.col("start"),
                F.col("walk_id").cast("string"),
                F.lit("1"),
                F.lit(str(seed)),
                mod_col=F.col("_deg"),
            ),
        )
        .drop("_s", "_deg")
    )
    state = state.join(
        nbr, (state["start"] == nbr["_s"]) & (state["_pick"] == nbr["_i"])
    ).select(
        "start",
        "walk_id",
        F.col("start").alias("prev"),
        F.col("_d").alias("cur"),
        F.concat_ws(">", "start", "_d").alias("path"),
    )
    adj = und.select(F.col("_s").alias("_pa"), F.col("_d").alias("_px"), F.lit(True).alias("_adj"))
    for t in range(2, walk_length + 1):
        cand = state.join(nbr, state["cur"] == nbr["_s"]).select(
            "start", "walk_id", "prev", "cur", "path", F.col("_d").alias("_x")
        )
        cand = cand.join(
            adj,
            (cand["prev"] == adj["_pa"]) & (cand["_x"] == adj["_px"]),
            "left",
        )
        u = _uniform01(
            F.col("start"),
            F.col("walk_id").cast("string"),
            F.lit(str(t)),
            F.lit(str(seed)),
            F.col("_x"),
        )
        key = (
            F.when(F.col("_x") == F.col("prev"), _pow_exact(u, p))
            .when(F.col("_adj").isNotNull(), _pow_exact(u, 1.0))
            .otherwise(_pow_exact(u, q))
        )
        best = (
            cand.groupBy("start", "walk_id", "cur", "path")
            .agg(F.min(F.struct((-key).alias("nk"), F.col("_x").alias("x"))).alias("_b"))
        )
        state = best.select(
            "start",
            "walk_id",
            F.col("cur").alias("prev"),
            F.col("_b.x").alias("cur"),
            F.concat_ws(">", "path", "_b.x").alias("path"),
        )
    return state.select("start", "walk_id", "path")
