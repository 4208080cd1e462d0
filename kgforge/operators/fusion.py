"""Knowledge fusion: resolve conflicting assertions into one fact per
(subject, predicate), and diff two KG snapshots.

The reference parses each document in isolation and never reconciles what
different pages claim about the same resource (its only cross-assertion
rule is the shape-merge "later wins", src/Service/ShaclDocumentParser.php
via kgforge/functions/merge.py). At web scale the same entity is described
by thousands of pages that disagree, so KG construction needs a fusion
stage: pick the most-supported object value per (s, p) — majority vote
with a deterministic tie-break — plus a support/confidence measure the
downstream consumer can threshold.

Scale design:
- ``fuse_facts``: two map-side-combinable hash aggregates, NO window.
  Stage 1 groups by (s, p, o) -> vote counts (partial aggregation absorbs
  the per-page duplication before the shuffle). Stage 2 groups by (s, p)
  and picks argmax via ``min(struct(-votes, o, ...))`` — min over the
  struct's lexicographic order = highest vote count, ties broken by the
  SMALLEST object value, a pure function of the input (no
  first()-under-nondeterminism). A hot subject (every page asserts
  rdf:type on the homepage entity) collapses in stage 1's combiner, so the
  stage-2 shuffle sees one row per distinct (s, p, o) — skew-immune.
- ``kg_diff``: two left-anti joins on the (s, p, o-value) natural key —
  each is one shuffle of each side, AQE picks broadcast when a snapshot
  slice is small. No full-outer join (its null-handling would widen every
  row); the union of the two anti-joins IS the symmetric difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["align_predicates", "entity_summary", "fuse_facts", "kg_diff", "latest_facts"]


def fuse_facts(
    triples: DataFrame,
    min_votes: int = 1,
    count_pages: bool = True,
) -> DataFrame:
    """One fused fact per (subject, predicate): the object value asserted
    by the most pages (``count_pages``) or the most triple rows.

    Output: subject, predicate, value (winning object), votes (support for
    the winner), total_votes (all assertions on the key), n_values
    (distinct candidate objects), confidence = votes / total_votes.
    Ties break toward the lexicographically smallest value, so the result
    is a pure function of the input multiset. ``min_votes`` drops fused
    facts whose winner has fewer supporting votes than the floor.
    """
    votes = (
        F.count_distinct(F.col("url"))
        if count_pages
        else F.count(F.lit(1))
    )
    per_value = (
        triples.select(
            "url", "subject", "predicate", F.col("object.value").alias("value")
        )
        .groupBy("subject", "predicate", "value")
        .agg(votes.alias("votes"))
    )
    # argmax by (votes desc, value asc) as ONE combinable min(struct):
    # -votes sorts descending support first, value breaks ties ascending.
    best = F.min(
        F.struct(
            (-F.col("votes")).alias("neg_votes"),
            F.col("value").alias("value"),
        )
    ).alias("best")
    fused = (
        per_value.groupBy("subject", "predicate")
        .agg(
            best,
            F.sum("votes").alias("total_votes"),
            F.count(F.lit(1)).alias("n_values"),
        )
        .select(
            "subject",
            "predicate",
            F.col("best.value").alias("value"),
            (-F.col("best.neg_votes")).alias("votes"),
            "total_votes",
            "n_values",
            (
                (-F.col("best.neg_votes")).cast("double")
                / F.col("total_votes").cast("double")
            ).alias("confidence"),
        )
    )
    if min_votes > 1:
        fused = fused.filter(F.col("votes") >= min_votes)
    return fused


def kg_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Symmetric difference of two triple snapshots on the
    (subject, predicate, object value) natural key: one row per changed
    fact with ``change`` = 'added' (in new only) or 'removed' (in old
    only). Unchanged facts never leave their scan. Both sides are
    DISTINCT-ed on the key first, so per-page duplication can't inflate
    the diff."""
    key = ["subject", "predicate", "value"]

    def facts(df: DataFrame) -> DataFrame:
        return df.select(
            "subject", "predicate", F.col("object.value").alias("value")
        ).distinct()

    o, n = facts(old), facts(new)
    added = n.join(o, on=key, how="left_anti").withColumn("change", F.lit("added"))
    removed = o.join(n, on=key, how="left_anti").withColumn(
        "change", F.lit("removed")
    )
    return added.unionByName(removed)


def latest_facts(triples: DataFrame, ts_col: str = "fetched_at") -> DataFrame:
    """Recency-wins fusion: per (subject, predicate) the object value from
    the NEWEST assertion — the temporal complement to :func:`fuse_facts`
    (majority vote): prices, titles and statuses change, so "most pages
    agree" is wrong for volatile predicates and "latest crawl wins" is
    right.

    ``ts_col`` names the assertion-time column already on the triples
    (e.g. the page's fetch time joined in by the pipeline). Output:
    subject, predicate, value, as_of (the winning timestamp), n_versions
    (total assertions seen). Ties on the timestamp break toward the
    LARGEST value — max(struct) lexicographic order — so the result is a
    pure function of the input, not of partition order. One combinable
    hash aggregate, no window: a subject re-asserted by every crawl of a
    hot page collapses map-side."""
    best = F.max(
        F.struct(F.col(ts_col).alias("as_of"), F.col("object.value").alias("value"))
    ).alias("best")
    return (
        triples.groupBy("subject", "predicate")
        .agg(best, F.count(F.lit(1)).alias("n_versions"))
        .select(
            "subject",
            "predicate",
            F.col("best.value").alias("value"),
            F.col("best.as_of").alias("as_of"),
            "n_versions",
        )
    )


def align_predicates(
    pred_values: DataFrame,
    pred_col: str = "predicate",
    value_col: str = "value",
    min_jaccard: float = 0.1,
    min_shared: int = 1,
) -> DataFrame:
    """Schema alignment for multi-source KG fusion: predicate pairs ranked
    by Jaccard overlap of their DISTINCT object-value sets — the standard
    instance-based matcher for "this source says urn:p:email, that one
    says urn:p:mail" before fuse_facts can merge them.

    Input is any (predicate, value) DataFrame (extra columns ignored).
    Output: pred_a < pred_b, n_a, n_b, n_shared, jaccard.

    Scale: the only fan-out is the value-keyed self-join of the DISTINCT
    (value, predicate) relation — a value shared by k predicates yields
    C(k,2) pair rows, and k is bounded by the predicate vocabulary (tiny
    next to the corpus), so pair volume is O(distinct values · avg k²/2).
    Set sizes and intersections are combinable counts; no windows, no
    driver state.
    """
    vp = pred_values.select(
        F.col(pred_col).alias("_p"), F.col(value_col).alias("_v")
    ).distinct()
    sizes = vp.groupBy("_p").agg(F.count("*").alias("_n"))
    a, b = vp.alias("a"), vp.alias("b")
    inter = (
        a.join(b, F.col("a._v") == F.col("b._v"))
        .filter(F.col("a._p") < F.col("b._p"))
        .groupBy(F.col("a._p").alias("pred_a"), F.col("b._p").alias("pred_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("_p").alias("pred_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_p").alias("pred_b"), F.col("_n").alias("n_b"))
    out = (
        inter.join(F.broadcast(sa), "pred_a")
        .join(F.broadcast(sb), "pred_b")
        .withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter((F.col("jaccard") >= min_jaccard) & (F.col("n_shared") >= min_shared))
    )
    return out.select("pred_a", "pred_b", "n_a", "n_b", "n_shared", "jaccard")


def entity_summary(triples: DataFrame, k: int = 5) -> DataFrame:
    """Entity summarization (RELIN-style informativeness, simplified to
    combinable statistics): the top-``k`` most informative facts per
    subject — what a KG browser or an LLM-context packer shows first when
    an entity carries hundreds of assertions.

    Informativeness = pred_idf + obj_idf:

    - ``pred_idf = ln((N_entities+1)/(n_subjects(p)+1))`` — a predicate
      everyone has (rdf:type, schema:name) says little; a rare one says a
      lot.
    - ``obj_idf = ln((n_rows(p)+1)/(n_rows(p,o)+1))`` — within a
      predicate, a value shared by half the corpus ("status=active") is
      less specific than a near-unique one.

    Scale shape: three hash aggregates (corpus entity count as a 1-row
    agg cross-joined back; per-predicate stats schema-sized and
    AQE-broadcast into the join; per-(p, o) stats shuffled on their own
    key) and ONE window partitioned by subject for the top-k — bounded
    by the per-entity fact count, the same partition the caller's
    group-by-subject assembly already uses. Ties break on (predicate,
    value) so the ranking is a pure function of the input.

    Output: subject, predicate, value, pred_idf, obj_idf, score, rank.
    """
    from pyspark.sql import Window

    # distinct FACTS, not assertions: a fact re-asserted by a thousand
    # pages is one summary candidate (support-weighting is fuse_facts'
    # job); the distinct is one shuffle whose map-side combine absorbs
    # exactly that per-page duplication
    facts = (
        triples.filter(F.col("subject").isNotNull())
        .select("subject", "predicate", F.col("object.value").alias("value"))
        .distinct()
    )
    n_ent = facts.agg(F.count_distinct("subject").alias("n_ent"))
    pred_stats = facts.groupBy("predicate").agg(
        F.count_distinct("subject").alias("n_subj"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    po_stats = facts.groupBy("predicate", "value").agg(
        F.count(F.lit(1)).alias("n_po")
    )
    scored = (
        facts.join(po_stats, ["predicate", "value"], "inner")
        .join(pred_stats, "predicate", "inner")
        .crossJoin(n_ent)
        .withColumn(
            "pred_idf",
            F.round(F.log((F.col("n_ent") + 1) / (F.col("n_subj") + 1)), 6),
        )
        .withColumn(
            "obj_idf",
            F.round(F.log((F.col("n_rows") + 1) / (F.col("n_po") + 1)), 6),
        )
        .withColumn("score", F.round(F.col("pred_idf") + F.col("obj_idf"), 6))
    )
    w = Window.partitionBy("subject").orderBy(
        F.col("score").desc(), F.col("predicate"), F.col("value")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "subject", "predicate", "value", "pred_idf", "obj_idf", "score", "rank"
        )
    )
