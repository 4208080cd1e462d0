"""Frequent-itemset mining over (basket, item) pairs — market-basket
co-occurrence at corpus scale (Agrawal & Srikant 1994, A-priori pair pass).

KG use: baskets are triple subjects, items their predicates — "which
predicate combinations co-occur on the same entity" is schema-pattern
mining, the corpus-scale generalization of the reference parser's
per-shape constraint grouping (reference: `src/Extractors/
ShaclPropertyAnalyzer.php:57-82` builds per-shape parameter dicts one
file at a time; here the same co-occurrence structure is mined over the
whole corpus in one distributed pass).

Scale shape: the pair pass self-joins baskets on the basket key, fanning
out quadratically in BASKET SIZE — a crawler-trap entity with 10^5
distinct predicates would emit 5*10^9 pairs. ``max_basket`` drops those
mega-baskets before the join (the standard A-priori guard; dropped
baskets are the degenerate ones for schema mining anyway). Everything
else is one dedup, one basket-size agg, one basket-keyed self-join and
one pair agg — all codegen, AQE-managed; min_support prunes the output
map-side partially via partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int | None = 1000,
) -> DataFrame:
    """(basket, item) rows -> frequent item PAIRS with support and lift:
    (item_a, item_b, n_baskets, support, lift), item_a < item_b, where
    support = n_baskets / N (N = total distinct baskets, including
    mega-baskets dropped from the pair join — support is corpus-wide) and
    lift = support / (supp_a * supp_b); both rounded to 6.
    """
    b = df.select(
        F.col(basket_col).alias("k"), F.col(item_col).alias("item")
    ).distinct().persist()
    n_total = b.select(F.countDistinct("k").alias("n_baskets_total"))
    item_supp = b.groupBy("item").agg(F.count("*").cast("bigint").alias("supp"))
    baskets = b
    if max_basket is not None:
        sizes = b.groupBy("k").agg(F.count("*").alias("sz"))
        baskets = b.join(
            sizes.filter(F.col("sz") <= max_basket).select("k"), "k"
        )
    pairs = (
        baskets.alias("x")
        .join(
            baskets.alias("y"),
            (F.col("x.k") == F.col("y.k")) & (F.col("x.item") < F.col("y.item")),
        )
        .groupBy(
            F.col("x.item").alias("item_a"), F.col("y.item").alias("item_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_baskets"))
        .filter(F.col("n_baskets") >= int(min_support))
    )
    sa = item_supp.select(F.col("item").alias("item_a"), F.col("supp").alias("_sa"))
    sb = item_supp.select(F.col("item").alias("item_b"), F.col("supp").alias("_sb"))
    n = F.col("n_baskets_total").cast("double")
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "item_a",
            "item_b",
            "n_baskets",
            F.round(F.col("n_baskets") / n, 6).alias("support"),
            F.round(
                F.col("n_baskets") * n / (F.col("_sa") * F.col("_sb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
