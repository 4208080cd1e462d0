"""Fuzzy string-match join (edit-distance entity resolution).

Finds every pair of rows whose string keys are within Levenshtein distance
``k`` — the classic entity-resolution primitive for merging surface forms
("Acme Corp" vs "Acme Corp.") ahead of canonicalization — WITHOUT an
all-pairs comparison.

Blocking: FastSS deletion neighborhoods (Bocek et al. 2007, "Fast Similarity
Search in Large Dictionaries"). Dk(s) is the set of strings reachable from s
by deleting at most k characters. If ed(a, b) <= k then Dk(a) ∩ Dk(b) != ∅
(align any optimal edit script; deleting the edited positions from both
sides yields a common string), so joining on deletion variants is a
COMPLETE blocking — zero false negatives — and an exact `F.levenshtein`
verify inside each bucket removes the false positives. The whole operator
is JVM codegen: variants come from `transform(sequence(...))` + `substr`
(no Python UDF), the verify is the built-in Levenshtein.

Scale analysis (the reason this survives 100 TB where a cross join dies):

- Variant fan-out per row is (L+1) for k=1 and O(L^2/2) for k=2 — a map-side
  explode that never shuffles more than ~tens of rows per input row for
  realistic entity-name lengths.
- The join key (variant string) has bounded bucket sizes: a bucket holds
  only strings within k deletions of one specific variant, so hot keys can
  only come from *genuinely* high-multiplicity near-identical names (which
  a downstream canonicalizer wants grouped anyway). Very short strings
  (len <= k) collapse toward the empty variant — a universal hot key — so
  they are routed around the index and verified against each other
  directly (their count is tiny in any real corpus and the pair set is
  exact either way).
- Verification runs BEFORE the pair-level distinct, so the distinct's
  shuffle only carries true matches, not every co-bucketed candidate.

Reference anchor: parser-shacl has no fuzzy matching (it processes one file
at a time); this is part of the corpus-scale canonicalization surface the
north rule adds on top (entity canonicalization / blocking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "fuzzy_match_pairs"]


def _del1(col: Column) -> Column:
    """Array of all single-character-deletion variants of `col`.

    Pure codegen: for i in 1..len(s), concat(s[1..i-1], s[i+1..]). Guarded
    for the empty string (Spark's `sequence(1, 0)` would count DOWN and
    fabricate junk variants).
    """
    n = F.length(col)
    variants = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(col.substr(F.lit(1), i - F.lit(1)), col.substr(i + F.lit(1), n - i)),
    )
    return F.when(n >= 1, variants).otherwise(F.array().cast("array<string>"))


def deletion_variants(df: DataFrame, id_col: str, name_col: str, k: int = 1) -> DataFrame:
    """Distinct (``_fid``, ``_fname``, ``_variant``) rows: every string
    reachable from ``name_col`` by deleting at most ``k`` characters.

    Built iteratively — frontier i holds exactly-i-deletion variants, the
    union accumulates <=i — so the explode stays map-side (one shuffle only
    at the final distinct, which the caller's join needs anyway).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    base = df.select(F.col(id_col).alias("_fid"), F.col(name_col).alias("_fname"))
    out = base.select("_fid", "_fname", F.col("_fname").alias("_variant"))
    frontier = out
    for _ in range(k):
        frontier = frontier.select(
            "_fid", "_fname", F.explode(_del1(F.col("_variant"))).alias("_variant")
        )
        out = out.unionByName(frontier)
    return out.distinct()


def fuzzy_match_pairs(
    left: DataFrame,
    id_col: str,
    name_col: str,
    right: DataFrame | None = None,
    max_distance: int = 1,
) -> DataFrame:
    """EXACT set of pairs with Levenshtein(name_a, name_b) <= max_distance.

    Self-join mode (``right=None``): returns each unordered pair once with
    ``id_a < id_b``. Two-table mode: returns every (left, right) match.

    Output columns: id_a, id_b, name_a, name_b, dist.

    Strings of length <= max_distance are matched by brute force against
    both sides (their deletion neighborhoods degenerate to the universal
    empty-string bucket; see module docstring) — correctness is unchanged,
    the hot key is avoided. Everything is built-in codegen; no Python UDF.
    """
    k = max_distance
    la = deletion_variants(left, id_col, name_col, k)
    self_mode = right is None
    lb = la if self_mode else deletion_variants(right, id_col, name_col, k)

    # Short strings route around the variant index (universal-bucket skew guard).
    short_a = la.filter(F.length("_fname") <= k).select("_fid", "_fname").distinct()
    short_b = short_a if self_mode else lb.filter(F.length("_fname") <= k).select(
        "_fid", "_fname"
    ).distinct()
    main_a = la.filter(F.length("_fname") > k)
    main_b = lb.filter(F.length("_fname") > k)

    a, b = main_a.alias("a"), main_b.alias("b")
    cand = a.join(b, F.col("a._variant") == F.col("b._variant"))

    # A short name can still match a long one (|len diff| <= k), so pair the
    # short set against ALL names on the other side; the short set is tiny,
    # so broadcast it. In self mode short×short pairs are included here too.
    names_a = left.select(F.col(id_col).alias("_fid"), F.col(name_col).alias("_fname"))
    names_b = names_a if self_mode else right.select(
        F.col(id_col).alias("_fid"), F.col(name_col).alias("_fname")
    )
    short_cands = [
        F.broadcast(short_a.alias("a")).join(
            names_b.alias("b"),
            F.abs(F.length("a._fname") - F.length("b._fname")) <= F.lit(k),
        )
    ]
    if not self_mode:
        # two-table mode also needs long-left × short-right
        short_cands.append(
            names_a.alias("a").join(
                F.broadcast(short_b.alias("b")),
                F.abs(F.length("a._fname") - F.length("b._fname")) <= F.lit(k),
            )
        )

    def _verify(df: DataFrame) -> DataFrame:
        dist = F.levenshtein(F.col("a._fname"), F.col("b._fname"))
        if self_mode:
            # Canonicalize the unordered pair (id_a < id_b) by struct order —
            # a plain filter would drop pairs that only ever appear with the
            # short/broadcast side holding the larger id.
            sa = F.struct(F.col("a._fid").alias("i"), F.col("a._fname").alias("n"))
            sb = F.struct(F.col("b._fid").alias("i"), F.col("b._fname").alias("n"))
            lo, hi = F.least(sa, sb), F.greatest(sa, sb)
            return (
                df.select(
                    lo["i"].alias("id_a"),
                    hi["i"].alias("id_b"),
                    lo["n"].alias("name_a"),
                    hi["n"].alias("name_b"),
                    dist.alias("dist"),
                )
                .filter((F.col("dist") <= k) & (F.col("id_a") != F.col("id_b")))
            )
        return df.select(
            F.col("a._fid").alias("id_a"),
            F.col("b._fid").alias("id_b"),
            F.col("a._fname").alias("name_a"),
            F.col("b._fname").alias("name_b"),
            dist.alias("dist"),
        ).filter(F.col("dist") <= k)

    out = _verify(cand)
    for sc in short_cands:
        out = out.unionByName(_verify(sc))
    return out.distinct()
