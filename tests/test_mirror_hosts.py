"""Mirror-host detection (outlink-set Jaccard) vs pure Python."""

from itertools import combinations

from kgforge.operators.links import mirror_hosts


def _py_mirrors(edges, threshold, df_cap=None):
    sets = {}
    for h, t in set(edges):
        sets.setdefault(h, set()).add(t)
    if df_cap is not None:
        df = {}
        for ts in sets.values():
            for t in ts:
                df[t] = df.get(t, 0) + 1
        sets = {h: {t for t in ts if df[t] <= df_cap} for h, ts in sets.items()}
    out = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter and union and round(inter / union, 6) >= threshold:
            out[(a, b)] = (inter, round(inter / union, 6))
    return out


EDGES = [
    ("m1", "x"), ("m1", "y"), ("m1", "z"),
    ("m2", "x"), ("m2", "y"), ("m2", "z"),          # exact mirror of m1
    ("m3", "x"), ("m3", "y"), ("m3", "w"),          # 2/4 with m1
    ("m4", "q"),
    ("m1", "x"),                                     # duplicate edge
]


def test_mirror_hosts_matches_python(spark):
    df = spark.createDataFrame(EDGES, "src_host string, dst_host string")
    got = {
        (r["host_a"], r["host_b"]): (r["n_common"], r["jaccard"])
        for r in mirror_hosts(df, threshold=0.4).collect()
    }
    assert got == _py_mirrors(EDGES, 0.4)
    assert got[("m1", "m2")] == (3, 1.0)
    assert got[("m1", "m3")] == (2, 0.5)


def test_mirror_hosts_df_cap_drops_ubiquitous_targets(spark):
    # target "g" is linked by every host (df=4); with df_cap=3 it must not
    # count toward intersections OR set sizes, while x/y (df=3) still do
    edges = EDGES + [("m1", "g"), ("m2", "g"), ("m3", "g"), ("m4", "g")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {
        (r["host_a"], r["host_b"]): (r["n_common"], r["jaccard"])
        for r in mirror_hosts(df, threshold=0.0, df_cap=3).collect()
    }
    assert got == _py_mirrors(edges, 0.0, df_cap=3)
    assert ("m1", "m4") not in got  # only "g" was shared
    assert got[("m1", "m2")] == (3, 1.0)  # unchanged by the cap
