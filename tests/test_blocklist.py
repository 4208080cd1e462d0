"""Domain-blocklist filtering: suffix semantics, exact hosts, plan shape."""

from pyspark.sql import functions as F

from kgforge.operators.blocklist import blocklist_filter, host_suffixes_col


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _blocked(spark, domains):
    return spark.createDataFrame([(d,) for d in domains], "domain string")


def test_suffix_expansion_longest_first(spark):
    df = spark.createDataFrame([("a.b.example.org",)], "h string")
    out = df.select(host_suffixes_col(F.col("h")).alias("s")).collect()[0]["s"]
    assert out == ["a.b.example.org", "b.example.org", "example.org", "org"]


def test_max_labels_caps_pathological_hosts(spark):
    host = ".".join(f"l{i}" for i in range(100))
    df = spark.createDataFrame([(host,)], "h string")
    out = df.select(host_suffixes_col(F.col("h"), max_labels=8).alias("s")).collect()[0]["s"]
    assert len(out) == 8


def test_domain_entry_blocks_all_subdomains(spark):
    pages = _pages(
        spark,
        [
            "https://a.bad.example/x",
            "https://deep.sub.bad.example/y",
            "https://bad.example/z",
            "https://good.example/w",
            "https://notbad.example/v",  # 'notbad.example' != 'bad.example'
        ],
    )
    out = blocklist_filter(pages, _blocked(spark, ["bad.example"]))
    kept = {r["url"] for r in out.collect()}
    assert kept == {"https://good.example/w", "https://notbad.example/v"}


def test_exact_host_entry_blocks_only_that_host(spark):
    pages = _pages(spark, ["https://a.site.org/1", "https://b.site.org/2"])
    out = blocklist_filter(pages, _blocked(spark, ["a.site.org"]))
    assert [r["url"] for r in out.collect()] == ["https://b.site.org/2"]


def test_keep_blocked_audit_flag(spark):
    pages = _pages(spark, ["https://x.bad.tld/1", "https://ok.tld/2"])
    out = blocklist_filter(pages, _blocked(spark, ["bad.tld"]), keep_blocked=True)
    got = {r["url"]: r["blocked"] for r in out.collect()}
    assert got == {"https://x.bad.tld/1": True, "https://ok.tld/2": False}


def test_port_and_case_normalized_before_match(spark):
    pages = _pages(spark, ["https://WWW.Bad.Example:8443/x"])
    assert blocklist_filter(pages, _blocked(spark, ["bad.example"])).count() == 0


def test_blocklist_is_broadcast_side(spark):
    pages = _pages(spark, ["https://a.b/1"])
    out = blocklist_filter(pages, _blocked(spark, ["z.example"]), keep_blocked=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
