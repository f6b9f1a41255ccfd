"""Round-4 wave: SURT keys (q305) and PSL registrable domains (q306)."""

from pyspark.sql import Row, functions as F

from tribeca_insights_spark.functions.urlnorm import (
    registrable_domains,
    surt_key,
    surt_prefix,
)


def _surt(spark, url, **kw):
    df = spark.createDataFrame([Row(url=url)])
    return df.select(surt_key("url", **kw).alias("s")).collect()[0]["s"]


def test_surt_full_normalization(spark):
    # case, www, default port, fragment, unsorted query — all at once
    assert (
        _surt(spark, "HTTP://WWW.Ext2.Example.COM:80/Docs/7?b=2&a=1#x")
        == "com,example,ext2)/Docs/7?a=1&b=2"
    )


def test_surt_www_digit_and_https_port(spark):
    assert _surt(spark, "https://www2.news.example.org:443/p") == (
        "org,example,news)/p"
    )


def test_surt_keeps_nondefault_port_and_path_case(spark):
    assert _surt(spark, "http://a.example.com:8080/A/B") == (
        "com,example,a:8080)/A/B"
    )


def test_surt_opt_outs(spark):
    assert _surt(spark, "http://www.a.com/p?b=2&a=1", strip_www=False,
                 sort_query=False) == "com,a,www)/p?b=2&a=1"


def test_surt_prefix(spark):
    df = spark.createDataFrame(
        [Row(s="uk,co,example,site,sub)/a/1")]
    )
    assert df.select(surt_prefix("s").alias("p")).collect()[0]["p"] == "uk,co"


def _psl(spark, *hosts):
    df = spark.createDataFrame([Row(host=h) for h in hosts])
    out = registrable_domains(df)
    return {
        r["host"]: (r["public_suffix"], r["registrable"], r["subdomain"])
        for r in out.collect()
    }


def test_psl_longest_suffix_wins(spark):
    got = _psl(spark, "a.shop.example.co.uk")
    assert got["a.shop.example.co.uk"] == (
        "co.uk", "example.co.uk", "a.shop"
    )


def test_psl_private_platform_suffix(spark):
    # blogspot.com is a PSL private-section suffix: each user subdomain
    # is its own registrable domain (naive eTLD+1 would merge them all)
    got = _psl(spark, "alice.blogspot.com", "bob.blogspot.com")
    assert got["alice.blogspot.com"] == (
        "blogspot.com", "alice.blogspot.com", None
    )
    assert got["bob.blogspot.com"][1] == "bob.blogspot.com"


def test_psl_default_rule_unknown_tld(spark):
    got = _psl(spark, "x.example.zz")
    assert got["x.example.zz"] == ("zz", "example.zz", "x")


def test_psl_host_is_suffix(spark):
    got = _psl(spark, "co.uk")
    assert got["co.uk"] == ("co.uk", None, None)


def test_psl_case_folded_and_distinct(spark):
    df = spark.createDataFrame(
        [Row(host="Example.COM"), Row(host="example.com")]
    )
    out = registrable_domains(df).collect()
    assert len(out) == 1 and out[0]["registrable"] == "example.com"


def test_psl_plan_no_page_shuffle(spark):
    # the PSL dim must broadcast: no SortMergeJoin in the plan
    df = spark.createDataFrame([Row(host="a.example.com")])
    plan = registrable_domains(df)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_surt_ipv6_literal_untouched(spark):
    # IPv6 authorities have no dot hierarchy to reverse
    assert _surt(spark, "http://[::1]:8080/p") == "[::1]:8080)/p"
