"""URL canonicalization edge cases (functions/urlnorm.py)."""

from pyspark.sql import functions as F

from tribeca_insights_spark.functions.urlnorm import canonical_url

CASES = [
    # (input, expected)
    ("HTTP://Site.COM:80/A/b#frag", "http://site.com/A/b"),
    ("https://site.com:443/x", "https://site.com/x"),
    ("https://site.com:8443/x", "https://site.com:8443/x"),  # non-default kept
    ("http://site.com:443/x", "http://site.com:443/x"),  # wrong-scheme port kept
    ("http://site.com/p?b=2&a=1&c=3", "http://site.com/p?a=1&b=2&c=3"),
    ("http://site.com/p?", "http://site.com/p"),  # empty query dropped
    ("http://site.com/p?x=1#s?y=2", "http://site.com/p?x=1"),  # frag first
    ("HTTPS://UPPER.example.ORG/KeepCase/Path", "https://upper.example.org/KeepCase/Path"),
    ("http://site.com", "http://site.com"),
    ("http://site.com/?z=1&a", "http://site.com/?a&z=1"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["u"])
    got = [r["c"] for r in df.select(canonical_url("u").alias("c")).collect()]
    for (inp, want), g in zip(CASES, got):
        assert g == want, f"{inp!r}: got {g!r}, want {want!r}"


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["u"])
    once = df.select(canonical_url("u").alias("c"))
    twice = once.select(canonical_url("c").alias("c2"))
    for r1, r2 in zip(once.collect(), twice.collect()):
        assert r1["c"] == r2["c2"]


def test_canonical_url_dedup_clusters_variants(spark):
    from pyspark.sql import Row

    from tribeca_insights_spark.functions.urlnorm import (
        canonical_url_dedup,
    )

    urls = spark.createDataFrame(
        [
            Row(url="HTTP://A.COM:80/p?utm_source=x&b=2&a=1#f"),
            Row(url="http://a.com/p?b=2&a=1"),
            Row(url="http://a.com/p?b=2&a=1"),   # exact dup collapses
            Row(url="http://a.com/q"),
        ]
    )
    out = {r["canon"]: (r["keeper_url"], r["n_variants"])
           for r in canonical_url_dedup(urls,
                                        strip_tracking=True).collect()}
    assert out["http://a.com/p?a=1&b=2"] == (
        "HTTP://A.COM:80/p?utm_source=x&b=2&a=1#f", 2)
    assert out["http://a.com/q"] == ("http://a.com/q", 1)
