"""Sitemap seeding (SURVEY §2.1 S3 — storage.py:85-117 semantics)."""

from pyspark.sql import functions as F

from tribeca_insights_spark.sources.sitemap import seed_urls, sitemap_locs


def test_sitemap_locs_parsing(spark):
    xmls = [
        # plain, padded text, empty loc skipped
        ("<urlset><url><loc>  https://a.com/1 </loc></url>"
         "<url><loc></loc></url><url><loc>https://a.com/2</loc></url></urlset>",),
        # namespace-prefixed tags
        ("<sm:urlset><sm:url><sm:loc>https://b.com/x</sm:loc></sm:url></sm:urlset>",),
        # no locs at all
        ("<html>not a sitemap</html>",),
    ]
    df = spark.createDataFrame(xmls, ["sitemap_xml"])
    urls = sorted(r["url"] for r in sitemap_locs(df).collect())
    assert urls == ["https://a.com/1", "https://a.com/2", "https://b.com/x"]


def test_seed_urls_anti_join_and_union(spark):
    locs = spark.createDataFrame(
        [("https://a.com/1",), ("https://a.com/new",), ("https://a.com/new",)],
        ["url"],
    )
    state = spark.createDataFrame(
        [("https://a.com/1", 1, "2026-01-01", "one.md", "one.json")],
        ["URL", "Status", "Data", "MD File", "JSON File"],
    )
    out = {r["URL"]: r for r in seed_urls(locs, state).collect()}
    assert len(out) == 2  # batch-internal dedup; existing row not duplicated
    assert out["https://a.com/1"]["Status"] == 1  # existing row untouched
    assert out["https://a.com/1"]["MD File"] == "one.md"
    new = out["https://a.com/new"]
    assert (new["Status"], new["Data"], new["MD File"]) == (2, "", "")


def test_robots_sitemap_discovery_and_rules(spark):
    from tribeca_insights_spark.sources.robots import (
        disallow_rules,
        sitemaps_from_robots,
    )

    txt = (
        "# comment\n"
        "Sitemap: https://a.example.com/s1.xml\r\n"
        "sitemap:https://a.example.com/s2.xml\n"
        "User-agent: specialbot\n"
        "Disallow: /only-special\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /everyone\n"
        "Allow: /everyone/ok\n"
    )
    robots = spark.createDataFrame(
        [(1, txt), (2, "User-agent: *\nDisallow: /x\n")],
        "domain_id long, robots_txt string",
    )
    maps = sitemaps_from_robots(robots).collect()
    got = sorted((r["domain_id"], r["sitemap_url"]) for r in maps)
    assert got == [
        (1, "https://a.example.com/s1.xml"),
        (1, "https://a.example.com/s2.xml"),
    ]
    # specific group REPLACES '*' (robots group semantics)
    special = disallow_rules(robots, "specialbot").collect()
    assert sorted((r["domain_id"], r["path_prefix"]) for r in special) == [
        (1, "/only-special"), (2, "/x"),
    ]
    # unknown UA falls back to '*'; Allow lines are not Disallows
    other = disallow_rules(robots, "otherbot").collect()
    assert sorted((r["domain_id"], r["path_prefix"]) for r in other) == [
        (1, "/everyone"), (2, "/x"),
    ]
