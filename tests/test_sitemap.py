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
