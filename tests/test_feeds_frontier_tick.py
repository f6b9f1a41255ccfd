"""q244-q245 wave: RSS/Atom feed source, composed frontier tick."""

import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.sources.feeds import (
    feed_entries,
    seed_from_feeds,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Chan</title>
  <item>
    <title> First post </title>
    <link> https://a.com/p/1 </link>
    <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
  </item>
  <item><title>no link decoy</title></item>
  <item>
    <link>https://a.com/p/2</link>
  </item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Feed</title>
  <entry>
    <title>Atom one</title>
    <link rel="alternate" href="https://b.com/e/1"/>
    <updated>2024-02-02T00:00:00Z</updated>
  </entry>
  <entry>
    <link href="https://b.com/e/2"/>
  </entry>
</feed>"""


def test_rss_entries(spark):
    df = spark.createDataFrame([Row(feed_xml=RSS)])
    got = sorted(
        (r["url"], r["title"], r["published"])
        for r in feed_entries(df).collect()
    )
    # decoy (no link) dropped; whitespace trimmed; missing fields empty
    assert got == [
        ("https://a.com/p/1", "First post",
         "Mon, 01 Jan 2024 00:00:00 GMT"),
        ("https://a.com/p/2", "", ""),
    ]


def test_atom_entries(spark):
    df = spark.createDataFrame([Row(feed_xml=ATOM)])
    got = sorted(
        (r["url"], r["title"], r["published"])
        for r in feed_entries(df).collect()
    )
    assert got == [
        ("https://b.com/e/1", "Atom one", "2024-02-02T00:00:00Z"),
        ("https://b.com/e/2", "", ""),
    ]


def test_feed_title_does_not_leak_across_blocks(spark):
    # the channel-level <title>Chan</title> must never become an
    # item's title (fields extract INSIDE blocks only)
    df = spark.createDataFrame([Row(feed_xml=RSS)])
    titles = {r["title"] for r in feed_entries(df).collect()}
    assert "Chan" not in titles


def test_seed_from_feeds_anti_join(spark):
    entries = spark.createDataFrame(
        [Row(url="https://a.com/1"), Row(url="https://a.com/2"),
         Row(url="https://a.com/2")]  # dup collapses
    )
    state = spark.createDataFrame([Row(URL="https://a.com/1")])
    got = seed_from_feeds(entries, state).collect()
    assert len(got) == 1
    assert got[0]["URL"] == "https://a.com/2"
    assert got[0]["Status"] == 2


def test_frontier_tick_query_properties(spark, sf_dir):
    from tribeca_insights_spark.entry_queries import QUERIES

    out = QUERIES["q245_frontier_tick"](spark, sf_dir).collect()
    assert out  # something scheduled
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    for dom, rows in by_dom.items():
        ranks = sorted(r["fetch_rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= 5  # tick cap
        for r in rows:
            assert "/private/" not in r["url"] or not (
                len(dom.split(".")[0]) % 2 == 1
            )
            # offsets follow rank * per-domain delay
            delay = len(dom.split(".")[0]) % 3
            assert r["scheduled_offset_sec"] == (
                (r["fetch_rank"] - 1) * delay
            )
