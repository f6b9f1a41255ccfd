"""Crawl-side sources: robots, sitemaps, WARC/WET/CDX, feeds, scheduling.

Driver-contract queries (split from the monolithic entry_queries.py in r5);
each function is registered into the shared ``QUERIES``/``ORACLE`` dicts by
the ``@q`` decorator from ``_shared`` at import time.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


# --- sitemap seeding (SURVEY §2.1 S3) + event sessionization (§2.4 ext) ----

@q(
    "q39_sitemap_seed",
    """
    SELECT 'https://' || source || '.example.com/docs/' || doc_id AS "URL",
           1 AS "Status"
    FROM documents
    UNION ALL
    SELECT 'https://' || source || '.example.com/new/' || doc_id, 2
    FROM documents
    """,
)
def q39_sitemap_seed(spark, sf_dir):
    """Sitemap URL-universe seeding (storage.py:85-117): parse <loc> from
    synthesized sitemap XML (half with namespace prefixes + padding, to
    exercise trim/prefix handling), anti-join against the state table,
    append unseen urls as Status=2."""
    from ..sources.sitemap import seed_urls, sitemap_locs

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    base = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com"))
    plain = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc>  '),
        base, F.lit("/docs/"), sid,
        F.lit("</loc></url><url><loc>"),
        base, F.lit("/new/"), sid,
        F.lit("</loc></url></urlset>"),
    )
    prefixed = F.concat(
        F.lit("<sm:urlset><sm:url><sm:loc>"),
        base, F.lit("/docs/"), sid,
        F.lit("</sm:loc></sm:url><sm:url><sm:loc> "),
        base, F.lit("/new/"), sid,
        F.lit(" </sm:loc></sm:url></sm:urlset>"),
    )
    sitemaps = d.select(
        F.when(F.col("doc_id") % 2 == 1, prefixed).otherwise(plain).alias(
            "sitemap_xml"
        )
    )
    state = d.select(
        F.concat(base, F.lit("/docs/"), sid).alias("URL"),
        F.lit(1).alias("Status"),
        F.lit("2026-01-01").alias("Data"),
        F.concat(F.lit("docs-"), sid, F.lit(".md")).alias("MD File"),
        F.concat(F.lit("docs-"), sid, F.lit(".json")).alias("JSON File"),
    )
    return seed_urls(sitemap_locs(sitemaps), state).select("URL", "Status")


@q(
    "q49_robots_delay",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 9.0
                ELSE CAST(doc_id % 7 AS DOUBLE) END AS crawl_delay
    FROM documents
    """,
)
def q49_robots_delay(spark, sf_dir):
    """robots.txt crawl-delay parse (config.py:31-47 semantics: specific
    UA group over '*' fallback). robots bodies synthesized: every domain
    sets '*' delay = doc_id%7; even ids add a specific 'tribeca' group with
    delay 9 — the engine, asked for UA 'tribeca', must prefer it."""
    from ..sources.robots import crawl_delays

    d = _read(spark, sf_dir, "documents")
    txt = F.concat(
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("User-agent: tribeca\nCrawl-delay: 9\n\n"),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *\nCrawl-delay: "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("\nDisallow: /private\n"),
    )
    return crawl_delays(
        d.select("doc_id", txt.alias("robots_txt")), user_agent="tribeca"
    ).select("doc_id", "crawl_delay")


@q(
    "q54_cdx_seed",
    """
    -- expected pending fetch list, stated closed-form: per url the LATEST
    -- valid (html, 200) capture wins — capture B (day 2) unless B is
    -- non-html (doc_id%5=0) or non-200 (doc_id%7=0), then capture A;
    -- urls already done (doc_id%3=0) are excluded
    SELECT 'https://' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) AS url,
           CASE WHEN doc_id % 5 != 0 AND doc_id % 7 != 0
                THEN 'sha1:B' ELSE 'sha1:A' END
             || CAST(doc_id AS VARCHAR) AS digest,
           'crawl-' || CAST(doc_id % 10 AS VARCHAR) || '.warc.gz' AS filename,
           CAST(CASE WHEN doc_id % 5 != 0 AND doc_id % 7 != 0
                     THEN doc_id * 1000 + 500 ELSE doc_id * 1000 END
                AS BIGINT) AS "offset",
           CAST(500 + doc_id % 100 AS BIGINT) AS length
    FROM documents WHERE doc_id % 3 != 0
    """,
)
def q54_cdx_seed(spark, sf_dir):
    """Common-Crawl CDXJ index → pending fetch list: the engine builds raw
    CDXJ text lines (two captures per url; the newer one sometimes non-html
    or non-200), then must regex-split them, parse the JSON blobs, filter
    to (html, 200), keep the latest capture per url, and anti-join the done
    set — all native column ops (sources/cdx.py). The oracle states the
    final fetch list closed-form; only a correct parse+plan matches it."""
    from ..sources.cdx import parse_cdxj, seed_fetch_list, split_cdxj

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/docs/"), sid)
    surt = F.concat(F.lit("com,example)/docs/"), sid)

    def blob(ts_lit, digest_prefix, mime, status, offset):
        return F.concat(
            surt, F.lit(" "), F.lit(ts_lit), F.lit(' {"url": "'), url,
            F.lit('", "mime": "'), mime,
            F.lit('", "status": "'), status,
            F.lit('", "digest": "'), F.lit(digest_prefix), sid,
            F.lit('", "length": "'), (F.lit(500) + F.col("doc_id") % 100).cast("string"),
            F.lit('", "offset": "'), offset.cast("string"),
            F.lit('", "filename": "crawl-'), (F.col("doc_id") % 10).cast("string"),
            F.lit('.warc.gz"}'),
        )

    line_a = blob("20260101000000", "sha1:A", F.lit("text/html"),
                  F.lit("200"), F.col("doc_id") * 1000)
    line_b = blob(
        "20260102000000", "sha1:B",
        F.when(F.col("doc_id") % 5 == 0, "application/pdf").otherwise("text/html"),
        F.when(F.col("doc_id") % 7 == 0, "404").otherwise("200"),
        F.col("doc_id") * 1000 + 500,
    )
    lines = d.select(line_a.alias("value")).unionByName(
        d.select(line_b.alias("value"))
    )
    captures = parse_cdxj(split_cdxj(lines))
    done = d.filter(F.col("doc_id") % 3 == 0).select(url.alias("url"))
    return seed_fetch_list(captures, done).select(
        "url", "digest", "filename", "offset", "length"
    )


@q(
    "q58_robots_rules",
    """
    -- effective Disallow prefixes for UA 'tribeca': the specific group
    -- (even ids) REPLACES '*' per robots group semantics; odd ids fall
    -- back to the '*' group. Sitemap directives surface for all ids.
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0
                THEN '/secret/' || CAST(doc_id AS VARCHAR)
                ELSE '/private/' || CAST(doc_id AS VARCHAR) END AS path_prefix,
           'https://s' || CAST(doc_id % 4 AS VARCHAR)
             || '.example.com/sitemap.xml' AS sitemap_url
    FROM documents
    """,
)
def q58_robots_rules(spark, sf_dir):
    """robots.txt Disallow-rule + Sitemap-directive extraction (stdlib
    RobotFileParser group semantics — a specific UA group replaces '*',
    it does not merge). Bodies synthesized: '*' disallows /private/{id};
    even ids add a 'tribeca' group disallowing /secret/{id}; every body
    carries a Sitemap: directive. Asked for UA 'tribeca', even ids must
    yield the specific group's rule only."""
    from ..sources.robots import disallow_rules, sitemaps_from_robots

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    txt = F.concat(
        F.lit("Sitemap: https://s"), (F.col("doc_id") % 4).cast("string"),
        F.lit(".example.com/sitemap.xml\n"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("User-agent: tribeca\nDisallow: /secret/"), sid,
                     F.lit("\n\n")),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *\nDisallow: /private/"), sid, F.lit("\n"),
    )
    robots = d.select("doc_id", txt.alias("robots_txt"))
    rules = disallow_rules(robots, user_agent="tribeca")
    maps = sitemaps_from_robots(robots)
    return rules.join(maps, "doc_id").select(
        "doc_id", "path_prefix", "sitemap_url"
    )


@q(
    "q59_politeness_schedule",
    """
    WITH f AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) AS url,
             source || '.example.com' AS domain,
             CAST(length(source) % 5 AS DOUBLE) AS crawl_delay
      FROM documents
    )
    SELECT url, domain, fetch_rank,
           CAST((fetch_rank - 1) * crawl_delay AS DOUBLE)
             AS scheduled_offset_sec
    FROM (
      SELECT url, domain, crawl_delay,
             CAST(row_number() OVER (PARTITION BY domain ORDER BY url)
                  AS INT) AS fetch_rank
      FROM f
    )
    """,
)
def q59_politeness_schedule(spark, sf_dir):
    """Distributed politeness: each domain's pending urls get slot
    (rank−1)×crawl_delay so concurrent executors never exceed one request
    per delay interval per domain (the dataflow form of the reference's
    sequential sleep, crawler.py:142). Window over the pending set +
    broadcast delay dim."""
    from ..plans.frontier import schedule_fetches

    d = _read(spark, sf_dir, "documents")
    frontier = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    delays = d.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("domain"),
        (F.length("source") % 5).cast("double").alias("crawl_delay"),
    ).distinct()
    return schedule_fetches(frontier, delays).select(
        "url", "domain",
        F.col("fetch_rank").cast("int").alias("fetch_rank"),
        "scheduled_offset_sec",
    )


@q(
    "q64_warc_roundtrip",
    """
    SELECT doc_id,
           'https://w.example.com/docs/' || CAST(doc_id AS VARCHAR) AS url,
           CAST(1767225600 AS BIGINT) AS ts_epoch,
           '<html><body><p>café ' || CAST(doc_id AS VARCHAR)
             || '</p></body></html>' AS html_text
    FROM documents
    """,
)
def q64_warc_roundtrip(spark, sf_dir):
    """WARC record round trip (S1-equivalent data layer, driver-checked):
    a valid WARC/1.0 response record is built per doc — gzipped for odd
    ids, charset latin-1 for ids ≡ 1 (mod 2) — then parsed back by the
    engine's WARC parser (header walk, HTTP split, charset detection,
    utf-8 transcoding). The 'café' byte differs between latin-1 (0xE9)
    and utf-8 — skipping the transcode would corrupt it, so the oracle
    only matches a correct parse."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..sources.warc import make_warc, parse_warc

    out_t = StructType(
        [
            StructField("url", StringType()),
            StructField("ts_epoch", LongType()),
            StructField("html_text", StringType()),
        ]
    )

    def _rt(doc_id):
        urls, eps, texts = [], [], []
        for i in doc_id:
            i = int(i)
            url = f"https://w.example.com/docs/{i}"
            html = f"<html><body><p>café {i}</p></body></html>"
            charset = "latin-1" if i % 2 else "utf-8"
            blob = make_warc([(url, html, charset)], gzip_file=bool(i % 2),
                             ts="2026-01-01T00:00:00Z")
            recs = parse_warc(blob)
            (r,) = recs
            payload = r["html"]
            if r["charset"] not in ("utf-8", "utf8", "ascii", "us-ascii"):
                payload = payload.decode(r["charset"], "replace").encode()
            urls.append(r["url"])
            # WARC-Date is UTC by spec; the parsed datetime is naive, so
            # pin UTC before .timestamp() (host-TZ independence)
            eps.append(int(r["warc_ts"].replace(tzinfo=_utc).timestamp()))
            texts.append(payload.decode("utf-8"))
        return pd.DataFrame({"url": urls, "ts_epoch": eps,
                             "html_text": texts})

    udf = pandas_udf(_rt, out_t)
    d = _read(spark, sf_dir, "documents")
    e = d.withColumn("_r", udf(F.col("doc_id")))
    return e.select(
        "doc_id",
        F.col("_r.url").alias("url"),
        F.col("_r.ts_epoch").alias("ts_epoch"),
        F.col("_r.html_text").alias("html_text"),
    )


@q(
    "q68_wet_roundtrip",
    """
    SELECT doc_id,
           'https://w.example.com/docs/' || CAST(doc_id AS VARCHAR) AS url,
           text AS wet_text
    FROM documents
    """,
)
def q68_wet_roundtrip(spark, sf_dir):
    """WET (Common Crawl extracted-text) record round trip: a conversion
    record is built per doc from its text — gzipped for odd ids — and
    parsed back by the engine's WET parser. The documents text contains
    multi-byte UTF-8 (zh/de rows), so a byte-length/charset mistake in the
    record framing breaks the content-length walk and the oracle."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
    )

    from ..sources.warc import make_wet, parse_wet

    out_t = StructType(
        [
            StructField("url", StringType()),
            StructField("wet_text", StringType()),
        ]
    )

    def _rt(doc_id, text):
        urls, texts = [], []
        for i, t in zip(doc_id, text):
            i = int(i)
            url = f"https://w.example.com/docs/{i}"
            blob = make_wet([(url, t)], gzip_file=bool(i % 2))
            (r,) = parse_wet(blob)
            urls.append(r["url"])
            texts.append(r["text"])
        return pd.DataFrame({"url": urls, "wet_text": texts})

    udf = pandas_udf(_rt, out_t)
    d = _read(spark, sf_dir, "documents")
    e = d.withColumn("_r", udf(F.col("doc_id"), F.col("text")))
    return e.select(
        "doc_id",
        F.col("_r.url").alias("url"),
        F.col("_r.wet_text").alias("wet_text"),
    )


@q(
    "q69_robots_url_filter",
    """
    -- urls surviving the per-UA Disallow rules: ONE robots.txt per
    -- domain. Every domain's '*' group disallows /private/; domains with
    -- even-length source names add a specific 'tribeca' group disallowing
    -- only /secret/ (which REPLACES '*' for our UA and never matches
    -- these urls). Url path is /private/<id> for id % 3 = 0, else
    -- /docs/<id> — so blocked = multiples of 3 on odd-length domains.
    SELECT doc_id,
           'https://' || source || '.example.com'
             || CASE WHEN doc_id % 3 = 0
                     THEN '/private/' || CAST(doc_id AS VARCHAR)
                     ELSE '/docs/' || CAST(doc_id AS VARCHAR) END AS url
    FROM documents
    WHERE NOT (doc_id % 3 = 0 AND length(source) % 2 = 1)
    """,
)
def q69_robots_url_filter(spark, sf_dir):
    """Frontier politeness filter: urls anti-joined against the effective
    Disallow prefixes for the crawler's UA (sources/robots.disallow_rules).
    ONE robots body per DOMAIN (the real data shape — the rules dim is
    |domains|-sized and broadcasts; the frontier join stays linear), then
    path-startswith, then anti-join back. Even-length domains' specific
    'tribeca' group (/secret/) replaces '*' and never matches; odd-length
    domains' '*' group (/private/) blocks exactly the id%3==0 urls."""
    from ..sources.robots import disallow_rules

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    domain = F.concat(F.col("source"), F.lit(".example.com"))
    path = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit("/private/"), sid)
    ).otherwise(F.concat(F.lit("/docs/"), sid))
    frontier = d.select(
        "doc_id",
        domain.alias("domain"),
        F.concat(F.lit("https://"), domain, path).alias("url"),
        path.alias("path"),
    )
    txt = F.concat(
        F.when(
            F.length("source") % 2 == 0,
            F.lit("User-agent: tribeca\nDisallow: /secret/\n\n"),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *\nDisallow: /private/\n"),
    )
    robots = d.select(
        domain.alias("domain"), txt.alias("robots_txt")
    ).dropDuplicates(["domain"])
    rules = disallow_rules(robots, user_agent="tribeca")
    blocked = (
        frontier.join(F.broadcast(rules), "domain")
        .filter(F.col("path").startswith(F.col("path_prefix")))
        .select("url")
        .distinct()
    )
    return frontier.join(blocked, "url", "left_anti").select("doc_id", "url")


@q(
    "q95_recrawl_priority",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 = 0 OR doc_id % 4 = 0
                       THEN 1 ELSE 0 END AS INT) AS n_changes,
           CAST(2 AS INT) AS n_observations,
           CASE CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 = 0 OR doc_id % 4 = 0
                       THEN 1 ELSE 0 END
                WHEN 0 THEN '30d' WHEN 1 THEN '7d' ELSE '1d' END
             AS recrawl_interval
    FROM documents
    """,
)
def q95_recrawl_priority(spark, sf_dir):
    """Change-rate recrawl scheduling (plans/snapshot.py
    recrawl_priority): three synthesized snapshots (v2 touches doc_id%3,
    v3 touches doc_id%4), two snapshot_diff passes unioned, churn counted
    per page, interval bucketed 0→30d / 1→7d / 2+→1d — the freshness
    planner a recrawl frontier reads (Cho & Garcia-Molina 2003). One
    partial-agg groupBy + codegen CASE. Oracle: churn is closed-form in
    doc_id (diff(1,2) changes iff %3; diff(2,3) iff %3 or %4 — the
    appended version suffixes differ)."""
    from ..plans.snapshot import recrawl_priority, snapshot_diff

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")

    def snap(suffix_cond, suffix):
        return d.select(
            "doc_id",
            F.md5(
                F.concat(
                    F.col("text"),
                    F.when(suffix_cond, F.lit(suffix)).otherwise(F.lit("")),
                ).cast("binary")
            ).alias("page_hash"),
        )

    s1 = snap(F.lit(False), "")
    s2 = snap(F.col("doc_id") % 3 == 0, " v2")
    s3 = snap(F.col("doc_id") % 4 == 0, " v3")
    diffs = snapshot_diff(s1, s2, key="doc_id").unionByName(
        snapshot_diff(s2, s3, key="doc_id")
    ).select("doc_id", "status")
    return recrawl_priority(diffs, key="doc_id")


# --- wave: RSS/Atom feed source / frontier tick composition (q244-q245) ------


@q(
    "q244_feed_seed",
    """
    -- fixture: one feed per doc — RSS for even doc_id (one <item> with a
    -- text <link> + one decoy item with NO link, dropped), Atom for odd
    -- (one <entry> with href link). Visited = doc_id % 4 = 0, so the
    -- seed set is every unvisited doc's feed url.
    SELECT 'https://' || source || '.example.com/feed-docs/'
             || CAST(doc_id AS VARCHAR) AS URL,
           2 AS Status, '' AS Data,
           '' AS "MD File", '' AS "JSON File"
    FROM documents
    WHERE doc_id % 4 != 0
    """,
)
def q244_feed_seed(spark, sf_dir):
    """RSS/Atom feed source -> frontier seeding (sources/feeds.py
    feed_entries + seed_from_feeds): the freshness channel of the URL
    universe next to the sitemap source (q39; reference
    storage.py:85-117 analog). Both dialects parse in ONE JVM regexp
    pass (blocks first, fields inside blocks -- a missing <title>
    cannot steal the next item's), zero Python, zero shuffle until the
    same left-anti state join sitemap seeding uses, so the two sources
    compose into one frontier union. Fixture: RSS feeds (with a
    link-less decoy item) for even doc_ids, Atom for odd; visited =
    doc_id % 4 = 0."""
    from ..sources.feeds import feed_entries, seed_from_feeds

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://"), F.col("source"),
        F.lit(".example.com/feed-docs/"), sid,
    )
    rss = F.concat(
        F.lit("<rss><channel><item><title>Doc "), sid,
        F.lit("</title><link>"), url,
        F.lit("</link><pubDate>Mon, 01 Jan 2024</pubDate></item>"),
        F.lit("<item><title>decoy no link</title></item>"),
        F.lit("</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'),
        F.lit("<entry><title>Doc "), sid,
        F.lit('</title><link rel="alternate" href="'), url,
        F.lit('"/><updated>2024-01-01</updated></entry></feed>'),
    )
    feeds = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, rss).otherwise(atom)
        .alias("feed_xml"),
    )
    entries = feed_entries(feeds, keep_cols=("doc_id",))
    visited = d.filter(F.col("doc_id") % 4 == 0).select(
        url.alias("URL")
    )
    return seed_from_feeds(entries, visited)


@q(
    "q245_frontier_tick",
    """
    -- one full frontier tick: candidates minus visited (doc_id % 4 = 0),
    -- minus robots-disallowed (q69's rules: /private/ paths -- i.e.
    -- doc_id % 3 = 0 -- blocked on odd-length-source domains), politely
    -- scheduled per domain (delay = length(source) % 3 seconds, rank by
    -- url) and capped at 5 fetches per domain this tick.
    WITH cand AS (
      SELECT doc_id, source,
             source || '.example.com' AS domain,
             'https://' || source || '.example.com'
               || CASE WHEN doc_id % 3 = 0
                       THEN '/private/' || CAST(doc_id AS VARCHAR)
                       ELSE '/docs/' || CAST(doc_id AS VARCHAR) END
               AS url
      FROM documents
    ),
    surv AS (
      SELECT * FROM cand
      WHERE doc_id % 4 != 0
        AND NOT (doc_id % 3 = 0 AND length(source) % 2 = 1)
    ),
    r AS (
      SELECT domain, url, source, row_number() OVER (
        PARTITION BY domain ORDER BY url
      ) AS fetch_rank
      FROM surv
    )
    SELECT domain, url, CAST(fetch_rank AS INTEGER) AS fetch_rank,
           CAST((fetch_rank - 1) * (length(source) % 3) AS DOUBLE)
             AS scheduled_offset_sec
    FROM r WHERE fetch_rank <= 5
    """,
)
def q245_frontier_tick(spark, sf_dir):
    """ONE declarative frontier tick -- the reference's crawl loop
    (crawler.py queue management) as a single composed plan: sitemap/
    feed candidates -> left-anti visited state (plans/state.py shape)
    -> robots Disallow filter (sources/robots.disallow_rules, q69's
    semantics) -> per-domain politeness schedule (plans/frontier.py
    schedule_fetches) -> 5-per-domain tick cap. Every stage is an
    anti-join, broadcast dim join, or domain-partitioned window; at
    10^12 urls the state/frontier join buckets by url and everything
    else is domain-keyed. Fixture mirrors q69's robots and adds
    visited = doc_id % 4 = 0, delay = length(source) % 3 s."""
    from ..plans.frontier import schedule_fetches
    from ..sources.robots import disallow_rules

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    domain = F.concat(F.col("source"), F.lit(".example.com"))
    path = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit("/private/"), sid)
    ).otherwise(F.concat(F.lit("/docs/"), sid))
    cand = d.select(
        "doc_id",
        "source",
        domain.alias("domain"),
        F.concat(F.lit("https://"), domain, path).alias("url"),
        path.alias("path"),
    )
    visited = d.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("https://"), domain, path).alias("url")
    )
    unvisited = cand.join(visited, "url", "left_anti")
    txt = F.concat(
        F.when(
            F.length("source") % 2 == 0,
            F.lit("User-agent: tribeca\nDisallow: /secret/\n\n"),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *\nDisallow: /private/\n"),
    )
    robots = d.select(
        domain.alias("domain"), txt.alias("robots_txt")
    ).dropDuplicates(["domain"])
    rules = disallow_rules(robots, user_agent="tribeca")
    blocked = (
        unvisited.join(F.broadcast(rules), "domain")
        .filter(F.col("path").startswith(F.col("path_prefix")))
        .select("url")
        .distinct()
    )
    frontier = unvisited.join(blocked, "url", "left_anti").select(
        "source", "url"
    )
    delays = d.select(
        domain.alias("domain"),
        (F.length("source") % 3).cast("double").alias("crawl_delay"),
    ).dropDuplicates(["domain"])
    sched = schedule_fetches(frontier, delays)
    return sched.filter(F.col("fetch_rank") <= 5).select(
        "domain", "url", "fetch_rank", "scheduled_offset_sec"
    )


@q(
    "q255_sitemap_coverage",
    """
    -- sitemap lists even doc_ids; crawl visited doc_id % 3 != 0.
    WITH u AS (
      SELECT source || '.example.com' AS host,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) AS url,
             doc_id
      FROM documents
    ),
    j AS (
      SELECT host, url,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS in_s,
             CASE WHEN doc_id % 3 != 0 THEN 1 ELSE 0 END AS in_c
      FROM u
    ),
    a AS (
      SELECT host,
             CAST(sum(in_s) AS BIGINT) AS n_in_sitemap,
             CAST(sum(in_c) AS BIGINT) AS n_crawled,
             CAST(sum(in_s * in_c) AS BIGINT) AS n_both
      FROM j WHERE in_s = 1 OR in_c = 1 GROUP BY host
    )
    SELECT host, n_in_sitemap, n_crawled, n_both,
           n_in_sitemap - n_both AS n_sitemap_only,
           n_crawled - n_both AS n_crawled_only,
           CASE WHEN n_in_sitemap > 0
           THEN n_both * 1000000 // n_in_sitemap END
             AS crawl_coverage_micros,
           CASE WHEN n_crawled > 0
           THEN (n_crawled - n_both) * 1000000 // n_crawled END
             AS orphan_micros
    FROM a
    """,
)
def q255_sitemap_coverage(spark, sf_dir):
    """Per-host sitemap <-> crawl coverage audit (sources/sitemap.py
    sitemap_coverage): sitemap urls never crawled (frontier debt) vs
    crawled orphans absent from the sitemap (stale sitemap) -- the two
    gap lists of every crawl review. Composes sitemap_locs' real
    <loc> parse with the visited set; full-outer join on url (the
    state table's bucket key at scale) + one host partial agg.
    Fixture: sitemaps list even doc_ids, crawl visited doc_id%3!=0."""
    from ..sources.sitemap import sitemap_coverage, sitemap_locs

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    url = F.concat(F.lit("https://"), host, F.lit("/docs/"), sid)
    xml = F.concat(
        F.lit("<urlset><url><loc>"), url, F.lit("</loc></url></urlset>")
    )
    sitemaps = d.filter(F.col("doc_id") % 2 == 0).select(
        host.alias("host"), xml.alias("sitemap_xml")
    )
    locs = sitemap_locs(sitemaps, keep_cols=("host",))
    crawled = d.filter(F.col("doc_id") % 3 != 0).select(
        host.alias("host"), url.alias("url")
    )
    return sitemap_coverage(locs, crawled)


# --- wave: RFC 9309 wildcard robots matching (q265) ---------------------------


@q(
    "q265_google_robots",
    """
    SELECT doc_id,
           CASE doc_id % 6
             WHEN 0 THEN '/private/x'
             WHEN 1 THEN '/private/public'
             WHEN 2 THEN '/a/file.pdf'
             WHEN 3 THEN '/docs/guide'
             WHEN 4 THEN '/docs/tmp/x'
             ELSE '/home' END AS path,
           CAST(CASE doc_id % 6
             WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 0
             WHEN 3 THEN 1 WHEN 4 THEN 0 ELSE 1 END AS INT) AS allowed,
           CAST(CASE doc_id % 6
             WHEN 0 THEN 10 WHEN 1 THEN 16 WHEN 2 THEN 7
             WHEN 3 THEN 6 WHEN 4 THEN 9 ELSE 0 END AS BIGINT) AS spec
    FROM documents
    """,
)
def q265_google_robots(spark, sf_dir):
    """RFC 9309 / Google-style robots.txt matching (sources/robots.py
    google_robots_rules + google_robots_verdict): wildcard ``*`` and
    end-anchor ``$`` patterns, BOTH Allow and Disallow lines,
    most-specific (longest) match wins with Allow breaking ties — the
    semantics real crawlers implement and the stdlib RobotFileParser
    (the reference's parser, q49/q58/q69) treats as literal text.
    Rules pre-compile to regexes inside the Arrow parse; the verdict
    is a broadcast join + codegen rlike + one max(struct) partial agg
    — no window, no Python on the url path. Fixture: six path shapes
    per doc against a fixed 6-rule group; the oracle states every
    verdict and winning-rule specificity closed-form (wildcard hit,
    $-anchor exact allow, extension ban, prefix allow, deeper
    disallow override, no-match default)."""
    from ..sources.robots import google_robots_rules, google_robots_verdict

    d = _read(spark, sf_dir, "documents")
    robots = d.select(
        "doc_id",
        F.lit(
            "User-agent: *\n"
            "Disallow: /private/*\n"
            "Allow: /private/public$\n"
            "Disallow: /*.pdf$\n"
            "Allow: /docs/\n"
            "Disallow: /docs/tmp\n"
        ).alias("robots_txt"),
    )
    rules = google_robots_rules(robots, user_agent="tribeca")
    urls = d.select(
        "doc_id",
        F.element_at(
            F.array(
                F.lit("/private/x"), F.lit("/private/public"),
                F.lit("/a/file.pdf"), F.lit("/docs/guide"),
                F.lit("/docs/tmp/x"), F.lit("/home"),
            ),
            (F.col("doc_id") % 6 + 1).cast("int"),
        ).alias("path"),
    )
    return google_robots_verdict(urls, rules)


# --- wave: sitemap-index resolution (q266) ------------------------------------


@q(
    "q266_sitemap_index",
    """
    SELECT doc_id, '/p/' || doc_id || '/a' AS url, 'direct' AS via
    FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/b', 'direct' FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/c', 'direct' FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/a', 'index' FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/b', 'index' FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/c', 'index' FROM documents
    """,
)
def q266_sitemap_index(spark, sf_dir):
    """Sitemap-INDEX resolution (sources/sitemap.py
    resolve_sitemap_tree): the <sitemapindex> tier big sites serve —
    an index at /smi.xml referencing two child urlsets — resolved
    through ONE self equi-join of child <loc>s against the sitemap
    table on its url key (the crawl state store's bucketed key, so the
    hop co-locates at scale); plain urlsets emit via='direct', urls
    reached through the index via='index'. Fixture: per doc an index
    + two urlset bodies (2+1 page urls), so every page url appears
    once per tier and the oracle is a 6-row closed form. Namespace
    prefixes exercised on the index (<sm:loc>)."""
    from ..sources.sitemap import resolve_sitemap_tree

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    rows = []
    smi = F.concat(
        F.lit('<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
              'sitemap/0.9"><sitemap><sm:loc>https://h'), sid,
        F.lit("/sm1.xml</sm:loc></sitemap><sitemap><sm:loc>https://h"),
        sid, F.lit("/sm2.xml</sm:loc></sitemap></sitemapindex>"),
    )
    sm1 = F.concat(
        F.lit("<urlset><url><loc>/p/"), sid,
        F.lit("/a</loc></url><url><loc>/p/"), sid,
        F.lit("/b</loc></url></urlset>"),
    )
    sm2 = F.concat(
        F.lit("<urlset><url><loc>/p/"), sid,
        F.lit("/c</loc></url></urlset>"),
    )
    for url, xml in (
        (F.concat(F.lit("https://h"), sid, F.lit("/smi.xml")), smi),
        (F.concat(F.lit("https://h"), sid, F.lit("/sm1.xml")), sm1),
        (F.concat(F.lit("https://h"), sid, F.lit("/sm2.xml")), sm2),
    ):
        rows.append(d.select(
            "doc_id", url.alias("sitemap_url"), xml.alias("sitemap_xml")
        ))
    sitemaps = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return resolve_sitemap_tree(sitemaps, key_cols=("doc_id",))


@q(
    "q267_robots_meta",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 4 IN (1, 3) THEN 1 ELSE 0 END
                AS INT) AS noindex,
           CAST(CASE WHEN doc_id % 4 IN (2, 3) THEN 1 ELSE 0 END
                AS INT) AS nofollow,
           CAST(CASE WHEN doc_id % 4 IN (1, 3) THEN 0 ELSE 1 END
                AS INT) AS indexable
    FROM documents
    """,
)
def q267_robots_meta(spark, sf_dir):
    """Robots-meta directive flags (operators/meta.py
    robots_meta_flags): noindex/nofollow/'none' tokens from
    <meta name=robots> — the page-level half of crawl politeness the
    reference's SEO extractor skips (crawler.py reads only
    meta[name=description]). Attribute ORDER and quote style vary by
    parity in the fixture; 'none' (= noindex,nofollow) exercised;
    absent tag defaults indexable. Entirely JVM regexp + one tiny
    partial-agg groupBy — zero Python, zero corpus shuffle."""
    from ..operators.meta import robots_meta_flags

    return robots_meta_flags(_meta_pages(spark, sf_dir))


# --- wave: feed enclosures + OPML subscriptions (q275-q276) -------------------


@q(
    "q275_feed_enclosures",
    """
    SELECT doc_id,
           'https://cdn.example.org/ep' || doc_id || '.mp3'
             AS enclosure_url,
           'audio/mpeg' AS mime,
           CAST(1000 + doc_id AS BIGINT) AS n_bytes
    FROM documents
    UNION ALL
    SELECT doc_id, 'https://cdn.example.org/clip' || doc_id || '.mp4',
           'video/mp4', CAST(-1 AS BIGINT)
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q275_feed_enclosures(spark, sf_dir):
    """RSS enclosure extraction (sources/feeds.py feed_enclosures):
    the podcast/video attachment relation a multimodal ingest reads to
    build its fetch list (composes with q29/q53's header sniffers
    downstream). Junk length attributes try_cast to -1 instead of
    failing ANSI; every-3rd doc adds a self-closing video enclosure
    with an EMPTY length and flipped attr order. Codegen end to end,
    zero shuffle."""
    from ..sources.feeds import feed_enclosures

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit('<rss><channel><item><enclosure url='
              '"https://cdn.example.org/ep'), sid,
        F.lit('.mp3" length="'), (F.col("doc_id") + 1000).cast("string"),
        F.lit('" type="audio/MPEG"></item>'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<item><enclosure type="video/mp4" length="" '
                      'url="https://cdn.example.org/clip'), sid,
                F.lit('.mp4"/></item>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</channel></rss>"),
    )
    return feed_enclosures(
        d.select("doc_id", xml.alias("feed_xml")),
        keep_cols=("doc_id",),
    )


@q(
    "q276_opml_feeds",
    """
    SELECT doc_id,
           'https://h' || doc_id || '/feed.xml' AS feed_url,
           'https://h' || doc_id || '/' AS site_url,
           'Blog ' || doc_id AS title
    FROM documents
    """,
)
def q276_opml_feeds(spark, sf_dir):
    """OPML subscription-list source (sources/feeds.py opml_feeds):
    the export format feed readers interchange — folder outlines
    (no xmlUrl) are structural and dropped, subscription outlines
    yield the feed-url dimension feed_entries (q244) consumes, so
    OPML → feeds → entries → frontier composes as three codegen
    stages. Fixture: one folder + one subscription per doc."""
    from ..sources.feeds import opml_feeds

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit('<opml><body><outline text="Folder"><outline '
              'text="Blog '), sid,
        F.lit('" xmlUrl="https://h'), sid,
        F.lit('/feed.xml" htmlUrl="https://h'), sid,
        F.lit('/"/></outline></body></opml>'),
    )
    return opml_feeds(
        d.select("doc_id", xml.alias("opml_xml")),
        keep_cols=("doc_id",),
    )


# --- wave: HTTP cache-policy TTL (q283) ---------------------------------------


@q(
    "q283_cache_policy",
    """
    WITH base AS (
      SELECT doc_id, 1704067200 + doc_id AS fts,
             CASE doc_id % 5
               WHEN 0 THEN 3600 WHEN 1 THEN 0 WHEN 2 THEN 600
               WHEN 3 THEN 120 ELSE 86400 END AS ttl,
             CASE WHEN doc_id % 5 IN (0, 1) THEN 1 ELSE 0 END AS hv
      FROM documents
    )
    SELECT 'https://h' || doc_id || '/p' AS url,
           CAST(ttl AS BIGINT) AS ttl_s,
           CAST(fts + ttl AS BIGINT) AS recrawl_after,
           CAST(hv AS INT) AS has_validator
    FROM base
    """,
)
def q283_cache_policy(spark, sf_dir):
    """HTTP cache-policy TTL for recrawl scheduling (plans/frontier.py
    cache_policy; RFC 9111 precedence): no-store/no-cache/max-age=0
    beat s-maxage beat max-age beat Expires beat the crawler default —
    the server-declared freshness signal q95's recrawl model should
    trust first, with ETag/Last-Modified flagged for cheap 304
    revalidation. Fixture covers all five precedence shapes (incl.
    s-maxage overriding max-age in one header). Pure codegen Project
    on the fetch log."""
    from ..plans.frontier import cache_policy

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    cc = F.element_at(
        F.array(F.lit("max-age=3600"), F.lit("no-store"),
                F.lit("s-maxage=600, max-age=60"), F.lit(""),
                F.lit("")),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    headers = d.select(
        F.concat(F.lit("https://h"), sid, F.lit("/p")).alias("url"),
        (F.lit(1704067200) + F.col("doc_id")).cast("long")
        .alias("fetch_ts"),
        cc.alias("cache_control"),
        F.when(F.col("doc_id") % 5 == 3, F.lit(120))
        .otherwise(F.lit(None)).cast("bigint").alias("expires_delta_s"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit('W/"x'), sid, F.lit('"')))
        .otherwise(F.lit("")).alias("etag"),
        F.when(F.col("doc_id") % 5 == 1,
               F.lit("Mon, 01 Jan 2024 00:00:00 GMT"))
        .otherwise(F.lit("")).alias("last_modified"),
    )
    return cache_policy(headers)


# --- wave: crawl traps + PII pseudonyms (q284-q285) ---------------------------


@q(
    "q284_crawl_traps",
    """
    WITH hosts AS (
      SELECT 'h' || (doc_id % 25) AS host,
             CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1
    )
    SELECT host, '/cal/N' AS template, n AS n_urls,
           CAST(1 AS BIGINT) AS n_hashes,
           CAST(CASE WHEN n >= 8 AND n >= 10 THEN 1 ELSE 0 END AS INT)
             AS trap
    FROM hosts
    UNION ALL
    SELECT host, '/art/N', n, n,
           CAST(CASE WHEN n >= 8 AND n >= 10 * n THEN 1 ELSE 0 END
                AS INT)
    FROM hosts
    """,
)
def q284_crawl_traps(spark, sf_dir):
    """Crawl-trap detection (functions/urlnorm.py crawl_trap_score):
    URL templates that fan out into many URLs with barely any
    distinct content — infinite calendars, session paginators. The
    frontier anti-joins candidates against trap templates BEFORE
    fetching (the only way to win against a trap). Fixture: every
    host serves a /cal/N template whose pages all hash identically
    (trap) and an /art/N template with unique content (healthy); the
    oracle states the verdict as the same n_urls/n_hashes FORMULA so
    it holds at every SF."""
    from ..functions.urlnorm import crawl_trap_score

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    hid = (F.col("doc_id") % 25).cast("string")
    pages = d.select(
        F.concat(F.lit("https://h"), hid, F.lit("/cal/"), sid)
        .alias("url"),
        F.md5(F.concat(F.lit("trap-"), hid)).alias("content_hash"),
    ).unionByName(d.select(
        F.concat(F.lit("https://h"), hid, F.lit("/art/"), sid)
        .alias("url"),
        F.md5(F.concat(F.lit("art-"), sid)).alias("content_hash"),
    ))
    return crawl_trap_score(pages)


# --- wave: sitemap freshness metadata (q288) ----------------------------------


@q(
    "q288_sitemap_meta",
    """
    SELECT doc_id, '/p/' || doc_id AS url,
           '2024-01-' || CASE WHEN doc_id % 28 + 1 < 10 THEN '0' ELSE ''
             END || (doc_id % 28 + 1) AS lastmod,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN (doc_id % 10) * 100000 ELSE -1 END AS BIGINT)
             AS priority_micros,
           CASE WHEN doc_id % 3 = 0 THEN 'daily' ELSE '' END
             AS changefreq
    FROM documents
    UNION ALL
    SELECT doc_id, '/q/' || doc_id, '', CAST(-1 AS BIGINT), ''
    FROM documents
    """,
)
def q288_sitemap_meta(spark, sf_dir):
    """Sitemap freshness metadata (sources/sitemap.py
    sitemap_url_meta): lastmod / priority / changefreq per <url>
    block — the publisher-declared change signals a recrawl scheduler
    reads before spending a single fetch (lastmod vs state-table
    last-crawl is the cheapest change detector there is; priority /
    changefreq are priors for q95). Blocks isolate first so missing
    fields can't steal a neighbor's; junk priorities try_cast to -1;
    a bare-loc second entry proves the defaults. Codegen end to
    end."""
    from ..sources.sitemap import sitemap_url_meta

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    day = (F.col("doc_id") % 28 + 1).cast("string")
    day2 = F.lpad(day, 2, "0")
    xml = F.concat(
        F.lit("<urlset><url><loc>/p/"), sid,
        F.lit("</loc><lastmod>2024-01-"), day2, F.lit("</lastmod>"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("<priority>0."),
                     (F.col("doc_id") % 10).cast("string"),
                     F.lit("</priority>")),
        ).otherwise(F.lit("<priority>junk</priority>")),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("<changefreq>DAILY</changefreq>"))
        .otherwise(F.lit("")),
        F.lit("</url><url><loc>/q/"), sid,
        F.lit("</loc></url></urlset>"),
    )
    return sitemap_url_meta(
        d.select("doc_id", xml.alias("sitemap_xml")),
        keep_cols=("doc_id",),
    )


# --- wave: WARC response metadata (q289) --------------------------------------


@q(
    "q289_warc_meta",
    """
    SELECT doc_id, 'https://w/ok/' || doc_id AS url,
           CAST(200 AS INT) AS status, 'text/html' AS content_type,
           CAST(7 + (doc_id % 7) AS BIGINT) AS n_bytes
    FROM documents
    UNION ALL
    SELECT doc_id, 'https://w/gone/' || doc_id,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 404 ELSE 503 END AS INT),
           'text/html', CAST(4 AS BIGINT)
    FROM documents
    """,
)
def q289_warc_meta(spark, sf_dir):
    """WARC response-metadata relation (sources/warc.py parse_warc
    status/content-type/size fields + read_warc_meta): the fetch-log
    view crawl health ops consume WITHOUT shipping payload bytes —
    status-code health per host, soft-404 candidates (q191),
    content-type routing to the right extractor, size anomalies.
    Fixture: per doc a 200 page with id-varying payload length plus a
    404/503 error record; the engine's real WARC parser (header walk,
    HTTP status line, Content-Type split) recovers every field the
    oracle states closed-form."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    from ..sources.warc import make_warc, parse_warc

    rec_t = ArrayType(StructType([
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("n_bytes", LongType()),
    ]))

    @pandas_udf(rec_t)
    def _meta(doc_id):
        out = []
        for i in doc_id:
            i = int(i)
            blob = make_warc([
                (f"https://w/ok/{i}", f"<p>{'x' * (i % 7)}</p>",
                 "utf-8"),
                (f"https://w/gone/{i}", "gone", "utf-8",
                 404 if i % 2 == 0 else 503),
            ])
            out.append([
                (r["url"], r["status"], r["content_type"], r["n_bytes"])
                for r in parse_warc(blob)
            ])
        return pd.Series(out)

    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(_meta(F.col("doc_id"))).alias("_r")
    ).select(
        "doc_id",
        F.col("_r.url").alias("url"),
        F.col("_r.status").alias("status"),
        F.col("_r.content_type").alias("content_type"),
        F.col("_r.n_bytes").alias("n_bytes"),
    )


@q(
    "q297_sitemap_robots_conflict",
    """
    SELECT doc_id, CAST(2 AS BIGINT) AS n_sitemap_urls,
           CAST(1 AS BIGINT) AS n_disallowed
    FROM documents
    """,
)
def q297_sitemap_robots_conflict(spark, sf_dir):
    """Sitemap-vs-robots conflict audit (composition: q288's
    sitemap_url_meta x q265's google_robots_verdict): urls a site
    ADVERTISES in its sitemap while its robots.txt FORBIDS them — the
    classic crawl-config contradiction Search Console flags, and a
    frontier must resolve (robots wins). Per host: advertised urls
    and how many are disallowed. Operators compose because both
    relations key on the url; the verdict side broadcasts its rule
    dim exactly as in q265."""
    from ..sources.robots import google_robots_rules, google_robots_verdict
    from ..sources.sitemap import sitemap_url_meta

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit("<urlset><url><loc>https://h"), sid,
        F.lit("/pub/"), sid, F.lit("</loc></url><url><loc>https://h"),
        sid, F.lit("/private/"), sid,
        F.lit("</loc></url></urlset>"),
    )
    locs = sitemap_url_meta(
        d.select("doc_id", xml.alias("sitemap_xml")),
        keep_cols=("doc_id",),
    ).select(
        "doc_id",
        F.regexp_extract("url", r"^https?://[^/]+(/.*)$", 1)
        .alias("path"),
    )
    robots = d.select(
        "doc_id",
        F.lit("User-agent: *\nDisallow: /private/*\n")
        .alias("robots_txt"),
    )
    rules = google_robots_rules(robots, user_agent="tribeca")
    verdicts = google_robots_verdict(locs, rules)
    return verdicts.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_sitemap_urls"),
        F.sum(1 - F.col("allowed")).cast("bigint")
        .alias("n_disallowed"),
    )


# --- wave: frontier intake composition (q316) ---------------------------------


@q(
    "q316_frontier_intake",
    """
    WITH g AS (SELECT doc_id, CAST(doc_id % 5 AS VARCHAR) AS gg,
                      CAST(doc_id AS VARCHAR) AS sid, doc_id % 4 AS m
               FROM documents)
    SELECT
      CASE m
        WHEN 0 THEN 'https://WWW.Shop' || gg || '.example.co.uk/p/' || sid
                 || '?utm_source=x&b=2&a=1#f'
        WHEN 1 THEN 'http://spam' || gg || '.badsite.com/x/' || sid
        WHEN 2 THEN 'https://news.example.org/a/' || sid
        ELSE 'https://example.net:443/' || sid
      END AS url,
      CASE m
        WHEN 0 THEN 'https://www.shop' || gg || '.example.co.uk/p/' || sid
                 || '?a=1&b=2'
        WHEN 1 THEN 'http://spam' || gg || '.badsite.com/x/' || sid
        WHEN 2 THEN 'https://news.example.org/a/' || sid
        ELSE 'https://example.net/' || sid
      END AS canon,
      CASE m
        WHEN 0 THEN 'uk,co,example,shop' || gg || ')/p/' || sid
                 || '?a=1&b=2'
        WHEN 1 THEN 'com,badsite,spam' || gg || ')/x/' || sid
        WHEN 2 THEN 'org,example,news)/a/' || sid
        ELSE 'net,example)/' || sid
      END AS surt,
      CASE m
        WHEN 0 THEN 'example.co.uk' WHEN 1 THEN 'badsite.com'
        WHEN 2 THEN 'example.org' ELSE 'example.net'
      END AS registrable,
      CASE m WHEN 1 THEN 1 ELSE 0 END AS blocked
    FROM g
    """,
)
def q316_frontier_intake(spark, sf_dir):
    """Frontier-intake composition capstone: raw URL → canonical form
    (tracking strip + query sort + default-port drop, q41/q80) →
    SURT layout key (q305) → PSL registrable domain (q306) →
    registrable-level blocklist verdict — the exact normalize-and-
    admit relation a crawl scheduler materializes before enqueueing.
    Every stage is an existing audited operator; the composition
    proves they agree on one row (the canonical host feeds both the
    SURT and the PSL lookup, and the blocklist joins on REGISTRABLE,
    so spam subdomains can't dodge the block). Codegen end-to-end;
    the only joins are the broadcast PSL dim and the broadcast
    blocklist."""
    from ..functions.urlnorm import (
        canonical_url,
        registrable_domains,
        surt_key,
        surt_prefix,
    )

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    gg = (F.col("doc_id") % 5).cast("string")
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(
            F.lit("https://WWW.Shop"), gg, F.lit(".example.co.uk/p/"),
            sid, F.lit("?utm_source=x&b=2&a=1#f")))
        .when(m == 1, F.concat(
            F.lit("http://spam"), gg, F.lit(".badsite.com/x/"), sid))
        .when(m == 2, F.concat(
            F.lit("https://news.example.org/a/"), sid))
        .otherwise(F.concat(F.lit("https://example.net:443/"), sid))
    )
    base = d.select(url.alias("url")).select(
        "url",
        canonical_url(F.col("url"), strip_tracking=True).alias("canon"),
    )
    withhost = base.select(
        "url", "canon",
        surt_key("canon", strip_www=True).alias("surt"),
        F.regexp_extract(
            F.col("canon"), r"^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1
        ).alias("host"),
    )
    regs = registrable_domains(withhost.select("host"))
    block = spark.createDataFrame([("badsite.com",)], "registrable string")
    return (
        withhost
        .join(F.broadcast(regs.select("host", "registrable")), "host")
        .join(
            F.broadcast(block.withColumn("_b", F.lit(1))),
            "registrable", "left",
        )
        .select(
            "url", "canon", "surt", "registrable",
            F.coalesce("_b", F.lit(0)).cast("int").alias("blocked"),
        )
    )


# --- wave: change-rate recrawl scheduling (q328) ------------------------------


@q(
    "q328_change_rate_schedule",
    """
    SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
           4 AS n_captures,
           CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 0 END
             AS n_changes,
           CAST(259200 AS BIGINT) AS span_s,
           CASE doc_id % 3 WHEN 0 THEN CAST(1000000 AS BIGINT)
             WHEN 1 THEN CAST(333333 AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS lambda_micros_per_day,
           CASE doc_id % 3 WHEN 0 THEN CAST(750000 AS BIGINT)
             WHEN 1 THEN CAST(1500000 AS BIGINT)
             ELSE CAST(3000000 AS BIGINT) END AS revisit_days_micros
    FROM documents
    """,
)
def q328_change_rate_schedule(spark, sf_dir):
    """Change-rate estimation → adaptive revisit scheduling (plans/
    snapshot.py change_rate_schedule; Cho & Garcia-Molina TOIT'03):
    per-url Poisson-rate estimate from the full capture history and a
    proportional revisit period — the observed-behavior side the
    scheduler reconciles against q283's publisher-declared TTLs, and
    the whole-history upgrade of q95's last-delta ranking. Fixture:
    4 daily captures per url with always/once/never-changing hash
    strata; every rate and period stated closed-form in exact integer
    micros. One bounded url-partitioned lag window + one partial-agg
    groupBy."""
    from ..plans.snapshot import change_rate_schedule

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    caps = d.select(
        F.concat(F.lit("u"), sid).alias("url"),
        m.alias("_m"),
        F.posexplode(
            F.array(*[F.lit(f"2026-01-0{k} 00:00:00") for k in (1, 2, 3, 4)])
        ).alias("_k", "_ts"),
    ).select(
        "url",
        F.to_timestamp("_ts").alias("warc_ts"),
        F.when(F.col("_m") == 0, F.concat(F.lit("h"), F.col("_k")))
        .when(F.col("_m") == 1,
              F.when(F.col("_k") < 2, F.lit("h0")).otherwise(F.lit("h1")))
        .otherwise(F.lit("h0")).alias("content_hash"),
    )
    return change_rate_schedule(caps)


# --- wave: declared-vs-observed change-rate calibration (q330) ----------------


@q(
    "q330_changefreq_calibration",
    """
    SELECT 'daily' AS changefreq,
           (SELECT count(*) FROM documents WHERE doc_id % 3 = 0)
             AS n_urls,
           CAST(1000000 AS BIGINT) AS mean_lambda_micros
    UNION ALL
    SELECT 'weekly',
           (SELECT count(*) FROM documents WHERE doc_id % 3 = 1),
           CAST(333333 AS BIGINT)
    UNION ALL
    SELECT 'never',
           (SELECT count(*) FROM documents WHERE doc_id % 3 = 2),
           CAST(0 AS BIGINT)
    """,
)
def q330_changefreq_calibration(spark, sf_dir):
    """Declared-vs-observed change-rate calibration: sitemap
    changefreq declarations (q288's channel) joined against the
    observed Poisson rates from capture history (q328) and rolled up
    per declared class — the data-quality question every adaptive
    scheduler must answer before trusting publisher hints ('do
    daily-declared pages actually change daily?'). Fixture ties each
    declared class to a distinct observed-rate stratum so the
    calibration table is closed-form; in production the interesting
    rows are the miscalibrated ones. One url-keyed join + one
    partial-agg groupBy on the tiny changefreq key."""
    from ..plans.snapshot import change_rate_schedule

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    caps = d.select(
        F.concat(F.lit("u"), sid).alias("url"),
        m.alias("_m"),
        F.posexplode(
            F.array(*[F.lit(f"2026-01-0{k} 00:00:00") for k in (1, 2, 3, 4)])
        ).alias("_k", "_ts"),
    ).select(
        "url",
        F.to_timestamp("_ts").alias("warc_ts"),
        F.when(F.col("_m") == 0, F.concat(F.lit("h"), F.col("_k")))
        .when(F.col("_m") == 1,
              F.when(F.col("_k") < 2, F.lit("h0")).otherwise(F.lit("h1")))
        .otherwise(F.lit("h0")).alias("content_hash"),
    )
    rates = change_rate_schedule(caps)
    declared = d.select(
        F.concat(F.lit("u"), sid).alias("url"),
        F.when(m == 0, "daily").when(m == 1, "weekly")
        .otherwise("never").alias("changefreq"),
    )
    return (
        rates.join(declared, "url")
        .groupBy("changefreq")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.floor(F.avg("lambda_micros_per_day")).cast("bigint")
            .alias("mean_lambda_micros"),
        )
    )


@q(
    "q334_gzip_sitemap_locs",
    """
    SELECT doc_id, 'https://gz.example.com/a' AS url
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'https://gz.example.com/b'
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'https://plain.example.com/c'
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q334_gzip_sitemap_locs(spark, sf_dir):
    """Gzipped sitemap ingestion (sources/sitemap.py gunzip_text →
    sitemap_locs): real sitemap fleets serve sitemap.xml.gz (the
    sitemaps.org spec allows gzip; Common Crawl seeds arrive
    compressed), so the decompression column is the missing first
    step before the existing codegen <loc> parse. Tolerant-reader
    matrix proven by the oracle: gzipped payloads decode (2 locs),
    plain XML passes through unchanged (1 loc), corrupt bytes
    wearing the gzip magic yield NULL and emit nothing. Blobs enter
    via unbase64 literals — bit-deterministic (gzip mtime=0). Plan:
    Scan → ArrowEvalPython → codegen explode, zero shuffle."""
    from ..sources.sitemap import gunzip_text, sitemap_locs

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    blob = (
        F.when(m == 0, F.unbase64(F.lit(_GZ_SITEMAP_B64)))
        .when(m == 1, F.encode(F.lit(
            '<?xml version="1.0"?><urlset><url>'
            "<loc>https://plain.example.com/c</loc></url></urlset>"),
            "UTF-8"))
        .otherwise(F.unbase64(F.lit(_GZ_CORRUPT_B64)))
    )
    sitemaps = d.select(
        "doc_id", gunzip_text(blob).alias("sitemap_xml")
    )
    return sitemap_locs(sitemaps, keep_cols=("doc_id",))


# --- wave: robots drift + budget apportionment (q350-q351) --------------------


@q(
    "q350_robots_drift",
    """
    SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
      CASE doc_id % 3 WHEN 1 THEN 1 ELSE 0 END AS n_added,
      CASE doc_id % 3 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 0 END
        AS n_removed,
      CASE doc_id % 3 WHEN 1 THEN 1 ELSE 0 END AS tightened,
      CASE WHEN doc_id % 3 IN (1, 2) THEN 1 ELSE 0 END AS loosened
    FROM documents
    """,
)
def q350_robots_drift(spark, sf_dir):
    """Robots-policy drift between crawl snapshots (sources/
    robots.py robots_policy_drift): Disallow-rule set diff per host —
    added rules TIGHTEN policy (frontier re-filter + q304-style
    retro-exclusion), removed rules LOOSEN it (URL space unlocked
    for the next tick). Fixture: unchanged hosts, a swap host (one
    added + one removed — both flags fire), and a host dropping all
    rules. Two host-keyed anti-joins + one rollup; closed-form."""
    from ..sources.robots import robots_policy_drift

    d = _read(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), F.col("doc_id").cast("string"))
    m = F.col("doc_id") % 3
    old = d.select(
        host.alias("host"),
        F.lit("User-agent: *\nDisallow: /a\nDisallow: /b\n")
        .alias("robots_txt"),
    )
    new = d.select(
        host.alias("host"),
        F.when(m == 0, F.lit(
            "User-agent: *\nDisallow: /a\nDisallow: /b\n"))
        .when(m == 1, F.lit(
            "User-agent: *\nDisallow: /a\nDisallow: /c\n"))
        .otherwise(F.lit("User-agent: *\n")).alias("robots_txt"),
    )
    return robots_policy_drift(old, new)
