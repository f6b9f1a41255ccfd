"""URL-space: normalization, SURT, params, redirects, canonical chains.

Driver-contract queries (split from the monolithic entry_queries.py in r5);
each function is registered into the shared ``QUERIES``/``ORACLE`` dicts by
the ``@q`` decorator from ``_shared`` at import time.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


@q(
    "q08_external_urls",
    """
    SELECT DISTINCT ext_url FROM (
      SELECT 'https://ext' || (doc_id % 5) || '.example.org/page' AS ext_url
      FROM documents
      UNION ALL
      SELECT 'https://nav.example.net/x' FROM documents
    ) ORDER BY ext_url
    """,
)
def q08_external_urls(spark, sf_dir):
    return tfops.external_urls_global(_extracted(spark, sf_dir))


@q(
    "q36_external_urls_md_doc",
    """
    WITH ext AS (
      SELECT DISTINCT 'https://ext' || (doc_id % 5) || '.example.org/page' AS u
      FROM documents
      UNION
      SELECT DISTINCT 'https://nav.example.net/x' FROM documents
    )
    SELECT '# External URLs' || chr(10) || chr(10)
           || string_agg('- ' || u, chr(10) ORDER BY u) || chr(10) AS doc
    FROM ext
    """,
)
def q36_external_urls_md_doc(spark, sf_dir):
    """Complete external_urls.md document (csv.py:60-83 + MD_HEADER)."""
    from ..operators.sinks import external_urls_markdown_doc

    return external_urls_markdown_doc(_extracted(spark, sf_dir))


@q(
    "q41_url_canonical",
    """
    SELECT doc_id,
      CASE doc_id % 3
        WHEN 0 THEN 'https://' || lower(source) || '.example.com/P/' || doc_id
        WHEN 1 THEN 'http://' || lower(source) || '.example.com/Docs/' || doc_id
                    || '?a=' || (doc_id % 5) || '&b=2'
        ELSE 'http://' || lower(source) || '.example.com/q/' || doc_id
      END AS canon_url
    FROM documents
    """,
)
def q41_url_canonical(spark, sf_dir):
    """URL canonicalization (native Column ops): case-insensitive
    scheme/host, default-port strip, fragment drop, empty-query drop,
    query-param sort. Messy variants synthesized per doc; oracle states
    the canonical form in closed form."""
    from ..functions.urlnorm import canonical_url

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    messy = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("HTTPS://"), F.upper("source"),
                     F.lit(".EXAMPLE.com:443/P/"), sid, F.lit("#sec")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("http://"), F.col("source"),
                     F.lit(".Example.COM:80/Docs/"), sid,
                     F.lit("?b=2&a="), (F.col("doc_id") % 5).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("HTTP://"), F.col("source"),
                     F.lit(".example.com/q/"), sid, F.lit("?")),
        )
    )
    return d.select(
        "doc_id", canonical_url(messy).alias("canon_url")
    )


@q(
    "q80_url_tracking_strip",
    """
    SELECT doc_id,
           'HTTP://' || source || '.Example.COM:80/Docs/' || doc_id ||
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN '?utm_source=feed&b=2&a=1'
               WHEN 1 THEN '?gclid=' || doc_id || '&z=9'
               ELSE '?utm_campaign=x&fbclid=y' END
             || '#frag' || doc_id AS url,
           'http://' || source || '.example.com/Docs/' || doc_id ||
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN '?a=1&b=2'
               WHEN 1 THEN '?z=9'
               ELSE '' END AS canon
    FROM documents
    """,
)
def q80_url_tracking_strip(spark, sf_dir):
    """URL hygiene for frontier/dedup keys (functions/urlnorm.py with
    strip_tracking=True): lowercase scheme+host, drop default port and
    fragment, strip utm_*/gclid/fbclid-class params, sort the rest. The
    oracle states the expected canonical form in closed form per
    doc_id%3 case — including the all-params-stripped empty-query case."""
    from ..functions.urlnorm import canonical_url

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("HTTP://"), F.col("source"), F.lit(".Example.COM:80/Docs/"),
        sid,
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("?gclid="), sid, F.lit("&z=9")))
        .otherwise(F.lit("?utm_campaign=x&fbclid=y")),
        F.lit("#frag"), sid,
    )
    return d.select(
        "doc_id", url.alias("url"),
        canonical_url(url, strip_tracking=True).alias("canon"),
    )


# --- round-3 cont.: distribution stats, recrawl diff, link graph, ---------
# --- CCNet buckets, anchor aggregation, blocklist curation -----------------


@q(
    "q81_length_percentiles",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 4) AS p50,
           round(quantile_cont(n_chars, 0.9), 4) AS p90,
           round(quantile_cont(n_chars, 0.99), 4) AS p99
    FROM documents GROUP BY lang
    """,
)
def q81_length_percentiles(spark, sf_dir):
    """Per-language document-length distribution
    (operators/textstats.py length_percentiles): exact interpolated
    p50/p90/p99 — the report a mixture/length-filter decision reads
    first. Exact `percentile` matches DuckDB's quantile_cont definition;
    the 10^12-row path swaps in the mergeable KLL sketch
    (percentile_approx) with the same call shape."""
    from ..operators.textstats import length_percentiles

    return length_percentiles(_read(spark, sf_dir, "documents"))


@q(
    "q160_url_patterns",
    """
    WITH u AS (
      SELECT 'https://h' || (doc_id % 5) || '.example.com' ||
        CASE WHEN doc_id % 7 = 0
               THEN '/archive/' || (2000 + doc_id % 25) || '/'
                    || (doc_id % 12 + 1)
             WHEN doc_id % 3 = 0
               THEN '/blog/' || doc_id || '/comments'
             ELSE '/docs/' || doc_id END AS url
      FROM documents
    )
    SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)
             AS host,
           regexp_replace(
             regexp_extract(url,
               '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?', 1),
             '[0-9]+', '{n}', 'g') AS path_template,
           CAST(count(*) AS BIGINT) AS n_urls,
           min(url) AS sample_url
    FROM u GROUP BY 1, 2
    """,
)
def q160_url_patterns(spark, sf_dir):
    """URL path-template mining (functions/urlnorm.py:
    url_path_templates): digit runs masked to {n}, counted per host —
    the calendar/pagination/session-trap detector a crawl frontier
    budgets patterns (not pages) with. URLs are synthesized
    deterministically with three route shapes (/archive/{yyyy}/{n},
    /blog/{id}/comments, /docs/{id}); the oracle replays the same
    regex pair. Two codegen regexps + one map-combined agg on the
    site-structure-sized (host, template) key."""
    from ..functions.urlnorm import url_path_templates

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id")
    u = d.select(
        F.concat(
            F.lit("https://h"), (sid % 5).cast("string"),
            F.lit(".example.com"),
            F.when(
                sid % 7 == 0,
                F.concat(
                    F.lit("/archive/"),
                    (sid % 25 + 2000).cast("string"),
                    F.lit("/"),
                    (sid % 12 + 1).cast("string"),
                ),
            )
            .when(
                sid % 3 == 0,
                F.concat(
                    F.lit("/blog/"), sid.cast("string"),
                    F.lit("/comments"),
                ),
            )
            .otherwise(F.concat(F.lit("/docs/"), sid.cast("string"))),
        ).alias("url")
    )
    return url_path_templates(u)


@q(
    "q161_mirror_hosts",
    """
    WITH pages AS (
      SELECT 'h' || (doc_id % 5) || '.example.com' AS host, text
      FROM documents
      UNION ALL
      SELECT 'mirror.example.net', text FROM documents
      WHERE doc_id % 4 = 0
    ),
    a AS (
      SELECT md5(text) AS content_key,
             CAST(count(*) AS BIGINT) AS n_pages,
             CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
             string_agg(DISTINCT host, ',' ORDER BY host) AS hosts
      FROM pages GROUP BY 1
    )
    SELECT content_key, n_hosts, n_pages, hosts
    FROM a WHERE n_hosts >= 2
    """,
)
def q161_mirror_hosts(spark, sf_dir):
    """Cross-host mirror detection (operators/dedup.py:mirror_hosts):
    verbatim content on ≥2 distinct hosts, surfaced (not silently
    collapsed) for crawl planning and scraper-farm blocklisting. Every
    doc_id%4==0 document gets a deterministic mirror on a second host;
    the oracle restates the construction and the hash-keyed host
    aggregation closed-form. One content-hash partial agg; text never
    shuffles — only (hash, host) pairs."""
    from ..operators.dedup import mirror_hosts

    d = _read(spark, sf_dir, "documents")
    base = d.select(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        "text",
    )
    mirrored = d.filter(F.col("doc_id") % 4 == 0).select(
        F.lit("mirror.example.net").alias("host"), "text"
    )
    return mirror_hosts(base.unionByName(mirrored))


# --- wave: hreflang reciprocity + canonical chains (q271-q272) ----------------


@q(
    "q271_hreflang_audit",
    """
    WITH e AS (
      SELECT 'https://h' || doc_id || '/en' AS url,
             'https://h' || doc_id || '/fr' AS alt_url, 'fr' AS lang,
             1 AS reciprocal
      FROM documents
      UNION ALL
      SELECT 'https://h' || doc_id || '/en',
             'https://h' || doc_id || '/de', 'de', 1 FROM documents
      UNION ALL
      SELECT 'https://h' || doc_id || '/fr',
             'https://h' || doc_id || '/en', 'en', 1 FROM documents
      UNION ALL
      SELECT 'https://h' || doc_id || '/fr',
             'https://h' || doc_id || '/de', 'de', 0 FROM documents
      UNION ALL
      SELECT 'https://h' || doc_id || '/de',
             'https://h' || doc_id || '/en', 'en', 1 FROM documents
    )
    SELECT url, alt_url, lang, CAST(reciprocal AS INT) AS reciprocal
    FROM e
    """,
)
def q271_hreflang_audit(spark, sf_dir):
    """hreflang return-tag audit (operators/meta.py
    hreflang_reciprocity) — international SEO's classic check: if A
    lists B as an alternate, B must list A back or engines ignore the
    pair. Fixture: per doc a 3-language cluster where de omits its
    return tag to fr, so exactly one of five edges per cluster is
    non-reciprocal. Plan: codegen <link> extraction → ONE self
    equi-join on the reversed (url, alt_url) key (q145's
    symmetric-edge shape), url-keyed so it co-locates with a bucketed
    page store."""
    from ..operators.meta import hreflang_reciprocity

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")

    def alt(lang, path):
        return F.concat(
            F.lit('<link rel="alternate" hreflang="' + lang
                  + '" href="https://h'), sid, F.lit(path + '">'),
        )

    def page(path, *alts):
        html = F.concat(
            F.lit("<html><head>"), *alts, F.lit("</head></html>")
        )
        return d.select(
            F.concat(F.lit("https://h"), sid, F.lit(path)).alias("url"),
            html.alias("html"),
        )

    pages = (
        page("/en", alt("fr", "/fr"), alt("de", "/de"))
        .unionByName(page("/fr", alt("en", "/en"), alt("de", "/de")))
        .unionByName(page("/de", alt("en", "/en")))
    )
    return hreflang_reciprocity(pages)


@q(
    "q272_canonical_chains",
    """
    SELECT 'https://h' || doc_id || '/main' AS url,
           'https://h' || doc_id || '/main' AS canonical,
           CAST(0 AS INT) AS hops
    FROM documents
    UNION ALL
    SELECT 'https://h' || doc_id || '/dup1',
           'https://h' || doc_id || '/main', 1 FROM documents
    UNION ALL
    SELECT 'https://h' || doc_id || '/dup2',
           'https://h' || doc_id || '/main', 2 FROM documents
    UNION ALL
    SELECT 'https://h' || doc_id || '/ext',
           'https://other.example.org/x', 1 FROM documents
    """,
)
def q272_canonical_chains(spark, sf_dir):
    """rel=canonical chain resolution (operators/meta.py
    canonical_resolve): pointer jumping — 2 doubling rounds resolve
    chains up to 4 links, the q50 connected-components trick, never a
    per-link loop. hops > 1 is the misconfiguration SEO audits flag
    (engines may ignore multi-hop canonicals); the flattened target is
    what a canonical-dedup pass (q148) keys on. Fixture per doc:
    self-canonical main, a 1-hop dup, a 2-hop chain, and an
    off-corpus canonical that resolves to the external url in one
    hop."""
    from ..operators.meta import canonical_resolve

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")

    def page(path, canon):
        html = F.concat(
            F.lit("<html><head>"),
            F.when(
                F.lit(canon is not None),
                F.concat(F.lit('<link rel="canonical" href="'),
                         canon if canon is not None else F.lit(""),
                         F.lit('">')),
            ).otherwise(F.lit("")),
            F.lit("</head></html>"),
        )
        return d.select(
            F.concat(F.lit("https://h"), sid, F.lit(path)).alias("url"),
            html.alias("html"),
        )

    h = F.concat(F.lit("https://h"), sid)
    pages = (
        page("/main", None)
        .unionByName(page("/dup1", F.concat(h, F.lit("/main"))))
        .unionByName(page("/dup2", F.concat(h, F.lit("/dup1"))))
        .unionByName(page("/ext", F.lit("https://other.example.org/x")))
    )
    return canonical_resolve(pages, max_hops=2)


# --- wave: URL-parameter significance mining (q280) ---------------------------


@q(
    "q280_param_significance",
    """
    WITH hosts AS (
      SELECT DISTINCT 'h' || (doc_id % 50) AS host FROM documents
    )
    SELECT host, 'page' AS param, CAST(2 AS BIGINT) AS n_groups,
           CAST(0 AS BIGINT) AS n_neutral_groups,
           CAST(0 AS INT) AS neutral
    FROM hosts
    UNION ALL
    SELECT host, 'utm', 2, 2, 1 FROM hosts
    """,
)
def q280_param_significance(spark, sf_dir):
    """URL-parameter significance mining (functions/urlnorm.py
    param_significance): LEARN per-host content-neutral query
    parameters by comparing content hashes across URLs differing only
    in one parameter — the data-driven upgrade over q80's fixed
    utm-blocklist, and the discovered strip-list q41/q148's
    canonicalizers feed on. Fixture: every host serves the page/utm
    cross product where the hash depends only on 'page', so 'utm'
    proves neutral (2/2 groups) and 'page' proves significant (0/2).
    Codegen parsing, two partial-agg groupBys on host-prefixed keys,
    no window."""
    from ..functions.urlnorm import param_significance

    d = _read(spark, sf_dir, "documents")
    hid = (F.col("doc_id") % 50).cast("string")
    combos = F.array(
        *[
            F.struct(F.lit(p).alias("pg"), F.lit(u).alias("ut"))
            for p, u in ((1, "a"), (1, "b"), (2, "a"), (2, "b"))
        ]
    )
    rows = d.select(hid.alias("_hid"), F.explode(combos).alias("_c"))
    pages = rows.select(
        F.concat(
            F.lit("https://h"), F.col("_hid"), F.lit("/p?page="),
            F.col("_c.pg").cast("string"), F.lit("&utm="),
            F.col("_c.ut"),
        ).alias("url"),
        F.md5(
            F.concat(F.lit("h"), F.col("_hid"), F.lit("-"),
                     F.col("_c.pg").cast("string"))
        ).alias("content_hash"),
    )
    return param_significance(pages)


# --- wave: client redirects + SEO health (q291-q292) --------------------------


@q(
    "q291_client_redirects",
    """
    SELECT doc_id, 'meta' AS kind,
           CAST(doc_id % 5 AS INT) AS delay_s,
           'https://t' || doc_id || '.com/new' AS target
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'js', CAST(0 AS INT),
           '/spa/' || doc_id
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q291_client_redirects(spark, sf_dir):
    """Client-side redirect extraction (operators/meta.py
    client_redirects): meta-refresh (with its N;url= delay
    microsyntax) and window.location JS assignments — the redirect
    channels beyond HTTP 3xx a crawler must honor, and the
    cloaking-detection staple (0-delay client redirect on a
    content-bearing page = classic spam signal). Fixture thirds:
    meta-refresh with varying delay / a JS redirect / no redirect at
    all; codegen regexp end to end."""
    from ..operators.meta import client_redirects

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<meta http-equiv="refresh" content="'),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(";url=https://t"), sid, F.lit('.com/new">'),
            ),
        ).when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("<script>window.location.href = '/spa/"), sid,
                F.lit("';</script>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"),
    )
    return client_redirects(d.select("doc_id", html.alias("html")))


# --- wave: fragment integrity + sitemap-robots conflict (q296-q297) -----------


@q(
    "q296_broken_fragments",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END AS INT)
             AS n_fragment_links,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT)
             AS n_broken
    FROM documents
    """,
)
def q296_broken_fragments(spark, sf_dir):
    """Broken in-page fragment links (operators/meta.py
    broken_fragment_links): <a href=#x> without a matching id=x /
    <a name=x> — the dead-TOC bug static-site generators introduce
    constantly. Per-row array codegen (regexp_extract_all both sides,
    array_except for the broken set) — no explode, no join, no
    shuffle. Fixture: #top and #sec{id} resolve, evens add a
    #missing{id} that doesn't."""
    from ..operators.meta import broken_fragment_links

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<div id="top"></div><a href="#top">up</a>'),
        F.lit('<h2 id="sec'), sid, F.lit('">s</h2>'),
        F.lit('<a href="#sec'), sid, F.lit('">go</a>'),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('<a href="#missing'), sid, F.lit('">x</a>')),
        ).otherwise(F.lit("")),
    )
    return broken_fragment_links(d.select("doc_id", html.alias("html")))


# --- wave: URL-space layout — SURT keys + PSL registrable domains ------------


@q(
    "q305_surt_keys",
    """
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN 'com,example,ext' || CAST(doc_id % 5 AS VARCHAR)
                 || ')/Docs/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
        WHEN 1 THEN 'uk,co,example,site' || CAST(doc_id % 5 AS VARCHAR)
                 || ',sub)/a/' || CAST(doc_id AS VARCHAR)
        WHEN 2 THEN 'org,example,news' || CAST(doc_id % 5 AS VARCHAR)
                 || ')/' || CAST(doc_id AS VARCHAR) || '?z=9'
        ELSE 'net,example,cdn' || CAST(doc_id % 5 AS VARCHAR)
                 || ')/static/' || CAST(doc_id AS VARCHAR)
      END AS surt,
      CASE doc_id % 4
        WHEN 0 THEN 'com,example'
        WHEN 1 THEN 'uk,co'
        WHEN 2 THEN 'org,example'
        ELSE 'net,example'
      END AS shard_prefix
    FROM documents
    """,
)
def q305_surt_keys(spark, sf_dir):
    """SURT key generation (functions/urlnorm.py surt_key/surt_prefix):
    the sort-friendly URI form CDX indexes key on — host lowercased +
    reversed + comma-joined, www/default-port/fragment dropped, query
    sorted — plus the 2-label range-partition prefix. The fixture
    exercises every normalization: mixed case, :80/:443, www/www2
    prefixes, unsorted query, fragment. The oracle states each
    transform's closed form. At 10^12 captures, sorting the Iceberg
    table by this key is what turns per-site reads into contiguous
    range scans (Common Crawl's own index layout); the whole transform
    is per-row codegen, zero shuffle."""
    from ..functions.urlnorm import surt_key, surt_prefix

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    g = (F.col("doc_id") % 5).cast("string")
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(
            F.lit("HTTP://WWW.Ext"), g, F.lit(".Example.COM:80/Docs/"),
            sid, F.lit("?b=2&a=1")))
        .when(m == 1, F.concat(
            F.lit("https://Sub.Site"), g, F.lit(".example.CO.UK:443/a/"),
            sid, F.lit("#frag")))
        .when(m == 2, F.concat(
            F.lit("http://www2.news"), g, F.lit(".example.org/"),
            sid, F.lit("?z=9")))
        .otherwise(F.concat(
            F.lit("https://cdn"), g, F.lit(".example.net/static/"), sid))
    )
    return (
        d.select("doc_id", url.alias("url"))
        .select("doc_id", surt_key("url").alias("surt"))
        .select(
            "doc_id", "surt",
            surt_prefix("surt").alias("shard_prefix"),
        )
    )


@q(
    "q306_registrable_domains",
    """
    WITH h AS (
      SELECT
        CASE doc_id % 6
          WHEN 0 THEN 'a' || CAST(doc_id % 7 AS VARCHAR)
                   || '.shop.example.co.uk'
          WHEN 1 THEN 'user' || CAST(doc_id % 7 AS VARCHAR)
                   || '.blogspot.com'
          WHEN 2 THEN 'example.com'
          WHEN 3 THEN 'deep.www.example' || CAST(doc_id % 7 AS VARCHAR)
                   || '.com.br'
          WHEN 4 THEN 'site' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example.zz'
          ELSE 'co.uk'
        END AS host,
        CASE doc_id % 6
          WHEN 0 THEN 'co.uk' WHEN 1 THEN 'blogspot.com'
          WHEN 2 THEN 'com' WHEN 3 THEN 'com.br'
          WHEN 4 THEN 'zz' ELSE 'co.uk'
        END AS public_suffix,
        CASE doc_id % 6
          WHEN 0 THEN 'example.co.uk'
          WHEN 1 THEN 'user' || CAST(doc_id % 7 AS VARCHAR)
                   || '.blogspot.com'
          WHEN 2 THEN 'example.com'
          WHEN 3 THEN 'example' || CAST(doc_id % 7 AS VARCHAR) || '.com.br'
          WHEN 4 THEN 'example.zz'
          ELSE NULL
        END AS registrable,
        CASE doc_id % 6
          WHEN 0 THEN 'a' || CAST(doc_id % 7 AS VARCHAR) || '.shop'
          WHEN 3 THEN 'deep.www'
          WHEN 4 THEN 'site' || CAST(doc_id % 7 AS VARCHAR)
          ELSE NULL
        END AS subdomain
      FROM documents
    )
    SELECT DISTINCT host, public_suffix, registrable, subdomain FROM h
    """,
)
def q306_registrable_domains(spark, sf_dir):
    """Registrable-domain (eTLD+1) extraction with Public-Suffix-List
    semantics (functions/urlnorm.py registrable_domains): longest
    matching suffix wins (co.uk beats uk), PRIVATE-section platform
    suffixes (blogspot.com) keep user subdomains as separate sites,
    unknown TLDs fall back to the PSL default ``*`` rule, and a host
    that IS a suffix gets registrable NULL. This is the grouping key
    every per-"domain" stage (dedup rate caps, host quality priors,
    politeness budgets) actually needs — naive last-two-labels merges
    all of blogspot into one site and splits co.uk sites in half.
    Shape: distinct hosts → suffix-explode → broadcast PSL join →
    max(struct) partial agg; the page table is never shuffled."""
    from ..functions.urlnorm import registrable_domains

    d = _read(spark, sf_dir, "documents")
    g = (F.col("doc_id") % 7).cast("string")
    m = F.col("doc_id") % 6
    host = (
        F.when(m == 0, F.concat(F.lit("a"), g, F.lit(".shop.example.co.uk")))
        .when(m == 1, F.concat(F.lit("user"), g, F.lit(".blogspot.com")))
        .when(m == 2, F.lit("example.com"))
        .when(m == 3, F.concat(F.lit("deep.www.example"), g,
                               F.lit(".com.br")))
        .when(m == 4, F.concat(F.lit("site"), g, F.lit(".example.zz")))
        .otherwise(F.lit("co.uk"))
    )
    return registrable_domains(d.select(host.alias("host")))


# --- wave: embedded-URL parameter audit (q314) --------------------------------


@q(
    "q314_embedded_url_params",
    """
    SELECT 'https://a.example.com/r?next=https%3A%2F%2Fevil.example.org'
             || '%2Fphish&x=' || CAST(doc_id AS VARCHAR) AS url,
           'next' AS param, 'evil.example.org' AS embedded_host,
           1 AS is_external
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT 'https://b.example.com/login?return=https://b.example.com/home'
             || CAST(doc_id AS VARCHAR),
           'return', 'b.example.com', 0
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q314_embedded_url_params(spark, sf_dir):
    """Embedded-URL query-parameter audit (functions/urlnorm.py
    embedded_url_params): parameters carrying absolute URLs — plain
    or percent-encoded — surfaced with their decoded target host and
    an internal/external flag. Open-redirect surface + frontier
    hygiene + wrapper-URL dedup noise, three standard crawl-pipeline
    consumers. Fixture: a %-encoded external redirect (decode path
    proven), a plain same-host return URL (is_external 0), and a
    plain-parameter page emitting nothing. Codegen split/regexp,
    zero shuffle."""
    from ..functions.urlnorm import embedded_url_params

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    url = (
        F.when(m == 0, F.concat(
            F.lit("https://a.example.com/r?next=https%3A%2F%2F"
                  "evil.example.org%2Fphish&x="), sid))
        .when(m == 1, F.concat(
            F.lit("https://b.example.com/login?return="
                  "https://b.example.com/home"), sid))
        .otherwise(F.concat(F.lit("https://c.example.com/p?id="), sid))
    )
    return embedded_url_params(d.select(url.alias("url")))


# --- wave: pagination chains + per-domain temporal profile (q317-q318) --------


@q(
    "q317_pagination_audit",
    """
    WITH b AS (SELECT doc_id, 'https://s.example.com/g'
                 || CAST(doc_id AS VARCHAR) || '/p' AS u,
                      doc_id % 5 AS m5 FROM documents)
    SELECT u || '1' AS url, u || '2' AS next_url,
           CAST(NULL AS VARCHAR) AS prev_url,
           CASE WHEN m5 = 0 THEN 0 ELSE 1 END AS next_reciprocal,
           1 AS is_first, 0 AS is_last
    FROM b
    UNION ALL
    SELECT u || '2', u || '3',
           CASE WHEN m5 = 0 THEN NULL ELSE u || '1' END,
           1, CASE WHEN m5 = 0 THEN 1 ELSE 0 END, 0
    FROM b
    UNION ALL
    SELECT u || '3', NULL, u || '2', NULL, 0, 1
    FROM b
    """,
)
def q317_pagination_audit(spark, sf_dir):
    """rel=next/prev pagination audit (operators/meta.py
    pagination_audit): per-page chain pointers, reciprocity verdict
    (next page must declare THIS page as prev), and first/last flags
    — chain roots for fetch-as-one-document logic and broken
    reciprocity as the misdeclared-pagination trap signal. Fixture:
    every doc expands to a 3-page chain; every 5th chain drops page
    2's prev declaration, which must flip page 1's reciprocity to 0
    and make page 2 a spurious second 'first'. link_tags codegen →
    per-page partial agg → one url-keyed self-join; no windows."""
    from ..operators.meta import pagination_audit

    d = _read(spark, sf_dir, "documents")
    u = F.concat(F.lit("https://s.example.com/g"),
                 F.col("doc_id").cast("string"), F.lit("/p"))
    m5 = F.col("doc_id") % 5
    p1, p2, p3 = [F.concat(u, F.lit(str(i))) for i in (1, 2, 3)]
    mk = lambda *parts: F.concat(
        F.lit("<html><head>"), *parts, F.lit("</head><body>x</body></html>")
    )
    lnk = lambda rel, href: F.concat(
        F.lit('<link rel="%s" href="' % rel), href, F.lit('">')
    )
    pages = d.select(
        F.explode(
            F.array(
                F.struct(p1.alias("url"), mk(lnk("next", p2)).alias("html")),
                F.struct(
                    p2.alias("url"),
                    F.when(
                        m5 == 0, mk(lnk("next", p3))
                    ).otherwise(
                        mk(lnk("next", p3), lnk("prev", p1))
                    ).alias("html"),
                ),
                F.struct(p3.alias("url"), mk(lnk("prev", p2)).alias("html")),
            )
        ).alias("pg")
    ).select("pg.url", "pg.html")
    return pagination_audit(pages)


# --- wave: AMP pairing + template-leak audit (q319-q320) ----------------------


@q(
    "q319_amp_pages",
    """
    WITH b AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS sid,
                      doc_id % 3 AS m FROM documents)
    SELECT
      CASE m
        WHEN 0 THEN 'https://a.example.com/p/' || sid
        WHEN 1 THEN 'https://a.example.com/amp/' || sid
        ELSE 'https://a.example.com/x/' || sid
      END AS url,
      CASE m WHEN 1 THEN 1 ELSE 0 END AS is_amp,
      CASE m WHEN 0 THEN 'https://a.example.com/amp/' || sid
        ELSE NULL END AS amphtml_url,
      CASE m WHEN 1 THEN 'https://a.example.com/p/' || sid
        ELSE NULL END AS canonical_url,
      CASE m
        WHEN 0 THEN 'https://a.example.com/amp/' || sid
        WHEN 1 THEN 'https://a.example.com/p/' || sid
        ELSE NULL
      END AS pair_url
    FROM b
    """,
)
def q319_amp_pages(spark, sf_dir):
    """AMP variant detection and canonical pairing (operators/meta.py
    amp_pages): the mobile web's largest systematic near-duplicate
    family, paired via the spec's two declared pointers (rel=amphtml
    forward, rel=canonical back) plus the <html amp|⚡> attribute.
    pair_url is the dedup key either side — content hashing never
    catches these because the markup differs. Fixture: canonical
    pages pointing at their AMP twin, AMP pages (attribute set)
    pointing back, and unpaired pages all-NULL. Codegen link_tags
    channel + one attribute probe."""
    from ..operators.meta import amp_pages

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    url = (
        F.when(m == 0, F.concat(F.lit("https://a.example.com/p/"), sid))
        .when(m == 1, F.concat(F.lit("https://a.example.com/amp/"), sid))
        .otherwise(F.concat(F.lit("https://a.example.com/x/"), sid))
    )
    html = (
        F.when(m == 0, F.concat(
            F.lit('<html><head><link rel="amphtml" '
                  'href="https://a.example.com/amp/'), sid,
            F.lit('"></head><body>c</body></html>')))
        .when(m == 1, F.concat(
            F.lit('<html amp lang="en"><head><link rel="canonical" '
                  'href="https://a.example.com/p/'), sid,
            F.lit('"></head><body>a</body></html>')))
        .otherwise(F.lit("<html><body>plain</body></html>"))
    )
    return amp_pages(d.select(url.alias("url"), html.alias("html")))


# --- wave: percent-encoding normalization (q340) ------------------------------


@q(
    "q340_percent_normalize",
    """
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN 'https://a.example.com/~user/' || CAST(doc_id AS VARCHAR)
        WHEN 1 THEN 'https://a.example.com/p?q=a%2Fb%3Fc'
        WHEN 2 THEN 'https://a.example.com/caf%C3%A9/'
                 || CAST(doc_id AS VARCHAR)
        ELSE 'https://a.example.com/plain/' || CAST(doc_id AS VARCHAR)
      END AS normalized
    FROM documents
    """,
)
def q340_percent_normalize(spark, sf_dir):
    """RFC 3986 §6.2.2 percent-encoding normalization (functions/
    urlnorm.py percent_normalize): unreserved escapes decode
    (%7E→~, %41→A), reserved escapes survive with UPPERCASED hex
    (%2f→%2F — decoding them would change the URL's meaning),
    non-ASCII escapes survive uppercased (%c3%a9→%C3%A9). The layer
    canonical_url (q41) doesn't touch, composed before it in the
    q316 intake ladder. Fixture strata exercise all three rules plus
    a no-escape control; outputs closed-form. Arrow-batched UDF
    (per-escape case transforms aren't expressible in Java regex
    replacement), extractor plan shape."""
    from ..functions.urlnorm import percent_normalize

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(
            F.lit("https://a.example.com/%7Euser/"), sid))
        .when(m == 1, F.lit("https://a.example.com/p?q=a%2fb%3fc"))
        .when(m == 2, F.concat(
            F.lit("https://a.example.com/caf%c3%a9/"), sid))
        .otherwise(F.concat(F.lit("https://a.example.com/plain/"), sid))
    )
    return d.select(
        "doc_id", percent_normalize(url).alias("normalized")
    )


@q(
    "q345_clean_param_rules",
    """
    SELECT 'h' || CAST(doc_id % 6 AS VARCHAR) AS host,
           p.param AS param,
           CASE doc_id % 2 WHEN 0 THEN '/forum/' ELSE '' END
             AS path_prefix
    FROM documents,
         (SELECT unnest(['ref', 'sid']) AS param) AS p
    WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 'h' || CAST(doc_id % 6 AS VARCHAR), 'utm_campaign', ''
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def q345_clean_param_rules(spark, sf_dir):
    """Clean-param directive extraction (sources/robots.py
    clean_param_rules; the Yandex robots.txt extension — the only
    publisher-DECLARED 'these parameters don't change content'
    channel): the third leg of parameter hygiene beside the static
    blocklist (q80) and the data-driven miner (q280), all three
    feeding one frontier strip-list. Fixture: a path-scoped
    two-param directive and an unscoped single-param directive amid
    decoy Disallow lines; closed-form per host. Per-line codegen,
    directive-sized explode."""
    from ..sources.robots import clean_param_rules

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 2
    txt = (
        F.when(m == 0, F.lit(
            "User-agent: *\nDisallow: /tmp\n"
            "Clean-param: ref&sid /forum/\n"))
        .otherwise(F.lit(
            "User-agent: *\nclean-param: utm_campaign\n"
            "Disallow: /private\n"))
    )
    robots = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 6).cast("string"))
        .alias("host"),
        txt.alias("robots_txt"),
    )
    return clean_param_rules(robots)
