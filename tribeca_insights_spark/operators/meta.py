"""Head-metadata extraction: <meta> tags, robots directives, OpenGraph
properties, JSON-LD structured data.

SEO surface the reference's extractor stops short of: it reads only
``meta[name=description]`` (`/root/reference/tribeca_insights/
crawler.py:70-71`); real SEO audits also need the robots directives
(noindex/nofollow), the social-graph properties (og:*) and schema.org
JSON-LD blocks. All three extractors here stay ENTIRELY JVM-side —
``<meta>`` is a void element with flat attribute syntax and JSON-LD is
a fenced script payload, so targeted regexp_extract_all + from_json in
codegen is both correct for the surface and orders faster than another
Python tree walk; the full-fidelity tree walker (htmlx/extractor.py)
remains the path for nested visible content.

Scale shape: every operator is Scan → Project/Generate — zero shuffle,
zero Python; per-page rows stay in their input partition, and corpus
rollups hang partial-agg groupBys off the exploded output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_META_TAG = r"<meta\s[^>]*>"


def _attr(m, name: str):
    # double- then single-quoted; first non-empty wins
    dq = F.regexp_extract(m, name + r'\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(m, name + r"\s*=\s*'([^']*)'", 1)
    return F.when(dq != "", dq).otherwise(sq)


def meta_tags(docs: DataFrame, html_col: str = "html",
              id_col: str = "doc_id") -> DataFrame:
    """One row per ``<meta>`` tag carrying a name= or property= key:
    ``(id, kind, key, content)`` with ``kind`` in {'name','property'},
    key lowercased, attribute ORDER-independent (name before content or
    after — both forms are served in the wild)."""
    m = F.col("_m")
    name_k = _attr(m, "name")
    prop_k = _attr(m, "property")
    tags = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col).cast("string"), F.lit(_META_TAG), 0
            )
        ).alias("_m"),
    )
    return (
        tags.select(
            id_col,
            F.when(name_k != "", F.lit("name"))
            .when(prop_k != "", F.lit("property")).alias("kind"),
            F.lower(F.when(name_k != "", name_k).otherwise(prop_k))
            .alias("key"),
            F.coalesce(_attr(m, "content"), F.lit("")).alias("content"),
        )
        .filter(F.col("kind").isNotNull())
    )


def robots_meta_flags(docs: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-page robots-directive flags from ``<meta name=robots>``:
    ``(id, noindex, nofollow, indexable)`` — content is a
    comma-separated token list per the robots-meta spec ('none' =
    noindex,nofollow); pages without the tag default to fully
    indexable. One partial-agg groupBy over the (tiny) per-page meta
    rows; pages with NO meta tags at all re-enter via a left join on
    the id key."""
    m = meta_tags(docs, html_col, id_col)
    toks = m.filter(F.col("key") == "robots").select(
        id_col,
        F.explode(F.split(F.lower("content"), ",")).alias("_t"),
    ).select(id_col, F.trim("_t").alias("_t"))
    flags = toks.groupBy(id_col).agg(
        F.max(F.when(F.col("_t").isin("noindex", "none"), 1)
              .otherwise(0)).alias("noindex"),
        F.max(F.when(F.col("_t").isin("nofollow", "none"), 1)
              .otherwise(0)).alias("nofollow"),
    )
    return (
        docs.select(id_col)
        .join(flags, id_col, "left")
        .select(
            id_col,
            F.coalesce("noindex", F.lit(0)).cast("int").alias("noindex"),
            F.coalesce("nofollow", F.lit(0)).cast("int")
            .alias("nofollow"),
            (1 - F.coalesce("noindex", F.lit(0))).cast("int")
            .alias("indexable"),
        )
    )


def jsonld_entities(docs: DataFrame, html_col: str = "html",
                    id_col: str = "doc_id",
                    schema: str = "`@type` string, name string"
                    ) -> DataFrame:
    """schema.org JSON-LD entities: every
    ``<script type="application/ld+json">`` payload parsed with
    from_json (JVM Jackson — malformed payloads yield NULL fields, the
    tolerant-reader behavior structured-data pipelines want):
    ``(id, block_idx, entity_type, entity_name)``."""
    blocks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.col(html_col).cast("string"),
                F.lit(r'<script type="application/ld\+json">(.*?)'
                      r"</script>"),
                1,
            )
        ).alias("block_idx", "_payload"),
    )
    e = F.from_json(F.col("_payload"), schema)
    return blocks.select(
        id_col,
        F.col("block_idx").cast("int").alias("block_idx"),
        e.getField("@type").alias("entity_type"),
        e.getField("name").alias("entity_name"),
    )
