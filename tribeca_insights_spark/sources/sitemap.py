"""Sitemap URL-universe seeding (SURVEY.md §2.1 S3 — reference
``storage.py:85-117`` ``add_urls_from_sitemap``).

The reference GETs ``/sitemap.xml``, parses ``<loc>`` elements with
ElementTree (sitemaps.org namespace), trims their text, and appends rows
``(URL, Status=2, "", "", "")`` for urls not already in the visited table.
Here fetching is out of scope (html/sitemap bodies are pre-materialized
columns); the dataflow re-expression is:

* ``sitemap_locs`` — columnar ``<loc>`` extraction (regexp_extract_all →
  explode → trim), entirely JVM-side; tolerates namespace prefixes
  (``<sm:loc>``) and surrounding whitespace like ElementTree's ``.text``
  handling does.
* ``seed_urls`` — the anti-join + union (reference membership test
  ``loc not in visited_df["URL"].values`` + ``pd.concat``): new urls enter
  the state table as Status=2 (pending), existing rows are preserved
  untouched. At 10^12 docs this is exactly the incremental-universe load:
  a left-anti join against the state table on its bucketed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# <loc> with optional namespace prefix; text captured up to the closing tag
_LOC_PATTERN = r"<(?:\w+:)?loc>([^<]*)</(?:\w+:)?loc>"


def sitemap_locs(sitemaps: DataFrame, xml_col: str = "sitemap_xml",
                 keep_cols: tuple = ()) -> DataFrame:
    """One row per ``<loc>`` URL found in each sitemap body (trimmed,
    empties dropped — reference skips falsy ``url.text``)."""
    return (
        sitemaps.select(
            *keep_cols,
            F.explode(
                F.regexp_extract_all(F.col(xml_col), F.lit(_LOC_PATTERN), 1)
            ).alias("_loc"),
        )
        .select(*keep_cols, F.trim("_loc").alias("url"))
        .filter(F.length("url") > 0)
    )


def seed_urls(locs: DataFrame, state: DataFrame) -> DataFrame:
    """Seed pending work: urls from sitemaps not present in the state table
    are appended as Status=2 rows (storage.py:98-111 semantics: dedup within
    the new batch happens via distinct; existing rows win)."""
    new = (
        locs.select("url")
        .distinct()
        .join(state.select(F.col("URL").alias("url")), "url", "left_anti")
        .select(
            F.col("url").alias("URL"),
            F.lit(2).alias("Status"),
            F.lit("").alias("Data"),
            F.lit("").alias("MD File"),
            F.lit("").alias("JSON File"),
        )
    )
    return state.unionByName(new)
