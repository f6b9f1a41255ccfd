"""CDXJ capture-index source — how real Common-Crawl work gets seeded.

The CDX(J) index (public format: one line per capture — SURT key,
14-digit timestamp, JSON blob with url/mime/status/digest/length/offset/
filename) is the standard way to select WARC records without scanning
payloads. This source parses index lines into a typed DataFrame entirely
with native column ops (regexp/get_json_object — no Python in the loop)
and feeds the crawl/extraction planner:

* filter to ``status=200 & mime=text/html`` before any WARC byte is read
  (at 10^12 captures this predicate prunes ~half the corpus for free);
* dedup repeated captures of a url by content ``digest`` (keep latest);
* anti-join against the state log → the pending fetch list with exact
  (filename, offset, length) WARC ranges.

Line shape parsed (CDXJ, the modern form)::

    org,example)/page 20260101120000 {"url": "https://example.org/page",
      "mime": "text/html", "status": "200", "digest": "sha1:ABC...",
      "length": "1234", "offset": "5678", "filename": "crawl-00.warc.gz"}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

CDX_FIELDS = ("url", "mime", "status", "digest", "length", "offset",
              "filename")


def split_cdxj(lines: DataFrame, col: str = "value") -> DataFrame:
    """CDXJ line column → raw (surt, ts, blob) columns. ONE pass per line:
    a 3-limit literal split (the JSON blob may itself contain spaces),
    then cheap shape validation — not three full-regex re-scans."""
    parts = F.split(F.col(col), " ", 3)
    return (
        lines.filter(F.size(parts) == 3)
        .select(
            F.element_at(parts, 1).alias("surt"),
            F.element_at(parts, 2).alias("ts"),
            F.element_at(parts, 3).alias("blob"),
        )
        .filter(
            (F.length("surt") > 0)
            & F.col("ts").rlike(r"^\d{14}$")
            & F.col("blob").startswith("{")
            & F.col("blob").endswith("}")
        )
    )


def read_cdxj_lines(spark: SparkSession, path: str) -> DataFrame:
    """Text file(s) of CDXJ lines → raw (surt, ts, json) columns.
    File-granular parallelism, same as WARC reading (sources/warc.py)."""
    return split_cdxj(spark.read.text(path))


def parse_cdxj(raw: DataFrame) -> DataFrame:
    """Raw (surt, ts, blob) → typed capture table. ``get_json_object``
    stays JVM-side; the timestamp parses as yyyyMMddHHmmss."""
    cols = [
        F.col("surt"),
        F.to_timestamp(F.col("ts"), "yyyyMMddHHmmss").alias("capture_ts"),
    ]
    for f in CDX_FIELDS:
        cols.append(F.get_json_object("blob", f"$.{f}").alias(f))
    out = raw.select(*cols)
    return out.select(
        "surt", "capture_ts", "url", "mime",
        F.col("status").cast("int").alias("status"),
        "digest",
        F.col("length").cast("long").alias("length"),
        F.col("offset").cast("long").alias("offset"),
        "filename",
    )


def html_captures(captures: DataFrame) -> DataFrame:
    """The standard pre-fetch predicate: successful HTML captures only."""
    return captures.filter(
        (F.col("status") == 200) & (F.col("mime") == "text/html")
    )


def latest_per_url(captures: DataFrame) -> DataFrame:
    """One capture per url — latest capture_ts wins, digest as tiebreak
    (deterministic). The url list a crawl actually fetches."""
    w = Window.partitionBy("url").orderBy(
        F.desc("capture_ts"), F.desc("digest")
    )
    return (
        captures.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def seed_fetch_list(captures: DataFrame, done_urls: DataFrame) -> DataFrame:
    """Pending fetch ranges: filtered+deduped captures anti-joined against
    the done set — (url, filename, offset, length) is everything a WARC
    range fetcher needs."""
    pend = latest_per_url(html_captures(captures)).join(
        done_urls.select("url"), "url", "left_anti"
    )
    return pend.select("url", "capture_ts", "digest", "filename", "offset",
                       "length")
