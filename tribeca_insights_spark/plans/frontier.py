"""Crawl-frontier scheduling — the planner between the state layer and a
fetch executor.

The reference sleeps ``crawl_delay`` between sequential fetches
(crawler.py:142); distributed, politeness becomes a PLAN: each domain's
pending urls get a deterministic slot ``(rank-1) × crawl_delay`` seconds
from window start, so any number of executors can fetch concurrently
across domains while each domain still sees at most one request per delay
interval. Pure dataflow: one window over the (already small) pending set
partitioned by domain, one broadcast join of the per-domain delay
dimension (sources/robots.crawl_delays)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.tf import domain_col


def schedule_fetches(frontier: DataFrame, delays: DataFrame,
                     url_col: str = "url",
                     delay_col: str = "crawl_delay") -> DataFrame:
    """(url, …) pending set + (domain, crawl_delay) dim → + (domain,
    fetch_rank, scheduled_offset_sec). Deterministic: rank by url within
    domain. Domains absent from the dim get delay 0 (the reference
    default)."""
    f = frontier.withColumn("domain", domain_col(url_col))
    joined = f.join(F.broadcast(delays), "domain", "left").withColumn(
        delay_col, F.coalesce(F.col(delay_col), F.lit(0.0))
    )
    w = Window.partitionBy("domain").orderBy(url_col)
    return (
        joined.withColumn("fetch_rank", F.row_number().over(w))
        .withColumn(
            "scheduled_offset_sec",
            ((F.col("fetch_rank") - 1) * F.col(delay_col)).cast("double"),
        )
    )
