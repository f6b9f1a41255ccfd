"""robots.txt crawl-delay extraction (SURVEY §2.1 S4 — reference
``config.py:31-47`` ``get_crawl_delay``).

Fetch-side politeness is out of scope for the engine, but the *parse* is
dataflow: a (domain, robots_txt) table → per-domain crawl-delay dimension,
joined onto the crawl frontier to schedule politely. Uses the same stdlib
``RobotFileParser`` semantics the reference uses (specific user-agent
group first, ``*`` fallback, default when absent), Arrow-batched.
"""

from __future__ import annotations

from typing import Optional
from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

DEFAULT_CRAWL_DELAY = 0.0  # reference config.py:23


def crawl_delay_for(txt: str, user_agent: str,
                    default: float = DEFAULT_CRAWL_DELAY) -> float:
    """Reference get_crawl_delay semantics (config.py:36-47): specific UA
    group, then '*', then the default; parse errors → default."""
    try:
        rp = RobotFileParser()
        rp.parse((txt or "").splitlines())
        delay: Optional[float] = rp.crawl_delay(user_agent)
        if delay is None:
            delay = rp.crawl_delay("*")
        return float(delay) if delay is not None else default
    except Exception:
        return default


def crawl_delays(robots: DataFrame, user_agent: str,
                 txt_col: str = "robots_txt",
                 default: float = DEFAULT_CRAWL_DELAY) -> DataFrame:
    """(…, robots_txt) → (…, crawl_delay double) — a politeness dimension
    broadcastable onto the frontier."""

    def _batch(txt: pd.Series) -> pd.Series:
        return pd.Series(
            [crawl_delay_for(t or "", user_agent, default) for t in txt]
        )

    udf = pandas_udf(_batch, returnType=DoubleType())
    return robots.withColumn("crawl_delay", udf(F.col(txt_col)))


def sitemaps_from_robots(robots: DataFrame,
                         txt_col: str = "robots_txt") -> DataFrame:
    """Sitemap discovery: every ``Sitemap:`` directive in each robots.txt
    (the standard sitemap-autodiscovery mechanism, how crawls find the
    sitemaps :mod:`.sitemap` then parses). Fully native: split to lines,
    case-insensitive prefix match, trim — one row per (…, sitemap_url);
    feeds :func:`.sitemap.sitemap_locs` → seed anti-join."""
    lines = robots.withColumn(
        "_line", F.explode(F.split(F.col(txt_col), "\r?\n"))
    )
    return (
        lines.filter(F.lower(F.trim("_line")).rlike(r"^sitemap\s*:"))
        .withColumn(
            "sitemap_url",
            F.trim(F.regexp_replace(F.trim("_line"), r"(?i)^sitemap\s*:\s*", "")),
        )
        .filter(F.length("sitemap_url") > 0)
        .drop("_line", txt_col)
    )


def disallow_rules(robots: DataFrame, user_agent: str,
                   txt_col: str = "robots_txt") -> DataFrame:
    """(…, path_prefix) Disallow rules effective for ``user_agent``
    (specific UA group over ``*``, RobotFileParser group semantics) — a
    dimension the frontier anti-joins on ``url path startswith prefix``.
    Arrow-batched parse, same stdlib parser as the reference."""
    from pyspark.sql.types import ArrayType, StringType

    def _batch(txt: pd.Series) -> pd.Series:
        out = []
        for t in txt:
            try:
                rp = RobotFileParser()
                rp.parse((t or "").splitlines())
                best = None
                star = None
                for ent in getattr(rp, "entries", []):
                    if any(ua == "*" for ua in ent.useragents):
                        star = ent
                    elif any(user_agent.lower().startswith(ua.lower())
                             for ua in ent.useragents):
                        best = ent
                if best is None:
                    best = star if star is not None else rp.default_entry
                rules = []
                if best is not None:
                    for rl in best.rulelines:
                        if not rl.allowance and rl.path:
                            rules.append(rl.path)
                out.append(rules)
            except Exception:
                out.append([])
        return pd.Series(out)

    udf = pandas_udf(_batch, returnType=ArrayType(StringType()))
    return (
        robots.withColumn("_rules", udf(F.col(txt_col)))
        .withColumn("path_prefix", F.explode("_rules"))
        .drop("_rules", txt_col)
    )
