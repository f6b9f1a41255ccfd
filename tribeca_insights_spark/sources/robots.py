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
