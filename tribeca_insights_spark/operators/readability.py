"""Main-content extraction operator — Arrow-batched readability UDF.

The Spark surface for :mod:`..htmlx.readability` (north_star's
"link-density and text-density scoring, readability-style node
classification"): Scan → ArrowEvalPython → Project, no shuffle — identical
plan shape to the parity extractor, so the two can run fused in one pass
over the same scan when both outputs are wanted.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

MAIN_CONTENT_STRUCT = StructType(
    [
        StructField("main_text", StringType()),
        StructField("score", DoubleType()),
        StructField("link_density", DoubleType()),
        StructField("node_tag", StringType()),
        StructField("node_hint", StringType()),
    ]
)


def _decode(h: Optional[object]) -> str:
    if h is None:
        return ""
    if isinstance(h, (bytes, bytearray, memoryview)):
        return bytes(h).decode("utf-8", errors="replace")
    return str(h)


def _main_batch(html: pd.Series) -> pd.DataFrame:
    from ..htmlx.readability import extract_main_content

    rows = [extract_main_content(_decode(h)) for h in html]
    return pd.DataFrame(rows)


main_content_udf = pandas_udf(_main_batch, returnType=MAIN_CONTENT_STRUCT)


def extract_main(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """docs(url, html, …) → (url, main_text, score, link_density,
    node_tag, node_hint)."""
    e = docs.withColumn("_m", main_content_udf(F.col(html_col)))
    return e.select(
        "url",
        F.col("_m.main_text").alias("main_text"),
        F.col("_m.score").alias("score"),
        F.col("_m.link_density").alias("link_density"),
        F.col("_m.node_tag").alias("node_tag"),
        F.col("_m.node_hint").alias("node_hint"),
    )
