"""Extraction operators — the Arrow-batched hot path.

One struct-returning pandas UDF performs a SINGLE parse per page and emits
every per-page field the reference computes (SURVEY.md §2.2 O1, O4-O11;
reference crawler.py:104-183 does the same work row-at-a-time in threads).
Batches arrive via Arrow (tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
down for fat HTML blobs — see session.py); everything after the UDF is
native Catalyst: flattening, tokenization, word counts, TF aggregation.

Charset policy: ``html`` is ``binary`` (input_hint); we decode UTF-8 with
``errors="replace"`` — the reference consumes ``requests``' already-decoded
``resp.text`` (crawler.py:137-138), so the decode step is new surface and
UTF-8 is the Common-Crawl-standard choice. Documented invariant: fixtures
are UTF-8, so parity is well-posed.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.slug import url_slug
from ..functions.tokenize import with_tokens
from ..htmlx.extractor import (
    external_links,
    internal_links,
    parse_page,
    url_domain,
)
from ..schemas import EXTRACT_STRUCT


def _decode(h: Optional[object]) -> str:
    if h is None:
        return ""
    if isinstance(h, (bytes, bytearray, memoryview)):
        return bytes(h).decode("utf-8", errors="replace")
    return str(h)


def _extract_batch(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    out = {
        "text": [], "title": [], "meta_description": [], "headings": [],
        "images": [], "external_links": [], "internal_links": [],
        "slug": [], "page_hash": [],
    }
    import hashlib

    for u, h in zip(url, html):
        u = u or ""
        page = parse_page(_decode(h))
        dom = url_domain(u)
        out["text"].append(page.text)
        out["title"].append(page.title)
        out["meta_description"].append(page.meta_description)
        out["headings"].append(page.headings)
        out["images"].append(page.images)
        out["external_links"].append(external_links(page.links, dom))
        out["internal_links"].append(internal_links(page.links, u, dom))
        out["slug"].append(url_slug(u))
        out["page_hash"].append(
            hashlib.sha256(page.text.encode("utf-8")).hexdigest()
        )
    return pd.DataFrame(out)


extract_page_udf = pandas_udf(_extract_batch, returnType=EXTRACT_STRUCT)


def extract_pages(docs: DataFrame, tokens: bool = True,
                  profile: str = "compat") -> DataFrame:
    """docs(url, warc_ts, html, text, lang) → extracted per-page DataFrame.

    Plan shape: Scan → ArrowEvalPython (one parse/page) → Project (flatten)
    [→ BroadcastHashJoin stopword-dim → Project tokens]. No shuffle at all —
    extraction is embarrassingly parallel and stays that way at 10^12 docs;
    partitioning is inherited from the source (url-hash-bucketed Iceberg
    scan in production).
    """
    e = docs.withColumn("_x", extract_page_udf(F.col("url"), F.col("html")))
    cols = [
        "url",
        "warc_ts",
        "lang",
        F.col("_x.text").alias("text"),
        F.col("_x.title").alias("title"),
        F.col("_x.meta_description").alias("meta_description"),
        F.col("_x.headings").alias("headings"),
        F.col("_x.images").alias("images"),
        F.col("_x.external_links").alias("external_links"),
        F.col("_x.internal_links").alias("internal_links"),
        F.col("_x.slug").alias("slug"),
        F.col("_x.page_hash").alias("page_hash"),
    ]
    out = e.select(*cols)
    if tokens:
        out = with_tokens(out, profile=profile).withColumn(
            "word_count", F.size("tokens")
        )
    return out


def with_word_frequency(extracted: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """page_data ``word_frequency`` map (reference crawler.py:160-161,170).

    Computed per-row with higher-order functions — no shuffle, no Python:
    ``map_from_entries(transform(array_distinct(tokens), w → (w, count)))``.
    Key order is NOT first-occurrence (Counter) order; the invariant is the
    unordered TF vector (SURVEY.md §7.3). For corpus-scale TF analytics use
    the exploded long format in operators/tf.py instead of this map.
    """
    t = F.col(tokens_col)
    entries = F.transform(
        F.array_distinct(t),
        lambda w: F.struct(
            w.alias("key"),
            F.size(F.filter(t, lambda x: x == w)).cast("int").alias("value"),
        ),
    )
    return extracted.withColumn("word_frequency", F.map_from_entries(entries))


def page_data(docs: DataFrame, profile: str = "compat") -> DataFrame:
    """Full reference ``page_data`` record per page (SURVEY.md §1.1)."""
    return with_word_frequency(extract_pages(docs, profile=profile)).select(
        "url", "text", "slug", "title", "meta_description", "headings", "word_count",
        "word_frequency", "images", "external_links", "internal_links",
        "page_hash", "lang", "warc_ts",
    )
