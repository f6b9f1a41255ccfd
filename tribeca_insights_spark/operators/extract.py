"""Extraction operators — the Arrow-batched hot path.

One struct-returning pandas UDF performs a SINGLE parse per page and emits
every per-page field the reference computes (SURVEY.md §2.2 O1, O2, O4-O11;
reference crawler.py:104-183 does the same work row-at-a-time in threads).
Batches arrive via Arrow (tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
down for fat HTML blobs — see session.py); everything downstream is native
Catalyst (explode / joins / aggregations).

Tokenization is FUSED into the UDF (clean_and_tokenize — the line-faithful
reference tokenizer, text_utils.py:99-116): measured on this Spark build,
JVM regexp_replace / regex-split run ~1.4 ms/row (pattern handling
pathology) while Python ``re`` with module-compiled patterns does ~0.03
ms/doc — 40× faster, and byte-exact by construction. Tokens cross Arrow
as ONE space-joined string and the per-page ``word_frequency`` Counter
(crawler.py:160-161) as ONE compact-JSON string: Arrow's array/map child
layouts (per-element offsets + validity) measurably dominate the full
extraction path, so both collections are re-derived JVM-side — literal
``split`` (codegen) and ``from_json`` — which Catalyst prunes entirely
for consumers that never touch them. Measured effect of the two changes:
full-path extraction+TF 23.9k → 54.0k docs/sec at local[32].

Charset policy: ``html`` is ``binary`` (input_hint); when the input carries
a per-page declared ``charset`` column (the WARC/WET reader emits one from
Content-Type / <meta charset>), every decode honors it — matching the
reference, which consumes ``requests``' header-charset-decoded ``resp.text``
(crawler.py:137-138). Absent/unknown charsets decode UTF-8 with
``errors="replace"``, the Common-Crawl-standard fallback. Fixtures are
UTF-8, making the byte-identity invariant well-posed.
"""

from __future__ import annotations

import hashlib
import json
from collections import Counter
from functools import lru_cache
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..functions.slug import url_slug
from ..functions.tokenize import clean_and_tokenize
from ..htmlx.extractor import (
    external_links,
    internal_links,
    parse_page,
    url_domain,
)
from ..schemas import EXTRACT_STRUCT, SEO_STRUCT, WORD_FREQUENCY_TYPE

_TOKEN_PROFILE = "compat"  # default stopword profile inside the UDFs


def _decode(h: Optional[object], charset: Optional[str] = None) -> str:
    """bytes → str with the page's DECLARED charset when one is carried
    (the WARC/WET reader emits it per record from Content-Type / <meta
    charset>, sources/warc.py:94-107) — mirroring the reference, which
    inherits requests' header-charset decode (crawler.py:137-138,
    ``response.text``). Unknown/absent charset falls back to
    UTF-8(replace), the old behavior; decode NEVER raises (errors=replace,
    like requests)."""
    if h is None:
        return ""
    if isinstance(h, (bytes, bytearray, memoryview)):
        b = bytes(h)
        if charset:
            try:
                return b.decode(charset.strip().lower(), errors="replace")
            except LookupError:
                pass  # undeclared/bogus codec name → utf-8 fallback
        return b.decode("utf-8", errors="replace")
    return str(h)


def _extract_batch(url: pd.Series, html: pd.Series, lang: pd.Series,
                   charset: pd.Series,
                   profile: str = _TOKEN_PROFILE) -> pd.DataFrame:
    out = {
        "text": [], "title": [], "meta_description": [], "headings": [],
        "images": [], "external_links": [], "internal_links": [],
        "slug": [], "page_hash": [], "tokens_str": [],
        "word_count": [], "wf_json": [], "seo_json": [],
    }
    for u, h, lg, cs in zip(url, html, lang, charset):
        u = u or ""
        page = parse_page(_decode(h, cs))
        dom = url_domain(u)
        toks = clean_and_tokenize(page.text, lg or "", profile)
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
        out["tokens_str"].append(" ".join(toks))
        out["word_count"].append(len(toks))
        # compact JSON (words are letter-class only — no escaping surprises);
        # rebuilt as MapType JVM-side via from_json (see extract_pages)
        out["wf_json"].append(
            json.dumps(dict(Counter(toks)), separators=(",", ":"))
        )
        # SEO extension fields as one compact JSON string (Arrow-cheap;
        # from_json rebuilds the struct JVM-side, see schemas.SEO_STRUCT)
        out["seo_json"].append(
            json.dumps(
                {
                    "canonical": page.canonical,
                    "og_title": page.og_title,
                    "og_description": page.og_description,
                    "og_image": page.og_image,
                    "og_url": page.og_url,
                    "meta_robots": page.meta_robots,
                    "twitter_title": page.twitter_title,
                    "twitter_description": page.twitter_description,
                    "twitter_image": page.twitter_image,
                    "hreflang": page.hreflang,
                },
                separators=(",", ":"),
            )
        )
    return pd.DataFrame(out)


def _charset_expr(docs: DataFrame, charset_col: str | None):
    """Column feeding the UDF's charset series: the named column,
    ``"auto"`` → a ``charset`` column when present, else NULL (= UTF-8)."""
    if charset_col == "auto":
        charset_col = "charset" if "charset" in docs.columns else None
    if charset_col is None:
        return F.lit(None).cast(StringType())
    return F.col(charset_col)


@lru_cache(maxsize=None)
def make_extract_page_udf(profile: str = _TOKEN_PROFILE):
    """Struct-returning extraction pandas UDF bound to a stopword profile
    (the profile rides the closure; stopword sets are lru-cached per
    executor — no per-batch reload)."""

    def batch(url: pd.Series, html: pd.Series, lang: pd.Series,
              charset: pd.Series) -> pd.DataFrame:
        return _extract_batch(url, html, lang, charset, profile)

    return pandas_udf(batch, returnType=EXTRACT_STRUCT)


extract_page_udf = make_extract_page_udf(_TOKEN_PROFILE)


def _extract_text_batch(html: pd.Series, charset: pd.Series) -> pd.Series:
    from ..htmlx.extractor import extract_visible_text

    return pd.Series(
        [extract_visible_text(_decode(h, cs)) for h, cs in zip(html, charset)]
    )


# Text-only fast path: parses once, ships ONE string column back over Arrow.
extract_text_udf = pandas_udf(_extract_text_batch, returnType=StringType())


@lru_cache(maxsize=None)
def make_extract_tokens_udf(profile: str = _TOKEN_PROFILE):
    """Tokens-only fast path for TF pipelines: parse + tokenize per page,
    ship just the token array."""

    def batch(html: pd.Series, lang: pd.Series,
              charset: pd.Series) -> pd.Series:
        from ..htmlx.extractor import extract_visible_text

        return pd.Series(
            [
                clean_and_tokenize(extract_visible_text(_decode(h, cs)),
                                   lg or "", profile)
                for h, lg, cs in zip(html, lang, charset)
            ]
        )

    return pandas_udf(batch, returnType=ArrayType(StringType()))


extract_tokens_udf = make_extract_tokens_udf(_TOKEN_PROFILE)


@lru_cache(maxsize=None)
def make_extract_tokstr_udf(profile: str = _TOKEN_PROFILE):
    """Fastest TF path: one space-joined token string per page over Arrow;
    JVM explodes it with a literal-delimiter split (codegen, no regex)."""

    def batch(html: pd.Series, lang: pd.Series,
              charset: pd.Series) -> pd.Series:
        from ..htmlx.extractor import extract_visible_text

        return pd.Series(
            [
                " ".join(
                    clean_and_tokenize(
                        extract_visible_text(_decode(h, cs)), lg or "",
                        profile
                    )
                )
                for h, lg, cs in zip(html, lang, charset)
            ]
        )

    return pandas_udf(batch, returnType=StringType())


extract_tokstr_udf = make_extract_tokstr_udf(_TOKEN_PROFILE)


def extract_token_strings(docs: DataFrame,
                          profile: str = _TOKEN_PROFILE) -> DataFrame:
    """(url, lang, tokens_str) — the corpus-TF hot path."""
    return docs.select(
        "url", "lang",
        make_extract_tokstr_udf(profile)(
            F.col("html"), F.col("lang"), _charset_expr(docs, "auto")
        ).alias("tokens_str"),
    )


def extract_pages(docs: DataFrame, tokens: bool = True,
                  profile: str = "compat",
                  charset_col: str | None = "auto") -> DataFrame:
    """docs(url, warc_ts, html, text, lang) → extracted per-page DataFrame.

    Plan shape: Scan → ArrowEvalPython (one parse+tokenize per page) →
    Project (flatten). No shuffle at all — extraction is embarrassingly
    parallel and stays that way at 10^12 docs; partitioning is inherited
    from the source (url-hash-bucketed Iceberg scan in production).

    ``charset_col``: name of a per-page declared-charset column (the
    WARC/WET reader emits one) used to decode ``html:binary`` with page
    fidelity for non-UTF-8 corpora — the reference gets this for free from
    requests (crawler.py:137-138). ``"auto"`` (default) uses a ``charset``
    column when the input has one, else UTF-8; ``None`` forces legacy
    UTF-8-only decode.

    ``tokens=False`` drops token-derived columns from the projection (the
    UDF output is pruned at the Arrow boundary only in the dedicated
    fast-path helpers; here it trims the downstream row width).
    """
    e = docs.withColumn(
        "_x",
        make_extract_page_udf(profile)(
            F.col("url"), F.col("html"), F.col("lang"),
            _charset_expr(docs, charset_col),
        ),
    )
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
        # SEO extension struct (canonical/og_*/meta_robots/twitter_*/
        # hreflang); pruned by Catalyst when untouched
        F.from_json(F.col("_x.seo_json"), SEO_STRUCT).alias("seo"),
    ]
    if tokens:
        # tokens array and word_frequency map are derived JVM-side from the
        # two Arrow-shipped strings: literal split (codegen) + empty filter
        # ≡ the Python list; from_json ≡ the Python Counter dict. Consumers
        # that don't touch them get both pruned by Catalyst.
        cols += [
            F.filter(
                F.split(F.col("_x.tokens_str"), " ", -1),
                lambda t: F.length(t) > 0,
            ).alias("tokens"),
            F.col("_x.tokens_str").alias("tokens_str"),
            F.col("_x.word_count").alias("word_count"),
            F.from_json(F.col("_x.wf_json"), WORD_FREQUENCY_TYPE).alias(
                "word_frequency"
            ),
        ]
    return e.select(*cols)


def extract_texts(docs: DataFrame, tokens: bool = True,
                  profile: str = "compat") -> DataFrame:
    """(url, lang, text[, tokens]) extraction fast path for TF pipelines."""
    if tokens:
        return docs.select(
            "url", "lang",
            make_extract_tokens_udf(profile)(
                F.col("html"), F.col("lang"), _charset_expr(docs, "auto")
            ).alias("tokens"),
        )
    return docs.select(
        "url", "lang",
        extract_text_udf(
            F.col("html"), _charset_expr(docs, "auto")
        ).alias("text"),
    )


def with_word_frequency(extracted: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """page_data ``word_frequency`` map from a tokens array, computed
    per-row with higher-order functions (no shuffle, no Python). NOTE:
    interpreted (non-codegen) — prefer the UDF-fused word_frequency column
    from :func:`extract_pages`; this exists for token arrays produced by
    other means. Key order is NOT first-occurrence (Counter) order; the
    invariant is the unordered TF vector (SURVEY.md §7.3)."""
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
    return extract_pages(docs, profile=profile).select(
        "url", "text", "slug", "title", "meta_description", "headings",
        "word_count", "word_frequency", "images", "external_links",
        "internal_links", "page_hash", "lang", "warc_ts",
    )
