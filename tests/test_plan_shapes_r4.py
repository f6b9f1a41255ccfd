"""Plan-shape pins for the round-4 session waves (q257-q287): the new
extractors must stay zero-Exchange per-page codegen, the new joins
must broadcast their dims, and nothing new may introduce a window."""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    html = F.concat(
        F.lit('<html><head><meta name="robots" content="noai">'
              '<meta property="og:title" content="T">'
              '<link rel="canonical" href="https://h/x">'
              '<script type="application/ld+json">{"@type":"A",'
              '"name":"n"}</script></head><body>'
              '<img src="a.jpg" srcset="b.jpg 10w"></body></html>'),
    )
    return d.select(
        "doc_id", F.col("text"),
        html.alias("html"),
        F.concat(F.lit("https://h"), F.col("doc_id").cast("string"))
        .alias("url"),
    )


def test_head_metadata_extractors_no_exchange_no_python(pages):
    """meta/link/img/jsonld extraction is Scan → Generate → Project:
    any Exchange would reshuffle raw html; any Python node would
    betray the codegen claim."""
    from tribeca_insights_spark.operators.meta import (
        image_sources,
        jsonld_entities,
        link_tags,
        meta_tags,
    )

    for op in (meta_tags, link_tags, jsonld_entities, image_sources):
        p = _plan(op(pages))
        assert "Exchange" not in p, op.__name__
        assert "EvalPython" not in p, op.__name__
        assert "Window" not in p, op.__name__


def test_robots_meta_single_partial_agg_no_window(pages):
    from tribeca_insights_spark.operators.meta import robots_meta_flags

    p = _plan(robots_meta_flags(pages))
    assert "HashAggregate" in p
    assert "Window" not in p
    assert "SortAggregate" not in p


def test_google_robots_verdict_broadcasts_rules(spark, pages):
    from tribeca_insights_spark.sources.robots import (
        google_robots_rules,
        google_robots_verdict,
    )

    robots = pages.select(
        "doc_id",
        F.lit("User-agent: *\nDisallow: /p/*\nAllow: /p/x\n")
        .alias("robots_txt"),
    )
    rules = google_robots_rules(robots, user_agent="t")
    urls = pages.select("doc_id", F.lit("/p/y").alias("path"))
    p = _plan(google_robots_verdict(urls, rules))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p


def test_lm_smoothing_tables_no_window(spark):
    from tribeca_insights_spark.operators.lm import (
        good_turing_counts,
        kneser_ney_bigram,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op in (kneser_ney_bigram, good_turing_counts):
        p = _plan(op(d, F.col("lang") == "en"))
        assert "Window" not in p, op.__name__
        assert "HashAggregate" in p, op.__name__


def test_text_tiling_doc_keyed_no_window(spark):
    from tribeca_insights_spark.operators.textstats import text_tiling

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(text_tiling(d))
    assert "Window" not in p
    assert "EvalPython" not in p  # pure JVM: no Arrow stage at all


def test_section_tree_no_shuffle(pages):
    from tribeca_insights_spark.operators.sections import section_tree

    p = _plan(section_tree(pages.select("doc_id", "html")))
    assert "Exchange" not in p
    assert "ArrowEvalPython" in p  # the one walker pass


def test_governance_ops_stay_codegen(pages):
    from tribeca_insights_spark.operators.governance import (
        ai_optout_flags,
        license_signals,
    )

    for op in (license_signals, ai_optout_flags):
        p = _plan(op(pages))
        assert "EvalPython" not in p, op.__name__
        assert "Window" not in p, op.__name__


def test_param_significance_and_traps_groupby_ladder(spark):
    from tribeca_insights_spark.functions.urlnorm import (
        crawl_trap_score,
        param_significance,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pg = d.select(
        F.concat(F.lit("https://h/p?a="),
                 F.col("doc_id").cast("string")).alias("url"),
        F.md5(F.col("text")).alias("content_hash"),
    )
    for op in (param_significance, crawl_trap_score):
        p = _plan(op(pg))
        assert "Window" not in p, op.__name__
        assert "EvalPython" not in p, op.__name__
        assert "HashAggregate" in p, op.__name__


def test_kleinberg_one_term_shuffle(spark):
    """The DP's only corpus exchange is the term-key shuffle into
    applyInPandas; the cost grid must never window."""
    from tribeca_insights_spark.operators.stats import kleinberg_bursts

    ev = spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 0)], "term string, t long"
    )
    p = _plan(kleinberg_bursts(ev))
    assert "FlatMapGroupsInPandas" in p
    assert "Window" not in p
