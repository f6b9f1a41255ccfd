"""Plan-shape pins for the round-4 session-2 waves (q305-q316): URL-space
transforms and page extractors stay zero-Exchange per-row codegen, the
PSL/blocklist dims broadcast, co-citation is the inverted-index join (no
nested-loop all-pairs), and nothing new introduces a window."""

import pytest
from pyspark.sql import Row, functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return d.select(
        "doc_id", "text",
        F.concat(
            F.lit("https://www.h"), F.col("doc_id").cast("string"),
            F.lit(".example.co.uk/2024/01/p?b=2&a=1"),
        ).alias("url"),
        F.lit(
            '<form action="/s"><input name="q"></form>'
            '<div itemscope itemtype="https://schema.org/Product">'
            '<span itemprop="name">W</span></div>'
        ).alias("html"),
    )


def test_urlspace_transforms_no_exchange_no_python(pages):
    """surt/prefix/embedded-params are per-row codegen: no shuffle,
    no Python, no window."""
    from tribeca_insights_spark.functions.urlnorm import (
        embedded_url_params,
        surt_key,
        surt_prefix,
    )

    dfs = [
        pages.select(surt_key("url").alias("s")),
        pages.select(surt_prefix(surt_key("url")).alias("p")),
        embedded_url_params(pages),
    ]
    for df in dfs:
        p = _plan(df)
        assert "Exchange" not in p
        assert "EvalPython" not in p
        assert "Window" not in p


def test_page_extractors_no_exchange(pages):
    """forms/microdata/publish-dates/sentences: Scan → Generate →
    Project, rows stay in their input partition."""
    from tribeca_insights_spark.operators.meta import (
        form_census,
        microdata_items,
        publish_dates,
    )
    from tribeca_insights_spark.operators.textstats import sentence_spans

    for df in (
        form_census(pages),
        microdata_items(pages),
        publish_dates(pages),
        sentence_spans(pages),
    ):
        p = _plan(df)
        assert "Exchange" not in p
        assert "EvalPython" not in p
        assert "Window" not in p


def test_registrable_domains_broadcasts_psl_no_smj(spark):
    from tribeca_insights_spark.functions.urlnorm import registrable_domains

    df = spark.createDataFrame([Row(host="a.example.co.uk")])
    p = _plan(registrable_domains(df))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Window" not in p


def test_cocitation_hash_joins_no_nested_loop(spark):
    from tribeca_insights_spark.operators.linkgraph import host_cocitation

    e = spark.createDataFrame(
        [Row(src_host="a", dst_host="x"), Row(src_host="b", dst_host="x")]
    )
    p = _plan(host_cocitation(e, max_fanout=10))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" not in p


def test_compression_signal_arrow_single_pass(spark):
    from tribeca_insights_spark.operators.textstats import compression_signal

    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    p = _plan(compression_signal(df))
    assert p.count("ArrowEvalPython") == 1
    assert "Exchange" not in p


def test_shared_quotes_partial_agg_no_window(spark):
    from tribeca_insights_spark.operators.dedup import shared_quotes

    df = spark.createDataFrame([Row(doc_id=1, text='x "a quote long enough here" y')])
    p = _plan(shared_quotes(df))
    assert "HashAggregate" in p
    assert "Window" not in p


def test_paragraph_langs_no_window_hash_aggs(spark):
    from tribeca_insights_spark.operators.textstats import paragraph_langs

    df = spark.createDataFrame([Row(doc_id=1, text="the a\n\nlos las")])
    p = _plan(paragraph_langs(df))
    assert "Window" not in p
    assert "CartesianProduct" not in p
