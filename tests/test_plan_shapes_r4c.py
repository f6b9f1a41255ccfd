"""Plan-shape pins for the round-4 closing waves (q328-q349)."""

import pytest
from pyspark.sql import Row, functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e f g h i j",
             html="<main><p>x</p></main>",
             url="https://a.example.com/p")]
    )


def test_codegen_audits_no_exchange_no_python(docs):
    """The regexp-audit family stays Scan → Project: no shuffle, no
    Python, no window."""
    from tribeca_insights_spark.operators.meta import (
        hidden_text_audit,
        jsonld_article_body,
        semantic_region_census,
    )
    from tribeca_insights_spark.operators.textstats import (
        citation_ids,
        checksum_ids,
        error_leak_audit,
        math_content_signals,
        noncontent_page_flags,
    )

    for op in (error_leak_audit, noncontent_page_flags, citation_ids,
               checksum_ids, math_content_signals):
        p = _plan(op(docs))
        assert "Exchange" not in p, op.__name__
        assert "EvalPython" not in p, op.__name__
    for op in (semantic_region_census, hidden_text_audit,
               jsonld_article_body):
        p = _plan(op(docs))
        assert "Exchange" not in p, op.__name__
        assert "EvalPython" not in p, op.__name__


def test_bm25f_take_ordered_no_global_sort(spark):
    from tribeca_insights_spark.operators.retrieval import bm25f_topk

    df = spark.createDataFrame(
        [Row(doc_id=1, title="a x", text="a b c")]
    )
    p = _plan(bm25f_topk(df, ["a"]))
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_heavy_hitters_single_python_pass_broadcast_recount(spark):
    from tribeca_insights_spark.operators.sketches import heavy_hitters_mg

    df = spark.createDataFrame([Row(token="a"), Row(token="b")])
    p = _plan(heavy_hitters_mg(df, "token", phi_micros=100_000))
    assert p.count("MapInPandas") == 1
    assert "BroadcastHashJoin" in p
    assert "Window" not in p


def test_change_rate_window_is_url_partitioned(spark):
    import datetime as dt

    from tribeca_insights_spark.plans.snapshot import change_rate_schedule

    caps = spark.createDataFrame(
        [Row(url="u", warc_ts=dt.datetime(2026, 1, 1), content_hash="h")]
    )
    p = _plan(change_rate_schedule(caps))
    # a Window exists but it is keyed — never the single-partition form
    assert "Window" in p
    assert "partitionBy" not in p or True  # textual form varies
    assert "No Partition Defined" not in p


def test_stitch_chunks_no_window(spark):
    from tribeca_insights_spark.operators.chunking import stitch_chunks

    df = spark.createDataFrame(
        [Row(doc_id=1, chunk_id=0, chunk_text="a b")]
    )
    p = _plan(stitch_chunks(df, chunk=8, stride=6))
    assert "Window" not in p
    assert "EvalPython" not in p


def test_cocitation_reuse_and_bowtie_no_cartesian(spark):
    from tribeca_insights_spark.operators.linkgraph import (
        bowtie_decomposition,
    )

    e = spark.createDataFrame([Row(src="a", dst="b")])
    s = spark.createDataFrame([Row(node="a")])
    p = _plan(bowtie_decomposition(e, s, k=2))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
