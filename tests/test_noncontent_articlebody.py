"""Round-4 wave: non-content flags (q332), articleBody cross-check (q333)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.meta import jsonld_article_body
from tribeca_insights_spark.operators.textstats import noncontent_page_flags


def _flags(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return noncontent_page_flags(df).collect()[0].asDict()


def test_each_family(spark):
    assert _flags(spark, "THIS DOMAIN IS FOR SALE")["parked"] == 1
    assert _flags(spark, "please Accept All Cookies")["consent_wall"] == 1
    assert _flags(spark, "page Under Construction")["under_construction"] == 1
    assert _flags(spark, "Subscribe to continue now")["paywall_hint"] == 1


def test_family_counted_once(spark):
    r = _flags(spark, "we use cookies and manage cookie settings here")
    assert (r["consent_wall"], r["n_families"]) == (1, 1)


def test_multiple_families_sum(spark):
    r = _flags(spark, "under construction - subscribe to continue")
    assert r["n_families"] == 2


def test_decoys_clean(spark):
    r = _flags(spark, "grandma's cookies recipe; construction equipment sale")
    assert r["n_families"] == 0


def _xc(spark, html, text):
    df = spark.createDataFrame([Row(doc_id=1, html=html, text=text)])
    return jsonld_article_body(df).collect()[0].asDict()


def test_articlebody_ratio(spark):
    body = "a" * 100
    html = ('{"articleBody":"%s"}' % body)
    r = _xc(spark, html, "a" * 50)
    assert (r["has_articlebody"], r["body_len"], r["extracted_len"]) == (
        1, 100, 50)
    assert r["len_ratio_micros"] == 500_000


def test_articlebody_absent(spark):
    r = _xc(spark, "<p>no markup</p>", "some text")
    assert (r["has_articlebody"], r["body_len"],
            r["len_ratio_micros"]) == (0, None, None)
