"""Round-4 wave: semantic regions (q348) and hidden text (q349)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.meta import (
    hidden_text_audit,
    semantic_region_census,
)


def _sem(spark, html):
    df = spark.createDataFrame([Row(doc_id=1, html=html)])
    return semantic_region_census(df).collect()[0].asDict()


def test_main_is_anchored(spark):
    r = _sem(spark, "<main><p>x</p></main>")
    assert (r["has_main"], r["extraction_tier"]) == (1, "anchored")


def test_single_vs_multi_article(spark):
    assert _sem(spark, "<article>a</article>")["extraction_tier"] == (
        "anchored")
    r = _sem(spark, "<article>a</article><article>b</article>")
    assert (r["n_articles"], r["extraction_tier"]) == (2, "feed")


def test_div_soup_heuristic(spark):
    r = _sem(spark, '<div id="main">x</div>')
    # div id=main is NOT a <main> element
    assert (r["has_main"], r["extraction_tier"]) == (0, "heuristic")


def _hid(spark, html):
    df = spark.createDataFrame([Row(doc_id=1, html=html)])
    return hidden_text_audit(df).collect()[0].asDict()


def test_hidden_channels_counted(spark):
    r = _hid(spark,
             '<div style="display:none">abc</div>'
             '<i style="visibility: hidden">de</i>'
             '<b style="font-size:0;">fgh</b>')
    assert (r["n_hidden_elements"], r["n_hidden_chars"]) == (3, 8)


def test_cloaking_threshold(spark):
    big = '<div style="display:none">' + "x" * 200 + "</div>"
    assert _hid(spark, big)["cloaking_suspect"] == 1
    small = '<div style="display:none">tiny</div>'
    assert _hid(spark, small)["cloaking_suspect"] == 0


def test_visible_styles_ignored(spark):
    r = _hid(spark, '<div style="display:block">shown</div>'
                    '<p style="font-size:10px">normal</p>')
    assert r["n_hidden_elements"] == 0
