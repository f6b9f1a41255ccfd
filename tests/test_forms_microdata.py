"""Round-4 wave: form census (q307) and microdata extraction (q308)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.meta import form_census, microdata_items


def _forms(spark, html):
    df = spark.createDataFrame([Row(doc_id=1, html=html)])
    return [r.asDict() for r in form_census(df).orderBy("form_idx").collect()]


def test_login_form_detected(spark):
    got = _forms(
        spark,
        '<form action="/in" method="POST"><input type="password" name="p">'
        '<input type="hidden" name="c"></form>',
    )
    assert len(got) == 1
    r = got[0]
    assert (r["kind"], r["method"], r["action"]) == ("login", "post", "/in")
    assert (r["n_inputs"], r["n_password"], r["n_hidden"]) == (2, 1, 1)


def test_search_by_name_and_default_method(spark):
    # no type=search, but name="q" → search; method defaults to get
    got = _forms(spark, '<form action="/s"><input name="q" type="text"></form>')
    assert got[0]["kind"] == "search" and got[0]["method"] == "get"


def test_newsletter_vs_other_threshold(spark):
    # email input on a 2-field form → newsletter; on a 3-field form → other
    small = _forms(
        spark,
        '<form><input type="email" name="e"><input type="hidden" name="h">'
        "</form>",
    )
    big = _forms(
        spark,
        '<form><input type="email" name="e"><input name="a">'
        '<textarea name="b"></textarea></form>',
    )
    assert small[0]["kind"] == "newsletter"
    assert big[0]["kind"] == "other" and big[0]["n_inputs"] == 3


def test_multiple_forms_indexed_in_order(spark):
    got = _forms(
        spark,
        '<form action="/a"><input name="x"></form>'
        '<form action="/b"><input type="password" name="p"></form>',
    )
    assert [(r["form_idx"], r["action"], r["kind"]) for r in got] == [
        (1, "/a", "other"),
        (2, "/b", "login"),
    ]


def test_no_forms_no_rows(spark):
    assert _forms(spark, "<html><body>text</body></html>") == []


def _micro(spark, html):
    df = spark.createDataFrame([Row(doc_id=1, html=html)])
    return {
        (r["prop"]): (r["itemtype"], r["value"])
        for r in microdata_items(df).collect()
    }


def test_microdata_content_attr_beats_text(spark):
    got = _micro(
        spark,
        '<div itemscope itemtype="https://schema.org/Product">'
        '<span itemprop="name">Widget</span>'
        '<meta itemprop="price" content="9.99"></div>',
    )
    assert got["name"] == ("Product", "Widget")
    assert got["price"] == ("Product", "9.99")


def test_microdata_http_and_bare_scheme(spark):
    got = _micro(
        spark,
        '<div itemscope itemtype="http://schema.org/Article">'
        '<h1 itemprop="headline">T</h1></div>',
    )
    assert got["headline"] == ("Article", "T")


def test_microdata_no_scope_no_rows(spark):
    assert _micro(spark, "<p>plain</p>") == {}
