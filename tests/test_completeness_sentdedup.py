"""Round-4 wave: article completeness (q323), sentence dedup (q324)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.dedup import dedup_sentences
from tribeca_insights_spark.operators.meta import article_completeness


def _card(spark, url, html):
    df = spark.createDataFrame([Row(doc_id=1, url=url, html=html)])
    r = article_completeness(df).collect()[0]
    return (r["has_title"], r["has_date"], r["has_author"],
            r["completeness"])


def test_full_article(spark):
    assert _card(
        spark,
        "https://a.com/p",
        '<title>T</title>'
        '<meta property="article:published_time" content="2024-01-01T0">'
        '<meta name="author" content="A">',
    ) == (1, 1, 1, 3)


def test_channels_mix_and_match(spark):
    # og:title + jsonld author + url date
    assert _card(
        spark,
        "https://a.com/2021/06/x",
        '<meta property="og:title" content="T">'
        '<script type="application/ld+json">{"author": {"name": "N"}}'
        "</script>",
    ) == (1, 1, 1, 3)


def test_empty_title_does_not_count(spark):
    assert _card(spark, "https://a.com/p", "<title>  </title>") == (
        0, 0, 0, 0)


def test_shell_page(spark):
    assert _card(spark, "https://a.com/p", "<body>nav nav nav</body>") == (
        0, 0, 0, 0)


def test_sentence_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Shared one. Alpha body."),
            Row(doc_id=2, text="Shared one. Beta body."),
            Row(doc_id=3, text="Gamma body. Shared one."),
        ]
    )
    got = {r["doc_id"]: r.asDict() for r in dedup_sentences(df).collect()}
    assert got[1]["kept_text"] == "Shared one. Alpha body."
    assert got[2]["kept_text"] == "Beta body."
    assert got[3]["kept_text"] == "Gamma body."
    assert (got[2]["n_sentences"], got[2]["n_kept"]) == (2, 1)


def test_sentence_dedup_within_doc_repeat(spark):
    # repeated sentence INSIDE one doc also collapses to first position
    df = spark.createDataFrame(
        [Row(doc_id=1, text="Twice said. Middle bit. Twice said.")]
    )
    r = dedup_sentences(df).collect()[0]
    assert r["kept_text"] == "Twice said. Middle bit."
    assert (r["n_sentences"], r["n_kept"]) == (3, 2)


def test_sentence_dedup_order_preserved(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="C third? A first. B second!")]
    )
    r = dedup_sentences(df).collect()[0]
    assert r["kept_text"] == "C third? A first. B second!"
