"""Round-4 wave: publish dates (q309), sentence spans (q310),
shared quotes (q311)."""

import datetime

from pyspark.sql import Row

from tribeca_insights_spark.operators.dedup import shared_quotes
from tribeca_insights_spark.operators.meta import publish_dates
from tribeca_insights_spark.operators.textstats import sentence_spans


def _dates(spark, url, html):
    df = spark.createDataFrame([Row(doc_id=1, url=url, html=html)])
    r = publish_dates(df).collect()[0]
    return r["pub_date"], r["channel"]


def test_meta_beats_jsonld(spark):
    d, ch = _dates(
        spark,
        "https://a.com/2020/01/x",
        '<meta property="article:published_time" content="2024-05-03T10:00:00Z">'
        '<script type="application/ld+json">{"datePublished": "1999-01-01"}'
        "</script>",
    )
    assert (d, ch) == (datetime.date(2024, 5, 3), "meta")


def test_jsonld_beats_url(spark):
    d, ch = _dates(
        spark,
        "https://a.com/2020/01/x",
        '<script type="application/ld+json">'
        '{"datePublished": "2023-07-11T00:00:00+02:00"}</script>',
    )
    assert (d, ch) == (datetime.date(2023, 7, 11), "jsonld")


def test_url_pattern_first_of_month(spark):
    d, ch = _dates(spark, "https://a.com/2022/09/post-1", "<p>x</p>")
    assert (d, ch) == (datetime.date(2022, 9, 1), "url")


def test_url_pattern_rejects_bad_month(spark):
    d, ch = _dates(spark, "https://a.com/2022/13/post-1", "<p>x</p>")
    assert (d, ch) == (None, None)


def _sents(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return [
        (r["sent_idx"], r["sentence"])
        for r in sentence_spans(df).orderBy("sent_idx").collect()
    ]


def test_sentence_boundaries_and_tail(spark):
    assert _sents(spark, "One two. Three!! Four? tail") == [
        (1, "One two."),
        (2, "Three!!"),
        (3, "Four?"),
        (4, "tail"),
    ]


def test_sentence_no_boundary_single(spark):
    assert _sents(spark, "no terminal punctuation here") == [
        (1, "no terminal punctuation here")
    ]


def test_sentence_trailing_punct_no_empty_piece(spark):
    # text ending in '.' (no following whitespace) → one sentence
    assert _sents(spark, "Only one.") == [(1, "Only one.")]


def test_sentence_empty_text(spark):
    assert _sents(spark, "   ") == []


def test_shared_quotes_rollup(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text='a "the same twenty-char quote" b'),
            Row(doc_id=2, text='c "the same twenty-char quote" and '
                               '"the same twenty-char quote" again'),
            Row(doc_id=3, text="curly “another long enough quote here” x"),
            Row(doc_id=4, text='short "tiny" quote ignored'),
        ]
    )
    got = {r["quote"]: r for r in shared_quotes(df).collect()}
    assert len(got) == 2
    r = got["the same twenty-char quote"]
    assert (r["n_docs"], r["n_occurrences"], r["sample_doc_id"]) == (2, 3, 1)
    assert got["another long enough quote here"]["n_docs"] == 1
