"""Round-4 wave: citation ids (q342) and math signals (q343)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.textstats import (
    citation_ids,
    math_content_signals,
)


def _cites(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return {(r["kind"], r["ident"]) for r in citation_ids(df).collect()}


def test_doi_trailing_punct_stripped(spark):
    got = _cites(spark, "See doi:10.1000/xyz123. And (10.5555/abc).")
    assert got == {("doi", "10.1000/xyz123"), ("doi", "10.5555/abc")}


def test_arxiv_forms(spark):
    got = _cites(spark, "arXiv:2403.01234v2 and arXiv:math.GT/0309136")
    assert got == {("arxiv", "2403.01234v2"), ("arxiv", "math.GT/0309136")}


def test_pmid(spark):
    assert _cites(spark, "PMID: 12345678") == {("pmid", "12345678")}


def test_no_citations(spark):
    assert _cites(spark, "plain text 10.5 percent growth") == set()


def _math(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return math_content_signals(df).collect()[0].asDict()


def test_display_and_env(spark):
    r = _math(spark, "$$a$$ \\[b\\] \\begin{equation}c\\end{equation}")
    assert (r["n_display"], r["n_environments"], r["is_mathy"]) == (2, 1, 1)


def test_symbol_threshold(spark):
    assert _math(spark, "∑ ∫ ∂ √ ≤ here")["is_mathy"] == 1
    assert _math(spark, "just ∑ alone")["is_mathy"] == 0


def test_price_dollar_not_math(spark):
    r = _math(spark, "the price is $5 and $10 today")
    assert (r["n_display"], r["is_mathy"]) == (0, 0)
