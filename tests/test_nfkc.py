"""Round-4 wave: NFKC compatibility normalization (q337)."""

from pyspark.sql import Row

from tribeca_insights_spark.functions.normalize import with_nfkc_text


def _n(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    r = with_nfkc_text(df).collect()[0]
    return r["nfkc_text"], r["nfkc_changed"]


def test_ligature_and_fullwidth(spark):
    assert _n(spark, "ﬁle Ａ４２") == ("file A42", True)


def test_numeric_compat_forms(spark):
    out, changed = _n(spark, "½ x² Ⅷ")
    assert out == "1⁄2 x2 VIII" and changed


def test_nfkc_includes_canonical_fold(spark):
    assert _n(spark, "café") == ("café", True)


def test_ascii_unchanged_and_null(spark):
    assert _n(spark, "plain ascii") == ("plain ascii", False)
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None)], "doc_id bigint, text string"
    )
    assert with_nfkc_text(df).collect()[0]["nfkc_text"] is None
