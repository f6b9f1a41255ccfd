"""Round-4 wave: checksum ids (q344) and Clean-param rules (q345)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.textstats import checksum_ids
from tribeca_insights_spark.sources.robots import clean_param_rules


def _ids(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return {(r["kind"], r["ident"]): r["valid"]
            for r in checksum_ids(df).collect()}


def test_orcid_checksum(spark):
    got = _ids(spark, "0000-0002-1825-0097 0000-0002-1825-0096")
    assert got[("orcid", "0000-0002-1825-0097")] == 1
    assert got[("orcid", "0000-0002-1825-0096")] == 0


def test_orcid_x_check_digit(spark):
    # 0000-0002-9079-593X is a published ORCID with X check digit
    got = _ids(spark, "id 0000-0002-9079-593X here")
    assert got[("orcid", "0000-0002-9079-593X")] == 1


def test_isbn13_dashed_and_plain(spark):
    got = _ids(spark, "978-0-306-40615-7 and 9780306406157 and 9780306406158")
    assert got[("isbn13", "978-0-306-40615-7")] == 1
    assert got[("isbn13", "9780306406157")] == 1
    assert got[("isbn13", "9780306406158")] == 0


def test_no_ids(spark):
    assert _ids(spark, "phone 0000-0002 and price 97891234") == {}


def test_clean_param_parsing(spark):
    df = spark.createDataFrame([Row(
        host="h", robots_txt=(
            "User-agent: *\nDisallow: /x\n"
            "Clean-param: ref&sid /forum/\n"
            "CLEAN-PARAM: utm_source\n"
        ))])
    got = {(r["param"], r["path_prefix"])
           for r in clean_param_rules(df).collect()}
    assert got == {("ref", "/forum/"), ("sid", "/forum/"),
                   ("utm_source", "")}


def test_clean_param_absent(spark):
    df = spark.createDataFrame(
        [Row(host="h", robots_txt="User-agent: *\nDisallow: /")]
    )
    assert clean_param_rules(df).collect() == []
