"""Round-4 wave: percent normalization (q340), JSONL audit (q341)."""

from pyspark.sql import Row

from tribeca_insights_spark.functions.urlnorm import percent_normalize
from tribeca_insights_spark.sources.jsonl import (
    json_schema_audit,
    parse_jsonl,
)


def _pn(spark, url):
    df = spark.createDataFrame([Row(url=url)])
    return df.select(percent_normalize("url").alias("n")).collect()[0]["n"]


def test_unreserved_decode(spark):
    assert _pn(spark, "https://a/%7Euser/%41%2D%5F") == "https://a/~user/A-_"


def test_reserved_preserved_uppercased(spark):
    assert _pn(spark, "https://a/p?q=a%2fb%3fc%26d") == (
        "https://a/p?q=a%2Fb%3Fc%26d")


def test_nonascii_escape_uppercased_not_decoded(spark):
    assert _pn(spark, "https://a/caf%c3%a9") == "https://a/caf%C3%A9"


def test_no_escapes_passthrough(spark):
    assert _pn(spark, "https://a/plain?x=1") == "https://a/plain?x=1"


def test_jsonl_audit_matrix(spark):
    rows = [
        (0, '{"a": 1, "b": "x"}'),
        (0, '{"a": 2}'),
        (0, "garbage"),
        (1, '{"a": 3, "c": true}'),
    ]
    df = spark.createDataFrame(
        [Row(batch_id=b, line=l) for b, l in rows]
    )
    got = {(r["batch_id"], r["field"]): r.asDict()
           for r in json_schema_audit(df, "line", "a long, b string")
           .collect()}
    assert got[(0, "a")]["n_present"] == 2
    assert got[(0, "b")]["n_present"] == 1
    assert got[(0, "_corrupt")]["n_present"] == 1
    assert got[(0, "a")]["present_micros"] == 666666
    # extra undeclared field ignored; batch 1 fully clean
    assert got[(1, "a")]["n_present"] == 1
    assert got[(1, "_corrupt")]["n_present"] == 0


def test_parse_jsonl_corrupt_carries_raw_line(spark):
    df = spark.createDataFrame([Row(batch_id=0, line="oops")])
    r = parse_jsonl(df, "line", "a long").collect()[0]["rec"]
    assert r["a"] is None and r["_corrupt"] == "oops"


def test_audit_parameterized_and_nested_ddl(spark):
    # ADVICE r4: field list must come from a real DDL parse —
    # decimal(10,2)/array<struct<...>> broke the naive comma split
    from pyspark.sql import Row
    from tribeca_insights_spark.sources.jsonl import json_schema_audit

    df = spark.createDataFrame([
        Row(batch_id="b1",
            line='{"price": 1.25, "tags": [{"k": "a", "v": 1}]}'),
        Row(batch_id="b1", line='{"price": 2.50}'),
        Row(batch_id="b1", line="not json"),
    ])
    out = {
        (r["field"], r["n_present"])
        for r in json_schema_audit(
            df, "line",
            "price decimal(10,2), tags array<struct<k:string,v:int>>",
        ).collect()
    }
    assert out == {("price", 2), ("tags", 1), ("_corrupt", 1)}
