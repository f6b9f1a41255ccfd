"""CIDR/IP-range blocklist matching."""

import pytest
from pyspark.sql import Row

from tribeca_insights_spark.operators.blocklist import (
    cidr_block_flags,
    ip_to_int,
)


def test_ip_to_int_closed_form(spark):
    df = spark.createDataFrame([Row(ip="10.0.0.1"), Row(ip="255.255.255.255")])
    vals = [r["n"] for r in df.select(ip_to_int("ip").alias("n")).collect()]
    assert vals == [10 * 16_777_216 + 1, (1 << 32) - 1]


def test_cidr_match_and_miss(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, ip="10.3.7.9"),      # in 10.3.0.0/16
            Row(doc_id=2, ip="10.4.7.9"),      # miss
            Row(doc_id=3, ip="172.20.1.1"),    # in 172.16.0.0/12
            Row(doc_id=4, ip="172.32.1.1"),    # just past the /12
            Row(doc_id=5, ip="10.42.1.200"),   # in the /24
            Row(doc_id=6, ip="10.42.2.200"),   # sibling /24 -> miss
        ]
    )
    cidrs = spark.createDataFrame(
        [Row(cidr=c) for c in
         ("10.3.0.0/16", "172.16.0.0/12", "10.42.1.0/24")]
    )
    out = {r["doc_id"]: r for r in
           cidr_block_flags(docs, cidrs, prefix_lens=(12, 16, 24)).collect()}
    assert out[1]["blocked"] and out[1]["matched_cidr"] == "10.3.0.0/16"
    assert not out[2]["blocked"] and out[2]["matched_cidr"] is None
    assert out[3]["blocked"] and out[3]["matched_cidr"] == "172.16.0.0/12"
    assert not out[4]["blocked"]
    assert out[5]["blocked"] and out[5]["matched_cidr"] == "10.42.1.0/24"
    assert not out[6]["blocked"]


def test_cidr_overlapping_ranges_lexicographic_first(spark):
    docs = spark.createDataFrame([Row(doc_id=1, ip="10.3.1.1")])
    cidrs = spark.createDataFrame(
        [Row(cidr="10.3.0.0/16"), Row(cidr="10.0.0.0/8")]
    )
    r = cidr_block_flags(docs, cidrs, prefix_lens=(8, 16)).collect()[0]
    assert r["blocked"] and r["matched_cidr"] == "10.0.0.0/8"  # lex-first


def test_cidr_unlisted_prefix_length_raises(spark):
    docs = spark.createDataFrame([Row(doc_id=1, ip="10.3.1.1")])
    cidrs = spark.createDataFrame([Row(cidr="10.3.0.0/17")])
    with pytest.raises(ValueError, match="prefix lengths"):
        cidr_block_flags(docs, cidrs, prefix_lens=(16, 24))
