"""IPF raking + outlink spam ratio."""

import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.blocklist import outlink_spam_ratio
from tribeca_insights_spark.operators.mixing import ipf_raking


def _targets(spark, key, vals_micros):
    col = "row_key" if key == "row" else "col_key"
    return spark.createDataFrame(
        [Row(**{col: k, "target_micros": v}) for k, v in vals_micros]
    )


def test_ipf_converges_marginals_toward_targets(spark):
    """Skewed 2×2 table raked to uniform marginals: after 6 iters each
    weighted marginal share is within 1% of 50% (row side converges
    geometrically since the col pass runs last and perturbs it)."""
    counts = spark.createDataFrame(
        [
            Row(row_key="a", col_key="x", n=90),
            Row(row_key="a", col_key="y", n=10),
            Row(row_key="b", col_key="x", n=30),
            Row(row_key="b", col_key="y", n=70),
        ]
    )
    rt = _targets(spark, "row", [("a", 500_000), ("b", 500_000)])
    ct = _targets(spark, "col", [("x", 500_000), ("y", 500_000)])
    w = ipf_raking(counts, rt, ct, iters=6)
    rows = w.collect()
    total = sum(r["n"] * r["weight_micros"] for r in rows)
    for key in ("a", "b"):
        share = sum(
            r["n"] * r["weight_micros"] for r in rows
            if r["row_key"] == key
        ) / total
        assert abs(share - 0.5) < 0.01
    for key in ("x", "y"):
        share = sum(
            r["n"] * r["weight_micros"] for r in rows
            if r["col_key"] == key
        ) / total
        # col pass ran last, so col marginals are essentially exact
        assert abs(share - 0.5) < 0.001


def test_ipf_zero_iters_returns_unit_weights(spark):
    counts = spark.createDataFrame(
        [Row(row_key="a", col_key="x", n=5)]
    )
    rt = _targets(spark, "row", [("a", 1_000_000)])
    ct = _targets(spark, "col", [("x", 1_000_000)])
    r = ipf_raking(counts, rt, ct, iters=0).collect()[0]
    assert r["weight_micros"] == 1_000_000 and r["n"] == 5
    with pytest.raises(ValueError, match="iters"):
        ipf_raking(counts, rt, ct, iters=-1)


def test_spam_ratio_counts_multiplicity_and_suffixes(spark):
    links = spark.createDataFrame(
        [
            Row(doc_id=1, target_host="good.example.org"),
            Row(doc_id=1, target_host="bad.casino.net"),
            Row(doc_id=1, target_host="x.bad.casino.net"),  # subdomain
            Row(doc_id=1, target_host="bad.casino.net"),    # repeat counts
            Row(doc_id=2, target_host="good.example.org"),
        ]
    )
    bl = spark.createDataFrame([Row(entry="bad.casino.net")])
    out = {r["doc_id"]: r for r in outlink_spam_ratio(links, bl).collect()}
    assert out[1]["n_outlinks"] == 4
    assert out[1]["n_blocked"] == 3
    assert out[1]["blocked_ppm"] == 750_000
    assert out[2]["n_blocked"] == 0 and out[2]["blocked_ppm"] == 0
