"""Round-4 wave: robots drift (q350) and budget apportionment (q351)."""

from pyspark.sql import Row

from tribeca_insights_spark.plans.frontier import apportion_budget
from tribeca_insights_spark.sources.robots import robots_policy_drift


def test_drift_matrix(spark):
    old = spark.createDataFrame([
        Row(host="a", robots_txt="Disallow: /x\nDisallow: /y"),
        Row(host="b", robots_txt="Disallow: /x"),
        Row(host="gone", robots_txt="Disallow: /z"),
    ])
    new = spark.createDataFrame([
        Row(host="a", robots_txt="Disallow: /x\nDisallow: /y"),
        Row(host="b", robots_txt="Disallow: /x\nDisallow: /new"),
        Row(host="fresh", robots_txt="Disallow: /w"),
    ])
    got = {r["host"]: r.asDict()
           for r in robots_policy_drift(old, new).collect()}
    assert (got["a"]["n_added"], got["a"]["n_removed"]) == (0, 0)
    assert (got["b"]["n_added"], got["b"]["tightened"]) == (1, 1)
    # host vanished from snapshot: all its rules count removed
    assert (got["gone"]["n_removed"], got["gone"]["loosened"]) == (1, 1)
    assert got["fresh"]["n_added"] == 1


def test_apportionment_sums_exactly(spark):
    w = spark.createDataFrame(
        [Row(host=f"h{i}", weight=i + 1) for i in range(10)]
    )
    rows = apportion_budget(w, total_budget=100).collect()
    assert sum(r["budget"] for r in rows) == 100
    got = {r["host"]: r["budget"] for r in rows}
    # hand-computed Hamilton allocation (total weight 55)
    assert got == {"h0": 2, "h1": 4, "h2": 5, "h3": 7, "h4": 9,
                   "h5": 11, "h6": 13, "h7": 15, "h8": 16, "h9": 18}


def test_apportionment_exact_division_no_extras(spark):
    w = spark.createDataFrame(
        [Row(host="a", weight=1), Row(host="b", weight=3)]
    )
    rows = {r["host"]: r.asDict()
            for r in apportion_budget(w, total_budget=8).collect()}
    assert rows["a"]["budget"] == 2 and rows["b"]["budget"] == 6
    assert rows["a"]["extra"] == 0 and rows["b"]["extra"] == 0


def test_apportionment_tie_breaks_by_key(spark):
    # equal weights, budget 3 over 2 hosts: one extra slot → key asc
    w = spark.createDataFrame(
        [Row(host="x", weight=1), Row(host="y", weight=1)]
    )
    rows = {r["host"]: r["budget"]
            for r in apportion_budget(w, total_budget=3).collect()}
    assert rows == {"x": 2, "y": 1}
