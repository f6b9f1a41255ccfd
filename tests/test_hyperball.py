"""HyperBall neighborhood estimation (Boldi & Vigna WSDM'11)."""

import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.linkgraph import (
    hyperball_estimates,
    hyperball_registers,
)
from tribeca_insights_spark.operators.sketches import hll_registers


# a small digraph: 0→1→2→3, 0→4, 5 isolated, 6→6 (self loop)
EDGES = [(0, 1), (1, 2), (2, 3), (0, 4), (6, 6)]
NODES = list(range(7))


def _exact_ball(node: int, radius: int) -> set[int]:
    ball = {node}
    for _ in range(radius):
        ball |= {d for (s, d) in EDGES if s in ball}
    return ball


def _dfs(spark):
    e = spark.createDataFrame([Row(src=s, dst=d) for s, d in EDGES])
    n = spark.createDataFrame([Row(node=v) for v in NODES])
    return e, n


@pytest.mark.parametrize("radius", [0, 1, 2, 3])
def test_registers_equal_exact_ball_sketch(spark, radius):
    """After t rounds the sketch is EXACTLY hll_registers of the
    distance-<=t ball membership set — merge-along-edges loses
    nothing and adds nothing."""
    e, n = _dfs(spark)
    got = {
        (r["node"], r["register"], r["max_rho"])
        for r in hyperball_registers(e, n, radius=radius, p=4).collect()
    }
    want = set()
    for v in NODES:
        members = spark.createDataFrame(
            [Row(k=u) for u in _exact_ball(v, radius)]
        )
        for r in hll_registers(members, "k", p=4).collect():
            want.add((v, r["register"], r["max_rho"]))
    assert got == want


def test_estimates_monotone_in_radius(spark):
    """Register sets only grow with radius, so the raw estimate is
    monotone non-decreasing per node."""
    e, n = _dfs(spark)
    by_radius = {}
    for t in (0, 1, 2, 3):
        by_radius[t] = {
            r["node"]: r["ball_estimate_micros"]
            for r in hyperball_estimates(e, n, radius=t, p=4).collect()
        }
    for v in NODES:
        assert (
            by_radius[0][v]
            <= by_radius[1][v]
            <= by_radius[2][v]
            <= by_radius[3][v]
        )


def test_isolated_and_selfloop_stay_singletons(spark):
    """Node 5 (no out-edges) and node 6 (self loop only) keep the
    1-element sketch at every radius."""
    e, n = _dfs(spark)
    r0 = {
        r["node"]: (r["n_registers_hit"], r["ball_estimate_micros"])
        for r in hyperball_estimates(e, n, radius=0, p=4).collect()
    }
    r3 = {
        r["node"]: (r["n_registers_hit"], r["ball_estimate_micros"])
        for r in hyperball_estimates(e, n, radius=3, p=4).collect()
    }
    for v in (5, 6):
        assert r0[v] == r3[v]
        assert r0[v][0] == 1  # exactly one register hit


def test_negative_radius_raises(spark):
    e, n = _dfs(spark)
    with pytest.raises(ValueError, match="radius"):
        hyperball_registers(e, n, radius=-1)


def test_neighborhood_function_matches_per_node_sums(spark):
    """N(t) rows must equal the sum of hyperball_estimates at each t,
    and be monotone non-decreasing with pct_of_max_ppm hitting 1e6 at
    the last radius."""
    from tribeca_insights_spark.operators.linkgraph import (
        neighborhood_function,
    )

    e, n = _dfs(spark)
    nf = {r["radius"]: r for r in
          neighborhood_function(e, n, max_radius=2, p=4).collect()}
    for t in (0, 1, 2):
        per_node = hyperball_estimates(e, n, radius=t, p=4).agg(
            F.sum("ball_estimate_micros").alias("s"),
            F.count("*").alias("c"),
        ).collect()[0]
        assert nf[t]["pairs_estimate_micros"] == per_node["s"]
        assert nf[t]["n_nodes"] == per_node["c"] == len(NODES)
    assert (nf[0]["pairs_estimate_micros"]
            <= nf[1]["pairs_estimate_micros"]
            <= nf[2]["pairs_estimate_micros"])
    assert nf[2]["pct_of_max_ppm"] == 1_000_000
