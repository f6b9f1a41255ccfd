"""Round-4 wave: bow-tie decomposition (q335)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.linkgraph import bowtie_decomposition


def _bt(spark, edges, seeds, k=3):
    e = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    s = spark.createDataFrame([Row(node=n) for n in seeds])
    return {r["node"]: r.asDict()
            for r in bowtie_decomposition(e, s, k=k).collect()}


def test_classic_bowtie(spark):
    got = _bt(
        spark,
        [("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
         ("i0", "c0"), ("c2", "o0"), ("d0", "d1")],
        ["c0"],
    )
    assert got["c0"]["component"] == "core"
    assert (got["c1"]["fwd_dist"], got["c1"]["bwd_dist"]) == (1, 2)
    assert got["i0"]["component"] == "in"
    assert got["o0"]["component"] == "out"
    assert got["d0"]["component"] == "disconnected"
    assert len(got) == 7


def test_k_bounds_reach(spark):
    # chain s→a→b: with k=1 only a is 'out'; b unreached → disconnected
    got = _bt(spark, [("s", "a"), ("a", "b")], ["s"], k=1)
    assert got["a"]["component"] == "out"
    assert got["b"]["component"] == "disconnected"


def test_isolated_seed(spark):
    got = _bt(spark, [("x", "y")], ["z"])
    assert got["z"]["component"] == "core"  # seed reaches itself (dist 0)
    assert got["x"]["component"] == "disconnected"
