"""Round-4 wave: Misra-Gries heavy hitters (q331)."""

import pytest
from pyspark.sql import Row

from tribeca_insights_spark.operators.sketches import heavy_hitters_mg


def _df(spark, items):
    return spark.createDataFrame([Row(token=t) for t in items])


def test_exact_heavy_hitters(spark):
    # 100 rows: 'a'×40, 'b'×30, 'c'×20, 10 singletons; φ=25% → only a,b
    items = ["a"] * 40 + ["b"] * 30 + ["c"] * 20 + [f"x{i}" for i in range(10)]
    got = {r["item"]: r for r in
           heavy_hitters_mg(_df(spark, items), "token",
                            phi_micros=250_000).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["n"] == 40 and got["a"]["share_micros"] == 400_000
    assert got["b"]["n"] == 30


def test_threshold_is_strict(spark):
    # 'c' at exactly 20% with φ=20% must NOT qualify (strict >)
    items = ["a"] * 40 + ["b"] * 30 + ["c"] * 20 + [f"x{i}" for i in range(10)]
    got = {r["item"] for r in
           heavy_hitters_mg(_df(spark, items), "token",
                            phi_micros=200_000).collect()}
    assert got == {"a", "b"}


def test_partitioning_invariance(spark):
    items = ["hot"] * 50 + [f"cold{i}" for i in range(50)]
    base = _df(spark, items)
    for parts in (1, 7):
        got = heavy_hitters_mg(
            base.repartition(parts), "token", phi_micros=100_000
        ).collect()
        assert [(r["item"], r["n"]) for r in got] == [("hot", 50)]


def test_bad_phi_raises(spark):
    with pytest.raises(ValueError):
        heavy_hitters_mg(_df(spark, ["a"]), "token", phi_micros=0)
