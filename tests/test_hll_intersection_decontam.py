"""HLL inclusion-exclusion overlap estimate and embedding-space benchmark
decontamination."""

from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.sketches import (
    hll_intersection_estimate,
    hll_registers,
)
from tribeca_insights_spark.operators.similarity import semantic_decontaminate


def test_hll_intersection_identity_sets(spark):
    # A == B: union sketch == each sketch, so est_intersection == est_a
    keys = spark.createDataFrame([Row(key=f"k{i}") for i in range(200)])
    sk = hll_registers(keys, "key", p=6)
    r = hll_intersection_estimate(sk, sk, p=6).collect()[0]
    assert r["est_a_micros"] == r["est_b_micros"] == r["est_union_micros"]
    assert r["est_intersection_micros"] == r["est_a_micros"]


def test_hll_intersection_disjoint_small(spark):
    a = spark.createDataFrame([Row(key=f"a{i}") for i in range(100)])
    b = spark.createDataFrame([Row(key=f"b{i}") for i in range(100)])
    r = hll_intersection_estimate(
        hll_registers(a, "key", p=6), hll_registers(b, "key", p=6), p=6
    ).collect()[0]
    # union >= each side; intersection estimate near zero (sketch noise
    # bounded well under either side's cardinality)
    assert r["est_union_micros"] >= r["est_a_micros"]
    assert r["est_union_micros"] >= r["est_b_micros"]
    assert abs(r["est_intersection_micros"]) < r["est_a_micros"]


def test_semantic_decontaminate_finds_scaled_copies(spark):
    vecs = [
        Row(vec_id=i, embedding=[float(i + 1), float(-i - 2), 1.0, -1.0,
                                 1.0, 1.0, -1.0, 1.0])
        for i in range(10)
    ]
    train = spark.createDataFrame(vecs)
    bench = train.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    out = semantic_decontaminate(train, bench, threshold=0.99,
                                 bits=8).collect()
    got = {r["train_id"]: r for r in out}
    # the three scaled copies MUST be flagged with their own source as
    # best match at sim 1.0; other training vectors may legitimately be
    # near a benchmark vector too (cosine, not identity)
    for tid in (0, 1, 2):
        assert got[tid]["bench_id"] == tid + 100
        assert got[tid]["sim"] == 1.0
    for tid, r in got.items():
        assert r["sim"] >= 0.99


def test_semantic_decontaminate_clean_train_untouched(spark):
    train = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 1.0, 1.0, 1.0])]
    )
    bench = spark.createDataFrame(
        [Row(vec_id=2, embedding=[1.0, -1.0, 1.0, -1.0])]
    )
    # orthogonal-ish AND different sign bucket -> no candidates at all
    assert semantic_decontaminate(train, bench, bits=4).collect() == []
