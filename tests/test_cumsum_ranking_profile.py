"""q241-q243 wave: global cumsum + token shard manifest, ranking
metrics, table profile."""

import hashlib
import math

import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.layout import (
    global_cumsum,
    token_shard_manifest,
)
from tribeca_insights_spark.operators.retrieval import ranking_metrics
from tribeca_insights_spark.operators.stats import table_profile


# --- global cumsum / shard manifest -------------------------------------------


def test_global_cumsum_equals_sorted_prefix(spark):
    rows = [Row(id=i, v=(i * 7) % 13 + 1) for i in range(60)]
    df = spark.createDataFrame(rows).withColumn(
        "h", F.md5(F.col("id").cast("string"))
    )
    out = {r["id"]: r["cum"] for r in
           global_cumsum(df, "v", "h", "id").collect()}
    order = sorted(
        rows, key=lambda r: hashlib.md5(str(r.id).encode()).hexdigest()
    )
    run = 0
    for r in order:
        assert out[r.id] == run
        run += r.v


def test_global_cumsum_partition_invariant(spark):
    rows = [Row(id=i, v=i + 1) for i in range(30)]
    d1 = spark.createDataFrame(rows).repartition(1).withColumn(
        "h", F.md5(F.col("id").cast("string"))
    )
    d8 = spark.createDataFrame(rows).repartition(8).withColumn(
        "h", F.md5(F.col("id").cast("string"))
    )
    g1 = {r["id"]: r["cum"] for r in
          global_cumsum(d1, "v", "h", "id").collect()}
    g8 = {r["id"]: r["cum"] for r in
          global_cumsum(d8, "v", "h", "id").collect()}
    assert g1 == g8


def test_shard_manifest_budget_fill(spark):
    rows = [Row(id=i, tok=10) for i in range(20)]  # 200 tokens total
    out = sorted(
        token_shard_manifest(
            spark.createDataFrame(rows), "tok", "id", budget=50
        ).collect(),
        key=lambda r: r["shard_id"],
    )
    # exact fills: 4 shards x 5 docs x 50 tokens
    assert [r["shard_id"] for r in out] == [0, 1, 2, 3]
    assert all(r["n_docs"] == 5 and r["n_tokens"] == 50 for r in out)
    # first/last follow md5 stream order
    order = sorted(
        range(20), key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )
    assert out[0]["first_id"] == order[0]
    assert out[3]["last_id"] == order[-1]


def test_shard_manifest_straddle_rule(spark):
    # budget 25, docs of 10: shard 0 gets docs at cum 0,10,20 (3 docs,
    # 30 tokens — overfills by one doc), shard 1 starts at cum 30
    rows = [Row(id=i, tok=10) for i in range(5)]
    out = sorted(
        token_shard_manifest(
            spark.createDataFrame(rows), "tok", "id", budget=25
        ).collect(),
        key=lambda r: r["shard_id"],
    )
    assert out[0]["n_docs"] == 3 and out[0]["n_tokens"] == 30
    assert out[1]["n_docs"] == 2


# --- ranking metrics ----------------------------------------------------------


def _ranked(spark, rels):
    return spark.createDataFrame(
        [
            Row(query_id=1, rank=i + 1, rel=r)
            for i, r in enumerate(rels)
        ]
    )


def test_ranking_perfect_order(spark):
    out = ranking_metrics(
        _ranked(spark, [1, 1, 0, 0, 0]), k=5
    ).collect()[0]
    assert out["mrr_micros"] == 1_000_000
    assert out["p_at_k_micros"] == 2 * 1_000_000 // 5
    assert out["ndcg_micros"] == 1_000_000


def test_ranking_worst_order_ndcg(spark):
    out = ranking_metrics(
        _ranked(spark, [0, 0, 0, 1]), k=5
    ).collect()[0]
    assert out["mrr_micros"] == 1_000_000 // 4
    dcg = math.floor(1e6 * (1 / math.log(5)))
    idcg = math.floor(1e6 * (1 / math.log(2)))
    assert out["dcg_micros"] == dcg
    assert out["ndcg_micros"] == dcg * 1_000_000 // idcg


def test_ranking_no_relevant_null(spark):
    out = ranking_metrics(_ranked(spark, [0, 0, 0]), k=5).collect()[0]
    assert out["mrr_micros"] is None
    assert out["ndcg_micros"] is None
    assert out["p_at_k_micros"] == 0


def test_ranking_graded_relevance(spark):
    # graded rels: ideal order resorts [1, 3, 2] -> [3, 2, 1]
    out = ranking_metrics(
        _ranked(spark, [1, 3, 2]), k=3
    ).collect()[0]
    dcg = math.floor(
        1e6 * (1 / math.log(2) + 3 / math.log(3) + 2 / math.log(4))
    )
    idcg = math.floor(
        1e6 * (3 / math.log(2) + 2 / math.log(3) + 1 / math.log(4))
    )
    assert out["dcg_micros"] == dcg
    assert out["idcg_micros"] == idcg


# --- table profile ------------------------------------------------------------


def test_profile_nulls_distinct_top(spark):
    rows = [
        Row(a="x", b=1),
        Row(a="x", b=2),
        Row(a="y", b=None),
        Row(a=None, b=2),
    ]
    out = {
        r["col_name"]: r
        for r in table_profile(
            spark.createDataFrame(rows), ["a", "b"]
        ).collect()
    }
    assert out["a"]["n"] == 4
    assert out["a"]["n_null"] == 1
    assert out["a"]["n_distinct"] == 2
    assert out["a"]["top_value"] == "x" and out["a"]["top_count"] == 2
    assert out["b"]["n_null"] == 1
    assert out["b"]["top_value"] == "2"


def test_profile_tie_breaks_to_largest_value(spark):
    rows = [Row(a="p"), Row(a="q")]
    out = table_profile(spark.createDataFrame(rows), ["a"]).collect()[0]
    assert out["top_value"] == "q"  # documented contract


def test_profile_empty_cols_raise(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(ValueError):
        table_profile(df, [])
