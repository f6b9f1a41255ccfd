"""q233-q235 wave: deterministic graph walks, OOV vocab curve, Borda
rank fusion."""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.layout import (
    borda_fusion,
    global_rank,
)
from tribeca_insights_spark.operators.linkgraph import deterministic_walks
from tribeca_insights_spark.operators.textstats import oov_rate


# --- walks -------------------------------------------------------------------


def test_walks_follow_min_hash_choice(spark):
    edges = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=0, dst=2), Row(src=1, dst=0),
         Row(src=2, dst=0)]
    )
    out = {r["start"]: r for r in
           deterministic_walks(edges, steps=2).collect()}

    def pick(v, t, nbs):
        return min(
            nbs,
            key=lambda nb: (
                hashlib.md5(f"{v}-{t}-{nb}".encode()).hexdigest(), nb
            ),
        )

    v1 = pick(0, 1, [1, 2])
    assert out[0]["v1"] == v1
    assert out[0]["v2"] == pick(v1, 2, [0])
    # all nodes get a walk
    assert set(out) == {0, 1, 2}


def test_walks_stop_at_sinks(spark):
    edges = spark.createDataFrame([Row(src=0, dst=1)])  # 1 is a sink
    out = {r["start"]: r for r in
           deterministic_walks(edges, steps=2).collect()}
    assert out[0]["v1"] == 1 and out[0]["v2"] is None
    assert out[1]["v1"] is None and out[1]["v2"] is None


def test_walks_reproducible(spark):
    edges = spark.createDataFrame(
        [Row(src=i, dst=(i * 3 + 1) % 7) for i in range(7)]
        + [Row(src=i, dst=(i * 5 + 2) % 7) for i in range(7)]
    )
    a = sorted(map(tuple, deterministic_walks(edges, 3).collect()))
    b = sorted(map(tuple, deterministic_walks(edges, 3).collect()))
    assert a == b


# --- OOV rate ----------------------------------------------------------------


def test_oov_rate_exact_cut(spark):
    # 'a' x5, 'b' x3, 'c' x2 -> V=2 keeps a,b: oov = 2/10
    df = spark.createDataFrame(
        [Row(lang="en", text="a a a a a b b b c c")]
    )
    out = oov_rate(df, vocab_size=2).collect()[0]
    assert out["n_tokens"] == 10
    assert out["n_types"] == 3
    assert out["top_v_tokens"] == 8
    assert out["oov_micros"] == 200_000


def test_oov_rate_tie_break_lexicographic(spark):
    # b and c tie at 2; V=2 keeps a(3) then b (lexicographic)
    df = spark.createDataFrame(
        [Row(lang="en", text="a a a b b c c")]
    )
    out = oov_rate(df, vocab_size=2).collect()[0]
    assert out["top_v_tokens"] == 5
    assert out["oov_micros"] == 2 * 1_000_000 // 7


def test_oov_rate_full_vocab_zero(spark):
    df = spark.createDataFrame([Row(lang="fr", text="x y z")])
    out = oov_rate(df, vocab_size=100).collect()[0]
    assert out["oov_micros"] == 0


# --- global rank / Borda -----------------------------------------------------


def test_global_rank_equals_row_number(spark):
    import random

    rng = random.Random(5)
    vals = [rng.randrange(0, 1000) for _ in range(200)]
    df = spark.createDataFrame(
        [Row(id=i, score=v) for i, v in enumerate(vals)]
    )
    out = {r["id"]: r["rank"] for r in
           global_rank(df, "score", "id", 64).collect()}
    want = {
        i: rank + 1
        for rank, (v, i) in enumerate(
            sorted((v, i) for i, v in enumerate(vals))
        )
    }
    assert out == want


def test_global_rank_no_unpartitioned_window(spark):
    df = spark.createDataFrame([Row(id=i, score=i) for i in range(8)])
    plan = (
        global_rank(df, "score", "id", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_b" in line


def test_borda_sums_ranks(spark):
    rows = [
        Row(id=1, a=10, b=30),
        Row(id=2, a=20, b=20),
        Row(id=3, a=30, b=10),
    ]
    out = {r["id"]: r for r in borda_fusion(
        spark.createDataFrame(rows), ["a", "b"], "id", [8, 8]
    ).collect()}
    assert out[1]["rank_a"] == 1 and out[1]["rank_b"] == 3
    assert out[2]["borda"] == 4
    assert out[1]["borda"] == 4 and out[3]["borda"] == 4


def test_borda_bad_widths(spark):
    df = spark.createDataFrame([Row(id=1, a=1)])
    with pytest.raises(ValueError):
        borda_fusion(df, ["a"], "id", [8, 8])
    with pytest.raises(ValueError):
        global_rank(df, "a", "id", 0)
