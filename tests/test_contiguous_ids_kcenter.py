"""q231-q232 wave: contiguous global id assignment, greedy k-center."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.kmeans import kcenter_greedy
from tribeca_insights_spark.operators.layout import contiguous_ids


# --- contiguous ids ----------------------------------------------------------


def test_contiguous_ids_dense_and_ordered(spark):
    keys = [f"url-{i}" for i in range(97)]
    df = spark.createDataFrame([Row(k=k, payload=i) for i, k in
                                enumerate(keys)])
    out = contiguous_ids(df, "k", buckets=16).collect()
    gids = sorted(r["gid"] for r in out)
    assert gids == list(range(97))  # dense 0..N-1, no gaps, no dupes
    # equals row_number over (md5(key), key) - 1
    want = {
        k: rank
        for rank, k in enumerate(
            sorted(keys, key=lambda k: (hashlib.md5(k.encode()).hexdigest(), k))
        )
    }
    got = {r["k"]: r["gid"] for r in out}
    assert got == want


def test_contiguous_ids_partition_invariant(spark):
    keys = [f"doc{i}" for i in range(40)]
    df1 = spark.createDataFrame(
        [Row(k=k) for k in keys]
    ).repartition(1)
    df8 = spark.createDataFrame(
        [Row(k=k) for k in keys]
    ).repartition(8)
    g1 = {r["k"]: r["gid"] for r in contiguous_ids(df1, "k").collect()}
    g8 = {r["k"]: r["gid"] for r in contiguous_ids(df8, "k").collect()}
    assert g1 == g8  # values, not layout, determine ids


def test_contiguous_ids_no_global_window(spark):
    df = spark.createDataFrame([Row(k=f"x{i}") for i in range(8)])
    plan = (
        contiguous_ids(df, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Window in the plan must be partitioned (no global sort)
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_b" in line  # partition spec present


def test_contiguous_ids_bad_buckets(spark):
    df = spark.createDataFrame([Row(k="a")])
    with pytest.raises(ValueError):
        contiguous_ids(df, "k", buckets=10)


# --- k-center ----------------------------------------------------------------


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float(x) for x in v])
            for i, v in enumerate(vecs)
        ]
    )


def test_kcenter_picks_farthest_then_covers(spark):
    # three tight clusters at (0,0), (10,0), (0,6) - greedy from point 0
    # must pick one point from each far cluster before any near-dup
    vecs = (
        [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1]]      # cluster A: ids 0-2
        + [[10.0, 0.0], [10.1, 0.0]]              # cluster B: ids 3-4
        + [[0.0, 6.0], [0.0, 6.1]]                # cluster C: ids 5-6
    )
    out = kcenter_greedy(_emb_df(spark, vecs), k=3, start_id=0).collect()
    sel = [r["center_id"] for r in sorted(out, key=lambda r: r["sel_round"])]
    assert sel[0] == 0
    assert sel[1] == 4  # farthest single point: (10.1, 0), d2=102.01
    assert sel[2] == 6  # then cluster C's farthest: (0, 6.1)
    # radius at round 1 = dist2(0 -> id4) in micros^2
    r1 = next(r for r in out if r["sel_round"] == 1)
    assert r1["radius_sq_micros2"] == (10_100_000) ** 2


def test_kcenter_matches_numpy_greedy(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(25, 4).astype(np.float32)
    out = kcenter_greedy(_emb_df(spark, vecs), k=5, start_id=0).collect()
    got = [
        r["center_id"]
        for r in sorted(out, key=lambda r: r["sel_round"])
    ]
    xm = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    centers = [0]
    d = ((xm - xm[0]) ** 2).sum(axis=1)
    for _ in range(4):
        # argmax with smaller-id tie-break
        best = int(np.lexsort((np.arange(len(d)), -d))[0])
        centers.append(best)
        d = np.minimum(d, ((xm - xm[best]) ** 2).sum(axis=1))
    assert got == centers


def test_kcenter_bad_args(spark):
    df = _emb_df(spark, [[0.0, 0.0]])
    with pytest.raises(ValueError):
        kcenter_greedy(df, k=0)
    with pytest.raises(ValueError):
        kcenter_greedy(df, k=2, start_id=99)
