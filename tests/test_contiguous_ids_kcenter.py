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


# --- in-degree Gini / embedding quality (q249-q250 wave) -----------------------


def test_gini_uniform_is_zero(spark):
    from tribeca_insights_spark.operators.linkgraph import indegree_gini

    # every node in-degree 2: perfectly equal -> G = (n+1-1)/n - ... = 0-ish
    edges = spark.createDataFrame(
        [Row(src=i, dst=(i + 1) % 6) for i in range(6)]
        + [Row(src=i, dst=(i + 2) % 6) for i in range(6)]
    )
    out = indegree_gini(edges).collect()[0]
    # exact: G = (2*six)/(n*sx) - (n+1)/n with x_i=2, six=2*n(n+1)/2
    assert out["gini_micros"] == 0


def test_gini_concentrated_is_high(spark):
    from tribeca_insights_spark.operators.linkgraph import indegree_gini

    # all edges point at one node
    edges = spark.createDataFrame(
        [Row(src=i, dst=99) for i in range(10)]
    )
    out = indegree_gini(edges).collect()[0]
    assert out["n"] == 1  # only node 99 has in-degree
    assert out["gini_micros"] == 0  # single-node distribution: equal


def test_gini_matches_closed_form(spark):
    from tribeca_insights_spark.operators.linkgraph import indegree_gini

    # in-degrees: node1 <- 1 edge, node2 <- 3 edges
    edges = spark.createDataFrame(
        [Row(src=0, dst=1)] + [Row(src=i, dst=2) for i in range(3)]
    )
    out = indegree_gini(edges).collect()[0]
    # sorted x = [1, 3]; six = 1*1 + 2*3 = 7; n=2, sx=4
    want = (1_000_000 * (2 * 7 * 2 - 3 * 2 * 4)) // (2 * 2 * 4)
    assert out["gini_micros"] == want


def test_global_rank_reserved_name_raises(spark):
    from tribeca_insights_spark.operators.layout import global_rank

    df = spark.createDataFrame([Row(id=1, s=1)])
    with pytest.raises(ValueError):
        global_rank(df, "s", "id", 4, rank_name="_r")


def test_embedding_quality_flags(spark):
    from tribeca_insights_spark.operators.similarity import (
        embedding_quality_audit,
    )

    rows = [
        Row(vec_id=0, embedding=[1.0, 2.0]),
        Row(vec_id=1, embedding=[0.0, 0.0]),          # zero vector
        Row(vec_id=2, embedding=[float("nan"), 1.0]),  # nonfinite
        Row(vec_id=3, embedding=[1.0, 2.0, 3.0]),      # ragged dim
    ]
    out = embedding_quality_audit(
        spark.createDataFrame(rows), norm_bin_width=1_000_000
    ).collect()
    dims = {r["dim"] for r in out}
    assert dims == {2, 3}  # ragged dimension surfaces
    tot = out[0]
    assert tot["n_vectors"] == 4
    assert tot["n_zero"] == 1
    assert tot["n_nonfinite"] == 1
    # norm bin of [1,2]: ss = 1000^2 + 2000^2 = 5_000_000 -> bin 5
    bins = {(r["dim"], r["norm_bin"]) for r in out}
    assert (2, 5) in bins and (2, 0) in bins
