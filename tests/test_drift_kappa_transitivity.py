"""q236-q238 wave: embedding drift, gate-agreement kappa, dedup pair
transitivity."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.dedup import pair_transitivity_audit
from tribeca_insights_spark.operators.similarity import embedding_drift
from tribeca_insights_spark.operators.stats import boolean_gate_agreement


# --- embedding drift ---------------------------------------------------------


def test_drift_zero_for_identical_batches(spark):
    vecs = [[0.5, -0.25, 0.125]] * 4
    rows = [
        Row(vec_id=i, b=str(i % 2), embedding=v)
        for i, v in enumerate(vecs)
    ]
    out = embedding_drift(
        spark.createDataFrame(rows), "b"
    ).collect()[0]
    assert out["dist_sq_milli2"] == 0
    assert out["n_a"] == 2 and out["n_b"] == 2


def test_drift_matches_numpy_means(spark):
    rng = np.random.RandomState(13)
    va = rng.randn(6, 4).astype(np.float32)
    vb = (rng.randn(5, 4) + 1.0).astype(np.float32)
    rows = [
        Row(vec_id=i, b="a", embedding=[float(x) for x in v])
        for i, v in enumerate(va)
    ] + [
        Row(vec_id=100 + i, b="b", embedding=[float(x) for x in v])
        for i, v in enumerate(vb)
    ]
    out = embedding_drift(
        spark.createDataFrame(rows), "b", quant=1000, top_dims=2
    ).collect()[0]
    xa = np.floor(va.astype(np.float64) * 1000).astype(np.int64)
    xb = np.floor(vb.astype(np.float64) * 1000).astype(np.int64)
    ma = (xa.sum(axis=0) * 1000) // 6  # python // floors like the op
    mb = (xb.sum(axis=0) * 1000) // 5
    diff = ma - mb
    assert out["dist_sq_milli2"] == int((diff * diff).sum())
    order = sorted(range(4), key=lambda d: (-abs(diff[d]), d))
    assert list(out["top_drift_dims"]) == order[:2]


# --- gate agreement ----------------------------------------------------------


def test_kappa_perfect_and_inverse(spark):
    rows = [Row(a=bool(i % 2), b=bool(i % 2), c=not bool(i % 2))
            for i in range(20)]
    out = {
        (r["gate_a"], r["gate_b"]): r
        for r in boolean_gate_agreement(
            spark.createDataFrame(rows), ["a", "b", "c"]
        ).collect()
    }
    assert out[("a", "b")]["kappa_micros"] == 1_000_000
    assert out[("a", "b")]["jaccard_micros"] == 1_000_000
    assert out[("a", "c")]["kappa_micros"] == -1_000_000
    assert out[("a", "c")]["jaccard_micros"] == 0
    assert out[("a", "b")]["n11"] == 10 and out[("a", "b")]["n00"] == 10


def test_kappa_independent_near_zero(spark):
    rows = [
        Row(a=bool(i % 2), b=bool((i // 2) % 2)) for i in range(40)
    ]
    out = boolean_gate_agreement(
        spark.createDataFrame(rows), ["a", "b"]
    ).collect()[0]
    assert abs(out["kappa_micros"]) <= 1


def test_kappa_degenerate_constant_gate(spark):
    rows = [Row(a=True, b=bool(i % 2)) for i in range(10)]
    out = boolean_gate_agreement(
        spark.createDataFrame(rows), ["a", "b"]
    ).collect()[0]
    # pe = 1 only when BOTH gates are constant; here kappa is 0
    # (chance agreement): check the confusion instead
    assert out["n01"] == 0 and out["n00"] == 0
    # opposite constants: pe = 0, kappa = po = 0 (defined, not NULL)
    rows2 = [Row(a=True, b=False) for _ in range(5)]
    out2 = boolean_gate_agreement(
        spark.createDataFrame(rows2), ["a", "b"]
    ).collect()[0]
    assert out2["kappa_micros"] == 0
    # equal constants: pe = 1 -> NULL (0/0 guarded)
    rows3 = [Row(a=True, b=True) for _ in range(5)]
    out3 = boolean_gate_agreement(
        spark.createDataFrame(rows3), ["a", "b"]
    ).collect()[0]
    assert out3["kappa_micros"] is None


def test_kappa_matches_sklearn_formula(spark):
    import random

    rng = random.Random(7)
    rows = [
        Row(a=rng.random() < 0.6, b=rng.random() < 0.4)
        for _ in range(200)
    ]
    out = boolean_gate_agreement(
        spark.createDataFrame(rows), ["a", "b"]
    ).collect()[0]
    n = 200
    n11, n10, n01, n00 = (
        out["n11"], out["n10"], out["n01"], out["n00"]
    )
    po = (n11 + n00) / n
    pa, pb = (n11 + n10) / n, (n11 + n01) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    want = (po - pe) / (1 - pe)
    assert abs(out["kappa_micros"] / 1e6 - want) < 2e-6


# --- transitivity ------------------------------------------------------------


def test_transitivity_closed_triangle(spark):
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=1, id_b=3)]
    )
    out = pair_transitivity_audit(pairs).collect()[0]
    assert out["n_pairs"] == 3
    assert out["n_wedges"] == 3  # each vertex is a middle once
    assert out["n_closed"] == 3
    assert out["closure_micros"] == 1_000_000


def test_transitivity_open_wedge(spark):
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3)]
    )
    out = pair_transitivity_audit(pairs).collect()[0]
    assert out["n_wedges"] == 1
    assert out["n_closed"] == 0
    assert out["n_open"] == 1
    assert out["closure_micros"] == 0


def test_transitivity_dedupes_and_symmetrizes_input(spark):
    # unordered + duplicate input pairs must not change the audit
    pairs = spark.createDataFrame(
        [
            Row(id_a=2, id_b=1),
            Row(id_a=1, id_b=2),
            Row(id_a=3, id_b=2),
        ]
    )
    out = pair_transitivity_audit(pairs).collect()[0]
    assert out["n_pairs"] == 2
    assert out["n_wedges"] == 1


def test_transitivity_no_wedges_null(spark):
    pairs = spark.createDataFrame([Row(id_a=1, id_b=2)])
    out = pair_transitivity_audit(pairs).collect()[0]
    assert out["n_wedges"] == 0
    assert out["closure_micros"] is None
