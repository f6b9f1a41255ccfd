"""q239-q240 wave: PSI feature drift, gate marginal attribution."""

import math

import pytest
from pyspark.sql import Row

from tribeca_insights_spark.operators.stats import psi_drift
from tribeca_insights_spark.operators.textstats import (
    gate_marginal_attribution,
)


# --- PSI ---------------------------------------------------------------------


def test_psi_identical_batches_zero(spark):
    rows = [
        Row(b=str(i % 2), v=(i // 2) * 10 % 300) for i in range(200)
    ]
    out = psi_drift(
        spark.createDataFrame(rows), "v", "b", bin_width=100
    ).collect()[0]
    assert out["psi_micros"] == 0
    assert out["n_a"] == out["n_b"] == 100


def test_psi_shifted_batch_positive(spark):
    rows = [Row(b="0", v=50) for _ in range(50)] + [
        Row(b="1", v=250) for _ in range(50)
    ]
    out = psi_drift(
        spark.createDataFrame(rows), "v", "b", bin_width=100
    ).collect()[0]
    # fully disjoint bins: large PSI
    assert out["psi_micros"] > 1_000_000
    assert out["n_bins"] == 2


def test_psi_matches_hand_formula_with_epsilon(spark):
    # batch 0: 30 in bin0, 10 in bin1; batch 1: 10 in bin0, 30 in bin1
    rows = (
        [Row(b="0", v=10) for _ in range(30)]
        + [Row(b="0", v=110) for _ in range(10)]
        + [Row(b="1", v=10) for _ in range(10)]
        + [Row(b="1", v=110) for _ in range(30)]
    )
    out = psi_drift(
        spark.createDataFrame(rows), "v", "b", bin_width=100
    ).collect()[0]
    n_bins = 2
    na1, nb1 = 40 + n_bins, 40 + n_bins
    psi = 0.0
    for ca, cb in ((31, 11), (11, 31)):
        p, q = ca / na1, cb / nb1
        psi += (p - q) * math.log(p / q)
    assert out["psi_micros"] == math.floor(1e6 * psi)


def test_psi_bad_width(spark):
    df = spark.createDataFrame([Row(b="0", v=1)])
    with pytest.raises(ValueError):
        psi_drift(df, "v", "b", bin_width=0)


# --- gate marginal -----------------------------------------------------------


def test_marginal_unique_vs_shared_kills(spark):
    rows = [
        Row(a=True, b=False),   # unique to a
        Row(a=True, b=True),    # shared
        Row(a=False, b=True),   # unique to b
        Row(a=False, b=False),  # survivor
        Row(a=True, b=False),   # unique to a
    ]
    out = {
        r["gate"]: r
        for r in gate_marginal_attribution(
            spark.createDataFrame(rows), ["a", "b"]
        ).collect()
    }
    assert out["a"]["n_docs"] == 5
    assert out["a"]["n_killed_total"] == 4
    assert out["a"]["n_kills"] == 3
    assert out["a"]["n_unique_kills"] == 2
    assert out["a"]["unique_share_micros"] == 2 * 1_000_000 // 3
    assert out["b"]["n_kills"] == 2
    assert out["b"]["n_unique_kills"] == 1


def test_marginal_redundant_gate_zero_unique(spark):
    rows = [Row(a=bool(i % 2), b=bool(i % 2)) for i in range(10)]
    out = {
        r["gate"]: r
        for r in gate_marginal_attribution(
            spark.createDataFrame(rows), ["a", "b"]
        ).collect()
    }
    # perfectly redundant pair: nothing is unique to either
    assert out["a"]["n_unique_kills"] == 0
    assert out["b"]["n_unique_kills"] == 0


def test_marginal_never_firing_gate_null_share(spark):
    rows = [Row(a=False, b=True) for _ in range(3)]
    out = {
        r["gate"]: r
        for r in gate_marginal_attribution(
            spark.createDataFrame(rows), ["a", "b"]
        ).collect()
    }
    assert out["a"]["n_kills"] == 0
    assert out["a"]["unique_share_micros"] is None


def test_marginal_empty_gates_raise(spark):
    df = spark.createDataFrame([Row(a=True)])
    with pytest.raises(ValueError):
        gate_marginal_attribution(df, [])


# --- RRF fusion (q246 wave) ----------------------------------------------------


def test_rrf_top_weighted_vs_borda():
    # pure-python sanity of the weighting intuition the operator encodes
    import math
    n = 100
    # doc X: rank 1 on signal A, rank 50 on B; doc Y: rank 20 on both
    rrf = lambda rt: 1_000_000 // (60 + rt)
    x = rrf(1) + rrf(50)
    y = rrf(20) + rrf(20)
    assert x > y  # RRF rewards the confident head


def test_rrf_fusion_exact(spark):
    from pyspark.sql import Row
    from tribeca_insights_spark.operators.layout import rrf_fusion

    rows = [Row(id=i, a=i, b=10 - i) for i in range(1, 6)]
    out = {
        r["id"]: r
        for r in rrf_fusion(
            spark.createDataFrame(rows), ["a", "b"], "id", [4, 4]
        ).collect()
    }
    n = 5
    for i in range(1, 6):
        ra, rb = i, 6 - i  # ascending ranks by construction
        want = 1_000_000 // (60 + n - ra + 1) + 1_000_000 // (
            60 + n - rb + 1
        )
        assert out[i]["rrf_micros"] == want


# --- char coverage / threshold sweep (q251-q252 wave) --------------------------


def test_char_coverage_exact_cut(spark):
    from pyspark.sql import Row
    from tribeca_insights_spark.operators.textstats import char_coverage

    # 'aaaa bbb cc d' -> counts (space excluded? no: space IS a char of
    # split(text, '')): a4 b3 c2 d1 ' '3 -> total 13
    df = spark.createDataFrame([Row(lang="en", text="aaaabbbcc d")])
    out = char_coverage(df, coverage_micros=900_000).collect()[0]
    # counts: a4 b3 c2 ' '1 d1 -> total 11; 90% of 11 = 9.9 -> need cum>=9.9
    # ranked: a4(4) b3(7) c2(9) ' '? tie c2 vs others... chars: a,b,c,d,' '
    # cum a4=4, b=7, c=9, then ties count1: ' '(32) before 'd': cum 10 -> hits
    assert out["n_chars_total"] == 11
    assert out["alphabet_size"] == 4
    assert out["covered_micros"] == 10 * 1_000_000 // 11


def test_char_coverage_full_when_target_one(spark):
    from pyspark.sql import Row
    from tribeca_insights_spark.operators.textstats import char_coverage

    df = spark.createDataFrame([Row(lang="x", text="abc")])
    out = char_coverage(df, coverage_micros=1_000_000).collect()[0]
    assert out["alphabet_size"] == out["n_distinct_chars"] == 3
    assert out["covered_micros"] == 1_000_000


def test_threshold_sweep_counts(spark):
    from pyspark.sql import Row
    from tribeca_insights_spark.operators.dedup import (
        jaccard_threshold_sweep,
    )

    pairs = spark.createDataFrame(
        [
            Row(id_a=1, id_b=11, jacc_micros=950_000),
            Row(id_a=2, id_b=12, jacc_micros=850_000),
            Row(id_a=3, id_b=13, jacc_micros=550_000),
            Row(id_a=1, id_b=12, jacc_micros=920_000),
        ]
    )
    out = {
        r["threshold_micros"]: r
        for r in jaccard_threshold_sweep(pairs).collect()
    }
    assert out[900_000]["n_pairs"] == 2
    assert out[900_000]["n_docs"] == 3  # {1, 11, 12}
    assert out[800_000]["n_pairs"] == 3
    assert out[500_000]["n_pairs"] == 4
    assert out[500_000]["n_docs"] == 6


def test_threshold_sweep_empty_thresholds_raise(spark):
    from pyspark.sql import Row
    from tribeca_insights_spark.operators.dedup import (
        jaccard_threshold_sweep,
    )

    df = spark.createDataFrame([Row(id_a=1, id_b=2, jacc_micros=1)])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        jaccard_threshold_sweep(df, thresholds_micros=())


# --- Heaps' law (q253 wave) ----------------------------------------------------


def test_heaps_closed_vocab_beta_zero(spark):
    from pyspark.sql import Row
    from tribeca_insights_spark.operators.textstats import heaps_law_fit

    # same 3 words forever: V(n) stuck at 3 -> beta ~ 0
    docs = [Row(source="s", doc_id=i, text="a b c") for i in range(64)]
    out = heaps_law_fit(
        spark.createDataFrame(docs), checkpoints=(8, 16, 32, 64)
    ).collect()[0]
    assert out["n_points"] == 4
    assert abs(out["beta_micros"]) < 10_000  # beta ~ 0 (< 0.01)


def test_heaps_linear_vocab_beta_one(spark):
    from pyspark.sql import Row
    from tribeca_insights_spark.operators.textstats import heaps_law_fit

    # every doc = one brand-new word: V(n) = T(n) = n -> beta = 1
    docs = [Row(source="s", doc_id=i, text=f"w{i}") for i in range(64)]
    out = heaps_law_fit(
        spark.createDataFrame(docs), checkpoints=(8, 16, 32, 64)
    ).collect()[0]
    assert abs(out["beta_micros"] - 1_000_000) < 10_000


def test_heaps_skips_absent_checkpoints(spark):
    from pyspark.sql import Row
    from tribeca_insights_spark.operators.textstats import heaps_law_fit

    docs = [Row(source="tiny", doc_id=i, text=f"w{i} x") for i in range(10)]
    out = heaps_law_fit(
        spark.createDataFrame(docs), checkpoints=(8, 16, 32)
    ).collect()[0]
    assert out["n_points"] == 1  # only n=8 exists -> OLS degenerate
    assert out["beta_micros"] is None
