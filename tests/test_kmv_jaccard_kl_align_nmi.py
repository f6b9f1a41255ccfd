"""q227-q230 wave: KMV pairwise Jaccard, shard-mix KL, banded sentence
alignment, categorical NMI."""

import math

import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.bitext import align_sentences_banded
from tribeca_insights_spark.operators.mixing import shard_mix_kl
from tribeca_insights_spark.operators.sketches import (
    bottomk_jaccard,
    bottomk_sketch,
)
from tribeca_insights_spark.operators.stats import categorical_nmi


# --- KMV Jaccard -------------------------------------------------------------


def _sketch(spark, groups):
    rows = [
        Row(grp=g, w=w) for g, words in groups.items() for w in words
    ]
    return bottomk_sketch(spark.createDataFrame(rows), "grp", "w", k=64)


def test_kmv_jaccard_identical_and_disjoint(spark):
    words = [f"w{i}" for i in range(30)]
    other = [f"x{i}" for i in range(30)]
    sk = _sketch(
        spark, {"a": words, "b": words, "c": other}
    )
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in bottomk_jaccard(sk, k=64).collect()
    }
    # identical sets: sketches identical, J = 1
    assert out[("a", "b")]["jaccard_micros"] == 1_000_000
    # disjoint sets: J = 0
    assert out[("a", "c")]["jaccard_micros"] == 0
    assert out[("b", "c")]["inter_k"] == 0


def test_kmv_jaccard_estimates_half_overlap(spark):
    # |A∩B| / |A∪B| = 100/300; with k large enough to hold the union
    # exactly, the estimator is EXACT.
    a = [f"t{i}" for i in range(200)]
    b = [f"t{i}" for i in range(100, 400)]
    rows = [Row(grp="a", w=w) for w in a] + [
        Row(grp="b", w=w) for w in b
    ]
    sk = bottomk_sketch(spark.createDataFrame(rows), "grp", "w", k=500)
    got = bottomk_jaccard(sk, k=500).collect()[0]
    assert got["k_used"] == 400  # |A ∪ B|
    assert got["inter_k"] == 100
    assert got["jaccard_micros"] == 100 * 1_000_000 // 400


def test_kmv_jaccard_sketch_only_small_k(spark):
    # with small k the estimate comes from the union bottom-k only;
    # bound-check rather than exact-match
    a = [f"t{i}" for i in range(200)]
    b = [f"t{i}" for i in range(100, 400)]
    rows = [Row(grp="a", w=w) for w in a] + [
        Row(grp="b", w=w) for w in b
    ]
    sk = bottomk_sketch(spark.createDataFrame(rows), "grp", "w", k=32)
    got = bottomk_jaccard(sk, k=32).collect()[0]
    assert got["k_used"] == 32
    true_j = 100 / 400
    assert abs(got["jaccard_micros"] / 1e6 - true_j) < 0.25


# --- shard-mix KL ------------------------------------------------------------


def test_shard_mix_kl_balanced_is_zero(spark):
    rows = [
        Row(shard=s, klass=c)
        for s in range(4)
        for c in ("en", "fr")
        for _ in range(10)
    ]
    out = shard_mix_kl(
        spark.createDataFrame(rows), "shard", "klass"
    ).collect()
    assert all(r["kl_micros"] == 0 for r in out)
    assert all(r["n_docs"] == 20 for r in out)


def test_shard_mix_kl_skewed_shard(spark):
    # shard 0: all 'en'; shard 1: 50/50 -> shard 0 diverges more
    rows = (
        [Row(shard=0, klass="en") for _ in range(20)]
        + [Row(shard=1, klass="en") for _ in range(10)]
        + [Row(shard=1, klass="fr") for _ in range(10)]
    )
    out = {
        r["shard"]: r
        for r in shard_mix_kl(
            spark.createDataFrame(rows), "shard", "klass"
        ).collect()
    }
    assert out[0]["kl_micros"] > out[1]["kl_micros"]
    assert out[0]["max_class"] == "en"
    assert out[0]["max_class_frac_micros"] == 1_000_000
    # closed form: shard0 KL = 1*ln(1/(30/40)) = ln(4/3)
    want = math.floor(1e6 * math.log(4 / 3))
    assert abs(out[0]["kl_micros"] - want) <= 1


# --- sentence alignment ------------------------------------------------------


def _sents(spark, pair_id, texts):
    n = len(texts)
    return spark.createDataFrame(
        [
            Row(
                pair_id=pair_id,
                idx=i,
                n_sents=n,
                tokens=t.split(),
            )
            for i, t in enumerate(texts)
        ]
    )


def test_align_picks_diagonal_partner(spark):
    a = _sents(spark, 1, ["alpha beta", "gamma delta", "eps zeta"])
    b = _sents(spark, 1, ["alpha beta", "gamma delta", "eps zeta"])
    got = {
        r["i"]: r["j"]
        for r in align_sentences_banded(a, b, band=2).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}


def test_align_band_excludes_far_matches(spark):
    # the only lexical match is far off-diagonal -> excluded by band,
    # sentence 0 falls back to best in-corridor (all jacc 0 -> lowest j)
    a = _sents(spark, 1, ["match here", "aa bb", "cc dd", "ee ff"])
    b = _sents(
        spark, 1, ["xx yy", "zz ww", "qq rr", "match here"]
    )
    got = {
        (r["i"], r["j"]): r["jacc_micros"]
        for r in align_sentences_banded(a, b, band=1).collect()
    }
    assert (0, 3) not in got  # |3*4 - 0*4| = 12 > 1*4
    assert got[(0, 0)] == 0  # fallback: lowest j at jacc 0


def test_align_length_ratio_diagonal(spark):
    # doc a has 2 sentences, doc b has 4: i=1 diagonal sits near j=2
    a = _sents(spark, 7, ["one two", "three four"])
    b = _sents(
        spark, 7, ["x1 x2", "x3 x4", "three four", "x5 x6"]
    )
    got = {
        r["i"]: (r["j"], r["jacc_micros"])
        for r in align_sentences_banded(a, b, band=1).collect()
    }
    assert got[1] == (2, 1_000_000)


# --- NMI ---------------------------------------------------------------------


def test_nmi_perfect_agreement(spark):
    rows = [Row(p=f"c{i % 3}", t=f"t{i % 3}") for i in range(30)]
    out = categorical_nmi(
        spark.createDataFrame(rows), "p", "t"
    ).collect()[0]
    # identical partitions: I = H(C) = H(T) -> NMI = 1 (floor-rounded)
    assert out["h_pred_micros"] == out["h_truth_micros"]
    assert 999_990 <= out["nmi_micros"] <= 1_000_000


def test_nmi_independent_labels(spark):
    # independent: every (p, t) cell equally likely -> MI = 0
    rows = [
        Row(p=f"c{i % 2}", t=f"t{(i // 2) % 2}") for i in range(40)
    ]
    out = categorical_nmi(
        spark.createDataFrame(rows), "p", "t"
    ).collect()[0]
    assert abs(out["mi_micros"]) <= 1
    assert abs(out["nmi_micros"]) <= 2


def test_nmi_degenerate_single_class(spark):
    rows = [Row(p="only", t="one") for _ in range(5)]
    out = categorical_nmi(
        spark.createDataFrame(rows), "p", "t"
    ).collect()[0]
    assert out["nmi_micros"] is None


def test_nmi_matches_sklearn_formula(spark):
    rows = (
        [Row(p="a", t="x") for _ in range(10)]
        + [Row(p="a", t="y") for _ in range(5)]
        + [Row(p="b", t="y") for _ in range(15)]
    )
    out = categorical_nmi(
        spark.createDataFrame(rows), "p", "t"
    ).collect()[0]
    n = 30.0
    cells = {("a", "x"): 10, ("a", "y"): 5, ("b", "y"): 15}
    pc = {"a": 15, "b": 15}
    pt = {"x": 10, "y": 20}
    mi = sum(
        (v / n) * math.log(v * n / (pc[c] * pt[t]))
        for (c, t), v in cells.items()
    )
    hc = -sum((v / n) * math.log(v / n) for v in pc.values())
    ht = -sum((v / n) * math.log(v / n) for v in pt.values())
    assert abs(out["mi_micros"] - math.floor(1e6 * mi)) <= 1
    want_nmi = (
        2 * math.floor(1e6 * mi) * 1_000_000
        // (math.floor(1e6 * hc) + math.floor(1e6 * ht))
    )
    assert out["nmi_micros"] == want_nmi
