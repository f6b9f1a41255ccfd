"""q221-q226 wave: bitext margin scoring, JL random projection,
positional phrase search, MAD robust outliers, personalized PageRank,
quality-signal correlations."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.bitext import bitext_margin_scores
from tribeca_insights_spark.operators.linkgraph import (
    personalized_pagerank_micros,
)
from tribeca_insights_spark.operators.retrieval import (
    phrase_search,
    positional_postings,
)
from tribeca_insights_spark.operators.similarity import jl_random_projection
from tribeca_insights_spark.operators.stats import (
    robust_outliers_mad,
    signal_correlations,
)


# --- bitext margin -----------------------------------------------------------


def _vec(*signs):
    """Unit-ish vector with given signs on the first dims, zero-padded."""
    v = [0.0] * 8
    for i, s in enumerate(signs):
        v[i] = float(s)
    return v


def test_margin_prefers_standout_pair(spark):
    # Bucket key = sign bits of first 8 dims. All vectors share the
    # all-positive bucket. x=0 is nearly identical to y=1 (standout);
    # x=2 is equidistant from both y's (hub-ish, low margin).
    rows = [
        Row(vec_id=0, side=0, embedding=[1.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]),
        Row(vec_id=2, side=0, embedding=[0.7, 0.7, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]),
        Row(vec_id=1, side=1, embedding=[1.0, 0.12, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]),
        Row(vec_id=3, side=1, embedding=[0.1, 1.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]),
    ]
    out = {
        r["id_x"]: r
        for r in bitext_margin_scores(
            spark.createDataFrame(rows), k=2, bits=8
        ).collect()
    }
    assert out[0]["id_y"] == 1
    assert out[0]["sim"] > 0.99
    # the near-duplicate pair stands out from its neighborhood
    assert out[0]["margin"] > out[2]["margin"]


def test_margin_respects_bucket_blocking(spark):
    # opposite sign buckets never meet: no candidates at all
    rows = [
        Row(vec_id=0, side=0, embedding=_vec(1, 1, 1, 1, 1, 1, 1, 1)),
        Row(vec_id=1, side=1, embedding=_vec(-1, -1, -1, -1, -1, -1, -1, -1)),
    ]
    got = bitext_margin_scores(spark.createDataFrame(rows), k=2).collect()
    assert got == []


def test_margin_avgk_is_exact_six_decimals(spark):
    # avg of k 4-decimal sims is exact at 6 decimals: check against numpy
    rows = [
        Row(vec_id=0, side=0, embedding=_vec(1.0, 0.3)),
        Row(vec_id=1, side=1, embedding=_vec(1.0, 0.31)),
        Row(vec_id=3, side=1, embedding=_vec(1.0, 0.1)),
        Row(vec_id=5, side=1, embedding=_vec(0.9, 0.5)),
    ]
    r = {
        x["id_x"]: x
        for x in bitext_margin_scores(
            spark.createDataFrame(rows), k=3, bits=2
        ).collect()
    }[0]

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    sims = [
        round(cos(_vec(1.0, 0.3), _vec(1.0, 0.31)), 4),
        round(cos(_vec(1.0, 0.3), _vec(1.0, 0.1)), 4),
        round(cos(_vec(1.0, 0.3), _vec(0.9, 0.5)), 4),
    ]
    assert r["avgk_x"] == round(sum(sims) / 3, 6)


# --- JL projection -----------------------------------------------------------


def test_jl_projection_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).astype(np.float32)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)]
    )
    out = jl_random_projection(df, out_dim=4, quant=1000).toPandas()
    assert len(out) == 20 * 4
    xm = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    ii = np.arange(8)[:, None]
    jj = np.arange(4)[None, :]
    signs = (1 - 2 * ((ii * 31 + jj * 17) % 2)).astype(np.int64)
    want = xm @ signs
    got = (
        out.sort_values(["vec_id", "j"])["pj"]
        .to_numpy()
        .reshape(20, 4)
    )
    assert (got == want).all()
    # norm audit: ratio_micros = proj_ss*1e6 // (orig_ss*d_out)
    row0 = out[(out.vec_id == 0) & (out.j == 0)].iloc[0]
    oss = int((xm[0] * xm[0]).sum())
    pss = int((want[0] * want[0]).sum())
    assert row0["orig_ss"] == oss
    assert row0["proj_ss"] == pss
    assert row0["ratio_micros"] == (pss * 1_000_000) // (max(oss, 1) * 4)


def test_jl_projection_zero_shuffle_plan(spark):
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.1] * 8)]
    )
    plan = (
        jl_random_projection(df, out_dim=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# --- phrase search -----------------------------------------------------------


def test_positional_postings(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b  a")])
    got = sorted(
        (r["term"], r["pos"]) for r in positional_postings(df).collect()
    )
    # split on single space: "a b  a" -> ["a","b","","a"]; empty filtered,
    # but positions are ARRAY positions (pre-filter semantics differ):
    # posexplode runs after the filter, so positions re-number compacted.
    assert got == [("a", 0), ("a", 2), ("b", 1)]


def test_phrase_search_consecutive_only(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="big red fox jumps"),
            Row(doc_id=2, text="red big fox"),  # words present, wrong order
            Row(doc_id=3, text="big red big red fox"),  # match at pos 2
            Row(doc_id=4, text="big fox red"),  # not consecutive
        ]
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in phrase_search(df, "big red fox").collect()
    }
    assert got == {1: (1, 0), 3: (1, 2)}


def test_phrase_search_single_term(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x y x")])
    got = phrase_search(df, "x").collect()
    assert got[0]["n_hits"] == 2 and got[0]["first_pos"] == 0


def test_phrase_search_empty_raises(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        phrase_search(df, "  ")


# --- MAD outliers ------------------------------------------------------------


def test_mad_outlier_flags_extreme(spark):
    vals = [10, 11, 12, 13, 14, 1000]
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en", n_chars=v) for i, v in enumerate(vals)]
    )
    out = {
        r["id"]: r
        for r in robust_outliers_mad(df, "n_chars", "lang").collect()
    }
    # median of [10..14,1000] = 12.5; MAD = median(|x-12.5|) = 1.5
    assert out[0]["med"] == 12.5
    assert out[0]["mad"] == 1.5
    assert out[5]["is_outlier"] is True
    assert not any(out[i]["is_outlier"] for i in range(5))
    assert out[5]["z"] == round(0.6745 * (1000 - 12.5) / 1.5, 4)


def test_mad_zero_yields_null_z(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en", n_chars=7) for i in range(4)]
    )
    out = robust_outliers_mad(df, "n_chars", "lang").collect()
    assert all(r["z"] is None and r["is_outlier"] is False for r in out)


# --- personalized PageRank ---------------------------------------------------


def test_ppr_mass_concentrates_near_seeds(spark):
    # star: seed 0 -> 1,2; far node 3 -> 4 (disconnected from seed)
    edges = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=0, dst=2), Row(src=3, dst=4)]
    )
    seeds = spark.createDataFrame([Row(node=0)])
    ranks = {
        r["node"]: r["rank_micros"]
        for r in personalized_pagerank_micros(
            edges, seeds, n_iter=3
        ).collect()
    }
    assert ranks[0] > 0  # restart mass
    assert ranks[1] > 0 and ranks[2] > 0  # 1-hop from seed
    assert ranks[4] == 0  # unreachable from seed set: NO mass
    assert ranks[3] == 0


def test_ppr_integer_recurrence_exact(spark):
    # 2-cycle seeded at 0: unroll by hand.
    edges = spark.createDataFrame([Row(src=0, dst=1), Row(src=1, dst=0)])
    seeds = spark.createDataFrame([Row(node=0)])
    s = {0: 1_000_000, 1: 0}
    for _ in range(2):
        c = {0: s[1] // 1, 1: s[0] // 1}
        s = {
            0: 150_000 + (85 * c[0]) // 100,
            1: 0 + (85 * c[1]) // 100,
        }
    got = {
        r["node"]: r["rank_micros"]
        for r in personalized_pagerank_micros(
            edges, seeds, n_iter=2
        ).collect()
    }
    assert got == s


# --- signal correlations -----------------------------------------------------


def test_correlations_perfect_and_inverse(spark):
    rows = [
        Row(grp="g", a=i, b=2 * i + 3, c=10 - i) for i in range(1, 8)
    ]
    out = {
        (r["sig_i"], r["sig_j"]): r["r"]
        for r in signal_correlations(
            spark.createDataFrame(rows), ["a", "b", "c"], "grp"
        ).collect()
    }
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0


def test_correlations_zero_variance_null(spark):
    rows = [Row(grp="g", a=i, b=5) for i in range(4)]
    out = signal_correlations(
        spark.createDataFrame(rows), ["a", "b"], "grp"
    ).collect()
    assert out[0]["r"] is None


def test_correlations_matches_numpy(spark):
    rng = np.random.RandomState(3)
    xs = rng.randint(0, 100, 30)
    ys = rng.randint(0, 100, 30)
    rows = [
        Row(grp="g", a=int(x), b=int(y)) for x, y in zip(xs, ys)
    ]
    out = signal_correlations(
        spark.createDataFrame(rows), ["a", "b"], "grp"
    ).collect()
    want = round(float(np.corrcoef(xs, ys)[0, 1]), 4)
    assert abs(out[0]["r"] - want) < 2e-4
