"""Round-4 wave: HLL shard merge (q166), resource-allocation link
prediction (q167), term burstiness (q168), calibration bins (q169),
dedup-method agreement kappa (q170), vocabulary concentration (q171)."""

from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.classifier import calibration_bins
from tribeca_insights_spark.operators.dedup import dedup_agreement
from tribeca_insights_spark.operators.linkgraph import resource_allocation
from tribeca_insights_spark.operators.sketches import (
    hll_merge,
    hll_registers,
)
from tribeca_insights_spark.operators.textstats import (
    term_burstiness,
    vocab_concentration,
)


# --- hll_merge ≡ sketch-of-union --------------------------------------------


def test_hll_merge_equals_union_sketch(spark):
    keys = [Row(k=f"tok{i}") for i in range(200)]
    df = spark.createDataFrame(keys)
    a = df.limit(120)
    b = df.subtract(a)
    merged = {
        (r["register"], r["max_rho"])
        for r in hll_merge(
            hll_registers(a, "k", p=5), hll_registers(b, "k", p=5)
        ).collect()
    }
    direct = {
        (r["register"], r["max_rho"])
        for r in hll_registers(df, "k", p=5).collect()
    }
    assert merged == direct


# --- resource_allocation -----------------------------------------------------


def test_resource_allocation_path_graph(spark):
    # path 1-2-3: the only wedge is (1,3) through z=2, deg(2)=2
    e = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3)]
    )
    rows = resource_allocation(e).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"]) == (1, 3)
    assert r["ra_micros"] == 1_000_000 // 2
    assert r["n_common"] == 1


def test_resource_allocation_excludes_existing_edges(spark):
    # triangle 1-2-3: every pair is adjacent → no predictions
    e = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=1, dst=3)]
    )
    assert resource_allocation(e).count() == 0


def test_resource_allocation_sums_over_common_neighbors(spark):
    # 1 and 4 share neighbors 2 (deg 2) and 3 (deg 2): ra = 2·(1e6//2)
    e = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=1, dst=3),
         Row(src=2, dst=4), Row(src=3, dst=4)]
    )
    out = {(r["a"], r["b"]): r for r in resource_allocation(e).collect()}
    assert out[(1, 4)]["ra_micros"] == 1_000_000
    assert out[(1, 4)]["n_common"] == 2
    # (2,3) also share 1 and 4 symmetrically
    assert out[(2, 3)]["ra_micros"] == 1_000_000


def test_resource_allocation_max_degree_drops_hub_center(spark):
    # star: hub 0 connects 1..4 → all leaf pairs share only the hub
    e = spark.createDataFrame(
        [Row(src=0, dst=i) for i in range(1, 5)]
    )
    assert resource_allocation(e).count() == 6
    assert resource_allocation(e, max_degree=3).count() == 0


# --- term_burstiness ----------------------------------------------------------


def test_term_burstiness_poisson_vs_bursty(spark):
    # 4 docs; "even" appears once in every doc (dispersion == 0 → below
    # Poisson 1e6 since zeros-included variance of constant 1 is 0);
    # "burst" appears 4 times in one doc only.
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="even burst burst burst burst"),
            Row(doc_id=1, text="even x"),
            Row(doc_id=2, text="even y"),
            Row(doc_id=3, text="even z"),
        ]
    )
    out = {r["word"]: r for r in term_burstiness(docs, min_cf=2).collect()}
    # even: N=4, cf=4, c2=4 → (1e6·(16-16))//16 = 0
    assert out["even"]["burstiness_micros"] == 0
    assert out["even"]["df"] == 4 and out["even"]["cf"] == 4
    # burst: N=4, cf=4, c2=16 → (1e6·(64-16))//16 = 3e6
    assert out["burst"]["burstiness_micros"] == 3_000_000
    assert out["burst"]["df"] == 1
    # hapax words filtered by min_cf
    assert "x" not in out


# --- calibration_bins ---------------------------------------------------------


def test_calibration_bins_counts_and_rates(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta tok{i}", n=i) for i in range(8)]
        + [Row(doc_id=99, text="", n=0)]  # empty → excluded
    )
    out = calibration_bins(
        docs, label=F.when(F.col("n") >= 4, F.lit(1)).otherwise(F.lit(0)),
        n_bins=10,
    ).collect()
    assert sum(r["n_docs"] for r in out) == 8  # empty doc excluded
    assert sum(r["n_pos"] for r in out) == 4
    for r in out:
        assert 0 <= r["bin"] <= 9
        assert r["lo_micros"] == r["bin"] * 200_000 - 1_000_000
        assert (
            r["pos_rate_micros"]
            == r["n_pos"] * 1_000_000 // r["n_docs"]
        )
        # mean score stays inside the weight envelope
        assert -1_000_000 <= r["mean_score_micros"] <= 1_000_000


# --- dedup_agreement ----------------------------------------------------------


def _flags(spark, pairs):
    return spark.createDataFrame(
        [Row(doc_id=i, flag=f) for i, f in pairs]
    )


def test_dedup_agreement_perfect(spark):
    a = _flags(spark, [(1, 1), (2, 0), (3, 1), (4, 0)])
    r = dedup_agreement(a, a).collect()[0]
    assert (r["n00"], r["n11"], r["n01"], r["n10"]) == (2, 2, 0, 0)
    assert r["kappa_micros"] == 1_000_000


def test_dedup_agreement_worse_than_chance_is_negative(spark):
    a = _flags(spark, [(1, 1), (2, 0), (3, 1), (4, 0)])
    b = _flags(spark, [(1, 0), (2, 1), (3, 0), (4, 1)])
    r = dedup_agreement(a, b).collect()[0]
    assert r["kappa_micros"] == -1_000_000


def test_dedup_agreement_degenerate_marginals_null(spark):
    a = _flags(spark, [(1, 1), (2, 1)])
    r = dedup_agreement(a, a).collect()[0]
    assert r["kappa_micros"] is None  # pe = 1 → undefined


def test_dedup_agreement_known_value(spark):
    # n00=5, n11=3, n01=1, n10=1 → po=.8, pe=(6·6+4·4)/100=.52
    # kappa = .28/.48 = 7/12 → 583333 micros (floor)
    pairs_a = [(i, 0) for i in range(6)] + [(i, 1) for i in range(6, 10)]
    pairs_b = (
        [(i, 0) for i in range(5)] + [(5, 1)]
        + [(6, 0)] + [(i, 1) for i in range(7, 10)]
    )
    r = dedup_agreement(
        _flags(spark, pairs_a), _flags(spark, pairs_b)
    ).collect()[0]
    assert (r["n00"], r["n01"], r["n10"], r["n11"]) == (5, 1, 1, 3)
    assert r["kappa_micros"] == 583_333


# --- vocab_concentration ------------------------------------------------------


def test_vocab_concentration_uniform_vs_spiked(spark):
    docs = spark.createDataFrame(
        [
            Row(source="uniform", text="a b c d"),
            Row(source="spiked", text="a a a b"),
        ]
    )
    out = {r["source"]: r for r in vocab_concentration(docs).collect()}
    # uniform: 4 singletons → hhi = 1e6·4/16 = 250000 = 1/n_types
    assert out["uniform"]["hhi_micros"] == 250_000
    assert out["uniform"]["n_types"] == 4
    # spiked: c² = 9+1 → 1e6·10//16 = 625000
    assert out["spiked"]["hhi_micros"] == 625_000
    assert out["spiked"]["n_tokens"] == 4
