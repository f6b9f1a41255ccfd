"""Aligned shared-span detection + empirical-Bayes shrunk host quality."""

from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.dedup import aligned_span_pairs
from tribeca_insights_spark.operators.textstats import shrunk_group_quality


def test_aligned_span_exact_position_and_length(spark):
    """a = prefix + shared(5 tokens) + suffix; b = other prefix +
    shared + other suffix — the run is exactly the shared block, at
    the right positions in each doc."""
    shared = "lorem ipsum dolor sit amet"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, tok_str=f"aa bb {shared} cc"),
            Row(doc_id=2, tok_str=f"xx {shared} yy zz ww"),
        ]
    )
    pairs = spark.createDataFrame([Row(a_id=1, b_id=2)])
    r = aligned_span_pairs(docs, pairs, k=3).collect()
    assert len(r) == 1
    row = r[0]
    assert row["run_tokens"] == 5
    assert row["start_a"] == 3  # 1-based gram position of "lorem"
    assert row["start_b"] == 2
    assert row["diag"] == 1


def test_aligned_span_picks_longest_of_two_runs(spark):
    """Two shared blocks on different diagonals — the longer wins."""
    long = "one two three four five six"
    short = "red green blue"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, tok_str=f"{short} p q {long}"),
            Row(doc_id=2, tok_str=f"{long} r s {short}"),
        ]
    )
    pairs = spark.createDataFrame([Row(a_id=1, b_id=2)])
    r = aligned_span_pairs(docs, pairs, k=3).collect()[0]
    assert r["run_tokens"] == 6
    assert r["start_a"] == 6 and r["start_b"] == 1


def test_aligned_span_no_shared_gram_emits_nothing(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, tok_str="aa bb cc dd"),
            Row(doc_id=2, tok_str="ww xx yy zz"),
        ]
    )
    pairs = spark.createDataFrame([Row(a_id=1, b_id=2)])
    assert aligned_span_pairs(docs, pairs, k=3).count() == 0


def test_shrunk_quality_pulls_thin_hosts_to_prior(spark):
    """A 1-doc outlier host lands near the domain prior; a heavy host
    keeps (close to) its own mean. Closed-form micros checked."""
    rows = [Row(host="big", domain="d", n_chars=100) for _ in range(80)]
    rows += [Row(host="thin", domain="d", n_chars=2000)]
    df = spark.createDataFrame(rows)
    out = {r["host"]: r for r in shrunk_group_quality(df, alpha=20).collect()}
    # domain mean = (80*100 + 2000) / 81
    dm = (80 * 100 + 2000) * 1_000_000 // 81
    assert out["big"]["domain_mean_micros"] == dm
    assert out["thin"]["mean_micros"] == 2000 * 1_000_000
    # thin: (2000e6 + 20*dm) // 21 — much closer to dm than to 2000e6
    expect_thin = (2000 * 1_000_000 + 20 * dm) // 21
    assert out["thin"]["shrunk_micros"] == expect_thin
    assert abs(out["thin"]["shrunk_micros"] - dm) < abs(
        out["thin"]["shrunk_micros"] - 2000 * 1_000_000
    )
    # big: (8000e6 + 20*dm) // 100 — stays near 100e6
    expect_big = (80 * 100 * 1_000_000 + 20 * dm) // 100
    assert out["big"]["shrunk_micros"] == expect_big
    assert abs(out["big"]["shrunk_micros"] - 100 * 1_000_000) < 25_000_000
