"""Round-4 wave: BPE encode (q156), Wilson bounds (q157), Zipf slope
(q158)."""

import math

import pytest
from pyspark.sql import Row

from tribeca_insights_spark.operators.bpe import bpe_encode
from tribeca_insights_spark.operators.textstats import (
    wilson_bounds,
    zipf_slope,
)

MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"),
    ("a", "n"), ("an", "d"), ("e", "r"), ("o", "n"),
]


def _enc(spark, text, merges=MERGES):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return bpe_encode(df, merges).collect()[0]


def test_bpe_encode_greedy_rank_order(spark):
    r = _enc(spark, "the thing and then")
    # "then": (t,h) fires before (h,e) could; (th,e) then consumes th+e
    assert r["symbols"] == ["the", "th", "ing", "and", "the", "n"]
    assert r["n_bpe_tokens"] == 6


def test_bpe_encode_symbol_boundary_safe(spark):
    # after (t,h) makes [th, e], the (h,e) merge must NOT match the
    # h inside symbol "th" — the sentinel wrapping is the guarantee
    r = _enc(spark, "the", merges=[("t", "h"), ("h", "e")])
    assert r["symbols"] == ["th", "e"]


def test_bpe_encode_adjacent_nonoverlapping(spark):
    # "aaa" with (a,a): greedy left-to-right gives [aa, a], never [a, aa]
    r = _enc(spark, "aaa aaaa", merges=[("a", "a")])
    assert r["symbols"] == ["aa", "a", "aa", "aa"]


def test_bpe_encode_chained_merges(spark):
    # (a,n)→an then (an,d)→and: the second merge consumes the first's
    # output symbol
    r = _enc(spark, "and", merges=[("a", "n"), ("an", "d")])
    assert r["symbols"] == ["and"]


def test_bpe_encode_duplicate_outputs_rejected(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="abc")])
    with pytest.raises(ValueError):
        bpe_encode(df, [("a", "bc"), ("ab", "c")])  # both → "abc"


def test_bpe_encode_empty_text(spark):
    r = _enc(spark, "")
    assert r["symbols"] == [] and r["n_bpe_tokens"] == 0


def test_wilson_textbook_values(spark):
    rows = (
        [Row(source="a", is_good=True)] * 3
        + [Row(source="b", is_good=True)] * 70
        + [Row(source="b", is_good=False)] * 30
        + [Row(source="c", is_good=False)] * 5
    )
    out = {
        r["source"]: r
        for r in wilson_bounds(spark.createDataFrame(rows)).collect()
    }
    # 3/3: p_hat 1.0 but the lower bound collapses toward 0.44 —
    # the small-sample host cannot out-rank the well-sampled one
    assert out["a"]["p_hat"] == 1.0
    assert out["a"]["wilson_lo"] == pytest.approx(0.438494, abs=1e-6)
    assert out["b"]["wilson_lo"] == pytest.approx(0.604150, abs=1e-6)
    assert out["a"]["wilson_lo"] < out["b"]["wilson_lo"]
    assert out["c"]["successes"] == 0 and out["c"]["wilson_lo"] == 0.0


def test_zipf_slope_matches_python_replay(spark):
    t = spark.createDataFrame(
        [Row(lang="en", tokens=["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])]
    )
    r = zipf_slope(t).collect()[0]
    xs = [math.floor(1e6 * math.log(i)) for i in (1, 2, 3, 4)]
    ys = [math.floor(1e6 * math.log(f)) for f in (8, 4, 2, 1)]
    n, sx, sy = 4, sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = float(n) * float(sxx) - float(sx) * float(sx)
    slope = math.floor(1e6 * num / den)
    icept = math.floor((float(sy) - slope * float(sx) / 1e6) / n)
    assert (r["slope_micros"], r["intercept_micros"]) == (slope, icept)
    # a perfect power law freq = 8·rank^-1.5 would slope -1.5e6; this
    # geometric series fits near -1.46e6 — sanity-band the magnitude
    assert -1_600_000 < r["slope_micros"] < -1_300_000


def test_zipf_slope_degenerate_group_null(spark):
    # single-word vocabulary: zero x-variance → NULL slope/intercept
    t = spark.createDataFrame([Row(lang="xx", tokens=["only", "only"])])
    r = zipf_slope(t).collect()[0]
    assert r["slope_micros"] is None and r["intercept_micros"] is None
