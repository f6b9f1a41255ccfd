"""Round-4 wave: ROC/AUC threshold sweep (q154), PMI collocations
(q153), within-document line dedup (q155)."""

import math

from pyspark.sql import Row

from tribeca_insights_spark.operators.classifier import roc_points
from tribeca_insights_spark.operators.dedup import dedup_lines_within_doc
from tribeca_insights_spark.operators.tf import pmi_collocations


# --- roc_points --------------------------------------------------------------


def _roc(spark, rows, width=1):
    df = spark.createDataFrame(
        [Row(score_micros=s, label=l) for s, l in rows]
    )
    out = roc_points(df, bucket_width=width).collect()
    return sorted(out, key=lambda r: -r["threshold_micros"])


def test_roc_perfect_separation(spark):
    # scores {30,20} positive, {10,0} negative → AUC = 1
    out = _roc(spark, [(30, True), (20, True), (10, False), (0, False)])
    assert [(r["threshold_micros"], r["tp"], r["fp"]) for r in out] == [
        (30, 1, 0), (20, 2, 0), (10, 2, 1), (0, 2, 2),
    ]
    assert all(r["auc_micros"] == 1_000_000 for r in out)
    top = out[0]
    assert (top["fn"], top["tn"]) == (1, 2)
    assert top["tpr_micros"] == 500_000  # 1/2 positives recalled
    assert top["fpr_micros"] == 0
    assert top["precision_micros"] == 1_000_000


def test_roc_interleaved_auc_half(spark):
    # pos {3,1}, neg {2}: one concordant, one discordant pair → AUC 0.5
    out = _roc(spark, [(3, True), (2, False), (1, True)])
    assert out[0]["auc_micros"] == 500_000


def test_roc_tied_scores_one_bucket_trapezoid(spark):
    # one pos + one neg at the same score: single bucket, trapezoid
    # gives the standard tied-pair 0.5 credit
    out = _roc(spark, [(5, True), (5, False)])
    assert len(out) == 1
    assert (out[0]["tp"], out[0]["fp"]) == (1, 1)
    assert out[0]["auc_micros"] == 500_000


def test_roc_single_class_rates_null(spark):
    # all-positive input: N = 0 → fpr and AUC must be NULL, not 0
    out = _roc(spark, [(4, True), (2, True)])
    assert all(r["fpr_micros"] is None for r in out)
    assert all(r["auc_micros"] is None for r in out)
    assert out[-1]["tpr_micros"] == 1_000_000


def test_roc_bucketing_floor_on_negatives(spark):
    # bucket edges floor toward -inf: score -1 at width 10 → bucket -10
    out = _roc(spark, [(-1, True), (11, False)], width=10)
    assert sorted(r["threshold_micros"] for r in out) == [-10, 10]


# --- pmi_collocations ---------------------------------------------------------


def test_pmi_closed_form(spark):
    df = spark.createDataFrame(
        [Row(tokens=["x", "y", "x", "y"]), Row(tokens=["x", "y"])]
    )
    rows = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, min_count=1).collect()
    }
    # bigrams: (x,y)×3 + (y,x)×1, N_bi=4; unigrams x=3 y=3, N_uni=6
    xy = rows[("x", "y")]
    assert (xy["c_ab"], xy["c_a"], xy["c_b"]) == (3, 3, 3)
    assert xy["pmi_micros"] == math.floor(
        1e6 * math.log((3 / 4) / ((3 / 6) * (3 / 6)))
    )
    yx = rows[("y", "x")]
    assert yx["pmi_micros"] == 0  # ln((1/4)/(1/4)) = 0


def test_pmi_min_count_filters_before_totals(spark):
    df = spark.createDataFrame(
        [Row(tokens=["x", "y", "x", "y"]), Row(tokens=["x", "y"])]
    )
    out = pmi_collocations(df, min_count=2).collect()
    # (y,x) appears once → dropped; N_bi is the FILTERED mass (3)
    assert [(r["w1"], r["w2"]) for r in out] == [("x", "y")]
    assert out[0]["pmi_micros"] == math.floor(
        1e6 * math.log((3 / 3) / ((3 / 6) * (3 / 6)))
    )


def test_pmi_topk_and_order(spark):
    df = spark.createDataFrame(
        [Row(tokens=["a", "b", "a", "b", "c", "d"])]
    )
    out = pmi_collocations(df, min_count=1, k=2).collect()
    assert len(out) == 2
    assert out[0]["pmi_micros"] >= out[1]["pmi_micros"]


# --- dedup_lines_within_doc ---------------------------------------------------


def test_line_dedup_keeps_first_occurrence_in_order(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a\nb\na\nc\nb"), Row(doc_id=2, text="z")]
    )
    out = {r["doc_id"]: r for r in dedup_lines_within_doc(df).collect()}
    assert out[1]["text"] == "a\nb\nc"  # first-occurrence document order
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (5, 3)
    assert out[2]["text"] == "z"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (1, 1)


def test_line_dedup_preserves_other_columns_and_empties(spark):
    df = spark.createDataFrame(
        [Row(doc_id=7, lang="en", text="x\n\nx\n\ny")]
    )
    r = dedup_lines_within_doc(df).collect()[0]
    assert r["lang"] == "en"
    # the empty line is itself deduped (kept once, position 2)
    assert r["text"] == "x\n\ny"
    assert (r["n_lines"], r["n_kept"]) == (5, 3)
