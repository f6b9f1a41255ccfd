"""Round-4 wave: BM25F fielded ranking (q329)."""

import math

from pyspark.sql import Row

from tribeca_insights_spark.operators.retrieval import bm25f_topk


def _rank(spark, rows, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=i, title=t, text=b) for i, t, b in rows]
    )
    return bm25f_topk(df, ["spark"], **kw).collect()


def test_title_hit_outranks_body_hit(spark):
    got = _rank(
        spark,
        [
            (1, "spark guide here", "plain body words"),
            (2, "plain title here", "spark body words"),
            (3, "plain title here", "nothing relevant"),
        ],
    )
    assert [r["doc_id"] for r in got] == [1, 2]  # doc 3 never scored


def test_bm25f_matches_hand_computation(spark):
    # one doc, term in both fields: tfn sums across fields, idf once
    got = _rank(spark, [(1, "spark", "spark spark")])
    # title: w=2, b=0.5, tf=1, dl=1, avgdl=1 → tfn_t = 2
    # body:  w=1, b=0.75, tf=2, dl=2, avgdl=2 → tfn_b = 2
    tft = 4.0
    idf = math.log((1 - 1 + 0.5) / (1 + 0.5) + 1.0)
    want = math.floor(1e6 * idf * (tft / (1.2 + tft)))
    assert got[0]["score_micros"] == want
    assert got[0]["n_terms_hit"] == 1


def test_field_weight_param(spark):
    # equal weights → same contribution shape for symmetric docs
    rows = [
        (1, "spark alpha", "beta gamma"),
        (2, "beta gamma", "spark alpha"),
    ]
    got = _rank(
        spark, rows, fields={"title": (1.0, 0.75), "text": (1.0, 0.75)}
    )
    scores = {r["doc_id"]: r["score_micros"] for r in got}
    assert scores[1] == scores[2]


def test_empty_query_raises(spark):
    import pytest

    df = spark.createDataFrame([Row(doc_id=1, title="a", text="b")])
    with pytest.raises(ValueError):
        bm25f_topk(df, [])


def test_null_field_treated_as_empty(spark):
    # ADVICE r4: NULL field must not contribute dl=-1 to avgdl stats;
    # scores must equal the same corpus with '' in place of NULL
    from pyspark.sql import Row
    from tribeca_insights_spark.operators.retrieval import bm25f_topk

    rows_null = [
        Row(doc_id=1, title="spark rocks", text="spark spark fast"),
        Row(doc_id=2, title=None, text="spark slow"),
        Row(doc_id=3, title="other", text=None),
    ]
    rows_empty = [
        Row(doc_id=1, title="spark rocks", text="spark spark fast"),
        Row(doc_id=2, title="", text="spark slow"),
        Row(doc_id=3, title="other", text=""),
    ]
    got_null = {
        (r["doc_id"], r["score_micros"])
        for r in bm25f_topk(
            spark.createDataFrame(rows_null), ["spark"], topk=10
        ).collect()
    }
    got_empty = {
        (r["doc_id"], r["score_micros"])
        for r in bm25f_topk(
            spark.createDataFrame(rows_empty), ["spark"], topk=10
        ).collect()
    }
    assert got_null == got_empty and len(got_null) == 2
