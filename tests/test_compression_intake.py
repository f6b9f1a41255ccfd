"""Round-4 wave: compression signal (q315) and frontier intake (q316)."""

import zlib

from pyspark.sql import Row

from tribeca_insights_spark.operators.textstats import compression_signal


def test_compression_matches_zlib(spark):
    texts = ["spam " * 50, "a short natural sentence here", ""]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {r["doc_id"]: r for r in compression_signal(df).collect()}
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        c = len(zlib.compress(b, 6)) if b else 0
        assert got[i]["n_bytes"] == len(b)
        assert got[i]["n_compressed"] == c
        assert got[i]["ratio_micros"] == (
            (1_000_000 * c) // len(b) if b else 0
        )


def test_compression_level_param(spark):
    t = "the quick brown fox jumps over the lazy dog " * 8
    df = spark.createDataFrame([Row(doc_id=1, text=t)])
    r9 = compression_signal(df, level=9).collect()[0]
    assert r9["n_compressed"] == len(zlib.compress(t.encode(), 9))


def test_compression_null_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None)], "doc_id bigint, text string"
    )
    r = compression_signal(df).collect()[0]
    assert (r["n_bytes"], r["n_compressed"], r["ratio_micros"]) == (0, 0, 0)


def test_compression_plan_no_shuffle(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    plan = (
        compression_signal(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
