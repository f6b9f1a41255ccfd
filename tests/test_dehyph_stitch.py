"""Round-4 wave: de-hyphenation (q338) and chunk stitching (q339)."""

import pytest
from pyspark.sql import Row

from tribeca_insights_spark.functions.normalize import dehyphenate_col
from tribeca_insights_spark.operators.chunking import (
    chunk_documents,
    stitch_chunks,
)


def _deh(spark, text):
    df = spark.createDataFrame([Row(text=text)])
    return df.select(dehyphenate_col("text").alias("r")).collect()[0]["r"]


def test_hyphen_linebreak_joins(spark):
    assert _deh(spark, "extrac-\ntion works") == "extraction works"
    assert _deh(spark, "extrac- \n  tion") == "extraction"


def test_compound_hyphen_survives(spark):
    assert _deh(spark, "state-of-the-art\nsystems") == (
        "state-of-the-art systems")


def test_uppercase_hyphen_not_joined(spark):
    # likely a real compound/name, not a column break
    assert _deh(spark, "UNITED-\nSTATES") == "UNITED- STATES"


def test_roundtrip_exact(spark):
    text = " ".join(f"tok{i}" for i in range(50))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    ch = chunk_documents(df, chunk=8, stride=6)
    st = stitch_chunks(ch, chunk=8, stride=6).collect()[0]
    assert st["stitched_text"] == text
    assert st["n_overlap_mismatches"] == 0


def test_corrupted_chunk_detected(spark):
    text = " ".join(f"tok{i}" for i in range(20))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    ch = chunk_documents(df, chunk=8, stride=6)
    from pyspark.sql import functions as F

    # corrupt the overlap region of chunk 1
    bad = ch.withColumn(
        "chunk_text",
        F.when(F.col("chunk_id") == 1,
               F.concat(F.lit("XXX YYY "), F.col("chunk_text")))
        .otherwise(F.col("chunk_text")),
    )
    st = stitch_chunks(bad, chunk=8, stride=6).collect()[0]
    assert st["n_overlap_mismatches"] >= 1


def test_single_chunk_doc(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    ch = chunk_documents(df, chunk=8, stride=6)
    st = stitch_chunks(ch, chunk=8, stride=6).collect()[0]
    assert st["stitched_text"] == "a b c" and st["n_chunks"] == 1


def test_bad_params_raise(spark):
    df = spark.createDataFrame([Row(doc_id=1, chunk_id=0, chunk_text="x")])
    with pytest.raises(ValueError):
        stitch_chunks(df, chunk=4, stride=8)
