"""Cross-micro-batch stateful dedup (streaming/stateful.py)."""

import os

from pyspark.sql import functions as F

from tribeca_insights_spark.schemas import DOCS_SCHEMA
from tribeca_insights_spark.streaming.stateful import dedup_first_seen


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_first_seen_dedup_across_batches(spark, tmp_path):
    from datetime import datetime

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def row(url, sec):
        return {
            "url": url,
            "warc_ts": datetime(2026, 1, 1, 0, 0, sec),
            "html": b"<p>x</p>",
            "text": "",
            "lang": "en",
        }

    # batch files written before the stream starts; maxFilesPerTrigger=1
    # under availableNow => one micro-batch per file, so url B recurs
    # ACROSS batches and must be suppressed by state, not batch-local dedup
    _write_batch(spark, src, [row("https://a.com/A", 1), row("https://a.com/B", 2)])
    _write_batch(spark, src, [row("https://a.com/B", 3), row("https://a.com/C", 4)])
    _write_batch(spark, src, [row("https://a.com/C", 5), row("https://a.com/C", 6)])

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_first_seen(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"https://a.com/A", "https://a.com/B", "https://a.com/C"}
    # first occurrence timestamp wins
    assert got["https://a.com/B"]["first_ts"].second in (2, 3)
    # restart on the same checkpoint: no new files => no duplicate emits
    q2 = (
        dedup_first_seen(
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3
