"""q248: streaming sliding-log rate limiter — stateful semantics."""

import os
import tempfile
import uuid

import pytest
from pyspark.sql import Row

from tribeca_insights_spark.streaming.stateful import rate_limit_log

W = 1_000_000  # 1-second window in micros
CAP = 2


def _drain(spark, src_dir, n_files_hint=None):
    stream = (
        spark.readStream.schema("event_id bigint, host bigint, tsu bigint")
        .option("maxFilesPerTrigger", 1)  # force multi-batch replay
        .parquet(src_dir)
    )
    out = rate_limit_log(stream, window_us=W, capacity=CAP)
    qname = "rl_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return {r["event_id"]: r for r in spark.table(qname).collect()}


def test_rate_limit_admits_and_blocks(spark):
    rows = [
        Row(event_id=0, host=1, tsu=1_000_000),
        Row(event_id=1, host=1, tsu=1_100_000),
        Row(event_id=2, host=1, tsu=1_200_000),  # 2 in window -> block
        Row(event_id=3, host=1, tsu=2_300_000),  # window slid -> admit
        Row(event_id=4, host=2, tsu=1_200_000),  # other host independent
    ]
    with tempfile.TemporaryDirectory() as root:
        spark.createDataFrame(rows).coalesce(1).write.parquet(
            f"{root}/src"
        )
        got = _drain(spark, f"{root}/src")
    assert got[0]["allowed"] and got[0]["n_recent"] == 0
    assert got[1]["allowed"] and got[1]["n_recent"] == 1
    assert not got[2]["allowed"] and got[2]["n_recent"] == 2
    # at 2_300_000 the window [1_300_001, 2_299_999] holds nothing
    assert got[3]["allowed"] and got[3]["n_recent"] == 0
    assert got[4]["allowed"]


def test_rate_limit_state_spans_micro_batches(spark):
    # two files -> two micro-batches (maxFilesPerTrigger=1): the second
    # batch must still see the first batch's arrivals via state
    a = [Row(event_id=0, host=7, tsu=5_000_000),
         Row(event_id=1, host=7, tsu=5_010_000)]
    b = [Row(event_id=2, host=7, tsu=5_020_000)]
    with tempfile.TemporaryDirectory() as root:
        src = f"{root}/src"
        os.makedirs(src)
        spark.createDataFrame(a).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        spark.createDataFrame(b).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        got = _drain(spark, src)
    # regardless of which file formed which batch, the event-time
    # verdict is batch-layout-independent: the pure-function contract
    assert got[2]["n_recent"] == 2
    assert not got[2]["allowed"]


def test_rate_limit_same_microsecond_ties_do_not_block(spark):
    rows = [
        Row(event_id=0, host=3, tsu=9_000_000),
        Row(event_id=1, host=3, tsu=9_000_000),
        Row(event_id=2, host=3, tsu=9_000_000),
    ]
    with tempfile.TemporaryDirectory() as root:
        spark.createDataFrame(rows).coalesce(1).write.parquet(
            f"{root}/src"
        )
        got = _drain(spark, f"{root}/src")
    # RANGE-window peer semantics: equal timestamps exclude each other
    assert all(got[i]["allowed"] and got[i]["n_recent"] == 0
               for i in range(3))
