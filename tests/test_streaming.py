"""Structured Streaming tests: streamed extraction equals batch extraction;
windowed TF with watermark; checkpointed incremental drain."""

import pytest
from pyspark.sql import functions as F

from tribeca_insights_spark.fixtures import corpus_df, gen_corpus, golden_records
from tribeca_insights_spark.streaming.stream_extract import (
    stream_extract,
    stream_windowed_tf,
)

N = 80


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "out": str(tmp_path / "out"),
        "chk": str(tmp_path / "chk"),
    }


def _write_src(spark, dirs, n=N, seed=42, mode="append"):
    corpus_df(spark, n, seed, partitions=4).write.mode(mode).parquet(dirs["src"])


def test_stream_extract_matches_batch(spark, dirs):
    _write_src(spark, dirs)
    q = stream_extract(spark, dirs["src"], dirs["out"], dirs["chk"])
    q.awaitTermination(120)
    out = spark.read.parquet(dirs["out"])
    got = {r["url"]: r for r in out.collect()}
    golden = {g["url"]: g for g in golden_records(gen_corpus(N))}
    assert set(got) == set(golden)
    for u, g in golden.items():
        assert got[u]["page_hash"] == g["page_hash"], u
        assert got[u]["word_count"] == g["word_count"], u


def test_stream_is_incremental_via_checkpoint(spark, dirs):
    _write_src(spark, dirs)
    stream_extract(spark, dirs["src"], dirs["out"], dirs["chk"]).awaitTermination(120)
    n1 = spark.read.parquet(dirs["out"]).count()
    assert n1 == N
    # second drain with no new files → nothing re-processed
    stream_extract(spark, dirs["src"], dirs["out"], dirs["chk"]).awaitTermination(120)
    assert spark.read.parquet(dirs["out"]).count() == N
    # append new files → only they are processed
    corpus_df(spark, 30, seed=7, partitions=2).write.mode("append").parquet(dirs["src"])
    stream_extract(spark, dirs["src"], dirs["out"], dirs["chk"]).awaitTermination(120)
    assert spark.read.parquet(dirs["out"]).count() == N + 30


def test_stream_windowed_tf(spark, dirs):
    _write_src(spark, dirs)
    agg = stream_windowed_tf(spark, dirs["src"], window="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("wtf")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["word"]): r["freq"]
        for r in spark.sql("SELECT * FROM wtf").collect()
    }
    assert got
    # oracle: batch per-minute window counts from golden tokens
    from collections import Counter

    golden = golden_records(gen_corpus(N))
    rows = gen_corpus(N)
    oracle = Counter()
    for r, g in zip(rows, golden):
        minute = r["warc_ts"].replace(second=0, microsecond=0)
        for t in g["tokens"]:
            oracle[(minute, t)] += 1
    assert sum(got.values()) == sum(oracle.values())
    # spot-check a few keys (timezone-naive match)
    for (w, word), freq in list(oracle.items())[:20]:
        assert got.get((w, word)) == freq, (w, word)


def test_stream_windowed_doc_tf_hour_windows(spark, tmp_path):
    from pyspark.sql import functions as F

    from tribeca_insights_spark.streaming.stream_extract import (
        stream_windowed_doc_tf,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, "2026-01-01 00:10:00", "alpha beta alpha", "en"),
            (2, "2026-01-01 00:50:00", "alpha", "en"),
            (3, "2026-01-01 01:05:00", "beta", "en"),
        ],
        "doc_id long, ts string, text string, lang string",
    ).select(
        "doc_id", F.to_timestamp("ts").alias("warc_ts"), "text", "lang"
    ).write.parquet(src)
    agg = stream_windowed_doc_tf(spark, src, window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("wdtf_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.window_start, r.word): r.freq
        for r in spark.table("wdtf_test").collect()
    }
    assert got == {
        ("2026-01-01 00:00:00", "alpha"): 3,
        ("2026-01-01 00:00:00", "beta"): 1,
        ("2026-01-01 01:00:00", "beta"): 1,
    }


def test_stream_session_windows_gap_merge(spark, tmp_path):
    from pyspark.sql import functions as F

    from tribeca_insights_spark.streaming.stream_extract import (
        stream_session_windows,
    )

    src = str(tmp_path / "sess_src")
    rows = [
        # host A: 3 events chained within the 30-min gap -> ONE session
        ("a", "2026-01-01 00:00:00"),
        ("a", "2026-01-01 00:20:00"),
        ("a", "2026-01-01 00:45:00"),
        # host A: a fourth event far away -> second session
        ("a", "2026-01-01 03:00:00"),
        # host B: single event
        ("b", "2026-01-01 00:10:00"),
    ]
    spark.createDataFrame(rows, "host string, ts string").select(
        "host", F.to_timestamp("ts").alias("warc_ts")
    ).write.parquet(src)
    agg = stream_session_windows(spark, src, gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.host, r.session_start): (r.session_end, r.n_pages)
        for r in spark.table("sess_test").collect()
    }
    # chained events extend the session: end = last event + gap
    assert got[("a", "2026-01-01 00:00:00")] == (
        "2026-01-01 01:15:00", 3
    )
    assert got[("a", "2026-01-01 03:00:00")] == (
        "2026-01-01 03:30:00", 1
    )
    assert got[("b", "2026-01-01 00:10:00")] == (
        "2026-01-01 00:40:00", 1
    )


def test_stream_stream_join_time_bound(spark, tmp_path):
    from tribeca_insights_spark.streaming.stream_extract import (
        stream_stream_join,
    )

    pdir, adir = str(tmp_path / "pages"), str(tmp_path / "annots")
    spark.createDataFrame(
        [(1, "2026-01-01 00:00:00"), (2, "2026-01-01 00:00:00")],
        "doc_id long, ts string",
    ).select("doc_id", F.to_timestamp("ts").alias("fetch_ts")) \
        .write.parquet(pdir)
    spark.createDataFrame(
        [
            (1, "2026-01-01 00:30:00", 7),   # inside 1h bound -> joins
            (2, "2026-01-01 02:00:00", 9),   # outside -> dropped
            (3, "2026-01-01 00:05:00", 5),   # no matching fetch
        ],
        "doc_id long, ts string, score long",
    ).select(
        "doc_id", F.to_timestamp("ts").alias("score_ts"), "score"
    ).write.parquet(adir)

    j = stream_stream_join(spark, pdir, adir, max_lag="1 hour")
    q = (
        j.writeStream.format("memory").queryName("ssj_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.table("ssj_test").collect()}
    assert set(got) == {1}
    assert got[1].lag_min == 30 and got[1].score == 7
    assert got[1].fetch_ts == "2026-01-01 00:00:00"
    assert got[1].score_ts == "2026-01-01 00:30:00"
