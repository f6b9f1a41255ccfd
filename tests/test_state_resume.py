"""Resume / checkpoint / lineage tests (north_rule): idempotent re-runs,
incremental processing, reconcile of lost outputs, read-side dedup."""

import shutil

import pytest
from pyspark.sql import functions as F

from tribeca_insights_spark.fixtures import corpus_df
from tribeca_insights_spark.plans import state as st
from tribeca_insights_spark.plans.pipeline import run_extraction

N = 120


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "warehouse")


def test_fresh_run_processes_all(spark, root):
    docs = corpus_df(spark, N, partitions=6)
    stats = run_extraction(spark, docs, root, run_id="r1", n_buckets=8)
    assert stats["n_processed"] == N
    out = st.read_extracted(spark, root)
    assert out.count() == N
    assert out.select("bucket").distinct().count() <= 8
    # log marks everything done
    assert st.done_urls(spark, root).count() == N
    # per-partition metrics: cover all docs, carry lineage ranges + timing
    m = st.read_metrics(spark, root)
    rows = m.collect()
    assert sum(r["n_docs"] for r in rows) == N
    assert all(r["wall_ms"] >= 0 and r["min_url"] <= r["max_url"] for r in rows)
    assert sum(r["bytes_in"] for r in rows) > 0


def test_rerun_is_idempotent(spark, root):
    docs = corpus_df(spark, N, partitions=6)
    run_extraction(spark, docs, root, run_id="r1", n_buckets=8)
    stats2 = run_extraction(spark, docs, root, run_id="r2", n_buckets=8)
    assert stats2["n_processed"] == 0
    assert st.read_extracted(spark, root).count() == N  # no duplicates


def test_incremental_run_processes_only_new(spark, root):
    docs = corpus_df(spark, N, partitions=6)
    first = docs.limit(70)
    run_extraction(spark, first, root, run_id="r1", n_buckets=8)
    stats2 = run_extraction(spark, docs, root, run_id="r2", n_buckets=8)
    assert stats2["n_processed"] == N - 70
    assert st.read_extracted(spark, root).count() == N


def test_reconcile_reprocesses_lost_outputs(spark, root, tmp_path):
    docs = corpus_df(spark, N, partitions=6)
    run_extraction(spark, docs, root, run_id="r1", n_buckets=8)
    # simulate a lost output partition (kill between log and durable output)
    out = st.read_extracted(spark, root)
    lost_bucket = out.select("bucket").first()["bucket"]
    n_lost = out.filter(F.col("bucket") == lost_bucket).count()
    shutil.rmtree(f"{root}/extracted/bucket={lost_bucket}")
    # resume run: reconcile re-pends the lost urls, run reprocesses exactly them
    stats = run_extraction(spark, docs, root, run_id="r2", n_buckets=8)
    assert stats["n_processed"] == n_lost
    assert st.read_extracted(spark, root).count() == N


def test_read_side_dedup_on_replay(spark, root):
    docs = corpus_df(spark, N, partitions=6)
    run_extraction(spark, docs, root, run_id="r1", n_buckets=8)
    # simulate a replay that re-appended the same output rows (crash between
    # output write and log write, then rerun)
    dup = st.read_extracted(spark, root, dedup=False).limit(10).withColumn(
        "run_id", F.lit("r9")
    )
    dup.write.mode("append").partitionBy("bucket").parquet(f"{root}/extracted")
    assert st.read_extracted(spark, root, dedup=False).count() == N + 10
    assert st.read_extracted(spark, root).count() == N  # deduped view


def test_status_last_wins(spark, root):
    docs = corpus_df(spark, 20, partitions=2)
    run_extraction(spark, docs, root, run_id="r1", n_buckets=4)
    # manual re-pend of 5 urls (status 2 appended later) → they leave done set
    sample = st.done_urls(spark, root).limit(5)
    seq = st.next_seq(spark, root)
    st.append_log(
        spark, root,
        sample.select(
            "url", F.lit(2).alias("status"), F.lit("2026-08-16").alias("processed_at"),
            F.lit(None).cast("int").alias("bucket"), F.lit("manual").alias("run_id"),
            F.lit(seq).cast("long").alias("seq"),
        ),
    )
    assert st.done_urls(spark, root).count() == 15
    assert st.pending(docs, spark, root).count() == 5
