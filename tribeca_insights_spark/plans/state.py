"""Checkpoint / resume state layer (reference ``visited_urls`` CSV —
storage.py:52-82, SURVEY.md §1.2 — re-expressed as append-only tables).

Layout under a root directory (plain parquet in this sandbox; in production
each of these is an Iceberg table and a run's output+log+metrics land in ONE
transaction via a single snapshot commit — the read-side last-wins dedup
below is the sandbox approximation of that atomicity; the Iceberg-proper
implementation — MERGE INTO log upserts, snapshot-commit writes, runtime
jar detection — is :mod:`.iceberg`):

* ``extracted/``   — per-page output, partitioned by url-hash ``bucket``
* ``extract_log/`` — (url, status, processed_at, bucket, run_id) append-only;
  reference Status semantics preserved: 2 = pending/reprocess, 1 = done
  (crawler.py:215, 253; storage.py:120-150)
* ``metrics/``     — per-run, per-partition lineage/metrics rows

Resume = left-anti join of input urls against the *current* done set (the
last-wins status per url) — the distributed form of the reference's
``visited_df[Status==2]`` queue scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

LOG_DDL = "url string, status int, processed_at string, bucket int, run_id string, seq long"
METRICS_DDL = (
    "run_id string, partition_id int, n_docs long, n_empty long, "
    "bytes_in long, wall_ms long, min_url string, max_url string"
)


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") or f.startswith(("bucket=", "part-"))
        for f in os.listdir(path)
    )


def read_log(spark: SparkSession, root: str) -> DataFrame:
    p = f"{root}/extract_log"
    if not _exists(p):
        return spark.createDataFrame([], LOG_DDL)
    return spark.read.parquet(p)


def current_status(log: DataFrame) -> DataFrame:
    """Last-wins status per url (append-only log → current state view)."""
    w = Window.partitionBy("url").orderBy(F.desc("seq"))
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def done_urls(spark: SparkSession, root: str) -> DataFrame:
    return (
        current_status(read_log(spark, root))
        .filter(F.col("status") == 1)
        .select("url")
    )


def pending(docs: DataFrame, spark: SparkSession, root: str) -> DataFrame:
    """The work queue: input minus done — reference crawler.py:215 as a
    left-anti join (no driver-side url list, no limit)."""
    return docs.join(done_urls(spark, root), "url", "left_anti")


def append_log(spark: SparkSession, root: str, entries: DataFrame) -> None:
    entries.write.mode("append").parquet(f"{root}/extract_log")


def next_seq(spark: SparkSession, root: str) -> int:
    log = read_log(spark, root)
    row = log.agg(F.max("seq").alias("m")).collect()[0]
    return (row["m"] or 0) + 1


def append_metrics(spark: SparkSession, root: str, metrics: DataFrame) -> None:
    metrics.write.mode("append").parquet(f"{root}/metrics")


def read_metrics(spark: SparkSession, root: str) -> DataFrame:
    p = f"{root}/metrics"
    if not _exists(p):
        return spark.createDataFrame([], METRICS_DDL)
    return spark.read.parquet(p)


def read_extracted(spark: SparkSession, root: str, dedup: bool = True) -> DataFrame:
    """Output view. ``dedup=True`` keeps the newest row per url — the
    read-side guard against replays between output-write and log-write
    (Iceberg's single-snapshot commit makes this a no-op in production)."""
    p = f"{root}/extracted"
    if not _exists(p):
        raise FileNotFoundError(p)
    df = spark.read.parquet(p)
    if not dedup:
        return df
    w = Window.partitionBy("url").orderBy(F.desc("run_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def reconcile(spark: SparkSession, root: str) -> DataFrame:
    """Reference reconcile (storage.py:120-150): log rows marked done whose
    output rows are missing get re-pended (status→2 appended). Returns the
    re-pended urls DataFrame (empty if consistent)."""
    done = done_urls(spark, root)
    try:
        have = read_extracted(spark, root, dedup=False).select("url").distinct()
    except FileNotFoundError:
        have = spark.createDataFrame([], "url string")
    lost = done.join(have, "url", "left_anti")
    n_lost = lost.count()
    if n_lost:
        seq = next_seq(spark, root)
        entries = lost.select(
            "url",
            F.lit(2).alias("status"),
            F.date_format(F.current_timestamp(), "yyyy-MM-dd").alias("processed_at"),
            F.lit(None).cast("int").alias("bucket"),
            F.lit("reconcile").alias("run_id"),
            F.lit(seq).cast("long").alias("seq"),
        )
        append_log(spark, root, entries)
    return lost
