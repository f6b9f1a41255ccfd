"""Small-file compaction planning — the table-maintenance half of a
resumable 10^12-doc pipeline.

A crawl that checkpoints per-partition (plans/pipeline.py) leaves behind
exactly what every long-running lakehouse ingest leaves behind: millions
of small files. Engines fix this with an OPTIMIZE/rewriteDataFiles pass
whose first step is a PLAN — group existing files into target-sized
output groups WITHOUT reading any data, just the size manifest (Iceberg
keeps it in metadata tables; the parquet footer scan is file-count-sized
either way).

This module is that planner as DataFrame algebra. The assignment is the
streaming next-fit rule every production compactor uses (Iceberg's
BinPackStrategy, Delta OPTIMIZE): walk files in a deterministic order
within each table partition, cut a new output group whenever the running
total passes the target. First-fit-DECREASING would pack ~11% tighter in
the worst case but needs a size sort; next-fit in manifest order is
one window over (partition, file-id) — and the overshoot is bounded by
one file, which is what matters when the target is a soft 512 MB.

Scale shape: ONE window, partitioned by the table partition (never
global) — at 10^12 docs a partition holds thousands of files while the
manifest holds billions of rows total, and a per-partition window is
exactly how the manifest is already clustered. Zero data files touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def compaction_plan(
    files: DataFrame,
    partition_cols,
    size_col: str = "bytes",
    file_col: str = "file_id",
    target_bytes: int = 512 * 1024 * 1024,
) -> DataFrame:
    """Assign every file to an output compaction group:
    input columns + ``group_id`` (0-based within each partition).

    ``group_id = floor(exclusive_running_sum / target_bytes)`` in
    ``file_col`` order — a file that straddles a target boundary joins
    the group it STARTS in, so each group's total is < target + the
    straddling file's size (single-file overshoot bound; files larger
    than the target get a group of their own plus whatever started it).
    Deterministic: the walk order is (partition, file_id), no
    timestamps, replay-stable for resume.
    """
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    parts = list(partition_cols)
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.asc(file_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = F.sum(size_col).over(w) - F.col(size_col)
    return files.withColumn(
        "group_id",
        F.floor(cum_excl / F.lit(target_bytes)).cast("bigint"),
    )


def compaction_summary(plan: DataFrame, partition_cols,
                       size_col: str = "bytes") -> DataFrame:
    """(partition…, group_id, n_files, group_bytes) — the rewrite
    work-list: one row per output file the compactor will produce.
    Partial-agg groupBy; feeds straight into a
    ``repartition(partition, group_id)`` + write."""
    parts = list(partition_cols)
    return plan.groupBy(*parts, "group_id").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(size_col).cast("bigint").alias("group_bytes"),
    )
