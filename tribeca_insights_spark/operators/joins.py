"""Join strategies Spark doesn't ship natively, built scale-first.

``bucketed_interval_join`` — the standard fix for range/interval joins,
which Catalyst otherwise plans as BroadcastNestedLoop (quadratic): map both
sides onto coarse time buckets, EQUI-join on (keys…, bucket), then refine
with the exact range predicate. A window spanning k buckets explodes into
k rows (k is bounded by interval/bucket_secs — pick the bucket near the
typical interval length); each event lands in exactly one bucket, so the
equi-join emits each true pair exactly once and no dedup is needed.
See also the as-of join (entry_queries.q60): union + window
last(ignorenulls) — zero inflation when the semantic is
"latest at-or-before" rather than "all in interval".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketed_interval_join(
    events: DataFrame,
    windows: DataFrame,
    keys,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_secs: int = 3600,
) -> DataFrame:
    """Rows of ``events`` matched to ``windows`` with
    ``start_ts <= ts < end_ts`` on equal ``keys`` — via a bucket equi-join,
    never a nested-loop theta join. Inner-match semantics only: an outer
    variant would need the range predicate inside the join condition (the
    post-join filter here would silently drop unmatched outer rows);
    outer-count use cases left-join the AGGREGATED result back instead."""
    keys = list(keys)
    # collision-safe bucket column: a caller-owned `_b` (or whatever we
    # pick) must never be silently overwritten then dropped.
    taken = set(events.columns) | set(windows.columns)
    bucket = "_b"
    while bucket in taken:
        bucket = "_" + bucket
    ev_epoch = F.unix_timestamp(F.col(ts_col))
    w = windows.withColumn(
        bucket,
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_secs),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_secs),
            )
        ),
    )
    e = events.withColumn(bucket, F.floor(ev_epoch / bucket_secs))
    joined = e.join(w, [*keys, bucket]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop(bucket)
