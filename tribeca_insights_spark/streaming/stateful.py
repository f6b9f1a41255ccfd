"""Custom stateful streaming operator — cross-batch first-seen dedup via
``applyInPandasWithState`` (task brief: "applyInPandasWithState for custom
stateful operators").

A crawl stream revisits urls (refetches, mirrors, replayed WARCs); exactly
one record per url should enter the extraction pipeline no matter how many
micro-batches apart the duplicates arrive. Built-in
``dropDuplicatesWithinWatermark`` bounds state by event time; this operator
is the unbounded-key variant with explicit per-key state (a seen flag),
the template for richer custom state (per-domain rate stats, incremental
TF, crawl frontier).

Emission semantics (append-mode constraint): within one micro-batch the
emitted ``first_ts`` is the MIN ``warc_ts`` across the whole batch and
``n_batch_dups`` counts that batch's duplicates; across micro-batches the
FIRST-ARRIVING batch wins — an append sink cannot retract an emitted row,
so later batches only mark state and emit nothing. Callers needing a
global min across batches should aggregate downstream of the sink.

State sizing at 10^12 urls: group key IS the url, so state lives in the
state store partitioned by ``spark.sql.shuffle.partitions`` — size that to
the key cardinality, or key by ``xxhash64(url)`` to keep keys fixed-width.
For OPEN-ENDED streams, unbounded per-url state eventually exhausts the
store; ``dedup_first_seen(ttl_ms=...)`` bounds it with a processing-time
timeout — semantics weaken from exactly-once-per-url to at-least-once-per-
TTL-window (a url re-arriving after its state expired is emitted again,
exactly like a cache miss). Pick the TTL at the crawl-revisit horizon.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "url string, first_ts timestamp, n_batch_dups long"
STATE_SCHEMA = "seen long"


def _first_seen(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState,
    ttl_ms: Optional[int] = None,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # TTL expiry callback: drop the seen flag; the next arrival of this
        # url re-emits (documented at-least-once-per-TTL semantics)
        state.remove()
        return
    n = 0
    first = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # a group's micro-batch may arrive as several Arrow chunks — take
        # the min across ALL of them, not the head of the first
        m = pdf["warc_ts"].min()
        if first is None or m < first:
            first = m
        n += len(pdf)
    if n == 0:
        return
    if state.exists:  # url already emitted in an earlier micro-batch
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # refresh TTL on re-arrival
        return
    state.update((1,))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame(
        {
            "url": [key[0]],
            "first_ts": [first],
            "n_batch_dups": [n - 1],
        }
    )


def dedup_first_seen(stream: DataFrame,
                     ttl_ms: Optional[int] = None) -> DataFrame:
    """Streaming (url, warc_ts, …) → one row per url, first occurrence
    wins across micro-batches; per-url state persists in the checkpoint.

    ``ttl_ms``: optional processing-time state TTL. Default (None) keeps
    state forever — exact first-seen, state grows with distinct urls; with
    a TTL, state for a url is evicted ``ttl_ms`` after its last arrival and
    a later re-arrival is emitted again (at-least-once per TTL window) —
    the bounded-state mode an open-ended crawl stream needs."""
    return (
        stream.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            partial(_first_seen, ttl_ms=ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if ttl_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
