"""Structured Streaming surfaces: windowed TF, sessions, dedup gate.

Driver-contract queries (split from the monolithic entry_queries.py in r5);
each function is registered into the shared ``QUERIES``/``ORACLE`` dicts by
the ``@q`` decorator from ``_shared`` at import time.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


@q(
    "q65_streaming_extract",
    f"""
    SELECT 'https://' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) AS url,
           {_EXPECTED_TEXT} AS text,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           sha256({_EXPECTED_TEXT}) AS page_hash
    FROM documents
    """,
)
def q65_streaming_extract(spark, sf_dir):
    """Structured Streaming extraction, driver-checked: the synthesized
    pages flow through readStream → extraction UDF → checkpointed parquet
    sink under Trigger.AvailableNow (bounded drain; the same code runs
    unbounded), and the sink's contents must equal the batch extractor's
    closed-form output — streaming and batch share one extraction core."""
    import tempfile

    from ..streaming.stream_extract import stream_extract

    docs = documents_as_pages(spark, sf_dir)
    with tempfile.TemporaryDirectory() as root:
        docs.write.mode("overwrite").parquet(f"{root}/src")
        qry = stream_extract(spark, f"{root}/src", f"{root}/out",
                             f"{root}/ckpt", available_now=True)
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("streaming extraction drain exceeded 300s")
        out = spark.read.parquet(f"{root}/out").select(
            "url", "text", "title", "page_hash"
        )
        out = out.cache()
        out.count()  # materialize before the tempdir vanishes
        return out


@q(
    "q67_streaming_first_seen",
    """
    SELECT 'https://' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) AS url,
           CAST(1767225600 + doc_id % 3600 AS BIGINT) AS first_epoch,
           CAST(1 AS BIGINT) AS n_batch_dups
    FROM documents
    """,
)
def q67_streaming_first_seen(spark, sf_dir):
    """Custom stateful streaming operator, driver-checked
    (applyInPandasWithState first-seen dedup; pytest-only in round 1):
    every url is streamed TWICE with different timestamps (later one
    first in file order), drained under Trigger.AvailableNow into a
    checkpointed sink — exactly one row per url must come out, carrying
    the MIN warc_ts and the duplicate count."""
    import tempfile

    from ..streaming.stateful import dedup_first_seen
    from ..streaming.stream_extract import read_docs_stream

    d = _read(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
    )
    # timestamps built FROM the epoch literal the oracle states —
    # session-timezone independent (a to_timestamp string literal would
    # shift under a non-UTC harness session)
    early = F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id") % 3600)
    late = F.timestamp_seconds(
        F.lit(1767225600) + F.col("doc_id") % 3600 + 7200
    )

    def docs_with(ts):
        return d.select(
            url.alias("url"),
            ts.alias("warc_ts"),
            F.encode(F.lit("<html></html>"), "UTF-8").alias("html"),
            F.lit("").alias("text"),
            F.col("lang"),
        )

    with tempfile.TemporaryDirectory() as root:
        # late copy written first — arrival order within the batch must
        # not matter. coalesce(1): ONE source file ⇒ the file source
        # admits everything in a single micro-batch, which is the scope
        # of the operator's min/dup-count guarantee (see stateful.py —
        # across batches, first-arriving wins; append sinks can't retract)
        docs_with(late).unionByName(docs_with(early)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/src")
        stream = dedup_first_seen(read_docs_stream(spark, f"{root}/src"))
        qry = (
            stream.writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("stateful dedup drain exceeded 300s")
        out = spark.read.parquet(f"{root}/out").select(
            "url",
            F.unix_timestamp("first_ts").alias("first_epoch"),
            "n_batch_dups",
        )
        out = out.cache()
        out.count()  # materialize before the tempdir vanishes
        return out


@q(
    "q102_stream_windowed_tf",
    _TOKENS_CTE
    + """
    SELECT strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + (doc_id % 3) * INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           word, CAST(count(*) AS BIGINT) AS freq
    FROM words GROUP BY 1, 2
    """,
)
def q102_stream_windowed_tf(spark, sf_dir):
    """Watermarked event-time WINDOWED corpus TF, driver-checked
    (streaming/stream_extract.stream_windowed_doc_tf): documents arrive
    as a stream with warc_ts spread across three hours (doc_id % 3), a
    2-hour watermark bounds late data, and hourly tumbling windows
    aggregate token counts — the "watermarks + windowed aggs" streaming
    tier. Drained complete-mode to a memory sink under
    Trigger.AvailableNow so the bounded result is deterministic; the
    oracle computes the same per-window counts closed-form (window start
    = the synthesized hour, windows align to the hour grid). Window
    starts compared as formatted strings so timezone normalization
    cannot perturb the hash."""
    import uuid

    from ..streaming.stream_extract import stream_windowed_doc_tf

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "timestamp'2026-01-01 00:00:00'"
            " + (doc_id % 3) * INTERVAL 1 HOUR"
        ).alias("warc_ts"),
        "text",
        "lang",
    )
    import tempfile

    qname = "q102mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        d.write.mode("overwrite").parquet(f"{root}/src")
        agg = stream_windowed_doc_tf(spark, f"{root}/src")
        qry = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("windowed-TF drain exceeded 300s")
        out = spark.table(qname).cache()
        out.count()  # materialize before the tempdir vanishes
        return out


@q(
    "q103_stream_session_windows",
    """
    WITH d AS (SELECT doc_id, doc_id % 8 AS m FROM documents),
    s AS (SELECT 'h' || (m % 4) AS host,
                 CASE WHEN m < 4 THEN m ELSE 120 + m END AS off_min,
                 count(*) AS n_pages
          FROM d GROUP BY 1, 2)
    SELECT host,
           strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + off_min * INTERVAL 1 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + (off_min + 30) * INTERVAL 1 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(n_pages AS BIGINT) AS n_pages
    FROM s
    """,
)
def q103_stream_session_windows(spark, sf_dir):
    """Streaming SESSION windows per host (streaming/stream_extract
    .stream_session_windows): gap-based crawl-burst sessions — the third
    windowing mode after tumbling (q102) and the stateful first-seen map
    (q67). Fixture: each host gets two event-time clusters 124 minutes
    apart, far beyond the 30-minute gap, so every host closes exactly two
    sessions whose bounds and page counts are closed-form. Complete-mode
    AvailableNow drain to a memory sink; session bounds compared as
    formatted strings."""
    import tempfile
    import uuid

    from ..streaming.stream_extract import stream_session_windows

    d = _read(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (F.col("doc_id") % 4).cast("string")).alias(
            "host"
        ),
        F.expr(
            "timestamp'2026-01-01 00:00:00' + (CASE WHEN doc_id % 8 < 4"
            " THEN doc_id % 8 ELSE 120 + doc_id % 8 END)"
            " * INTERVAL 1 MINUTE"
        ).alias("warc_ts"),
    )
    qname = "q103mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        d.write.mode("overwrite").parquet(f"{root}/src")
        agg = stream_session_windows(spark, f"{root}/src")
        qry = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("session-window drain exceeded 300s")
        out = spark.table(qname).cache()
        out.count()
        return out


@q(
    "q120_stream_stream_join",
    """
    WITH d AS (SELECT doc_id, doc_id % 3 AS h FROM documents
               WHERE doc_id % 2 = 0)
    SELECT doc_id,
           strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + h * INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS fetch_ts,
           strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + h * INTERVAL 1 HOUR + 10 * INTERVAL 1 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS score_ts,
           CAST(10 AS BIGINT) AS lag_min,
           CAST(doc_id % 7 AS BIGINT) AS score
    FROM d
    """,
)
def q120_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream inner join (streaming/stream_extract
    .stream_stream_join), driver-checked: a fetch stream meets an
    asynchronous quality-score stream; the time-range predicate
    (score within 1 hour of the fetch) bounds join state AND the
    result. Fixture: even doc_ids are scored 10 minutes after fetch
    (inside the bound → join), odd ones 90 minutes after (outside →
    dropped by construction), so the joined set is closed-form.
    Append-mode AvailableNow drain to a memory sink."""
    import tempfile
    import uuid

    from ..streaming.stream_extract import stream_stream_join

    base = "timestamp'2026-01-01 00:00:00'"
    d = _read(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        F.expr(f"{base} + (doc_id % 3) * INTERVAL 1 HOUR").alias(
            "fetch_ts"
        ),
    )
    annots = d.select(
        "doc_id",
        F.expr(
            f"{base} + (doc_id % 3) * INTERVAL 1 HOUR"
            " + (CASE WHEN doc_id % 2 = 0 THEN 10 ELSE 90 END)"
            " * INTERVAL 1 MINUTE"
        ).alias("score_ts"),
        (F.col("doc_id") % 7).cast("long").alias("score"),
    )
    qname = "q120mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        pages.write.mode("overwrite").parquet(f"{root}/pages")
        annots.write.mode("overwrite").parquet(f"{root}/annots")
        j = stream_stream_join(
            spark, f"{root}/pages", f"{root}/annots", max_lag="1 hour"
        )
        qry = (
            j.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("stream-stream-join drain exceeded 300s")
        out = spark.table(qname).cache()
        out.count()
        return out


@q(
    "q211_stream_dedup_gate",
    _Q106_CTES
    + """
    , idx AS (SELECT doc_id, band, band_key FROM bands
              WHERE doc_id % 3 <> 0)
    , newb AS (SELECT doc_id, band, band_key FROM bands
               WHERE doc_id % 3 = 0)
    , hits AS (SELECT n.doc_id, min(i.doc_id) AS matched_old_id
               FROM newb n
               JOIN idx i ON i.band = n.band AND i.band_key = n.band_key
               GROUP BY n.doc_id)
    SELECT nd.doc_id,
           h.matched_old_id IS NOT NULL AS is_dup,
           h.matched_old_id
    FROM (SELECT DISTINCT doc_id FROM newb) nd
    LEFT JOIN hits h USING (doc_id)
    """,
)
def q211_stream_dedup_gate(spark, sf_dir):
    """q106's incremental dedup running AT INGEST (streaming/
    stream_extract.stream_dedup_gate): run 2's docs arrive as a
    Structured Streaming source and are verdict-ed against run 1's
    persisted band index by a stream-STATIC left equi-join + ONE
    streaming aggregation. Streamability comes from
    operators/dedup.minhash_band_structs -- the whole shingle->
    MinHash->band pipeline as one row-local expression (zero
    Exchange), bit-identical to the batch path (pinned in
    tests/test_stream_dedup_gate.py), so the oracle is EXACTLY q106's:
    same fixture, same band keys, same verdicts -- batch and streaming
    answers provably agree."""
    import tempfile
    import uuid

    from ..operators.dedup import minhash_band_structs
    from ..streaming.stream_extract import stream_dedup_gate

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang",
        F.when(F.col("doc_id") % 10 == 0, F.lit(_Q106_PAYLOAD))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # the sf parquet is ONE row group, so the scan is one task — and
    # minhash_band_structs is a heavy row-local expression that would
    # otherwise run serially in that task (38 s of the 67 s bench wall
    # at sf0.1). Spread rows first; every downstream agg is order-free.
    d = d.repartition(spark.sparkContext.defaultParallelism)
    t = with_tokens(d).select(
        "doc_id", F.concat_ws(" ", "tokens").alias("tok_str")
    )
    index = (
        t.filter(F.col("doc_id") % 3 != 0)
        .select(
            "doc_id",
            F.explode(minhash_band_structs("tok_str")).alias("_e"),
        )
        .select("doc_id", F.col("_e.band").alias("band"),
                F.col("_e.band_key").alias("band_key"))
    )
    qname = "q211mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        t.filter(F.col("doc_id") % 3 == 0).write.mode(
            "overwrite"
        ).parquet(f"{root}/src")
        index.write.mode("overwrite").parquet(f"{root}/idx")
        stream = (
            spark.readStream.schema("doc_id bigint, tok_str string")
            .parquet(f"{root}/src")
        )
        gate = stream_dedup_gate(
            stream, spark.read.parquet(f"{root}/idx")
        )
        qry = (
            gate.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("dedup-gate drain exceeded 300s")
        out = spark.table(qname).cache()
        out.count()
        return out


# --- wave: streaming sliding-log rate limiter (q248) -------------------------


@q(
    "q248_stream_rate_limit",
    """
    WITH e AS (
      SELECT event_id, user_id AS host,
             CAST(epoch_us(ts) AS BIGINT) AS tsu
      FROM events
    )
    SELECT event_id, host, tsu,
           CAST(count(*) OVER (
             PARTITION BY host ORDER BY tsu
             RANGE BETWEEN 599999999 PRECEDING AND 1 PRECEDING
           ) AS BIGINT) AS n_recent,
           count(*) OVER (
             PARTITION BY host ORDER BY tsu
             RANGE BETWEEN 599999999 PRECEDING AND 1 PRECEDING
           ) < 3 AS allowed
    FROM e
    """,
)
def q248_stream_rate_limit(spark, sf_dir):
    """Streaming per-host sliding-log rate limiter (streaming/
    stateful.py rate_limit_log, applyInPandasWithState): admit iff
    fewer than 3 same-host requests arrived in the trailing 600 s —
    the crawl-politeness admission gate AT INGEST, joining the
    stateful family (q67 first-seen, q211 dedup gate). The verdict is
    a pure function of the per-host event sequence, so the oracle is a
    batch RANGE window — stream and batch provably agree regardless of
    micro-batching (the q211 equivalence contract). State per host =
    the in-window arrival log, pruned every arrival. Fixture: events
    keyed by user_id, event-time epoch micros."""
    import tempfile
    import uuid

    from ..streaming.stateful import rate_limit_log

    src = _read(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("host"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
    )
    qname = "q248mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        src.write.mode("overwrite").parquet(f"{root}/src")
        stream = (
            spark.readStream.schema("event_id bigint, host bigint, tsu bigint")
            .parquet(f"{root}/src")
        )
        out = rate_limit_log(stream, window_us=600_000_000, capacity=3)
        qry = (
            out.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("rate-limit drain exceeded 300s")
        res = spark.table(qname).cache()
        res.count()
        return res
