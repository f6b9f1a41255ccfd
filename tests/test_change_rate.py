"""Round-4 wave: change-rate recrawl scheduling (q328)."""

from pyspark.sql import Row

from tribeca_insights_spark.plans.snapshot import change_rate_schedule


def _caps(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, warc_ts=t, content_hash=h) for u, t, h in rows],
        "url string, warc_ts timestamp, content_hash string",
    )


def test_always_changing_page(spark):
    import datetime as dt

    rows = [
        ("u", dt.datetime(2026, 1, 1 + k), f"h{k}") for k in range(4)
    ]
    r = change_rate_schedule(_caps(spark, rows)).collect()[0]
    assert (r["n_captures"], r["n_changes"], r["span_s"]) == (4, 3, 259200)
    assert r["lambda_micros_per_day"] == 1_000_000   # 1 change/day
    assert r["revisit_days_micros"] == 750_000       # 3 days / 4


def test_static_page_backs_off(spark):
    import datetime as dt

    rows = [("u", dt.datetime(2026, 1, 1 + k), "same") for k in range(4)]
    r = change_rate_schedule(_caps(spark, rows)).collect()[0]
    assert r["n_changes"] == 0 and r["lambda_micros_per_day"] == 0
    assert r["revisit_days_micros"] == 3_000_000     # full observed span


def test_single_capture_zero_span(spark):
    import datetime as dt

    r = change_rate_schedule(
        _caps(spark, [("u", dt.datetime(2026, 1, 1), "h")])
    ).collect()[0]
    assert (r["span_s"], r["lambda_micros_per_day"],
            r["revisit_days_micros"]) == (0, 0, 0)


def test_out_of_order_ingest_same_result(spark):
    import datetime as dt

    rows = [
        ("u", dt.datetime(2026, 1, 3), "h1"),
        ("u", dt.datetime(2026, 1, 1), "h0"),
        ("u", dt.datetime(2026, 1, 2), "h0"),
    ]
    r = change_rate_schedule(_caps(spark, rows)).collect()[0]
    # ordered by ts: h0,h0,h1 → one change over 2 days
    assert (r["n_changes"], r["span_s"]) == (1, 172800)
