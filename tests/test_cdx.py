"""CDXJ capture-index source: parse, filter, dedup, seed (sources/cdx.py)."""

import os


def _lines():
    return [
        'org,example)/a 20260101120000 {"url": "https://example.org/a", '
        '"mime": "text/html", "status": "200", "digest": "sha1:AAA", '
        '"length": "100", "offset": "0", "filename": "c-0.warc.gz"}',
        # newer capture of /a, different digest
        'org,example)/a 20260102120000 {"url": "https://example.org/a", '
        '"mime": "text/html", "status": "200", "digest": "sha1:BBB", '
        '"length": "120", "offset": "4096", "filename": "c-1.warc.gz"}',
        # non-html capture — must be filtered before fetch
        'org,example)/b 20260101120000 {"url": "https://example.org/b", '
        '"mime": "application/pdf", "status": "200", "digest": "sha1:CCC", '
        '"length": "999", "offset": "8192", "filename": "c-0.warc.gz"}',
        # 404 capture — filtered
        'org,example)/c 20260101120000 {"url": "https://example.org/c", '
        '"mime": "text/html", "status": "404", "digest": "sha1:DDD", '
        '"length": "10", "offset": "100", "filename": "c-0.warc.gz"}',
        # valid capture of /d
        'org,example)/d 20260103000000 {"url": "https://example.org/d", '
        '"mime": "text/html", "status": "200", "digest": "sha1:EEE", '
        '"length": "50", "offset": "200", "filename": "c-2.warc.gz"}',
        "garbage line that matches nothing",
    ]


def test_cdxj_parse_and_seed(spark, tmp_path):
    from tribeca_insights_spark.sources.cdx import (
        html_captures,
        latest_per_url,
        parse_cdxj,
        read_cdxj_lines,
        seed_fetch_list,
    )

    p = os.path.join(tmp_path, "index.cdxj")
    with open(p, "w", encoding="utf-8") as f:
        f.write("\n".join(_lines()) + "\n")

    caps = parse_cdxj(read_cdxj_lines(spark, p))
    assert caps.count() == 5  # garbage line dropped by the regex filter
    row = caps.filter(caps.url == "https://example.org/b").first()
    assert row["mime"] == "application/pdf" and row["status"] == 200
    assert row["offset"] == 8192 and row["length"] == 999

    ok = html_captures(caps)
    assert sorted(r["url"] for r in ok.select("url").collect()) == [
        "https://example.org/a", "https://example.org/a",
        "https://example.org/d",
    ]
    latest = latest_per_url(ok)
    a = latest.filter(latest.url == "https://example.org/a").first()
    assert a["digest"] == "sha1:BBB" and a["filename"] == "c-1.warc.gz"

    done = spark.createDataFrame([("https://example.org/d",)], "url string")
    seed = seed_fetch_list(caps, done)
    rows = {r["url"]: r for r in seed.collect()}
    assert set(rows) == {"https://example.org/a"}
    assert rows["https://example.org/a"]["offset"] == 4096
