"""WARC source connector (sources/warc.py)."""

from tribeca_insights_spark.sources.warc import make_warc, parse_warc


PAGES = [
    ("https://a.com/1", "<html><head><title>One</title></head>"
     "<body><p>first page body</p></body></html>", "utf-8"),
    ("https://b.com/2", "<html><body><p>ação coração</p></body></html>",
     "iso-8859-1"),
    ("https://c.com/3", "<html><head><meta charset='utf-8'></head>"
     "<body><p>third</p></body></html>", "utf-8"),
]


def test_parse_roundtrip_plain():
    recs = parse_warc(make_warc(PAGES))
    assert [r["url"] for r in recs] == [u for u, _, _ in PAGES]
    assert all(r["warc_ts"] is not None for r in recs)
    assert b"first page body" in recs[0]["html"]
    # latin-1 payload bytes carried raw; charset reported from HTTP header
    assert recs[1]["charset"] == "iso-8859-1"
    assert "ação".encode("iso-8859-1") in recs[1]["html"]


def test_parse_roundtrip_gzip():
    recs = parse_warc(make_warc(PAGES, gzip_file=True))
    assert len(recs) == 3


def test_parse_garbage():
    assert parse_warc(b"") == []
    assert parse_warc(b"\x1f\x8bnot really gzip") == []
    assert parse_warc(b"random bytes with no warc marker") == []


def test_read_warc_to_docs(spark, tmp_path):
    from pyspark.sql import functions as F

    from tribeca_insights_spark.operators.extract import extract_pages
    from tribeca_insights_spark.sources.warc import read_warc

    (tmp_path / "a.warc").write_bytes(make_warc(PAGES[:2]))
    (tmp_path / "b.warc.gz").write_bytes(make_warc(PAGES[2:], gzip_file=True))

    docs = read_warc(spark, str(tmp_path) + "/*.warc*", default_lang="en")
    rows = {r["url"]: r for r in docs.collect()}
    assert set(rows) == {u for u, _, _ in PAGES}
    # end-to-end: WARC → docs → extraction pipeline
    ex = {r["url"]: r for r in extract_pages(docs).collect()}
    assert ex["https://a.com/1"]["title"] == "One"
    assert ex["https://a.com/1"]["text"] == "One first page body"
    # declared iso-8859-1 payload transcoded to utf-8 at ingestion:
    # accents survive the engine's utf-8 decode
    assert ex["https://b.com/2"]["text"] == "ação coração"


def test_read_wet_to_docs(spark, tmp_path):
    from tribeca_insights_spark.functions.tokenize import with_tokens
    from tribeca_insights_spark.sources.warc import make_wet, read_wet

    pages = [
        ("https://a.com/1", "pre extracted text one two two"),
        ("https://b.com/2", "another converted document body"),
    ]
    (tmp_path / "x.wet.gz").write_bytes(make_wet(pages, gzip_file=True))
    docs = read_wet(spark, str(tmp_path) + "/*.wet.gz", default_lang="en")
    rows = {r["url"]: r for r in docs.collect()}
    assert rows["https://a.com/1"]["text"] == pages[0][1]
    assert rows["https://a.com/1"]["html"] == bytearray(b"")
    # text feeds the token/TF layer directly, no extraction pass
    toks = {r["url"]: r["tokens"] for r in with_tokens(docs).select("url", "tokens").collect()}
    assert toks["https://a.com/1"] == ["pre", "extracted", "text", "one", "two", "two"]
