"""Round-4 wave: gzipped sitemap ingestion (q334)."""

import gzip

from pyspark.sql import Row

from tribeca_insights_spark.sources.sitemap import gunzip_text, sitemap_locs


def _locs(spark, blob):
    df = spark.createDataFrame(
        [Row(doc_id=1, raw=blob)], "doc_id bigint, raw binary"
    )
    sm = df.select("doc_id", gunzip_text("raw").alias("sitemap_xml"))
    return [r["url"] for r in sitemap_locs(sm, keep_cols=("doc_id",))
            .orderBy("url").collect()]


def test_gzipped_sitemap_decodes(spark):
    xml = ("<urlset><url><loc>https://a/1</loc></url>"
           "<url><loc>https://a/2</loc></url></urlset>")
    assert _locs(spark, gzip.compress(xml.encode())) == [
        "https://a/1", "https://a/2"]


def test_plain_xml_passthrough(spark):
    xml = b"<urlset><url><loc>https://p/x</loc></url></urlset>"
    assert _locs(spark, xml) == ["https://p/x"]


def test_corrupt_gzip_null(spark):
    assert _locs(spark, b"\x1f\x8b\x00garbage") == []


def test_null_blob(spark):
    assert _locs(spark, None) == []


def test_non_utf8_payload_null(spark):
    assert _locs(spark, gzip.compress(b"\xff\xfe\x00bad")) == []
