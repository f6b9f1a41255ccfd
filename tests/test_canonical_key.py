"""Round-4 wave: canonical dedup-key pipeline (q354)."""

from pyspark.sql import Row

from tribeca_insights_spark.functions.normalize import canonical_dedup_key


def _keys(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    return [r["dedup_key"] for r in
            canonical_dedup_key(df).orderBy("doc_id").collect()]


def test_renderings_collapse(spark):
    ks = _keys(spark, [
        "﻿the café extrac-\ntion report",   # BOM + wrap
        "The  café  extraction report",          # decomposed + spaces
        "THE CAFÉ EXTRACTION REPORT",             # case-mapped
    ])
    assert len(set(ks)) == 1
    assert ks[0] == "the café extraction report"


def test_different_content_stays_different(spark):
    ks = _keys(spark, ["alpha doc", "beta doc"])
    assert len(set(ks)) == 2


def test_md5_matches_key(spark):
    import hashlib

    df = spark.createDataFrame([Row(doc_id=1, text="Some Text")])
    r = canonical_dedup_key(df).collect()[0]
    assert r["dedup_md5"] == hashlib.md5(
        r["dedup_key"].encode()).hexdigest()
