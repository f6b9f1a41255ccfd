"""Round-4 wave: char entropy (q159), URL path templates (q160),
cross-host mirrors (q161)."""

import math

from pyspark.sql import Row

from tribeca_insights_spark.functions.urlnorm import url_path_templates
from tribeca_insights_spark.operators.dedup import mirror_hosts
from tribeca_insights_spark.operators.textstats import char_entropy


def _ent(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return char_entropy(df).collect()[0]


def test_entropy_closed_form(spark):
    # 'aabb': n=4, S = 2·floor(1e6·2·ln2); H = ln4 − S/4e6 = ln2
    r = _ent(spark, "aabb")
    s = 2 * math.floor(1e6 * 2 * math.log(2))
    assert r["entropy_micros"] == math.floor(1e6 * math.log(4) - s / 4)
    assert (r["n_chars"], r["n_distinct_chars"]) == (4, 2)


def test_entropy_uniform_and_degenerate(spark):
    assert _ent(spark, "abcd")["entropy_micros"] == math.floor(
        1e6 * math.log(4)
    )
    assert _ent(spark, "aaaa")["entropy_micros"] == 0
    r = _ent(spark, "")
    assert r["entropy_micros"] is None and r["n_chars"] == 0


def test_entropy_flags_base64_blob_vs_prose(spark):
    prose = "the quick brown fox jumps over the lazy dog again and again"
    blob = "QWxhZGRpbjpvcGVuIHNlc2FtZUFsYWRkaW46b3BlbiBzZXNhbWVYyZk19"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=prose), Row(doc_id=2, text=blob)]
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    # prose has heavy space/'e' mass → lower entropy than the blob
    assert out[2]["entropy_micros"] > out[1]["entropy_micros"]


def test_url_templates_masking_and_host(spark):
    df = spark.createDataFrame(
        [
            Row(url="https://a.com/blog/123/page/4"),
            Row(url="https://a.com/blog/9/page/77"),
            Row(url="https://a.com/about"),
            Row(url="http://b.net/item/5?session=99"),
        ]
    )
    out = {
        (r["host"], r["path_template"]): r
        for r in url_path_templates(df).collect()
    }
    blog = out[("a.com", "/blog/{n}/page/{n}")]
    assert blog["n_urls"] == 2
    # sample is the lexicographic min — deterministic
    assert blog["sample_url"] == "https://a.com/blog/123/page/4"
    assert out[("a.com", "/about")]["n_urls"] == 1
    # query string is NOT part of the path template
    assert ("b.net", "/item/{n}") in out


def test_mirror_hosts_detects_and_sorts(spark):
    df = spark.createDataFrame(
        [
            Row(host="b.com", text="shared"),
            Row(host="a.com", text="shared"),
            Row(host="a.com", text="shared"),  # same-host repeat
            Row(host="a.com", text="unique"),
        ]
    )
    out = mirror_hosts(df).collect()
    assert len(out) == 1  # 'unique' is single-host → filtered
    r = out[0]
    assert (r["n_hosts"], r["n_pages"]) == (2, 3)
    assert r["hosts"] == "a.com,b.com"  # lexicographically sorted
