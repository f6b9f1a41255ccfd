"""Round-4 wave: domain cap (q355) and image-text pairs (q356)."""

from pyspark.sql import Row

from tribeca_insights_spark.entry_queries import (
    q355_domain_cap,
    q356_image_text_pairs,
)


def test_domain_cap_big_capped_small_whole(spark):
    rows = {r["registrable"]: r.asDict()
            for r in q355_domain_cap(spark, "/root/testdata/sf0.001")
            .collect()}
    big = rows["big.example.com"]
    assert big["n_kept"] == 25 and big["n_capped"] == big["n_docs"] - 25
    # every domain keeps exactly min(25, n_docs); at sf0.001 the small
    # domains hold 50 docs each, so they hit the cap too
    for r in rows.values():
        assert r["n_kept"] == min(25, r["n_docs"])
        assert r["n_capped"] == r["n_docs"] - r["n_kept"]


def test_image_pairs_channels(spark):
    got = q356_image_text_pairs(spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r.asDict() for r in got.limit(400).collect()}
    # doc 0: og channel wins over its inline decoy
    assert rows[0]["channel"] == "og"
    assert rows[0]["caption"] == "OG caption 0"
    # doc 1: twitter image captioned by the title
    assert rows[1]["channel"] == "twitter"
    assert rows[1]["caption"] == "Doc title 1"
    # doc 2: first NON-empty-alt inline image
    assert rows[2]["channel"] == "img_alt"
    assert rows[2]["image_url"].startswith("/img/inline2")
    # doc 3 stratum emits nothing
    assert 3 not in rows
