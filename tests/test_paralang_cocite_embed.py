"""Round-4 wave: paragraph langs (q312), host co-citation (q313),
embedded-URL params (q314)."""

from pyspark.sql import Row

from tribeca_insights_spark.functions.urlnorm import embedded_url_params
from tribeca_insights_spark.operators.linkgraph import host_cocitation
from tribeca_insights_spark.operators.textstats import paragraph_langs


def _pl(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return paragraph_langs(df).collect()[0].asDict()


def test_mixed_doc_flagged(spark):
    r = _pl(spark, "the cat is this fine\n\nlos gatos las casas una")
    assert r["n_paragraphs"] == 2 and r["n_langs"] == 2
    # en/es tie (1 paragraph each) → code ascending
    assert r["dominant_lang"] == "en" and r["is_mixed"] == 1


def test_uniform_doc_not_mixed(spark):
    r = _pl(spark, "the first is\n\nthe second of\n\nthe third and")
    assert (r["n_langs"], r["dominant_lang"], r["n_dominant_paras"],
            r["is_mixed"]) == (1, "en", 3, 0)


def test_majority_dominates_tiebreak(spark):
    r = _pl(spark, "los las una\n\nlos gatos las\n\nthe cat is")
    assert r["dominant_lang"] == "es" and r["n_dominant_paras"] == 2


def test_no_marker_doc_is_none(spark):
    r = _pl(spark, "zzz qqq\n\nxylophone wug")
    assert (r["n_paragraphs"], r["n_langs"], r["dominant_lang"],
            r["n_dominant_paras"]) == (2, 0, "none", 0)


def _edges(spark, rows):
    return spark.createDataFrame(
        [Row(src_host=s, dst_host=d) for s, d in rows]
    )


def test_cocitation_jaccard(spark):
    e = _edges(
        spark,
        [("a", "x"), ("a", "y"), ("a", "z"),
         ("b", "x"), ("b", "y"),
         ("c", "q")],
    )
    got = {(r["host_a"], r["host_b"]): r for r in host_cocitation(e).collect()}
    assert list(got) == [("a", "b")]
    r = got[("a", "b")]
    # |A∩B|=2, |A∪B|=3+2-2=4 wait: 3+2-2=3 → floor(2e6/3)
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (2, 3, 2)
    assert r["jaccard_micros"] == 666666


def test_cocitation_duplicate_edges_collapse(spark):
    e = _edges(spark, [("a", "x"), ("a", "x"), ("b", "x")])
    r = host_cocitation(e).collect()[0]
    assert (r["n_shared"], r["n_a"], r["n_b"], r["jaccard_micros"]) == (
        1, 1, 1, 1000000
    )


def test_cocitation_max_fanout_drops_hubs(spark):
    # 'hub' cited by 3 hosts would emit 3 pairs; capped at 2 it is dropped
    e = _edges(
        spark,
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("a", "n"), ("b", "n")],
    )
    got = host_cocitation(e, max_fanout=2).collect()
    assert [(r["host_a"], r["host_b"], r["n_shared"]) for r in got] == [
        ("a", "b", 1)
    ]


def _emb(spark, url):
    df = spark.createDataFrame([Row(url=url)])
    return [r.asDict() for r in embedded_url_params(df).collect()]


def test_embedded_encoded_external(spark):
    got = _emb(
        spark,
        "https://a.com/r?next=https%3A%2F%2Fevil.org%2Fp&x=1",
    )
    assert len(got) == 1
    assert (got[0]["param"], got[0]["embedded_host"],
            got[0]["is_external"]) == ("next", "evil.org", 1)


def test_embedded_plain_internal(spark):
    got = _emb(spark, "https://b.com/login?return=https://b.com/home")
    assert (got[0]["embedded_host"], got[0]["is_external"]) == ("b.com", 0)


def test_embedded_none(spark):
    assert _emb(spark, "https://c.com/p?id=5&q=hello") == []
