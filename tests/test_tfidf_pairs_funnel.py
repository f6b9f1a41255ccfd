"""Exact sparse tf-idf cosine pairs and the composed curation funnel."""

import math

from pyspark.sql import Row

from tribeca_insights_spark.operators.similarity import tfidf_cosine_pairs


def test_tfidf_pairs_exact_cosine(spark):
    # 4 docs; "rare" appears in docs 1,2 (df=2), "solo" in 3 only,
    # "common" in all 4 -> df cap (10% default) drops nothing here, so
    # raise corpus: use df_cap_ppm=600000 (60%) to keep rare terms and
    # drop "common" (df=4/4=100%)
    rows = [
        Row(doc_id=1, text="common rare alpha"),
        Row(doc_id=2, text="common rare beta"),
        Row(doc_id=3, text="common solo gamma"),
        Row(doc_id=4, text="common delta epsilon"),
    ]
    df = spark.createDataFrame(rows)
    out = tfidf_cosine_pairs(df, cos_threshold_micros=1,
                             df_cap_ppm=600_000).collect()
    pairs = {(r["a_id"], r["b_id"]): r for r in out}
    # only (1,2) share a surviving term ("rare", df=2, w=500)
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    w = 1000 // 2
    # each doc vector: rare=500 plus its unique term (df=1, w=1000)
    dot = w * w
    n2 = w * w + 1000 * 1000
    assert r["dot"] == dot
    expected = math.floor(dot * 1_000_000.0 /
                          (math.sqrt(n2) * math.sqrt(n2)))
    assert r["cos_micros"] == expected


def test_tfidf_pairs_threshold_filters(spark):
    rows = [
        Row(doc_id=1, text="x aaa"),
        Row(doc_id=2, text="x bbb"),
    ]
    df = spark.createDataFrame(rows)
    # x: df=2 (100%) -> dropped by any cap < 1e6; no shared terms left
    out = tfidf_cosine_pairs(df, cos_threshold_micros=1,
                             df_cap_ppm=900_000).collect()
    assert out == []


def test_curation_funnel_gate_precedence(spark):
    from tribeca_insights_spark.operators.textstats import curation_funnel

    good = " ".join(["solid"] * 60)  # 60 words, mwl 5 -> passes gates
    rows = [
        # soft404 wins even though it also contains a bad word
        Row(doc_id=1, source="s", text="error 404 not found casino"),
        # badwords wins over gopher (too short AND spammy)
        Row(doc_id=2, source="s", text="viagra deal"),
        # gopher: too short, clean
        Row(doc_id=3, source="s", text="just a few words"),
        # kept + duplicate pair (identical text, min id kept)
        Row(doc_id=4, source="s", text=good),
        Row(doc_id=5, source="s", text=good),
        # kept singleton
        Row(doc_id=6, source="s", text=" ".join(["other"] * 55)),
    ]
    df = spark.createDataFrame(rows)
    r = curation_funnel(df).collect()[0]
    assert r["n_docs"] == 6
    assert r["n_soft404"] == 1
    assert r["n_badwords"] == 1
    assert r["n_gopher"] == 1
    assert r["n_duplicate"] == 1
    assert r["n_kept"] == 2
    assert r["kept_micros"] == 2 * 1_000_000 // 6


def test_curation_funnel_dedup_only_among_survivors(spark):
    from tribeca_insights_spark.operators.textstats import curation_funnel

    junk = "viagra spam"  # identical junk docs must both count badwords,
    rows = [              # never 'duplicate'
        Row(doc_id=1, source="s", text=junk),
        Row(doc_id=2, source="s", text=junk),
    ]
    r = curation_funnel(spark.createDataFrame(rows)).collect()[0]
    assert r["n_badwords"] == 2 and r["n_duplicate"] == 0
