"""Bigram-LM scoring + mixture sampling operators."""

import math

from pyspark.sql import functions as F

from tribeca_insights_spark.operators.lm import bigram_lm_score
from tribeca_insights_spark.operators.mixing import (
    MICROS,
    hash_bucket_micros,
    mixture_sample,
)


def _lm(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    return {
        r["doc_id"]: r
        for r in bigram_lm_score(df, F.col("lang") == "en").collect()
    }


def test_bigram_lm_closed_form(spark):
    # target LM: unigrams a:2 b:2 (V=2); bigrams (a,b):2, (b,a):1
    out = _lm(
        spark,
        [
            (1, "a b a b", "en"),
            (2, "a b", "xx"),       # in-vocab doc
            (3, "z q", "xx"),       # fully OOV doc
            (4, "solo", "xx"),      # <2 tokens -> no row
        ],
    )
    assert 4 not in out
    assert out[2]["n_bigrams"] == 1
    assert out[2]["lm_logprob_micros"] == math.floor(
        1e6 * (math.log(2 + 1) - math.log(2 + 2))  # (c12+1)/(c1+V) = 3/4
    )
    assert out[3]["lm_logprob_micros"] == math.floor(
        1e6 * (math.log(1) - math.log(0 + 2))  # OOV -> 1/V = 1/2
    )
    # target doc scores itself: 3 bigrams, each in-LM
    assert out[1]["n_bigrams"] == 3
    # in-target text must outscore OOV text per bigram
    assert (
        out[2]["lm_logprob_micros"]
        > out[3]["lm_logprob_micros"]
    )


def test_mixture_sample_rates_and_weights(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", "t") for i in range(200)],
        ["doc_id", "source", "text"],
    )
    rates = spark.createDataFrame(
        [("s0", MICROS), ("s1", 0)], ["source", "rate_micros"]
    )
    got = mixture_sample(docs, rates).collect()
    # rate=1e6 keeps every s0 doc, rate=0 keeps no s1 doc
    assert {r["source"] for r in got} == {"s0"}
    assert len(got) == 100
    assert all(r["sample_weight"] == 1.0 for r in got)

    half = spark.createDataFrame(
        [("s0", MICROS // 2), ("s1", MICROS // 2)],
        ["source", "rate_micros"],
    )
    a = sorted(r["doc_id"] for r in mixture_sample(docs, half).collect())
    b = sorted(r["doc_id"] for r in mixture_sample(docs, half).collect())
    assert a == b  # membership is a pure function of (key, rate)
    assert 0 < len(a) < 200
    w = mixture_sample(docs, half).collect()[0]["sample_weight"]
    assert w == MICROS / (MICROS // 2)


def test_hash_bucket_uniform_range(spark):
    buckets = (
        spark.range(2000)
        .select(hash_bucket_micros(F.col("id")).alias("b"))
        .agg(F.min("b"), F.max("b"), F.count("*"))
        .collect()[0]
    )
    assert 0 <= buckets[0] and buckets[1] < MICROS
    # crude uniformity: extremes of a 2000-draw uniform sample land wide
    assert buckets[0] < MICROS * 0.01 and buckets[1] > MICROS * 0.99


# --- stratified exact-k sample ------------------------------------------------


def test_stratified_topk_exact_counts_and_determinism(spark):
    from pyspark.sql import Row

    from tribeca_insights_spark.operators.mixing import (
        stratified_topk_sample,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 else "de") for i in range(40)]
    )
    out = stratified_topk_sample(df, k=3).collect()
    from collections import Counter

    sizes = Counter(r.lang for r in out)
    assert sizes == {"en": 3, "de": 3}
    # deterministic: a rerun picks the identical ids in identical order
    again = stratified_topk_sample(df, k=3).collect()
    key = lambda rows: sorted((r.lang, r.sample_rank, r.doc_id)
                              for r in rows)
    assert key(out) == key(again)
    # small strata yield fewer than k, never padding
    tiny = spark.createDataFrame([Row(doc_id=1, lang="xx")])
    assert stratified_topk_sample(tiny, k=5).count() == 1


def test_split_assign_deterministic_partition(spark):
    from pyspark.sql import Row

    from tribeca_insights_spark.operators.mixing import split_assign

    df = spark.createDataFrame([Row(doc_id=i) for i in range(2000)])
    out = split_assign(df, train_micros=800_000, val_micros=100_000)
    rows = {r.doc_id: r.split for r in out.collect()}
    # exact partition of the corpus, no gaps/overlaps
    assert len(rows) == 2000
    from collections import Counter

    c = Counter(rows.values())
    assert set(c) == {"train", "val", "test"}
    # fractions land near the cuts (md5 is uniform; 2000 keys, wide slack)
    assert 0.75 < c["train"] / 2000 < 0.85
    # membership survives re-sharding: same assignment from a reshuffled df
    again = {r.doc_id: r.split
             for r in split_assign(df.repartition(7),
                                   train_micros=800_000,
                                   val_micros=100_000).collect()}
    assert again == rows
    # salting decorrelates: a different salt moves some docs across splits
    other = {r.doc_id: r.split
             for r in split_assign(df, salt="other", train_micros=800_000,
                                   val_micros=100_000).collect()}
    assert other != rows
