"""Round-4 wave: split leakage (q162), winnowing fingerprints (q163),
host dup rate (q164)."""

import hashlib

from pyspark.sql import Row

from tribeca_insights_spark.operators.dedup import (
    host_dup_rate,
    split_leakage,
)
from tribeca_insights_spark.operators.textstats import (
    winnowing_fingerprints,
)


def test_split_leakage_flags_copy_and_counts(spark):
    t13 = "a b c d e f g h i j k l m"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, split="train", tokens_str=t13 + " n o"),
            # test doc sharing a 13-gram window with doc 1
            Row(doc_id=2, split="test", tokens_str="z " + t13),
            # val doc = verbatim train copy → every gram leaks
            Row(doc_id=3, split="val", tokens_str=t13 + " n o"),
            # clean test doc (no shared 13-gram)
            Row(doc_id=4, split="test",
                tokens_str="q r s t u v w x y aa bb cc dd ee"),
            # too short for any 13-gram
            Row(doc_id=5, split="test", tokens_str="a b c"),
        ]
    )
    out = {r["doc_id"]: r for r in split_leakage(df, n=13).collect()}
    assert set(out) == {2, 3}
    assert out[2]["n_shared_grams"] == 1  # exactly the t13 window
    assert out[2]["n_train_docs"] == 1
    # doc 3 has 3 grams (15 tokens), all present in doc 1
    assert out[3]["n_shared_grams"] == 3
    assert out[3]["split"] == "val"


def test_split_leakage_train_train_dups_ignored(spark):
    t = "a b c d e f g h i j k l m"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, split="train", tokens_str=t),
            Row(doc_id=2, split="train", tokens_str=t),
        ]
    )
    assert split_leakage(df, n=13).count() == 0


def test_winnowing_matches_reference_implementation(spark):
    text = "the winnowing algorithm picks local minima of the stream"
    k, w = 8, 4
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    got = sorted(
        (r["pos"], r["fp"])
        for r in winnowing_fingerprints(df, k=k, w=w).collect()
    )
    hs = [
        int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(text) - k + 1)
    ]
    sel = set()
    for j in range(len(hs) - w + 1):
        win = hs[j:j + w]
        mn = min(win)
        o = max(i for i, h in enumerate(win) if h == mn)  # rightmost
        sel.add((j + 1 + o, mn))
    assert got == sorted(sel)
    # winnowing density guarantee: far fewer fingerprints than grams
    assert 0 < len(got) < len(hs)


def test_winnowing_guarantee_shared_substring_shares_fp(spark):
    # two docs sharing a substring of length >= k+w-1 = 11 must share
    # at least one fingerprint (the winnowing theorem)
    shared = "QWERTYUIOPA"  # 11 chars
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="xx" + shared + "yy"),
            Row(doc_id=2, text="aaaa" + shared + "bb"),
        ]
    )
    fps = winnowing_fingerprints(df, k=8, w=4).collect()
    s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert s1 & s2


def test_winnowing_short_doc_no_rows(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="short"), Row(doc_id=2, text="")]
    )
    assert winnowing_fingerprints(df, k=8, w=4).count() == 0


def test_host_dup_rate(spark):
    df = spark.createDataFrame(
        [
            Row(host="a", text="t1"),
            Row(host="a", text="t1"),
            Row(host="a", text="t2"),
            Row(host="b", text="u"),
        ]
    )
    out = {r["host"]: r for r in host_dup_rate(df).collect()}
    assert (out["a"]["n_pages"], out["a"]["n_unique_texts"]) == (3, 2)
    assert out["a"]["dup_rate_micros"] == 333333  # (3-2)·1e6 div 3
    assert out["b"]["dup_rate_micros"] == 0


def test_textrank_hub_word_ranks_first(spark):
    # q165 composition: a hub word adjacent to many distinct words must
    # out-rank the leaves under the integer PageRank recurrence
    from pyspark.sql import functions as F

    from tribeca_insights_spark.operators.linkgraph import pagerank_micros

    pairs = [("hub", w) for w in ("aa", "bb", "cc", "dd")] + [("aa", "bb")]
    e = spark.createDataFrame(pairs, ["src", "dst"])
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = {
        r["node"]: r["rank_micros"]
        for r in pagerank_micros(edges, n_iter=3).collect()
    }
    assert out["hub"] == max(out.values())
    assert out["hub"] > out["cc"]
