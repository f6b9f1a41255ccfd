"""Round-4 wave 7 curation gates: word blocklist (C4/LDNOOBW discipline),
soft-404 detection, mojibake repair."""

from pyspark.sql import Row

from tribeca_insights_spark.functions.normalize import (
    MOJIBAKE_MAP,
    with_repaired_text,
)
from tribeca_insights_spark.operators.blocklist import SPAM_WORDS, badword_stats
from tribeca_insights_spark.operators.textstats import soft404_flags


# --- badword_stats ----------------------------------------------------------


def test_badwords_counts_and_flag(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="clean text about tables and rows"),
            Row(doc_id=2, text="win the casino jackpot now casino"),
            Row(doc_id=3, text="CASINO uppercase is still caught"),
        ]
    )
    out = {r["doc_id"]: r for r in badword_stats(df).collect()}
    assert not out[1]["blocked"] and out[1]["n_bad"] == 0
    assert out[2]["blocked"] and out[2]["n_bad"] == 3  # casino x2 + jackpot
    assert out[2]["n_tokens"] == 6
    assert out[2]["bad_per_mtoken"] == 3 * 1_000_000 // 6
    assert out[3]["blocked"] and out[3]["n_bad"] == 1  # lowercased before match


def test_badwords_custom_list_and_substring_safety(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="scunthorpe classic casinos word")]
    )
    # token-level match: 'casinos' is NOT 'casino', substrings never fire
    r = badword_stats(df).collect()[0]
    assert not r["blocked"]
    r2 = badword_stats(df, words=("casinos",)).collect()[0]
    assert r2["blocked"] and r2["n_bad"] == 1


def test_spam_words_constant_is_lowercase():
    assert all(w == w.lower() for w in SPAM_WORDS)


# --- soft404_flags ----------------------------------------------------------


def test_soft404_title_hit_always_flags(spark):
    long_body = " ".join(["word"] * 100)
    df = spark.createDataFrame(
        [Row(doc_id=1, title="404 Not Found - Acme", text=long_body)]
    )
    r = soft404_flags(df).collect()[0]
    assert r["title_404"] and not r["thin_content"] and r["soft404"]


def test_soft404_body_mention_on_long_page_survives(spark):
    # prose that merely MENTIONS an error phrase on a long page is kept
    long_body = "the error 404 page is a classic " + " ".join(["w"] * 100)
    df = spark.createDataFrame([Row(doc_id=1, title="Blog", text=long_body)])
    r = soft404_flags(df).collect()[0]
    assert r["body_404"] and not r["thin_content"] and not r["soft404"]


def test_soft404_thin_error_body_flags(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, title="Acme", text="sorry page not found")]
    )
    r = soft404_flags(df).collect()[0]
    assert r["body_404"] and r["thin_content"] and r["soft404"]


def test_soft404_null_title(spark):
    df = spark.createDataFrame(
        [(1, None, "regular page content here")],
        "doc_id long, title string, text string",
    )
    r = soft404_flags(df).collect()[0]
    assert not r["title_404"] and r["thin_content"] and not r["soft404"]


# --- mojibake repair --------------------------------------------------------


def test_mojibake_repairs_known_digraphs(spark):
    broken = "CafÃ© crÃ¨me"  # CafÃ© crÃ¨me
    df = spark.createDataFrame([Row(doc_id=1, text=broken)])
    r = with_repaired_text(df).collect()[0]
    assert r["repaired_text"] == "Café crème"
    assert r["n_repairs"] == 2


def test_mojibake_trigraph_wins_over_digraph(spark):
    # â€” (em dash mojibake) must repair as ONE trigraph, not fire the
    # bare Ã¢ digraph first (map order: trigraphs first)
    broken = "a â€” b"
    df = spark.createDataFrame([Row(doc_id=1, text=broken)])
    r = with_repaired_text(df).collect()[0]
    assert r["repaired_text"] == "a — b"
    assert r["n_repairs"] == 1


def test_mojibake_clean_text_untouched(spark):
    clean = "already clean café — naïve"
    df = spark.createDataFrame([Row(doc_id=1, text=clean)])
    r = with_repaired_text(df).collect()[0]
    assert r["repaired_text"] == clean
    assert r["n_repairs"] == 0


def test_mojibake_map_shrinks_and_is_prefix_safe():
    # every entry shrinks (the n_repairs arithmetic depends on it) and no
    # later LHS is a prefix of an earlier entry
    for bad, good in MOJIBAKE_MAP:
        assert len(bad) > len(good) or (len(bad) == len(good) == 1)
        assert len(bad) - len(good) >= 1
    # trigraphs strictly before any digraph that prefixes them
    order = [b for b, _ in MOJIBAKE_MAP]
    for i, b in enumerate(order):
        for j, b2 in enumerate(order):
            if j > i:
                assert not b.startswith(b2) or b == b2, (b, b2)
