"""Round-4 wave: RAKE keywords (q172), packing efficiency (q173),
KWIC concordance (q174), MinHash-estimate vs exact Jaccard (q175)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.chunking import packing_efficiency
from tribeca_insights_spark.operators.dedup import (
    char_shingles,
    minhash_jaccard_eval,
)
from tribeca_insights_spark.operators.textstats import (
    kwic_concordance,
    rake_keywords,
)

STOPS = ["the", "of", "is"]


# --- rake_keywords ------------------------------------------------------------


def test_rake_degree_rewards_long_phrases(spark):
    # "deep learning model" is one 3-word phrase; "cat" a 1-word phrase.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="deep learning model of the cat"),
            Row(doc_id=2, text="deep learning is great"),
        ]
    )
    out = {r["word"]: r for r in rake_keywords(docs, STOPS).collect()}
    # deep: freq 2; deg = 3 (doc1 phrase) + 2 (doc2 "deep learning") = 5
    assert out["deep"]["freq"] == 2 and out["deep"]["deg"] == 5
    assert out["deep"]["rake_micros"] == 5_000_000 // 2
    # cat: solo phrase → deg == freq == 1 → score 1e6
    assert out["cat"]["rake_micros"] == 1_000_000
    # stopwords never appear as keywords
    assert "the" not in out and "of" not in out and "is" not in out


def test_rake_phrases_reset_across_documents(spark):
    # no cross-doc phrase: each doc's word is its own 1-phrase
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha"), Row(doc_id=2, text="beta")]
    )
    out = {r["word"]: r for r in rake_keywords(docs, STOPS).collect()}
    assert out["alpha"]["deg"] == 1 and out["beta"]["deg"] == 1


# --- packing_efficiency ---------------------------------------------------------


def test_packing_efficiency_closed_form(spark):
    # group g: docs of 3, 4, 5 tokens, ctx=4 → stream 12 tokens = 3 seqs,
    # fill 12/(3*4)=100%; doc2 (offset 3, len 4) spans seqs 0-1, doc3
    # (offset 7, len 5) spans 1-2 → 2 boundary docs
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="g", text="a b c"),
            Row(doc_id=2, source="g", text="d e f g"),
            Row(doc_id=3, source="g", text="h i j k l"),
            Row(doc_id=4, source="h", text="x"),
        ]
    )
    out = {r["source"]: r for r in
           packing_efficiency(docs, ctx=4).collect()}
    g = out["g"]
    assert (g["n_docs"], g["total_tokens"], g["n_seqs"]) == (3, 12, 3)
    assert g["fill_micros"] == 1_000_000
    assert g["n_boundary_docs"] == 2
    # group h: 1 token in a 4-token seq → 25% fill, no boundary
    assert out["h"]["fill_micros"] == 250_000
    assert out["h"]["n_boundary_docs"] == 0


# --- kwic_concordance -----------------------------------------------------------


def test_kwic_contexts_and_edges(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hit a b c hit d e f g hit")]
    )
    out = {r["pos"]: r for r in
           kwic_concordance(docs, probe="hit", ctx=3).collect()}
    assert set(out) == {0, 4, 9}
    assert out[0]["left_ctx"] == "" and out[0]["right_ctx"] == "a b c"
    assert out[4]["left_ctx"] == "a b c"
    assert out[4]["right_ctx"] == "d e f"
    assert out[9]["left_ctx"] == "e f g" and out[9]["right_ctx"] == ""


def test_kwic_no_hits_empty(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    assert kwic_concordance(docs, probe="zzz").count() == 0


# --- minhash_jaccard_eval --------------------------------------------------------


def test_minhash_eval_identical_docs_score_one(spark):
    t = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        [Row(doc_id=1, tok_str=t), Row(doc_id=2, tok_str=t),
         Row(doc_id=3, tok_str="completely different text body here ok")]
    )
    grams = char_shingles(docs, text_col="tok_str", k=12)
    rows = minhash_jaccard_eval(grams).collect()
    pairs = {(r["a_id"], r["b_id"]): r for r in rows}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["est_micros"] == 1_000_000
    assert pairs[(1, 2)]["exact_micros"] == 1_000_000
    # the unrelated doc never becomes a candidate
    assert all(3 not in k for k in pairs)


def test_minhash_eval_estimate_tracks_exact(spark):
    # two docs sharing a long prefix: est and exact both in (0, 1]
    a = "shared shingle prefix payload one two three four"
    docs = spark.createDataFrame(
        [Row(doc_id=1, tok_str=a + " tail alpha beta"),
         Row(doc_id=2, tok_str=a + " tail gamma delta")]
    )
    grams = char_shingles(docs, text_col="tok_str", k=12)
    rows = minhash_jaccard_eval(grams).collect()
    if rows:  # banding may or may not fire — if it does, sanity-check
        r = rows[0]
        assert 0 < r["exact_micros"] <= 1_000_000
        assert 0 <= r["est_micros"] <= 1_000_000
