"""Line-level quality signals (RefinedWeb recipe) and declared-vs-detected
language audit."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.textstats import (
    lang_mismatch_audit,
    line_quality_signals,
)


def test_line_quality_closed_form(spark):
    text = "- bullet one\nshort\na much longer line that ends properly.\n* second bullet\n"
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    r = line_quality_signals(df).collect()[0]
    assert r["n_lines"] == 4
    assert r["bullet_line_micros"] == 2 * 1_000_000 // 4
    assert r["end_punct_line_micros"] == 1 * 1_000_000 // 4
    # "short" (5), "- bullet one" (12), "* second bullet" (15) are < 30
    assert r["short_line_micros"] == 3 * 1_000_000 // 4
    chars = sum(len(l) for l in text.split("\n") if l)
    assert r["mean_line_len_micros"] == chars * 1_000_000 // 4


def test_line_quality_blank_lines_skipped(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a.\n\n\nb!")])
    r = line_quality_signals(df).collect()[0]
    assert r["n_lines"] == 2
    assert r["end_punct_line_micros"] == 1_000_000


def test_lang_mismatch_counts(spark):
    rows = [
        # declared en, guessed en (markers) -> agree
        Row(doc_id=1, lang="en", source="a",
            text="the cat and the dog is this that with"),
        # declared pt-br, guessed pt (primary subtag normalize) -> agree
        Row(doc_id=2, lang="pt-br", source="a",
            text="que de não uma os das"),
        # declared en, guessed es -> mismatch
        Row(doc_id=3, lang="en", source="a",
            text="que la los las una una la"),
        # no markers -> abstain, excluded from the denominator
        Row(doc_id=4, lang="en", source="a", text="zzz qqq www"),
        # second group: clean
        Row(doc_id=5, lang="en", source="b", text="the and of is"),
    ]
    df = spark.createDataFrame(rows)
    out = {r["source"]: r for r in lang_mismatch_audit(df).collect()}
    a = out["a"]
    assert a["n_docs"] == 4 and a["n_guessed"] == 3 and a["n_mismatch"] == 1
    assert a["mismatch_micros"] == 1 * 1_000_000 // 3
    b = out["b"]
    assert b["n_mismatch"] == 0 and b["mismatch_micros"] == 0


def test_lang_mismatch_all_abstain_zero_division_guard(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, lang="en", source="x", text="qqq zzz")]
    )
    r = lang_mismatch_audit(df).collect()[0]
    assert r["n_guessed"] == 0 and r["mismatch_micros"] == 0
