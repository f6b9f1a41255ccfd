"""Prose-vs-code routing signals and the one-row release datasheet."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.textstats import (
    code_detect_signals,
    release_datasheet,
)

CODE = (
    "def compute_fn(x):\n"
    "    total_1 = x + 42;\n"
    "    arr_y = [1, 2, 3];\n"
    "    return myValue + total_1;"
)
PROSE = "the quiet afternoon settled over the town like a familiar blanket"


def test_code_detect_separates_code_from_prose(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=CODE), Row(doc_id=2, text=PROSE)]
    )
    out = {r["doc_id"]: r for r in code_detect_signals(df).collect()}
    assert out[1]["looks_like_code"]
    assert not out[2]["looks_like_code"]
    assert out[1]["symbol_density_micros"] > out[2]["symbol_density_micros"]
    assert out[1]["indent_line_micros"] == 3 * 1_000_000 // 4
    assert out[2]["indent_line_micros"] == 0


def test_code_detect_closed_form_densities(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a=1;")])
    r = code_detect_signals(df).collect()[0]
    # symbols: '=' and ';' of 4 chars; digits: '1' of 4
    assert r["symbol_density_micros"] == 2 * 1_000_000 // 4
    assert r["digit_micros"] == 1 * 1_000_000 // 4


def test_release_datasheet_closed_form(spark):
    rows = [
        Row(doc_id=1, text="a b c", lang="en", source="s1"),
        Row(doc_id=2, text="a b c", lang="en-gb", source="s1"),  # dup text
        Row(doc_id=3, text="d e", lang="pt-br", source="s2"),
    ]
    r = release_datasheet(spark.createDataFrame(rows)).collect()[0]
    assert r["n_docs"] == 3
    assert r["n_tokens"] == 8
    assert r["n_sources"] == 2
    assert r["n_langs"] == 2  # en, pt (primary subtags; en-gb folds)
    assert r["exact_dup_micros"] == 1 * 1_000_000 // 3
    chars = len("a b c") * 2 + len("d e")
    assert r["mean_len_micros"] == chars * 1_000_000 // 3
    # raw HLL (no small-range correction, stated in hll_estimate's doc)
    # floors near alpha*m ~ 45 when n << m=64 — the estimate is the raw
    # formula's exact value, pinned loosely here and exactly by q207
    assert 5_000_000 < r["vocab_estimate_micros"] < 64_000_000
