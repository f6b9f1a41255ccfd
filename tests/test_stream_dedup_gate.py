"""Row-local MinHash bands + the streaming dedup gate."""

import tempfile
import uuid

from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.dedup import (
    char_shingles,
    lsh_bands,
    minhash_band_structs,
    minhash_signatures,
)
from tribeca_insights_spark.streaming.stream_extract import stream_dedup_gate

DOCS = [
    Row(doc_id=1, tok_str="the quick brown fox jumps over the lazy dog"),
    Row(doc_id=2, tok_str="the quick brown fox jumps over the lazy dog"),
    Row(doc_id=3, tok_str="completely different content goes here now ok"),
    Row(doc_id=4, tok_str="tiny"),           # shorter than k -> one gram
    Row(doc_id=5, tok_str=""),               # empty -> sentinel band
    Row(doc_id=6, tok_str=None),             # NULL -> sentinel band
]


def test_rowlocal_bands_equal_batch_path(spark):
    """minhash_band_structs must be bit-identical to
    lsh_bands(minhash_signatures(char_shingles(...))) for every doc
    that has grams — the identity that lets q211 reuse q106's oracle."""
    df = spark.createDataFrame(DOCS)
    rowlocal = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in df.select(
            "doc_id",
            F.explode(minhash_band_structs("tok_str")).alias("e"),
        )
        .select("doc_id", "e.band", "e.band_key")
        .filter(F.col("band") >= 0)
        .collect()
    }
    batch = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in lsh_bands(
            minhash_signatures(char_shingles(df, text_col="tok_str"))
        ).collect()
    }
    assert rowlocal == batch
    assert len({d for d, _, _ in rowlocal}) == 4  # docs 1-4 only


def test_empty_and_null_docs_get_sentinel(spark):
    df = spark.createDataFrame(DOCS).filter(F.col("doc_id").isin(5, 6))
    rows = (
        df.select(
            "doc_id",
            F.explode(minhash_band_structs("tok_str")).alias("e"),
        )
        .select("doc_id", "e.band", "e.band_key")
        .collect()
    )
    assert len(rows) == 2
    assert all(r["band"] == -1 and r["band_key"] is None for r in rows)


def test_gate_verdicts_including_empty_docs(spark):
    """Doc 2 duplicates indexed doc 1; docs 3-6 are clean — and the
    empty/NULL docs still emit verdict rows (sentinel never joins)."""
    df = spark.createDataFrame(DOCS)
    index = (
        df.filter(F.col("doc_id") == 1)
        .select(
            "doc_id",
            F.explode(minhash_band_structs("tok_str")).alias("e"),
        )
        .select("doc_id", "e.band", "e.band_key")
    )
    qname = "gate_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        df.filter(F.col("doc_id") > 1).write.parquet(f"{root}/src")
        stream = (
            spark.readStream.schema("doc_id bigint, tok_str string")
            .parquet(f"{root}/src")
        )
        qry = (
            stream_dedup_gate(stream, index)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert qry.awaitTermination(300)
        out = {r["doc_id"]: r for r in spark.table(qname).collect()}
    assert set(out) == {2, 3, 4, 5, 6}
    assert out[2]["is_dup"] and out[2]["matched_old_id"] == 1
    for v in (3, 4, 5, 6):
        assert not out[v]["is_dup"] and out[v]["matched_old_id"] is None
