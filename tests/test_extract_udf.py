"""Golden-fixture parity: the distributed pipeline must reproduce the
single-process oracle byte-for-byte on every page (BASELINE.json north_rule:
byte-identical extracted text per url; identical TF vectors; identical SEO
fields)."""

import pytest

from tribeca_insights_spark.fixtures import corpus_df, gen_corpus, golden_records
from tribeca_insights_spark.operators.extract import page_data

N = 300
SEED = 42


@pytest.fixture(scope="module")
def golden():
    rows = gen_corpus(N, SEED)
    return {g["url"]: g for g in golden_records(rows)}


@pytest.fixture(scope="module")
def spark_pages(spark):
    docs = corpus_df(spark, N, SEED, partitions=8)
    return {r["url"]: r.asDict(recursive=True) for r in page_data(docs).collect()}


def test_same_urls(golden, spark_pages):
    assert set(golden) == set(spark_pages)
    assert len(golden) == N  # no url collisions in the corpus


def test_byte_identical_text_and_hash(golden, spark_pages):
    mismatches = [
        u
        for u in golden
        if spark_pages[u]["page_hash"] != golden[u]["page_hash"]
    ]
    assert mismatches == []
    # page_hash == sha256(text) already implies byte-identity, but check the
    # strings directly too (hash could agree on both being wrong)
    for u, g in golden.items():
        assert spark_pages[u]["text"] == g["text"], u


def test_identical_seo_fields(golden, spark_pages):
    for u, g in golden.items():
        s = spark_pages[u]
        assert s["title"] == g["title"], u
        assert s["meta_description"] == g["meta_description"], u
        assert s["headings"] == g["headings"], u
        assert s["images"] == g["images"], u
        assert s["external_links"] == g["external_links"], u
        assert s["internal_links"] == g["internal_links"], u
        assert s["slug"] == g["slug"], u


def test_identical_tf_vectors(golden, spark_pages):
    for u, g in golden.items():
        s = spark_pages[u]
        assert s["word_count"] == g["word_count"], u
        assert s["word_frequency"] == g["word_frequency"], u
