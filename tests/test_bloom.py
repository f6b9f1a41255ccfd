"""Bloom pre-filter: no false negatives, bounded fpp, exact composition.

The operator's contract is that composing the Bloom pre-filter with the
exact verify join yields EXACTLY the non-filtered result — these tests
pin both halves: the filter admits every inserted key (bitwise
guarantee) and bloom_decontaminate == decontaminate row-for-row.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tribeca_insights_spark.operators.bloom import (
    bloom_decontaminate,
    bloom_params,
    build_bloom,
    might_contain_udf,
)
from tribeca_insights_spark.operators.dedup import decontaminate


def test_bloom_params_textbook():
    m, k = bloom_params(1000, 0.01)
    # textbook optimum: ~9.59 bits/key, k ~ 7 at 1% fpp
    assert 9 * 1000 <= m <= 11 * 1000
    assert 6 <= k <= 8
    assert m % 8 == 0


def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    keys = list(range(-500, 500))  # negative hashes exercise the
    # int64->uint64 view path
    kdf = spark.createDataFrame([(x,) for x in keys], "h long")
    m, k = bloom_params(len(keys), 0.01)
    bm = build_bloom(kdf, "h", m, k)

    probe_keys = keys + [10_000 + i for i in range(2000)]
    pdf = spark.createDataFrame([(x,) for x in probe_keys], "h long")
    mc = might_contain_udf(spark, bm, m, k)
    got = {r["h"]: r["ok"]
           for r in pdf.select("h", mc(F.col("h")).alias("ok")).collect()}

    # every inserted key MUST test positive
    assert all(got[x] for x in keys)
    # non-members: fpp target 1%, allow generous slack for 2000 probes
    fp = sum(1 for x in probe_keys if x >= 10_000 and got[x])
    assert fp / 2000 < 0.05


def test_bloom_build_is_distributed_or(spark):
    # same keys split across partitions must build the same bitmap as
    # one partition — the driver-side OR is associative/commutative
    kdf1 = spark.createDataFrame([(x,) for x in range(200)], "h long")
    m, k = bloom_params(200, 0.01)
    assert build_bloom(kdf1.repartition(8), "h", m, k) == \
        build_bloom(kdf1.coalesce(1), "h", m, k)


def test_bloom_decontaminate_matches_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat_ws(
            " ", F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("tokens_str"),
    )
    bench = docs.filter(F.col("doc_id") % 100 == 3)
    exact = {(r["corpus_id"], r["benchmark_id"]): r["n_shared"]
             for r in decontaminate(docs, bench, n=13).collect()}
    bloom = {(r["corpus_id"], r["benchmark_id"]): r["n_shared"]
             for r in bloom_decontaminate(docs, bench, n=13).collect()}
    assert exact == bloom
    assert len(exact) > 0  # leaked slice must at least flag itself


# ---------------------------------------------------------------------------
# Row-form bloom shard index (engine-exact data skipping)
# ---------------------------------------------------------------------------


def test_shard_prune_no_false_negatives(spark):
    """Every indexed key's true shard MUST appear in its prune set —
    the property that makes a bloom-built scan plan correct."""
    from pyspark.sql import Row, functions as F

    from tribeca_insights_spark.operators.bloom import (
        bloom_shard_index,
        bloom_shard_prune,
    )

    keys = spark.createDataFrame(
        [Row(shard=i % 4, key=f"k{i}") for i in range(200)]
    )
    idx = bloom_shard_index(keys, "key", "shard", m_bits=2048, k=5)
    probes = keys.select("key").distinct()
    hits = {
        (r["key"], r["shard"])
        for r in bloom_shard_prune(idx, probes, m_bits=2048, k=5).collect()
    }
    for i in range(200):
        assert (f"k{i}", i % 4) in hits


def test_shard_index_merges_by_bit_or(spark):
    """index(A ∪ B) == bit_or-merge(index(A), index(B)) — the property
    that makes the index incremental across runs."""
    from pyspark.sql import Row, functions as F

    from tribeca_insights_spark.operators.bloom import bloom_shard_index

    a = spark.createDataFrame([Row(shard=0, key=f"a{i}") for i in range(50)])
    b = spark.createDataFrame([Row(shard=0, key=f"b{i}") for i in range(50)])
    full = {
        (r["shard"], r["word_idx"], r["word"])
        for r in bloom_shard_index(
            a.unionByName(b), "key", "shard", m_bits=640, k=7
        ).collect()
    }
    merged = {
        (r["shard"], r["word_idx"], r["word"])
        for r in bloom_shard_index(a, "key", "shard", m_bits=640, k=7)
        .unionByName(bloom_shard_index(b, "key", "shard", m_bits=640, k=7))
        .groupBy("shard", "word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
        .collect()
    }
    assert full == merged


def test_shard_index_rejects_bad_m_bits(spark):
    import pytest
    from pyspark.sql import Row

    from tribeca_insights_spark.operators.bloom import bloom_shard_index

    keys = spark.createDataFrame([Row(shard=0, key="x")])
    with pytest.raises(ValueError, match="multiple of 32"):
        bloom_shard_index(keys, "key", "shard", m_bits=100)
