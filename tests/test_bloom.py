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
