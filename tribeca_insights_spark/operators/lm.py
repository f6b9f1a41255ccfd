"""Bigram language-model scoring for corpus quality filtering.

Beyond-reference capability (task brief): CCNet (Wenzek et al., 2020)
filters Common-Crawl text by the perplexity of a language model trained
on a trusted corpus — low-perplexity documents are kept as "head"
quality. This operator is the same recipe at bigram order: fit a
Laplace-smoothed bigram LM on a target slice of the corpus, then score
every document by its total log-probability. ``exp(-micros / 1e6 /
n_bigrams)`` of the output is the document perplexity.

Scale shape: the LM "model" is just two aggregated tables (bigram and
unigram counts of the target slice) that live in the dataflow — no
driver-side model object. Scoring is two equi-joins (on (w1,w2), then
w1) plus one groupBy(doc). Both count tables are corpus-vocabulary
bounded; at 100 TB they shuffle-join (AQE decides broadcast when the
target slice is small). No Python anywhere.

Determinism contract: per-bigram log-probabilities are quantized to
integer micros (floor(1e6 * ln p)) before the per-document sum, making
the score independent of aggregation order and exactly statable by a
DuckDB oracle (same trick as operators/dsir.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dsir import _words


def bigram_lm_score(docs: DataFrame, target_col,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document bigram-LM log-prob: (id, n_bigrams, lm_logprob_micros).

    ``target_col`` is a boolean Column selecting the training slice (the
    trusted corpus). Laplace +1 smoothing: P(w2|w1) = (c12+1)/(c1+V)
    with c1 the unigram count of w1 in the target and V the target's
    distinct-token vocabulary size; out-of-vocabulary bigrams naturally
    get 1/V through the coalesce(0) joins. Documents with fewer than two
    tokens produce no output row.
    """
    toks = docs.select(
        F.col(id_col), target_col.alias("_is_t"),
        _words(F.col(text_col)).alias("_l"),
    )
    uni = toks.select(
        id_col, "_is_t", F.explode("_l").alias("_w")
    )
    n = F.size("_l")
    big = toks.filter(n >= 2).select(
        id_col, "_is_t",
        F.explode(
            F.arrays_zip(
                F.slice("_l", 1, n - 1).alias("w1"),
                F.slice("_l", 2, n - 1).alias("w2"),
            )
        ).alias("_p"),
    ).select(id_col, "_is_t", F.col("_p.w1").alias("_w1"),
             F.col("_p.w2").alias("_w2"))

    c1 = uni.filter("_is_t").groupBy(F.col("_w").alias("_w1")).agg(
        F.count("*").alias("_c1")
    )
    c12 = big.filter("_is_t").groupBy("_w1", "_w2").agg(
        F.count("*").alias("_c12")
    )
    vocab = uni.filter("_is_t").agg(
        F.countDistinct("_w").alias("_V")
    )

    scored = (
        big.join(c12, ["_w1", "_w2"], "left")
        .join(c1, "_w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.floor(
                F.lit(1e6)
                * (
                    F.log(F.coalesce("_c12", F.lit(0)) + 1)
                    - F.log(F.coalesce("_c1", F.lit(0)) + F.col("_V"))
                )
            ).alias("_lp_micros"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("_lp_micros").alias("lm_logprob_micros"),
    )


def perplexity_buckets(scored: DataFrame, n_buckets: int = 3,
                       id_col: str = "doc_id") -> DataFrame:
    """CCNet-style head/middle/tail split (Wenzek et al. 2020 §4.3) over
    :func:`bigram_lm_score` output.

    Ranks documents by mean per-bigram log-prob (higher = more fluent
    under the target LM = "head") and assigns equal-frequency buckets
    with NTILE — bucket 1 = head … bucket ``n_buckets`` = tail, plus the
    canonical label column for the 3-bucket case. Ordering ties (exact
    duplicate texts score identically) are broken by the doc id, so the
    assignment is deterministic and engine-independent.

    Scale note: a single global NTILE forces one ordered partition — at
    corpus scale compute approximate split thresholds instead
    (``percentile_approx`` on avg_logprob) and assign buckets by
    comparison, a narrow map after one sketch aggregation; the
    equal-frequency semantics then hold to sketch accuracy. The NTILE
    form is the exact-semantics reference implementation.
    """
    from pyspark.sql.window import Window

    avg = (
        F.col("lm_logprob_micros").cast("double")
        / F.col("n_bigrams").cast("double")
    )
    # order by the UNROUNDED ratio (IEEE division of the same integer
    # pair is bit-identical on every engine); the rounded copy is
    # display-only, so a rounding-boundary can never flip the ordering
    w = Window.orderBy(F.desc("_avg_raw"), F.col(id_col))
    out = (
        scored.withColumn("_avg_raw", avg)
        .withColumn("avg_logprob", F.round(avg, 6))
        .withColumn("ppl_bucket", F.ntile(n_buckets).over(w))
    )
    label = (
        F.when(F.col("ppl_bucket") == 1, F.lit("head"))
        .when(F.col("ppl_bucket") == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return out.select(
        id_col, "n_bigrams", "lm_logprob_micros", "avg_logprob",
        "ppl_bucket", label.alias("bucket_label"),
    )
