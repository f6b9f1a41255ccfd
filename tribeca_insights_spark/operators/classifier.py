"""Hashed linear quality classifier — fastText-style scoring, shuffle-free.

Beyond-reference capability (task brief): production web pipelines
(CCNet, FineWeb-Edu, DCLM) gate documents with a cheap linear classifier
over hashed token features — the model is a weight vector indexed by
``hash(token) % n_buckets``, and scoring is a dot product. The reference
has no classifier at all; this operator supplies the *serving* side with
the exact shape such a model needs at 100 TB:

- the weight lookup is a pure expression (no join, no UDF, no shuffle):
  ``bucket = md5(token) % K`` then a closed-form weight. A real trained
  model swaps the closed form for ``weights[bucket]`` with the vector
  shipped as a broadcast array literal — the plan shape is identical;
- the per-document reduction runs inside ``F.aggregate`` over the token
  array, so scoring is a narrow map directly above the parquet scan —
  zero Exchange, embarrassingly parallel, no skew surface at any scale;
- weights are integer micros, so the document sum is exact and
  aggregation-order-independent (DuckDB oracle matches bit-for-bit);
  only the final mean/sigmoid are floats, computed once from two exact
  integers.

Deterministic pseudo-weights: ``w(b) = (b * 2654435761) % 2000001 -
1000000`` (Knuth multiplicative hash spread over [-1e6, 1e6] micros).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_KNUTH = 2654435761
_SPAN = 2000001  # weights in [-1_000_000, 1_000_000] micros


def _bucket(tok, n_buckets: int):
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def bucket_weight_micros(tok, n_buckets: int = 1 << 20):
    """Closed-form weight in micros for a token's hash bucket."""
    return (_bucket(tok, n_buckets) * _KNUTH) % _SPAN - (_SPAN - 1) // 2


def hashed_linear_score(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        n_buckets: int = 1 << 20) -> DataFrame:
    """Score every document with the hashed linear model.

    Tokenization matches the corpus tokenizer's keep-class
    (``[^A-Za-zÀ-ÿ]+`` split, then lowercase) so classifier features line
    up with TF features. Returns (id, n_tokens, score_micros,
    mean_weight, prob) where prob = sigmoid(mean weight); empty docs get
    NULL mean/prob.
    """
    toks = F.filter(
        F.split(
            F.lower(F.trim(F.regexp_replace(F.col(text_col),
                                            "[^A-Za-zÀ-ÿ]+", " "))),
            " ", -1,
        ),
        lambda w: F.length(w) > 0,
    )
    score = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc + bucket_weight_micros(w, n_buckets),
    )
    out = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score_micros"),
    )
    mean = F.col("score_micros") / 1e6 / F.col("n_tokens")
    return out.select(
        id_col, "n_tokens", "score_micros",
        F.when(F.col("n_tokens") > 0, F.round(mean, 6)).alias("mean_weight"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean)), 6),
        ).alias("prob"),
    )


def sigmoid(x: float) -> float:
    """Python-side mirror for tests."""
    return 1.0 / (1.0 + math.exp(-x))
