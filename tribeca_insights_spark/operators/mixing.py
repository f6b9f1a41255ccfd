"""Deterministic mixture sampling for training-data composition.

Beyond-reference capability (task brief): assembling a pre-training mix
means sampling each source at its own rate — and doing it REPRODUCIBLY,
so that re-running the pipeline (or re-running one partition after a
failure) selects exactly the same documents. The standard trick, used
here: hash each document's stable key into a uniform bucket and keep it
iff bucket < rate. No RNG state, no seed plumbing, no driver
involvement — membership is a pure function of (key, rate), so the
operator is a narrow shuffle-free filter that any engine can replay
(DuckDB oracles included).

At 100 TB this is the ideal shape: the sample predicate sits directly
above the scan (Catalyst pushes the source-rate join down as a
broadcast), and per-source rates arrive as a tiny dimension — changing
the mix never reshuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICROS = 1_000_000


def hash_bucket_micros(col, salt: str = ""):
    """Uniform bucket in [0, 1e6) from md5 of the column's string form.

    First 8 hex chars → long → mod 1e6; identical in DuckDB as
    ``('0x' || substr(md5(x), 1, 8))::BIGINT % 1000000``.
    """
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))),
                        1, 8),
            16, 10,
        ).cast("long")
        % MICROS
    )


def mixture_sample(df: DataFrame, rates: DataFrame,
                   key_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Keep each row iff hash_bucket(key) < its group's rate_micros.

    ``rates`` is a small (group_col, rate_micros) dimension — broadcast
    so the filter stays a narrow op over the scan. Adds ``rate_micros``
    and ``sample_weight`` (1e6 / rate, the inverse-probability weight a
    training loop uses to de-bias the mix) to the surviving rows.
    """
    bucket = hash_bucket_micros(F.col(key_col))
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(bucket < F.col("rate_micros"))
        .withColumn(
            "sample_weight", F.lit(float(MICROS)) / F.col("rate_micros")
        )
    )
