"""Grouped statistical aggregates in EXACT integer arithmetic.

Spark ships ``regr_slope``/``regr_intercept``, but they sum doubles —
at 10^12 rows partial-aggregation order perturbs the low bits, so two
runs of the same query (or the engine vs an oracle) can disagree in the
last decimals. The repo-wide discipline (BASELINE.md; integer-micros
PageRank/HITS/LM scores) is to do the statistics in scaled integers:
sums of BIGINTs are associative-commutative EXACTLY, so the result is
bit-stable under any partitioning — the property that makes strict
oracle hashing possible at all.

``grouped_ols`` fits y = a + b·x per group from the five classic
sufficient statistics (n, Σx, Σy, Σx², Σxy) — ONE partial-agg groupBy
over the raw rows; everything after is per-group codegen arithmetic on
a group-count-sized table. Slope/intercept come out in FLOOR-division
micros; floor is computed as ``(a - pmod(a, b)) div b``, which agrees
across engines regardless of whether their integer division truncates
or floors, because the adjusted numerator is exactly divisible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grouped_ols(
    rows: DataFrame,
    group_cols,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """(group…, n, slope_micros, intercept_micros): exact-integer OLS
    of ``y_col`` (already scaled to integer micros) on integer
    ``x_col`` per group.

    slope_micros = floor((n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)) — micro-y
    per unit x; intercept_micros = floor((Σy − slope·Σx) / n) with the
    integer slope substituted (the same substitution the oracle
    replays). Zero-x-variance groups yield NULL slope/intercept rather
    than a division error. Caller owns the integer scaling of x and y;
    sums must stay inside BIGINT — with micro-scaled y that bounds
    |x|·|y|·n at ~9·10^18, plenty for day-offset x at any corpus size
    when the group count keeps per-group n bounded.
    """
    groups = list(group_cols)
    x = F.col(x_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    s = rows.groupBy(*groups).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    num = "(n * sxy - sx * sy)"
    den = "(n * sxx - sx * sx)"
    slope = (
        f"CASE WHEN {den} > 0 THEN "
        f"({num} - (({num} % {den} + {den}) % {den})) div {den} "
        f"END"
    )
    inum = f"(sy - ({slope}) * sx)"
    intercept = (
        f"CASE WHEN {den} > 0 THEN "
        f"({inum} - (({inum} % n + n) % n)) div n "
        f"END"
    )
    return s.selectExpr(
        *groups,
        "n",
        f"CAST({slope} AS BIGINT) AS slope_micros",
        f"CAST({intercept} AS BIGINT) AS intercept_micros",
    )
