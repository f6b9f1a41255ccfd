"""Round-4 cont.: label propagation, funnels, retention, integer OLS."""

import datetime as dt

from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.funnel import (
    funnel_stages,
    retention_cohorts,
)
from tribeca_insights_spark.operators.linkgraph import label_propagation
from tribeca_insights_spark.operators.stats import grouped_ols


# --- label propagation ------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _py_lpa(pairs, n_iter):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        nxt = {}
        for n, nbrs in adj.items():
            counts = {}
            for v in nbrs:
                counts[labels[v]] = counts.get(labels[v], 0) + 1
            nxt[n] = sorted(counts.items(),
                            key=lambda kv: (-kv[1], kv[0]))[0][0]
        labels = nxt
    return labels


def test_lpa_two_cliques_vs_reference(spark):
    # cliques {0,1,2} and {10,11,12} bridged by 2-10
    c1 = [(0, 1), (0, 2), (1, 2)]
    c2 = [(10, 11), (10, 12), (11, 12)]
    pairs = c1 + c2 + [(2, 10)]
    for it in (1, 2, 3):
        out = {
            r["node"]: r["label"]
            for r in label_propagation(
                _edges(spark, pairs), n_iter=it
            ).collect()
        }
        assert out == _py_lpa(pairs, it)
    # and the big clique {0,1,2} is uniformly labeled 0 after 2 rounds
    out2 = _py_lpa(pairs, 2)
    assert out2[0] == out2[1] == out2[2] == 0


def test_lpa_tie_breaks_to_smallest_label(spark):
    # node 1's neighbors 0 and 2 each appear once -> min label 0 wins
    out = {
        r["node"]: r["label"]
        for r in label_propagation(
            _edges(spark, [(0, 1), (1, 2)]), n_iter=1
        ).collect()
    }
    assert out[1] == 0
    # endpoints adopt their single neighbor's label
    assert out[0] == 1 and out[2] == 1


def test_lpa_direction_and_selfloops_ignored(spark):
    sym = label_propagation(
        _edges(spark, [(1, 0), (2, 2), (0, 1)]), n_iter=1
    )
    out = {r["node"]: r["label"] for r in sym.collect()}
    # 2's only edge is a self-loop -> node absent (no real neighbors)
    assert out == {0: 1, 1: 0}


# --- funnel -----------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(user_id=u, event_type=t,
                ts=dt.datetime(2026, 1, 1, h))
            for u, t, h in rows
        ]
    )


def test_funnel_strict_ordering(spark):
    ev = _events(
        spark,
        [
            (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
            # user 2 clicked BEFORE viewing -> stage stops at 1
            (2, "click", 1), (2, "view", 2),
            # user 3 never viewed -> absent from the funnel
            (3, "purchase", 1),
        ],
    )
    out = {
        r["user_id"]: (r["stage_reached"], r["t2"])
        for r in funnel_stages(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert out[1][0] == 3
    assert out[2] == (1, None)
    assert 3 not in out


def test_funnel_picks_earliest_next_occurrence(spark):
    ev = _events(
        spark,
        [(1, "view", 5), (1, "click", 3), (1, "click", 7),
         (1, "click", 9)],
    )
    row = funnel_stages(ev, ["view", "click"]).collect()[0]
    assert row["t1"].hour == 5
    assert row["t2"].hour == 7  # first click AFTER the view, not 3 or 9
    assert row["stage_reached"] == 2


def test_funnel_rejects_empty_steps(spark):
    import pytest

    ev = _events(spark, [(1, "view", 1)])
    with pytest.raises(ValueError):
        funnel_stages(ev, [])


# --- retention --------------------------------------------------------------


def test_retention_cohort_matrix(spark):
    ev = spark.createDataFrame(
        [
            Row(user_id=1, ts=dt.datetime(2026, 1, 1, 9)),
            Row(user_id=1, ts=dt.datetime(2026, 1, 3, 9)),
            Row(user_id=2, ts=dt.datetime(2026, 1, 1, 12)),
            Row(user_id=3, ts=dt.datetime(2026, 1, 2, 8)),
            Row(user_id=3, ts=dt.datetime(2026, 1, 2, 23)),
        ]
    )
    out = {
        (str(r["cohort_date"]), r["day_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert out == {
        ("2026-01-01", 0): 2,
        ("2026-01-01", 2): 1,
        ("2026-01-02", 0): 1,
    }


# --- exact-integer OLS ------------------------------------------------------


def test_ols_exact_line(spark):
    # y = 3x + 7 in micros: slope 3_000_000? no -- y_micros = 3e6*x+7e6
    rows = spark.createDataFrame(
        [("g", x, 3_000_000 * x + 7_000_000) for x in range(10)],
        "g string, x long, y long",
    )
    r = grouped_ols(rows, ["g"], "x", "y").collect()[0]
    assert (r["n"], r["slope_micros"], r["intercept_micros"]) == (
        10, 3_000_000, 7_000_000)


def test_ols_negative_slope_floor_semantics(spark):
    # y = -3x + 1 micros over x=0..3: exact fit, negative slope must
    # floor correctly (floor == exact here)
    rows = spark.createDataFrame(
        [("g", x, -3 * x + 1) for x in range(4)],
        "g string, x long, y long",
    )
    r = grouped_ols(rows, ["g"], "x", "y").collect()[0]
    assert (r["slope_micros"], r["intercept_micros"]) == (-3, 1)


def test_ols_inexact_fit_floors_toward_minus_inf(spark):
    # points (0,0),(1,0),(2,1): true slope = 1/2 -> floor 0;
    # mirrored negative: true slope -1/2 -> floor -1 (NOT trunc 0)
    pos = spark.createDataFrame(
        [("p", 0, 0), ("p", 1, 0), ("p", 2, 1),
         ("n", 0, 1), ("n", 1, 1), ("n", 2, 0)],
        "g string, x long, y long",
    )
    out = {r["g"]: r["slope_micros"]
           for r in grouped_ols(pos, ["g"], "x", "y").collect()}
    assert out == {"p": 0, "n": -1}


def test_ols_zero_variance_is_null(spark):
    rows = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2)], "g string, x long, y long"
    )
    r = grouped_ols(rows, ["g"], "x", "y").collect()[0]
    assert r["slope_micros"] is None and r["intercept_micros"] is None
