"""Registry-wide plan-shape regression gate (r4 verdict #6).

test_plan_shapes*.py pins the load-bearing plans of ~40 individual
operators; this gate formats EVERY registered query's physical plan at
sf0.001 and asserts the global 100-TB invariants:

* no ``BatchEvalPython`` anywhere — every Python crossing must be
  Arrow-batched (pandas UDF / mapInPandas), never row-at-a-time;
* no ``CartesianProduct``;
* no partitionless ``Window`` (``Window [exprs], [], [order]`` = every
  row through one task — the r3 q84 scale-killer shape);
* every ``BroadcastNestedLoopJoin`` build side must be PROVABLY BOUNDED
  from the plan itself: its ``IdentityBroadcastMode`` exchange subtree
  must contain a scalar aggregate (``keys=[]``), a ``GlobalLimit`` /
  ``TakeOrderedAndProject(limit=k)``, a driver-local ``LocalTableScan``,
  a tiny ``Range``, or an ``INSET``-bounded unique-key filter. The
  corpus-constant cross join (thresholds, totals, avgdl) is the ONE
  sanctioned BNLJ shape — 52 of the 60 registry BNLJs prove themselves;
  the rest are whitelisted below with per-query justification.

Queries that return a streaming DataFrame (no executed plan without a
sink) assert the invariants on their optimized logical plan instead.
"""

from __future__ import annotations

import re

import pytest

from tribeca_insights_spark.entry_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# BNLJ builds that are bounded by construction but not self-evidently in
# the plan text — each verified by reading the operator and the plan:
BOUNDED_BNLJ_WHITELIST = {
    # query-point side = literal IN (0..9) on unique vec_id → ≤10 rows
    "q184_ann_recall",
    # query-point side = doc_id < 8 on unique doc_id → ≤8 rows
    "q242_ranking_metrics",
    # KMV bottom-k sketches: rank <= k (k=16) per group, 2 groups → ≤32
    "q227_kmv_jaccard",
    # per-batch histogram-bin dims: bins = n_chars div 100 (≤ ~6 bins)
    "q239_psi_drift",
    "q247_filter_bias_psi",
    # per-day totals dim: cardinality = distinct event days (bounded by
    # the corpus time range, a dimension not a fact stream)
    "q264_kleinberg_bursts",
}

_PARTITIONLESS_WINDOW = re.compile(r"Window \[[^\]]*\], \[\], \[")
_BOUNDED_MARKERS = (
    "keys=[]", "key=[]", "GlobalLimit", "TakeOrderedAndProject(limit=",
    "LocalTableScan", "ReusedExchange", " INSET ",
)
_SMALL_RANGE = re.compile(r"Range \(0, \d{1,2}\b")


def _indent(line: str) -> int:
    m = re.search(r"[A-Za-z]", line)
    return m.start() if m else len(line)


def _unbounded_broadcast_builds(plan: str) -> list:
    """IdentityBroadcastMode subtrees (BNLJ builds) with no bounded-size
    marker anywhere inside them."""
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "IdentityBroadcastMode" not in ln:
            continue
        ind = _indent(ln)
        ok = False
        for j in range(i + 1, len(lines)):
            if _indent(lines[j]) <= ind and lines[j].strip():
                break
            if (any(m in lines[j] for m in _BOUNDED_MARKERS)
                    or _SMALL_RANGE.search(lines[j])):
                ok = True
                break
        if not ok:
            bad.append(ln.strip()[:100])
    return bad


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_global_plan_invariants(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    if df.isStreaming:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    else:
        plan = df._jdf.queryExecution().executedPlan().toString()

    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan"
    )
    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct"
    bad_windows = _PARTITIONLESS_WINDOW.findall(plan)
    assert not bad_windows, (
        f"{name}: partitionless Window (single-task global window): "
        f"{bad_windows[:2]}"
    )
    if "BroadcastNestedLoopJoin" in plan and name not in BOUNDED_BNLJ_WHITELIST:
        bad = _unbounded_broadcast_builds(plan)
        assert not bad, (
            f"{name}: BroadcastNestedLoopJoin with unproven build-side "
            f"bound: {bad[:2]}"
        )
