"""TrustRank (seed-restricted teleport) and bounded k-core peeling."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.linkgraph import (
    kcore_bounded,
    pagerank_micros,
    trustrank_micros,
)


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_trustrank_starves_unreachable_spam(spark):
    # trusted cluster 1->2->1 ; spam cluster 3->4->3 (no trust inflow)
    e = _edges(spark, [(1, 2), (2, 1), (3, 4), (4, 3)])
    seeds = spark.createDataFrame([Row(node=1)])
    tr = {r["node"]: r["trust_micros"]
          for r in trustrank_micros(e, seeds, n_iter=3).collect()}
    assert tr[1] > 0 and tr[2] > 0
    assert tr[3] == 0 and tr[4] == 0  # unreachable from any seed


def test_trustrank_equals_pagerank_when_all_seeded(spark):
    # teleporting to ALL nodes uniformly IS ordinary PageRank
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    seeds = spark.createDataFrame([Row(node=n) for n in (1, 2, 3)])
    tr = {r["node"]: r["trust_micros"]
          for r in trustrank_micros(e, seeds, n_iter=3).collect()}
    pr = {r["node"]: r["rank_micros"]
          for r in pagerank_micros(e, n_iter=3).collect()}
    assert tr == pr


def test_kcore_peels_pendant_chain(spark):
    # triangle 1-2-3 (2-core) with pendant chain 3-4-5
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    out = {r["node"]: r["degree"]
           for r in kcore_bounded(e, k=2, n_rounds=3).collect()}
    # 5 peels round 1 (deg 1), then 4 (deg drops to 1), triangle stays
    assert set(out) == {1, 2, 3}
    assert all(d == 2 for d in out.values())


def test_kcore_bounded_rounds_stop_early_state(spark):
    # a long chain needs one round per pendant: with n_rounds=1 only the
    # two endpoints are gone
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out1 = {r["node"] for r in kcore_bounded(e, k=2, n_rounds=1).collect()}
    assert out1 == {2, 3, 4}
    out3 = {r["node"] for r in kcore_bounded(e, k=2, n_rounds=3).collect()}
    assert out3 == set()  # chain fully dissolves


def test_kcore_self_loop_counts_once(spark):
    e = _edges(spark, [(1, 1), (1, 2), (2, 1)])
    out = {r["node"]: r["degree"]
           for r in kcore_bounded(e, k=2, n_rounds=1).collect()}
    # node 1: self-loop (1) + edge each direction (2) = 3; node 2: 2
    assert out[1] == 3 and out[2] == 2
