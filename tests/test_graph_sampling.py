"""Round-4 cont.: HITS hubs/authorities and priority sampling."""

from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.linkgraph import hits_micros
from tribeca_insights_spark.operators.mixing import priority_sample


# --- HITS -------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs]
    )


def test_hits_star_hub(spark):
    # 0 links to 1,2,3: node 0 is the pure hub, 1-3 the pure authorities.
    e = _edges(spark, [(0, 1), (0, 2), (0, 3)])
    out = {
        r["node"]: (r["auth_micros"], r["hub_micros"])
        for r in hits_micros(e, n_iter=2).collect()
    }
    assert out[0] == (0, 1_000_000)
    for v in (1, 2, 3):
        assert out[v] == (1_000_000, 0)


def test_hits_hand_recurrence(spark):
    # 0→2, 1→2, 2→3.  Iter1: auth_raw = {2:2e6, 3:1e6} → auth
    # {2:1e6, 3:500000}; hub_raw = {0:1e6, 1:1e6, 2:500000} → hub
    # {0:1e6, 1:1e6, 2:500000}.  Iter2: auth_raw = {2:2e6, 3:500000}
    # → auth {2:1e6, 3:250000}; hub_raw = {0:1e6, 1:1e6, 2:250000}
    # → hub {0:1e6, 1:1e6, 2:250000}.
    e = _edges(spark, [(0, 2), (1, 2), (2, 3)])
    out = {
        r["node"]: (r["auth_micros"], r["hub_micros"])
        for r in hits_micros(e, n_iter=2).collect()
    }
    assert out == {
        0: (0, 1_000_000),
        1: (0, 1_000_000),
        2: (1_000_000, 250_000),
        3: (250_000, 0),
    }


def test_hits_multi_edge_multiplicity(spark):
    # A duplicated edge doubles its contribution on both sides.
    single = {
        r["node"]: (r["auth_micros"], r["hub_micros"])
        for r in hits_micros(
            _edges(spark, [(0, 1), (2, 3)]), n_iter=1
        ).collect()
    }
    doubled = {
        r["node"]: (r["auth_micros"], r["hub_micros"])
        for r in hits_micros(
            _edges(spark, [(0, 1), (0, 1), (2, 3)]), n_iter=1
        ).collect()
    }
    # with the duplicate, 0→1 carries 2e6 raw vs 1e6 for 2→3
    assert single[1][0] == single[3][0] == 1_000_000
    assert doubled[1][0] == 1_000_000 and doubled[3][0] == 500_000


def test_hits_materialize_cleans_cache(spark):
    e = _edges(spark, [(0, 1), (1, 2)])
    before = len(
        [r for r in spark.sparkContext._jsc.getPersistentRDDs().items()]
    )
    out = hits_micros(e, n_iter=2, materialize=True)
    assert out.count() == 3
    after = len(
        [r for r in spark.sparkContext._jsc.getPersistentRDDs().items()]
    )
    # localCheckpoint pins the (node-sized) result RDD itself; every
    # intermediate persist from the loop must be gone.
    assert after <= before + 1


# --- priority sampling ------------------------------------------------------


def _weighted(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, weight=w) for i, w in rows]
    )


def test_priority_sample_exact_k_and_determinism(spark):
    df = _weighted(spark, [(i, 1 + i % 7) for i in range(40)])
    a = priority_sample(df, "weight", k=10)
    b = priority_sample(df, "weight", k=10)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert len(ra) == 10 and ra == rb


def test_priority_sample_small_input_keeps_all_exact(spark):
    # n <= k: τ = 0 and the estimator equals the exact weight.
    df = _weighted(spark, [(1, 5), (2, 7), (3, 11)])
    rows = priority_sample(df, "weight", k=10).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["est_weight_micros"] == r["weight"] * 1_000_000


def test_priority_sample_estimator_floor(spark):
    # n > k: τ is the (k+1)-th priority; every sampled row's estimator
    # is >= its own weight (max(w, τ/1e12)) and Σ est is a plausible
    # corpus-total estimate (positive, >= Σ of sampled true weights).
    df = _weighted(spark, [(i, 1 + (i * 13) % 50) for i in range(200)])
    rows = priority_sample(df, "weight", k=20).collect()
    assert len(rows) == 20
    assert all(
        r["est_weight_micros"] >= r["weight"] * 1_000_000 for r in rows
    )
    total_true = sum(1 + (i * 13) % 50 for i in range(200)) * 1_000_000
    total_est = sum(r["est_weight_micros"] for r in rows)
    # unbiased estimator: one draw should land within a loose band
    assert 0.3 * total_true < total_est < 3 * total_true


def test_priority_sample_weight_proportional_tendency(spark):
    # one giant weight should essentially always be sampled
    df = _weighted(spark, [(i, 1) for i in range(100)] + [(999, 100000)])
    ids = {r["doc_id"] for r in priority_sample(df, "weight", k=5).collect()}
    assert 999 in ids


# --- triangle counting ------------------------------------------------------


def _tri_brute(pairs):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    # each triangle reaches a node via its 3 edges exactly... (a,b) sees
    # c, (a,c) sees b, (b,c) sees a -> every node counted 3x per triangle
    return {n: v // 3 for n, v in counts.items() if v}


def test_triangles_k4(spark):
    from tribeca_insights_spark.operators.linkgraph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, k4)).collect()
    }
    # K4 has 4 triangles; every node sits in exactly 3 of them.
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_star_has_none(spark):
    from tribeca_insights_spark.operators.linkgraph import triangle_counts

    e = _edges(spark, [(0, i) for i in range(1, 8)])
    assert triangle_counts(e).count() == 0


def test_triangles_ignore_selfloops_multiedges_direction(spark):
    from tribeca_insights_spark.operators.linkgraph import triangle_counts

    # one triangle, plus a self-loop, a duplicate edge, and a reversed
    # duplicate -- none of which may change the count
    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (1, 0), (2, 2), (0, 1)])
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(e).collect()
    }
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangles_vs_brute_force(spark):
    from tribeca_insights_spark.operators.linkgraph import triangle_counts

    # deterministic pseudo-random graph incl. a high-degree hub (node 0)
    pairs = [(0, i) for i in range(1, 20)]
    pairs += [((i * 7) % 20, (i * 11 + 3) % 20) for i in range(40)]
    expect = _tri_brute(pairs)
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, pairs)).collect()
    }
    assert out == expect
