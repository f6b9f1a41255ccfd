"""q217-q220 wave: bitext mining, exact harmonic centrality, embedding
moments, bottom-k KMV sketches."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from tribeca_insights_spark.operators.bitext import (
    bitext_candidates,
    url_lang_template,
)
from tribeca_insights_spark.operators.linkgraph import (
    harmonic_centrality_r2,
)
from tribeca_insights_spark.operators.similarity import embedding_moments
from tribeca_insights_spark.operators.sketches import (
    bottomk_estimate,
    bottomk_merge,
    bottomk_sketch,
)


# --- bitext -----------------------------------------------------------------


def test_url_lang_template_variants(spark):
    rows = [
        ("https://a.com/en/docs/1", "https://a.com/{L}/docs/1"),
        ("https://a.com/pt-br/x", "https://a.com/{L}/x"),
        ("https://a.com/zh_CN/x", "https://a.com/{L}/x"),
        ("https://a.com/docs/1", "https://a.com/docs/1"),  # no lang seg
        ("https://a.com/en", "https://a.com/en"),  # no trailing slash
    ]
    df = spark.createDataFrame([Row(url=u, lang="en") for u, _ in rows])
    got = [
        r["tpl"]
        for r in df.select(
            url_lang_template(F.col("url"), F.col("lang")).alias("tpl")
        ).collect()
    ]
    assert got == [want for _, want in rows]


def test_bitext_pairs_and_ratio_gate(spark):
    pages = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://a.com/en/p/1", lang="en", n_chars=100),
            Row(doc_id=2, url="https://a.com/fr/p/1", lang="fr", n_chars=150),
            # same template, but 3x longer -> ratio gate drops it
            Row(doc_id=3, url="https://a.com/de/p/1", lang="de", n_chars=301),
            # different site section -> no pair
            Row(doc_id=4, url="https://a.com/fr/p/2", lang="fr", n_chars=100),
            # same lang twice -> lang_a < lang_b excludes the pair
            Row(doc_id=5, url="https://a.com/en/p/1", lang="en", n_chars=100),
        ]
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in bitext_candidates(pages).collect()
    }
    # en(1)-fr(2) pairs; de(3) vs en(1): 301 > 2*100 dropped;
    # de(3) vs fr(2): 301 > 300 dropped; en(5)-fr(2) pairs too.
    assert got == {(1, 2), (5, 2)}


def test_bitext_pair_is_host_local(spark):
    pages = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://a.com/en/p/1", lang="en", n_chars=10),
            Row(doc_id=2, url="https://b.com/fr/p/1", lang="fr", n_chars=10),
        ]
    )
    assert bitext_candidates(pages).count() == 0


# --- harmonic centrality ----------------------------------------------------

# 0->1, 0->2, 1->3, 2->3, 3->0, 4 isolated, 5->5 self loop
H_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (4, 4), (5, 5)]
H_NODES = list(range(6))


def _exact_harmonic(node):
    e = [(s, d) for s, d in H_EDGES if s != d]
    n1 = {d for s, d in e if s == node and d != node}
    n2 = {
        d2
        for s, d in e
        if s == node
        for s2, d2 in e
        if s2 == d and d2 != node and d2 not in n1
    }
    return len(n1), len(n2)


def test_harmonic_exact_against_python(spark):
    e = spark.createDataFrame([Row(src=s, dst=d) for s, d in H_EDGES])
    n = spark.createDataFrame([Row(node=v) for v in H_NODES])
    got = {
        r["node"]: (r["n1"], r["n2"], r["harmonic_micros"])
        for r in harmonic_centrality_r2(e, n).collect()
    }
    assert set(got) == set(H_NODES)
    for v in H_NODES:
        n1, n2 = _exact_harmonic(v)
        assert got[v] == (n1, n2, n1 * 1000000 + n2 * 500000), v


def test_harmonic_dedups_parallel_edges(spark):
    e = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=0, dst=1), Row(src=0, dst=1)]
    )
    n = spark.createDataFrame([Row(node=0), Row(node=1)])
    got = {r["node"]: r["n1"] for r in harmonic_centrality_r2(e, n).collect()}
    assert got == {0: 1, 1: 0}


# --- embedding moments ------------------------------------------------------


def test_embedding_moments_vs_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 5).astype(np.float32)
    df = spark.createDataFrame(
        [Row(embedding=[float(x) for x in v]) for v in vecs]
    )
    got = {
        (r["i"], r["j"]): (r["n"], r["sxy"], r["sxi"], r["sxj"],
                           r["cov_micros"])
        for r in embedding_moments(df).collect()
    }
    xm = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    g = xm.T @ xm
    s = xm.sum(axis=0)
    n = xm.shape[0]
    assert len(got) == 15  # 5*6/2 upper-triangle cells
    for i in range(5):
        for j in range(i, 5):
            cov = int(np.floor((n * g[i, j] - s[i] * s[j]) / (n * n)))
            assert got[(i, j)] == (n, int(g[i, j]), int(s[i]),
                                   int(s[j]), cov), (i, j)


def test_embedding_moments_partition_invariant(spark):
    """Partial-aggregation must give the same sums regardless of how
    rows land in batches/partitions."""
    vecs = [[float(i + d) for d in range(3)] for i in range(30)]
    df1 = spark.createDataFrame([Row(embedding=v) for v in vecs])
    a = {
        (r["i"], r["j"]): r["sxy"]
        for r in embedding_moments(df1.coalesce(1)).collect()
    }
    b = {
        (r["i"], r["j"]): r["sxy"]
        for r in embedding_moments(df1.repartition(7)).collect()
    }
    assert a == b


# --- bottom-k KMV -----------------------------------------------------------


def _h32(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def test_bottomk_matches_python(spark):
    keys = [f"tok{i}" for i in range(50)]
    df = spark.createDataFrame(
        [Row(grp="g", key=k) for k in keys]
        + [Row(grp="g", key=k) for k in keys[:10]]  # dup keys collapse
    )
    got = [
        (r["rank"], r["h"])
        for r in bottomk_sketch(df, "grp", "key", k=8)
        .orderBy("rank")
        .collect()
    ]
    want = sorted(_h32(k) for k in keys)[:8]
    assert got == [(i + 1, h) for i, h in enumerate(want)]


def test_bottomk_small_group_exact(spark):
    df = spark.createDataFrame([Row(grp="g", key=f"k{i}") for i in range(5)])
    sk = bottomk_sketch(df, "grp", "key", k=8)
    est = bottomk_estimate(sk, k=8).collect()[0]
    assert est["n_in_sketch"] == 5
    assert est["kth_hash"] == 0
    assert est["est_distinct"] == 5  # exact below k


def test_bottomk_merge_law(spark):
    """sketch(A ∪ B) == bottomk(sketch(A) ∪ sketch(B)) row-for-row."""
    rows = [Row(grp=f"g{i % 3}", key=f"tok{i}") for i in range(120)]
    df = spark.createDataFrame(rows)
    k = 8
    direct = {
        (r["grp"], r["rank"], r["h"])
        for r in bottomk_sketch(df, "grp", "key", k=k).collect()
    }
    ha = bottomk_sketch(
        df.filter(F.length("key") % 2 == 0), "grp", "key", k=k
    )
    hb = bottomk_sketch(
        df.filter(F.length("key") % 2 == 1), "grp", "key", k=k
    )
    merged = {
        (r["grp"], r["rank"], r["h"])
        for r in bottomk_merge(k, ha, hb).collect()
    }
    assert merged == direct


def test_bottomk_estimate_reasonable(spark):
    """KMV estimate within a loose band of truth for n >> k."""
    df = spark.createDataFrame(
        [Row(grp="g", key=f"token-{i}") for i in range(2000)]
    )
    k = 64
    est = bottomk_estimate(bottomk_sketch(df, "grp", "key", k=k), k=k)
    got = est.collect()[0]["est_distinct"]
    assert 1200 < got < 3200  # ~2000 within KMV 1/sqrt(k) error bars
