"""Round-4 wave: rendezvous hashing (q352) and pair diff spans (q353)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.dedup import pair_diff_spans
from tribeca_insights_spark.operators.mixing import rendezvous_assign


def test_hrw_resize_moves_only_to_new_shard(spark):
    keys = spark.createDataFrame([Row(key=f"k{i}") for i in range(200)])
    before = rendezvous_assign(keys, "key", ["s0", "s1", "s2", "s3"],
                               out_col="b")
    both = rendezvous_assign(before, "key", ["s0", "s1", "s2", "s3", "s4"],
                             out_col="a").collect()
    moved = [r for r in both if r["b"] != r["a"]]
    # the defining HRW property: a key only ever moves TO the new shard
    assert all(r["a"] == "s4" for r in moved)
    # expected movement ≈ 1/5; allow a generous band for 200 keys
    assert 15 <= len(moved) <= 70


def test_hrw_deterministic(spark):
    keys = spark.createDataFrame([Row(key="fixed")])
    a = rendezvous_assign(keys, "key", ["s0", "s1", "s2"]).collect()[0]
    b = rendezvous_assign(keys, "key", ["s2", "s1", "s0"]).collect()[0]
    # shard-list order is irrelevant: argmax over the same set
    assert a["shard"] == b["shard"]


def _diff(spark, ta, tb):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=ta), Row(doc_id=2, text=tb)]
    )
    pairs = spark.createDataFrame([Row(a_id=1, b_id=2)])
    return pair_diff_spans(pairs, docs).collect()[0].asDict()


def test_diff_middle(spark):
    r = _diff(spark, "AAAA7MMMMZZZZ", "AAAA7QQZZZZ")
    assert (r["lcp"], r["lcs"], r["mid_a"], r["mid_b"], r["same"]) == (
        5, 4, 4, 2, 0)


def test_identical_capped(spark):
    r = _diff(spark, "SAME", "SAME")
    assert (r["lcp"], r["lcs"], r["mid_a"], r["mid_b"], r["same"]) == (
        4, 0, 0, 0, 1)


def test_pure_extension(spark):
    r = _diff(spark, "PPPP", "PPPPEXTRA")
    assert (r["lcp"], r["lcs"], r["mid_a"], r["mid_b"]) == (4, 0, 0, 5)


def test_disjoint_texts(spark):
    r = _diff(spark, "abc", "xyz")
    assert (r["lcp"], r["lcs"], r["mid_a"], r["mid_b"]) == (0, 0, 3, 3)
