"""Round-4 wave: noindex-inlink audit (q321), title duplication (q322)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.meta import (
    noindex_inlink_audit,
    title_duplication,
)


def test_noindex_inlink_wasted_matrix(spark):
    pages = spark.createDataFrame(
        [
            Row(url="a", html='<meta name="robots" content="noindex">'),
            Row(url="b", html='<meta name="robots" content="noindex">'),
            Row(url="c", html="<p>indexable</p>"),
        ]
    )
    edges = spark.createDataFrame(
        [Row(src="c", dst="a"), Row(src="b", dst="a"), Row(src="a", dst="c")]
    )
    got = {r["url"]: r.asDict()
           for r in noindex_inlink_audit(pages, edges).collect()}
    assert (got["a"]["noindex"], got["a"]["n_inlinks"],
            got["a"]["wasted"]) == (1, 2, 1)
    # noindexed but unlinked → not wasted
    assert (got["b"]["n_inlinks"], got["b"]["wasted"]) == (0, 0)
    # linked but indexable → not wasted
    assert (got["c"]["noindex"], got["c"]["n_inlinks"],
            got["c"]["wasted"]) == (0, 1, 0)


def test_noindex_none_token_counts(spark):
    pages = spark.createDataFrame(
        [Row(url="a", html='<meta name="robots" content="none">')]
    )
    edges = spark.createDataFrame([Row(src="x", dst="a")])
    r = noindex_inlink_audit(pages, edges).collect()[0]
    assert (r["noindex"], r["wasted"]) == (1, 1)


def test_title_duplication_rollup(spark):
    pages = spark.createDataFrame(
        [
            Row(host="h1", title="T"),
            Row(host="h1", title="T"),
            Row(host="h1", title="unique"),
            Row(host="h2", title="T"),
        ]
    )
    got = {(r["host"], r["title"]): r.asDict()
           for r in title_duplication(pages).collect()}
    assert (got[("h1", "T")]["n_pages"], got[("h1", "T")]["is_dup"]) == (2, 1)
    assert got[("h1", "unique")]["is_dup"] == 0
    # same title on ANOTHER host is a separate (non-dup) cluster
    assert (got[("h2", "T")]["n_pages"], got[("h2", "T")]["is_dup"]) == (1, 0)
