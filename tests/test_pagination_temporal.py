"""Round-4 wave: pagination audit (q317) and the q318 composition's
operator-level pieces."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.meta import pagination_audit


def _pages(spark, rows):
    return spark.createDataFrame([Row(url=u, html=h) for u, h in rows])


def _chain(spark, rows):
    out = pagination_audit(_pages(spark, rows))
    return {r["url"]: r.asDict() for r in out.collect()}


def test_reciprocal_chain(spark):
    got = _chain(
        spark,
        [
            ("p1", '<link rel="next" href="p2">'),
            ("p2", '<link rel="next" href="p3"><link rel="prev" href="p1">'),
            ("p3", '<link rel="prev" href="p2">'),
        ],
    )
    assert (got["p1"]["next_reciprocal"], got["p1"]["is_first"],
            got["p1"]["is_last"]) == (1, 1, 0)
    assert (got["p2"]["next_reciprocal"], got["p2"]["is_first"]) == (1, 0)
    assert (got["p3"]["next_reciprocal"], got["p3"]["is_last"]) == (None, 1)


def test_broken_reciprocity_flagged(spark):
    got = _chain(
        spark,
        [
            ("p1", '<link rel="next" href="p2">'),
            ("p2", '<link rel="next" href="p3">'),  # prev missing
            ("p3", '<link rel="prev" href="p2">'),
        ],
    )
    assert got["p1"]["next_reciprocal"] == 0
    # p2 looks like a second chain root — the trap signal
    assert got["p2"]["is_first"] == 1


def test_next_to_unknown_page(spark):
    got = _chain(spark, [("p1", '<link rel="next" href="ghost">')])
    assert got["p1"]["next_reciprocal"] == 0


def test_unpaginated_page(spark):
    got = _chain(spark, [("solo", "<p>no links</p>")])
    assert (got["solo"]["next_url"], got["solo"]["prev_url"],
            got["solo"]["is_first"], got["solo"]["is_last"]) == (
        None, None, 1, 1)


def test_page_roles_precedence(spark):
    from tribeca_insights_spark.operators.meta import page_roles

    rows = [
        # redirect wins even with amp attribute
        ("r", '<html amp><meta http-equiv="refresh" '
              'content="0;url=https://x/n">'),
        ("a", '<html amp><link rel="canonical" href="c">'),
        # continuation wins over noindex
        ("p2", '<link rel="prev" href="p1">'
               '<meta name="robots" content="noindex">'),
        ("n", '<meta name="robots" content="noindex">'),
        ("c", "<body>plain</body>"),
    ]
    df = spark.createDataFrame(
        [Row(url=u, html=h) for u, h in rows]
    )
    got = {r["url"]: r["role"] for r in page_roles(df).collect()}
    assert got == {
        "r": "redirect-shell",
        "a": "amp-variant",
        "p2": "pagination-continuation",
        "n": "noindex",
        "c": "content",
    }
