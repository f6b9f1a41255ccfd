"""Round-4 wave: AMP pairing (q319) and template-leak audit (q320)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.meta import amp_pages
from tribeca_insights_spark.operators.textstats import template_leak_audit


def _amp(spark, rows):
    df = spark.createDataFrame([Row(url=u, html=h) for u, h in rows])
    return {r["url"]: r.asDict() for r in amp_pages(df).collect()}


def test_amp_attribute_forms(spark):
    got = _amp(
        spark,
        [
            ("a", "<html amp><body>x</body></html>"),
            ("b", "<html ⚡ lang='en'><body>x</body></html>"),
            ("c", '<html amp="" lang="en"><body>x</body></html>'),
            ("d", "<html lang='en'><body>amp mentioned</body></html>"),
            ("e", "<html lampshade='1'><body>x</body></html>"),
        ],
    )
    assert [got[k]["is_amp"] for k in "abcde"] == [1, 1, 1, 0, 0]


def test_amp_pairing_both_directions(spark):
    got = _amp(
        spark,
        [
            ("canon", '<link rel="amphtml" href="ampv">'),
            ("ampv", '<html amp><head><link rel="canonical" href="canon">'
                     "</head></html>"),
        ],
    )
    assert got["canon"]["pair_url"] == "ampv"
    assert got["ampv"]["pair_url"] == "canon"
    assert got["ampv"]["is_amp"] == 1 and got["canon"]["is_amp"] == 0


def test_amp_unpaired_nulls(spark):
    got = _amp(spark, [("x", "<html><body>p</body></html>")])
    assert got["x"]["pair_url"] is None and got["x"]["is_amp"] == 0


def _leak(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    return template_leak_audit(df).collect()[0].asDict()


def test_leak_counts(spark):
    r = _leak(spark, "{{a}} {{b}} {% if c %} <%= d %> <% e %> <?php f")
    assert (r["n_mustache"], r["n_jinja_tags"], r["n_erb"], r["n_php"],
            r["leaky"]) == (2, 1, 2, 1, 1)


def test_clean_text_with_decoys(spark):
    r = _leak(spark, "json {\"k\": 1} and a { brace } and 50% off")
    assert r["leaky"] == 0
    assert (r["n_mustache"], r["n_erb"], r["n_jinja_tags"], r["n_php"]) == (
        0, 0, 0, 0)


def test_error_leak_families(spark):
    from tribeca_insights_spark.operators.textstats import error_leak_audit

    rows = [
        (1, "PHP Warning: include() failed"),
        (2, 'Traceback (most recent call last):\n  File "x.py", line 9'),
        (3, 'Exception in thread "main" X\n  at a.b.C.d(C.java:1)'),
        (4, "SQLSTATE[42000] syntax error"),
        (5, "discussing a warning about errors in prose"),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows]
    )
    got = {r["doc_id"]: r.asDict() for r in error_leak_audit(df).collect()}
    assert got[1]["n_php"] == 1 and got[1]["leaky"] == 1
    assert got[2]["n_traceback"] == 2
    assert got[3]["n_java"] == 2
    assert got[4]["n_sql"] == 1
    assert got[5] == {"doc_id": 5, "n_php": 0, "n_traceback": 0,
                      "n_java": 0, "n_sql": 0, "leaky": 0}
