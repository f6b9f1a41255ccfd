"""HTML table extraction: walker semantics + Spark operator."""

from pyspark.sql import functions as F

from tribeca_insights_spark.htmlx.tables import extract_tables
from tribeca_insights_spark.operators.tables import table_rows


def test_basic_rows_and_document_order():
    h = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>id</td><td>42</td></tr></table>"
        "<table><tr><td>solo</td></tr></table>"
    )
    assert extract_tables(h) == [[["k", "v"], ["id", "42"]], [["solo"]]]


def test_nested_table_owns_its_cells():
    h = (
        "<table><tr><td>outer "
        "<table><tr><td>inner</td></tr></table></td>"
        "<td>b</td></tr></table>"
    )
    # inner table's text never leaks into the outer cell; both tables
    # reported, outer first (document order of <table> opens)
    assert extract_tables(h) == [[["outer", "b"]], [["inner"]]]


def test_autoclose_recovery_and_script_drop():
    h = "<table><tr><td>a<td>b<tr><td><script>junk()</script>c</table>"
    assert extract_tables(h) == [[["a", "b"], ["c"]]]


def test_inline_markup_inside_cell():
    h = "<table><tr><td>one <b>two</b> &amp; three</td></tr></table>"
    assert extract_tables(h) == [[["one two & three"]]]


def test_empty_and_tableless():
    assert extract_tables(None) == []
    assert extract_tables("") == []
    assert extract_tables("<p>prose only</p>") == []
    # cells outside any <tr>: implicit row (browser recovery)
    assert extract_tables("<table><td>x</td></table>") == [[["x"]]]


def test_table_rows_operator(spark):
    h = (
        "<html><body><table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>id</td><td>7</td></tr></table></body></html>"
    )
    df = spark.createDataFrame(
        [(7, bytearray(h.encode()))], "doc_id int, html binary"
    )
    out = table_rows(df).orderBy("row_idx").collect()
    assert [(r.table_idx, r.row_idx, r.cells) for r in out] == [
        (0, 0, ["k", "v"]),
        (0, 1, ["id", "7"]),
    ]
    # no shuffle in the plan: extraction + explode stay in one stage
    plan = table_rows(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
