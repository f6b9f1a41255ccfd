"""PDF text extraction (htmlx/pdfx.py): pure-python parse of simple PDFs,
plain and FlateDecode streams, escapes, hex strings, TJ arrays."""

from tribeca_insights_spark.htmlx.pdfx import extract_pdf_text, make_pdf


def test_roundtrip_plain():
    lines = ["Hello PDF world", "Second line, with commas", "third (line)"]
    assert extract_pdf_text(make_pdf(lines)) == "\n".join(lines)


def test_roundtrip_flate():
    lines = ["compressed content stream", "déjà vu naïve façade"]
    pdf = make_pdf(lines, compress=True)
    assert b"FlateDecode" in pdf
    assert extract_pdf_text(pdf) == "\n".join(lines)


def test_escapes_and_specials():
    lines = ["parens (nested) and \\ backslash", "tabs\tand friends"]
    assert extract_pdf_text(make_pdf(lines)) == "\n".join(lines)


def test_tj_array_and_hex():
    # hand-built content exercising TJ kerning arrays and hex strings
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Kerned ) -120 (words)] TJ "
        b"0 -14 Td <48656C6C6F> Tj "
        b"ET"
    )
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "Kerned words\nHello"


def test_garbage_inputs():
    assert extract_pdf_text(b"") == ""
    assert extract_pdf_text(b"not a pdf at all") == ""
    assert extract_pdf_text(b"%PDF-1.4\nstream\n\xff\xfe\nendstream") == ""


def test_spark_roundtrip_operator(spark):
    from pyspark.sql import functions as F

    from tribeca_insights_spark.operators.pdf import (
        extract_pdf_pages,
        make_pdf_udf,
    )

    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("Document number "), F.col("id").cast("string"),
                 F.lit("\nwith a second line")).alias("text"),
        (F.col("id") % 2 == 0).alias("compress"),
    )
    pdfs = docs.select(
        "doc_id", "text",
        make_pdf_udf(F.col("text"), F.col("compress")).alias("pdf"),
    )
    out = extract_pdf_pages(pdfs).select("doc_id", "text", "pdf_text").collect()
    assert len(out) == 20
    for r in out:
        assert r["pdf_text"] == r["text"]


# --- positioned layout parse -------------------------------------------------


def test_layout_reorders_interleaved_columns():
    from tribeca_insights_spark.htmlx.pdfx import (
        extract_pdf_text,
        extract_pdf_text_layout,
        make_pdf_columns,
    )

    cols = [["A1", "A2", "A3"], ["B1", "B2"]]
    pdf = make_pdf_columns(cols)
    # the fixture emits row-major: stream order is the WRONG reading order
    assert extract_pdf_text(pdf).split("\n") == ["A1", "B1", "A2", "B2", "A3"]
    # layout recovery reads column-major
    assert extract_pdf_text_layout(pdf).split("\n") == [
        "A1", "A2", "A3", "B1", "B2",
    ]
    # compressed stream gives identical text
    assert extract_pdf_text_layout(
        make_pdf_columns(cols, compress=True)
    ) == extract_pdf_text_layout(pdf)


def test_layout_falls_back_to_stream_order_without_positions():
    from tribeca_insights_spark.htmlx.pdfx import (
        extract_pdf_text_layout,
        make_pdf,
    )

    # make_pdf uses relative Td moves from one origin: a single column —
    # positioned parse still orders it top-down correctly
    assert extract_pdf_text_layout(make_pdf(["l1", "l2"])) == "l1\nl2"
    assert extract_pdf_text_layout(b"") == ""
    assert extract_pdf_text_layout(b"not a pdf") == ""


def test_length_delimited_stream_survives_cr_tail():
    """A FlateDecode body ending in 0x0D must not be truncated by the
    endstream delimiter scan (the doc-21 regression: zlib output ended
    with \\r and the old regex ate it)."""
    from tribeca_insights_spark.htmlx.pdfx import (
        extract_pdf_text_layout,
        make_pdf_columns,
    )

    cols = [["Alpha 21", "Bravo src1"], ["Charlie fr", "Delta 0"]]
    pdf = make_pdf_columns(cols, compress=True)
    import zlib as _z

    body = _z.compress(
        b"\n".join(
            f"BT /F1 12 Tf 1 0 0 1 {72 + 220 * ci} {720 - 14 * r} Tm "
            f"({cols[ci][r]}) Tj ET".encode()
            for r in range(2)
            for ci in range(2)
        )
    )
    assert body.endswith(b"\r")  # the trap this test exists for
    assert extract_pdf_text_layout(pdf) == (
        "Alpha 21\nBravo src1\nCharlie fr\nDelta 0"
    )


def test_positioned_runs_linefeeds_and_leading():
    from tribeca_insights_spark.htmlx.pdfx import _positioned_runs

    # TL sets leading; T* advances one leading down; ' implies next-line
    c = (b"BT /F1 12 Tf 20 TL 1 0 0 1 100 700 Tm (l1) Tj "
         b"T* (l2) Tj (l3) ' ET")
    assert _positioned_runs(c) == [
        (100.0, 700.0, "l1"),
        (100.0, 680.0, "l2"),
        (100.0, 660.0, "l3"),
    ]
    # TD translates AND sets leading to -ty for subsequent T*
    c2 = b"BT 72 700 Td (a) Tj 0 -10 TD (b) Tj T* (c) Tj ET"
    assert _positioned_runs(c2) == [
        (72.0, 700.0, "a"),
        (72.0, 690.0, "b"),
        (72.0, 680.0, "c"),
    ]
    # BT resets the matrix; junk numbers before an op are cleared after it
    c3 = b"BT 1 0 0 1 50 50 Tm ET BT (origin) Tj ET"
    assert _positioned_runs(c3) == [(0.0, 0.0, "origin")]
