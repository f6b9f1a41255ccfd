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
