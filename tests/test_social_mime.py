"""Round-4 wave: social profiles (q346) and MIME sniff audit (q347)."""

from pyspark.sql import Row

from tribeca_insights_spark.operators.meta import social_profile_links
from tribeca_insights_spark.operators.multimodal import mime_sniff_mismatch


def _soc(spark, html):
    df = spark.createDataFrame([Row(doc_id=1, html=html)])
    return {(r["platform"], r["handle"])
            for r in social_profile_links(df).collect()}


def test_platforms_and_case_fold(spark):
    got = _soc(
        spark,
        '<a href="https://github.com/TORVALDS/linux">g</a> '
        '<a href="https://x.com/Jack">x</a> '
        '<a href="https://www.linkedin.com/in/some-person">l</a> '
        "ping @User@mastodon.social",
    )
    assert got == {
        ("github", "torvalds"), ("x", "jack"),
        ("linkedin", "some-person"), ("mastodon", "@user@mastodon.social"),
    }


def test_reserved_twitter_paths_excluded(spark):
    got = _soc(spark, '<a href="https://twitter.com/intent/tweet?x=1">t</a>'
                      '<a href="https://x.com/share">s</a>')
    assert got == set()


def test_email_not_mastodon(spark):
    # bare email lacks the leading @ that the fediverse form requires
    assert _soc(spark, "mail me: user@example.com") == set()


def _mime(spark, declared, payload):
    df = spark.createDataFrame(
        [Row(doc_id=1, content_type=declared, payload=payload)],
        "doc_id bigint, content_type string, payload binary",
    )
    r = mime_sniff_mismatch(df).collect()[0]
    return r["declared"], r["sniffed"], r["mismatch"]


def test_pdf_smuggled_as_html(spark):
    assert _mime(spark, "text/html", b"%PDF-1.4 x") == (
        "text/html", "application/pdf", 1)


def test_honest_html_with_params(spark):
    assert _mime(spark, "Text/HTML; charset=utf-8",
                 b"\n  <!doctype html><html>") == (
        "text/html", "text/html", 0)


def test_gif_and_webp_magic(spark):
    assert _mime(spark, "image/gif", b"GIF89a....")[1] == "image/gif"
    assert _mime(spark, "image/webp",
                 b"RIFF\x00\x00\x00\x00WEBPVP8 ")[1] == "image/webp"


def test_unknown_bytes_never_mismatch(spark):
    assert _mime(spark, "application/pdf", b"opaquedata")[2] == 0


# --- round-5 ADVICE regressions ----------------------------------------------


def test_host_boundary_rejects_substring_domains(spark):
    # 'x.com/' inside dropbox.com / 'github.com/' inside mygithub.com
    # must not emit handles (ADVICE r4, meta.py host boundary)
    got = _soc(
        spark,
        '<a href="https://dropbox.com/sh12abc">d</a> '
        '<a href="https://mygithub.com/evilco">g</a> '
        '<a href="https://netflix.com/title/123">n</a> '
        '<a href="https://wix.com/site">w</a>',
    )
    assert got == set()


def test_host_boundary_accepts_www_and_bare(spark):
    got = _soc(
        spark,
        '<a href="https://www.x.com/alice">1</a> '
        'see x.com/bob and https://www.github.com/carol today',
    )
    assert got == {("x", "alice"), ("x", "bob"), ("github", "carol")}


def test_declared_xml_not_mismatch_on_markup_sniff(spark):
    # markup is a sniff CLASS: '<' bytes are consistent with any
    # declared html/xml/svg type (ADVICE r4, multimodal.py)
    assert _mime(spark, "application/xml",
                 b'<?xml version="1.0"?><rss/>') == (
        "application/xml", "text/xml", 0)
    assert _mime(spark, "image/svg+xml",
                 b'<svg xmlns="http://www.w3.org/2000/svg"/>') == (
        "image/svg+xml", "image/svg+xml", 0)
    assert _mime(spark, "application/rss+xml",
                 b"<rss version=\"2.0\"><channel/></rss>") == (
        "application/rss+xml", "text/html", 0)
    assert _mime(spark, "application/atom+xml",
                 b'<?xml version="1.0"?><feed/>')[2] == 0


def test_markup_sniff_still_flags_nonmarkup_declared(spark):
    # cross-class conflict stays a mismatch: html bytes under a
    # declared image type
    assert _mime(spark, "image/png", b"<html><body>x</body></html>") == (
        "image/png", "text/html", 1)
