"""Readability-style main-content extraction (htmlx/readability.py)."""

from tribeca_insights_spark.htmlx.readability import (
    build_tree,
    extract_main_content,
    node_text_stats,
    score_tree,
)

ARTICLE = (
    "<html><body>"
    "<nav class='nav'><a href='/a'>Home</a><a href='/b'>About</a>"
    "<a href='/c'>Contact</a><a href='/d'>Blog</a></nav>"
    "<div class='sidebar'><a href='/x'>link one here</a>"
    "<a href='/y'>link two here</a><a href='/z'>link three here</a></div>"
    "<div class='article-content'>"
    "<p>This is the real story of the engine, told plainly and at length, "
    "with several clauses, commas, and a satisfying conclusion.</p>"
    "<p>A second paragraph continues the account, describing partitioning, "
    "shuffles, and the virtue of broadcast joins, in measured prose.</p>"
    "<p>The third paragraph wraps up the narrative arc with a flourish, "
    "because every article deserves an ending.</p>"
    "</div>"
    "<footer class='footer'>© 2026 Example</footer>"
    "</body></html>"
)


def test_article_body_wins():
    out = extract_main_content(ARTICLE)
    assert "real story of the engine" in out["main_text"]
    assert "second paragraph" in out["main_text"]
    # boilerplate classified out
    assert "Home" not in out["main_text"]
    assert "link one here" not in out["main_text"]
    assert "© 2026" not in out["main_text"]
    assert out["score"] > 0
    assert "article-content" in out["node_hint"]


def test_link_farm_penalized():
    html = (
        "<html><body>"
        "<div id='content'><p>Genuine prose paragraph, long enough to score, "
        "with commas, detail, and substance throughout the entire text.</p></div>"
        "<div id='links'>"
        + "".join(
            f"<p>Intro words <a href='/l{i}'>a very long anchor text label "
            f"number {i} padding padding</a></p>" for i in range(12)
        )
        + "</div></body></html>"
    )
    out = extract_main_content(html)
    assert "Genuine prose" in out["main_text"]
    assert "anchor text label" not in out["main_text"]


def test_class_hints_shift_choice():
    mk = lambda cls: (  # noqa: E731
        f"<html><body><div class='{cls}'>"
        "<p>Same length paragraph with commas, words, and enough text to "
        "pass the prose threshold comfortably, twice over.</p></div>"
        "<div class='other'>"
        "<p>Same length paragraph with commas, words, and enough text to "
        "pass the prose threshold comfortably, twice over.</p></div>"
        "</body></html>"
    )
    win = extract_main_content(mk("post-body"))
    lose = extract_main_content(mk("sidebar-widget"))
    assert "post-body" in win["node_hint"]
    assert "sidebar-widget" not in lose["node_hint"]


def test_short_page_fallback():
    out = extract_main_content("<p>tiny</p>")
    assert out["main_text"] == "tiny"
    assert out["node_tag"] in ("#root", "body")


def test_tree_builder_stats():
    root = build_tree("<div><p>ab cd</p><a href='/x'>link text</a></div>")
    text, n, link_len = node_text_stats(root)
    assert text == "ab cd link text"
    assert link_len == len("link text")
    ranked = score_tree(root)
    assert isinstance(ranked, list)


def test_spark_operator(spark):
    from pyspark.sql import functions as F

    from tribeca_insights_spark.operators.readability import extract_main

    docs = spark.createDataFrame(
        [("https://a.com/1", ARTICLE.encode())], ["url", "html"]
    )
    row = extract_main(docs).collect()[0]
    assert "real story of the engine" in row["main_text"]
    assert row["node_tag"] == "div"
    # plan shape: vectorized, shuffle-free
    from tests.test_plans import plan_str

    p = plan_str(extract_main(docs))
    assert "ArrowEvalPython" in p and "Exchange" not in p
