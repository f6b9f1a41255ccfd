"""Sink parity — byte-layout tests for the reference exporter formats
(SURVEY.md §2.1 S7-S16; layouts per exporters/markdown.py:34-128,
exporters/json.py:24-37/150-230, exporters/csv.py:27-83, storage.py:65-82)."""

import json
import os

from tribeca_insights_spark.operators.sinks import (
    build_page_data,
    build_project_json,
    render_page_json,
    render_page_markdown,
    write_project_tree,
)

HTML = (
    "<html><head><title>Doc 7</title></head><body>"
    "<h1>Heading 7</h1><p>alpha alpha beta gamma</p>"
    '<a href="https://ext.example.org/p">ext</a>'
    '<img src="/i.png" alt="pic">'
    "</body></html>"
)
URL = "https://alpha.example.com/docs/7"


def test_render_markdown_exact():
    md = render_page_markdown(URL, HTML)
    expected = (
        "# `https://alpha.example.com/docs/7`\n\n"
        "**Title**: Doc 7\n\n"
        "**Meta Description**: \n\n"
        "## Headings\n"
        "- # Heading 7\n\n"
        "## Word Frequency (Top 50)\n"
        "- **alpha**: 2\n"
        "- **doc**: 1\n"
        "- **heading**: 1\n"
        "- **beta**: 1\n"
        "- **gamma**: 1\n"
        "- **ext**: 1\n"
        "\n"
        "## External Links\n"
        "- https://ext.example.org/p\n\n"
        "## Images with ALT\n"
        "- `src`: /i.png\n  - alt: pic\n"
        "## Cleaned Text\n"
        "```\nDoc 7 Heading 7 alpha alpha beta gamma ext...\n```\n\n"
        "## Raw HTML\n"
        "```html\n" + HTML + "\n... (truncated)\n```\n\n"
        "---\n"
        "_Total words analyzed: 7_\n"
    )
    assert md == expected


def test_render_markdown_empty_sections():
    md = render_page_markdown("https://x.com/", "<html><body><p>hi zz</p></body></html>")
    assert "**Title**: (no title)\n\n" in md
    assert "## Headings\n_No headings found._\n\n" in md
    assert "## External Links\n_No external links found._\n\n" in md
    assert "## Images with ALT\n_No images found._\n\n" in md
    # 'hi' is len-2 (kept), stopwords off
    assert "_Total words analyzed: 2_\n" in md


def test_render_markdown_image_defaults():
    # missing src attr → "–"; empty alt → "_(no ALT)_" (markdown.py:75-78)
    md = render_page_markdown("https://x.com/a", "<img alt=''><img src='/s.png'>")
    assert "- `src`: –\n  - alt: _(no ALT)_" in md
    assert "- `src`: /s.png\n  - alt: _(no ALT)_" in md


def test_page_json_exact():
    js = render_page_json(URL, HTML, "en")
    data = json.loads(js)
    assert list(data.keys()) == [
        "url", "slug", "title", "meta_description", "headings", "word_count",
        "word_frequency", "images", "external_links", "page_hash",
        "md_filename",
    ]
    # word_frequency key order = first token occurrence (dict(Counter))
    assert list(data["word_frequency"].keys()) == [
        "doc", "heading", "alpha", "beta", "gamma", "ext"
    ]
    assert data["word_frequency"]["alpha"] == 2
    assert data["slug"] == "docs-7"
    assert data["md_filename"] == "docs-7.md"
    assert data["images"] == [{"src": "/i.png", "alt": "pic"}]
    assert data["external_links"] == ["https://ext.example.org/p"]
    # layout: ensure_ascii=False, indent=2
    assert js == json.dumps(data, ensure_ascii=False, indent=2)


def test_build_project_json_upsert_semantics():
    p1 = {"slug": "a", "title": "A1"}
    p2 = {"slug": "b", "title": "B"}
    first = build_project_json(
        [p1, p2], "proj", "https://p.com", "en", 10, 2, 0.0,
        now_iso="2026-01-01T00:00:00",
    )
    assert first["created_at"] == "2026-01-01T00:00:00"
    assert first["pages_count"] == 2
    # update: merge by slug last-wins, created_at preserved (json.py:195-201)
    p1b = {"slug": "a", "title": "A2"}
    second = build_project_json(
        [p1b], "proj", "https://p.com", "en", 10, 2, 0.0,
        existing=first, now_iso="2026-02-02T00:00:00",
    )
    assert second["created_at"] == "2026-01-01T00:00:00"
    assert second["last_updated_at"] == "2026-02-02T00:00:00"
    assert second["pages_count"] == 2
    by_slug = {p["slug"]: p for p in second["pages"]}
    assert by_slug["a"]["title"] == "A2"
    assert by_slug["b"]["title"] == "B"


def test_write_project_tree(spark, tmp_path):
    from tribeca_insights_spark.schemas import DOCS_SCHEMA

    rows = [
        {
            "url": f"https://site.com/p/{i}",
            "warc_ts": None,
            "html": (
                f"<html><head><title>T{i}</title></head><body>"
                f"<p>common common word{i}</p>"
                f'<a href="https://out.example.net/{i}">x</a></body></html>'
            ).encode(),
            "text": "",
            "lang": "en",
        }
        for i in range(3)
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    folder = str(tmp_path / "proj")
    stats = write_project_tree(
        docs, folder, "site-com", base_url="https://site.com", language="en",
        now_iso="2026-03-01T12:00:00",
    )
    assert stats["n_pages"] == 3
    for i in range(3):
        assert os.path.exists(f"{folder}/pages_md/p-{i}.md")
        assert os.path.exists(f"{folder}/pages_json/p-{i}.json")
    idx = open(f"{folder}/index.md", encoding="utf-8").read()
    assert idx.startswith("# Analyzed Pages Index\n\n")
    assert "- [P 0](pages_md/p-0.md)\n" in idx
    ext = json.load(open(f"{folder}/external_urls.json", encoding="utf-8"))
    assert ext == sorted(f"https://out.example.net/{i}" for i in range(3))
    extmd = open(f"{folder}/external_urls.md", encoding="utf-8").read()
    assert extmd.startswith("# External URLs\n\n- https://out.example.net/0\n")
    csv = open(f"{folder}/keyword_frequency_site-com.csv", encoding="utf-8").read()
    lines = csv.strip().split("\n")
    assert lines[0] == "word,freq"
    assert lines[1] == "common,6"  # top word across the 3 pages
    visited = open(f"{folder}/visited_urls_site-com.csv", encoding="utf-8").read()
    assert visited.splitlines()[0] == "URL,Status,Data,MD File,JSON File"
    assert ",1,2026-03-01," in visited.splitlines()[1]
    proj = json.load(open(f"{folder}/project_site-com.json", encoding="utf-8"))
    assert proj["pages_count"] == 3
    assert proj["created_at"] == "2026-03-01T12:00:00"
    # idempotent upsert: second emit merges by slug, preserves created_at
    write_project_tree(
        docs, folder, "site-com", base_url="https://site.com", language="en",
        now_iso="2026-04-01T00:00:00",
    )
    proj2 = json.load(open(f"{folder}/project_site-com.json", encoding="utf-8"))
    assert proj2["pages_count"] == 3
    assert proj2["created_at"] == "2026-03-01T12:00:00"
    assert proj2["last_updated_at"] == "2026-04-01T00:00:00"


def test_page_data_matches_extract_udf_fields():
    """build_page_data (sink path) must agree with the extraction UDF fields
    on the golden corpus — same parse core, same tokens."""
    from tribeca_insights_spark.fixtures import gen_corpus, golden_records

    rows = gen_corpus(40, seed=7)
    gold = golden_records(rows)
    for r, g in zip(rows, gold):
        pd_ = build_page_data(r["url"], r["html"].decode("utf-8"), r["lang"])
        assert pd_["title"] == g["title"]
        assert pd_["word_frequency"] == g["word_frequency"]
        assert pd_["external_links"] == g["external_links"]
        assert pd_["page_hash"] == g["page_hash"]
        assert pd_["slug"] == g["slug"]


def test_markdown_title_meta_error_fallbacks(monkeypatch):
    """Reference exporters/markdown.py:53-65 parity: when title/meta
    extraction blows up, the report still renders with the literal
    '(error extracting title)' / '(error extracting description)' bytes."""
    from tribeca_insights_spark.operators import sinks as sk

    real_parse = sk.parse_page

    class PathologicalPage:
        def __init__(self, inner):
            self._inner = inner

        @property
        def title(self):
            # TypeError, not AttributeError: a property raising
            # AttributeError silently falls back to __getattr__
            raise TypeError("bs4-edge: unexpected node type in .string")

        @property
        def meta_description(self):
            raise TypeError("bs4-edge: unexpected node type")

        def __getattr__(self, name):
            return getattr(self._inner, name)

    monkeypatch.setattr(
        sk, "parse_page", lambda html: PathologicalPage(real_parse(html))
    )
    md = sk.render_page_markdown(
        "https://x.example.com/p",
        "<html><head><title>T</title></head><body><p>hello world</p></body></html>",
    )
    assert "**Title**: (error extracting title)\n\n" in md
    assert "**Meta Description**: (error extracting description)\n\n" in md
    assert "hello world" in md  # rest of the report still rendered
