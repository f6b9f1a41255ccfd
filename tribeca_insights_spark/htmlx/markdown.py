"""HTML → Markdown conversion — structure-preserving text extraction.

The reference renders Markdown REPORTS about pages (exporters/markdown.py)
but extracts page text flat (crawler.py:163 ``get_text``); modern
training-data pipelines increasingly keep the page's STRUCTURE in
lightweight Markdown (headings, lists, links) because structure carries
signal plain text loses. This walker is that converter: deterministic,
dependency-free, same html.parser + FastTagPaths event stream as the
other walkers.

Scope (deterministic subset, documented):
- ``h1``–``h6`` → ``#``-prefixed heading lines;
- block elements (``p``/``div``/…, the blocks.py ``BLOCK_TAGS`` set)
  → paragraphs separated by blank lines;
- ``<li>`` → ``- `` items (``<ol>`` items numbered ``1.`` ``2.`` … per
  list, nested lists restart their own counters);
- ``<blockquote>`` content → ``> ``-prefixed;
- ``<a href>`` → ``[text](href)``; nested markup inside the anchor is
  flattened to its text; anchors without href render as plain text;
- ``<img>`` → ``![alt](src)`` inline tokens;
- head/script/style/template subtrees dropped entirely;
- text nodes are stripped and joined with single spaces (the extractor's
  whitespace discipline); Markdown metacharacters in source text are NOT
  escaped (web-corpus text rarely collides; an escaping pass is a
  one-line ``regexp_replace`` downstream if a consumer needs it).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional

from .blocks import BLOCK_TAGS
from .extractor import FastTagPaths, RAWTEXT_TAGS, VOID_TAGS

_DROPPED = frozenset({"script", "style", "head", "template"})
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


class _MarkdownWalker(FastTagPaths, HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: List[str] = []
        self._drop_depth = 0
        self.blocks: List[str] = []
        self._parts: List[str] = []
        self._context = "body"
        # open-anchor state: (href, parts) — innermost only
        self._link: Optional[tuple] = None
        # ordered-list counters, one per open <ol>
        self._ol: List[int] = []
        self._li_marker: Optional[str] = None
        self._quote_depth = 0

    # -- emit helpers -------------------------------------------------------
    def _emit(self, token: str) -> None:
        tgt = self._link[1] if self._link is not None else self._parts
        tgt.append(token)

    def _flush(self) -> None:
        if self._link is not None:  # unclosed <a> at a block boundary
            self._close_link()
        text = " ".join(p for p in self._parts if p)
        self._parts = []
        marker, self._li_marker = self._li_marker, None
        if not text:
            return
        lvl = _HEADINGS.get(self._context)
        if lvl:
            text = "#" * lvl + " " + text
        elif marker:
            text = marker + text
        if self._quote_depth:
            text = "> " * self._quote_depth + text
        self.blocks.append(text)

    def _close_link(self) -> None:
        href, parts = self._link
        self._link = None
        text = " ".join(p for p in parts if p)
        if href:
            self._emit(f"[{text}]({href})")
        elif text:
            self._emit(text)

    def _enclosing_block(self) -> str:
        for t in reversed(self.stack):
            if t in BLOCK_TAGS:
                return t
        return "body"

    # -- events -------------------------------------------------------------
    def handle_starttag(self, tag, attrs) -> None:
        if tag in _DROPPED or tag in RAWTEXT_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._context = tag
            if tag == "ol":
                self._ol.append(0)
            elif tag == "li":
                if self._ol:
                    self._ol[-1] += 1
                    self._li_marker = f"{self._ol[-1]}. "
                else:
                    self._li_marker = "- "
            elif tag == "blockquote":
                self._quote_depth += 1
        if tag == "a":
            if self._link is not None:
                self._close_link()
            href = next((v for k, v in attrs if k == "href"), None)
            self._link = (href, [])
        elif tag == "img":
            alt = next((v for k, v in attrs if k == "alt"), "") or ""
            src = next((v for k, v in attrs if k == "src"), "") or ""
            self._emit(f"![{alt.strip()}]({src})")
        if tag not in VOID_TAGS:
            self.stack.append(tag)

    def handle_startendtag(self, tag, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in VOID_TAGS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag) -> None:
        if tag in _DROPPED or tag in RAWTEXT_TAGS:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag == "a" and self._link is not None:
            self._close_link()
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] == tag:
                del self.stack[i:]
                break
        if tag in BLOCK_TAGS:
            if tag == "ol" and self._ol:
                self._ol.pop()
            elif tag == "blockquote" and self._quote_depth:
                self._quote_depth -= 1
            self._context = self._enclosing_block()

    def handle_data(self, data) -> None:
        if self._drop_depth:
            return
        s = data.strip()
        if s:
            self._emit(" ".join(s.split()))

    def close(self) -> None:
        super().close()
        self._flush()


def html_to_markdown(html: Optional[str]) -> str:
    """Convert a page to Markdown (empty string for None/empty input;
    broken markup yields whatever was convertible — never raises)."""
    if not html:
        return ""
    w = _MarkdownWalker()
    try:
        w.feed(html)
        w.close()
    except Exception:
        try:
            w._flush()
        except Exception:
            pass
    return "\n\n".join(w.blocks)
