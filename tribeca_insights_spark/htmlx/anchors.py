"""Anchor (href, visible text) pair extraction.

A deliberately tiny, standalone ``html.parser`` subclass — separate from
``extractor.PageWalker`` so the byte-parity visible-text path stays
untouched. Mirrors what the reference would get from
``soup.find_all("a")`` over the FULL soup (crawler.py:93-101 iterates all
anchors before boilerplate decomposition), i.e. nav/header/footer anchors
ARE included: for link-graph work (anchor-text aggregation, PageRank
seeding) boilerplate links are signal, not noise.

Nested ``<a>`` is invalid HTML; html.parser still surfaces whatever tag
soup arrives, so we keep a stack and credit text to every open anchor.
Anchor text is whitespace-collapsed with the same ``\\s+``-to-space rule
as the visible-text extractor (reference text_utils.py:133-134).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

_WS = re.compile(r"\s+")


class _AnchorWalker(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pairs: List[Tuple[str, str]] = []
        self._open: List[Tuple[Optional[str], List[str]]] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = None
            for k, v in attrs:
                if k == "href" and href is None:
                    href = v
            self._open.append((href, []))

    def handle_startendtag(self, tag, attrs):
        if tag == "a":  # <a/> — empty anchor, emit immediately
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)

    def handle_data(self, data):
        if data and self._open:
            for _, parts in self._open:
                parts.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._open:
            href, parts = self._open.pop()
            if href is not None:
                self.pairs.append(
                    (href, _WS.sub(" ", "".join(parts)).strip())
                )

    def close(self):
        super().close()
        while self._open:  # EOF with unclosed <a>
            self.handle_endtag("a")


def extract_anchors(html: str) -> List[Tuple[str, str]]:
    """All ``(href, collapsed anchor text)`` pairs in document order.

    Anchors without an ``href`` attribute are skipped (they are jump
    targets, not links). Tolerant of malformed HTML — never raises.
    """
    w = _AnchorWalker()
    try:
        w.feed(html)
        w.close()
    except Exception:  # pragma: no cover — html.parser is tolerant already
        pass
    return w.pairs


class _RelAnchorWalker(_AnchorWalker):
    """`_AnchorWalker` that also records each anchor's ``rel`` tokens
    (lowercased, space-split — ``rel="ugc nofollow"`` is a token LIST
    per the HTML spec, not a literal)."""

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = rel = None
            for k, v in attrs:
                if k == "href" and href is None:
                    href = v
                elif k == "rel" and rel is None:
                    rel = v
            self._open.append(((href, rel), []))

    def handle_endtag(self, tag):
        if tag == "a" and self._open:
            (href, rel), parts = self._open.pop()
            if href is not None:
                toks = (rel or "").lower().split()
                self.pairs.append(
                    (href, _WS.sub(" ", "".join(parts)).strip(), toks)
                )


def extract_anchors_rel(html: str) -> List[tuple]:
    """All ``(href, text, rel_tokens)`` triples in document order —
    the link-graph needs ``rel`` to honor nofollow/ugc/sponsored
    edge semantics."""
    w = _RelAnchorWalker()
    try:
        w.feed(html)
        w.close()
    except Exception:  # pragma: no cover
        pass
    return w.pairs
