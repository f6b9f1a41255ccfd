"""Block segmentation for boilerplate / main-content extraction.

The reference extracts the WHOLE visible text of a page (crawler.py:163 —
`soup.get_text()` after decomposing script/style); it has no notion of
boilerplate. For a training-data pipeline that is the first quality gap a
user hits: nav bars, headers, footers, and link farms dominate token counts
on real pages. This module segments a page into text BLOCKS (the jusText /
trafilatura unit of classification — Pomikálek 2011) so the Spark layer can
classify each block by link density and length and keep only main content.

Single pass over the same html.parser event stream the extractor uses
(htmlx/extractor.py:150), with the same FastTagPaths speedups and the same
script/style decomposition semantics, so block text is consistent with
`extract_visible_text` (a block split of the identical string-node stream).

Classification itself happens JVM-side in operators/boilerplate.py — this
walker only produces the per-block facts (text, word count, link-word
count), keeping the Python stage a pure parser exactly like extract_pages.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser
from typing import List, Optional

from .extractor import RAWTEXT_TAGS, VOID_TAGS, FastTagPaths

# Unlike the reference's visible-text extraction (which decomposes
# header/footer/nav wholesale, extractor.py DECOMPOSED_TAGS — crawler.py:160
# removes them before get_text), block segmentation must KEEP those
# subtrees: they are precisely the blocks the classifier needs to see and
# score as boilerplate. Only true non-content containers are dropped.
_DROPPED = frozenset({"script", "style"})

# HTML block-level elements: opening or closing one of these starts a new
# block. Inline elements (a, span, b, em, …) flow within the current block.
BLOCK_TAGS = frozenset(
    """
    address article aside blockquote dd details div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr li main nav
    ol p pre section table tbody td tfoot th thead tr ul
    """.split()
)

_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


@dataclass
class Block:
    """One segmented text block with the facts classification needs."""

    idx: int
    tag: str  # innermost block-level element ("body" when none is open)
    text: str  # stripped string nodes joined with " "
    n_words: int
    n_link_words: int  # words inside an <a> subtree
    is_heading: bool


class _BlockWalker(FastTagPaths, HTMLParser):
    """Splits the visible string-node stream on block-element boundaries."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: List[str] = []
        self._buf: List[str] = []
        self._link_depth = 0
        # current block accumulator: list of (string_node, was_in_link)
        self._parts: List[tuple] = []
        self._context = "body"
        self.blocks: List[Block] = []

    # -- data-node handling (same merge discipline as the extractor) ------
    def _end_data(self) -> None:
        if not self._buf:
            return
        data = "".join(self._buf)
        self._buf.clear()
        if any(t in RAWTEXT_TAGS or t in _DROPPED for t in self.stack):
            return
        self._parts.append((data, self._link_depth > 0))

    def _flush(self) -> None:
        self._end_data()
        if not self._parts:
            return
        texts, n_words, n_link = [], 0, 0
        for data, in_link in self._parts:
            stripped = data.strip()
            if not stripped:
                continue
            texts.append(stripped)
            w = len(stripped.split())
            n_words += w
            if in_link:
                n_link += w
        self._parts.clear()
        if not texts:
            return
        self.blocks.append(
            Block(
                idx=len(self.blocks),
                tag=self._context,
                text=" ".join(texts),
                n_words=n_words,
                n_link_words=n_link,
                is_heading=self._context in _HEADINGS,
            )
        )

    def _enclosing_block(self) -> str:
        for t in reversed(self.stack):
            if t in BLOCK_TAGS:
                return t
        return "body"

    # -- tag events --------------------------------------------------------
    def handle_starttag(self, tag, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()
            self._context = tag
        else:
            self._end_data()
        if tag == "a":
            self._link_depth += 1
        if tag not in VOID_TAGS:
            self.stack.append(tag)

    def handle_startendtag(self, tag, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in VOID_TAGS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag) -> None:
        if tag in BLOCK_TAGS:
            self._flush()
        else:
            self._end_data()
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] == tag:
                del self.stack[i:]
                break
        if tag in BLOCK_TAGS:
            self._context = self._enclosing_block()

    def close(self) -> None:
        super().close()
        self._flush()

    # -- non-text events ---------------------------------------------------
    def handle_comment(self, data) -> None:
        self._end_data()

    def handle_decl(self, decl) -> None:
        self._end_data()

    def handle_pi(self, data) -> None:
        self._end_data()

    def unknown_decl(self, data) -> None:
        self._end_data()

    def handle_data(self, data) -> None:
        self._buf.append(data)


def segment_blocks(html: Optional[str]) -> List[Block]:
    """Segment a page into text blocks (empty list for None/empty/broken)."""
    if not html:
        return []
    w = _BlockWalker()
    try:
        w.feed(html)
        w.close()
    except Exception:
        w._flush()  # keep whatever was segmented before the parse error
    return w.blocks
