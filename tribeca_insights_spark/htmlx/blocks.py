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


# ---------------------------------------------------------------------------
# span-tracking segmentation (north_rule: "extracted text/spans per document")
# ---------------------------------------------------------------------------


class _SpanWalker(_BlockWalker):
    """`_BlockWalker` that additionally records, per block, the character
    span ``[start, end)`` in the DECODED html string covering the block's
    visible source text: ``start`` = offset of the first non-whitespace
    character of the block's first visible string node, ``end`` = one past
    the last non-whitespace character of its last visible string node.

    For a single-text-node block, ``html[start:end]`` is exactly the raw
    source of the block text (pre-whitespace-collapse, pre-charref-
    interpolation). For multi-node blocks ("about … ext") the span is the
    smallest source range covering all the block's visible nodes, so it
    includes the inline markup between them — the contract a span-keyed
    audit or highlight layer needs.

    Positions: html.parser's ``goahead`` loop calls ``updatepos(i, j)``
    after consuming each token, and tokens are contiguous, so at the time
    any handler runs, the last ``updatepos`` end is exactly the current
    token's START offset. ``FastTagPaths`` discards the stdlib's
    line/column bookkeeping (extractor.py:143), so this walker overrides
    ``updatepos`` to keep the absolute index instead — O(1), no newline
    scans. A visible data run opens at its token start and closes at the
    start of the NEXT structural event (the ``<`` of the following
    tag/comment/decl), with the raw slice between them stripped of
    leading/trailing whitespace. Exact under ``convert_charrefs=True``
    because all lengths are measured on the raw source slice, never on
    the interpolated text. Single-``feed`` usage only (offsets are
    indices into one fed string; ``segment_blocks_with_spans`` feeds
    once).
    """

    def __init__(self, html: str) -> None:
        super().__init__()
        self._html = html
        self._apos = 0  # absolute offset of the token now being handled
        self._run_start: Optional[int] = None
        self._blk_start: Optional[int] = None
        self._blk_end: Optional[int] = None
        self.spans: List[tuple] = []  # aligned with self.blocks

    def updatepos(self, i, j):  # called by goahead after every token
        self._apos = j
        return j

    def _abs(self) -> int:
        return self._apos

    def _close_run(self, pos: int) -> None:
        if self._run_start is None:
            return
        seg = self._html[self._run_start : pos]
        st = self._run_start + (len(seg) - len(seg.lstrip()))
        en = self._run_start + len(seg.rstrip())
        self._run_start = None
        if en <= st:
            return
        if self._blk_start is None:
            self._blk_start = st
        self._blk_end = en

    def handle_data(self, data) -> None:
        if (
            self._run_start is None
            and data.strip()
            and not any(
                t in RAWTEXT_TAGS or t in _DROPPED for t in self.stack
            )
        ):
            self._run_start = self._abs()
        super().handle_data(data)

    def _flush(self) -> None:
        n0 = len(self.blocks)
        super()._flush()
        if len(self.blocks) > n0:
            self.spans.append((self._blk_start, self._blk_end))
        self._blk_start = None
        self._blk_end = None

    # every structural event closes the open data run at its own position
    def handle_starttag(self, tag, attrs) -> None:
        self._close_run(self._abs())
        super().handle_starttag(tag, attrs)

    def handle_endtag(self, tag) -> None:
        self._close_run(self._abs())
        super().handle_endtag(tag)

    def handle_startendtag(self, tag, attrs) -> None:
        self._close_run(self._abs())
        # _BlockWalker.handle_startendtag delegates to handle_starttag /
        # handle_endtag (already-closed run → both _close_run calls no-op)
        super().handle_startendtag(tag, attrs)

    def handle_comment(self, data) -> None:
        self._close_run(self._abs())
        super().handle_comment(data)

    def handle_decl(self, decl) -> None:
        self._close_run(self._abs())
        super().handle_decl(decl)

    def handle_pi(self, data) -> None:
        self._close_run(self._abs())
        super().handle_pi(data)

    def unknown_decl(self, data) -> None:
        self._close_run(self._abs())
        super().unknown_decl(data)

    def close(self) -> None:
        self._close_run(len(self._html))
        super().close()


def segment_blocks_with_spans(
    html: Optional[str],
) -> List[tuple]:
    """Segment a page into blocks WITH source spans: one
    ``(Block, (start, end))`` per block — ``(None, None)`` span when the
    block's text never appeared as a trackable source run (defensive;
    does not occur for well-formed input). Same tolerance contract as
    ``segment_blocks``."""
    if not html:
        return []
    w = _SpanWalker(html)
    try:
        w.feed(html)
        w.close()
    except Exception:
        w._flush()
    # blocks/spans stay aligned because _flush appends to both
    return list(zip(w.blocks, w.spans))
