"""HTML table extraction — ``<table>`` → rows of cell texts.

The reference extracts flat visible text only (crawler.py:163); tables
collapse into word soup. For a training-data / analytics pipeline the
tabular structure IS the signal (relational web extraction — WebTables,
Cafarella 2008): this walker recovers every table as an ordered list of
rows, each row an ordered list of cell texts.

Semantics (browser-shaped, deterministic):
- tables are numbered in document order of their ``<table>`` open tags;
- character data belongs to the INNERMOST open cell, so a table nested
  inside a ``<td>`` keeps its own rows and contributes nothing to the
  outer cell (its text is structure, not content, of the outer table);
- an unclosed ``<td>``/``<tr>`` is auto-closed by the next ``<td>``,
  ``<tr>``, or ``</table>`` (the html5 tree-builder recovery browsers
  apply); ``<th>`` is a cell like ``<td>``;
- script/style content inside cells is dropped, same as the extractor;
- cell text is its string nodes stripped and joined with a single space.

Same html.parser + FastTagPaths event stream as the other walkers, one
pass per page, tolerant of broken markup (never raises).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional

from .extractor import FastTagPaths, RAWTEXT_TAGS

_CELL_TAGS = frozenset({"td", "th"})
_DROPPED = frozenset({"script", "style"})


class _TableCtx:
    __slots__ = ("rows", "cur_row", "cur_cell")

    def __init__(self) -> None:
        self.rows: List[List[str]] = []
        self.cur_row: Optional[List[str]] = None
        self.cur_cell: Optional[List[str]] = None


class _TableWalker(FastTagPaths, HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: List[List[List[str]]] = []
        self._stack: List[_TableCtx] = []
        self._order: List[_TableCtx] = []
        self._raw_depth = 0

    # -- cell/row lifecycle -------------------------------------------------
    def _close_cell(self, t: _TableCtx) -> None:
        if t.cur_cell is None:
            return
        text = " ".join(
            s for s in (p.strip() for p in t.cur_cell) if s
        )
        if t.cur_row is None:  # cell outside any <tr>: implicit row
            t.cur_row = []
        t.cur_row.append(text)
        t.cur_cell = None

    def _close_row(self, t: _TableCtx) -> None:
        self._close_cell(t)
        if t.cur_row is not None:
            t.rows.append(t.cur_row)
            t.cur_row = None

    # -- events ---------------------------------------------------------------
    def handle_starttag(self, tag, attrs) -> None:
        if tag in _DROPPED or tag in RAWTEXT_TAGS:
            self._raw_depth += 1
            return
        if tag == "table":
            ctx = _TableCtx()
            self._stack.append(ctx)
            self._order.append(ctx)
        elif self._stack:
            t = self._stack[-1]
            if tag == "tr":
                self._close_row(t)
                t.cur_row = []
            elif tag in _CELL_TAGS:
                self._close_cell(t)
                t.cur_cell = []

    def handle_startendtag(self, tag, attrs) -> None:
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag) -> None:
        if tag in _DROPPED or tag in RAWTEXT_TAGS:
            if self._raw_depth > 0:
                self._raw_depth -= 1
            return
        if not self._stack:
            return
        t = self._stack[-1]
        if tag == "table":
            self._close_row(t)
            self._stack.pop()
        elif tag == "tr":
            self._close_row(t)
        elif tag in _CELL_TAGS:
            self._close_cell(t)

    def handle_data(self, data) -> None:
        if self._raw_depth > 0 or not self._stack:
            return
        t = self._stack[-1]
        if t.cur_cell is not None and data.strip():
            t.cur_cell.append(data)

    def close(self) -> None:
        super().close()
        while self._stack:  # unclosed tables at EOF
            self._close_row(self._stack[-1])
            self._stack.pop()
        self.tables = [c.rows for c in self._order]


def extract_tables(html: Optional[str]) -> List[List[List[str]]]:
    """All tables of a page: ``tables[table_idx][row_idx][cell_idx]`` —
    empty list for None/empty/table-free/broken input (never raises)."""
    if not html:
        return []
    w = _TableWalker()
    try:
        w.feed(html)
        w.close()
    except Exception:
        try:
            w.close()
        except Exception:
            pass
    return w.tables
