"""Minimal PDF text extraction (north_rule: "PDF/layout parse").

Dependency-free extractor for the common simple case: PDF 1.x files whose
page content streams are plain or FlateDecode-compressed (zlib is stdlib)
and whose text is written with the standard text-showing operators. Scope
and honesty:

* handled: ``Tj`` (show string), ``'`` / ``"`` (next-line show), ``TJ``
  (array show with kerning), literal strings with escapes/octal, hex
  strings ``<...>``, FlateDecode streams, multiple pages/streams; newline
  emitted on ``Td/TD/T*/'/"`` line moves, space between same-line shows;
* NOT handled (returns best-effort text, never raises): CID/Type0 fonts
  with ToUnicode CMaps (hex shows decode as latin-1 bytes), encryption,
  object streams (PDF 1.5 /ObjStm), LZW/DCT filters. Production swaps in
  pdfium/poppler behind the same operator; the Spark plumbing (binary
  column → mapInPandas batches → text) is identical.

The layout model is the text-operator stream order — the same reading
order cheap extractors (pdftotext -raw) use.
"""

from __future__ import annotations

import re
import zlib
from typing import List

_STREAM_OPEN_RE = re.compile(rb"stream\r?\n")
_FLATE_HINT = re.compile(rb"/FlateDecode")
# direct /Length only (an indirect "/Length 6 0 R" must not match)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![\s\d]*R)")


def _stream_bodies(data: bytes):
    """Yield (dict_head, raw_body) per content stream. Streams are
    /Length-delimited when the dict carries a direct /Length (the spec's
    rule — binary bodies may legally CONTAIN b"\\nendstream" or end in a
    CR that a regex delimiter would eat, truncating FlateDecode data);
    the legacy delimiter scan is the fallback for indirect /Length."""
    for m in _STREAM_OPEN_RE.finditer(data):
        start = m.end()
        head = data[max(0, m.start() - 512) : m.start()]
        lm = None
        for lm in _LENGTH_RE.finditer(head):
            pass  # keep the LAST /Length in the window (nearest dict)
        if lm is not None:
            end = start + int(lm.group(1))
            tail = data[end : end + 11]
            if tail.lstrip(b"\r\n").startswith(b"endstream"):
                yield head, data[start:end]
                continue
        e = data.find(b"endstream", start)
        if e == -1:
            continue
        body = data[start:e]
        if body.endswith(b"\n"):
            body = body[:-1]
        if body.endswith(b"\r"):
            body = body[:-1]
        yield head, body

# text-showing / positioning operators inside BT..ET
_TEXT_OP_RE = re.compile(
    rb"""
    \((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<lop>Tj|'|")   # literal string show
  | <(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<hop>Tj|'|")        # hex string show
  | \[(?P<arr>(?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*)\]\s*TJ
  | (?P<move>T\*|TD|Td)
    """,
    re.X | re.S,
)
_ARR_ITEM_RE = re.compile(rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>")
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.S)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(lit: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(lit):
        c = lit[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = lit[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal, up to 3 digits
            j = i + 1
            while j < min(i + 4, len(lit)) and lit[j : j + 1].isdigit():
                j += 1
            out.append(int(lit[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt == b"\n":  # line continuation
            i += 2
        else:
            out += nxt
            i += 2
    return bytes(out)


def _hex_bytes(h: bytes) -> bytes:
    h = re.sub(rb"\s", b"", h)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def _decode_stream(raw: bytes) -> bytes:
    try:
        return zlib.decompress(raw)
    except zlib.error:
        return raw


def _text_from_content(content: bytes) -> List[str]:
    parts: List[str] = []
    for block in _BT_ET_RE.findall(content):
        line: List[bytes] = []

        def flush():
            if line:
                parts.append(b" ".join(line).decode("latin-1"))
                line.clear()

        for m in _TEXT_OP_RE.finditer(block):
            if m.group("move") is not None:
                flush()
                continue
            if m.group("lit") is not None:
                s = _unescape(m.group("lit"))
                if m.group("lop") in (b"'", b'"'):
                    flush()
                line.append(s)
            elif m.group("hex") is not None:
                s = _hex_bytes(m.group("hex"))
                if m.group("hop") in (b"'", b'"'):
                    flush()
                line.append(s)
            elif m.group("arr") is not None:
                segs = []
                for im in _ARR_ITEM_RE.finditer(m.group("arr")):
                    if im.group("lit") is not None:
                        segs.append(_unescape(im.group("lit")))
                    else:
                        segs.append(_hex_bytes(im.group("hex")))
                line.append(b"".join(segs))
        flush()
    return parts


def extract_pdf_text(data: bytes) -> str:
    """Text of every content stream, stream order, lines joined with \\n.
    Never raises: malformed input yields whatever text was recoverable."""
    if not data or b"%PDF" not in data[:1024]:
        return ""
    lines: List[str] = []
    for head, raw in _stream_bodies(data):
        # filter hint lives in the stream dict just before `stream`
        body = (
            _decode_stream(raw) if _FLATE_HINT.search(head) else raw
        )
        lines.extend(_text_from_content(body))
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# deterministic PDF builder (fixtures/tests — and the oracle's inverse)
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(lines: List[str], compress: bool = False) -> bytes:
    """One-page PDF showing each line with Td moves — valid enough for
    strict parsers (xref with correct offsets) and byte-deterministic."""
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, ln in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({_pdf_escape(ln)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1", errors="replace")
    return _wrap_page_pdf(content, compress=compress)


def _wrap_page_pdf(content: bytes, compress: bool = False) -> bytes:
    """Wrap a content stream in the deterministic one-page PDF scaffold
    (catalog/pages/page/font objects, correct xref offsets)."""
    flt = b""
    if compress:
        content = zlib.compress(content)
        flt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + flt + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# positioned text + layout reading order (north_rule: "PDF/layout parse")
# ---------------------------------------------------------------------------

# positioned scan: numbers feed an operand stack consumed by Tm/Td/TD/T*;
# text-showing ops emit a run at the current text position
_POS_TOK_RE = re.compile(
    rb"""
    \((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<lop>Tj|'|")
  | <(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<hop>Tj|'|")
  | \[(?P<arr>(?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[^\]])*)\]\s*TJ
  | (?P<num>[+-]?(?:\d+\.?\d*|\.\d+))
  | (?P<op>Tm|TD|Td|T\*|TL|BT|ET)
    """,
    re.X | re.S,
)


def _positioned_runs(content: bytes) -> List[tuple]:
    """(x, y, text) for every text-showing op, tracking the text matrix
    translation: ``a b c d e f Tm`` sets (e, f); ``tx ty Td`` translates
    the LINE origin; ``tx ty TD`` additionally sets leading to -ty;
    ``T*`` moves down one leading (``TL`` sets it; default 14). BT resets
    the matrix. Rotation/scale components of Tm are ignored — translation
    order is what layout recovery needs."""
    runs: List[tuple] = []
    x = y = 0.0
    leading = 14.0
    stack: List[float] = []

    def emit(s: bytes) -> None:
        runs.append((x, y, s.decode("latin-1")))

    for m in _POS_TOK_RE.finditer(content):
        if m.group("num") is not None:
            stack.append(float(m.group("num")))
            continue
        op = m.group("op")
        if op is not None:
            if op == b"BT":
                x = y = 0.0
                leading = 14.0
            elif op == b"Tm" and len(stack) >= 6:
                x, y = stack[-2], stack[-1]
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                tx, ty = stack[-2], stack[-1]
                x += tx
                y += ty
                if op == b"TD":
                    leading = -ty if ty else leading
            elif op == b"T*":
                y -= leading
            elif op == b"TL" and stack:
                leading = stack[-1]
            stack.clear()
            continue
        # text-showing op
        if m.group("lop") in (b"'", b'"') or m.group("hop") in (b"'", b'"'):
            y -= leading  # ' and " imply next-line first
        if m.group("lit") is not None:
            emit(_unescape(m.group("lit")))
        elif m.group("hex") is not None:
            emit(_hex_bytes(m.group("hex")))
        elif m.group("arr") is not None:
            segs = []
            for im in _ARR_ITEM_RE.finditer(m.group("arr")):
                if im.group("lit") is not None:
                    segs.append(_unescape(im.group("lit")))
                else:
                    segs.append(_hex_bytes(im.group("hex")))
            emit(b"".join(segs))
        stack.clear()
    return runs


def extract_pdf_text_layout(data: bytes, col_gap: float = 100.0) -> str:
    """Layout-aware text: runs clustered into COLUMNS by x (a gap >
    ``col_gap`` between successive distinct x positions starts a new
    column), read column-major — left column top-to-bottom, then the
    next — the reading order a human (and a training corpus) wants for
    multi-column pages, independent of content-stream emission order.
    Within a column, runs sort by y descending (PDF y grows upward),
    ties by x then emission order. Falls back to ``extract_pdf_text``'s
    stream order when no run carries position (degenerate input)."""
    if not data or b"%PDF" not in data[:1024]:
        return ""
    runs: List[tuple] = []
    for head, raw in _stream_bodies(data):
        body = _decode_stream(raw) if _FLATE_HINT.search(head) else raw
        runs.extend(_positioned_runs(body))
    if not runs:
        return extract_pdf_text(data)
    xs = sorted({x for x, _, _ in runs})
    col_of = {}
    col = 0
    prev = None
    for xv in xs:
        if prev is not None and xv - prev > col_gap:
            col += 1
        col_of[xv] = col
        prev = xv
    ordered = sorted(
        range(len(runs)),
        key=lambda i: (col_of[runs[i][0]], -runs[i][1], runs[i][0], i),
    )
    return "\n".join(runs[i][2] for i in ordered)


def make_pdf_columns(columns: List[List[str]],
                     compress: bool = False) -> bytes:
    """Deterministic multi-column one-page PDF: column ``ci`` at
    x = 72 + 220·ci, lines top-down from y = 720 at 14pt leading — and
    the content stream EMITS runs row-major (interleaved across columns)
    so stream order differs from reading order: the fixture that proves
    layout recovery is real. Each run is its own BT/ET with an absolute
    ``Tm``."""
    ops: List[str] = []
    n_rows = max((len(c) for c in columns), default=0)
    for r in range(n_rows):
        for ci, colv in enumerate(columns):
            if r >= len(colv):
                continue
            xp = 72 + 220 * ci
            yp = 720 - 14 * r
            ops.append(
                f"BT /F1 12 Tf 1 0 0 1 {xp} {yp} Tm "
                f"({_pdf_escape(colv[r])}) Tj ET"
            )
    content = "\n".join(ops).encode("latin-1", errors="replace")
    return _wrap_page_pdf(content, compress=compress)
