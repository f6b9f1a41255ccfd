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

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_FLATE_HINT = re.compile(rb"/FlateDecode")

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
    pos = 0
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        # filter hint lives in the stream dict just before `stream`
        head = data[max(0, m.start() - 512) : m.start()]
        body = (
            _decode_stream(raw) if _FLATE_HINT.search(head) else raw
        )
        lines.extend(_text_from_content(body))
        pos = m.end()
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
