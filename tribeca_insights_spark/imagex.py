"""Pure-python image decoding — no third-party media libraries.

Two layers, both real (not stubs):

* :func:`sniff_image` — container/header parsing for PNG, JPEG, GIF, BMP
  and WebP (VP8/VP8L/VP8X): format + pixel dimensions straight from the
  byte layout, the way ``file(1)``/``imghdr`` do it. This is all the
  metadata a training-data pipeline's media_metadata pass needs, and it
  never touches pixel data.
* :func:`decode_png` / :func:`encode_png` / :func:`resize_nearest` — a
  real PNG codec for the common web case (8-bit greyscale / RGB / RGBA,
  all five scanline filters, zlib via stdlib) powering an actual
  decode→resize→re-encode path. Interlaced PNGs, palettes and sub-byte
  depths raise ``UnsupportedImageError`` — callers fall back to
  metadata-only handling (the honest behavior for a container with no
  PIL/libvips; production swaps the codec layer, keeping the same Spark
  plumbing).

:func:`make_png` builds fully valid, byte-deterministic PNGs (hand-rolled
zlib *stored* blocks, so the total file size is closed-form:
``68 + height*(width+1)`` bytes for greyscale — SQL oracles can state it).
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

SniffResult = Tuple[str, Optional[int], Optional[int]]


class UnsupportedImageError(ValueError):
    """Image is a recognized format but outside the pure-python codec's
    supported subset (interlaced/palette/16-bit PNG, actual JPEG pixel
    decode, ...)."""


# ---------------------------------------------------------------------------
# header sniffing (format + dimensions, no pixel decode)
# ---------------------------------------------------------------------------


def _parse_png(b: bytes) -> Optional[SniffResult]:
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    # first chunk must be IHDR: len(4) 'IHDR'(4) width(4) height(4) ...
    if b[12:16] != b"IHDR":
        return "png", None, None
    w, h = struct.unpack(">II", b[16:24])
    return "png", w, h


def _parse_gif(b: bytes) -> Optional[SniffResult]:
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    return "gif", w, h


def _parse_bmp(b: bytes) -> Optional[SniffResult]:
    if len(b) < 26 or b[:2] != b"BM":
        return None
    w, h = struct.unpack("<ii", b[18:26])
    return "bmp", w, abs(h)  # negative height = top-down DIB


_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC


def _parse_jpeg(b: bytes) -> Optional[SniffResult]:
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:  # desynced — give up on dims, format is certain
            return "jpeg", None, None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone marker, no length field
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if marker in _JPEG_SOF:
            if i + 9 > n:
                break
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return "jpeg", w, h
        if marker == 0xDA:  # SOS: entropy data follows, SOF should precede
            break
        i += 2 + seg_len
    return "jpeg", None, None


def _parse_webp(b: bytes) -> Optional[SniffResult]:
    if len(b) < 21 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    four = b[12:16]
    p = b[20:]  # chunk payload
    if four == b"VP8X" and len(p) >= 10:
        w = 1 + int.from_bytes(p[4:7], "little")
        h = 1 + int.from_bytes(p[7:10], "little")
        return "webp", w, h
    if four == b"VP8 " and len(p) >= 10 and p[3:6] == b"\x9d\x01\x2a":
        w = struct.unpack("<H", p[6:8])[0] & 0x3FFF
        h = struct.unpack("<H", p[8:10])[0] & 0x3FFF
        return "webp", w, h
    if four == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
        bits = int.from_bytes(p[1:5], "little")
        w = 1 + (bits & 0x3FFF)
        h = 1 + ((bits >> 14) & 0x3FFF)
        return "webp", w, h
    return "webp", None, None


def sniff_image(b: bytes) -> Optional[SniffResult]:
    """(format, width, height) from container headers, or None if the
    payload matches no known signature. Dimensions are None when the
    format is recognized but the size header is absent/corrupt."""
    if not b:
        return None
    for parse in (_parse_png, _parse_jpeg, _parse_gif, _parse_webp,
                  _parse_bmp):
        out = parse(b)
        if out is not None:
            return out
    return None


# ---------------------------------------------------------------------------
# real PNG codec (8-bit greyscale / RGB / RGBA)
# ---------------------------------------------------------------------------

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type → samples per pixel


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _zlib_stored(raw: bytes) -> bytes:
    """Hand-rolled zlib stream with *stored* (uncompressed) deflate blocks —
    byte-deterministic across zlib versions; 11 bytes overhead per ≤64 KiB
    payload (2 header + 5/block + 4 adler)."""
    out = [b"\x78\x01"]
    n = len(raw)
    i = 0
    while True:
        block = raw[i : i + 65535]
        final = 1 if i + 65535 >= n else 0
        ln = len(block)
        out.append(bytes([final]) + struct.pack("<HH", ln, ln ^ 0xFFFF) + block)
        i += 65535
        if final:
            break
    out.append(struct.pack(">I", zlib.adler32(raw) & 0xFFFFFFFF))
    return b"".join(out)


def make_png(width: int, height: int, seed: int = 0, color_type: int = 0) -> bytes:
    """Valid, deterministic PNG (8-bit; color_type 0=grey or 2=RGB), filter
    0 scanlines, stored-block zlib. Greyscale total size is exactly
    ``8 + 25 + (12 + rawlen + 11) + 12 = 68 + height*(width+1)`` bytes
    while rawlen ≤ 64 KiB (one stored block) — closed-form for oracles."""
    ch = _CHANNELS[color_type]
    rows = bytearray()
    for y in range(height):
        rows.append(0)  # filter type 0 (None)
        row = bytes(
            (x * ch + c + y + seed) & 0xFF
            for x in range(width)
            for c in range(ch)
        )
        rows += row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", _zlib_stored(bytes(rows)))
        + _chunk(b"IEND", b"")
    )


def _defilter(raw: bytes, width: int, height: int, ch: int) -> bytearray:
    stride = width * ch
    out = bytearray(stride * height)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        base = y * stride
        prev = base - stride
        if ftype == 0:  # None
            out[base : base + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                a = out[base + i - ch] if i >= ch else 0
                out[base + i] = (line[i] + a) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                bb = out[prev + i] if y else 0
                out[base + i] = (line[i] + bb) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = out[base + i - ch] if i >= ch else 0
                bb = out[prev + i] if y else 0
                out[base + i] = (line[i] + ((a + bb) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = out[base + i - ch] if i >= ch else 0
                bb = out[prev + i] if y else 0
                c = out[prev + i - ch] if (y and i >= ch) else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                out[base + i] = (line[i] + pred) & 0xFF
        else:
            raise UnsupportedImageError(f"PNG filter type {ftype}")
    return out


def decode_png(b: bytes) -> Tuple[int, int, int, bytes]:
    """PNG → (width, height, channels, interleaved 8-bit pixel bytes).
    Supports bit depth 8, color types 0/2/6, non-interlaced. Truncated or
    corrupt bodies raise :class:`UnsupportedImageError` (never raw
    struct/zlib errors — web-crawled payloads must fail per-payload, not
    per-job)."""
    if _parse_png(b) is None:
        raise UnsupportedImageError("not a PNG")
    try:
        return _decode_png_inner(b)
    except UnsupportedImageError:
        raise
    except Exception as exc:  # struct.error, zlib.error, IndexError, ...
        raise UnsupportedImageError(f"corrupt PNG body: {exc}") from exc


def _decode_png_inner(b: bytes) -> Tuple[int, int, int, bytes]:
    w, h = struct.unpack(">II", b[16:24])
    depth, ctype, _comp, _filt, interlace = struct.unpack(">BBBBB", b[24:29])
    if depth != 8 or ctype not in _CHANNELS or interlace:
        raise UnsupportedImageError(
            f"PNG depth={depth} color_type={ctype} interlace={interlace} "
            "outside pure-python codec subset"
        )
    ch = _CHANNELS[ctype]
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += b[pos + 8 : pos + 8 + ln]
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + w * ch):
        raise UnsupportedImageError("PNG pixel payload size mismatch")
    return w, h, ch, bytes(_defilter(raw, w, h, ch))


def encode_png(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """Interleaved 8-bit pixels → valid PNG (filter 0, stored zlib)."""
    ctype = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    rows = bytearray()
    for y in range(height):
        rows.append(0)
        rows += pixels[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", _zlib_stored(bytes(rows)))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(pixels: bytes, width: int, height: int, channels: int,
                   new_width: int, new_height: int) -> bytes:
    """Nearest-neighbor resample of interleaved 8-bit pixels."""
    out = bytearray(new_width * new_height * channels)
    stride = width * channels
    o = 0
    for ny in range(new_height):
        sy = ny * height // new_height
        row = sy * stride
        for nx in range(new_width):
            sx = (nx * width // new_width) * channels
            out[o : o + channels] = pixels[row + sx : row + sx + channels]
            o += channels
    return bytes(out)


def dhash64_hex(data: bytes) -> str:
    """64-bit difference hash (dHash, the standard perceptual image
    fingerprint) as 16 lowercase hex chars: decode → grey (integer mean
    of up to 3 channels) → 9×8 nearest-neighbor downscale → one bit per
    horizontally-adjacent pixel pair (left > right), MSB-first in
    row-major order. Robust to re-encoding and mild resizing; Hamming
    distance between hashes ≈ visual difference, so near-duplicate
    detection composes with the SimHash banding machinery
    (operators/dedup.py simhash_near_pairs) unchanged."""
    w, h, ch, px = decode_png(data)
    if ch > 1:
        use = min(ch, 3)
        grey = bytes(
            sum(px[i * ch + c] for c in range(use)) // use
            for i in range(w * h)
        )
    else:
        grey = px
    small = resize_nearest(grey, w, h, 1, 9, 8)
    bits = 0
    for y in range(8):
        row = y * 9
        for x in range(8):
            bits = (bits << 1) | (
                1 if small[row + x] > small[row + x + 1] else 0
            )
    return f"{bits:016x}"
