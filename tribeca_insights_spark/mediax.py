"""Pure-python audio/video container parsing — no media libraries.

Companion to :mod:`.imagex` for the audio/video half of the multimodal
checklist: real header/box parsing for the common web containers —

* WAV (RIFF/WAVE): fmt chunk → channels, sample rate, bit depth; data
  chunk → exact duration. :func:`make_wav` builds valid PCM files with
  closed-form byte sizes (``44 + n_samples·ch·bytes``) for SQL oracles.
* MP3 (MPEG audio): ID3v2 skip + first frame header → version/layer,
  bitrate, sample rate, channel mode; duration estimated from payload
  size at the frame bitrate (exact for CBR).
* MP4/ISO-BMFF (mp4/m4a/mov): box walk → ftyp brand, mvhd timescale +
  duration. :func:`make_mp4` builds a minimal valid ftyp+mvhd skeleton
  with closed-form sizes.

Everything here reads headers only — payload bytes never materialize
beyond the Arrow batch that carried them (see operators/multimodal.py for
the Spark plumbing). Actual sample/frame decoding is out of scope for a
pure-python container (production: ffmpeg/pyav behind the same seam).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

# (container, duration_ms, sample_rate, channels) — any may be None
AVResult = Tuple[str, Optional[int], Optional[int], Optional[int]]


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def parse_wav(b: bytes) -> Optional[AVResult]:
    if len(b) < 36 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    rate = ch = bits = None
    data_size = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if tag == b"fmt " and pos + 24 <= len(b):
            _fmt, ch, rate = struct.unpack("<HHI", b[pos + 8 : pos + 16])
            (bits,) = struct.unpack("<H", b[pos + 22 : pos + 24])
        elif tag == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    dur = None
    if data_size is not None and rate and ch and bits:
        bytes_per_sec = rate * ch * (bits // 8)
        if bytes_per_sec:
            dur = data_size * 1000 // bytes_per_sec
    return "wav", dur, rate, ch


def make_wav(n_samples: int, rate: int = 8000, channels: int = 1,
             seed: int = 0) -> bytes:
    """Valid deterministic 16-bit PCM WAV. Total size is exactly
    ``44 + n_samples·channels·2`` bytes — closed-form for oracles."""
    frames = bytearray()
    for i in range(n_samples * channels):
        frames += struct.pack("<h", ((i * 2654435761 + seed) % 65536) - 32768)
    data = bytes(frames)
    byte_rate = rate * channels * 2
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                byte_rate, channels * 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------

_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                      224, 256, 320, 0]
_MP3_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                      144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}  # version bits → rates


def parse_mp3(b: bytes) -> Optional[AVResult]:
    if len(b) < 4:
        return None
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        # syncsafe 28-bit tag size
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        pos = 10 + size
    if pos + 4 > len(b) or b[pos] != 0xFF or (b[pos + 1] & 0xE0) != 0xE0:
        return None if pos == 0 else ("mp3", None, None, None)
    h1, h2, h3 = b[pos + 1], b[pos + 2], b[pos + 3]
    version = (h1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h1 >> 1) & 0x3    # 1=Layer III
    if version == 1 or layer == 0:
        return "mp3", None, None, None
    rates = _MP3_RATES.get(version)
    sr_idx = (h2 >> 2) & 0x3
    if rates is None or sr_idx == 3:
        return "mp3", None, None, None
    rate = rates[sr_idx]
    channels = 1 if ((h3 >> 6) & 0x3) == 3 else 2
    dur = None
    if layer == 1:  # Layer III only — the vendored bitrate tables are
        # Layer-III; Layer I/II use different tables, so report rate and
        # channels (layer-independent) but no bitrate-derived duration
        br_table = _MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3
        kbps = br_table[(h2 >> 4) & 0xF]
        if kbps:
            dur = (len(b) - pos) * 8 // kbps  # ms (exact for CBR)
    return "mp3", dur, rate, channels


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF
# ---------------------------------------------------------------------------


def parse_mp4(b: bytes) -> Optional[AVResult]:
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    mvhd = None
    for pos, tag, size in _walk_boxes(b, 0, len(b)):
        if tag == b"moov":
            for p2, t2, s2 in _walk_boxes(b, pos + 8, pos + size):
                if t2 == b"mvhd":
                    mvhd = (p2, s2)
                    break
    if mvhd is None:
        return "mp4", None, None, None
    p, _s = mvhd
    ver = b[p + 8]
    if ver == 1 and p + 40 <= len(b):
        timescale, dur = struct.unpack(">IQ", b[p + 28 : p + 40])
    elif ver == 0 and p + 28 <= len(b):
        timescale, dur = struct.unpack(">II", b[p + 20 : p + 28])
    else:
        return "mp4", None, None, None
    ms = dur * 1000 // timescale if timescale else None
    return "mp4", ms, None, None


def _walk_boxes(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", b[pos + 8 : pos + 16])
        if size < 8:
            return
        yield pos, tag, min(size, end - pos)
        pos += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def mp4_chunk_offsets(b: bytes) -> list:
    """Real frame-sample anchors: every chunk byte offset from the first
    track's ``stco`` (32-bit) or ``co64`` (64-bit — standard for >4 GB web
    video) box, whichever the sample table carries.
    Empty when the file has no sample table (e.g. a bare mvhd skeleton)."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return []

    def find_offsets_box(start: int, end: int):
        for pos, tag, size in _walk_boxes(b, start, end):
            if tag in (b"stco", b"co64"):
                return pos, size, tag
            if tag in _MP4_CONTAINERS:
                got = find_offsets_box(pos + 8, pos + size)
                if got is not None:
                    return got
        return None

    got = find_offsets_box(0, len(b))
    if got is None:
        return []
    pos, size, tag = got
    if pos + 16 > len(b):
        return []
    (n,) = struct.unpack(">I", b[pos + 12 : pos + 16])
    width, fmt = (8, ">Q") if tag == b"co64" else (4, ">I")
    out = []
    p = pos + 16
    for _ in range(min(n, (pos + size - p) // width)):
        out.append(struct.unpack(fmt, b[p : p + width])[0])
        p += width
    return out


def frame_sample_mp4(b: bytes, every_n: int = 1) -> list:
    """Every ``every_n``-th chunk offset of an MP4 — the real byte
    positions a frame sampler would range-read, straight from the sample
    table (no codec needed to LOCATE frames; decoding them is the
    production ffmpeg seam)."""
    offs = mp4_chunk_offsets(b)
    return offs[:: max(1, every_n)]


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _ftyp() -> bytes:
    return (
        struct.pack(">I", 24) + b"ftyp" + b"isom"
        + struct.pack(">I", 512) + b"isomiso2"
    )


def _mvhd(duration_ms: int, timescale: int) -> bytes:
    body = (
        b"\x00\x00\x00\x00"                    # version+flags
        + struct.pack(">II", 0, 0)             # creation/modification
        + struct.pack(">II", timescale, duration_ms * timescale // 1000)
        + struct.pack(">I", 0x00010000)        # rate 1.0
        + struct.pack(">H", 0x0100)            # volume
        + b"\x00" * 10                         # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                         # pre_defined
        + struct.pack(">I", 2)                 # next_track_id
    )
    return _box(b"mvhd", body)


def make_mp4(duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal valid ftyp + moov/mvhd skeleton (version-0 mvhd). Size is
    exactly 24 + 8 + 108 = 140 bytes — closed-form for oracles."""
    return _ftyp() + _box(b"moov", _mvhd(duration_ms, timescale))


def make_mp4_with_chunks(duration_ms: int, chunk_offsets,
                         timescale: int = 1000,
                         use_co64: bool = False) -> bytes:
    """ftyp + moov{mvhd, trak{mdia{minf{stbl{stco|co64}}}}} — a real sample
    table whose chunk offsets :func:`mp4_chunk_offsets` round-trips;
    ``use_co64`` emits the 64-bit offset box large files use."""
    tag, fmt = (b"co64", ">Q") if use_co64 else (b"stco", ">I")
    stco = _box(
        tag,
        b"\x00" * 4
        + struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(fmt, int(o)) for o in chunk_offsets),
    )
    trak = _box(b"trak", _box(b"mdia", _box(b"minf", _box(b"stbl", stco))))
    return _ftyp() + _box(
        b"moov", _mvhd(duration_ms, timescale) + trak
    )


def sniff_av(b: bytes) -> Optional[AVResult]:
    """(container, duration_ms, sample_rate, channels) for WAV/MP3/MP4
    payloads, None when no signature matches."""
    if not b:
        return None
    for parse in (parse_wav, parse_mp4, parse_mp3):
        out = parse(b)
        if out is not None:
            return out
    return None
