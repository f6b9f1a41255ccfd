"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Beyond-reference capability (task brief). The Spark-side mechanics — schema,
``mapInPandas`` batching, partition inheritance — are real and tested, and
so is the decode layer for the common web formats: :mod:`..imagex` parses
PNG/JPEG/GIF/BMP/WebP headers (format + dimensions) and fully decodes /
resizes / re-encodes 8-bit grey/RGB/RGBA PNGs in pure python. Payloads
outside that subset (actual JPEG pixel decode, video, audio) either raise
``UnsupportedImageError`` or — with ``deterministic_fake=True`` — take a
clearly-marked hash-derived fallback so plumbing tests can run on arbitrary
bytes; production swaps PIL/libvips/ffmpeg into the same seams.

Design for 100 TB: payloads stay in columnar storage and move through
``mapInPandas`` (iterator of pandas batches → bounded worker memory even
for MB-scale blobs — pair with a small
``spark.sql.execution.arrow.maxRecordsPerBatch``); metadata lands as plain
columns so downstream filters/joins prune without touching bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..imagex import (
    UnsupportedImageError,
    decode_png,
    encode_png,
    resize_nearest,
    sniff_image,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("format_guess", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("is_sniffed", BooleanType()),
    ]
)


def _fake_meta(payload: bytes):
    """Legacy hash-derived pseudo-metadata for non-image payloads in
    plumbing tests — never used when the sniffer recognizes the bytes."""
    h = hashlib.sha256(payload).digest()
    fmt = ["png", "jpeg", "webp"][h[0] % 3]
    return fmt, 64 + h[1] % 192, 64 + h[2] % 192


def decode_image_stub(payload: bytes, deterministic_fake: bool = False):
    """Decode an image payload → (format, width, height).

    Real header parsing (:func:`..imagex.sniff_image`) handles PNG/JPEG/
    GIF/BMP/WebP. For unrecognizable payloads: ``deterministic_fake=True``
    derives stable pseudo-dimensions from the payload hash (plumbing tests
    over arbitrary bytes); otherwise raise."""
    s = sniff_image(payload)
    if s is not None:
        return s
    if not deterministic_fake:
        raise NotImplementedError(
            "payload matches no known image signature; pass "
            "deterministic_fake=True for plumbing tests on arbitrary bytes"
        )
    return _fake_meta(payload)


def media_metadata(media: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload",
                   deterministic_fake: bool = True) -> DataFrame:
    """binary payload table → typed metadata via mapInPandas.

    Format and dimensions come from real header parsing; payloads the
    sniffer can't identify get ``('unknown', NULL, NULL)`` — or, with
    ``deterministic_fake=True``, the legacy hash-derived pseudo-metadata
    (kept so plumbing tests can run over arbitrary text bytes).

    ``is_sniffed`` is the PROVENANCE flag (VERDICT-r4 #3): True only when
    format/dims came from a real header parse; fabricated fallback rows
    carry False so a production corpus can filter them — a corrupt JPEG
    must never silently acquire fake dimensions."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "media_id": [], "n_bytes": [], "sha256": [],
                "format_guess": [], "width": [], "height": [],
                "is_sniffed": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                s = sniff_image(b)
                if s is not None:
                    fmt, w, h = s
                elif deterministic_fake:
                    fmt, w, h = _fake_meta(b)
                else:
                    fmt, w, h = "unknown", None, None
                rows["media_id"].append(int(mid))
                rows["n_bytes"].append(len(b))
                rows["sha256"].append(hashlib.sha256(b).hexdigest())
                rows["format_guess"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["is_sniffed"].append(s is not None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(_batches, schema=MEDIA_META_SCHEMA)


AV_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("container", StringType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def av_metadata(media: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload") -> DataFrame:
    """Audio/video payload table → typed metadata via mapInPandas, with
    REAL container parsing (mediax: WAV fmt/data chunks, MP3 frame
    headers, MP4 mvhd boxes). Unrecognized payloads → ('unknown', NULLs);
    sample/frame decode is production's ffmpeg seam, not plumbing's job."""
    from ..mediax import sniff_av

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "media_id": [], "n_bytes": [], "container": [],
                "duration_ms": [], "sample_rate": [], "channels": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                s = sniff_av(b)
                cont, dur, rate, ch = s if s is not None else (
                    "unknown", None, None, None
                )
                rows["media_id"].append(int(mid))
                rows["n_bytes"].append(len(b))
                rows["container"].append(cont)
                rows["duration_ms"].append(dur)
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
            yield pd.DataFrame(rows)

    return media.mapInPandas(_batches, schema=AV_META_SCHEMA)


def frame_sample_stub(payload: bytes, every_n: int = 30,
                      deterministic_fake: bool = False):
    """Video frame-sample anchors: for MP4s with a sample table the
    offsets are REAL — every ``every_n``-th chunk byte offset from the
    ``stco`` box (mediax.frame_sample_mp4), exactly what a range-reading
    sampler seeks to. Other containers: evenly-spaced fake offsets when
    ``deterministic_fake=True`` (decoding frames needs ffmpeg —
    production's seam), else raise."""
    from ..mediax import frame_sample_mp4

    offs = frame_sample_mp4(payload, every_n)
    if offs:
        return offs
    if not deterministic_fake:
        raise NotImplementedError(
            "no MP4 sample table in payload; frame decode for other "
            "containers requires a media library — pass "
            "deterministic_fake=True for plumbing tests"
        )
    n = max(1, len(payload) // max(1, every_n))
    step = max(1, len(payload) // n)
    return list(range(0, len(payload), step))[:n]


def media_features(media: DataFrame, dim: int = 16, id_col: str = "media_id",
                   payload_col: str = "payload",
                   deterministic_fake: bool = True) -> DataFrame:
    """binary payload → ``array<float>`` feature vector via ``mapInPandas``
    (production drops a real vision/audio encoder into ``_embed``; the fake
    derives a stable unit-norm vector from the payload hash). Output feeds
    :mod:`..operators.similarity` ANN/near-dup directly."""
    import math

    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def _embed(payload: bytes):
        try:
            w, h_, ch, px = decode_png(payload)
        except UnsupportedImageError:
            if not deterministic_fake:
                raise
            hh = hashlib.sha256(payload).digest()
            raw = [(hh[i % 32] - 127.5) / 127.5 for i in range(dim)]
        else:
            # real feature for decodable PNGs: L2-normalized luminance
            # histogram (production swaps in a vision encoder here)
            import numpy as np

            arr = np.frombuffer(px, dtype=np.uint8)
            if ch > 1:
                arr = arr.reshape(-1, ch)[:, :3].mean(axis=1)
            hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
            raw = hist.astype(float).tolist()
        norm = math.sqrt(sum(x * x for x in raw)) or 1.0
        return [x / norm for x in raw]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": [int(m) for m in pdf[id_col]],
                    "embedding": [
                        _embed(bytes(p) if p is not None else b"")
                        for p in pdf[payload_col]
                    ],
                }
            )

    return media.mapInPandas(_batches, schema=schema)


def media_resize(media: DataFrame, max_px: int = 256, id_col: str = "media_id",
                 payload_col: str = "payload",
                 deterministic_fake: bool = True) -> DataFrame:
    """binary payload → resized binary payload + new dims, ``mapInPandas``
    end to end so MB-scale blobs never materialize as a whole-partition list.
    Decodable PNGs get a REAL nearest-neighbor thumbnail (decode → resample
    → re-encode, pure python). Other recognized containers (JPEG/GIF/WebP/
    BMP — sniffable dims, no re-encoder here): with
    ``deterministic_fake=True`` the payload is byte-truncated to a
    scale²-sized fake labeled with the scaled dims (plumbing tests only);
    with ``deterministic_fake=False`` the payload passes through UNCHANGED
    with its true dims — never a silently corrupted blob (production:
    PIL/libvips in the same seam). Unrecognizable payloads raise unless
    ``deterministic_fake=True``."""
    from pyspark.sql.types import BinaryType

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def _resize(payload: bytes):
        try:
            w, h, ch, px = decode_png(payload)
        except UnsupportedImageError:
            fmt, w, h = decode_image_stub(payload, deterministic_fake)
            if w is None or h is None:
                # recognized container but no parsable dims (e.g. JPEG
                # without SOF): nothing to scale — pass through unchanged
                return payload, None, None
            if not deterministic_fake:
                # real mode, recognized non-PNG container: no re-encoder
                # available — pass through untouched with true dims rather
                # than emit a truncated, corrupt payload.
                return payload, w, h
            scale = min(1.0, max_px / max(w, h, 1))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            keep = max(1, int(len(payload) * scale * scale)) if payload else 0
            return payload[:keep], nw, nh
        scale = min(1.0, max_px / max(w, h, 1))
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        if (nw, nh) == (w, h):
            return payload, w, h
        return (
            encode_png(resize_nearest(px, w, h, ch, nw, nh), nw, nh, ch),
            nw,
            nh,
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "payload": [], "width": [], "height": []}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p) if p is not None else b""
                out, w, h = _resize(b)
                rows["media_id"].append(int(mid))
                rows["payload"].append(out)
                rows["width"].append(w)
                rows["height"].append(h)
            yield pd.DataFrame(rows)

    return media.mapInPandas(_batches, schema=schema)


def _dhash_batch(payload: pd.Series) -> pd.Series:
    from ..imagex import dhash64_hex  # noqa: F811 — batch-local import

    out = []
    for p in payload:
        try:
            out.append(dhash64_hex(bytes(p)) if p is not None else None)
        except Exception:
            out.append(None)  # undecodable payload: no fingerprint
    return pd.Series(out)


from pyspark.sql import functions as _F
from pyspark.sql.functions import pandas_udf as _pandas_udf

dhash_udf = _pandas_udf(_dhash_batch, StringType())


def image_dhash(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(…, payload binary) → (…, dhash string): 64-bit perceptual
    difference hash per image (imagex.dhash64_hex — REAL decode +
    downscale, not a stub), NULL for undecodable payloads. Near-dup
    pairs at corpus scale: band the 16-hex-char hash exactly like SimHash
    (operators/dedup.py pigeonhole banding — ≤ k differing bits ⇒ one of
    k+1 bands matches exactly) and equi-join on (band_idx, band_bits);
    never all-pairs."""
    return media.withColumn("dhash", dhash_udf(_F.col(payload_col)))


def make_mp4_udf(duration_col, n_chunks_col, base_col, co64_col):
    """Column builder: a REAL MP4 (ftyp + moov/mvhd + trak sample
    table) whose chunk offsets are ``base + 16*j`` for j in
    [0, n_chunks) — the deterministic video fixture queries use, with
    ``co64_col`` switching to the 64-bit offset box web-scale files
    carry. Arrow-batched; the builder is mediax.make_mp4_with_chunks
    (the same bytes the pytest round-trips pin)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from ..mediax import make_mp4_with_chunks

    @pandas_udf(BinaryType())
    def _build(dur: pd.Series, nc: pd.Series, base: pd.Series,
               co64: pd.Series) -> pd.Series:
        out = []
        for d, n, b, c in zip(dur, nc, base, co64):
            offs = [int(b) + 16 * j for j in range(int(n))]
            out.append(make_mp4_with_chunks(int(d), offs,
                                            use_co64=bool(c)))
        return pd.Series(out)

    return _build(duration_col, n_chunks_col, base_col, co64_col)


def frame_sample_anchors(media: DataFrame, every_n: int = 2,
                         id_col: str = "media_id",
                         payload_col: str = "payload") -> DataFrame:
    """Video frame-sample anchors as a DataFrame op: one row per
    sampled chunk ``(id, frame_idx, chunk_offset)`` — the byte
    positions a production frame sampler range-reads (decoding the
    frame bytes is the ffmpeg seam, stubbed per the task brief; the
    LOCATE step is real MP4 sample-table parsing, stco or co64).

    Plan shape: Scan → ArrowEvalPython (header-only parse — payloads
    never leave the Arrow batch) → posexplode → Project, no shuffle;
    a video's anchors stay in its input partition, exactly like
    table_rows. Downstream per-frame work (range reads, decode on a
    GPU pool) partitions on (id, frame_idx) without reshuffling here.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType

    from ..mediax import frame_sample_mp4

    n = max(1, int(every_n))

    @pandas_udf(ArrayType(LongType()))
    def _anchors(payload: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [int(o) for o in
                 frame_sample_mp4(bytes(p) if p is not None else b"", n)]
                for p in payload
            ]
        )

    return (
        media.select(
            F.col(id_col),
            F.posexplode(_anchors(F.col(payload_col)))
            .alias("frame_idx", "chunk_offset"),
        )
        .select(
            id_col,
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.col("chunk_offset").cast("bigint").alias("chunk_offset"),
        )
    )


def inline_image_dhash(docs: DataFrame, html_col: str = "html",
                       id_col: str = "doc_id") -> DataFrame:
    """Inline ``data:`` URI images, end to end: extracted by the
    responsive-image inventory (operators/meta.image_sources),
    base64-decoded ENTIRELY JVM-side (unbase64 in codegen — the bytes
    never exist as a Python string), then fingerprinted by the REAL
    PNG decoder + dHash (q105's path). One row per inline image:
    ``(id, img_idx, mime, dhash64)``; undecodable payloads yield NULL
    dhash like every other imagex consumer.

    This is the extraction→decode→fingerprint seam wired through:
    tracking pixels, inlined logos and spacer GIFs live in data: URIs,
    and near-dup banding over these hashes (q107) spots
    template-stamped imagery without ever fetching an asset."""
    from pyspark.sql import functions as F

    from .meta import image_sources

    imgs = image_sources(docs, html_col=html_col, id_col=id_col)
    src = F.col("effective_src")
    payload = F.unbase64(
        F.regexp_extract(src, r"^data:[^;]*;base64,(.*)$", 1)
    )
    return (
        imgs.filter(src.startswith("data:"))
        .select(
            id_col, "img_idx",
            F.regexp_extract(src, r"^data:([^;,]*)", 1).alias("mime"),
            dhash_udf(payload).alias("dhash64"),
        )
    )


def mime_sniff_mismatch(docs, id_col: str = "doc_id",
                        declared_col: str = "content_type",
                        payload_col: str = "payload"):
    """DECLARED-vs-SNIFFED MIME audit: ``(id, declared, sniffed,
    mismatch)`` — the content-smuggling / broken-origin check every
    archive pipeline runs on WARC payloads (q289 carries the
    declared header): a response declared ``text/html`` whose bytes
    open with ``%PDF`` routes to the WRONG extractor and silently
    produces garbage text, and polyglot payloads are a classic
    crawler attack surface. Sniffing is MAGIC-PREFIX based and runs
    entirely in codegen — ``hex(substring(payload))`` against the
    public signatures (PDF/PNG/JPEG/GIF/ZIP/gzip/WebP+RIFF), with
    markup detected by a trimmed leading ``<``; unknown bytes report
    ``application/octet-stream`` and never count as mismatch (no
    evidence either way). The full-fidelity Python sniffers
    (imagex/mediax) stay the deep-inspection path; this is the
    corpus-wide cheap pass that decides who needs them.
    Zero Python, zero shuffle."""
    from pyspark.sql import functions as F

    p = F.col(payload_col)
    hx = F.upper(F.hex(F.substring(p, 1, 12)))
    # regexp strip, not ltrim: leading newlines/tabs count as markup
    # whitespace and ltrim only removes spaces
    txt_head = F.regexp_replace(
        F.decode(F.substring(p, 1, 64), "UTF-8"), r"^\s+", ""
    )
    sniffed = (
        F.when(hx.startswith("25504446"), "application/pdf")
        .when(hx.startswith("89504E47"), "image/png")
        .when(hx.startswith("FFD8FF"), "image/jpeg")
        .when(hx.startswith("474946383"), "image/gif")
        .when(hx.startswith("1F8B"), "application/gzip")
        .when(hx.startswith("504B0304"), "application/zip")
        .when(
            (hx.startswith("52494646"))
            & (F.upper(F.hex(F.substring(p, 9, 4))) == "57454250"),
            "image/webp",
        )
        .when(F.lower(txt_head).startswith("<?xml"), "text/xml")
        .when(F.lower(txt_head).startswith("<svg"), "image/svg+xml")
        .when(txt_head.startswith("<"), "text/html")
        .otherwise("application/octet-stream")
    )
    declared = F.lower(
        F.trim(F.regexp_extract(F.col(declared_col), r"^([^;]+)", 1))
    )
    # markup is a sniff CLASS, not one type: a leading '<' cannot
    # distinguish html from xml/svg/rss/atom/xhtml, so any declared
    # markup type is consistent with any markup sniff (same
    # no-evidence rule as octet-stream); only cross-class conflicts
    # (e.g. %PDF under text/html) count as mismatch.
    sniff_markup = sniffed.isin("text/html", "text/xml",
                                "image/svg+xml")
    decl_markup = declared.contains("html") | declared.contains("xml")
    return docs.select(
        F.col(id_col),
        declared.alias("declared"),
        sniffed.alias("sniffed"),
        F.when(
            (sniffed != "application/octet-stream")
            & ~(sniff_markup & decl_markup)
            & (declared != sniffed), 1
        ).otherwise(0).cast("int").alias("mismatch"),
    )
