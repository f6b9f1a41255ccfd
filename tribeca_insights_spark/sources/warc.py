"""WARC source — read Common-Crawl-style WARC files into the docs table.

The input_hint's table (url, warc_ts, html, text, lang) is materialized
from WARC archives in real deployments; this connector closes that gap:
point the engine at ``.warc`` / ``.warc.gz`` files and get the docs
DataFrame. Pure-python WARC/1.x parsing (the format is line-oriented
headers + counted payload), gzip via stdlib — Common Crawl's per-record
gzip members decompress transparently with ``gzip.decompress`` on the
whole file (members concatenate).

Scale notes: files load via Spark's ``binaryFile`` source (one task per
file — WARC's gzip-member framing is not block-splittable without an
index; Common Crawl ships ~1 GiB files, so file-granular parallelism is
the standard approach — 64k files per crawl saturate any cluster);
records stream out of ``mapInPandas`` so a task never holds more than a
batch of parsed pages plus one raw file body.

Charset policy: HTML bytes are decoded for the ``text`` pipeline later;
here we *select* the bytes and carry the declared charset out-of-band:
``Content-Type`` header charset, else ``<meta charset>`` /
``http-equiv`` sniff from the first 1024 bytes, else utf-8 (matching the
requests-style decode the reference relied on, crawler.py:137-138).
"""

from __future__ import annotations

import gzip
import io
import re
from datetime import datetime
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import DOCS_SCHEMA

_CHARSET_HEADER_RE = re.compile(rb"charset=([A-Za-z0-9_.:-]+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I
)


def _split_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip()
    return headers


def parse_warc(data: bytes) -> List[dict]:
    """All response records of one WARC file (optionally gzipped) →
    [{url, warc_ts, html, charset}]. Tolerant: malformed records are
    skipped, never raised."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)  # concatenated members supported
        except OSError:
            return []
    out: List[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers = _split_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", b"0"))
        except ValueError:
            length = 0
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type", b"").lower() != b"response":
            continue
        url = headers.get("warc-target-uri", b"").decode("latin-1") or None
        ts: Optional[datetime] = None
        raw_ts = headers.get("warc-date", b"").decode("ascii", "ignore")
        try:
            ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            pass
        # body = HTTP response: status line + headers + payload
        http_end = body.find(b"\r\n\r\n")
        if http_end < 0:
            continue
        http_headers = _split_headers(body[:http_end])
        status = None
        line_end = body.find(b"\r\n")
        if line_end > 0:
            parts = body[:line_end].split()
            if len(parts) >= 2 and parts[0][:5] == b"HTTP/":
                try:
                    status = int(parts[1])
                except ValueError:
                    pass
        payload = body[http_end + 4 :]
        charset = None
        m = _CHARSET_HEADER_RE.search(http_headers.get("content-type", b""))
        if m:
            charset = m.group(1).decode("ascii", "ignore").lower()
        if charset is None:
            m = _META_CHARSET_RE.search(payload[:1024])
            if m:
                charset = m.group(1).decode("ascii", "ignore").lower()
        out.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": payload,
                "charset": charset or "utf-8",
                "status": status,
                "content_type": http_headers.get(
                    b"content-type".decode(), b""
                ).split(b";")[0].strip().decode("latin-1").lower(),
                "n_bytes": len(payload),
            }
        )
    return out


def read_warc(spark: SparkSession, path: str, default_lang: str = "") -> DataFrame:
    """WARC files under ``path`` → docs DataFrame (input_hint schema).
    ``text`` starts empty (the engine recomputes it); ``lang`` defaults
    (a langid pass — operators/textstats.lang_guess — fills it downstream)."""
    files = spark.read.format("binaryFile").load(path)

    def _to_utf8(payload: bytes, charset: str) -> bytes:
        # normalize at ingestion: the docs table's charset policy is utf-8
        # (FIXTURES.md §1), so declared non-utf8 payloads transcode here —
        # the engine-side decode then loses nothing
        if charset in ("utf-8", "utf8", "ascii", "us-ascii"):
            return payload
        try:
            return payload.decode(charset, errors="replace").encode("utf-8")
        except LookupError:  # unknown charset label → leave bytes as-is
            return payload

    def _records(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for content in pdf["content"]:
                recs = parse_warc(bytes(content))
                if not recs:
                    continue
                yield pd.DataFrame(
                    {
                        "url": [r["url"] for r in recs],
                        "warc_ts": [r["warc_ts"] for r in recs],
                        "html": [
                            _to_utf8(r["html"], r["charset"]) for r in recs
                        ],
                        "text": ["" for _ in recs],
                        "lang": [default_lang for _ in recs],
                    }
                )

    return files.select("content").mapInPandas(_records, schema=DOCS_SCHEMA)


def parse_wet(data: bytes) -> List[dict]:
    """WET (Common Crawl extracted-text) records: ``conversion`` type,
    payload IS the utf-8 text → [{url, warc_ts, text}]."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError:
            return []
    out: List[dict] = []
    pos = 0
    while pos < len(data):
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers = _split_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", b"0"))
        except ValueError:
            length = 0
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type", b"").lower() != b"conversion":
            continue
        url = headers.get("warc-target-uri", b"").decode("latin-1") or None
        ts: Optional[datetime] = None
        try:
            ts = datetime.strptime(
                headers.get("warc-date", b"").decode("ascii", "ignore"),
                "%Y-%m-%dT%H:%M:%SZ",
            )
        except ValueError:
            pass
        out.append(
            {
                "url": url,
                "warc_ts": ts,
                "text": body.decode("utf-8", errors="replace"),
            }
        )
    return out


def read_wet(spark: SparkSession, path: str, default_lang: str = "") -> DataFrame:
    """WET files → docs DataFrame with ``text`` ALREADY populated (html
    empty): the TF / dedup / quality layers run directly, no extraction."""
    files = spark.read.format("binaryFile").load(path)

    def _records(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for content in pdf["content"]:
                recs = parse_wet(bytes(content))
                if not recs:
                    continue
                yield pd.DataFrame(
                    {
                        "url": [r["url"] for r in recs],
                        "warc_ts": [r["warc_ts"] for r in recs],
                        "html": [b"" for _ in recs],
                        "text": [r["text"] for r in recs],
                        "lang": [default_lang for _ in recs],
                    }
                )

    return files.select("content").mapInPandas(_records, schema=DOCS_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic WARC builder (fixtures/tests)
# ---------------------------------------------------------------------------


def make_wet(pages: List[Tuple[str, str]], gzip_file: bool = False,
             ts: str = "2026-01-01T00:00:00Z") -> bytes:
    """pages = [(url, text)] → a WET byte string (conversion records)."""
    buf = io.BytesIO()
    for url, text in pages:
        body = text.encode("utf-8")
        h = [
            "WARC/1.0",
            "WARC-Type: conversion",
            f"WARC-Date: {ts}",
            f"WARC-Target-URI: {url}",
            "Content-Type: text/plain",
            f"Content-Length: {len(body)}",
        ]
        buf.write("\r\n".join(h).encode("latin-1"))
        buf.write(b"\r\n\r\n")
        buf.write(body)
        buf.write(b"\r\n\r\n")
    data = buf.getvalue()
    return gzip.compress(data) if gzip_file else data


def make_warc(pages: List[Tuple[str, str, str]], gzip_file: bool = False,
              ts: str = "2026-01-01T00:00:00Z") -> bytes:
    """pages = [(url, html, charset)] → a valid WARC/1.0 byte string with
    one response record per page (plus a warcinfo record)."""
    buf = io.BytesIO()

    def record(rtype: str, headers: List[Tuple[str, str]], body: bytes):
        h = [f"WARC/1.0", f"WARC-Type: {rtype}", f"WARC-Date: {ts}"]
        h += [f"{k}: {v}" for k, v in headers]
        h.append(f"Content-Length: {len(body)}")
        buf.write("\r\n".join(h).encode("latin-1"))
        buf.write(b"\r\n\r\n")
        buf.write(body)
        buf.write(b"\r\n\r\n")

    record("warcinfo", [("Content-Type", "application/warc-fields")],
           b"software: tribeca-insights-spark-fixture\r\n")
    for page in pages:
        url, html, charset = page[:3]
        status = page[3] if len(page) > 3 else 200
        payload = html.encode(charset, errors="replace")
        http = (
            b"HTTP/1.1 " + str(status).encode() + b" X"
            + b"\r\nContent-Type: text/html; charset="
            + charset.encode("ascii")
            + b"\r\nContent-Length: "
            + str(len(payload)).encode()
            + b"\r\n\r\n"
            + payload
        )
        record(
            "response",
            [("WARC-Target-URI", url),
             ("Content-Type", "application/http; msgtype=response")],
            http,
        )
    data = buf.getvalue()
    return gzip.compress(data) if gzip_file else data


META_SCHEMA = (
    "url string, warc_ts timestamp, status int, content_type string, "
    "n_bytes bigint"
)


def read_warc_meta(spark: SparkSession, path: str) -> DataFrame:
    """WARC response METADATA relation: ``(url, warc_ts, status,
    content_type, n_bytes)`` per response record — the fetch-log view
    crawl ops consume without touching payload bytes: status-code
    health per host, soft-404 candidates (q191), content-type routing
    (html → extractor, pdf → q48/q93, media → q29/q53), size
    anomalies. Same file-granular mapInPandas as read_warc; payloads
    are measured, never shipped."""
    files = spark.read.format("binaryFile").load(path)

    def _records(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for content in pdf["content"]:
                recs = parse_warc(bytes(content))
                if not recs:
                    continue
                yield pd.DataFrame(
                    {
                        "url": [r["url"] for r in recs],
                        "warc_ts": [r["warc_ts"] for r in recs],
                        "status": [r["status"] for r in recs],
                        "content_type": [r["content_type"]
                                         for r in recs],
                        "n_bytes": [r["n_bytes"] for r in recs],
                    }
                )

    return files.select("content").mapInPandas(
        _records, schema=META_SCHEMA
    )
