"""WARC (web-archive) source: the reference's CommonCrawlLoader re-expressed
as ``binaryFile`` scan + Arrow-batched parse (loaders/commoncrawl_loader.py:
17-175: fetch WARC, keep text/html responses, extract readable text, yield
{crawl_id, warc_path, url, warc_date, title, text, text_length}).

Spark-first: file-level parallelism comes from input splits of the
``binaryFile`` datasource (one task per WARC file — the reference's
file->worker sharding, executor.py:237-310, for free); parsing runs in
``mapInPandas`` so one Python pass handles a whole file. The record parser
is pure-python (WARC is line-oriented headers + Content-Length payloads),
with per-file error containment: corrupt members skip, they never fail
the task. HTML -> text extraction uses
trafilatura when importable, else a deterministic tag-strip fallback
(the Rust readability kernel of the reference, src/text_ops.rs:16-58, is a
quality upgrade behind the same column contract; extracts shorter than 50
chars are dropped, text_ops.rs:24).
"""

from __future__ import annotations

import gzip
import io
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "crawl_id string, warc_path string, url string, warc_date string, "
    "title string, text string, text_length int"
)

MIN_TEXT_LEN = 50

try:
    import trafilatura  # type: ignore

    _HAVE_TRAFILATURA = True
except Exception:  # pragma: no cover
    _HAVE_TRAFILATURA = False

_TAG_RE = re.compile(rb"<(script|style)[^>]*>.*?</\1>", re.S | re.I)
_HTML_RE = re.compile(rb"<[^>]+>")
_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.S | re.I)
_WS_RE = re.compile(r"\s+")


def extract_text(html: bytes) -> tuple[str, str]:
    """(title, text). Deterministic tag-strip fallback; trafilatura when
    available."""
    m = _TITLE_RE.search(html)
    title = ""
    if m:
        title = _WS_RE.sub(" ", m.group(1).decode("utf-8", "replace")).strip()
    if _HAVE_TRAFILATURA:  # pragma: no cover - not in this container
        text = trafilatura.extract(html.decode("utf-8", "replace")) or ""
        return title, text.strip()
    body = _TAG_RE.sub(b" ", html)
    body = _HTML_RE.sub(b" ", body)
    text = _WS_RE.sub(" ", body.decode("utf-8", "replace")).strip()
    return title, text


def parse_warc_bytes(data: bytes, warc_path: str, crawl_id: str) -> Iterator[dict]:
    """Yield text records from one (possibly gzipped) WARC file's bytes.

    Keeps ``response`` records with an HTML payload, mirroring
    commoncrawl_loader.py:66-145; drops extracts under MIN_TEXT_LEN chars.

    Error containment matches the reference loader's skip-and-continue
    posture: a truncated gzip member or a malformed Content-Length must
    not kill the task (retries would fail deterministically and abort the
    job over one bad record in a multi-GB file) — the bad record (or, for
    a failed decompress, the whole file) is skipped.
    """
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError):  # truncated/corrupt download
            return
    yield from parse_warc_stream(io.BytesIO(data), warc_path, crawl_id)


def parse_warc_stream(stream, warc_path: str, crawl_id: str) -> Iterator[dict]:
    """Core record loop over a binary file-like (readline/read) — the
    STREAMING form: the Python DataSource hands it a (gzip) file object so
    per-task memory is a read window, never raw+inflated whole-file copies
    (``parse_warc_bytes`` wraps in-memory bytes for the ``binaryFile`` path,
    whose contract already materializes the file)."""
    # a "WARC/..." line only STARTS a record at a true boundary: file
    # start or right after a blank separator line. Without this, a record
    # skipped for a corrupt Content-Length leaves its payload unconsumed,
    # and any payload line beginning "WARC/" (an HTML page ABOUT the WARC
    # format) would fabricate a phantom record with garbage headers.
    at_boundary = True
    while True:
        line = stream.readline()
        if not line:
            break
        starts = line.startswith(b"WARC/") and at_boundary
        at_boundary = line in (b"\r\n", b"\n")
        if not starts:
            continue
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode().strip().lower()] = v.decode("utf-8", "replace").strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:  # corrupt header: skip record, keep scanning
            continue
        payload = stream.read(length)
        if headers.get("warc-type") != "response":
            continue
        # split HTTP response headers from body
        sep = payload.find(b"\r\n\r\n")
        http_head, body = (payload[:sep], payload[sep + 4 :]) if sep >= 0 else (b"", payload)
        if b"text/html" not in http_head.lower():
            continue
        try:
            title, text = extract_text(body)
        except Exception:  # noqa: BLE001 - extractor crash on pathological HTML
            continue
        if len(text) < MIN_TEXT_LEN:
            continue
        yield {
            "crawl_id": crawl_id,
            "warc_path": warc_path,
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "title": title,
            "text": text,
            "text_length": len(text),
        }


def parse_warc_files(files: DataFrame, *, crawl_id: str = "") -> DataFrame:
    """(path, content) rows -> parsed text records. ``files`` is whatever
    produced the bytes — a ``binaryFile`` scan, a remote-fetch stage, or an
    in-plan fixture — so the parse stage is testable and oracle-checkable
    independent of the I/O stage."""
    import pandas as pd

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(bytes(content), p, crawl_id))
            yield pd.DataFrame(
                rows,
                columns=["crawl_id", "warc_path", "url", "warc_date", "title", "text", "text_length"],
            )

    return files.mapInPandas(_parse, WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str, *, options: dict[str, str] | None = None) -> DataFrame:
    """WARC files -> DataFrame with the reference's text-record schema."""
    crawl_id = (options or {}).get("crawl_id", "")
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return parse_warc_files(files, crawl_id=crawl_id)
