"""Deterministic in-query image fixtures.

The test tables carry no binary image column, so image-family queries and
benches synthesize BMP records inside the plan (generated per-partition via
``mapInPandas`` — distributed, never driver-side). Everything is a pure
function of ``id``, so an ANSI-SQL oracle can mirror the metadata
(width/height/file size/format) with integer arithmetic, and repeated pixel
content (``id % content_period``) gives the phash dedup real duplicates.

BMP layout matches operators.images._decode_bmp: 24-bit, bottom-up,
4-byte-aligned rows, 54-byte header.
"""

from __future__ import annotations

import struct


def bmp_bytes(arr) -> bytes:
    """Minimal 24-bit bottom-up BMP for an (h, w, 3) uint8 array."""
    import numpy as np

    h, w, _ = arr.shape
    row = ((w * 3 + 3) // 4) * 4
    px = np.zeros((h, row), dtype=np.uint8)
    px[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data = px.tobytes()
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def image_size(i: int, *, vary_size: bool) -> tuple[int, int]:
    """(width, height) for image id i — pure integer arithmetic so the SQL
    oracle reproduces it: w = 32 + (i % 5) * 8, h = 32 + (i % 3) * 16."""
    if not vary_size:
        return 64, 64
    return 32 + (i % 5) * 8, 32 + (i % 3) * 16


def image_size_sql(id_expr: str = "id") -> tuple[str, str, str]:
    """SQL mirrors of (width, height, bmp file size) for ``vary_size=True``."""
    w = f"(32 + ({id_expr} % 5) * 8)"
    h = f"(32 + ({id_expr} % 3) * 16)"
    size = f"(54 + {h} * ((({w} * 3 + 3) // 4) * 4))"
    return w, h, size


def image_df(spark, n: int, *, content_period: int = 2048, vary_size: bool = False):
    """n synthetic BMP records ``(id long, image binary)``.

    Pixel content is seeded by ``id % content_period`` (ids that agree mod
    the period are pixel-identical -> phash duplicates). With
    ``vary_size=True`` dimensions follow ``image_size`` (metadata becomes a
    deterministic function of id, mirrored by ``image_size_sql``); note
    content can only repeat between ids whose sizes also agree
    (period a multiple of 15 keeps sizes aligned mod the period).
    """
    import pandas as pd

    def gen(batches):
        import numpy as np

        for pdf in batches:
            imgs = []
            for i in pdf["id"]:
                i = int(i)
                w, h = image_size(i, vary_size=vary_size)
                rng = np.random.default_rng(i % content_period)
                imgs.append(bmp_bytes(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)))
            yield pd.DataFrame({"id": pdf["id"].astype("int64"), "image": imgs})

    par = int(spark.sparkContext.defaultParallelism)
    return spark.range(n).repartition(par, "id").mapInPandas(gen, "id long, image binary")


# ------------------------------------------------------------ WARC fixtures

WARC_DATE = "2024-01-01T00:00:00Z"
RECS_PER_FILE = 3  # html responses kept per fixture file


def warc_html(fid: int, rid: int) -> bytes:
    """Deterministic HTML for record rid of file fid. The tag-strip
    extractor yields exactly ``warc_text_sql``'s value (title text is part
    of the stripped body, then whitespace collapses)."""
    gid = fid * RECS_PER_FILE + rid
    return (
        f"<html><head><title>Doc {gid} title</title></head>"
        f"<body><p>Paragraph one for document {gid} carries deterministic "
        f"words alpha{gid} beta{gid} gamma{gid}.</p>"
        f"<script>var x = {gid};</script></body></html>"
    ).encode()


def warc_text_sql(fid_expr: str, rid_expr: str) -> tuple[str, str, str]:
    """SQL mirrors of (title, text, url) for record (fid, rid)."""
    gid = f"({fid_expr} * {RECS_PER_FILE} + {rid_expr})"
    title = f"('Doc ' || {gid} || ' title')"
    text = (
        f"('Doc ' || {gid} || ' title Paragraph one for document ' || {gid} || "
        f"' carries deterministic words alpha' || {gid} || ' beta' || {gid} || "
        f"' gamma' || {gid} || '.')"
    )
    url = f"('http://example.com/' || {fid_expr} || '/' || {rid_expr})"
    return title, text, url


def _warc_record(warc_type: bytes, uri: bytes, payload: bytes) -> bytes:
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type + b"\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"WARC-Date: " + WARC_DATE.encode() + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def warc_file_bytes(fid: int) -> bytes:
    """One WARC file: a warcinfo record (skipped by the parser), three html
    responses (kept), one text/plain response (skipped), one html response
    whose extract is under MIN_TEXT_LEN (dropped). Odd fids are gzipped
    (mtime pinned -> bytes deterministic) to exercise the decompress path.
    """
    import gzip as _gzip
    import io as _io

    def http(body: bytes, ctype: bytes) -> bytes:
        return b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body

    out = [_warc_record(b"warcinfo", b"", b"software: fixture\r\n")]
    for rid in range(RECS_PER_FILE):
        uri = f"http://example.com/{fid}/{rid}".encode()
        out.append(_warc_record(b"response", uri, http(warc_html(fid, rid), b"text/html")))
    out.append(_warc_record(b"response", f"http://example.com/{fid}/plain".encode(), http(b"plain text payload, long enough to pass any length gate but wrong content type", b"text/plain")))
    out.append(_warc_record(b"response", f"http://example.com/{fid}/short".encode(), http(b"<html><body><p>tiny</p></body></html>", b"text/html")))
    raw = b"".join(out)
    if fid % 2 == 1:
        buf = _io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(raw)
        return buf.getvalue()
    return raw


def warc_files_df(spark, n_files: int):
    """n_files synthetic WARC files ``(path string, content binary)`` —
    the same shape a ``binaryFile`` scan produces, generated distributed
    as a pure function of id (the image_df pattern)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": [f"mem://warc/{int(i)}.warc" + (".gz" if int(i) % 2 else "") for i in pdf["id"]],
                    "content": [warc_file_bytes(int(i)) for i in pdf["id"]],
                }
            )

    par = int(spark.sparkContext.defaultParallelism)
    return spark.range(n_files).repartition(par, "id").mapInPandas(gen, "path string, content binary")
