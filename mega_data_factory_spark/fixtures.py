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
