"""Multimodal (image) operators — Arrow-batched Python, PIL-free.

Re-expresses the reference's deterministic image operators (SURVEY §2.3,
§2.5) with the Spark-first layout: images are opaque ``binary`` columns
(nested ``image.bytes`` struct supported, the HF datasets convention —
reference operators/refiners/image_metadata.py:38-41); compute happens in
Arrow-batched pandas UDFs; derived compact columns (width, scores, phash)
are what flows into filters/shuffles — never the bytes themselves
(the precompute pattern of image_phash_dedup.py:75-76).

Decoding: this container has no PIL/opencv, so instead of stubbing we ship
a real minimal decoder for the two formats the tests synthesize:
  * PNG — stdlib zlib inflate + scanline unfilter in numpy (8-bit
    grayscale/RGB/RGBA, non-interlaced);
  * BMP — uncompressed 24/32-bit, direct numpy frombuffer.
Header-only metadata additionally covers JPEG (SOF scan) and GIF. A PIL
path is import-gated: if Pillow is present it takes over decoding for all
formats; the numpy math (entropy/blockiness/phash) is shared either way.

At 100 TB: decode runs inside ``mapInPandas`` with bounded Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch), so executor memory is
``batch x avg_image_size``; the derived columns are tiny and the binary
column is pruned away the moment it is no longer selected.
"""

from __future__ import annotations

import struct as _struct
import zlib
from collections.abc import Iterator

import numpy as np

try:  # optional accelerated/general decode path
    from PIL import Image as _PILImage  # type: ignore
    import io as _io

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mega_data_factory_spark.operators.base import Deduplicator, Refiner

# ------------------------------------------------------------ byte parsing


def parse_image_meta(b: bytes | None) -> tuple[int, int, str]:
    """(width, height, format) from file headers; (0, 0, 'ERROR') on any
    failure — reference image_metadata.py:49-58 semantics."""
    try:
        if not b or len(b) < 16:
            return 0, 0, "ERROR"
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = _struct.unpack(">II", b[16:24])
            return w, h, "PNG"
        if b[:2] == b"BM":
            w, h = _struct.unpack("<ii", b[18:26])
            return abs(w), abs(h), "BMP"
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = _struct.unpack("<HH", b[6:10])
            return w, h, "GIF"
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                    h, w = _struct.unpack(">HH", b[i + 5 : i + 9])
                    return w, h, "JPEG"
                seg_len = _struct.unpack(">H", b[i + 2 : i + 4])[0]
                i += 2 + seg_len
            return 0, 0, "ERROR"
        return 0, 0, "ERROR"
    except Exception:
        return 0, 0, "ERROR"


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4). Row-sequential by
    necessity (each row depends on the previous reconstructed row)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(h):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride].astype(np.intp)
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b_ = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                cur[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_image(b: bytes | None) -> np.ndarray | None:
    """Decode to HxWxC uint8 (C in 1/2/3/4); None on failure."""
    if not b:
        return None
    try:
        if _HAVE_PIL:
            arr = np.asarray(_PILImage.open(_io.BytesIO(b)).convert("RGB"))
            return arr
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(b)
        if b[:2] == b"BM":
            return _decode_bmp(b)
        return None
    except Exception:
        return None


def _decode_png(b: bytes) -> np.ndarray | None:
    w, h = _struct.unpack(">II", b[16:24])
    bit_depth, color_type, _comp, _filt, interlace = b[24:29]
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        return None
    ch = _PNG_CHANNELS[color_type]
    # concatenate IDAT chunks
    idat = bytearray()
    i = 8
    while i + 8 <= len(b):
        (length,) = _struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        if ctype == b"IDAT":
            idat += b[i + 8 : i + 8 + length]
        if ctype == b"IEND":
            break
        i += 12 + length
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch
    px = _png_unfilter(raw, h, stride, ch)
    return px.reshape(h, w, ch)


def _decode_bmp(b: bytes) -> np.ndarray | None:
    (data_off,) = _struct.unpack("<I", b[10:14])
    w, h = _struct.unpack("<ii", b[18:26])
    (bpp,) = _struct.unpack("<H", b[28:30])
    (compression,) = _struct.unpack("<I", b[30:34])
    if compression != 0 or bpp not in (24, 32):
        return None
    ch = bpp // 8
    flip = h > 0
    h = abs(h)
    row_size = ((w * ch + 3) // 4) * 4
    px = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=data_off)
    px = px.reshape(h, row_size)[:, : w * ch].reshape(h, w, ch)
    if flip:
        px = px[::-1]
    # BMP stores BGR(A) -> RGB(A)
    px = px[..., [2, 1, 0] + ([3] if ch == 4 else [])]
    return px


# ------------------------------------------------------------- numpy kernels


def shannon_entropy(img: np.ndarray) -> float:
    """Mean per-channel 256-bin Shannon entropy in bits — reference
    ImageTechnicalQualityRefiner formula (image_technical_quality.py:149-186,
    src/image_ops.rs:12-48)."""
    if img.ndim == 2:
        img = img[..., None]
    ents = []
    for c in range(img.shape[2]):
        counts = np.bincount(img[..., c].reshape(-1), minlength=256).astype(np.float64)
        p = counts / counts.sum()
        nz = p[p > 0]
        ents.append(float(-(nz * np.log2(nz)).sum()))
    return float(np.mean(ents))


def blockiness(gray: np.ndarray, block: int = 8) -> float:
    """Mean luminance discontinuity across block-grid boundaries relative to
    overall gradient magnitude — the 8x8 blockiness component of the
    reference's compression-artifact score (image_technical_quality.py:98-147).
    0 when the image has no interior block boundaries."""
    g = gray.astype(np.float64)
    h, w = g.shape
    if h < 2 * block or w < 2 * block:
        return 0.0
    col_edges = np.arange(block, w, block)
    row_edges = np.arange(block, h, block)
    boundary = np.abs(g[:, col_edges] - g[:, col_edges - 1]).mean() + np.abs(g[row_edges, :] - g[row_edges - 1, :]).mean()
    overall = np.abs(np.diff(g, axis=1)).mean() + np.abs(np.diff(g, axis=0)).mean()
    if overall <= 1e-12:
        return 0.0
    return float(min(max(boundary / (overall * 2.0) - 0.5, 0.0), 1.0))


def compression_artifact_score(img: np.ndarray, nbytes: int) -> float:
    """Composite artifact score in [0,1]: 0.6 * blockiness + 0.4 *
    compression-ratio score (higher compression -> higher suspected
    artifacts), matching the reference's weighting
    (image_technical_quality.py:98-147; SURVEY §2.3)."""
    if img.ndim == 2:
        gray = img.astype(np.float64)
    else:
        gray = img[..., : min(3, img.shape[2])].astype(np.float64).mean(axis=2)
    ratio = nbytes / float(img.size)  # bytes per sample; ~1 uncompressed
    ratio_score = float(min(max(1.0 - ratio, 0.0), 1.0))
    return float(min(max(0.6 * blockiness(gray) + 0.4 * ratio_score, 0.0), 1.0))


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def dct_phash(img: np.ndarray, hash_size: int = 8) -> str:
    """Perceptual hash: area-mean resize to 32x32 luminance, 2-D DCT-II,
    top-left hash_size x hash_size coefficients (minus DC) thresholded at
    their median -> hex string. The classic pHash construction (reference
    uses DoubleGradient in Rust / imagehash.phash fallback,
    image_phash_dedup.py:62-69 — same role, deterministic here)."""
    if img.ndim == 3:
        gray = img[..., : min(3, img.shape[2])].astype(np.float64).mean(axis=2)
    else:
        gray = img.astype(np.float64)
    h, w = gray.shape
    n = 32
    # area-mean resize via integer bucket averaging (deterministic).
    # reduceat sums each [ys[i], ys[i+1]) row band (an empty band yields the
    # single row at ys[i], matching a 1-row fallback), then each column band.
    ys = (np.arange(n) * h) // n
    xs = (np.arange(n) * w) // n
    band = np.add.reduceat(gray, ys, axis=0)
    sums = np.add.reduceat(band, xs, axis=1)
    ycnt = np.maximum(np.diff(np.append(ys, h)), 1)
    xcnt = np.maximum(np.diff(np.append(xs, w)), 1)
    small = sums / (ycnt[:, None] * xcnt[None, :])
    m = _dct_matrix(n)
    coeffs = m @ small @ m.T
    block = coeffs[:hash_size, :hash_size].reshape(-1)[1:]
    med = np.median(block)
    bits = block > med
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return format(val, f"0{(len(bits) + 3) // 4}x")


# ---------------------------------------------------------------- operators

_META_FIELDS = [
    StructField("image_width", IntegerType()),
    StructField("image_height", IntegerType()),
    StructField("image_file_size_bytes", LongType()),
    StructField("image_format", StringType()),
]


def _bytes_col(df: DataFrame, image_col: str) -> Column:
    """Resolve a binary column or the HF-style ``image.bytes`` struct field."""
    field = dict(zip(df.schema.names, df.schema.fields))[image_col] if image_col in df.schema.names else None
    if field is not None and isinstance(field.dataType, StructType) and "bytes" in field.dataType.names:
        return F.col(f"{image_col}.bytes")
    return F.col(image_col)


class ImageMetadataRefiner(Refiner):
    """Adds image_width/height/file_size_bytes/format from headers only —
    no pixel decode, so throughput is parse-bound (reference
    ImageMetadataRefiner, image_metadata.py:25-67)."""

    def __init__(self, *, image_col: str = "image", name: str | None = None):
        super().__init__(name)
        self.image_col = image_col

    def columns(self, df: DataFrame) -> dict[str, Column]:
        import pandas as pd

        def _meta(data):
            rows = [parse_image_meta(b) for b in data]
            return pd.DataFrame(rows, columns=["image_width", "image_height", "image_format"])

        # NB: explicit returnType, no type hints — Spark's hint parser does
        # not accept the Series -> DataFrame (struct-returning) signature.
        meta_udf = F.pandas_udf(_meta, StructType(_META_FIELDS[:2] + [_META_FIELDS[3]]))

        b = _bytes_col(df, self.image_col)
        m = meta_udf(b)
        return {
            "image_width": m["image_width"],
            "image_height": m["image_height"],
            "image_file_size_bytes": F.coalesce(F.octet_length(b).cast("long"), F.lit(0).cast("long")),
            "image_format": m["image_format"],
        }


class ImageTechnicalQualityRefiner(Refiner):
    """Adds image_compression_artifacts + image_information_entropy
    (float32, NULL on undecodable) — reference formulas re-expressed in
    numpy inside one Arrow-batched pandas UDF
    (image_technical_quality.py:41-193, src/image_ops.rs:12-146)."""

    def __init__(self, *, image_col: str = "image", name: str | None = None):
        super().__init__(name)
        self.image_col = image_col

    def columns(self, df: DataFrame) -> dict[str, Column]:
        import pandas as pd

        def _quality(data):
            arts, ents = [], []
            for b in data:
                img = decode_image(b)
                if img is None:
                    arts.append(None)
                    ents.append(None)
                else:
                    arts.append(compression_artifact_score(img, len(b)))
                    ents.append(shannon_entropy(img))
            return pd.DataFrame(
                {"image_compression_artifacts": arts, "image_information_entropy": ents}, dtype="float32"
            )

        quality_udf = F.pandas_udf(
            _quality,
            StructType(
                [
                    StructField("image_compression_artifacts", FloatType()),
                    StructField("image_information_entropy", FloatType()),
                ]
            ),
        )

        q = quality_udf(_bytes_col(df, self.image_col))
        return {
            "image_compression_artifacts": q["image_compression_artifacts"],
            "image_information_entropy": q["image_information_entropy"],
        }


class ImagePhashDeduplicator(Deduplicator):
    """First-seen-wins dedup on the perceptual hash; reuses a precomputed
    ``phash`` column when present (reference image_phash_dedup.py:75-76),
    falling back to decode+DCT. Undecodable images key on their id so they
    never collide (image_phash_dedup.py: failures -> key = id)."""

    def __init__(self, *, image_col: str = "image", id_col: str = "id", phash_col: str = "phash", name: str | None = None):
        super().__init__(name, order_col=id_col, id_col=id_col)
        self.image_col = image_col
        self.phash_col = phash_col

    def key(self, df: DataFrame) -> Column:
        import pandas as pd

        # NB: no type hints on any pandas-UDF function in this module —
        # `from __future__ import annotations` stringifies them and Spark's
        # hint parser rejects the quoted form.
        @F.pandas_udf(StringType())
        def phash_udf(data):
            out = []
            for b in data:
                img = decode_image(b)
                out.append(dct_phash(img) if img is not None else None)
            return pd.Series(out)

        computed = phash_udf(_bytes_col(df, self.image_col))
        pre = F.col(self.phash_col) if self.phash_col in df.columns else F.lit(None).cast("string")
        return F.coalesce(pre, computed, F.concat(F.lit("id:"), F.col(self.id_col).cast("string")))
