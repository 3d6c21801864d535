"""Multimodal (binary) column plumbing (BASELINE.json north-star).

Images/audio/video are opaque BinaryType columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
partition flow — is real and tested; the actual media decode is stubbed
(the container has no image/audio libs) behind `decode_stub`, which is
deterministic so tests can assert on it.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),   # image|audio|video
    StructField("payload", BinaryType()),      # opaque encoded bytes
    StructField("meta_json", StringType()),    # typed metadata as JSON
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(FloatType())),  # extracted feature vec
])


def text_as_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Adapter: treat UTF-8 text bytes as an opaque media payload so the
    binary pipeline is exercisable on the documents table."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("n_chars"))).alias("meta_json"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: byte-histogram feature.

    A real deployment swaps this for PIL/librosa/ffmpeg decode; the
    mapInPandas batch contract (bytes in, float vector out) is identical.
    """
    if payload is None:
        raise NotImplementedError("real media decode not available in this container")
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    n = max(1, len(payload))
    # half-UP 6dp rounding (what SQL round() does in Spark and DuckDB);
    # Python's round() is banker's and diverges on exact ties like 29/128
    return [math.floor(c / n * 1e6 + 0.5) / 1e6 for c in buckets]


def extract_features(df: DataFrame, dim: int = 8, batch_size: int = 1024) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    Partition-parallel, no shuffle: each task streams record batches,
    decodes, and emits fixed-width feature vectors. At 100 TB the decode
    cost dominates and scales linearly with executors.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p, dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "feature": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata extraction over binary payloads (no decode):
    byte length + md5 prefix — the cheap scan-side half of the pipeline."""
    return df.select(
        "media_id",
        "media_type",
        F.length("payload").alias("n_bytes"),
        F.substring(F.md5("payload"), 1, 8).alias("digest8"),
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize stage: real Spark plumbing (Arrow mapInPandas over
    binary payloads, metadata rewrite), STUBBED decode — the container
    has no image libs, so the "resized image" is a deterministic
    truncation/padding of the payload to width*height bytes. A real
    deployment replaces the inner loop with PIL decode->resize->encode;
    the schema, batch shape, and partition-parallel flow are identical.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                (p[:target] if len(p) >= target else p + b"\x00" * (target - len(p)))
                if p is not None else None
                for p in pdf["payload"]
            ]
            out["meta_json"] = [
                f'{{"resized": [{width}, {height}]}}' for _ in range(len(pdf))
            ]
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


# --- real media format: BMP (BI_RGB 24-bit) --------------------------------
#
# One genuine, spec-level binary format the pipeline decodes for real:
# Windows BMP with BITMAPINFOHEADER and uncompressed 24-bit pixels. BMP
# is chosen because it is fully writable/parsable in pure Python (no
# image libs in this container) while still exercising the format
# mechanics a real decoder faces: little-endian header fields, a pixel
# data offset, BGR byte order, 4-byte row stride padding, and bottom-up
# row storage. _fake_decode stays as the fallback for payloads that are
# not media at all.


def bmp_encode(width: int, height: int, rgb_rows: list[list[tuple]]) -> bytes:
    """Encode rows of (r, g, b) pixels (row 0 = visual TOP) as a
    standard bottom-up BI_RGB 24-bit BMP file."""
    if height <= 0 or width <= 0 or len(rgb_rows) != height:
        raise ValueError("rgb_rows must be height rows of width pixels")
    row_size = (3 * width + 3) & ~3        # rows pad to 4-byte stride
    img_size = row_size * height
    data_offset = 14 + 40                  # BITMAPFILEHEADER + BITMAPINFOHEADER
    header = struct.pack(
        "<2sIHHI", b"BM", data_offset + img_size, 0, 0, data_offset
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    for y in range(height - 1, -1, -1):    # bottom-up storage order
        row = bytearray()
        for r, g, b in rgb_rows[y]:
            row += bytes((b, g, r))        # BGR on disk
        row += b"\x00" * (row_size - len(row))
        body += row
    return header + info + bytes(body)


def bmp_decode(payload: bytes) -> tuple[int, int, list[list[tuple]]]:
    """Parse a BI_RGB 24-bit BMP per spec: returns (width, height, rows
    of (r, g, b) with row 0 = visual TOP). Honors the header's pixel
    data offset, row stride padding, and both bottom-up (height > 0)
    and top-down (height < 0) storage. Raises ValueError on anything
    that is not an uncompressed 24-bit BMP."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40 or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP header (size={hdr_size}, {w}x{h})")
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only BI_RGB 24-bit supported (bpp={bpp}, comp={compression})")
    top_down = h < 0
    height = -h if top_down else h
    row_size = (3 * w + 3) & ~3
    if len(payload) < data_offset + row_size * height:
        raise ValueError("truncated BMP pixel array")
    rows = []
    for i in range(height):                # i = visual row from the top
        stored = i if top_down else height - 1 - i
        off = data_offset + stored * row_size
        rows.append([
            (payload[off + 3 * x + 2], payload[off + 3 * x + 1], payload[off + 3 * x])
            for x in range(w)
        ])
    return w, height, rows


def synth_bmp_pixels(media_id: int) -> tuple[int, int, list[list[tuple]]]:
    """Deterministic synthetic image for media_id: (4 + id%5) x (3 + id%4)
    pixels with channel values that are simple integer functions of
    (id, x, y) — closed-form recomputable by any engine, which is what
    lets the DuckDB oracle check a REAL format round-trip without
    parsing BMP itself."""
    w, h = 4 + media_id % 5, 3 + media_id % 4
    rows = [
        [
            (
                (media_id + 3 * x + 7 * y) % 256,
                (2 * media_id + 5 * x + 11 * y) % 256,
                (3 * media_id + 13 * x + 17 * y) % 256,
            )
            for x in range(w)
        ]
        for y in range(h)
    ]
    return w, h, rows


def synth_bmp_media(df: DataFrame, id_col: str) -> DataFrame:
    """Generate a genuine BMP payload per row (bmp_encode over
    synth_bmp_pixels) through the standard media schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image"] * len(ids),
                "payload": [bmp_encode(*synth_bmp_pixels(i)) for i in ids],
                "meta_json": ['{"format": "bmp"}'] * len(ids),
            })

    return df.select(id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


BMP_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("r00", IntegerType()),          # top-left red: catches row-order bugs
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
])


def bmp_features(df: DataFrame) -> DataFrame:
    """Real-decode feature extraction: parse each BMP payload per spec
    (bmp_decode — header offsets, stride padding, bottom-up flip) and
    emit per-channel means + the top-left red value. Same Arrow
    mapInPandas flow as extract_features; decode cost scales linearly
    with executors, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "width", "height", "r00", "mean_r", "mean_g", "mean_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rows = bmp_decode(payload)
                n = w * h
                sums = [0, 0, 0]
                for row in rows:
                    for px in row:
                        sums[0] += px[0]; sums[1] += px[1]; sums[2] += px[2]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["r00"].append(rows[0][0][0])
                # half-up 6dp, matching SQL round() in both engines
                for k, s in zip(("mean_r", "mean_g", "mean_b"), sums):
                    out[k].append(math.floor(s / n * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=BMP_FEATURE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame", BinaryType()),
])


def sample_frames_stub(
    df: DataFrame, frame_bytes: int = 256, every_n: int = 10
) -> DataFrame:
    """Video frame sampling: emit every_n-th fixed-size chunk of the
    payload as a "frame" (1 input row -> N output rows). The chunking is
    the deterministic stand-in for an ffmpeg keyframe decode; the
    fan-out row shape (media_id, frame_idx, frame) and the
    partition-local expansion are what a real pipeline needs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_chunks = max(1, len(payload) // frame_bytes)
                for fi in range(0, n_chunks, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(payload[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
