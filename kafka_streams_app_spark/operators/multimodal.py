"""Multimodal (binary) column plumbing (BASELINE.json north-star).

Images/audio/video are opaque BinaryType columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
partition flow — is real and tested, and FIVE format families decode
for real, per spec, pure stdlib (+ numpy for the JPEG DCT): BMP, PNG
(CRC-checked chunks, zlib inflate, all five scanline filters; RGB +
palette color types), GIF89a (full LZW, interlace, animation frames),
WAV (RIFF PCM16), and baseline JPEG — grayscale AND 4:2:0/4:4:4
YCbCr color (Annex K Huffman, ZRL/EOB, interleaved MCUs,
per-component DC prediction, IDCT, edge-MCU crop, BT.601 inverse) —
each against an analytic DuckDB oracle. The generic entry point is
`extract_features_auto`: magic-byte sniffing routes each payload to
its real decoder (with a 'corrupt' quarantine for recognized-magic
payloads that fail spec validation), so the byte-histogram stand-in
(`_fake_decode` / `extract_features`) now covers ONLY payloads in
formats the container has no decoder for (a production deployment
swaps in PIL/ffmpeg under the same Arrow bytes-in/vector-out
contract).
"""

from __future__ import annotations

import logging
import math
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

_LOG = logging.getLogger(__name__)

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


def _synth_input(df: DataFrame, id_col: str) -> DataFrame:
    """Id column for a synth mapInPandas pass, rebalanced to cluster
    parallelism for batch inputs: the downstream encode + decode is the
    compute-heavy stage and a single-file scan arrives as ONE partition
    at testdata sizes, serializing the whole codec chain on one core.
    r15 measurement (sf0.1, local[32]): multimodal_jpeg_color_decode
    12.9 s -> ~1 s once the 1-partition input was rebalanced — the
    same rationale and fix synth_mixed_media shipped with in the r15
    build phase, now applied to every per-format synth. The shuffle
    moves ONLY the id column. Streaming inputs pass through
    (micro-batches inherit source parallelism; .rdd introspection is
    unavailable on a streaming DataFrame)."""
    from kafka_streams_app_spark.engine import ensure_parallelism

    out = df.select(id_col)
    if not out.isStreaming:
        out = ensure_parallelism(out)
    return out


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

    return _synth_input(df, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


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
    emit per-channel means + the top-left red value (_rgb_features).
    Same Arrow mapInPandas flow as extract_features; decode cost scales
    linearly with executors, no shuffle."""
    return _rgb_features(df, bmp_decode)


# --- real media format #2: PNG (8-bit truecolor, zlib) ---------------------
#
# The second genuine spec-level decoder (r12 verdict ask #4): PNG per
# RFC 2083 / the W3C spec, pure stdlib — chunk framing with CRC-32
# verification, IHDR validation, multi-IDAT zlib inflate, and full
# scanline filter reconstruction (None/Sub/Up/Average/Paeth). The
# encoder cycles through all five filter types row by row so the
# decoder's reconstruction of each is exercised on every image.


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_filter(ft: int, cur: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward-filter one scanline (encode side)."""
    n = len(cur)
    out = bytearray(n)
    for i in range(n):
        left = cur[i - bpp] if i >= bpp else 0
        up = prev[i]
        upleft = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) >> 1
        else:
            pred = _paeth(left, up, upleft)
        out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


def _png_unfilter(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Reconstruct one scanline (decode side, PNG spec §6)."""
    if ft > 4:
        raise ValueError(f"invalid PNG filter type {ft}")
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        left = out[i - bpp] if i >= bpp else 0
        up = prev[i]
        upleft = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) >> 1
        else:
            pred = _paeth(left, up, upleft)
        out[i] = (line[i] + pred) & 0xFF
    return bytes(out)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, rgb_rows: list[list[tuple]]) -> bytes:
    """Encode rows of (r, g, b) pixels (row 0 = visual TOP) as a
    standard 8-bit truecolor PNG; scanline y carries filter type y % 5
    so every spec filter appears in any image of height >= 5."""
    if height <= 0 or width <= 0 or len(rgb_rows) != height:
        raise ValueError("rgb_rows must be height rows of width pixels")
    raw = bytearray()
    prev = bytes(3 * width)
    for y, rowpix in enumerate(rgb_rows):
        cur = bytes(c for px in rowpix for c in px)   # RGB on the wire
        ft = y % 5
        raw.append(ft)
        raw += _png_filter(ft, cur, prev, 3)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def png_encode_palette(
    width: int,
    height: int,
    palette: list[tuple],
    index_rows: list[list[int]],
    depth: int = 8,
) -> bytes:
    """Encode palette-indexed pixels as a standard color-type-3 PNG
    (PLTE chunk + index scanlines), bit depth 8 (one index per byte)
    or 4 (two per byte, HIGH nibble first, last byte padded — the
    sub-byte packing path). Filters cycle y % 5 with bpp=1 (per spec,
    filtering operates on BYTES for sub-byte depths)."""
    if depth not in (8, 4):
        raise ValueError(f"palette PNG depth must be 8 or 4, got {depth}")
    if len(palette) > (1 << depth):
        raise ValueError(f"palette has {len(palette)} entries > 2^{depth}")
    raw = bytearray()
    stride = width if depth == 8 else (width + 1) // 2
    prev = bytes(stride)
    for y in range(height):
        idx = index_rows[y]
        if depth == 8:
            cur = bytes(idx)
        else:
            packed = bytearray(stride)
            for x, ci in enumerate(idx):
                if ci >= 16:
                    raise ValueError(f"index {ci} exceeds 4-bit palette")
                packed[x // 2] |= ci << (4 if x % 2 == 0 else 0)
            cur = bytes(packed)
        ft = y % 5
        raw.append(ft)
        raw += _png_filter(ft, cur, prev, 1)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 3, 0, 0, 0)
    plte = bytes(c for px in palette for c in px)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> tuple[int, int, list[list[tuple]]]:
    """Parse a PNG per spec: chunk framing with CRC-32 checks, IHDR
    validation, concatenated-IDAT zlib inflate, and per-scanline
    filter reconstruction. Handles 8-bit truecolor (color type 2) AND
    palette images (color type 3, bit depth 8 or 4 — PLTE lookup,
    sub-byte nibble unpacking at depth 4). Returns (width, height,
    rows of (r, g, b) with row 0 = visual TOP). Raises ValueError on
    any other variant or structural corruption."""
    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (missing signature)")
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    ok = (color == 2 and depth == 8) or (color == 3 and depth in (8, 4))
    if not ok or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only non-interlaced 8-bit RGB or 8/4-bit palette supported "
            f"(depth={depth}, color={color}, interlace={interlace})"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    try:
        # zlib raises zlib.error (NOT a ValueError) on a corrupt or
        # missing deflate stream; translate so the documented "raises
        # ValueError on structural corruption" contract holds even for
        # CRC-valid chunks whose compressed payload is garbage.
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    if color == 2:
        bpp, px_stride = 3, 3 * w
    else:
        if plte is None or len(plte) % 3 != 0 or not plte:
            raise ValueError("palette PNG missing/malformed PLTE")
        pal = [tuple(plte[3 * i:3 * i + 3]) for i in range(len(plte) // 3)]
        bpp, px_stride = 1, (w if depth == 8 else (w + 1) // 2)
    stride = 1 + px_stride
    if len(raw) != stride * h:
        raise ValueError("PNG pixel data length mismatch")
    rows, prev = [], bytes(px_stride)
    for y in range(h):
        line = raw[y * stride:(y + 1) * stride]
        cur = _png_unfilter(line[0], line[1:], prev, bpp)
        if color == 2:
            rows.append([
                (cur[3 * x], cur[3 * x + 1], cur[3 * x + 2])
                for x in range(w)
            ])
        else:
            if depth == 8:
                idx = cur[:w]
            else:  # two indexes per byte, HIGH nibble first
                idx = [
                    (cur[x // 2] >> 4) if x % 2 == 0 else (cur[x // 2] & 0xF)
                    for x in range(w)
                ]
            if max(idx) >= len(pal):
                raise ValueError(
                    f"palette index {max(idx)} outside PLTE ({len(pal)})"
                )
            rows.append([pal[i] for i in idx])
        prev = cur
    return w, h, rows


def synth_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """Generate a genuine PNG payload per row (png_encode over the SAME
    closed-form synth_bmp_pixels — one analytic oracle checks both real
    formats) through the standard media schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image"] * len(ids),
                "payload": [png_encode(*synth_bmp_pixels(i)) for i in ids],
                "meta_json": ['{"format": "png"}'] * len(ids),
            })

    return _synth_input(df, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def synth_png_pal_pixels(
    media_id: int,
) -> tuple[int, int, list[tuple], list[list[int]], int]:
    """Deterministic palette image for media_id: the GIF synth's
    closed-form shape (16-color palette, index grid a linear function
    of (id, x, y)) with DIFFERENT palette constants, bit depth 4 on
    odd ids (sub-byte nibble packing) and 8 on even — both decode
    paths exercised across any documents slice."""
    w, h = 4 + media_id % 5, 3 + media_id % 4
    palette = [
        (
            (media_id + 41 * ci) % 256,
            (2 * media_id + 43 * ci) % 256,
            (3 * media_id + 47 * ci) % 256,
        )
        for ci in range(16)
    ]
    rows = [
        [(media_id + 3 * x + 7 * y) % 16 for x in range(w)]
        for y in range(h)
    ]
    return w, h, palette, rows, (4 if media_id % 2 else 8)


def synth_png_pal_media(df: DataFrame, id_col: str) -> DataFrame:
    """Generate a genuine color-type-3 PNG payload per row
    (png_encode_palette over synth_png_pal_pixels) through the
    standard media schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            payloads = []
            for i in ids:
                w, h, pal, rows, depth = synth_png_pal_pixels(i)
                payloads.append(
                    png_encode_palette(w, h, pal, rows, depth=depth)
                )
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image"] * len(ids),
                "payload": payloads,
                "meta_json": ['{"format": "png8"}'] * len(ids),
            })

    return _synth_input(df, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def png_features(df: DataFrame) -> DataFrame:
    """Real-decode feature extraction over PNG payloads: full spec
    parse (png_decode — CRC checks, inflate, all five filter
    reconstructions) then the same per-channel means + top-left red as
    bmp_features, through the same Arrow mapInPandas flow."""
    return _rgb_features(df, png_decode)


def _rgb_features(df: DataFrame, decode) -> DataFrame:
    """Shared (decode -> width/height/r00/channel-means) featurizer for
    the real-format decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "width", "height", "r00", "mean_r", "mean_g", "mean_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rows = decode(payload)
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


# --- real media format #4: GIF (LZW, palette, interlace) -------------------
#
# The hardest of the pure-stdlib codecs: GIF89a per the spec — logical
# screen/image descriptors, global color table, 255-byte data
# sub-block framing, LSB-first variable-width code packing, and FULL
# GIF-LZW with dynamic table growth, code-width transitions, CLEAR
# resets at table exhaustion, the KwKwK special case, and 4-pass
# interlace reordering. The encoder emits genuinely compressed
# streams (shared-prefix table entries), so the decoder's table
# dynamics are exercised on every image.


class _BitWriter:
    """LSB-first variable-width code packer (GIF appendix F)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the decoder's table runs ONE entry behind the encoder's
            # (it reconstructs wk only upon the NEXT code), so its
            # width transition fires at next_code - 1 == 2^width; the
            # naive next_code == 2^width test desyncs the stream at
            # every boundary
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:                       # table full: reset mid-stream
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        w = bytes([k])
    if w:
        bw.write(table[w], width)
    bw.write(eoi, width)
    return bw.flush()


def _lzw_decode(data: bytes, mcs: int) -> bytes:
    if not 1 <= mcs <= 8:
        # GIF color tables cap at 256 entries, so a valid min code size
        # is <= 8; an unguarded corrupt byte here (e.g. 0xFF) would
        # size the base table at 2^mcs — an allocation stall, not an
        # exception, which no quarantine could catch.
        raise ValueError(f"GIF LZW min code size {mcs} out of range")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW first code {code} out of table")
            prev = table[code]
            out += prev
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} beyond table")
        out += entry
        if len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


_GIF_NC = 16  # palette size -> 4-bit min LZW code size


def _gif_palette(media_id: int) -> list[tuple[int, int, int]]:
    return [
        (
            (media_id + 29 * i) % 256,
            (2 * media_id + 31 * i) % 256,
            (3 * media_id + 37 * i) % 256,
        )
        for i in range(_GIF_NC)
    ]


def _interlace_order(height: int) -> list[int]:
    """GIF 4-pass interlace: stored row order for a given height."""
    return (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )


def gif_encode(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    index_rows: list[list[int]],
    interlace: bool = False,
) -> bytes:
    """Encode palette-indexed rows (row 0 = visual TOP) as a GIF89a
    with a global color table; optionally 4-pass interlaced storage."""
    nc = len(palette)
    if nc & (nc - 1) or not 2 <= nc <= 256 or len(index_rows) != height:
        raise ValueError("palette must be power-of-two sized, rows == height")
    szbits = nc.bit_length() - 2  # field stores log2(nc) - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF0 | szbits, 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    rows = (
        [index_rows[y] for y in _interlace_order(height)]
        if interlace else index_rows
    )
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
    )
    mcs = max(2, (nc - 1).bit_length())
    out.append(mcs)
    lzw = _lzw_encode([i for row in rows for i in row], mcs)
    for off in range(0, len(lzw), 255):
        block = lzw[off:off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def gif_encode_anim(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[list[list[int]]],
    delay_cs: int = 10,
) -> bytes:
    """Encode a sequence of palette-indexed frames as a genuinely
    ANIMATED GIF89a: NETSCAPE2.0 looping application extension, a
    Graphic Control Extension (delay, disposal) before every image
    descriptor, one full-frame LZW stream per frame — the real video
    container the frame sampler decodes. Odd frames store interlaced
    so the sampler exercises the 4-pass path mid-animation."""
    nc = len(palette)
    if nc & (nc - 1) or not 2 <= nc <= 256 or not frames:
        raise ValueError("palette must be power-of-two sized, >=1 frame")
    szbits = nc.bit_length() - 2
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF0 | szbits, 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    # NETSCAPE looping extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, (nc - 1).bit_length())
    for f, index_rows in enumerate(frames):
        if len(index_rows) != height:
            raise ValueError(f"frame {f}: rows != height")
        # Graphic Control Extension: disposal=1 (leave), no transparency
        out += b"\x21\xf9\x04" + bytes((0x04,)) + struct.pack(
            "<H", delay_cs
        ) + b"\x00\x00"
        interlace = bool(f % 2)
        rows = (
            [index_rows[y] for y in _interlace_order(height)]
            if interlace else index_rows
        )
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
        )
        out.append(mcs)
        lzw = _lzw_encode([i for row in rows for i in row], mcs)
        for off in range(0, len(lzw), 255):
            block = lzw[off:off + 255]
            out.append(len(block))
            out += block
        out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def gif_decode(payload: bytes) -> tuple[int, int, list[list[tuple]]]:
    """Parse a GIF87a/89a per spec: screen/image descriptors, color
    tables, extension skipping, sub-block reassembly, full GIF-LZW,
    palette mapping, and interlace reordering. Returns (width, height,
    rows of (r, g, b) with row 0 = visual TOP) for the first image.
    Raises ValueError on malformed streams."""
    w, h, frames = gif_decode_frames(payload, max_frames=1)
    return w, h, frames[0]


def gif_decode_frames(
    payload: bytes, max_frames: int | None = None
) -> tuple[int, int, list[list[list[tuple]]]]:
    """Parse EVERY image block of a (possibly animated) GIF: the same
    spec machinery as gif_decode — GCE/application extensions skipped
    per the sub-block grammar, per-frame local color tables, per-frame
    LZW and interlace — looped to the trailer. Returns (width, height,
    [frame rows, ...]); max_frames stops early (the sampler's decode
    budget: stopping at frame k never touches later bytes)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF8xa magic)")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_palette: list[tuple[int, int, int]] | None = None
    if flags & 0x80:
        nc = 2 << (flags & 0x07)
        raw = payload[pos:pos + 3 * nc]
        if len(raw) != 3 * nc:
            raise ValueError("truncated GIF global color table")
        global_palette = [
            tuple(raw[i:i + 3]) for i in range(0, len(raw), 3)
        ]
        pos += 3 * nc
    frames: list[list[list[tuple]]] = []
    out_w = out_h = None
    palette = global_palette
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:                       # trailer
            break
        if marker == 0x21:                       # extension: skip blocks
            pos += 1                             # label
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                n = payload[pos]
                pos += 1 + n
                if n == 0:
                    break
            continue
        if marker != 0x2C:
            raise ValueError(f"unknown GIF block marker 0x{marker:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        _l, _t, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        palette = global_palette                 # local tables don't leak
        if iflags & 0x80:                        # local color table wins
            nc = 2 << (iflags & 0x07)
            raw = payload[pos:pos + 3 * nc]
            if len(raw) != 3 * nc:
                raise ValueError("truncated GIF local color table")
            palette = [tuple(raw[i:i + 3]) for i in range(0, len(raw), 3)]
            pos += 3 * nc
        if palette is None:
            raise ValueError("GIF image has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        mcs = payload[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF data sub-blocks")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            chunk = payload[pos:pos + n]
            if len(chunk) != n:
                raise ValueError("truncated GIF data sub-block")
            lzw += chunk
            pos += n
        indices = _lzw_decode(bytes(lzw), mcs)
        if len(indices) != iw * ih:
            raise ValueError(
                f"GIF pixel count {len(indices)} != {iw}x{ih}"
            )
        if max(indices) >= len(palette):
            raise ValueError("GIF index outside color table")
        stored = [
            [palette[i] for i in indices[y * iw:(y + 1) * iw]]
            for y in range(ih)
        ]
        if iflags & 0x40:                        # undo 4-pass interlace
            rows: list = [None] * ih
            for stored_row, visual_y in zip(stored, _interlace_order(ih)):
                rows[visual_y] = stored_row
        else:
            rows = stored
        if out_w is None:
            out_w, out_h = iw, ih
        elif (iw, ih) != (out_w, out_h):
            raise ValueError(
                f"GIF frame size {iw}x{ih} != first frame {out_w}x{out_h}"
            )
        frames.append(rows)
        if max_frames is not None and len(frames) >= max_frames:
            return out_w, out_h, frames
    if not frames:
        raise ValueError("GIF contains no image block")
    return out_w, out_h, frames


def synth_gif_media(df: DataFrame, id_col: str) -> DataFrame:
    """Generate a genuine GIF payload per row: a closed-form 16-color
    palette and index grid (idx = (id + 3x + 7y) % 16), so the decoded
    RGB is analytically recomputable by the oracle. Images with odd
    media_id are stored INTERLACED — half the corpus exercises the
    4-pass reordering."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            payloads = []
            for mid in ids:
                w, h = 4 + mid % 5, 3 + mid % 4
                idx_rows = [
                    [(mid + 3 * x + 7 * y) % _GIF_NC for x in range(w)]
                    for y in range(h)
                ]
                payloads.append(gif_encode(
                    w, h, _gif_palette(mid), idx_rows,
                    interlace=bool(mid % 2),
                ))
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image"] * len(ids),
                "payload": payloads,
                "meta_json": ['{"format": "gif"}'] * len(ids),
            })

    return _synth_input(df, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def gif_features(df: DataFrame) -> DataFrame:
    """Real-decode feature extraction over GIF payloads (full LZW +
    palette + interlace path), emitting the shared RGB feature shape
    (_rgb_features) like the BMP/PNG twins."""
    return _rgb_features(df, gif_decode)


# --- real media format #3: WAV (RIFF PCM 16-bit) ---------------------------
#
# The audio member of the real-decoder family: canonical RIFF/WAVE with
# a PCM fmt chunk and little-endian int16 frames, encoded and parsed in
# pure stdlib. The decoder walks the chunk list generically (skipping
# unknown chunks like LIST/INFO, as a spec-correct reader must), so it
# exercises the mechanics a real audio ingest faces: FOURCC framing,
# word-aligned chunk padding, fmt validation, interleaved channels.


def synth_gif_anim_frames(
    media_id: int,
) -> tuple[int, int, list[tuple], list[list[list[int]]]]:
    """Deterministic animated clip for media_id: (3 + id%4) full
    frames over the standard 16-color palette, frame f's index grid =
    (id + 3x + 7y + 11f) % 16 — closed-form in (id, f, x, y) so the
    DuckDB oracle recomputes every sampled frame analytically."""
    w, h = 4 + media_id % 5, 3 + media_id % 4
    n_frames = 3 + media_id % 4
    frames = [
        [
            [(media_id + 3 * x + 7 * y + 11 * f) % 16 for x in range(w)]
            for y in range(h)
        ]
        for f in range(n_frames)
    ]
    return w, h, _gif_palette(media_id), frames


def synth_video_media(df: DataFrame, id_col: str) -> DataFrame:
    """Generate a genuine ANIMATED GIF payload per row (gif_encode_anim
    over synth_gif_anim_frames — NETSCAPE loop extension, GCE per
    frame, odd frames interlaced) through the standard media schema,
    media_type='video'."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            payloads = []
            for i in ids:
                w, h, pal, frames = synth_gif_anim_frames(i)
                payloads.append(gif_encode_anim(w, h, pal, frames))
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["video"] * len(ids),
                "payload": payloads,
                "meta_json": ['{"format": "gif-anim"}'] * len(ids),
            })

    return _synth_input(df, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


VIDEO_FRAME_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
])


def sample_frame_features(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling (retiring sample_frames_stub's
    byte-chunk stand-in for the oracle path): decode the animated-GIF
    container per spec (gif_decode_frames — GCE/app extensions,
    per-frame LZW, interlace) and emit per-channel means for every
    every_n-th frame — the keyframe-features shape a multimodal
    training pipeline extracts (1 input row -> ceil(frames/every_n)
    output rows). Arrow mapInPandas; decode cost is scan-parallel,
    no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = gif_decode_frames(payload)
                n = w * h
                for f in range(0, len(frames), every_n):
                    sums = [0, 0, 0]
                    for row in frames[f]:
                        for px in row:
                            sums[0] += px[0]
                            sums[1] += px[1]
                            sums[2] += px[2]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["width"].append(w)
                    out["height"].append(h)
                    for k, s in zip(("mean_r", "mean_g", "mean_b"), sums):
                        out[k].append(math.floor(s / n * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=VIDEO_FRAME_FEATURE_SCHEMA)


def wav_encode(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Encode interleaved int16 samples as a canonical PCM WAV file.
    len(samples) must be a multiple of channels (whole frames)."""
    if channels <= 0 or sample_rate <= 0 or len(samples) % channels:
        raise ValueError("need whole interleaved frames and positive rate")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")   # RIFF word alignment
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a PCM 16-bit WAV per the RIFF spec: returns (sample_rate,
    channels, interleaved int16 samples). Walks chunks generically —
    unknown chunks are skipped with word-aligned advancement — and
    raises ValueError on anything that is not uncompressed 16-bit PCM."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8:pos + 8 + length]
        if len(chunk) != length:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            fmt = chunk
        elif tag == b"data":
            data = chunk
        pos += 8 + length + (length & 1)       # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV fmt chunk too short")
    audio_fmt, channels, rate, _, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt
    )
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"only uncompressed 16-bit PCM supported "
            f"(fmt={audio_fmt}, bits={bits})"
        )
    if channels <= 0 or block_align != 2 * channels or len(data) % block_align:
        raise ValueError("inconsistent WAV channel/frame layout")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return rate, channels, samples


def synth_wav_samples(media_id: int) -> tuple[int, int, list[int]]:
    """Deterministic synthetic audio for media_id: (8000 Hz, 1 + id%2
    channels, 64 + id%37 frames) with int16 samples that are a simple
    closed-form integer function of (id, i) — recomputable by any
    engine, so the DuckDB oracle checks a REAL format round-trip
    without parsing RIFF itself."""
    channels = 1 + media_id % 2
    n_frames = 64 + media_id % 37
    samples = [
        ((media_id * 7919 + i * 104729) % 65536) - 32768
        for i in range(n_frames * channels)
    ]
    return 8000, channels, samples


def synth_wav_media(df: DataFrame, id_col: str) -> DataFrame:
    """Generate a genuine PCM WAV payload per row (wav_encode over
    synth_wav_samples) through the standard media schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["audio"] * len(ids),
                "payload": [wav_encode(*synth_wav_samples(i)) for i in ids],
                "meta_json": ['{"format": "wav"}'] * len(ids),
            })

    return _synth_input(df, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


WAV_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("s0", IntegerType()),            # first sample: catches
    StructField("sum_samples", LongType()),      # endianness/sign bugs
])


def wav_features(df: DataFrame) -> DataFrame:
    """Real-decode audio feature extraction: parse each WAV payload per
    spec (wav_decode — chunk walk, fmt validation, int16 unpack) and
    emit exact-integer aggregates. Same Arrow mapInPandas flow as the
    image featurizers; no shuffle, decode scales with executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "sample_rate", "channels", "n_frames",
                    "s0", "sum_samples")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, ch, samples = wav_decode(payload)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["n_frames"].append(len(samples) // ch)
                out["s0"].append(samples[0])
                out["sum_samples"].append(sum(samples))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=WAV_FEATURE_SCHEMA)


WAV_AUTOCORR_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("energy", LongType()),
    StructField("ac1", LongType()),
    StructField("ac4", LongType()),
])


def wav_autocorr_features(df: DataFrame) -> DataFrame:
    """EXACT-integer audio analysis over decoded PCM: signal energy
    (sum of squares) and raw autocorrelation at lags 1 and 4 — the
    periodicity/pitch-proxy features a curation pipeline screens audio
    with, in the same engine-portable exact-int discipline as every
    oracle here (int16 samples, n <= a few hundred per clip -> sums
    far inside int64; any engine replays them bit-for-bit). Real
    decode first (wav_decode — RIFF walk, fmt validation), then pure
    integer reductions; Arrow mapInPandas, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "n_samples", "energy", "ac1", "ac4")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, s = wav_decode(payload)
                n = len(s)
                out["media_id"].append(mid)
                out["n_samples"].append(n)
                out["energy"].append(sum(x * x for x in s))
                out["ac1"].append(
                    sum(s[i] * s[i + 1] for i in range(n - 1))
                )
                out["ac4"].append(
                    sum(s[i] * s[i + 4] for i in range(n - 4))
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=WAV_AUTOCORR_SCHEMA)


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


# --- real media format #5: JPEG (baseline sequential DCT, JFIF) ------------
#
# The lossy-codec completion of the real-decoder family (r13 verdict
# ask #8): baseline JPEG per ITU-T T.81 — marker/segment parsing
# (APP0/DQT/SOF0/DHT/SOS), canonical Huffman table construction from
# DHT (spec C.2), the MSB-first entropy bitstream with 0xFF00 byte
# unstuffing, DC prediction, AC run/size decoding with ZRL and EOB,
# dezigzag, dequantization, the exact 2-D IDCT, level shift, and
# edge-MCU cropping to the SOF0 dimensions. The encoder is the true
# inverse pipeline (FDCT + quantization + run-length Huffman over the
# published Annex K luminance tables), so the decoder's Huffman/ZRL/
# EOB dynamics are exercised by genuinely entropy-coded streams.
#
# Oracle exactness under a LOSSY codec: the synthetic images are
# SPECTRAL by construction — every 8x8 block is base + amp*s(x)*s(y)
# with s = (+,-,-,+) cycled, whose DCT is exactly DC = 8*(base-128)
# and F(4,4) = 8*amp (all integers; every other coefficient is 0 by
# orthogonality). With the flat quantization table the round-trip is
# bit-exact, so the analytic DuckDB oracle can recompute the decoded
# pixels in closed form — while the entropy layer still sees real
# work: F(4,4) sits at zigzag position 39, so EVERY block codes two
# ZRL (16-zero-run) symbols, a (6, size) run/size symbol, and an EOB.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K.3: the published luminance Huffman tables
# (BITS = code count per length 1..16, HUFFVAL = symbols in code order)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical JPEG Huffman codes (T.81 C.2): symbol -> (code, len)."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol, for bit-serial decoding."""
    return {
        (length, code): sym
        for sym, (code, length) in _huff_encode_table(bits, vals).items()
    }


def _dct_matrix() -> "list[list[float]]":
    c = []
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        c.append([
            0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ])
    return c


_DCT_C = _dct_matrix()


def _fdct(block: "list[list[float]]") -> "list[list[float]]":
    """F = C g C^T (g level-shifted 8x8): F[v][u] = S_vu per T.81 A.3.3."""
    import numpy as np

    g = np.asarray(block, dtype=np.float64)
    c = np.asarray(_DCT_C)
    return (c @ g @ c.T).tolist()


def _idct(coef: "list[list[float]]") -> "list[list[float]]":
    import numpy as np

    f = np.asarray(coef, dtype=np.float64)
    c = np.asarray(_DCT_C)
    return (c.T @ f @ c).tolist()


class _JpegBitWriter:
    """MSB-first entropy writer with 0xFF -> 0xFF00 byte stuffing and
    1-padding of the final partial byte (T.81 B.1.1.5/F.1.2.3)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            b = (self.acc << pad) | ((1 << pad) - 1)
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc, self.nbits = 0, 0
        return bytes(self.buf)


class _JpegBitReader:
    """MSB-first entropy reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("jpeg: truncated entropy stream")
                if self.data[self.pos] != 0x00:
                    raise ValueError("jpeg: marker inside entropy stream")
                self.pos += 1
            self.acc, self.nbits = b, 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _category(v: int) -> tuple[int, int]:
    """Signed value -> (size category, raw bits) per T.81 F.1.2.1.2."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def jpeg_encode_gray(width: int, height: int,
                     rows: "list[list[int]]") -> bytes:
    """Baseline JFIF encoder, grayscale: real FDCT of the pixel
    blocks, flat (all-ones) quantization table, Annex K Huffman
    entropy coding with byte stuffing. `rows` may already be padded to
    8-multiples (edge blocks then encode the caller's padding pixels);
    if exactly (height, width), edges are replicate-padded."""
    bw, bh = (width + 7) // 8, (height + 7) // 8
    px = [
        [
            rows[min(y, len(rows) - 1)][min(x, len(rows[0]) - 1)]
            for x in range(8 * bw)
        ]
        for y in range(8 * bh)
    ]
    dc_tab = _huff_encode_table(_DC_BITS, _DC_VALS)
    ac_tab = _huff_encode_table(_AC_BITS, _AC_VALS)
    w = _JpegBitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            g = [
                [px[8 * by + y][8 * bx + x] - 128 for x in range(8)]
                for y in range(8)
            ]
            f = _fdct(g)
            coef = [
                int(round(f[zz // 8][zz % 8]))  # quant table is all 1s
                for zz in _ZIGZAG
            ]
            diff = coef[0] - prev_dc
            prev_dc = coef[0]
            s, bits = _category(diff)
            code, ln = dc_tab[s]
            w.write(code, ln)
            if s:
                w.write(bits, s)
            run = 0
            for k in range(1, 64):
                if coef[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = ac_tab[0xF0]  # ZRL: 16 zeros
                    w.write(zc, zl)
                    run -= 16
                s, bits = _category(coef[k])
                code, ln = ac_tab[(run << 4) | s]
                w.write(code, ln)
                w.write(bits, s)
                run = 0
            if run:
                ec, el = ac_tab[0x00]  # EOB
                w.write(ec, el)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))  # DQT id 0, q=1
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )  # SOF0: 8-bit, 1 component, 1x1 sampling, quant table 0
    out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _jpeg_parse_headers(payload: bytes) -> dict:
    """Shared segment parse for the gray and color decoders: walk the
    marker stream up to (and including) SOS, reading DQT/DHT tables
    and the SOF0 frame header. Returns {width, height, comps:
    [(cid, h, v, tq)], qt, huff, sos: {cid: (td, ta)}, pos}. Raises
    ValueError on any malformed structure — truncation, missing
    SOS/SOF0/DQT/DHT, bad markers — matching png_decode/gif_decode's
    error contract (r14 ADVICE: no IndexError/KeyError escapes, no
    walking past the end)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []
    sos: dict[int, tuple[int, int]] = {}
    while True:
        if pos + 2 > len(payload):
            raise ValueError("jpeg: truncated stream before SOS")
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("jpeg: EOI before SOS")
        if pos + 2 > len(payload):
            raise ValueError("jpeg: truncated segment header")
        ln = struct.unpack(">H", payload[pos:pos + 2])[0]
        if ln < 2 or pos + ln > len(payload):
            raise ValueError("jpeg: truncated segment body")
        body = payload[pos + 2:pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: only 8-bit quant tables")
                if b + 65 > len(body):
                    raise ValueError("jpeg: truncated DQT table")
                qt[tq] = list(body[b + 1:b + 65])
                b += 65
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("jpeg: truncated SOF0")
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(
                    "jpeg: this decoder handles 1 (grayscale) or 3 "
                    "(YCbCr) components"
                )
            if len(body) < 6 + 3 * nc:
                raise ValueError("jpeg: truncated SOF0")
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline SOF0 supported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                if b + 17 > len(body):
                    raise ValueError("jpeg: truncated DHT header")
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                if b + 17 + n > len(body):
                    raise ValueError("jpeg: truncated DHT values")
                vals = list(body[b + 17:b + 17 + n])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                b += 17 + n
        elif marker == 0xDD:
            raise ValueError("jpeg: restart intervals not supported")
        elif marker == 0xDA:  # SOS
            if len(body) < 1 or len(body) < 4 + 2 * body[0]:
                raise ValueError("jpeg: truncated SOS")
            ns = body[0]
            if ns != len(comps):
                raise ValueError(
                    "jpeg: scan component count does not match SOF0 "
                    "(non-interleaved multi-scan not supported)"
                )
            for c in range(ns):
                cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                sos[cs] = (tabs >> 4, tabs & 0xF)
            pos += ln
            break
        pos += ln
    if width is None or not comps:
        raise ValueError("jpeg: missing SOF0/DQT before SOS")
    for cid, _h, _v, tq in comps:
        if tq not in qt:
            raise ValueError("jpeg: missing SOF0/DQT before SOS")
        if cid not in sos:
            raise ValueError("jpeg: SOS missing component from SOF0")
        td, ta = sos[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("jpeg: missing DHT table referenced by SOS")
    return {
        "width": width, "height": height, "comps": comps,
        "qt": qt, "huff": huff, "sos": sos, "pos": pos,
    }


def _jpeg_decode_planes(payload: bytes, hdr: dict) -> dict:
    """Interleaved baseline entropy decode (T.81 A.2.3 MCU order):
    per MCU, each component contributes its h x v blocks left-to-
    right, top-to-bottom; per-component DC prediction; dezigzag,
    dequantize, exact IDCT, level shift, clamp. Returns
    {cid: padded plane at the component's SAMPLED resolution}."""
    width, height, comps = hdr["width"], hdr["height"], hdr["comps"]
    qt, huff, sos = hdr["qt"], hdr["huff"], hdr["sos"]
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    if hmax < 1 or vmax < 1 or any(
        h < 1 or v < 1 or hmax % h or vmax % v for _, h, v, _ in comps
    ):
        raise ValueError("jpeg: unsupported sampling factors")
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: [[0] * (8 * h * mcux) for _ in range(8 * v * mcuy)]
        for cid, h, v, _ in comps
    }
    prev_dc = {cid: 0 for cid, _, _, _ in comps}
    r = _JpegBitReader(payload, hdr["pos"])

    def read_symbol(tab: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | r.read_bit()
            length += 1
            sym = tab.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    for my in range(mcuy):
        for mx in range(mcux):
            for cid, h, v, tq in comps:
                dc_tab = huff[(0, sos[cid][0])]
                ac_tab = huff[(1, sos[cid][1])]
                q = qt[tq]
                px = planes[cid]
                for bv in range(v):
                    for bu in range(h):
                        zz = [0] * 64
                        s = read_symbol(dc_tab)
                        diff = _extend(r.receive(s), s) if s else 0
                        prev_dc[cid] += diff
                        zz[0] = prev_dc[cid]
                        k = 1
                        while k < 64:
                            sym = read_symbol(ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError(
                                    "jpeg: AC run past block end"
                                )
                            s = sym & 0xF
                            zz[k] = _extend(r.receive(s), s)
                            k += 1
                        coef = [[0.0] * 8 for _ in range(8)]
                        for i, nat in enumerate(_ZIGZAG):
                            coef[nat // 8][nat % 8] = zz[i] * q[i]
                        out = _idct(coef)
                        oy, ox = 8 * (v * my + bv), 8 * (h * mx + bu)
                        for y in range(8):
                            row = px[oy + y]
                            for x in range(8):
                                row[ox + x] = min(
                                    255,
                                    max(0, int(round(out[y][x] + 128))),
                                )
    return planes


def jpeg_decode(
    payload: bytes, _hdr: dict | None = None
) -> tuple[int, int, "list[list[int]]"]:
    """Baseline JPEG decoder (grayscale, single scan): full segment
    parse — DQT/DHT tables are READ from the stream, not assumed —
    then Huffman entropy decode (DC prediction, AC run/size, ZRL,
    EOB), dezigzag, dequantize, exact IDCT, level shift, clamp, and
    crop to the SOF0 dimensions. Raises ValueError on any malformed
    structure — truncation, missing SOS/SOF0/DQT/DHT, bad markers —
    matching png_decode/gif_decode's error contract (r14 ADVICE: no
    IndexError/KeyError escapes, no walking past the end). Color
    streams (3-component YCbCr) decode via jpeg_decode_color."""
    hdr = _hdr if _hdr is not None else _jpeg_parse_headers(payload)
    if len(hdr["comps"]) != 1:
        raise ValueError(
            "jpeg: this decoder handles 8-bit grayscale baseline "
            "(use jpeg_decode_color for YCbCr)"
        )
    if hdr["comps"][0][1:3] != (1, 1):
        raise ValueError("jpeg: only 1x1 sampling")
    width, height = hdr["width"], hdr["height"]
    px = _jpeg_decode_planes(payload, hdr)[hdr["comps"][0][0]]
    return width, height, [row[:width] for row in px[:height]]


def jpeg_decode_color(
    payload: bytes, _hdr: dict | None = None,
) -> tuple[int, int, "list[list[tuple[int, int, int]]]"]:
    """Baseline YCbCr JPEG decoder (r14 verdict ask #6 — the one
    format class real corpora hit that the grayscale decoder lacked):
    3-component interleaved single scan, 4:4:4 (all 1x1) or 4:2:0
    (Y 2x2, chroma 1x1) sampling, separate luma/chroma quant tables,
    per-component DC prediction across the MCU stream. Chroma planes
    decode at their sampled resolution and upsample by pixel
    REPLICATION (nearest-neighbor — the deterministic choice every
    spec-level decoder agrees on; JFIF leaves the filter open);
    YCbCr -> RGB is the JFIF/BT.601 inverse with floor(x + 0.5)
    rounding and [0, 255] clamp:

        R = Y + 1.402 (Cr - 128)
        G = Y - 0.344136 (Cb - 128) - 0.714136 (Cr - 128)
        B = Y + 1.772 (Cb - 128)

    evaluated in IEEE doubles, so a SQL engine replays the exact
    bytes. Returns (width, height, rows of (r, g, b)). Error contract
    identical to jpeg_decode."""
    hdr = _hdr if _hdr is not None else _jpeg_parse_headers(payload)
    comps = hdr["comps"]
    if len(comps) != 3:
        raise ValueError(
            "jpeg: jpeg_decode_color handles 3-component YCbCr "
            "(use jpeg_decode for grayscale)"
        )
    samps = tuple((h, v) for _, h, v, _ in comps)
    if samps not in (((1, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1))):
        raise ValueError(
            "jpeg: only 4:4:4 (1x1,1x1,1x1) or 4:2:0 (2x2,1x1,1x1) "
            f"sampling supported, got {samps}"
        )
    width, height = hdr["width"], hdr["height"]
    planes = _jpeg_decode_planes(payload, hdr)
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    (y_id, yh, yv, _), (cb_id, bh_, bv_, _), (cr_id, rh, rv, _) = comps
    yp, cbp, crp = planes[y_id], planes[cb_id], planes[cr_id]
    rows = []
    for y in range(height):
        row = []
        yy = yp[y * yv // vmax]
        cbr = cbp[y * bv_ // vmax]
        crr = crp[y * rv // vmax]
        for x in range(width):
            lum = yy[x * yh // hmax]
            cb = cbr[x * bh_ // hmax] - 128
            cr = crr[x * rh // hmax] - 128
            r = min(255, max(0, math.floor(lum + 1.402 * cr + 0.5)))
            g = min(255, max(0, math.floor(
                lum - 0.344136 * cb - 0.714136 * cr + 0.5
            )))
            b = min(255, max(0, math.floor(lum + 1.772 * cb + 0.5)))
            row.append((r, g, b))
        rows.append(row)
    return width, height, rows


def jpeg_encode_color(
    width: int,
    height: int,
    y_rows: "list[list[int]]",
    cb_rows: "list[list[int]]",
    cr_rows: "list[list[int]]",
    subsample: str = "420",
) -> bytes:
    """Baseline JFIF encoder, YCbCr: interleaved single scan with
    4:2:0 (Y 2x2 + chroma 1x1 per 16x16 MCU) or 4:4:4 sampling, flat
    quant tables (id 0 luma, id 1 chroma — exercises the multi-table
    DQT parse), Annex K luminance Huffman tables shared by all
    components (legal: SOS maps every component to table 0), byte
    stuffing, per-component DC prediction. Planes may arrive already
    padded to their MCU grid (edge blocks then encode the caller's
    padding, the synth contract) or at exact sampled dims
    (replicate-padded here). Chroma planes are at HALF resolution for
    4:2:0 (ceil(w/2) x ceil(h/2)) and full for 4:4:4."""
    if subsample == "420":
        factors = [(2, 2), (1, 1), (1, 1)]
    elif subsample == "444":
        factors = [(1, 1), (1, 1), (1, 1)]
    else:
        raise ValueError(f"subsample must be '420' or '444', got {subsample!r}")
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    def padded(rows, h, v):
        tw, th = 8 * h * mcux, 8 * v * mcuy
        return [
            [
                rows[min(y, len(rows) - 1)][min(x, len(rows[0]) - 1)]
                for x in range(tw)
            ]
            for y in range(th)
        ]

    planes = [
        padded(p, h, v)
        for p, (h, v) in zip((y_rows, cb_rows, cr_rows), factors)
    ]
    dc_tab = _huff_encode_table(_DC_BITS, _DC_VALS)
    ac_tab = _huff_encode_table(_AC_BITS, _AC_VALS)
    w = _JpegBitWriter()
    prev_dc = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (h, v) in enumerate(factors):
                px = planes[ci]
                for bv in range(v):
                    for bu in range(h):
                        oy, ox = 8 * (v * my + bv), 8 * (h * mx + bu)
                        g = [
                            [px[oy + y][ox + x] - 128 for x in range(8)]
                            for y in range(8)
                        ]
                        f = _fdct(g)
                        coef = [
                            int(round(f[zz // 8][zz % 8]))  # flat quant
                            for zz in _ZIGZAG
                        ]
                        diff = coef[0] - prev_dc[ci]
                        prev_dc[ci] = coef[0]
                        s, bits = _category(diff)
                        code, ln = dc_tab[s]
                        w.write(code, ln)
                        if s:
                            w.write(bits, s)
                        run = 0
                        for k in range(1, 64):
                            if coef[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                zc, zl = ac_tab[0xF0]  # ZRL
                                w.write(zc, zl)
                                run -= 16
                            s, bits = _category(coef[k])
                            code, ln = ac_tab[(run << 4) | s]
                            w.write(code, ln)
                            w.write(bits, s)
                            run = 0
                        if run:
                            ec, el = ac_tab[0x00]  # EOB
                            w.write(ec, el)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # one DQT segment, TWO tables (luma id 0, chroma id 1), both flat
    out += seg(
        0xFFDB,
        bytes([0x00]) + bytes([1] * 64) + bytes([0x01]) + bytes([1] * 64),
    )
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for ci, (h, v) in enumerate(factors):
        sof += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sosb = bytes([3])
    for ci in range(3):
        sosb += bytes([ci + 1, 0x00])
    sosb += bytes([0, 63, 0])
    out += seg(0xFFDA, sosb)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def synth_jpeg_pixels(media_id: int) -> tuple[int, int, "list[list[int]]"]:
    """Deterministic SPECTRAL image for media_id: every 8x8 block is
    base + amp*s(x)*s(y) (s = +,-,-,+ cycled), whose DCT has exactly
    two integer coefficients — DC and (4,4) — so the lossy codec
    round-trips bit-exactly and the DuckDB oracle recomputes the
    decoded pixels in closed form. Dimensions are NOT 8-multiples
    (w = 8*bw - id%5, h = 8*bh - id%3), so edge-MCU cropping is
    exercised on most images; the returned grid is the full padded
    block grid (every block spectral-pure) with the true (w, h)."""
    bw, bh = 2 + media_id % 3, 1 + media_id % 2
    w, h = 8 * bw - media_id % 5, 8 * bh - media_id % 3
    sgn = [1, -1, -1, 1]
    rows = []
    for y in range(8 * bh):
        by, sy = y // 8, sgn[y % 8 % 4]
        row = []
        for x in range(8 * bw):
            bx, sx = x // 8, sgn[x % 8 % 4]
            base = 64 + (media_id + 5 * bx + 9 * by) % 128
            amp = (media_id + 3 * bx + 7 * by) % 32 - 16
            row.append(base + amp * sx * sy)
        rows.append(row)
    return w, h, rows


def synth_jpeg_media(df: DataFrame, id_col: str) -> DataFrame:
    """Generate a genuine baseline-JFIF payload per row (jpeg_encode_gray
    over synth_jpeg_pixels) through the standard media schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image"] * len(ids),
                "payload": [
                    jpeg_encode_gray(*synth_jpeg_pixels(i)) for i in ids
                ],
                "meta_json": ['{"format": "jpeg"}'] * len(ids),
            })

    return _synth_input(df, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


JPEG_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("p00", IntegerType()),          # top-left: catches row-order bugs
    StructField("mean_p", DoubleType()),
])


def jpeg_features(df: DataFrame) -> DataFrame:
    """Real-decode feature extraction over JPEG payloads: full baseline
    parse (jpeg_decode — Huffman, ZRL/EOB, IDCT, crop) then top-left
    pixel + 6dp half-up mean, through the same Arrow mapInPandas flow
    as the other real-format decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "width", "height", "p00", "mean_p")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rows = jpeg_decode(payload)
                s = sum(sum(row) for row in rows)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["p00"].append(rows[0][0])
                out["mean_p"].append(
                    math.floor(s / (w * h) * 1e6 + 0.5) / 1e6
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=JPEG_FEATURE_SCHEMA)


def synth_jpeg_color_pixels(
    media_id: int,
) -> tuple[int, int, "list[list[int]]", "list[list[int]]", "list[list[int]]"]:
    """Deterministic SPECTRAL YCbCr planes for media_id (the color
    sibling of synth_jpeg_pixels): every 8x8 block of every plane is
    base + amp*s(x)*s(y) — exactly two integer DCT coefficients — so
    the 4:2:0 lossy pipeline round-trips each plane bit-exactly and
    the DuckDB oracle recomputes the decoded pixels in closed form.
    The luma plane is full-resolution (16x16-MCU block coords); the
    chroma planes are HALF resolution (one 8x8 block per MCU, block
    coords = MCU coords). Dimensions are NOT 16-multiples for most
    ids (w = 16*mw - id%7, h = 16*mh - id%5), so edge-MCU cropping is
    exercised; ids with id%3 == 0 get two MCU rows (vertical MCU
    stacking exercised). Returned grids are the full padded MCU grid
    with the true (w, h)."""
    mw = 1 + media_id % 2
    mh = 1 + (1 if media_id % 3 == 0 else 0)
    w, h = 16 * mw - media_id % 7, 16 * mh - media_id % 5
    sgn = [1, -1, -1, 1]
    y_rows = []
    for y in range(16 * mh):
        by, sy = y // 8, sgn[y % 8 % 4]
        row = []
        for x in range(16 * mw):
            bx, sx = x // 8, sgn[x % 8 % 4]
            base = 48 + (media_id + 5 * bx + 9 * by) % 128
            amp = (media_id + 3 * bx + 7 * by) % 32 - 16
            row.append(base + amp * sx * sy)
        y_rows.append(row)
    cb_rows, cr_rows = [], []
    for cy in range(8 * mh):
        by, sy = cy // 8, sgn[cy % 8 % 4]
        brow, rrow = [], []
        for cx in range(8 * mw):
            bx, sx = cx // 8, sgn[cx % 8 % 4]
            cb_base = 96 + (media_id + 7 * bx + 3 * by) % 64
            cb_amp = (media_id + 5 * bx + by) % 16 - 8
            cr_base = 80 + (2 * media_id + 3 * bx + 5 * by) % 96
            cr_amp = (media_id + bx + 7 * by) % 16 - 8
            brow.append(cb_base + cb_amp * sx * sy)
            rrow.append(cr_base + cr_amp * sx * sy)
        cb_rows.append(brow)
        cr_rows.append(rrow)
    return w, h, y_rows, cb_rows, cr_rows


def synth_jpeg_color_media(df: DataFrame, id_col: str) -> DataFrame:
    """Generate a genuine 4:2:0 YCbCr baseline-JFIF payload per row
    (jpeg_encode_color over synth_jpeg_color_pixels) through the
    standard media schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            payloads = []
            for i in ids:
                w, h, yr, cb, cr = synth_jpeg_color_pixels(i)
                payloads.append(jpeg_encode_color(w, h, yr, cb, cr, "420"))
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": ["image"] * len(ids),
                "payload": payloads,
                "meta_json": ['{"format": "jpeg", "color": "ycbcr420"}']
                * len(ids),
            })

    return _synth_input(df, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


JPEG_COLOR_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("r00", IntegerType()),          # top-left: row-order bugs
    StructField("g00", IntegerType()),
    StructField("b00", IntegerType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
])


def jpeg_color_features(df: DataFrame) -> DataFrame:
    """Real-decode feature extraction over color JPEG payloads: full
    baseline YCbCr parse (jpeg_decode_color — interleaved 4:2:0 MCUs,
    per-component DC prediction, chroma replication upsample, BT.601
    inverse with floor(x+0.5)) then top-left RGB + 6dp half-up channel
    means, through the same Arrow mapInPandas flow as the other real-
    format decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "r00", "g00", "b00",
                "mean_r", "mean_g", "mean_b",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rows = jpeg_decode_color(payload)
                sr = sum(p[0] for row in rows for p in row)
                sg = sum(p[1] for row in rows for p in row)
                sb = sum(p[2] for row in rows for p in row)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["r00"].append(rows[0][0][0])
                out["g00"].append(rows[0][0][1])
                out["b00"].append(rows[0][0][2])
                n = w * h
                out["mean_r"].append(math.floor(sr / n * 1e6 + 0.5) / 1e6)
                out["mean_g"].append(math.floor(sg / n * 1e6 + 0.5) / 1e6)
                out["mean_b"].append(math.floor(sb / n * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=JPEG_COLOR_FEATURE_SCHEMA)


# --- format-sniffing auto dispatch (closing the generic-path stand-in) -----
#
# The generic extract_features entry point used to run ONLY the
# byte-histogram stand-in. With five real spec-level decoders in the
# module, the honest generic path is CONTAINER SNIFFING: detect the
# format from magic bytes and route each payload to its real decoder,
# keeping the stand-in strictly for payloads in formats the container
# has no decoder for (and a 'corrupt' bucket for recognized-magic
# payloads that fail spec validation — a real 100 TB corpus always has
# some, and a curation job must quarantine rather than crash). One
# Arrow mapInPandas pass, no shuffle, decode cost linear in executors —
# identical scale shape to the per-format featurizers.

AUTO_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("fmt", StringType()),          # bmp|png|gif|wav|jpeg|jpeg_color|raw|corrupt:<container>
    StructField("width", IntegerType()),       # wav: channels; raw/corrupt: 0
    StructField("height", IntegerType()),      # wav: frames;   raw/corrupt: 0
    StructField("s0", LongType()),             # exact-int stats, meaning per fmt:
    StructField("s1", LongType()),             #   images: sum R / sum G / sum B
    StructField("s2", LongType()),             #   (gray: sum p, 0, 0); wav: sum v,
])                                             #   sum v^2, 0; raw: sum bytes, 0, 0


def sniff_format(payload: bytes) -> str:
    """Container detection from magic bytes alone (no decode): BMP 'BM',
    PNG 8-byte signature, GIF87a/89a, RIFF/WAVE, JPEG SOI 0xFFD8.
    Anything else (or too short to carry a magic) is 'raw' — the
    stand-in featurizer's domain."""
    if payload is None or len(payload) < 4:
        return "raw"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return "raw"


def _auto_features_one(payload: bytes) -> tuple:
    """(fmt, width, height, s0, s1, s2) for one payload via the real
    decoder the magic bytes select. ValueError from a recognized-magic
    payload lands in a 'corrupt:<container>' bucket (the sniffed
    container rides along as provenance — a quarantine a human can
    triage without re-sniffing) instead of failing the task."""
    fmt = sniff_format(payload)
    if fmt == "raw":
        return ("raw", 0, 0, sum(payload) if payload else 0, 0, 0)
    try:
        if fmt == "wav":
            _, ch, samples = wav_decode(payload)
            return ("wav", ch, len(samples) // ch,
                    sum(samples), sum(s * s for s in samples), 0)
        if fmt == "jpeg":
            # parse headers ONCE; both decoders accept the parsed dict
            hdr = _jpeg_parse_headers(payload)
            if len(hdr["comps"]) == 1:
                w, h, px = jpeg_decode(payload, _hdr=hdr)
                return ("jpeg", w, h, sum(map(sum, px)), 0, 0)
            w, h, rows = jpeg_decode_color(payload, _hdr=hdr)
            fmt = "jpeg_color"
        elif fmt == "bmp":
            w, h, rows = bmp_decode(payload)
        elif fmt == "png":
            w, h, rows = png_decode(payload)
        else:
            w, h, rows = gif_decode(payload)
    except ValueError:
        return (f"corrupt:{fmt}", 0, 0, 0, 0, 0)
    s0 = sum(p[0] for row in rows for p in row)
    s1 = sum(p[1] for row in rows for p in row)
    s2 = sum(p[2] for row in rows for p in row)
    return (fmt, w, h, s0, s1, s2)


def extract_features_auto(df: DataFrame, on_error: str = "quarantine") -> DataFrame:
    """Sniff-and-dispatch feature extraction over a MIXED media corpus:
    each payload is routed by magic bytes to the matching real decoder
    (BMP/PNG/GIF/WAV/JPEG gray or YCbCr color), with unknown formats
    taking the documented byte-level stand-in path ('raw'). Emits
    exact-integer per-payload stats so every branch is oracle-checkable.
    Same partition-parallel Arrow flow as extract_features.

    on_error (the rolling on_late lesson — degradation must never be
    silent):
    - 'quarantine' (default): recognized-but-malformed payloads become
      'corrupt:<container>' rows (zeroed stats, sniffed container kept
      as provenance) — visible IN the output, and each batch that
      quarantines anything additionally logs one executor-side WARNING
      with the count and the offending media_ids (first few), so the
      degradation surfaces without downstream instrumentation.
    - 'fail': re-raise the decode ValueError annotated with the
      media_id — for pipelines over corpora that are supposed to be
      clean, where a malformed payload means upstream breakage."""
    if on_error not in ("quarantine", "fail"):
        raise ValueError(f"on_error must be quarantine|fail, got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _auto_features_batch(pdf, on_error)

    return df.mapInPandas(run, schema=AUTO_FEATURE_SCHEMA)


def _auto_features_batch(pdf: pd.DataFrame, on_error: str) -> pd.DataFrame:
    """One Arrow batch through the dispatcher (unit-testable seam for
    the on_error contract — executor logs don't reach driver caplog)."""
    rows = []
    bad: list = []
    for mid, p in zip(pdf["media_id"], pdf["payload"]):
        r = _auto_features_one(p)
        if r[0].startswith("corrupt:"):
            if on_error == "fail":
                raise ValueError(
                    f"extract_features_auto: media_id={mid} sniffed "
                    f"as {r[0][8:]} but failed spec validation "
                    f"(on_error='fail')"
                )
            bad.append(mid)
        rows.append(r)
    if bad:
        _LOG.warning(
            "extract_features_auto: quarantined %d malformed "
            "payload(s) this batch (media_id %s%s); stats are "
            "zeroed rows with fmt='corrupt:<container>' — use "
            "on_error='fail' if the corpus must be clean",
            len(bad), bad[:5], "..." if len(bad) > 5 else "",
        )
    return pd.DataFrame({
        "media_id": pdf["media_id"],
        "fmt": [r[0] for r in rows],
        "width": [r[1] for r in rows],
        "height": [r[2] for r in rows],
        "s0": [r[3] for r in rows],
        "s1": [r[4] for r in rows],
        "s2": [r[5] for r in rows],
    })


def synth_mixed_media(df: DataFrame, id_col: str) -> DataFrame:
    """A mixed-format corpus for the dispatch path: doc_id % 7 selects
    the container — 0 BMP, 1 PNG (same closed-form pixels as BMP),
    2 GIF, 3 WAV, 4 grayscale JPEG, 5 YCbCr 4:2:0 JPEG, 6 a non-media
    payload ('raw:<id>' UTF-8 bytes) that must fall through to the
    stand-in. Every class reuses the per-format synth closed forms, so
    one analytic DuckDB oracle covers the whole dispatch.

    ensure_parallelism (via _synth_input, which every synth shares
    since r15): the downstream decode is the compute-heavy stage (same
    rationale as the shingle chain in operators/dedup.py
    _doc_shingles) — a single-file scan must not serialize the codec
    work on one core; measured 3.4 s -> sub-second at sf0.1 on
    local[32] (artifacts/scale_smoke_r15/autodispatch_r15.jsonl).
    Streaming inputs skip the rebalance (partition introspection needs
    .rdd, and a per-micro-batch shuffle is the wrong trade at ingest —
    micro-batches inherit source parallelism)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            payloads, mtypes = [], []
            for mid in ids:
                cls = mid % 7
                if cls == 0:
                    payloads.append(bmp_encode(*synth_bmp_pixels(mid)))
                    mtypes.append("image")
                elif cls == 1:
                    payloads.append(png_encode(*synth_bmp_pixels(mid)))
                    mtypes.append("image")
                elif cls == 2:
                    w, h = 4 + mid % 5, 3 + mid % 4
                    idx_rows = [
                        [(mid + 3 * x + 7 * y) % _GIF_NC for x in range(w)]
                        for y in range(h)
                    ]
                    payloads.append(gif_encode(
                        w, h, _gif_palette(mid), idx_rows,
                        interlace=bool(mid % 2),
                    ))
                    mtypes.append("image")
                elif cls == 3:
                    payloads.append(wav_encode(*synth_wav_samples(mid)))
                    mtypes.append("audio")
                elif cls == 4:
                    payloads.append(jpeg_encode_gray(*synth_jpeg_pixels(mid)))
                    mtypes.append("image")
                elif cls == 5:
                    w, h, yr, cb, cr = synth_jpeg_color_pixels(mid)
                    payloads.append(jpeg_encode_color(w, h, yr, cb, cr, "420"))
                    mtypes.append("image")
                else:
                    payloads.append(f"raw:{mid}".encode())
                    mtypes.append("other")
            yield pd.DataFrame({
                "media_id": ids,
                "media_type": mtypes,
                "payload": payloads,
                "meta_json": ['{"mixed": true}'] * len(ids),
            })

    return _synth_input(df, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)
