"""Multimodal (binary) column plumbing (BASELINE.json north-star).

Images/audio/video are opaque BinaryType columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
partition flow — is real and tested; the actual media decode is stubbed
(the container has no image/audio libs) behind `decode_stub`, which is
deterministic so tests can assert on it.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField, StructType,
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
