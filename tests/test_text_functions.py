"""Pins for the text-analysis additions: winnowing fingerprints vs a
pure-Python reference, the shared-substring guarantee, BPE-ish token
estimates, and the multimodal resize/frame stubs."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_app_spark.functions import text as T
from kafka_streams_app_spark.operators import multimodal

P = (1 << 31) - 1


def winnow_reference(tok_hashes: list[int], k: int = 5, window: int = 4) -> set[int]:
    """Straight-from-the-paper Python implementation (Schleimer et al.):
    rolling base-31 gram hashes, per-window minimum, distinct."""
    n_grams = len(tok_hashes) - (k - 1)
    if n_grams < window:
        return set()
    grams = []
    for i in range(n_grams):
        acc = 0
        for h in tok_hashes[i:i + k]:
            acc = (acc * 31 + h) % P
        grams.append(acc)
    return {min(grams[i:i + window]) for i in range(n_grams - (window - 1))}


def test_winnowing_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again today"),
         (2, "short text only"),
         (3, "a b c d e f g h")],
        "doc_id long, text string",
    )
    hashed = docs.select(
        "doc_id", T.token_hashes(T.tokens("text")).alias("_h")
    )
    out = hashed.select(
        "doc_id", "_h", T.winnowing_of_hashes(F.col("_h")).alias("fp")
    ).collect()
    for r in out:
        assert set(r["fp"]) == winnow_reference(list(r["_h"])), r["doc_id"]


def test_winnowing_shared_run_guarantee(spark):
    """Two docs sharing a run of >= k + window - 1 = 8 tokens must share
    at least one fingerprint; fully-disjoint docs share none."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [(1, "intro words here " + shared + " trailing piece"),
         (2, shared + " completely different ending material now"),
         (3, "nothing in common with either document at all whatsoever")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: set(r["fp"])
        for r in docs.select(
            "doc_id",
            T.winnowing_of_hashes(T.token_hashes(T.tokens("text"))).alias("fp"),
        ).collect()
    }
    assert rows[1] & rows[2]
    assert not (rows[1] & rows[3])


def test_bpe_token_estimate(spark):
    df = spark.createDataFrame(
        [("Hello world, it's 2024!",)], "text string"
    )
    n = df.select(T.bpe_token_estimate("text").alias("n")).collect()[0]["n"]
    # pieces: [Hello][ world][,][ it]['s][ 2024][!]
    assert n == 7


def test_resize_stub_shapes(spark):
    docs = spark.createDataFrame([(1, "x" * 100)], "doc_id long, text string")
    media = multimodal.text_as_media(docs, "doc_id", "text")
    small = multimodal.resize_stub(media, 8, 8).collect()[0]
    assert len(small["payload"]) == 64 and small["meta_json"] == '{"resized": [8, 8]}'
    big = multimodal.resize_stub(media, 16, 16).collect()[0]
    assert len(big["payload"]) == 256  # padded up
    assert big["payload"][:100] == b"x" * 100


def test_sample_frames_stub_fanout(spark):
    docs = spark.createDataFrame([(1, "a" * 2600)], "doc_id long, text string")
    media = multimodal.text_as_media(docs, "doc_id", "text")
    frames = multimodal.sample_frames_stub(media, frame_bytes=256, every_n=2).collect()
    # 10 chunks of 256 bytes, sampled every 2nd -> indices 0,2,4,6,8
    assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [
        0, 2, 4, 6, 8,
    ]
    assert all(len(f["frame"]) == 256 for f in frames)


def test_resize_stub_pads_short_payloads(spark):
    """Payloads shorter than the target are zero-padded to exactly
    width*height bytes (the branch the contract entry's truncate-only
    configuration never hits)."""
    from kafka_streams_app_spark.operators.multimodal import resize_stub, text_as_media

    docs = spark.createDataFrame([(1, "ab"), (2, "x" * 100)], "doc_id long, text string")
    out = {
        r["media_id"]: r["payload"]
        for r in resize_stub(text_as_media(docs, "doc_id", "text"), 4, 4).collect()
    }
    assert out[1] == b"ab" + b"\x00" * 14
    assert out[2] == b"x" * 16
