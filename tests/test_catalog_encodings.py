"""Pin the catalog loader against BOTH physical timestamp encodings.

The driver's data generator has shipped ``events.ts`` as INT64
TIMESTAMP(NANOS) (rounds 1-3) and as timestamp[us] (round 4+). The r4
regeneration took out 33/50 correctness rows because the loader hard-coded
the nanos encoding. These tests synthesize tiny parquet twins of the same
logical data in both encodings and assert `load_table` AND `load_stream`
normalize them identically — so a future generator change cannot silently
zero out a round again. Runs without /root/testdata.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_app_spark.sources.catalog import load_stream, load_table

# logical event times, expressed in epoch nanoseconds (UTC)
_EPOCH_NS = [1_700_000_000_123_456_789, 1_700_000_060_000_000_001, 1_700_000_120_999_999_999]
_EXPECT_US = [ns // 1000 for ns in _EPOCH_NS]


def _write_events(tmpdir, encoding: str) -> str:
    """Write a minimal events-shaped table under tmpdir/<enc>/events.parquet."""
    n = len(_EPOCH_NS)
    if encoding == "ns":
        ts = pa.array(_EPOCH_NS, type=pa.timestamp("ns"))
    elif encoding == "us":
        ts = pa.array(_EXPECT_US, type=pa.timestamp("us"))
    elif encoding == "long_us":
        ts = pa.array(_EXPECT_US, type=pa.int64())
    elif encoding == "long_ms":
        ts = pa.array([us // 1000 for us in _EXPECT_US], type=pa.int64())
    elif encoding == "long_s":
        ts = pa.array([us // 1_000_000 for us in _EXPECT_US], type=pa.int64())
    else:
        raise ValueError(encoding)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([7] * n, type=pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.5] * n, type=pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    d = tmpdir / encoding
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def twin_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("enc_twins")
    return {
        enc: _write_events(base, enc)
        for enc in ("ns", "us", "long_us", "long_ms", "long_s")
    }


def _epoch_us(df):
    import pyspark.sql.functions as F

    rows = df.select("event_id", F.unix_micros("ts").alias("us")).collect()
    return {r["event_id"]: r["us"] for r in rows}


# expected epoch-us per encoding: coarser physical units legitimately
# truncate (the loader must infer the UNIT correctly, not invent digits)
_EXPECT_BY_ENC = {
    "ns": _EXPECT_US,
    "us": _EXPECT_US,
    "long_us": _EXPECT_US,
    "long_ms": [us // 1000 * 1000 for us in _EXPECT_US],
    "long_s": [us // 1_000_000 * 1_000_000 for us in _EXPECT_US],
}


@pytest.mark.parametrize("encoding", ["ns", "us", "long_us", "long_ms", "long_s"])
def test_load_table_normalizes(spark, twin_dirs, encoding):
    df = load_table(spark, twin_dirs[encoding], "events")
    assert str(df.schema["ts"].dataType) == "TimestampType()"
    got = _epoch_us(df)
    assert got == {i: us for i, us in enumerate(_EXPECT_BY_ENC[encoding])}


def test_both_encodings_identical_batch(spark, twin_dirs):
    a = _epoch_us(load_table(spark, twin_dirs["ns"], "events"))
    b = _epoch_us(load_table(spark, twin_dirs["us"], "events"))
    assert a == b


@pytest.mark.parametrize("encoding", ["ns", "us"])
def test_load_stream_normalizes(spark, twin_dirs, encoding, tmp_path):
    df = load_stream(spark, twin_dirs[encoding], "events")
    assert df.isStreaming
    assert str(df.schema["ts"].dataType) == "TimestampType()"
    sink = f"enc_sink_{encoding}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = _epoch_us(spark.table(sink))
    assert got == {i: us for i, us in enumerate(_EXPECT_US)}


def test_long_epoch_unit_inference_property(spark, tmp_path):
    """Random epochs across all four integer bands (s/ms/us/ns) must
    normalize to the value their band implies — a generator switching
    units can shift magnitude by 1000x but never silently corrupt."""
    import random

    rng = random.Random(93)
    # epochs between 1990 and 2200 in each unit
    secs = [rng.randint(631_152_000, 7_258_118_400) for _ in range(30)]
    cases = []  # (long value, expected epoch us)
    for s in secs[:8]:
        cases.append((s, s * 1_000_000))
    for s in secs[8:15]:
        ms = s * 1000 + rng.randint(0, 999)
        cases.append((ms, ms * 1000))
    for s in secs[15:22]:
        us = s * 1_000_000 + rng.randint(0, 999_999)
        cases.append((us, us))
    for s in secs[22:]:
        ns = s * 1_000_000_000 + rng.randint(0, 999_999_999)
        cases.append((ns, ns // 1000))
    n = len(cases)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array([v for v, _ in cases], type=pa.int64()),
            "user_id": pa.array([1] * n, type=pa.int64()),
            "event_type": pa.array(["x"] * n),
            "value": pa.array([0.0] * n, type=pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    d = tmp_path / "prop"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    got = _epoch_us(load_table(spark, str(d), "events"))
    assert got == {i: exp for i, (_, exp) in enumerate(cases)}


def test_load_stream_directory_layout_streams_all_rows(spark, tmp_path):
    """r15 bug fix: load_stream's pathGlobFilter form matches LEAF
    file names, so a directory-layout table (a Spark write with
    part-*.parquet inside — the layout every scale fixture builds)
    silently streamed ZERO rows. Pin that both layouts stream the
    full row set."""
    import shutil

    from kafka_streams_app_spark.sources.catalog import load_stream

    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = src.count()
    # directory layout: a genuine Spark write with part files
    d = tmp_path / "dirsf"
    d.mkdir()
    src.repartition(3).write.parquet(str(d / "embeddings.parquet"))
    # single-file layout: copy the testdata file under the same root
    f = tmp_path / "filesf"
    f.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/embeddings.parquet",
        f / "embeddings.parquet",
    )
    for root in (d, f):
        seen = {"rows": 0}

        def count_rows(bdf, _bid):
            seen["rows"] += bdf.count()

        q = (
            load_stream(spark, str(root), "embeddings")
            .writeStream.foreachBatch(count_rows)
            .option("checkpointLocation", str(root / "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert seen["rows"] == n, (str(root), seen["rows"], n)
