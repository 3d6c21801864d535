"""Executable spec for the real-Kafka I/O path (sources/kafka.py,
sinks.to_topic(format='kafka')) — the one I/O surface this sandbox
cannot exercise end-to-end (no broker, no spark-sql-kafka connector).

The round-trip test is gated on KAFKA_BOOTSTRAP_SERVERS: on a machine
with a broker and the connector (--packages
org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>) it publishes a topic
and reads it back typed; here it skips cleanly. The structural tests
below it always run: they pin the serde projection logic that the
connector path shares with every other source.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")

needs_broker = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set KAFKA_BOOTSTRAP_SERVERS (and ship the spark-sql-kafka "
    "connector) to run the real-broker round-trip",
)


@needs_broker
def test_kafka_round_trip(spark):
    """Produce (key, json-value) to a fresh topic via the kafka sink,
    read it back via read_topic_batch with a struct serde, and compare
    the typed rows — the full S1 -> S3 path over a real broker."""
    from kafka_streams_app_spark.sources.kafka import read_topic_batch
    from kafka_streams_app_spark.streaming.sinks import to_topic

    topic = f"ksas_smoke_{uuid.uuid4().hex[:8]}"
    rows = [(i, f"name_{i}", float(i) * 1.5) for i in range(100)]
    src = spark.createDataFrame(rows, "id long, name string, score double")

    # bounded "stream": feed the static frame through the streaming
    # writer using a one-shot file source
    import tempfile

    staging = tempfile.mkdtemp(prefix="kafka_smoke_src_")
    src.write.mode("overwrite").parquet(staging)
    stream = spark.readStream.schema(src.schema).parquet(staging)
    q = to_topic(
        stream, topic, format="kafka", kafka_servers=BOOTSTRAP, key_expr="id"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = read_topic_batch(
        spark, topic, BOOTSTRAP,
        "struct<id: long, name: string, score: double>", key_type="long",
    )
    got = sorted(
        (r["id"], r["name"], r["score"]) for r in back.collect()
    )
    assert got == rows
    assert sorted(r["key"] for r in back.collect()) == [r[0] for r in rows]


def test_kafka_source_builds_without_broker(spark):
    """The source builder must fail only at .load() (missing connector),
    not at import or projection-construction time — i.e. the code path
    up to the DataSource resolution is valid PySpark."""
    from kafka_streams_app_spark.sources.kafka import stream_topic

    with pytest.raises(Exception) as exc:
        stream_topic(spark, "t", "localhost:9092", "struct<a: long>")
    # Spark's error for a missing data source names it
    assert "kafka" in str(exc.value).lower()


def test_serde_projection_struct_and_primitive(spark):
    """The serde projection (_project) is connector-independent: feed it
    a frame with the exact kafka wire schema and check both the
    JSON-struct and primitive-cast paths."""
    from kafka_streams_app_spark.sources.kafka import _project

    wire = spark.createDataFrame(
        [
            (b"7", b'{"a": 1, "b": "x"}', "2024-01-01 00:00:00", 0, 10),
            (b"8", b'{"a": 2, "b": "y"}', "2024-01-01 00:00:01", 1, 11),
        ],
        "key binary, value binary, timestamp string, partition int, offset long",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))

    typed = _project(wire, "struct<a: long, b: string>", key_type="long")
    rows = sorted((r["key"], r["a"], r["b"]) for r in typed.collect())
    assert rows == [(7, 1, "x"), (8, 2, "y")]
    assert set(typed.columns) == {"key", "a", "b", "ts", "partition", "offset"}

    prim = _project(wire.withColumn("value", F.lit(b"41")), "long", "string")
    assert [r["value"] for r in prim.collect()] == [41, 41]


def test_stream_topic_exact_option_set(spark, monkeypatch):
    """Shape-pin for the broker-only path (r13 verdict ask #7): the
    sandbox can never .load() a kafka source, so pin the EXACT reader
    format + option set stream_topic/read_topic_batch hand the
    connector, and run the downstream projection on a fake wire frame
    returned by the patched loader — the whole builder short of the
    socket."""
    from pyspark.sql import SparkSession

    from kafka_streams_app_spark.sources.kafka import (
        read_topic_batch,
        stream_topic,
    )

    wire = spark.createDataFrame(
        [(b"7", b'{"a": 1}', "2024-01-01 00:00:00", 0, 10)],
        "key binary, value binary, timestamp string, partition int, offset long",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))

    class _FakeReader:
        def __init__(self):
            self.fmt = None
            self.opts = {}

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def load(self):
            return wire

    stream_reader = _FakeReader()
    batch_reader = _FakeReader()
    monkeypatch.setattr(
        type(spark), "readStream", property(lambda self: stream_reader)
    )
    monkeypatch.setattr(
        type(spark), "read", property(lambda self: batch_reader)
    )
    assert isinstance(spark, SparkSession)

    out = stream_topic(
        spark, "clicks", "broker:9092", "struct<a: long>", key_type="long"
    )
    assert stream_reader.fmt == "kafka"
    assert stream_reader.opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "clicks",
        "startingOffsets": "earliest",
    }
    assert [(r["key"], r["a"]) for r in out.collect()] == [(7, 1)]

    out_b = read_topic_batch(
        spark, "clicks", "broker:9092", "struct<a: long>", key_type="long"
    )
    assert batch_reader.fmt == "kafka"
    assert batch_reader.opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "clicks",
        "startingOffsets": "earliest",
        "endingOffsets": "latest",
    }
    assert [(r["key"], r["a"]) for r in out_b.collect()] == [(7, 1)]

    # non-default offsets thread through
    stream_reader2 = _FakeReader()
    monkeypatch.setattr(
        type(spark), "readStream", property(lambda self: stream_reader2)
    )
    stream_topic(
        spark, "clicks", "broker:9092", "long",
        starting_offsets="latest",
    )
    assert stream_reader2.opts["startingOffsets"] == "latest"
