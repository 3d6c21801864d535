"""Sinks (S3/S5) + IQ-over-live-state (M5) pins.

The reference queries RocksDB stores over REST while the topology runs
(IQueriesService.java:78-176); here a StoreMirror maintains the store
from an update-mode streaming count and operators/iq.py queries run
against it between micro-batches.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from kafka_streams_app_spark.operators import iq
from kafka_streams_app_spark.streaming import windows as W
from kafka_streams_app_spark.streaming.harness import MicroBatchReplay
from kafka_streams_app_spark.streaming.sinks import StoreMirror, to_topic


def test_store_mirror_live_queries(spark):
    """WordCount counts-store lifecycle: counts visible to IQ queries
    after each batch, updated (not duplicated) on re-count."""
    mirror = StoreMirror(spark, "counts_store_test", ["word"])
    staging = tempfile.mkdtemp(prefix="iqsrc_")
    src = (
        spark.readStream.schema("word string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(staging)
    )
    counts = W.count_per_key_stream(src, ["word"])
    q = mirror.attach(counts)

    def pipe(rows):
        spark.createDataFrame(rows, "word string, ts timestamp").coalesce(1) \
            .write.mode("append").parquet(staging)
        q.processAllAvailable()

    from datetime import datetime, timezone
    t = datetime(2024, 1, 1, tzinfo=timezone.utc)
    pipe([("hello", t), ("world", t), ("hello", t)])
    store = mirror.view()
    # Q1 point lookup over live state
    assert iq.point_lookup(store, "word", "hello").collect()[0]["cnt"] == 2
    # Q2 full scan
    assert {(r["word"], r["cnt"]) for r in iq.all_entries(store).collect()} == {
        ("hello", 2), ("world", 1),
    }
    pipe([("hello", t), ("alpha", t)])
    store = mirror.view()
    assert iq.point_lookup(store, "word", "hello").collect()[0]["cnt"] == 3
    # Q3 range scan: 'alpha'..'hello' (inclusive), excludes 'world'
    assert {r["word"] for r in iq.range_scan(store, "word", "a", "m").collect()} == {
        "alpha", "hello",
    }
    q.stop()


def test_store_mirror_compact(spark):
    """compact() rewrites the changelog to one snapshot with identical
    view contents (the Delta-upsert analogue)."""
    mirror = StoreMirror(spark, "compact_test", ["k"])
    for batch_id, rows in enumerate([[("a", 1), ("b", 2)], [("a", 3)]]):
        spark.createDataFrame(rows, "k string, v int") \
            .withColumn("_batch", F.lit(batch_id)) \
            .write.mode("append").parquet(mirror.path)
    before = {(r["k"], r["v"]) for r in mirror.view().collect()}
    assert before == {("a", 3), ("b", 2)}
    mirror.compact()
    assert {(r["k"], r["v"]) for r in mirror.view().collect()} == before


def test_to_topic_memory_and_parquet(spark, tmp_path):
    """S3: the same stream sinks to a memory 'topic' and a parquet
    'topic'; both drain identical rows."""
    staging = tempfile.mkdtemp(prefix="sinksrc_")
    src = (
        spark.readStream.schema("k string, v int")
        .option("maxFilesPerTrigger", 1).parquet(staging)
    )
    q1 = to_topic(src, "sink_mem_topic", format="memory")
    q2 = to_topic(src, "sink_pq_topic", format="parquet", path=str(tmp_path / "pq"))
    spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int").coalesce(1) \
        .write.mode("append").parquet(staging)
    q1.processAllAvailable()
    q2.processAllAvailable()
    mem = {(r["k"], r["v"]) for r in spark.table("sink_mem_topic").collect()}
    pq = {(r["k"], r["v"]) for r in spark.read.parquet(str(tmp_path / "pq")).collect()}
    assert mem == pq == {("a", 1), ("b", 2)}
    q1.stop()
    q2.stop()


def test_key_routing_matches_actual_partition_placement(spark):
    """Q6 analogue: pmod(murmur3, n) must equal the partition a
    repartition(n, key) exchange actually routes each row to — the
    Spark-native answer to MetadataService.queryMetadataForKey."""
    from pyspark.sql import functions as F

    from kafka_streams_app_spark.operators.iq import key_routing

    df = spark.range(0, 1000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("key")
    )
    n = 7
    predicted = key_routing(df, ["key"], n)
    actual = (
        df.repartition(n, "key")
        .select("key", F.spark_partition_id().alias("pid"))
    )
    joined = predicted.join(actual, "key")
    assert joined.filter(F.col("partition_id") != F.col("pid")).count() == 0
    assert joined.count() == 1000


def test_to_topic_console_runs(spark):
    """S5: the console/debug sink starts, drains a micro-batch, and
    terminates cleanly (output goes to driver stdout — the
    print(Printed.toSysOut) analogue; nothing to assert on content)."""
    import tempfile

    from kafka_streams_app_spark.streaming.sinks import to_topic

    src_dir = tempfile.mkdtemp(prefix="console_src_")
    spark.createDataFrame([(1, "x")], "id int, v string").write.mode(
        "append"
    ).parquet(src_dir)
    stream = spark.readStream.schema("id int, v string").parquet(src_dir)
    q = to_topic(stream, "debug_topic", format="console")
    try:
        q.processAllAvailable()
        assert q.isActive
    finally:
        q.stop()
