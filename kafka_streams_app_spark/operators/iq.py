"""Interactive queries over materialized state (SURVEY.md §2.6 Q1-Q5).

The reference exposes RocksDB state stores over REST
(/root/reference/src/main/scala/com/ayoubom/kafka/utils/IQService.scala:11-16,
 /root/reference/src/main/java/com/ayoubom/kafka/utils/IQueriesService.java:78-176).
In this engine a "store" is any materialized DataFrame (a batch snapshot,
or a streaming aggregation mirrored by foreachBatch — see
streaming/harness.py); interactive queries are plain filters over it, so
Catalyst prunes partitions/pushes predicates into the store scan.

The reference's metadata/routing layer (MetadataService.java:30-68) is
deliberately absent: Spark's driver sees all state (SURVEY.md §2.6 Q6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_lookup(store: DataFrame, key_col: str, key) -> DataFrame:
    """Q1 — GET /state/keyvalue/{store}/{key} (IQueriesService.java:78-102)."""
    return store.filter(F.col(key_col) == F.lit(key))


def all_entries(store: DataFrame) -> DataFrame:
    """Q2 — GET /state/keyvalues/{store}/all (IQueriesService.java:117-122)."""
    return store


def range_scan(store: DataFrame, key_col: str, lo, hi) -> DataFrame:
    """Q3 — key-range scan, bounds inclusive (IQueriesService.java:132-139)."""
    return store.filter(F.col(key_col).between(F.lit(lo), F.lit(hi)))


def window_fetch(
    store: DataFrame, key_col: str, key, start_col: str, t_from, t_to
) -> DataFrame:
    """Q4 — all windows of a key in a start-time range
    (IQueriesService.java:151-176)."""
    return store.filter(
        (F.col(key_col) == F.lit(key)) & F.col(start_col).between(F.lit(t_from), F.lit(t_to))
    )


def window_fetch_all(store: DataFrame, start_col: str, t_from, t_to) -> DataFrame:
    """Q5 — fetchAll(t1, t2): every key, windows in range
    (TopologiesTest.scala:60-70)."""
    return store.filter(F.col(start_col).between(F.lit(t_from), F.lit(t_to)))


def key_routing(df: DataFrame, keys: list[str], num_partitions: int) -> DataFrame:
    """Q6 analogue — metadata/routing: which partition owns a key.

    The reference's MetadataService answers "which application instance
    hosts the store partition for this key" and proxies remote lookups
    (MetadataService.java:30-68, IQueriesService.java:84-87,104-109).
    Spark has no multi-instance routing problem — the driver sees all
    state — but the underlying question ("where does this key live")
    maps to shuffle partition ownership: HashPartitioning routes a row
    to pmod(murmur3_hash(keys), n), which is exactly F.hash. The
    returned partition_id IS the task/state-store partition that owns
    the key in any repartition(n, keys)-shaped exchange — pinned
    against spark_partition_id() in tests/test_sinks_iq.py.
    """
    return df.select(
        *keys,
        F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(num_partitions))
        .alias("partition_id"),
    )


def key_routing_portable(
    df: DataFrame, keys: list[str], num_partitions: int
) -> DataFrame:
    """Q6, engine-portable flavor: ownership via the md5 bucket
    (pipeline.portable_bucket) instead of murmur3, so "which instance
    owns this key" is replayable by ANY engine — the property the
    reference's MetadataService needs when instances coordinate over a
    shared convention (MetadataService.java:55-68), and what lets the
    DuckDB oracle hash-check the routing table. The murmur3 variant
    above stays as the Spark-shuffle-native twin (pinned against
    spark_partition_id() in tests); the two-instance IQ facade test
    routes with THIS one. Keeps all input columns and appends
    partition_id.
    """
    from kafka_streams_app_spark.operators.pipeline import portable_bucket

    key = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return df.select(
        "*", portable_bucket(key, num_partitions).alias("partition_id")
    )
