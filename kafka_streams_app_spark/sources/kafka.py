"""Kafka topic sources (SURVEY.md §2.1 S1 — the real-broker side).

The reference consumes topics with use-site serdes
(builder.stream(topic, Consumed.with(keySerde, valueSerde)) —
/root/reference/src/main/java/com/ayoubom/kafka/WordCount.java:53,
/root/reference/src/main/scala/com/ayoubom/kafka/apps/WindowedJoin.scala:43-48).
Here a topic source is spark.readStream.format("kafka") plus a typed
projection: the serde declaration becomes a Spark schema applied with
from_json (JSON values) or a plain cast (primitive values), and the
record's event timestamp maps to the Kafka `timestamp` column — the
same event-time the reference's Producer sets
(/root/reference/src/main/scala/com/ayoubom/kafka/Producer.scala:41-48).

Requires the spark-sql-kafka connector on the classpath (ship via
--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>).
This container has no broker/connector, so these builders are exercised
structurally (tests skip the .load()); the parquet-backed sources in
catalog.py play the topics everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType


def stream_topic(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    value_schema: StructType | DataType | str,
    key_type: str = "string",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1 — topic -> typed streaming DataFrame (the KStream view).

    Output columns: key (cast to key_type), value fields (struct schema
    flattened; primitive schema as a single `value` column), ts (the
    record's event timestamp), partition, offset.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return _project(raw, value_schema, key_type)


def read_topic_batch(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    value_schema: StructType | DataType | str,
    key_type: str = "string",
) -> DataFrame:
    """Bounded read of a topic's current contents (snapshot analytics)."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )
    return _project(raw, value_schema, key_type)


def _project(
    raw: DataFrame, value_schema: StructType | DataType | str, key_type: str
) -> DataFrame:
    """Apply the 'serde': typed key cast + JSON-struct or primitive value.

    Kafka wire columns are BINARY; numeric casts must go through string
    (BINARY->BIGINT is not a valid direct cast in Spark) — this mirrors
    the reference's string-serde-then-parse convention."""
    key = F.col("key").cast("string").cast(key_type).alias("key")
    if isinstance(value_schema, StructType) or (
        isinstance(value_schema, str) and value_schema.strip().startswith("struct")
    ):
        val = F.from_json(F.col("value").cast("string"), value_schema).alias("_v")
        df = raw.select(key, val, F.col("timestamp").alias("ts"),
                        "partition", "offset")
        return df.select("key", "_v.*", "ts", "partition", "offset")
    val = F.col("value").cast("string").cast(value_schema).alias("value")
    return raw.select(key, val, F.col("timestamp").alias("ts"),
                      "partition", "offset")
