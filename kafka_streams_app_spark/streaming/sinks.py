"""Stream sinks (SURVEY.md §2.1 S3/S5) + the IQ state mirror (M5).

S3 `.to(topic)` — every reference topology ends in
KStream.to(topic, Produced.with(...))
(/root/reference/src/main/java/com/ayoubom/kafka/WordCount.java:58,
 /root/reference/src/main/scala/com/ayoubom/kafka/apps/WindowedJoin.scala:54).
Spark-first: a topic is a writeStream target; the serde declaration is
the sink format. `to_topic` routes to kafka/parquet/memory/console.

S5 debug sink — KStream.print (ForeignJoin.scala:31) -> console format.

M5 IQ mirror — the reference serves RocksDB stores over REST
(/root/reference/src/main/java/com/ayoubom/kafka/utils/IQueriesService.java:78-176).
Here `mirror_store` maintains a queryable snapshot of a streaming
aggregation via foreachBatch: each micro-batch's updated rows append to
a partitioned parquet changelog, and the registered view resolves
latest-per-key over it (operators/ktable.latest_per_key), so
operators/iq.py queries (Q1-Q5) run against LIVE state with full
Catalyst pushdown. No driver-side state: the changelog is written and
read distributed, exactly like a compacted Kafka changelog topic.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka_streams_app_spark.operators.ktable import latest_per_key


def to_topic(
    df: DataFrame,
    topic: str,
    *,
    format: str = "parquet",
    path: str | None = None,
    output_mode: str = "append",
    checkpoint: str | None = None,
    kafka_servers: str | None = None,
    key_expr: str | None = None,
) -> StreamingQuery:
    """S3 — sink a stream to a named topic.

    format='kafka' publishes (key, value-as-json) to a real topic;
    'parquet' treats the topic as a directory table (the batch-test
    analogue); 'memory' registers an in-memory table named `topic`;
    'console' is the S5 debug sink (print(Printed.toSysOut)).
    """
    checkpoint = checkpoint or tempfile.mkdtemp(prefix=f"to_{topic}_ckpt_")
    if format == "kafka":
        key = F.expr(key_expr) if key_expr else F.lit(None).cast("string")
        payload = df.select(
            key.cast("string").alias("key"),
            F.to_json(F.struct(*df.columns)).alias("value"),
        )
        return (
            payload.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_servers or "localhost:9092")
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
            .start()
        )
    w = (
        df.writeStream.format(format)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if format == "memory":
        w = w.queryName(topic)
    elif format == "parquet":
        w = w.option("path", path or os.path.join(tempfile.gettempdir(), topic))
    return w.start()


class StoreMirror:
    """M5 — foreachBatch mirror turning a streaming aggregation into a
    continuously-updated queryable store view.

    The UPDATE-mode aggregation's per-batch output (its changelog) is
    appended to a parquet changelog dir with a batch sequence column;
    `view()` (and the registered temp view `store_name`) materializes
    latest-per-key over it. Interactive queries (operators/iq.py Q1-Q5)
    filter that view; Catalyst pushes key/range predicates into the
    parquet scan.

    At scale the changelog dir would be a compacted table (Delta/Iceberg
    upsert); plain parquet + latest_per_key keeps the same read
    semantics with zero extra dependencies, and a `compact()` call
    rewrites the dir down to one snapshot when the changelog grows.
    """

    def __init__(
        self,
        spark: SparkSession,
        store_name: str,
        key_cols: list[str],
        path: str | None = None,
    ) -> None:
        self.spark = spark
        self.store_name = store_name
        self.key_cols = key_cols
        self.path = path or tempfile.mkdtemp(prefix=f"store_{store_name}_")

    def attach(self, agg_df: DataFrame, checkpoint: str | None = None) -> StreamingQuery:
        """Start mirroring an UPDATE-mode streaming aggregation."""

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.withColumn("_batch", F.lit(batch_id))
                .write.mode("append").parquet(self.path)
            )

        return (
            agg_df.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option(
                "checkpointLocation",
                checkpoint or tempfile.mkdtemp(prefix=f"store_{self.store_name}_ckpt_"),
            )
            .start()
        )

    def view(self) -> DataFrame:
        """Current store contents: latest value per key from the changelog."""
        changelog = self.spark.read.parquet(self.path)
        snap = latest_per_key(changelog, self.key_cols, order_by=["_batch"])
        return snap.drop("_batch")

    def register(self) -> None:
        self.view().createOrReplaceTempView(self.store_name)

    def compact(self) -> None:
        """Rewrite the changelog down to the current snapshot."""
        snap = self.view().withColumn("_batch", F.lit(-1))
        tmp = self.path + ".compact"
        snap.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)
