"""Deterministic micro-batch replay harness — the Spark analogue of the
reference's TopologyTestDriver
(/root/reference/src/test/scala/com/ayoubom/kafka/TopologiesTest.scala:27-29,551-561).

pipe() writes one parquet file per call into a staging dir watched by a
file-source streaming query, then blocks until Spark has processed it
(processAllAvailable, which also runs the extra no-data batch that a
watermark advance schedules — that is where append-mode windows are
emitted, mirroring Kafka's "emit when stream time passes window end").

Outputs land in a memory sink; drain() returns only the rows emitted
since the previous drain, so a test can assert per-pipe emissions the
way the reference reads its output topic between pipeInput calls.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, Row, SparkSession


class MicroBatchReplay:
    """Replay timestamped record sequences through a streaming query.

    build: fn(streaming DataFrame) -> output DataFrame.
    output_mode: append | update | complete.
    """

    def __init__(
        self,
        spark: SparkSession,
        schema: str,
        build,
        output_mode: str = "append",
    ) -> None:
        self.spark = spark
        self.schema = schema
        self.name = f"replay_{uuid.uuid4().hex[:12]}"
        self._staging = tempfile.mkdtemp(prefix=f"{self.name}_src_")
        self._checkpoint = tempfile.mkdtemp(prefix=f"{self.name}_ckpt_")
        self._drained = 0
        self._complete = output_mode == "complete"
        # seed an empty file so the source dir exists with the schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self._staging)
        )
        self.query = (
            build(src)
            .writeStream.format("memory")
            .queryName(self.name)
            .outputMode(output_mode)
            .option("checkpointLocation", self._checkpoint)
            .start()
        )

    def pipe(self, rows: list[tuple] | list[Row]) -> None:
        """Deliver one micro-batch (one parquet file) and process it."""
        df = self.spark.createDataFrame(rows, self.schema)
        df.coalesce(1).write.mode("append").parquet(self._staging)
        self.query.processAllAvailable()

    def table(self) -> DataFrame:
        return self.spark.table(self.name)

    def drain(self) -> list[Row]:
        """Rows emitted since the last drain (all rows in complete mode)."""
        rows = self.table().collect()
        if self._complete:
            return rows
        new = rows[self._drained:]
        self._drained = len(rows)
        return new

    def stop(self) -> None:
        self.query.stop()
        shutil.rmtree(self._staging, ignore_errors=True)
        shutil.rmtree(self._checkpoint, ignore_errors=True)

    def __enter__(self) -> MicroBatchReplay:
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


def run_available_now(
    spark: SparkSession, source_df_build, sink_name: str, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming query over already-materialized input with
    Trigger.AvailableNow and return the memory-sink table once finished.

    Used to evaluate a streaming plan to completion over a static
    dataset — the batch-equivalence path the correctness oracle checks.
    """
    checkpoint = tempfile.mkdtemp(prefix=f"{sink_name}_ckpt_")
    q = (
        source_df_build.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(checkpoint, ignore_errors=True)
    return spark.table(sink_name)
