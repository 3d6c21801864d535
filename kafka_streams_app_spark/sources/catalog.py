"""Schema catalog + batch sources (SURVEY.md §2.1 S1/S2 batch side).

The reference declares per-topic types at use-site via serdes
(/root/reference/src/main/java/com/ayoubom/kafka/WordCount.java:48-49,
 /root/reference/src/main/scala/com/ayoubom/kafka/serdes/JsonSerde.scala:10-36).
This engine is schema-fixed: every table/stream has a catalog entry, which
strictly generalizes use-site serdes and lets Catalyst prune/push down.

Timestamp normalization is **dtype-adaptive**: the catalog declares WHICH
columns are event-time, but dispatches on the dtype Spark actually loaded
rather than assuming a physical parquet encoding (the data generator has
shipped the same column as both INT64 TIMESTAMP(NANOS) and timestamp[us]
across refreshes):

- long (INT64 nanos read via ``spark.sql.legacy.parquet.nanosAsLong``) ->
  ``timestamp_micros(c div 1000)`` — integer div keeps full precision and
  the ns->us truncation matches how the DuckDB oracle floors ns epochs.
- TIMESTAMP_NTZ / TIMESTAMP -> ``cast("timestamp")`` to the session TZ
  (pinned to UTC by the engine), epoch-microsecond-identical to the oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

# table -> columns carrying event time (any physical encoding)
TABLES: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": [],
    "supplier": [],
    "part": [],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
    "documents": [],
    "embeddings": [],
}


def _normalize_ts(df: DataFrame, cols: list[str]) -> DataFrame:
    """Normalize each declared event-time column to a session-TZ timestamp,
    dispatching on the dtype the reader actually produced.

    Integer columns additionally infer the epoch UNIT from magnitude —
    the windows are distinct for any plausible event time (epoch
    seconds ~2e9, millis ~2e12, micros ~2e15, nanos ~2e18; each band
    covers 1973..5138 AD in its unit), so a generator switching from
    TIMESTAMP(NANOS) to raw epoch-millis longs cannot silently produce
    values off by 1000x. Pure scan-stage CASE arithmetic; integer div
    keeps full precision (float div would lose low bits of an ~1.7e18
    ns value) and ns->us truncation matches how the oracle floors."""
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            df = df.withColumn(
                c,
                F.expr(
                    f"CASE WHEN abs({c}) >= 100000000000000000"      # >= 1e17: nanos
                    f" THEN timestamp_micros({c} div 1000)"
                    f" WHEN abs({c}) >= 100000000000000"             # >= 1e14: micros
                    f" THEN timestamp_micros({c})"
                    f" WHEN abs({c}) >= 100000000000"                # >= 1e11: millis
                    f" THEN timestamp_millis({c})"
                    f" ELSE timestamp_seconds({c}) END"
                ),
            )
        elif isinstance(dt, TimestampType):
            pass  # already session-TZ timestamp
        else:
            # TIMESTAMP_NTZ, DATE, string, ... -> session-TZ timestamp
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with normalized timestamp types."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(TABLES)}")
    # Defensive: the verification driver builds its own session without our
    # builder confs; these are runtime-settable. nanosAsLong is a no-op on
    # non-nanos data, so it stays set for backward compatibility.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _normalize_ts(df, TABLES[name])


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a STREAM (S1 streaming side): the
    parquet file plays an already-filled topic; Trigger.AvailableNow
    replays it to completion. Same timestamp normalizations as
    load_table, applied on the streaming DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(TABLES)}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # schema as the (nanos-as-long) reader sees it, from the batch reader
    path = f"{sf_dir}/{name}.parquet"
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # directory-layout table (a Spark write: part-*.parquet inside)
        # — watch the directory itself. The pathGlobFilter form below
        # would match against LEAF file names and silently stream ZERO
        # rows for this layout (r15 bug: every x10-build fixture that
        # streamed a built table measured an empty stream).
        df = spark.readStream.schema(schema).parquet(path)
    else:
        # single-file table (the driver-generated testdata layout);
        # the file source wants a directory, so watch sf_dir filtered
        # to this table's file name
        df = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
    return _normalize_ts(df, TABLES[name])
