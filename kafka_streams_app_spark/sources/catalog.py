"""Schema catalog + batch sources (SURVEY.md §2.1 S1/S2 batch side).

The reference declares per-topic types at use-site via serdes
(/root/reference/src/main/java/com/ayoubom/kafka/WordCount.java:48-49,
 /root/reference/src/main/scala/com/ayoubom/kafka/serdes/JsonSerde.scala:10-36).
This engine is schema-fixed: every table/stream has a catalog entry, which
strictly generalizes use-site serdes and lets Catalyst prune/push down.

Normalizations applied on load:
- ``events.ts`` arrives as INT64 TIMESTAMP(NANOS) parquet; with
  ``spark.sql.legacy.parquet.nanosAsLong`` it reads as long ns and is
  converted to a micro-precision timestamp (truncation, matching how the
  DuckDB oracle floors ns when extracting epochs).
- TIMESTAMP_NTZ columns (o_orderdate, l_shipdate) are cast to session-TZ
  timestamps (session TZ is pinned to UTC by the engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# table -> (ns-long timestamp cols, ntz timestamp cols)
TABLES: dict[str, tuple[list[str], list[str]]] = {
    "region": ([], []),
    "nation": ([], []),
    "customer": ([], []),
    "supplier": ([], []),
    "part": ([], []),
    "orders": ([], ["o_orderdate"]),
    "lineitem": ([], ["l_shipdate"]),
    "events": (["ts"], []),
    "documents": ([], []),
    "embeddings": ([], []),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with normalized timestamp types."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(TABLES)}")
    # Defensive: the verification driver builds its own session without our
    # builder confs; these are runtime-settable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    ns_cols, ntz_cols = TABLES[name]
    for c in ns_cols:
        # integer div keeps full precision (float div would lose low bits
        # of the ~1.7e18 ns value); truncation ns->us matches the oracle.
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


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
    schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    # the file source wants a directory; watch sf_dir filtered to this table
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    ns_cols, ntz_cols = TABLES[name]
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
