"""Bucketed tables: shuffle-free co-located joins (SURVEY §4 scale path).

A repeated big-big equi-join pays its shuffle on every query; writing
both sides bucketed BY the join key with the SAME bucket count lets
Spark's SortMergeJoin read co-located buckets with NO Exchange on
either side — the batch analogue of Kafka's co-partitioned topics.

At 100 TB this is the difference between an hourly pipeline re-shuffling
the fact table every run and one that pre-pays the layout once at
ingest. Verified by tests/test_bucketing_salting.py, which asserts the bucketed
join plan contains zero shuffle exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str,
    on: list[str], how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket columns.

    Catalyst sees the matching output partitionings and plans a
    SortMergeJoin with no Exchange (check: plans.audit.plan_report
    reports exchanges == 0).
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
