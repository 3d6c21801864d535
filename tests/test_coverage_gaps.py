"""Dedicated unit pins for the operators whose COVERAGE rows relied on
their oracle entries alone (T4/T5 re-key grouping, A2/W3 window
bucketing, Q4 window fetch, branch/merge) — hand-computed expectations,
no oracle in the loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_app_spark.operators import aggregations as agg
from kafka_streams_app_spark.operators import iq, stateless


@pytest.fixture(scope="module")
def spark():
    from kafka_streams_app_spark.engine import get_spark

    return get_spark(shuffle_partitions=4)


def test_group_by_mapper_rekey_counts(spark):
    """T4: groupBy(mapper) == selectKey + groupByKey — records regroup
    under the DERIVED key (first letter), not the original."""
    df = spark.createDataFrame(
        [("apple", 1), ("avocado", 2), ("banana", 3)], "word string, v int"
    )
    rekeyed = stateless.select_key(df, F.substring("word", 1, 1), "k")
    out = {
        r["k"]: r["cnt"]
        for r in stateless.group_by(rekeyed, ["k"])
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert out == {"a": 2, "b": 1}


def test_group_by_key_count(spark):
    """T5: groupByKey keeps the existing key."""
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 9)], "key string, v int"
    )
    out = {
        r["key"]: r["cnt"]
        for r in stateless.group_by(df, ["key"])
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert out == {"x": 2, "y": 1}


def test_branch_partitions_and_merge_roundtrip(spark):
    """branch() routes each record to the FIRST matching predicate
    (Kafka's split semantics); merge() reunites the branches."""
    df = spark.createDataFrame([(i,) for i in range(6)], "v int")
    small, even = stateless.branch(df, F.col("v") < 2, F.col("v") % 2 == 0)
    assert sorted(r["v"] for r in small.collect()) == [0, 1]
    # 0 already went to branch 1 -> only the remaining evens land here
    assert sorted(r["v"] for r in even.collect()) == [2, 4]
    merged = stateless.merge(small, even)
    assert sorted(r["v"] for r in merged.collect()) == [0, 1, 2, 4]


def test_windowed_count_tumbling_buckets(spark):
    """A2: epoch-aligned 10 s buckets, starts as BIGINT seconds."""
    rows = [("k", "2024-01-01 00:00:0%d" % i) for i in (1, 2, 9)] + [
        ("k", "2024-01-01 00:00:11")
    ]
    df = spark.createDataFrame(rows, "key string, ts_s string").select(
        "key", F.to_timestamp("ts_s").alias("ts")
    )
    out = {
        r["window_start_s"]: r["cnt"]
        for r in agg.windowed_count(df, "ts", ["key"], 10).collect()
    }
    base = 1704067200
    assert out == {base: 3, base + 10: 1}


def test_windowed_count_hopping_multiassign(spark):
    """W3: a record at t=12 with 10 s windows sliding by 5 belongs to
    windows starting at 5 and 10 — exactly two buckets."""
    df = spark.createDataFrame(
        [("k", "2024-01-01 00:00:12")], "key string, ts_s string"
    ).select("key", F.to_timestamp("ts_s").alias("ts"))
    out = sorted(
        r["window_start_s"]
        for r in agg.windowed_count(df, "ts", ["key"], 10, slide_s=5).collect()
    )
    base = 1704067200
    assert out == [base + 5, base + 10]


def test_window_fetch_key_and_range(spark):
    """Q4: one key's windows inside [from, to] — both bounds inclusive,
    other keys excluded."""
    store = spark.createDataFrame(
        [("a", 0, 1), ("a", 10, 2), ("a", 20, 3), ("b", 10, 9)],
        "key string, window_start_s long, cnt long",
    )
    out = sorted(
        (r["window_start_s"], r["cnt"])
        for r in iq.window_fetch(
            store, "key", "a", "window_start_s", 0, 10
        ).collect()
    )
    assert out == [(0, 1), (10, 2)]
