"""Incremental trailing-n rolling average pins (streaming/rolling.py):
ring carry across micro-batches and stream==grouped-replay equivalence."""

from __future__ import annotations

from kafka_streams_app_spark.sources.catalog import load_table
from kafka_streams_app_spark.streaming import rolling as SR
from kafka_streams_app_spark.streaming import zscore as SZ
from kafka_streams_app_spark.streaming.harness import MicroBatchReplay

SCHEMA = "k string, seq long, v double"


def _build(n):
    return lambda src: SR.rolling_avg_stream(
        SZ.with_micro_units(src, "v"), ["k"], "seq", "v", n=n
    )


def test_ring_carries_across_micro_batches(spark):
    """Trailing-3 over values 1..5 split into two batches: the frame at
    seq=4 must reach back into batch 1 ([2,3,4] -> 3.0) and at seq=5 the
    oldest batch-1 value must have been evicted ([3,4,5] -> 4.0)."""
    with MicroBatchReplay(spark, SCHEMA, _build(3), "update") as r:
        r.pipe([("k", i, float(i)) for i in (1, 2, 3)])
        assert [tuple(x) for x in r.drain()] == [
            ("k", 1, 1.0, 1, 1.0),
            ("k", 2, 2.0, 2, 1.5),
            ("k", 3, 3.0, 3, 2.0),
        ]
        r.pipe([("k", 4, 4.0), ("k", 5, 5.0)])
        assert [tuple(x) for x in r.drain()] == [
            ("k", 4, 4.0, 3, 3.0),
            ("k", 5, 5.0, 3, 4.0),
        ]


def test_stream_equals_grouped_replay_and_batch_window(spark):
    """Stream output == grouped-replay output == the batch
    analytics.rolling_stats window result on the same events slice."""
    from pyspark.sql import functions as F

    from kafka_streams_app_spark.operators import analytics

    base = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_id", "value"
    )
    ev = SZ.with_micro_units(base, "value")
    replay = sorted(
        tuple(r)
        for r in SR.rolling_avg_batch(
            ev, ["user_id"], "event_id", "value", n=10
        ).collect()
    )
    batch = sorted(
        tuple(r)
        for r in analytics.rolling_stats(
            base, "user_id", ["event_id"], "value", n=10
        )
        .select(
            "user_id", "event_id", "value",
            F.col("roll_n").alias("roll_n"), "roll_avg",
        )
        .collect()
    )
    assert replay == batch
    rows = [
        (r["user_id"], r["event_id"], r["value"])
        for r in base.orderBy("event_id").collect()
    ]
    with MicroBatchReplay(
        spark,
        "user_id long, event_id long, value double",
        lambda src: SR.rolling_avg_stream(
            SZ.with_micro_units(src, "value"),
            ["user_id"], "event_id", "value", n=10,
        ),
        "update",
    ) as r:
        half = len(rows) // 2
        r.pipe(rows[:half])
        r.pipe(rows[half:])
        stream = sorted(tuple(x) for x in r.drain())
    assert stream == batch
    assert len(batch) > 0
