"""Incremental trailing-n rolling average: the streaming twin of
operators/analytics.py:rolling_stats.

Kafka-Streams-aggregate shape (state updated per record in arrival
order, one emission per input record — the same contract as
streaming/zscore.py): per key the state is the ring of the last n
values as exact DECIMAL(30,6) micro-unit integers (computed JVM-side
by zscore.with_micro_units, so the double→decimal rounding is
Spark's). Each record appends to the ring, trims to n, and emits

    roll_avg = (sum(ring) / 10⁶) / len(ring)

— the integer ring sum is exact; the two double divisions are the
same operation sequence as the oracle's CAST(SUM(decimal) AS DOUBLE)
/ count(*) (the decimal→double conversion of an integer-valued
decimal IS the correctly-rounded sum/10⁶ while the sum stays below
2^53 micro-units, i.e. window sums < ~9·10⁹ in value units — far
beyond any trailing-n frame), so stream output == the batch
window-function result row for row.

State: one string of ≤ n comma-joined micro-unit ints per key —
bounded by n, unbounded-width ints, never wraps. Scale: identical
shuffle/state layout to the other TWS operators (hash-partitioned by
key, RocksDB); per-record work is O(n) on tiny ints.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_U = 1_000_000

_STATE_SCHEMA = StructType([StructField("ring", StringType(), True)])


class _RollingAvg(StatefulProcessor):
    def __init__(self, keys: list[str], seq_col: str, value_col: str, n: int):
        self.keys = keys
        self.seq_col = seq_col
        self.value_col = value_col
        self.n = n
        self.out_columns = keys + [seq_col, value_col, "roll_n", "roll_avg"]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("ring", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows)).sort_values(self.seq_col, kind="stable")
        ring: list[int] = (
            [int(x) for x in self.state.get()[0].split(",") if x]
            if self.state.exists()
            else []
        )
        out: list[tuple] = []
        for seq, val, u in zip(
            pdf[self.seq_col].tolist(),
            pdf[self.value_col].tolist(),
            pdf["zu"].tolist(),
        ):
            ring.append(int(u))
            if len(ring) > self.n:
                ring.pop(0)
            cnt = len(ring)
            out.append(key + (seq, val, cnt, (sum(ring) / 1e6) / cnt))
        self.state.update((",".join(str(x) for x in ring),))
        yield pd.DataFrame(out, columns=self.out_columns)

    def close(self) -> None:
        pass


def _plan(df: DataFrame, keys, seq_col, value_col, n):
    proc = _RollingAvg(keys, seq_col, value_col, n)
    in_schema = df.schema
    out_schema = StructType(
        [StructField(k, in_schema[k].dataType, True) for k in keys]
        + [
            StructField(seq_col, in_schema[seq_col].dataType, True),
            StructField(value_col, DoubleType(), True),
            StructField("roll_n", LongType(), True),
            StructField("roll_avg", DoubleType(), True),
        ]
    )
    return proc, out_schema


def _prepared(df, keys, seq_col, value_col):
    needed = list(dict.fromkeys(keys + [seq_col, value_col, "zu"]))
    return df.select(*needed).na.drop(subset=keys)


def rolling_avg_stream(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    value_col: str,
    n: int = 10,
) -> DataFrame:
    """Incremental trailing-n rolling average over a streaming
    DataFrame carrying zscore.with_micro_units' `zu` column."""
    from kafka_streams_app_spark.streaming.ktable import _require_rocksdb

    _require_rocksdb(df.sparkSession)
    df = _prepared(df, keys, seq_col, value_col)
    proc, out_schema = _plan(df, keys, seq_col, value_col, n)
    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def rolling_avg_batch(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    value_col: str,
    n: int = 10,
) -> DataFrame:
    """Grouped-replay twin (streaming/replay.py) — the TWS-less path."""
    from kafka_streams_app_spark.streaming.replay import grouped_replay

    df = _prepared(df, keys, seq_col, value_col)
    proc, out_schema = _plan(df, keys, seq_col, value_col, n)
    return grouped_replay(df, keys, proc, out_schema)


_TIME_STATE_SCHEMA = StructType([StructField("ring", StringType(), True)])


class _TimeRollingAvg(StatefulProcessor):
    """Trailing-HORIZON (wall-clock) rolling aggregate — the streaming
    twin of operators/analytics.py:rolling_time_stats, under the same
    Kafka-Streams-aggregate contract as _RollingAvg: state updated per
    record in (ts_s, seq) order, one emission per record covering the
    records up to and including itself with ts_s in
    (cur - horizon, cur].

    Peer note (what distinguishes this from the batch RANGE frame): a
    batch RANGE frame gives every same-second row the WHOLE
    same-second group including later peers; an incremental operator
    cannot see future peers, so each record's frame cuts at its own
    (ts_s, seq) position — the oracle is the correlated form with
    exactly that cut, all-integer comparisons.

    State: the ring of (ts_s, micro-unit value) pairs still inside
    the horizon — bounded by horizon x per-key event rate (the honest
    bound of any wall-clock frame; the ROWS-frame twin bounds by n
    instead). Arrival in event order keeps eviction O(1) amortized
    from the ring front.
    """

    def __init__(self, keys: list[str], seq_col: str, ts_col: str,
                 value_col: str, horizon_s: int):
        self.keys = keys
        self.seq_col = seq_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.horizon_s = horizon_s
        self.out_columns = keys + [
            ts_col, seq_col, value_col, "win_n", "win_sum", "win_avg"
        ]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("ring", _TIME_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows)).sort_values(
            [self.ts_col, self.seq_col], kind="stable"
        )
        ring: list[tuple[int, int]] = (
            [
                (int(t), int(u))
                for t, u in (x.split(":") for x in self.state.get()[0].split(",") if x)
            ]
            if self.state.exists()
            else []
        )
        out: list[tuple] = []
        for ts_s, seq, val, u in zip(
            pdf[self.ts_col].tolist(),
            pdf[self.seq_col].tolist(),
            pdf[self.value_col].tolist(),
            pdf["zu"].tolist(),
        ):
            ts_s = int(ts_s)
            ring.append((ts_s, int(u)))
            cutoff = ts_s - self.horizon_s
            while ring and ring[0][0] <= cutoff:
                ring.pop(0)
            cnt = len(ring)
            s = sum(u for _, u in ring)
            out.append(
                key + (ts_s, seq, val, cnt, s / 1e6, (s / 1e6) / cnt)
            )
        self.state.update(
            (",".join(f"{t}:{u}" for t, u in ring),)
        )
        yield pd.DataFrame(out, columns=self.out_columns)

    def close(self) -> None:
        pass


def _time_plan(df, keys, seq_col, ts_col, value_col, horizon_s):
    proc = _TimeRollingAvg(keys, seq_col, ts_col, value_col, horizon_s)
    in_schema = df.schema
    out_schema = StructType(
        [StructField(k, in_schema[k].dataType, True) for k in keys]
        + [
            StructField(ts_col, LongType(), True),
            StructField(seq_col, in_schema[seq_col].dataType, True),
            StructField(value_col, DoubleType(), True),
            StructField("win_n", LongType(), True),
            StructField("win_sum", DoubleType(), True),
            StructField("win_avg", DoubleType(), True),
        ]
    )
    return proc, out_schema


def _time_prepared(df, keys, seq_col, ts_col, value_col):
    needed = list(dict.fromkeys(keys + [seq_col, ts_col, value_col, "zu"]))
    return df.select(*needed).na.drop(subset=keys)


def rolling_time_avg_stream(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    ts_col: str,
    value_col: str,
    horizon_s: int = 300,
) -> DataFrame:
    """Incremental trailing-horizon rolling aggregate over a streaming
    DataFrame carrying zscore.with_micro_units' `zu` column and an
    integer epoch-seconds `ts_col`."""
    from kafka_streams_app_spark.streaming.ktable import _require_rocksdb

    _require_rocksdb(df.sparkSession)
    df = _time_prepared(df, keys, seq_col, ts_col, value_col)
    proc, out_schema = _time_plan(df, keys, seq_col, ts_col, value_col, horizon_s)
    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def rolling_time_avg_batch(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    ts_col: str,
    value_col: str,
    horizon_s: int = 300,
) -> DataFrame:
    """Grouped-replay twin (streaming/replay.py) — the TWS-less path."""
    from kafka_streams_app_spark.streaming.replay import grouped_replay

    df = _time_prepared(df, keys, seq_col, ts_col, value_col)
    proc, out_schema = _time_plan(df, keys, seq_col, ts_col, value_col, horizon_s)
    return grouped_replay(df, keys, proc, out_schema)
