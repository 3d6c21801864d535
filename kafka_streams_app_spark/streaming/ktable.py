"""Incremental KTable: latest-per-key changelog view with tombstone
retraction (SURVEY.md §7.1 M4, the hard 20%).

The reference's KTable materializes "latest value per key; null value =
delete" and forwards one changelog record per input update
(/root/reference/src/main/scala/com/ayoubom/kafka/apps/ForeignJoin.scala:28-34;
tombstones piped at
/root/reference/src/test/scala/com/ayoubom/kafka/TopologiesTest.scala:128,234-235).

Here the same semantics run as a keyed stateful operator
(transformWithStateInPandas, Spark 4.x): state = the current value per
key; each input record (in seq order) emits exactly one changelog row —
an upsert carrying (old, new) or a delete carrying the retracted value.
A delete of an absent key emits nothing (Kafka suppresses null->null).

The emitted old_* columns are what make downstream incremental joins
possible: the FK join consumes old_fk/new_fk transitions to re-route
its subscription (streaming/fk_join.py), exactly like Kafka's
subscription topics.

Scale: state is hash-partitioned by key across executors (RocksDB
provider), the shuffle is the same repartition a Kafka changelog topic
implies, and each task streams Arrow batches — no driver involvement.

The batch twin (one max_by aggregate) is operators/ktable.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import BooleanType, StringType, StructField, StructType


def _require_rocksdb(spark) -> None:
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


class _LatestPerKey(StatefulProcessor):
    def __init__(
        self,
        keys: list[str],
        seq_col: str,
        payload: list[str],
        tombstone_col: str | None,
        state_schema: StructType,
        out_columns: list[str],
    ) -> None:
        self.keys = keys
        self.seq_col = seq_col
        self.payload = payload
        self.tombstone_col = tombstone_col
        self.state_schema = state_schema
        self.out_columns = out_columns

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("latest", self.state_schema)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows)).sort_values(self.seq_col, kind="stable")
        cur: tuple | None = tuple(self.state.get()) if self.state.exists() else None
        seqs = pdf[self.seq_col].tolist()
        pay = [pdf[c].tolist() for c in self.payload]
        tombs = (
            [bool(t) for t in pdf[self.tombstone_col].tolist()]
            if self.tombstone_col else None
        )
        if tombs is None or not any(tombs):
            # Fast path (every record an upsert — the overwhelmingly
            # common shape): each row's old payload is the previous
            # row's new payload, i.e. a shift-by-one with the carried
            # state in slot 0. Column-wise list slicing instead of a
            # per-row Python loop — measured ~3x on the throughput
            # smoke (tools/stream_throughput.py, ktable_latest_tws).
            n = len(seqs)
            cols: dict[str, list] = {}
            for i, k in enumerate(self.keys):
                cols[k] = [key[i]] * n
            cols["action"] = ["upsert"] * n
            cols["old_present"] = [cur is not None] + [True] * (n - 1)
            for j, c in enumerate(self.payload):
                cols[f"old_{c}"] = [cur[j] if cur is not None else None] + pay[j][:-1]
                cols[f"new_{c}"] = pay[j]
            cols[self.seq_col] = seqs
            self.state.update(tuple(p[-1] for p in pay))
            yield pd.DataFrame(cols, columns=self.out_columns)
            return
        nulls = (None,) * len(self.payload)
        out: list[tuple] = []
        for i, seq in enumerate(seqs):
            old_present = cur is not None
            old = cur if old_present else nulls
            if tombs[i]:
                if old_present:  # delete of absent key: suppressed
                    out.append(key + ("delete", True) + old + nulls + (seq,))
                    cur = None
            else:
                new = tuple(p[i] for p in pay)
                out.append(key + ("upsert", old_present) + old + new + (seq,))
                cur = new
        if cur is None:
            self.state.clear()
        else:
            self.state.update(cur)
        if out:
            yield pd.DataFrame(out, columns=self.out_columns)

    def close(self) -> None:
        pass


def _ktable_plan(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    payload: list[str],
    tombstone_col: str | None,
) -> tuple[_LatestPerKey, StructType]:
    """Shared processor + output schema for the stream and batch paths."""
    in_schema = df.schema
    state_schema = StructType(
        [StructField(c, in_schema[c].dataType, True) for c in payload]
    )
    key_fields = [StructField(k, in_schema[k].dataType, True) for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("action", StringType(), False),
            StructField("old_present", BooleanType(), False),
        ]
        + [StructField(f"old_{c}", in_schema[c].dataType, True) for c in payload]
        + [StructField(f"new_{c}", in_schema[c].dataType, True) for c in payload]
        + [StructField(seq_col, in_schema[seq_col].dataType, True)]
    )
    proc = _LatestPerKey(
        keys, seq_col, payload, tombstone_col, state_schema,
        [f.name for f in out_schema.fields],
    )
    return proc, out_schema


def ktable_changelog_stream(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    payload: list[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Incremental latest-per-key view over a streaming changelog.

    df: streaming DataFrame of raw changelog records (key cols, payload
    cols, a monotonic seq col, optionally a boolean tombstone col).
    Returns the derived changelog (KTable.toStream): one row per input
    update with columns keys..., action ('upsert'|'delete'),
    old_present (did the key hold a value before this update — lets
    consumers distinguish a first insert from an update whose old
    payload happens to be all-null), old_<payload>..., new_<payload>...,
    and the originating seq (for downstream ordering, e.g. the FK join).
    """
    _require_rocksdb(df.sparkSession)
    # project to exactly the consumed columns BEFORE the keyed shuffle:
    # every extra column rides the exchange AND the JVM->Arrow->pandas
    # per-key chunking, the dominant cost of the TWS path (see SCALE.md)
    needed = list(dict.fromkeys(
        keys + [seq_col] + payload + ([tombstone_col] if tombstone_col else [])
    ))
    df = df.select(*needed)
    proc, out_schema = _ktable_plan(df, keys, seq_col, payload, tombstone_col)
    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def ktable_changelog_batch(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    payload: list[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Same state machine over a BATCH changelog frame via grouped
    replay (applyInPandas; no TWS/protobuf dependency) — emits the
    identical changelog rows. See streaming/replay.py for when/why."""
    from kafka_streams_app_spark.streaming.replay import grouped_replay

    proc, out_schema = _ktable_plan(df, keys, seq_col, payload, tombstone_col)
    return grouped_replay(df, keys, proc, out_schema)
