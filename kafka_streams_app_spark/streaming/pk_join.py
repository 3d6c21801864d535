"""Incremental KTable-KTable primary-key join (SURVEY §2.5 J5/J6,
incremental changelog semantics).

Reference: productTable.leftJoin(merchantTable, joiner).toStream
(/root/reference/src/test/scala/com/ayoubom/kafka/TopologiesTest.scala:437-452,
 pinned by the tombstone test at :219-239). Both tables share the
primary key, so unlike the FK join no re-subscription routing is
needed: union-tag the two raw changelogs, group by key, and keep
(left value, right value) state per key. Each input record emits at
most one join-changelog row:

- left upsert:  emit (k, upsert, l, r?) — for inner only if r present
- left delete:  emit (k, delete) if a join row existed
- right upsert: emit (k, upsert, l, r) if l present (left join: always
  when l present; inner: same — no l, no row)
- right delete: inner -> delete if row existed; left -> downgrade to
  (k, upsert, l, null) (the reference's tombstone test end state:
  (key1, null) — TopologiesTest.scala:234-238)

A delete on an absent side is suppressed (Kafka null->null).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import StringType, StructField, StructType

from kafka_streams_app_spark.streaming.ktable import _require_rocksdb


class _PKJoinProcessor(StatefulProcessor):
    def __init__(
        self,
        left_cols: list[str],
        right_cols: list[str],
        left_schema: StructType,
        right_schema: StructType,
        out_columns: list[str],
        how: str,
    ) -> None:
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.left_schema = left_schema
        self.right_schema = right_schema
        self.out_columns = out_columns
        self.how = how

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.left = handle.getValueState("left", self.left_schema)
        self.right = handle.getValueState("right", self.right_schema)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows)).sort_values("seq", kind="stable")
        l_present = self.left.exists()
        l_val: tuple = tuple(self.left.get()) if l_present else ()
        r_present = self.right.exists()
        r_val: tuple = tuple(self.right.get()) if r_present else ()
        l_nulls = (None,) * len(self.left_cols)
        r_nulls = (None,) * len(self.right_cols)
        left_join = self.how == "left"
        out: list[tuple] = []

        def joined_exists() -> bool:
            return l_present and (left_join or r_present)

        for rec in pdf.to_dict("records"):
            om = (rec["seq"],)  # emission order tag (end-state reduction)
            if rec["side"] == "l":
                if rec["is_delete"]:
                    if l_present:
                        had = joined_exists()
                        l_present, l_val = False, ()
                        if had:
                            out.append(key + ("delete",) + l_nulls + r_nulls + om)
                else:
                    l_present = True
                    l_val = tuple(rec[c] for c in self.left_cols)
                    if left_join or r_present:
                        out.append(
                            key + ("upsert",) + l_val
                            + (r_val if r_present else r_nulls) + om
                        )
            else:  # right side
                if rec["is_delete"]:
                    if r_present:
                        r_present, r_val = False, ()
                        if l_present:
                            out.append(
                                (key + ("upsert",) + l_val + r_nulls if left_join
                                 else key + ("delete",) + l_nulls + r_nulls) + om
                            )
                else:
                    r_present = True
                    r_val = tuple(rec[c] for c in self.right_cols)
                    if l_present:
                        out.append(key + ("upsert",) + l_val + r_val + om)
        for state, present, val in (
            (self.left, l_present, l_val), (self.right, r_present, r_val)
        ):
            if present:
                state.update(val)
            else:
                state.clear()
        if out:
            # dtype=object: pandas would infer mixed None/int64 columns
            # as float64, rounding values above 2^53 (see ktable.py)
            yield pd.DataFrame(out, columns=self.out_columns, dtype=object)

    def close(self) -> None:
        pass


def _pk_join_plan(
    left_raw: DataFrame,
    right_raw: DataFrame,
    *,
    key: str,
    left_payload: list[str],
    right_payload: list[str],
    seq: str,
    left_tombstone: str | None,
    right_tombstone: str | None,
    how: str,
) -> tuple[DataFrame, _PKJoinProcessor, StructType]:
    """Shared union-tag input + processor + output schema for the
    stream (TWS) and batch (grouped replay) paths."""
    l_schema, r_schema = left_raw.schema, right_raw.schema

    def tag(df: DataFrame, side: str, payload: list[str], other: list[str],
            other_schema, tombstone: str | None) -> DataFrame:
        # Kafka Streams ignores null-key records in table-table joins;
        # dropping them here also keeps the TWS group-key batch int64-
        # exact (see ktable.py null-key note)
        df = df.na.drop(subset=[key])
        return df.select(
            F.col(key),
            F.lit(side).alias("side"),
            *[F.col(c) for c in payload],
            *[F.lit(None).cast(other_schema[c].dataType).alias(c) for c in other],
            F.col(seq).alias("seq"),
            (F.col(tombstone) if tombstone else F.lit(False)).alias("is_delete"),
        )

    unioned = tag(left_raw, "l", left_payload, right_payload, r_schema,
                  left_tombstone).unionByName(
        tag(right_raw, "r", right_payload, left_payload, l_schema,
            right_tombstone).select(
            key, "side", *left_payload, *right_payload, "seq", "is_delete"
        )
    )
    left_state = StructType(
        [StructField(c, l_schema[c].dataType, True) for c in left_payload]
    )
    right_state = StructType(
        [StructField(c, r_schema[c].dataType, True) for c in right_payload]
    )
    out_schema = StructType(
        [StructField(key, l_schema[key].dataType, True),
         StructField("action", StringType(), False)]
        + [StructField(c, l_schema[c].dataType, True) for c in left_payload]
        + [StructField(c, r_schema[c].dataType, True) for c in right_payload]
        + [StructField("_seq", l_schema[seq].dataType, True)]
    )
    proc = _PKJoinProcessor(
        left_payload, right_payload, left_state, right_state,
        [f.name for f in out_schema.fields], how,
    )
    return unioned, proc, out_schema


def pk_join_stream(
    left_raw: DataFrame,
    right_raw: DataFrame,
    *,
    key: str,
    left_payload: list[str],
    right_payload: list[str],
    seq: str = "seq",
    left_tombstone: str | None = None,
    right_tombstone: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two streaming table changelogs on their shared primary key.

    Inputs are RAW changelog streams (key, payload cols, seq, optional
    boolean tombstone col). Output: join changelog (key, action,
    left payload, right payload) — exactly the rows the reference's
    output-join topic carries.
    """
    _require_rocksdb(left_raw.sparkSession)
    unioned, proc, out_schema = _pk_join_plan(
        left_raw, right_raw, key=key, left_payload=left_payload,
        right_payload=right_payload, seq=seq, left_tombstone=left_tombstone,
        right_tombstone=right_tombstone, how=how,
    )
    return unioned.groupBy(key).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def pk_join_batch(
    left_raw: DataFrame,
    right_raw: DataFrame,
    *,
    key: str,
    left_payload: list[str],
    right_payload: list[str],
    seq: str = "seq",
    left_tombstone: str | None = None,
    right_tombstone: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Same PK-join state machine over BATCH changelog frames via
    grouped replay (applyInPandas; no TWS/protobuf dependency)."""
    from kafka_streams_app_spark.streaming.replay import grouped_replay

    unioned, proc, out_schema = _pk_join_plan(
        left_raw, right_raw, key=key, left_payload=left_payload,
        right_payload=right_payload, seq=seq, left_tombstone=left_tombstone,
        right_tombstone=right_tombstone, how=how,
    )
    return grouped_replay(unioned, [key], proc, out_schema)
