"""Incremental KTable-KTable foreign-key join with re-subscription
(SURVEY.md §7.1 M4 — the hardest operator).

Reference: leftTable.join(rightTable, fkExtractor, joiner)
(/root/reference/src/main/scala/com/ayoubom/kafka/apps/ForeignJoin.scala:37-42).
Kafka implements this with internal subscription/response topics: the
left side publishes (fk -> pk) subscriptions, partitioned BY FK so each
right-side task can answer lookups locally; an FK change re-routes the
subscription. This module mirrors that architecture Spark-first:

  left raw changelog
    -> ktable_changelog_stream (keyed by pk; emits old_fk/new_fk)   [query 1]
    -> fk_instructions (stateless flatMap: sub/unsub per FK change)
    -> union with tagged right changelog
    -> groupBy(fk) + transformWithStateInPandas                      [query 2]
       state per fk: right value + subscription map {pk -> left payload}
    -> join changelog (pk, action, left payload, right value)

The groupBy(fk) shuffle IS Kafka's subscription topic; the two chained
stateful queries are connected by an intermediate changelog directory
(Kafka's response topic) because Spark disallows two update-mode
stateful operators in one query — see FKJoinReplay.

Correct (bug-free) semantics pinned by tests/test_fk_join_stream.py,
fixing the reference's documented upstream bugs
(TopologiesTest.scala:101,117,134 comments):
- delete of a joined left row emits exactly ONE retraction (not two);
- FK change to nonexistent/null emits one retraction, no spurious row;
- inner join emits nothing for unmatched subscribes.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import StringType, StructField, StructType

from kafka_streams_app_spark.streaming.harness import MicroBatchReplay
from kafka_streams_app_spark.streaming.ktable import (
    _require_rocksdb,
    ktable_changelog_stream,
)

KIND_SUB = "sub"
KIND_UNSUB_MOVE = "unsub_move"      # FK changed: leave the old FK group
KIND_UNSUB_DELETE = "unsub_delete"  # left row deleted
KIND_RIGHT = "right"


def fk_instructions(
    left_view: DataFrame, pk: str, fk: str, payload: list[str], seq_col: str
) -> DataFrame:
    """Stateless flatMap of the left view changelog into subscription
    instructions partitioned by FK (Kafka's subscription topic records).

    One changelog row yields:
    - upsert, FK unchanged (or first insert): [sub(new_fk)]
    - upsert, FK changed: [unsub_move(old_fk), sub(new_fk)]
    - delete: [unsub_delete(old_fk)]
    `minor` orders unsub before sub at equal seq.
    """
    val_cols = [c for c in payload if c != fk]
    old_fk, new_fk = F.col(f"old_{fk}"), F.col(f"new_{fk}")
    fk_changed = F.col("old_present") & ~old_fk.eqNullSafe(new_fk)

    def instr(kind: str, fk_col, minor: int, with_payload: bool):
        return F.struct(
            fk_col.alias("fk"),
            F.lit(kind).alias("kind"),
            F.col(pk).alias("pk"),
            *[
                (F.col(f"new_{c}") if with_payload else F.lit(None).cast(
                    left_view.schema[f"new_{c}"].dataType)).alias(c)
                for c in val_cols
            ],
            F.col(seq_col).alias("seq"),
            F.lit(minor).alias("minor"),
        )

    sub = instr(KIND_SUB, new_fk, 1, True)
    unsub_move = instr(KIND_UNSUB_MOVE, old_fk, 0, False)
    unsub_delete = instr(KIND_UNSUB_DELETE, old_fk, 0, False)

    arr = (
        F.when(F.col("action") == "delete", F.array(unsub_delete))
        .when(fk_changed, F.array(unsub_move, sub))
        .otherwise(F.array(sub))
    )
    return left_view.select(F.explode(arr).alias("i")).select("i.*")


class _FKJoinProcessor(StatefulProcessor):
    """Per-FK-group state: current right value + {pk -> left payload}."""

    def __init__(
        self,
        left_cols: list[str],
        right_cols: list[str],
        sub_schema: StructType,
        right_schema: StructType,
        out_columns: list[str],
        how: str,
        pk_schema: StructType,
    ) -> None:
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.sub_schema = sub_schema
        self.right_schema = right_schema
        self.out_columns = out_columns
        self.how = how
        self.pk_schema = pk_schema

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.right = handle.getValueState("right", self.right_schema)
        self.subs = handle.getMapState("subs", self.pk_schema, self.sub_schema)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows)).sort_values(["seq", "minor"], kind="stable")
        r_present = self.right.exists()
        r_val: tuple = tuple(self.right.get()) if r_present else ()
        r_nulls = (None,) * len(self.right_cols)
        l_nulls = (None,) * len(self.left_cols)
        left_join = self.how == "left"
        # Work on a LOCAL snapshot of the subscription map: state writes
        # made earlier in this batch are not guaranteed visible to
        # MapState.iterator() within the same batch, so a same-batch
        # sub followed by a right update would miss the fan-out without
        # this overlay. State mutations are mirrored to RocksDB below.
        subs_now: dict = {k[0]: tuple(v) for k, v in self.subs.iterator()}
        out: list[tuple] = []

        def right_or_null() -> tuple:
            return r_val if r_present else r_nulls

        for rec in pdf.to_dict("records"):
            kind, pk = rec["kind"], rec["pk"]
            om = (rec["seq"], rec["minor"])  # emission order tag
            if kind == KIND_RIGHT:
                if rec["right_is_delete"]:
                    if r_present:
                        r_present, r_val = False, ()
                        for spk, spay in subs_now.items():
                            out.append(
                                ((spk, "upsert") + spay + r_nulls if left_join
                                 else (spk, "delete") + l_nulls + r_nulls) + om
                            )
                else:
                    r_present = True
                    r_val = tuple(rec[c] for c in self.right_cols)
                    for spk, spay in subs_now.items():
                        out.append((spk, "upsert") + spay + r_val + om)
            elif kind == KIND_SUB:
                pay = tuple(rec[c] for c in self.left_cols)
                subs_now[pk] = pay
                self.subs.updateValue((pk,), pay)
                if left_join:
                    out.append((pk, "upsert") + pay + right_or_null() + om)
                elif r_present:
                    out.append((pk, "upsert") + pay + r_val + om)
            else:  # unsub_move / unsub_delete
                if pk in subs_now:
                    del subs_now[pk]
                    self.subs.removeKey((pk,))
                    if left_join:
                        if kind == KIND_UNSUB_DELETE:
                            out.append((pk, "delete") + l_nulls + r_nulls + om)
                        # unsub_move: the paired sub's upsert supersedes
                    elif r_present:
                        # a join row existed for this pk iff right present
                        out.append((pk, "delete") + l_nulls + r_nulls + om)
        if r_present:
            self.right.update(r_val)
        else:
            self.right.clear()
        if out:
            # dtype=object: pandas would infer mixed None/int64 columns
            # as float64, rounding values above 2^53 (see ktable.py)
            yield pd.DataFrame(out, columns=self.out_columns, dtype=object)

    def close(self) -> None:
        pass


def _fk_join_plan(
    instructions: DataFrame,
    right_raw: DataFrame,
    *,
    right_key: str,
    right_payload: list[str],
    right_seq: str,
    right_tombstone: str | None,
    left_value_cols: list[str],
    how: str,
) -> tuple[DataFrame, _FKJoinProcessor, StructType]:
    """Shared union-tag input + processor + output schema for the
    stream (TWS) and batch (grouped replay) paths."""
    r_schema = right_raw.schema
    tagged_right = right_raw.select(
        F.col(right_key).alias("fk"),
        F.lit(KIND_RIGHT).alias("kind"),
        F.lit(None).cast(instructions.schema["pk"].dataType).alias("pk"),
        *[F.lit(None).cast(instructions.schema[c].dataType).alias(c)
          for c in left_value_cols],
        F.col(right_seq).alias("seq"),
        F.lit(2).alias("minor"),
        *[F.col(c).alias(f"r_{c}") for c in right_payload],
        (F.col(right_tombstone) if right_tombstone else F.lit(False))
        .alias("right_is_delete"),
    )
    tagged_left = instructions.select(
        "fk", "kind", "pk", *left_value_cols, "seq", "minor",
        *[F.lit(None).cast(r_schema[c].dataType).alias(f"r_{c}")
          for c in right_payload],
        F.lit(False).alias("right_is_delete"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    sub_schema = StructType(
        [StructField(c, instructions.schema[c].dataType, True)
         for c in left_value_cols]
    )
    right_state_schema = StructType(
        [StructField(c, r_schema[c].dataType, True) for c in right_payload]
    )
    pk_type = instructions.schema["pk"].dataType
    out_schema = StructType(
        [StructField("pk", pk_type, True),
         StructField("action", StringType(), False)]
        + [StructField(c, instructions.schema[c].dataType, True)
           for c in left_value_cols]
        + [StructField(f"r_{c}", r_schema[c].dataType, True)
           for c in right_payload]
        # ordering tag of the triggering instruction: lets consumers
        # reduce the changelog to an end state (latest per pk)
        + [StructField("_seq", instructions.schema["seq"].dataType, True),
           StructField("_minor", instructions.schema["minor"].dataType, True)]
    )
    proc = _FKJoinProcessor(
        left_value_cols,
        [f"r_{c}" for c in right_payload],
        sub_schema,
        right_state_schema,
        [f.name for f in out_schema.fields],
        how,
        StructType([StructField("pk", pk_type)]),
    )
    return unioned, proc, out_schema


def fk_join_changelog_stream(
    instructions: DataFrame,
    right_raw: DataFrame,
    *,
    right_key: str,
    right_payload: list[str],
    right_seq: str,
    right_tombstone: str | None,
    left_value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Query-2 builder: union(instructions, tagged right changelog)
    -> groupBy(fk) -> stateful join processor -> join changelog
    (pk, action, left value cols, right payload cols).
    """
    _require_rocksdb(instructions.sparkSession)
    unioned, proc, out_schema = _fk_join_plan(
        instructions, right_raw, right_key=right_key,
        right_payload=right_payload, right_seq=right_seq,
        right_tombstone=right_tombstone, left_value_cols=left_value_cols,
        how=how,
    )
    return unioned.groupBy("fk").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def fk_join_changelog_batch(
    instructions: DataFrame,
    right_raw: DataFrame,
    *,
    right_key: str,
    right_payload: list[str],
    right_seq: str,
    right_tombstone: str | None,
    left_value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Same FK-join state machine over BATCH changelog frames via
    grouped replay (applyInPandas; no TWS/protobuf dependency). The
    groupBy(fk) shuffle — Kafka's subscription topic — is identical;
    only the state backend (in-task memory vs RocksDB) differs."""
    from kafka_streams_app_spark.streaming.replay import grouped_replay

    unioned, proc, out_schema = _fk_join_plan(
        instructions, right_raw, right_key=right_key,
        right_payload=right_payload, right_seq=right_seq,
        right_tombstone=right_tombstone, left_value_cols=left_value_cols,
        how=how,
    )
    return grouped_replay(unioned, ["fk"], proc, out_schema)


class FKJoinReplay:
    """Two-query FK-join pipeline with TopologyTestDriver-style piping.

    Query 1 (left KTable): left staging dir -> ktable_changelog_stream
    -> parquet intermediate (the "subscription response topic").
    Query 2 (join): intermediate + right staging dir -> fk instructions
    union right -> stateful FK join -> memory sink.

    pipe_left/pipe_right append one micro-batch and drive both queries to
    quiescence, so per-pipe drain() shows exactly the join changelog the
    reference's readOutputTopic() would.
    """

    def __init__(
        self,
        spark: SparkSession,
        left_schema: str,
        right_schema: str,
        *,
        pk: str,
        fk: str,
        left_payload: list[str],
        left_tombstone: str,
        right_key: str,
        right_payload: list[str],
        right_tombstone: str,
        how: str = "inner",
    ) -> None:
        self.spark = spark
        name = f"fkjoin_{uuid.uuid4().hex[:12]}"
        self._dirs = [tempfile.mkdtemp(prefix=f"{name}_{x}_")
                      for x in ("inter", "ckpt1")]
        inter_dir, ckpt1 = self._dirs
        left_value_cols = [c for c in left_payload if c != fk]

        # query 1: left raw -> latest-per-key changelog -> intermediate dir
        self._left_replay_schema = left_schema
        self._left_staging = tempfile.mkdtemp(prefix=f"{name}_lsrc_")
        self._dirs.append(self._left_staging)
        left_src = (
            spark.readStream.schema(left_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self._left_staging)
        )
        left_view = ktable_changelog_stream(
            left_src, [pk], "seq", left_payload, left_tombstone
        )
        self.q1 = (
            left_view.writeStream.format("parquet")
            .option("path", inter_dir)
            .option("checkpointLocation", ckpt1)
            .outputMode("append")
            .start()
        )
        # parquet sink needs at least one committed batch before a reader
        # can infer anything; we pass the schema explicitly instead.
        inter_schema = StructType(left_view.schema.fields)

        # query 2: intermediate + right staging -> join changelog
        def build(right_src: DataFrame) -> DataFrame:
            inter = (
                spark.readStream.schema(inter_schema)
                .option("maxFilesPerTrigger", 1000)
                .parquet(inter_dir)
            )
            instr = fk_instructions(inter, pk, fk, left_payload, "seq")
            return fk_join_changelog_stream(
                instr,
                right_src,
                right_key=right_key,
                right_payload=right_payload,
                right_seq="seq",
                right_tombstone=right_tombstone,
                left_value_cols=left_value_cols,
                how=how,
            )

        self._right = MicroBatchReplay(spark, right_schema, build, "update")
        self.seq = 0

    def _next_seq(self) -> int:
        self.seq += 1
        return self.seq

    def pipe_left(self, rows: list[tuple]) -> None:
        """rows WITHOUT seq; seq is appended here (global pipe order)."""
        full = [r + (self._next_seq(),) for r in rows]
        df = self.spark.createDataFrame(full, self._left_replay_schema)
        df.coalesce(1).write.mode("append").parquet(self._left_staging)
        self.q1.processAllAvailable()
        self._right.query.processAllAvailable()

    def pipe_right(self, rows: list[tuple]) -> None:
        self._right.pipe([r + (self._next_seq(),) for r in rows])

    def drain(self) -> list[tuple]:
        """Join-changelog rows since last drain, ordering tag stripped."""
        return [tuple(x)[:-2] for x in self._right.drain()]

    def stop(self) -> None:
        self.q1.stop()
        self._right.stop()
        for d in self._dirs:
            shutil.rmtree(d, ignore_errors=True)

    def __enter__(self) -> FKJoinReplay:
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
