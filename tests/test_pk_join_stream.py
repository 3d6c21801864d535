"""Incremental KTable-KTable PK join pins (emission tuples compared
without the trailing _seq order tag) — the reference's tombstone
sequence (TopologiesTest.scala:219-239) replayed per micro-batch with
asserted changelog emissions, plus the inner-mode retraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_app_spark.streaming.harness import MicroBatchReplay
from kafka_streams_app_spark.streaming.pk_join import pk_join_stream

# one physical source carrying both changelogs, split by `side`
SCHEMA = ("key string, side string, merchant string, name string, rank int, "
          "is_delete boolean, seq long")


def build(how: str):
    def _build(src):
        left = src.filter(F.col("side") == "l").select(
            "key", "merchant", "name", "is_delete", "seq"
        )
        right = src.filter(F.col("side") == "r").select(
            "key", "rank", "is_delete", "seq"
        )
        return pk_join_stream(
            left, right,
            key="key", left_payload=["merchant", "name"], right_payload=["rank"],
            left_tombstone="is_delete", right_tombstone="is_delete", how=how,
        )
    return _build


def l_row(key, merchant, name, seq, delete=False):
    return (key, "l", merchant, name, None, delete, seq)


def r_row(key, rank, seq, delete=False):
    return (key, "r", None, None, rank, delete, seq)


def test_ktable_ktable_left_join_incremental(spark):
    """TopologiesTest.scala:219-239 piped batch-by-batch."""
    with MicroBatchReplay(spark, SCHEMA, build("left"), "update") as p:
        p.pipe([r_row("key1", 3, 0)])
        assert p.drain() == []                       # left absent: nothing
        p.pipe([l_row("key1", "fk1", "pk1", 1)])
        assert [tuple(x)[:-1] for x in p.drain()] == [
            ("key1", "upsert", "fk1", "pk1", 3)]
        p.pipe([l_row("key1", "fk1", "pk1", 2)])     # refresh emits again
        assert [tuple(x)[:-1] for x in p.drain()] == [
            ("key1", "upsert", "fk1", "pk1", 3)]
        p.pipe([r_row("key1", None, 3, delete=True)])
        # right tombstone under LEFT join: downgrade, not delete
        assert [tuple(x)[:-1] for x in p.drain()] == [
            ("key1", "upsert", "fk1", "pk1", None)]
        p.pipe([r_row("key2", None, 4, delete=True)])
        assert p.drain() == []                       # delete of absent: no-op


def test_ktable_ktable_inner_join_incremental(spark):
    with MicroBatchReplay(spark, SCHEMA, build("inner"), "update") as p:
        p.pipe([l_row("k", "m", "p", 0)])
        assert p.drain() == []                       # inner: no right yet
        p.pipe([r_row("k", 7, 1)])
        assert [tuple(x)[:-1] for x in p.drain()] == [("k", "upsert", "m", "p", 7)]
        p.pipe([r_row("k", None, 2, delete=True)])
        assert [tuple(x)[:-1] for x in p.drain()] == [
            ("k", "delete", None, None, None)]       # exactly ONE retraction
        p.pipe([l_row("k", None, None, 3, delete=True)])
        assert p.drain() == []                       # join row already gone
