"""Incremental KTable (latest-per-key changelog) pins — M4 part 1.

Replays the reference's table-changelog sequences
(TopologiesTest.scala:219-239 piping updates and tombstones) through
ktable_changelog_stream and asserts the emitted changelog rows.
"""

from __future__ import annotations

from kafka_streams_app_spark.streaming.harness import MicroBatchReplay
from kafka_streams_app_spark.streaming.ktable import ktable_changelog_stream

SCHEMA = "key string, merchant string, name string, is_delete boolean, seq long"


def _replay(spark):
    return MicroBatchReplay(
        spark, SCHEMA,
        lambda src: ktable_changelog_stream(
            src, ["key"], "seq", ["merchant", "name"], "is_delete"
        ),
        "update",
    )


def test_ktable_changelog_lifecycle(spark):
    with _replay(spark) as r:
        # first insert: upsert with old_present=False
        r.pipe([("3 bands", "adidas", "3 bands", False, 0)])
        assert [tuple(x) for x in r.drain()] == [
            ("3 bands", "upsert", False, None, None, "adidas", "3 bands", 0)
        ]
        # update to a null-FK value: old side carries the prior value
        r.pipe([("3 bands", None, "3 bands", False, 1)])
        assert [tuple(x) for x in r.drain()] == [
            ("3 bands", "upsert", True, "adidas", "3 bands", None, "3 bands", 1)
        ]
        # tombstone: delete carrying the retracted value
        r.pipe([("3 bands", None, None, True, 2)])
        assert [tuple(x) for x in r.drain()] == [
            ("3 bands", "delete", True, None, "3 bands", None, None, 2)
        ]
        # delete of an absent key: suppressed (Kafka null->null)
        r.pipe([("3 bands", None, None, True, 3)])
        assert r.drain() == []


def test_ktable_changelog_in_batch_ordering(spark):
    """Two updates to one key inside a single micro-batch emit two
    changelog rows in seq order (commit-interval-0 semantics); an
    unrelated key in the same batch emits independently."""
    with _replay(spark) as r:
        r.pipe([
            ("a", "m1", "x", False, 4),
            ("a", "m2", "x", False, 5),
            ("b", "m3", "y", False, 6),
        ])
        rows = {tuple(x) for x in r.drain()}
        assert rows == {
            ("a", "upsert", False, None, None, "m1", "x", 4),
            ("a", "upsert", True, "m1", "x", "m2", "x", 5),
            ("b", "upsert", False, None, None, "m3", "y", 6),
        }
