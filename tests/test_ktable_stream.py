"""Incremental KTable (latest-per-key changelog) pins — M4 part 1.

Replays the reference's table-changelog sequences
(TopologiesTest.scala:219-239 piping updates and tombstones) through
ktable_changelog_stream and asserts the emitted changelog rows.

Parametrized over both processor modes: per-logical-key ValueState
(n_buckets=None) and the bucketed MapState layout (n_buckets=4) — the
changelog contract is identical; the bucketed mode must preserve it
across micro-batches (state carry-in/out) and through tombstones.
"""

from __future__ import annotations

import pytest

from kafka_streams_app_spark.streaming.harness import MicroBatchReplay
from kafka_streams_app_spark.streaming.ktable import ktable_changelog_stream

SCHEMA = "key string, merchant string, name string, is_delete boolean, seq long"


def _replay(spark, n_buckets):
    return MicroBatchReplay(
        spark, SCHEMA,
        lambda src: ktable_changelog_stream(
            src, ["key"], "seq", ["merchant", "name"], "is_delete",
            n_buckets=n_buckets,
        ),
        "update",
    )


@pytest.mark.parametrize("n_buckets", [None, 4])
def test_ktable_changelog_lifecycle(spark, n_buckets):
    with _replay(spark, n_buckets) as r:
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


@pytest.mark.parametrize("n_buckets", [None, 4])
def test_ktable_changelog_in_batch_ordering(spark, n_buckets):
    """Two updates to one key inside a single micro-batch emit two
    changelog rows in seq order (commit-interval-0 semantics); an
    unrelated key in the same batch emits independently."""
    with _replay(spark, n_buckets) as r:
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


@pytest.mark.parametrize("n_buckets", [None, 4])
def test_ktable_upserts_across_batches_mixed_keys(spark, n_buckets):
    """All-upsert batches (the vectorized bucketed fast path) with
    several keys sharing buckets: carry-in state from a prior batch
    must populate old_* on each key's first row of the next batch."""
    with _replay(spark, n_buckets) as r:
        r.pipe([
            ("k1", "a", "p", False, 0),
            ("k2", "b", "q", False, 1),
            ("k1", "c", "p", False, 2),
        ])
        assert {tuple(x) for x in r.drain()} == {
            ("k1", "upsert", False, None, None, "a", "p", 0),
            ("k2", "upsert", False, None, None, "b", "q", 1),
            ("k1", "upsert", True, "a", "p", "c", "p", 2),
        }
        r.pipe([
            ("k2", "d", "q", False, 3),
            ("k3", "e", "r", False, 4),
        ])
        assert {tuple(x) for x in r.drain()} == {
            ("k2", "upsert", True, "b", "q", "d", "q", 3),
            ("k3", "upsert", False, None, None, "e", "r", 4),
        }
