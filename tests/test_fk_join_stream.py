"""Incremental FK-join edge-case pins (M4) — the 7 reference scenarios
replayed through the two-query streaming pipeline (FKJoinReplay),
asserting per-pipe join-changelog emissions.

The reference documents Kafka's own bugs in these scenarios
(TopologiesTest.scala:100-217 comments, InnerFKJoinTest.scala:11-24);
we pin the CORRECT behaviors (exactly one retraction, no spurious
null events) and note each fix inline.

Changelog rows are (pk, action, name, r_rank): left payload column
`name`, right payload column `rank` (the reference's ProductValue /
merchant-rank shape).
"""

from __future__ import annotations

import pytest

from kafka_streams_app_spark.streaming.fk_join import FKJoinReplay

LEFT = "pk string, fk string, name string, is_delete boolean, seq long"
RIGHT = "rk string, rank int, is_delete boolean, seq long"


def make(spark, how: str) -> FKJoinReplay:
    return FKJoinReplay(
        spark, LEFT, RIGHT,
        pk="pk", fk="fk", left_payload=["fk", "name"], left_tombstone="is_delete",
        right_key="rk", right_payload=["rank"], right_tombstone="is_delete",
        how=how,
    )


@pytest.fixture(scope="module")
def left_pipeline(spark):
    with make(spark, "left") as p:
        yield p


def test_left_join_lifecycle(spark, left_pipeline):
    """TopologiesTest.scala:100-131 (1st + 2nd bug) as one lifecycle:
    subscribe-before-right, right arrival, FK->null, delete."""
    p = left_pipeline
    # left row before its merchant exists: left join emits (pk, null)
    p.pipe_left([("3 bands", "adidas", "3 bands", False)])
    assert p.drain() == [("3 bands", "upsert", "3 bands", None)]
    # right arrives: join row updates to rank 3
    p.pipe_right([("adidas", 3, False)])
    assert p.drain() == [("3 bands", "upsert", "3 bands", 3)]
    # unrelated right key: nothing emitted
    p.pipe_right([("puma", 4, False)])
    assert p.drain() == []
    # 1st bug scenario: FK -> null. Correct: ONE upsert with null right
    # (Kafka additionally emitted a wrong null-FK event).
    p.pipe_left([("3 bands", None, "3 bands", False)])
    assert p.drain() == [("3 bands", "upsert", "3 bands", None)]
    # 2nd bug scenario: delete the left row. Correct: ONE delete
    # (Kafka emitted the deletion twice).
    p.pipe_left([("3 bands", None, None, True)])
    assert p.drain() == [("3 bands", "delete", None, None)]
    # deleting again: nothing (no resident state)
    p.pipe_left([("3 bands", None, None, True)])
    assert p.drain() == []


@pytest.fixture(scope="module")
def inner_pipeline(spark):
    with make(spark, "inner") as p:
        yield p


def test_inner_join_lifecycle(spark, inner_pipeline):
    """TopologiesTest.scala:133-217 + InnerFKJoinTest.scala:11-24 inner
    scenarios chained on distinct pks."""
    p = inner_pipeline

    # InnerFKJoinTest: right first, then null-FK left, then real FK
    p.pipe_right([("fk", 1, False)])
    assert p.drain() == []
    p.pipe_left([("pk1", None, "pk1", False)])
    assert p.drain() == []                       # null FK: no inner output
    p.pipe_left([("pk1", "fk", "pk1", False)])
    assert p.drain() == [("pk1", "upsert", "pk1", 1)]

    # "inner incoherent behavior" (:133-148): FK -> nonexistent. Correct:
    # exactly ONE retraction, identical to the FK->null transition
    # (Kafka emits a null-unset for nonexistent but nothing for null).
    p.pipe_left([("pk1", "ghost", "pk1", False)])
    assert p.drain() == [("pk1", "delete", None, None)]
    # and FK -> null from the unmatched state: nothing further to retract
    p.pipe_left([("pk1", None, "pk1", False)])
    assert p.drain() == []

    # ":165-181 INNER 2nd bug bis": matched row, then FK -> null
    p.pipe_left([("pk2", "fk", "pk2", False)])
    assert p.drain() == [("pk2", "upsert", "pk2", 1)]
    p.pipe_left([("pk2", None, "pk2", False)])
    assert p.drain() == [("pk2", "delete", None, None)]

    # ":183-199 INNER 3rd bug": left updated twice, right side for its FK
    # absent: nothing emitted either time (Kafka emitted a spurious null)
    p.pipe_left([("pk3", "nofk", "pk3", False)])
    p.pipe_left([("pk3", "nofk", "pk3", False)])
    assert p.drain() == []

    # ":201-217 INNER 4th bug": matched fk1 -> unmatched fk2: one delete
    p.pipe_left([("pk4", "fk", "pk4", False)])
    assert p.drain() == [("pk4", "upsert", "pk4", 1)]
    p.pipe_left([("pk4", "fk2", "pk4", False)])
    assert p.drain() == [("pk4", "delete", None, None)]
    # late right arrival for fk2 joins the moved subscription
    p.pipe_right([("fk2", 9, False)])
    assert p.drain() == [("pk4", "upsert", "pk4", 9)]


def test_inner_right_delete_retracts_all_subscribers(spark):
    """Right-side tombstone retracts every subscribed pk exactly once;
    re-insert re-emits (N:1 fan-out through the subscription store)."""
    with make(spark, "inner") as p:
        p.pipe_right([("m1", 7, False)])
        p.pipe_left([("a", "m1", "a", False)])
        p.pipe_left([("b", "m1", "b", False)])
        assert p.drain() == [("a", "upsert", "a", 7), ("b", "upsert", "b", 7)]
        p.pipe_right([("m1", None, True)])
        assert sorted(p.drain()) == [
            ("a", "delete", None, None), ("b", "delete", None, None),
        ]
        p.pipe_right([("m1", 8, False)])
        assert sorted(p.drain()) == [
            ("a", "upsert", "a", 8), ("b", "upsert", "b", 8),
        ]


def test_right_update_fans_out_left_mode(spark):
    """Left mode: right value update re-emits all subscribers; right
    delete downgrades them to (pk, null) instead of deleting."""
    with make(spark, "left") as p:
        p.pipe_left([("x", "m", "x", False)])
        assert p.drain() == [("x", "upsert", "x", None)]
        p.pipe_right([("m", 1, False)])
        assert p.drain() == [("x", "upsert", "x", 1)]
        p.pipe_right([("m", 2, False)])
        assert p.drain() == [("x", "upsert", "x", 2)]
        p.pipe_right([("m", None, True)])
        assert p.drain() == [("x", "upsert", "x", None)]
