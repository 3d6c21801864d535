"""Randomized property pins: bulk seeded-random cases (hundreds of
scenarios in ONE Spark evaluation) cross-checked against straightforward
Python reference implementations. Catches boundary conventions that
hand-picked fixtures miss (the session-gap bug class found earlier this
round)."""

from __future__ import annotations

import bisect
import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from kafka_streams_app_spark.operators import aggregations as agg
from kafka_streams_app_spark.operators import joins

T0 = datetime(2024, 5, 3, 9, 30, 0, tzinfo=timezone.utc)
GAP_S = 10


def sessions_reference(offsets: list[int], gap: int) -> list[tuple[int, int]]:
    """Inclusive-gap sessions (merge iff delta <= gap): (start, count)."""
    out: list[tuple[int, int]] = []
    for t in sorted(offsets):
        if out and t - last <= gap:  # noqa: F821 - bound below
            start, cnt = out[-1]
            out[-1] = (start, cnt + 1)
        else:
            out.append((t, 1))
        last = t  # noqa: F841
    return out


def test_session_windows_random_cases(spark):
    rng = random.Random(7)
    rows, expected = [], set()
    for case in range(200):
        n = rng.randint(1, 12)
        # integer offsets with deliberate exact-gap collisions
        offsets = sorted(rng.sample(range(0, 120), n))
        if rng.random() < 0.5 and len(offsets) >= 2:
            offsets[-1] = offsets[-2] + GAP_S  # force the boundary case
        key = f"c{case}"
        rows += [(key, T0 + timedelta(seconds=o)) for o in offsets]
        for start, cnt in sessions_reference(offsets, GAP_S):
            expected.add((key, int(T0.timestamp()) + start, cnt))
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    got = {
        (r["key"], r["session_start_s"], r["cnt"])
        for r in agg.session_count(df, "ts", ["key"], GAP_S).collect()
    }
    assert got == expected


def asof_reference(l_ts: list[int], r_rows: list[tuple[int, int]]) -> list[int | None]:
    """For each left ts, the value of the latest right row with
    r.ts <= l.ts (inclusive), else None."""
    r_sorted = sorted(r_rows)
    r_times = [t for t, _ in r_sorted]
    out = []
    for t in l_ts:
        i = bisect.bisect_right(r_times, t)
        out.append(r_sorted[i - 1][1] if i else None)
    return out


def test_asof_join_random_cases(spark):
    rng = random.Random(13)
    l_rows, r_rows, expected = [], [], set()
    for case in range(150):
        key = f"c{case}"
        lts = sorted(rng.sample(range(0, 200), rng.randint(1, 6)))
        rts = [(t, rng.randint(1, 999)) for t in rng.sample(range(0, 200), rng.randint(0, 6))]
        if rng.random() < 0.5 and lts and rts:
            rts[0] = (lts[0], rts[0][1])  # force exact ts equality
        for i, t in enumerate(lts):
            l_rows.append((key, i, T0 + timedelta(seconds=t)))
        for t, v in rts:
            r_rows.append((key, T0 + timedelta(seconds=t), v))
        for i, v in enumerate(asof_reference(lts, rts)):
            expected.add((key, i, v))
    left = spark.createDataFrame(l_rows, "key string, l_id int, ts timestamp")
    right = spark.createDataFrame(r_rows, "key string, ts timestamp, rv int")
    j = joins.asof_join(left, right, "key", "ts", "ts", ["rv"])
    got = {(r["key"], r["l_id"], r["rv"]) for r in j.collect()}
    assert got == expected
