"""Semantic pins for operators/analytics.py (rolling stats, z-score
anomalies, exact discrete quantiles)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from kafka_streams_app_spark.operators import analytics


@pytest.fixture(scope="module")
def spark():
    from kafka_streams_app_spark.engine import get_spark

    return get_spark(shuffle_partitions=4)


def test_rolling_stats_frame_contents(spark):
    rows = [("u", i, float(i)) for i in range(1, 6)]  # values 1..5
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    out = {
        r["seq"]: (r["roll_n"], r["roll_avg"])
        for r in analytics.rolling_stats(df, "k", ["seq"], "v", n=3).collect()
    }
    # trailing-3 inclusive: seq=1 -> [1]; seq=3 -> [1,2,3]; seq=5 -> [3,4,5]
    assert out[1] == (1, 1.0)
    assert out[2] == (2, 1.5)
    assert out[3] == (3, 2.0)
    assert out[5] == (3, 4.0)


def test_rolling_stats_partitions_do_not_leak(spark):
    rows = [("a", 1, 10.0), ("b", 2, 99.0), ("a", 3, 20.0)]
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    out = {
        (r["k"], r["seq"]): r["roll_avg"]
        for r in analytics.rolling_stats(df, "k", ["seq"], "v", n=10).collect()
    }
    assert out[("a", 3)] == 15.0  # b's 99 never enters a's frame
    assert out[("b", 2)] == 99.0


def test_zscore_flags_outlier_and_skips_constant_key(spark):
    rows = (
        [("t", i, 10.0) for i in range(20)]
        + [("t", 99, 30.0)]
        + [("c", i, 5.0) for i in range(5)]  # zero variance -> no output
    )
    df = spark.createDataFrame(rows, "k string, id int, v double")
    out = analytics.zscore_anomalies(df, "k", "id", "v", z=3.0).collect()
    assert [r["id"] for r in out] == [99]
    r = out[0]
    # population moments: mean = (20*10+30)/21, var = s2/n - mean^2
    n, s1, s2 = 21, 20 * 10.0 + 30.0, 20 * 100.0 + 900.0
    mean = s1 / n
    var = s2 / n - mean * mean
    assert math.isclose(r["zscore"], (30.0 - mean) / math.sqrt(var))


def test_group_quantiles_disc_exact_indices(spark):
    rows = [("k", i, float(v)) for i, v in enumerate([40, 10, 30, 20])]
    df = spark.createDataFrame(rows, "k string, id int, v double")
    out = {
        r["p"]: r["q_value"]
        for r in analytics.group_quantiles_disc(
            df, "k", "v", "id", [0.0, 0.5, 1.0]
        ).collect()
    }
    # sorted values [10,20,30,40], n-1=3: idx 0 / floor(1.5)=1 / 3
    assert out == {0.0: 10.0, 0.5: 20.0, 1.0: 40.0}


def test_group_quantiles_disc_tiebreak_total_order(spark):
    # duplicate values: the picked VALUE is deterministic regardless of
    # which duplicate the tiebreaker ranks first
    rows = [("k", i, 7.0) for i in range(4)] + [("k", 9, 1.0)]
    df = spark.createDataFrame(rows, "k string, id int, v double")
    out = {
        r["p"]: r["q_value"]
        for r in analytics.group_quantiles_disc(df, "k", "v", "id", [0.5]).collect()
    }
    assert out == {0.5: 7.0}


# --- executed-plan hygiene (same contract as test_plan_hygiene_r6) ---


def _events(spark):
    from kafka_streams_app_spark.sources.catalog import load_table

    return load_table(spark, "/root/testdata/sf0.001", "events")


def test_rolling_stats_single_exchange_no_python(spark):
    from kafka_streams_app_spark.plans import plan_report

    out = analytics.rolling_stats(
        _events(spark), "user_id", ["ts", "event_id"], "value", n=10
    )
    r = plan_report(out)
    assert r["exchanges"] == 1  # the key shuffle; frame evals in-partition
    assert r["python_evals"] == 0 and r["rowwise_python"] == 0


def test_zscore_broadcasts_stats_fact_side_never_shuffled(spark):
    from kafka_streams_app_spark.plans import plan_report

    out = analytics.zscore_anomalies(
        _events(spark), "event_type", "event_id", "value", z=2.5
    )
    r = plan_report(out)
    assert r["broadcast_joins"] == 1 and r["shuffle_joins"] == 0
    # exchanges belong to the stats aggregate only, never the fact scan
    assert r["exchanges"] <= 2
    assert r["python_evals"] == 0 and r["rowwise_python"] == 0


def test_group_quantiles_single_window_exchange(spark):
    from kafka_streams_app_spark.plans import plan_report

    out = analytics.group_quantiles_disc(
        _events(spark), "event_type", "value", "event_id", [0.5, 0.9]
    )
    r = plan_report(out)
    assert r["exchanges"] == 1  # rank + count share one window exchange
    assert r["python_evals"] == 0 and r["rowwise_python"] == 0


# --- windowed distinct-count + top-n heavy hitters (r11 continuation) -------

def _events_fixture(spark):
    """Two 60 s windows of 'click' + one of 'view'; user 7 repeats
    within a window (distinct must collapse it, top-n must count it)."""
    rows = [
        # window [0, 60): click users 7,7,8 -> distinct 2; view user 9
        ("2024-01-01 00:00:05", "click", 7),
        ("2024-01-01 00:00:10", "click", 7),
        ("2024-01-01 00:00:20", "click", 8),
        ("2024-01-01 00:00:30", "view", 9),
        # window [60, 120): click users 7,10 -> distinct 2
        ("2024-01-01 00:01:05", "click", 7),
        ("2024-01-01 00:01:50", "click", 10),
    ]
    return spark.createDataFrame(
        rows, "ts_s string, event_type string, user_id long"
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "user_id")


def test_windowed_distinct_count_exact(spark):
    from kafka_streams_app_spark.operators.aggregations import (
        windowed_distinct_count,
    )

    ev = _events_fixture(spark)
    out = {
        (r["window_start_s"], r["event_type"]): r["n_distinct"]
        for r in windowed_distinct_count(
            ev, "ts", ["event_type"], "user_id", 60
        ).collect()
    }
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    assert out == {
        (base, "click"): 2,
        (base, "view"): 1,
        (base + 60, "click"): 2,
    }


def test_windowed_distinct_count_approx_dial_runs(spark):
    """The HLL dial returns a plausible cardinality (no bit contract,
    so only sanity-bounded: exact=2 per click window, rsd=0.05 keeps
    tiny sets exact in practice)."""
    from kafka_streams_app_spark.operators.aggregations import (
        windowed_distinct_count,
    )

    ev = _events_fixture(spark)
    out = windowed_distinct_count(
        ev, "ts", ["event_type"], "user_id", 60, approx=True
    ).collect()
    assert {r["n_distinct"] for r in out} <= {1, 2, 3}
    assert len(out) == 3


def test_windowed_topn_counts_and_tiebreak(spark):
    """User 7 (2 hits) ranks above 8/9/10 (1 hit each); the 1-hit tie
    resolves by the STRING order of the value ('10' < '8' < '9'
    lexicographically) — pinned so both engines cut identically."""
    from kafka_streams_app_spark.operators.aggregations import (
        windowed_topn_values,
    )

    ev = _events_fixture(spark)
    out = sorted(
        (r["event_type"], r["rank"], r["value"], r["cnt"])
        for r in windowed_topn_values(
            ev, "ts", ["event_type"], "user_id", 3600, n=3
        ).collect()
    )
    assert out == [
        ("click", 1, 7, 3),
        ("click", 2, 10, 1),
        ("click", 3, 8, 1),
        ("view", 1, 9, 1),
    ]


# --- assemble_sessions (r11 continuation) ------------------------------------

def test_assemble_sessions_order_merge_and_cap(spark):
    """Events 2s apart with gap 2 merge (inclusive bound); a 3s gap
    splits; the sequence is (second, event)-ordered with same-second
    ties broken by the event string; max_events truncates the emitted
    sequence but n_events reports the full count."""
    from kafka_streams_app_spark.operators.aggregations import assemble_sessions

    rows = [
        ("2024-01-01 00:00:00", "u", "b"),
        ("2024-01-01 00:00:00", "u", "a"),   # same second: 'a' sorts first
        ("2024-01-01 00:00:02", "u", "c"),   # +2s with gap 2 -> merges
        ("2024-01-01 00:00:05", "u", "d"),   # +3s -> NEW session
        ("2024-01-01 00:00:00", "v", "x"),
    ]
    df = spark.createDataFrame(
        rows, "ts_s string, user string, ev string"
    ).select(F.to_timestamp("ts_s").alias("ts"), "user", "ev")
    out = {
        (r["user"], r["session_start_s"]): (r["n_events"], r["sequence"])
        for r in assemble_sessions(df, "ts", ["user"], 2, "ev").collect()
    }
    base = 1704067200
    assert out == {
        ("u", base): (3, "a>b>c"),
        ("u", base + 5): (1, "d"),
        ("v", base): (1, "x"),
    }
    capped = {
        (r["user"], r["session_start_s"]): (r["n_events"], r["sequence"])
        for r in assemble_sessions(
            df, "ts", ["user"], 2, "ev", max_events=2
        ).collect()
    }
    assert capped[("u", base)] == (3, "a>b")  # full count, capped sequence


# --- funnel_conversion (r11 continuation) ------------------------------------

def test_funnel_first_occurrence_and_horizon(spark):
    """User u1 converts all 3 steps in order; u2's click precedes the
    first view (no re-anchoring -> stops at step 1); u3's purchase
    falls outside the horizon of the FIRST view even though a later
    view would qualify it (first-occurrence anchoring pinned)."""
    from kafka_streams_app_spark.operators.analytics import funnel_conversion

    rows = [
        # u1: clean conversion
        ("2024-01-01 00:00:00", 1, "view"),
        ("2024-01-01 01:00:00", 1, "click"),
        ("2024-01-01 02:00:00", 1, "purchase"),
        # u2: click BEFORE the first view -> not counted at step 2
        ("2024-01-01 01:00:00", 2, "click"),
        ("2024-01-01 02:00:00", 2, "view"),
        # u3: view at t0, click quick, purchase 2 days later (outside
        # horizon of the first view); second view next day must NOT
        # re-anchor
        ("2024-01-01 00:00:00", 3, "view"),
        ("2024-01-01 00:10:00", 3, "click"),
        ("2024-01-02 00:00:00", 3, "view"),
        ("2024-01-03 01:00:00", 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "ts_s string, user_id long, event_type string"
    ).select(F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type")
    out = {
        (r["step"], r["step_name"]): r["n_keys"]
        for r in funnel_conversion(
            df, "user_id", "ts", "event_type",
            ["view", "click", "purchase"], horizon_s=86400,
        ).collect()
    }
    assert out == {(1, "view"): 3, (2, "click"): 2, (3, "purchase"): 1}


def test_funnel_no_horizon_and_same_ts(spark):
    """Without a horizon the late purchase converts; a step event at
    EXACTLY the previous step's timestamp qualifies (>= bound)."""
    from kafka_streams_app_spark.operators.analytics import funnel_conversion

    rows = [
        ("2024-01-01 00:00:00", 3, "view"),
        ("2024-01-01 00:00:00", 3, "click"),   # same instant as the view
        ("2024-01-09 00:00:00", 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "ts_s string, user_id long, event_type string"
    ).select(F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type")
    out = {
        r["step"]: r["n_keys"]
        for r in funnel_conversion(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}


# --- cohort_retention (r11 continuation) -------------------------------------

def test_cohort_retention_matrix(spark):
    """Two cohorts: u1/u2 first-active in week 0 (u1 returns in weeks 1
    and 3, u2 never), u3 first-active in week 1 (returns week 2).
    age-0 cells equal the cohort sizes; repeat events inside one week
    count once."""
    from kafka_streams_app_spark.operators.analytics import cohort_retention

    wk = 604800
    base = 1704067200 - (1704067200 % wk)  # week-aligned anchor
    rows = []
    def ev(u, week, offset=0):
        rows.append((u, base + week * wk + offset))
    ev(1, 0); ev(1, 0, 60)          # duplicate within the week
    ev(1, 1); ev(1, 3)
    ev(2, 0)
    ev(3, 1); ev(3, 2)
    df = spark.createDataFrame(rows, "user_id long, es long").select(
        "user_id", F.timestamp_seconds(F.col("es")).alias("ts")
    )
    out = {
        (r["cohort_start_s"], r["age"]): r["n_active"]
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert out == {
        (base, 0): 2, (base, 1): 1, (base, 3): 1,
        (base + wk, 0): 1, (base + wk, 1): 1,
    }


def test_rolling_time_stats_frame_contents(spark):
    """RANGE frame: at each event the frame holds exactly the key's
    rows within (t - horizon, t] — including same-second PEERS that
    sort after the current row — and excludes anything older."""
    from datetime import datetime, timezone

    from kafka_streams_app_spark.operators.analytics import rolling_time_stats

    def ts(s):
        return datetime.fromtimestamp(1_700_000_000 + s, tz=timezone.utc).replace(tzinfo=None)

    rows = [
        ("u", ts(0), 1, 10.0),
        ("u", ts(100), 2, 20.0),
        ("u", ts(100), 3, 30.0),   # same-second peer of event 2
        ("u", ts(350), 4, 40.0),   # 0 and the 100s pair out of 300s? 350-299=51 -> only itself+... 100 < 51? no: 100 >= 51 -> peers in
        ("u", ts(700), 5, 50.0),   # everything else aged out
        ("v", ts(100), 6, 99.0),   # other key: isolated
    ]
    out = {
        r["event_id"]: (r["win_n"], r["win_sum"])
        for r in rolling_time_stats(
            spark.createDataFrame(rows, "k string, ts timestamp, event_id long, value double"),
            "k", "ts", "value", horizon_s=300, tiebreak="event_id",
        ).collect()
    }
    assert out[1] == (1, 10.0)
    # events 2 and 3 are peers: both see {1, 2, 3}
    assert out[2] == (3, 60.0) and out[3] == (3, 60.0)
    # event 4 at 350: frame (51, 350] holds {2, 3, 4}, not event 1
    assert out[4] == (3, 90.0)
    assert out[5] == (1, 50.0)
    assert out[6] == (1, 99.0)


def test_rolling_time_bucketed_equals_plain_on_hot_key(spark):
    """The overlap-and-discard bucketed form equals the plain RANGE
    frame row for row on a single HOT key spanning many buckets —
    including rows whose frames reach across bucket boundaries — at
    several bucket sizes down to the bucket_s == horizon_s floor."""
    from datetime import datetime, timezone

    from kafka_streams_app_spark.operators.analytics import (
        rolling_time_stats,
        rolling_time_stats_bucketed,
    )

    def ts(s):
        return datetime.fromtimestamp(1_700_000_000 + s, tz=timezone.utc).replace(tzinfo=None)

    # hot key: 300 events over 3000s (boundary-dense for bucket_s=300)
    rows = [("hot", ts(i * 10 + (i % 3)), i, float(i % 17)) for i in range(300)]
    rows += [("cold", ts(5), 999, 1.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, event_id long, value double")
    plain = sorted(
        tuple(r)
        for r in rolling_time_stats(
            df, "k", "ts", "value", horizon_s=100, tiebreak="event_id"
        ).collect()
    )
    for bucket_s in (100, 250, 1600):
        bucketed = sorted(
            tuple(r)
            for r in rolling_time_stats_bucketed(
                df, "k", "ts", "value", horizon_s=100,
                tiebreak="event_id", bucket_s=bucket_s,
            ).collect()
        )
        assert bucketed == plain, f"bucket_s={bucket_s}"
    import pytest

    with pytest.raises(ValueError):
        rolling_time_stats_bucketed(
            df, "k", "ts", "value", horizon_s=100,
            tiebreak="event_id", bucket_s=99,
        )
