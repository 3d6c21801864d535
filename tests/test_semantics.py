"""Asserted ports of the reference's 14 semantic tests (batch evaluation).

The reference tests (TopologiesTest.scala, InnerFKJoinTest.scala) pipe
timestamped records through TopologyTestDriver and println the outputs —
executable documentation with no assertions. Here each test replays the
same input sequence as a DataFrame and ASSERTS the end-state semantics
(SURVEY.md §5.2). Incremental emission-order behaviors are pinned in
tests/test_streaming.py against the streaming runtime.

Changelog convention: a tombstone (pipeInput(key, null)) is a row with
is_delete=True; `seq` is the pipe order (Kafka offset).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from kafka_streams_app_spark.operators import aggregations as agg
from kafka_streams_app_spark.operators import iq, joins, ktable, stateless

T0 = datetime(2024, 5, 3, 9, 30, 0, tzinfo=timezone.utc)  # 10s-aligned epoch


def ts(seconds: float) -> datetime:
    return T0 + timedelta(seconds=seconds)


def rows_set(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


# --- TopologiesTest.scala:26-36 "test driver" (mapValues square) ----------

def test_mapvalues_square(spark):
    df = spark.createDataFrame([("hmida", 1), ("lamba", 2)], "key string, value int")
    out = stateless.map_values(df, value=(F.col("value") * F.col("value")).cast("int"))
    assert rows_set(out, "key", "value") == {("hmida", 1), ("lamba", 4)}


# --- TopologiesTest.scala:49-73 windowed reduce + store fetchAll ----------

def test_windowed_reduce_and_fetch_all(spark):
    data = [
        ("hmida", 10, ts(0)), ("hmida", 20, ts(0)), ("hmida", 15, ts(0)),
        ("lambda", 50, ts(1)), ("hmida", 30, ts(1)),
    ]
    df = spark.createDataFrame(data, "key string, value int, ts timestamp")
    win = agg.windowed_agg(df, "ts", ["key"], 1, total=F.sum("value"))
    t0s = int(T0.timestamp())
    assert rows_set(win, "window_start_s", "key", "total") == {
        (t0s, "hmida", 45), (t0s + 1, "lambda", 50), (t0s + 1, "hmida", 30),
    }
    # store.fetchAll(baseTime-1s, baseTime+1s): all windows starting in range
    fetched = iq.window_fetch_all(win, "window_start_s", t0s - 1, t0s + 1)
    assert fetched.count() == 3


# --- TopologiesTest.scala:75-98 session windows (gap 2s) ------------------

SESSION_DATA = [
    ("foo", ts(0)), ("bar", ts(0)), ("foo", ts(1)), ("bar", ts(1)),
    ("bar", ts(2)), ("foo", ts(4)), ("bar", ts(4)), ("bar", ts(5)),
]


def test_session_window(spark):
    """Both Kafka and Spark merge on inactivity <= gap (inclusive): bar's
    t+2 -> t+4 hop of exactly 2s stays one session -> bar has ONE session
    of 5 (foo's 3s hop splits)."""
    df = spark.createDataFrame(SESSION_DATA, "key string, ts timestamp")
    out = agg.session_count(df, "ts", ["key"], 2)
    t0s = int(T0.timestamp())
    assert rows_set(out, "key", "session_start_s", "cnt") == {
        ("foo", t0s, 2), ("foo", t0s + 4, 1), ("bar", t0s, 5),
    }


# --- FK joins: the 7 edge-case tests --------------------------------------
# Changelog fixtures mirror the pipeInput sequences; end-state assertions
# implement the CORRECT semantics (the reference documents Kafka's own
# bugs at TopologiesTest.scala:101,117,134 — we pin the fixed behavior).

PRODUCT_SCHEMA = "key string, merchant string, name string, is_delete boolean, seq int"
MERCHANT_SCHEMA = "key string, rank int, is_delete boolean, seq int"


def _snap_product(spark, rows):
    df = spark.createDataFrame(rows, PRODUCT_SCHEMA)
    return ktable.latest_per_key(
        df, ["key"], ["seq"], tombstone=F.col("is_delete")
    ).drop("is_delete", "seq")


def _snap_merchant(spark, rows):
    df = spark.createDataFrame(rows, MERCHANT_SCHEMA)
    return ktable.latest_per_key(
        df, ["key"], ["seq"], tombstone=F.col("is_delete")
    ).select(F.col("key").alias("m_key"), "rank")


def test_fk_join_left_fk_to_null(spark):
    """TopologiesTest.scala:100-114 — FK set to null: left join keeps the
    row with a null right side (exactly one output row, no spurious dup)."""
    product = _snap_product(spark, [
        ("3 bands", "adidas", "3 bands", False, 0),
        ("3 bands", None, "3 bands", False, 1),
    ])
    merchant = _snap_merchant(spark, [
        ("adidas", 3, False, 0), ("puma", 4, False, 1),
    ])
    out = joins.fk_join(product, merchant, "merchant", "m_key", how="left")
    assert rows_set(out, "key", "rank") == {("3 bands", None)}


def test_fk_join_left_delete_retracts_once(spark):
    """TopologiesTest.scala:116-131 — deleting the left row removes the
    join entry (Kafka emitted the deletion twice; correct end state: gone)."""
    product = _snap_product(spark, [
        ("3 bands", "adidas", "3 bands", False, 0),
        ("3 bands", None, None, True, 1),
    ])
    merchant = _snap_merchant(spark, [
        ("adidas", 3, False, 0), ("puma", 4, False, 1),
    ])
    out = joins.fk_join(product, merchant, "merchant", "m_key", how="left")
    assert out.count() == 0


def test_fk_join_inner_fk_to_nonexistent(spark):
    """TopologiesTest.scala:133-148 — FK changed to a nonexistent right
    key: inner join end state is empty (Kafka incoherently emits a
    null-unset event for nonexistent but nothing for null — we are
    coherent: absent either way)."""
    product = _snap_product(spark, [
        ("macbook m2", "apple", "", False, 0),
        ("macbook m2", "non_existent", "", False, 1),
    ])
    merchant = _snap_merchant(spark, [("apple", 3, False, 0)])
    out = joins.fk_join(product, merchant, "merchant", "m_key", how="inner")
    assert out.count() == 0


def test_fk_join_inner_null_fk_to_real(spark):
    """InnerFKJoinTest.scala:11-24 + TopologiesTest.scala:150-162 — FK
    null -> real value: row joins once the FK becomes real."""
    product = _snap_product(spark, [
        ("macbook m2", None, "", False, 0),
        ("macbook m2", "apple", "", False, 1),
    ])
    merchant = _snap_merchant(spark, [("apple", 3, False, 0)])
    out = joins.fk_join(product, merchant, "merchant", "m_key", how="inner")
    assert rows_set(out, "key", "rank") == {("macbook m2", 3)}


def test_fk_join_inner_fk_to_null(spark):
    """TopologiesTest.scala:165-181 — FK real -> null under inner join:
    entry disappears."""
    product = _snap_product(spark, [
        ("pk1", "fk1", "pk1", False, 0),
        ("pk1", None, "pk1", False, 1),
    ])
    merchant = _snap_merchant(spark, [("fk1", 3, False, 0)])
    out = joins.fk_join(product, merchant, "merchant", "m_key", how="inner")
    assert out.count() == 0


def test_fk_join_inner_right_side_absent(spark):
    """TopologiesTest.scala:183-199 — left updated twice, right table
    empty: inner join emits nothing (Kafka emitted a spurious null)."""
    product = _snap_product(spark, [
        ("pk1", "fk1", "pk1", False, 0),
        ("pk1", "fk1", "pk1", False, 1),
    ])
    merchant = _snap_merchant(spark, []).filter(F.lit(False))
    out = joins.fk_join(product, merchant, "merchant", "m_key",
                        how="inner", broadcast_right=False)
    assert out.count() == 0


def test_fk_join_inner_fk_change_to_unmatched(spark):
    """TopologiesTest.scala:201-217 — FK fk1 -> fk2 where only fk1 exists:
    end state empty (the fk1 match is retracted, fk2 finds nothing)."""
    product = _snap_product(spark, [
        ("pk1", "fk1", "pk1", False, 0),
        ("pk1", "fk2", "pk1", False, 1),
    ])
    merchant = _snap_merchant(spark, [("fk1", 3, False, 0)])
    out = joins.fk_join(product, merchant, "merchant", "m_key", how="inner")
    assert out.count() == 0


# --- TopologiesTest.scala:219-239 KTable-KTable left + tombstone ----------

def test_ktable_ktable_left_join_tombstone(spark):
    product = _snap_product(spark, [
        ("key1", "fk1", "pk1", False, 1),
        ("key1", "fk1", "pk1", False, 2),
    ])
    merchant = _snap_merchant(spark, [
        ("key1", 3, False, 0),
        ("key1", None, True, 3),   # tombstone retracts the right side
        ("key2", None, True, 4),   # delete of absent key: no-op
    ])
    out = joins.table_table_join(
        product, merchant, [("key", "m_key")], how="left"
    )
    assert rows_set(out, "key", "rank") == {("key1", None)}


# --- TopologiesTest.scala:241-253 KTable self join ------------------------

def test_ktable_self_join(spark):
    product = _snap_product(spark, [("key1", "fk1", "pk1", False, 0)])
    left = product.select("key", F.col("merchant").alias("l_m"))
    right = product.select(F.col("key").alias("r_key"), F.col("merchant").alias("r_m"))
    out = joins.table_table_join(left, right, [("key", "r_key")], how="inner")
    out = out.select("key", F.concat("l_m", "r_m").alias("joined"))
    assert rows_set(out, "key", "joined") == {("key1", "fk1fk1")}


# --- TopologiesTest.scala:255-270 KStream self join (windowed ±2s) --------

def test_kstream_self_join_windowed(spark):
    df = spark.createDataFrame(
        [("key1", "fk1", ts(0)), ("key1", "fk1", ts(1))],
        "key string, merchant string, ts timestamp",
    )
    l = df.select(F.col("key").alias("l_key"), F.col("merchant").alias("l_m"),
                  F.col("ts").alias("l_ts"))
    r = df.select(F.col("key").alias("r_key"), F.col("merchant").alias("r_m"),
                  F.col("ts").alias("r_ts"))
    out = joins.interval_join(l, r, [("l_key", "r_key")], "l_ts", "r_ts", 2, 2)
    # every pair within ±2s joins, including each record with itself -> 4
    assert out.count() == 4
    assert rows_set(out.select(F.concat("l_m", "r_m").alias("j")), "j") == {("fk1fk1",)}


# --- TopologiesTest.scala:272-292 KStream-KStream left join + null key ----

def test_kstream_kstream_left_join_null_key(spark):
    product = spark.createDataFrame(
        [("key1", "p1", ts(0)), (None, None, ts(0))],
        "key string, name string, ts timestamp",
    )
    merchant = spark.createDataFrame(
        [("key1", 4, ts(0))], "m_key string, rank int, m_ts timestamp"
    )
    out = joins.interval_join(
        product, merchant, [("key", "m_key")], "ts", "m_ts", 10, 10, how="left"
    )
    # null keys never join (SQL equality), matching Kafka
    matched = rows_set(out, "key", "rank")
    assert ("key1", 4) in matched
    assert (None, 4) not in matched
    # Kafka drops null-key records entirely; SQL left join keeps the row
    # with a null right side — callers wanting Kafka parity filter keys:
    kafka_parity = out.filter(F.col("key").isNotNull())
    assert rows_set(kafka_parity, "key", "rank") == {("key1", 4)}


# --- TopologiesTest.scala:294-313 emit-on-window-close --------------------

def test_emit_on_window_close(spark):
    data = [("key1", v, ts(s)) for v, s in
            [(1, 0), (2, 2), (3, 4), (1, 11), (2, 15), (1, 100)]]
    df = spark.createDataFrame(data, "key string, value int, ts timestamp")
    win = agg.windowed_count(df, "ts", ["key"], 10)
    out = agg.closed_windows_only(win, df, "ts", 10)
    t0s = int(T0.timestamp())
    # stream time ends at t0+100: [t0,t0+10) and [t0+10,t0+20) are closed,
    # [t0+100,t0+110) is still open and therefore suppressed
    assert rows_set(out, "window_start_s", "key", "cnt") == {
        (t0s, "key1", 3), (t0s + 10, "key1", 2),
    }


# --- TopologiesTest.scala:315-333 suppress-until-window-close -------------

def test_suppress_until_window_close(spark):
    data = [
        ("key1", 1, T0 - timedelta(microseconds=1)),  # previous window
        ("key1", 2, ts(2)), ("key1", 3, ts(4)),
        ("key1", 1, ts(10)), ("key1", 1, ts(20)),
    ]
    df = spark.createDataFrame(data, "key string, value int, ts timestamp")
    win = agg.windowed_count(df, "ts", ["key"], 10)
    out = agg.closed_windows_only(win, df, "ts", 10)
    t0s = int(T0.timestamp())
    # stream time t0+20 closes [t0-10,t0), [t0,t0+10), [t0+10,t0+20);
    # window [t0+20,t0+30) (the t0+20 record) stays suppressed
    assert rows_set(out, "window_start_s", "key", "cnt") == {
        (t0s - 10, "key1", 1), (t0s, "key1", 2), (t0s + 10, "key1", 1),
    }


# --- ADVICE round 1: wordcount on punctuation-leading line ----------------

def test_wordcount_punct_leading(spark):
    """Java split(\\W+) on '!hello world' keeps a leading '' (the reference
    counts an empty word); we deliberately drop empty tokens."""
    df = spark.createDataFrame([("!hello, world",)], "line string")
    words = stateless.flat_map_values_split(df, "line", out_col="word")
    assert rows_set(words, "word") == {("hello",), ("world",)}


# --- SCD2 table history (r12) -------------------------------------------------

def test_table_history_intervals_tombstones_resurrect(spark):
    """Each version's interval closes at the NEXT record's seq (delete
    included — the tombstone closes but emits nothing), a later upsert
    resurrects with a fresh interval, and the live version per key is
    exactly the one with valid_to NULL."""
    from kafka_streams_app_spark.operators.ktable import table_history
    from pyspark.sql import functions as F

    rows = [
        # key a: v1 -> v2 -> delete -> v3 (resurrect, live)
        ("a", 1, "v1", False), ("a", 2, "v2", False),
        ("a", 3, None, True), ("a", 4, "v3", False),
        # key b: one live version
        ("b", 1, "w1", False),
        # key c: deleted and never resurrected
        ("c", 1, "x1", False), ("c", 2, None, True),
    ]
    df = spark.createDataFrame(
        rows, "k string, seq long, payload string, is_del boolean")
    out = {
        (r["k"], r["valid_from"]): (r["payload"], r["valid_to"])
        for r in table_history(
            df, ["k"], "seq", ["payload"], tombstone=F.col("is_del")
        ).collect()
    }
    assert out == {
        ("a", 1): ("v1", 2),
        ("a", 2): ("v2", 3),   # closed BY the tombstone's seq
        ("a", 4): ("v3", None),  # resurrected, live
        ("b", 1): ("w1", None),
        ("c", 1): ("x1", 2),   # closed by delete; no live row for c
    }


def test_table_history_asof_reconstruction_matches_latest(spark):
    """Filtering the history to valid_from <= s < valid_to at the max
    seq must reproduce latest_per_key exactly (the as-of contract)."""
    from kafka_streams_app_spark.operators.ktable import (
        latest_per_key, table_history,
    )
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = ev.select("user_id", "event_id", "event_type")
    hist = table_history(df, ["user_id"], "event_id", ["event_type"])
    live = {
        (r["user_id"], r["event_type"])
        for r in hist.filter(F.col("valid_to").isNull()).collect()
    }
    latest = {
        (r["user_id"], r["event_type"])
        for r in latest_per_key(
            df, ["user_id"], ["event_id"], ["event_type"]
        ).collect()
    }
    assert live == latest and len(live) > 0


def test_history_asof_join_versions_gaps_boundaries(spark):
    """Point-in-time join pins: a fact joins the version covering its
    seq ([valid_from, valid_to) — inclusive start, exclusive end); facts
    in a tombstoned gap or before the first version NULL-pad in left
    mode; the fact table is never multiplied (intervals are disjoint)."""
    from kafka_streams_app_spark.operators.ktable import (
        history_asof_join, table_history,
    )
    from pyspark.sql import functions as F

    chg = spark.createDataFrame(
        [   # key a: v1@1, v2@3, DELETE@5, v3@7 (resurrect)
            ("a", 1, "v1", False), ("a", 3, "v2", False),
            ("a", 5, None, True), ("a", 7, "v3", False),
        ],
        "k string, seq long, val string, del boolean",
    )
    hist = table_history(
        chg, ["k"], "seq", payload=["val"], tombstone=F.col("del")
    )
    facts = spark.createDataFrame(
        [("a", s) for s in [0, 1, 2, 3, 5, 6, 7, 99]] + [("zz", 4)],
        "k string, seq long",
    )
    out = history_asof_join(facts, hist, ["k"], "seq")
    got = {(r.k, r.seq): r.val for r in out.collect()}
    assert out.count() == facts.count()  # never multiplied
    assert got[("a", 0)] is None          # before first version
    assert got[("a", 1)] == "v1"          # inclusive valid_from
    assert got[("a", 2)] == "v1"
    assert got[("a", 3)] == "v2"          # exclusive valid_to of v1
    assert got[("a", 5)] is None          # tombstoned gap starts AT delete
    assert got[("a", 6)] is None          # still deleted
    assert got[("a", 7)] == "v3"          # resurrect
    assert got[("a", 99)] == "v3"         # live (valid_to NULL)
    assert got[("zz", 4)] is None         # unknown key
    inner = history_asof_join(facts, hist, ["k"], "seq", how="inner")
    assert inner.count() == 5             # only the covered facts
