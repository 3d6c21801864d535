"""Watermarked streaming windows + emit strategies (SURVEY.md §2.4).

Mapping from the reference's window/emit surface to Structured Streaming:

- W1 tumbling, zero grace  -> window(ts, size) + withWatermark(ts, '0 seconds')
  (/root/reference/src/main/scala/com/ayoubom/kafka/apps/WindowedGroupAtClose.scala:27-32)
- W2 tumbling + grace      -> withWatermark(ts, grace) — the watermark
  delay IS the grace period
  (/root/reference/src/main/scala/com/ayoubom/kafka/apps/WindowedGrouping.scala:25-37,44)
- W3 hopping               -> window(ts, size, slide)
- W4 session               -> session_window(ts, gap)
- W5/W6 emit-on-close / suppress -> APPEND output mode: a window's single
  final row is emitted when the watermark passes window end
  (WindowedGroupAtClose.scala:33, TopologiesTest.scala:294-333)
- W7 emit-on-update        -> UPDATE output mode: every micro-batch emits
  the windows it touched (WindowedGrouping.scala:59, commit interval 0)
- W8 stream time           -> the watermark here. Kafka-exact
  per-topic stream time lives in windowed_join_ktime.py. Delta: Kafka
  tracks stream time PER INPUT TOPIC and advances per record
  (/root/reference/src/main/scala/com/ayoubom/kafka/apps/WindowedJoin.scala:14-22);
  Spark's watermark is global per query and advances at micro-batch
  boundaries. Final emitted sets match; emission interleaving differs.

These builders take a STREAMING DataFrame (spark.readStream...) and
return the windowed aggregation; callers choose the output mode at the
writeStream (append = on-close, update = on-update).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_count_stream(
    df: DataFrame,
    ts: str,
    keys: list[str],
    duration_s: int,
    grace_s: int = 0,
    slide_s: int | None = None,
    out: str = "cnt",
) -> DataFrame:
    """W1/W2/W3 streaming windowed count; grace_s is the watermark delay.

    Same output shape as the batch twin
    (operators/aggregations.py:windowed_count): window_start_s, *keys, cnt.
    """
    slide = f"{slide_s} seconds" if slide_s else f"{duration_s} seconds"
    w = F.window(ts, f"{duration_s} seconds", slide)
    return (
        df.withWatermark(ts, f"{grace_s} seconds")
        .groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(out))
        .select(
            F.unix_seconds(F.col("w.start")).alias("window_start_s"), *keys, out
        )
    )


def windowed_agg_stream(
    df: DataFrame, ts: str, keys: list[str], duration_s: int,
    grace_s: int = 0, **aggs: Column,
) -> DataFrame:
    """A3 streaming windowed reduce (sum/min/max/...)."""
    w = F.window(ts, f"{duration_s} seconds")
    return (
        df.withWatermark(ts, f"{grace_s} seconds")
        .groupBy(w.alias("w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(F.unix_seconds(F.col("w.start")).alias("window_start_s"), *keys,
                *aggs.keys())
    )


def session_count_stream(
    df: DataFrame, ts: str, keys: list[str], gap_s: int,
    grace_s: int = 0, out: str = "cnt",
) -> DataFrame:
    """W4 streaming session windows (merge on inactivity <= gap, same
    bound as Kafka — see operators/aggregations.py:session_count)."""
    w = F.session_window(ts, f"{gap_s} seconds")
    return (
        df.withWatermark(ts, f"{grace_s} seconds")
        .groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias(out))
        .select(*keys, F.unix_seconds(F.col("w.start")).alias("session_start_s"), out)
    )


def count_per_key_stream(df: DataFrame, keys: list[str], out: str = "cnt") -> DataFrame:
    """A1 streaming continuous count per key (WordCount.java:56). Run in
    UPDATE mode for the changelog (KTable.toStream) or COMPLETE for the
    full table snapshot."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def hll_windowed_register_stream(
    df: DataFrame,
    ts: str,
    keys: list[str],
    value: str,
    duration_s: int,
    b: int = 8,
    grace_s: int = 0,
) -> DataFrame:
    """Windowed HLL registers with WATERMARK EVICTION — the production
    shape of "distinct users per hour" at unbounded volume: per
    (event-time window, keys) the sketch's running-MAX registers are
    ordinary windowed-aggregate state, so a closed window's 256-row
    register block is emitted once (append mode) and its state evicted
    — state at any moment is open-windows x keys x 2^b rows, never a
    function of the value cardinality (the exact windowed distinct in
    windowed_distinct_count_stream holds one dedup row PER DISTINCT
    VALUE in the horizon; this is its bounded-memory dial).

    Output: window_start_s, *keys, bucket, max_rho — feed to
    operators/sketches.hll_distinct's merge arithmetic (or any HLL
    consumer; the register block is the interchange format).
    """
    from kafka_streams_app_spark.operators.sketches import hll_bucket_rho

    bucket, rho = hll_bucket_rho(F.col(value), b)
    w = F.window(ts, f"{duration_s} seconds")
    return (
        df.withWatermark(ts, f"{grace_s} seconds")
        .select(F.col(ts), *keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(w.alias("w"), *keys, "bucket")
        .agg(F.max("rho").alias("max_rho"))
        .select(
            F.unix_seconds(F.col("w.start")).alias("window_start_s"),
            *keys,
            "bucket",
            "max_rho",
        )
    )


def cms_cell_stream(
    df: DataFrame, value: str, d: int = 4, w: int = 1 << 8
) -> DataFrame:
    """Streaming Count-Min sketch maintenance — the incremental twin of
    operators/sketches.cms_sketch: per-cell running counts are an
    ordinary streaming COUNT aggregate over the exploded cell ids, so
    state is exactly d*w rows at any item cardinality and the COMPLETE
    snapshot equals the batch sketch cell for cell (the oracle's pin).
    Candidate scoring stays a batch/IQ-side concern — the sketch table
    is the interchange format, same as the HLL register block."""
    from kafka_streams_app_spark.operators.sketches import cms_cells

    return (
        df.select(F.explode(cms_cells(F.col(value), d, w)).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_cell_stream(
    df: DataFrame,
    keys: list[str],
    value: str,
    lo: float = 0.0,
    hi: float = 512.0,
    n_buckets: int = 256,
) -> DataFrame:
    """Streaming histogram-sketch maintenance — the incremental twin of
    operators/sketches.hist_sketch (the quantile member of the sketch
    trio): per-(keys, bucket) running counts are an ordinary streaming
    COUNT aggregate, so state is bounded at keys x n_buckets rows at
    ANY value cardinality and the COMPLETE snapshot equals the batch
    sketch row for row (the oracle's pin). Quantile readout
    (sketches.hist_quantiles) stays a batch/IQ-side concern over the
    snapshot — the sketch table is the interchange format, same as the
    HLL register block and the CMS cell table."""
    from kafka_streams_app_spark.operators.sketches import hist_bucket

    b = hist_bucket(F.col(value), lo, hi, n_buckets)
    return (
        df.filter(F.col(value).isNotNull())
        .select(*keys, b.alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hll_register_stream(
    df: DataFrame, keys: list[str], value: str, b: int = 8
) -> DataFrame:
    """Streaming HyperLogLog register maintenance — the incremental twin
    of operators/sketches.hll_registers, and the proof that the sketch
    is mergeable across micro-batches: the register table is just a
    running MAX aggregate on (keys, bucket), so Spark's ordinary
    streaming state machine maintains it with at most keys x 2^b state
    rows no matter how many events flow through. Run in COMPLETE (full
    register snapshot) or UPDATE (register changelog — the same
    max-monotone changelog a KTable would carry) mode; the final
    COMPLETE table equals the batch register table row for row, which
    is exactly what the oracle pins.

    An exact streaming distinct would need one state row PER DISTINCT
    VALUE (the dropDuplicates chain in windowed_distinct_count_stream);
    this dial bounds state at 2^b registers per key — the 100 TB
    unbounded-cardinality answer.
    """
    from kafka_streams_app_spark.operators.sketches import hll_bucket_rho

    bucket, rho = hll_bucket_rho(F.col(value), b)
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def windowed_distinct_count_stream(
    df: DataFrame,
    ts: str,
    keys: list[str],
    value: str,
    duration_s: int,
    grace_s: int = 0,
    out: str = "n_distinct",
) -> DataFrame:
    """Streaming windowed DISTINCT cardinality per key — incremental
    twin of operators/aggregations.py:windowed_distinct_count.

    Spark disallows count_distinct inside a streaming aggregate, so
    this is the canonical TWO-stateful-operator chain: dropDuplicates
    keyed on (keys, value, event-time WINDOW column) — the window
    struct carries event time, so dedup state for a window is evicted
    once the watermark passes it — followed by the ordinary windowed
    count over the surviving first-arrivals. State at any moment =
    distinct triples of the open window horizon on each side, both
    watermark-bounded; the exchange after dedup carries one row per
    distinct (key, value, window), never per event.

    Output shape matches the batch twin: window_start_s, *keys, out.
    """
    w = F.window(ts, f"{duration_s} seconds")
    dd = (
        df.withWatermark(ts, f"{grace_s} seconds")
        .select(*keys, F.col(value).alias("_v"), w.alias("_w"))
        .dropDuplicates([*keys, "_v", "_w"])
    )
    return (
        dd.groupBy("_w", *keys)
        .agg(F.count(F.lit(1)).alias(out))
        .select(
            F.unix_seconds(F.col("_w.start")).alias("window_start_s"),
            *keys, out,
        )
    )


def assemble_sessions_stream(
    df: DataFrame, ts: str, keys: list[str], gap_s: int,
    event_col: str, grace_s: int = 0, max_events: int | None = None,
) -> DataFrame:
    """Streaming twin of operators/aggregations.py:assemble_sessions:
    per-key inactivity-gap sessions emitted as (second, event)-ordered
    sequences once the watermark passes the session end (append mode —
    a session's sequence is immutable only after it can no longer
    merge, exactly the point Spark emits it). State per open session =
    its collected (t, e) pairs, watermark-bounded like every session
    aggregate; the same adversarial-key caveat as the batch twin
    applies (max_events caps the emitted sequence, not the state)."""
    w = F.session_window(ts, f"{gap_s} seconds")
    pairs = F.struct(
        F.unix_seconds(F.col(ts)).alias("t"), F.col(event_col).alias("e")
    )
    grouped = (
        df.withWatermark(ts, f"{grace_s} seconds")
        .groupBy(w.alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_sort(F.collect_list(pairs)).alias("_seq"),
        )
    )
    seq = F.transform(F.col("_seq"), lambda s: s["e"])
    if max_events is not None:
        seq = F.slice(seq, 1, max_events)
    return grouped.select(
        *keys,
        F.unix_seconds(F.col("w.start")).alias("session_start_s"),
        "n_events",
        F.array_join(seq, ">").alias("sequence"),
    )


def dedup_stream(df: DataFrame, keys: list[str], ts: str, horizon_s: int) -> DataFrame:
    """Streaming exact dedup within a watermark horizon: the first record
    per key wins; duplicates arriving within horizon_s are dropped and
    state is evicted beyond it (bounded state at 100 TB/day rates)."""
    return df.withWatermark(ts, f"{horizon_s} seconds").dropDuplicatesWithinWatermark(
        keys
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    before_s: int,
    after_s: int,
    watermark_s: int,
    how: str = "inner",
) -> DataFrame:
    """J1/J2 streaming stream-stream windowed join.

    Both sides are watermarked; the time-range predicate bounds the join
    state Spark must keep (state eviction = watermark - range). Same
    join condition as the batch twin (operators/joins.py:interval_join).
    Left-outer emits unmatched left rows once the watermark passes the
    end of their join window — Kafka emits them when the window expires
    (WindowedJoin.scala semantics); final sets match.
    """
    l = left.withWatermark(left_ts, f"{watermark_s} seconds")
    r = right.withWatermark(right_ts, f"{watermark_s} seconds")
    cond = None
    for lc, rc in on:
        c = l[lc] == r[rc]
        cond = c if cond is None else (cond & c)
    rng = r[right_ts].between(
        l[left_ts] - F.expr(f"INTERVAL {before_s} SECONDS"),
        l[left_ts] + F.expr(f"INTERVAL {after_s} SECONDS"),
    )
    return l.join(r, cond & rng, how)


def profile_cell_stream(df: DataFrame, cols: list[str], b: int = 8) -> DataFrame:
    """Streaming DATA-QUALITY MONITOR: the incremental twin of
    operators/pipeline.profile_columns, with the exact multi-distinct
    swapped for that operator's own documented 100 TB dial (HLL
    registers per column) so state stays bounded.

    Each input row unpivots to one (col_name, rendered value) row per
    profiled column; ONE running aggregate on (col_name, bucket) then
    maintains, per column: the null count and total rendered length
    (plain commutative sums, null rows routed to the sentinel bucket
    -1 so every metric lives in the same state table) and the HLL
    register maxima (buckets 0..2^b-1). State is bounded at
    cols x (2^b + 1) rows at ANY stream length or value cardinality.

    COMPLETE-mode snapshot == the batch cell table over the same rows
    (every cell a commutative monoid — order/batch-split invariant),
    which is what the oracle pins; the per-column readout (n_nulls,
    sum_len, est_distinct via sketches.hll_estimate) is a pure
    function of the ≤ cols x 257-row snapshot, derived sink-side.
    """
    from kafka_streams_app_spark.operators.sketches import hll_bucket_rho

    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(c).cast("string").alias("_v"),
        )
        for c in cols
    ]
    long = df.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")
    bucket, rho = hll_bucket_rho(F.col("_v"), b)
    cells = long.select(
        "col_name",
        F.when(F.col("_v").isNull(), F.lit(-1)).otherwise(bucket).alias("bucket"),
        F.when(F.col("_v").isNull(), F.lit(0)).otherwise(rho).alias("rho"),
        F.when(F.col("_v").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("_isn"),
        F.coalesce(F.length("_v"), F.lit(0)).alias("_len"),
    )
    return cells.groupBy("col_name", "bucket").agg(
        F.max("rho").alias("max_rho"),
        F.sum("_isn").cast("long").alias("n_nulls"),
        F.sum("_len").cast("long").alias("sum_len"),
    )
