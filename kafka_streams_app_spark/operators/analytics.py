"""Windowed/grouped analytics extras: rolling stats, z-score anomaly
flagging, exact order-statistic quantiles.

Reference parity note: the reference app's analytics are all windowed
aggregations over the Kafka Streams DSL
(/root/reference/src/main/scala/com/ayoubom/kafka/windows.scala and
Topologies.scala — count/reduce per window); these operators extend the
same "stats over an ordered key-partitioned stream" family with the
analytic-window shapes a training-data/feature pipeline needs (rolling
features, outlier flags, per-group percentiles), expressed as Spark
window functions so they stay JVM-side and shuffle exactly once.

Determinism contract (shared with aggregations.exact_sum): every sum
accumulates in DECIMAL(30,6) and is cast to double exactly once; any
subsequent double arithmetic is written with the SAME operation order
as the DuckDB oracle SQL so IEEE results match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"


def rolling_stats(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    n: int = 10,
) -> DataFrame:
    """Per-key rolling average of the last ``n`` rows (current row
    inclusive), the standard online feature shape (trailing rate,
    moving baseline).

    Plan: ONE shuffle on ``key``; the frame is evaluated inside the
    partition with a running DECIMAL(30,6) accumulator (Spark's
    sliding-frame sum adds/retracts at the frame edges — O(rows), not
    O(rows x n)). ``order`` must be a total order within each key
    (pass a unique tiebreaker last) or the frame contents are
    nondeterministic. At 100 TB the only scale hazard is a single hot
    key serializing its sort — the same hazard as any per-key ordered
    computation; AQE cannot split an analytic-window partition, so
    skewed keys should be range-bucketed upstream.

    Output: input columns ``key`` + ``order`` + ``value`` plus
    ``roll_n`` (frame row count) and ``roll_avg``.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    roll_sum = F.sum(F.col(value).cast(_DEC)).over(w).cast("double")
    roll_n = F.count(F.lit(1)).over(w)
    return df.select(
        key,
        *order,
        value,
        roll_n.cast("bigint").alias("roll_n"),
        (roll_sum / roll_n).alias("roll_avg"),
    )


def zscore_anomalies(
    df: DataFrame,
    key: str,
    id_col: str,
    value: str,
    z: float = 3.0,
) -> DataFrame:
    """Rows whose ``value`` deviates from its per-``key`` population
    mean by at least ``z`` standard deviations.

    Two-pass shape that scales: pass 1 is ONE hash aggregate on
    ``key`` producing (n, sum, sum-of-squares) — three longs/decimals
    per key, map-side combined; pass 2 broadcasts that (tiny: one row
    per distinct key) stats table back onto the fact rows, so the
    fact side is never shuffled. Moments accumulate in DECIMAL(30,6)
    (the squares are formed in double first, exactly like the oracle's
    ``CAST(value*value AS DECIMAL)``), then mean/variance/z are double
    arithmetic in oracle-identical operation order:
    mean = S1/n; var = S2/n - mean*mean; z = (x - mean)/sqrt(var).

    Population (not sample) variance; keys with var <= 0 (constant or
    single-row) emit nothing.
    """
    stats = df.groupBy(key).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value).cast(_DEC)).cast("double").alias("_s1"),
        F.sum((F.col(value) * F.col(value)).cast(_DEC))
        .cast("double")
        .alias("_s2"),
    )
    mean = F.col("_s1") / F.col("_n")
    var = F.col("_s2") / F.col("_n") - mean * mean
    stats = stats.select(key, mean.alias("_mean"), var.alias("_var")).filter(
        F.col("_var") > 0
    )
    zcol = (F.col(value) - F.col("_mean")) / F.sqrt(F.col("_var"))
    return (
        df.join(F.broadcast(stats), key)
        .select(id_col, key, value, zcol.alias("zscore"))
        .filter(F.abs(F.col("zscore")) >= F.lit(z))
    )


def group_quantiles_disc(
    df: DataFrame,
    key: str,
    value: str,
    tiebreak: str,
    ps: list[float],
) -> DataFrame:
    """Exact discrete per-``key`` quantiles: for each p in ``ps`` the
    element at ordered index floor(p * (n-1)) (0-based; the "lower"
    order statistic — an actual data value, no interpolation, so the
    result is exact on ANY column type and trivially oracle-checkable).

    Plan: ONE shuffle on ``key``, an in-partition sort for
    row_number + count over the same window spec (single window
    exchange), then an index filter against the exploded quantile
    list. Exact per-key order statistics fundamentally need the sorted
    key partition; at 100 TB the scale dial is Spark's
    ``percentile_approx`` (mergeable KLL-style sketch, no per-key
    sort) when +/- epsilon rank error is acceptable — this operator is
    the exact path and the oracle for that trade.
    """
    w = Window.partitionBy(key).orderBy(value, tiebreak)
    ranked = df.select(
        key,
        F.col(value),
        (F.row_number().over(w) - 1).alias("_idx"),
        (F.count(F.lit(1)).over(Window.partitionBy(key)) - 1).alias("_nm1"),
    )
    qs = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    return (
        ranked.select(key, value, "_idx", "_nm1", qs)
        .filter(F.col("_idx") == F.floor(F.col("p") * F.col("_nm1")))
        .select(key, "p", F.col(value).alias("q_value"))
    )


def funnel_conversion(
    df: DataFrame,
    key: str,
    ts: str,
    event_col: str,
    steps: list[str],
    horizon_s: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion counts: how many keys complete step 1,
    then step 2 at-or-after their step-1 completion, and so on — with
    an optional horizon bounding the whole funnel to within horizon_s
    of the step-1 completion (the classic product-analytics
    view -> click -> purchase question).

    Semantics: step i's completion time is the EARLIEST matching event
    at-or-after step i-1's completion (min over ts >= prev — i.e. the
    first qualifying occurrence); a key converts at step i iff that
    minimum exists (and sits inside the horizon). First-occurrence
    anchoring is deliberate: re-anchoring to later step-1 events finds
    strictly more conversions but is no longer a funnel, it's a
    subsequence search.

    Plan: one conditional min-aggregate per step, each co-partitioned
    on the key (the first agg's exchange is reused by every subsequent
    join-agg pair under AQE), events scanned once per step with the
    step predicate pushed to the scan. len(steps) is small and fixed —
    the per-step scan is the right trade vs. a collect_list fold,
    which would shuffle every event's payload to build per-key arrays.

    Output: step INT (1-based), step_name STRING, n_keys BIGINT.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    stages: list[DataFrame] = []
    prev = (
        df.filter(F.col(event_col) == steps[0])
        .groupBy(key)
        .agg(F.min(ts).alias("_t"))
        .withColumn("_t0", F.col("_t"))
    )
    stages.append(prev)
    for s in steps[1:]:
        ev = df.filter(F.col(event_col) == s).select(
            key, F.col(ts).alias("_ets")
        )
        cond = F.col("_ets") >= F.col("_t")
        if horizon_s is not None:
            cond = cond & (
                F.col("_ets") <= F.col("_t0") + F.expr(f"INTERVAL {horizon_s} SECOND")
            )
        prev = (
            ev.join(prev, key)
            .filter(cond)
            .groupBy(key, "_t0")
            .agg(F.min("_ets").alias("_t"))
        )
        stages.append(prev)
    counts = [
        st.agg(
            F.lit(i + 1).alias("step"),
            F.lit(name).alias("step_name"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        for i, (name, st) in enumerate(zip(steps, stages))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    df: DataFrame,
    key: str,
    ts: str,
    period_s: int = 604800,
) -> DataFrame:
    """Cohort retention matrix: keys are cohorted by the period of
    their FIRST event (epoch-aligned, period_s-wide buckets); for each
    (cohort, age) cell, how many of the cohort's keys were active
    age periods after their cohort period — the standard
    retention-curve input (weekly by default).

    Plan: one min-aggregate on the key (the cohort assignment), joined
    back onto the key's distinct activity periods — both aggs
    co-partitioned on the key, the join reuses their exchange; the
    final cell count is a map-side-combined agg on (cohort, age).
    Distinct activity periods are computed INSIDE the first shuffle
    (groupBy key + collect_set of the period), so the join carries one
    row per key, not per event.

    Output: cohort_start_s BIGINT, age INT (0 = the cohort period),
    n_active BIGINT. Row (c, 0, n) gives the cohort size by
    construction (every key is active in its first period).
    """
    # floor division (not toward-zero cast): matches the oracle's
    # integer `//` for pre-1970 (negative-epoch) timestamps too.
    per = F.floor(F.unix_seconds(F.col(ts)) / period_s).cast("long") * period_s
    by_key = df.groupBy(key).agg(
        F.min(per).alias("_cohort"),
        F.collect_set(per).alias("_periods"),
    )
    ages = by_key.select(
        "_cohort",
        F.explode("_periods").alias("_p"),
    ).select(
        F.col("_cohort").alias("cohort_start_s"),
        ((F.col("_p") - F.col("_cohort")) / period_s).cast("int").alias("age"),
    )
    return ages.groupBy("cohort_start_s", "age").agg(
        F.count(F.lit(1)).alias("n_active")
    )


def rolling_time_stats(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    horizon_s: int,
    tiebreak: str,
) -> DataFrame:
    """Per-key TIME-based rolling aggregate: at each event, the count
    and exact-DECIMAL sum/average of the key's values with timestamps
    in (event_ts - horizon_s, event_ts] — the wall-clock sibling of
    rolling_stats' row-count frame ("requests and spend in the last 5
    minutes, evaluated at every event"), and the frame that stays
    meaningful under irregular event spacing where trailing-n does
    not.

    Plan: ONE shuffle on ``key``; a RANGE frame over integer epoch
    seconds evaluated inside the partition with the same add/retract
    sliding accumulator as the ROWS frame — O(rows), not
    O(rows x frame). Rows sharing a timestamp are PEERS in a RANGE
    frame (both engines): every same-second row sees the full
    same-second group, which is what makes the result well-defined
    without a total order — ``tiebreak`` only fixes the OUTPUT row
    identity, not the frame contents. Same hot-key hazard and
    range-bucketing remedy as rolling_stats.

    Output: key, ts_s (epoch seconds), tiebreak, value, win_n,
    win_sum (DECIMAL->double), win_avg.
    """
    ts_s = F.unix_seconds(F.col(ts).cast("timestamp")).alias("ts_s")
    base = df.select(key, ts_s, tiebreak, value)
    w = (
        Window.partitionBy(key)
        .orderBy("ts_s")
        .rangeBetween(-(horizon_s - 1), Window.currentRow)
    )
    win_sum = F.sum(F.col(value).cast(_DEC)).over(w).cast("double")
    win_n = F.count(F.lit(1)).over(w)
    return base.select(
        key,
        "ts_s",
        tiebreak,
        value,
        win_n.cast("bigint").alias("win_n"),
        win_sum.alias("win_sum"),
        (win_sum / win_n).alias("win_avg"),
    )


def rolling_time_stats_bucketed(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    horizon_s: int,
    tiebreak: str,
    bucket_s: int | None = None,
) -> DataFrame:
    """rolling_time_stats with the HOT-KEY remedy its docstring names,
    as code: overlap-and-discard time bucketing. The analytic window
    partitions on (key, time-bucket) instead of key alone, so a hot
    key's sort splits into ~(span / bucket_s) independent partitions
    that AQE can spread across executors — the standard fix for the
    one scale hazard of per-key ordered computation.

    Exactness: a row near a bucket's start has frame rows in the
    PREVIOUS bucket; those rows (the trailing horizon_s - 1 seconds of
    each bucket) are replicated into the next bucket as CONTEXT rows —
    present for other rows' frames, discarded from the output. Rows
    sharing a timestamp always share a bucket, so RANGE-frame peer
    groups never straddle a boundary, and the result equals
    rolling_time_stats row for row (pinned; the contract entry shares
    the plain form's oracle verbatim).

    Cost: the replication duplicates ~(horizon_s / bucket_s) of the
    rows — with the default bucket_s = 16 x horizon_s, ~6% more rows
    through one extra scan-stage filter, for a sort that parallelizes.
    bucket_s must be >= horizon_s (context may only reach one bucket
    back); it is the skew dial — smaller buckets = more parallelism,
    more replication.
    """
    if bucket_s is None:
        bucket_s = 16 * horizon_s
    if bucket_s < horizon_s:
        raise ValueError(
            f"bucket_s must be >= horizon_s, got {bucket_s}/{horizon_s}"
        )
    ts_s = F.unix_seconds(F.col(ts).cast("timestamp"))
    base = df.select(
        key, ts_s.alias("ts_s"), tiebreak, value
    )
    own = base.withColumns({
        "_b": F.floor(F.col("ts_s") / bucket_s).cast("long"),
        "_ctx": F.lit(False),
    })
    ctx = base.filter(
        F.pmod(F.col("ts_s"), F.lit(bucket_s)) >= bucket_s - (horizon_s - 1)
    ).withColumns({
        "_b": (F.floor(F.col("ts_s") / bucket_s) + 1).cast("long"),
        "_ctx": F.lit(True),
    })
    u = own.unionByName(ctx)
    w = (
        Window.partitionBy(key, "_b")
        .orderBy("ts_s")
        .rangeBetween(-(horizon_s - 1), Window.currentRow)
    )
    win_sum = F.sum(F.col(value).cast(_DEC)).over(w).cast("double")
    win_n = F.count(F.lit(1)).over(w)
    return (
        u.withColumns({
            "win_n": win_n.cast("bigint"),
            "win_sum": win_sum,
            "win_avg": win_sum / win_n,
        })
        .filter(~F.col("_ctx"))
        .select(key, "ts_s", tiebreak, value, "win_n", "win_sum", "win_avg")
    )
