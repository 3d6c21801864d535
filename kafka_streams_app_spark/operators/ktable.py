"""KTable (changelog -> latest-per-key view) batch semantics (SURVEY.md §1.1, §2.1 S2).

The reference's KTable is "latest value per key; null value = tombstone"
(/root/reference/src/main/scala/com/ayoubom/kafka/apps/ForeignJoin.scala:28-34,
 /root/reference/src/test/scala/com/ayoubom/kafka/TopologiesTest.scala:378-384;
 tombstones piped at TopologiesTest.scala:128,234-235).

Batch materialization = one shuffle-free-partial `max_by` hash aggregate:
groupBy(key).agg(max_by(payload_struct, order_struct)). This does a
map-side partial max per partition, so at 100 TB the shuffle carries one
row per (partition, key), not the full changelog. The incremental
(streaming) twin lives in kafka_streams_app_spark/streaming/ktable.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    payload: list[str] | None = None,
    tombstone: Column | None = None,
) -> DataFrame:
    """Materialize the latest record per key from a changelog.

    order_by: changelog sequence columns, later wins; ties broken by the
    full tuple so the result is deterministic.
    tombstone: predicate over the *latest* record; keys whose latest
    record is a tombstone are absent from the view (Kafka delete
    semantics — a later upsert would resurrect the key, which holds here
    because only the latest record is inspected).
    """
    payload = payload or [c for c in df.columns if c not in keys]
    pay = F.struct(*[F.col(c) for c in payload])
    ordr = F.struct(*[F.col(c) for c in order_by])
    snap = (
        df.groupBy(*keys)
        .agg(F.max_by(pay, ordr).alias("_latest"))
        .select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in payload])
    )
    if tombstone is not None:
        snap = snap.filter(~tombstone)
    return snap


def table_history(
    df: DataFrame,
    keys: list[str],
    order_by: str,
    payload: list[str] | None = None,
    tombstone: Column | None = None,
) -> DataFrame:
    """SCD2 "table history" view of a changelog: EVERY version of every
    key with its validity interval [valid_from, valid_to) in changelog
    order — the point-in-time/audit view Kafka Streams' KTable lacks
    (its store holds only the latest value; Flink calls this a temporal
    table, Kimball calls it a type-2 slowly-changing dimension). A
    consumer can reconstruct the table AS OF any sequence s by
    filtering valid_from <= s < coalesce(valid_to, +inf).

    Semantics: each record opens an interval at its own order_by value
    and closes the PREVIOUS record's interval (lead over the per-key
    changelog order). A tombstone closes the current interval and opens
    none — deleted spans simply have no covering row, and a later
    upsert starts a fresh interval (Kafka resurrect semantics).

    Plan at scale: ONE shuffle on the key for the lead window —
    identical exchange shape to the latest_per_key aggregate; no
    self-join (the naive "join each version to the next" doubles the
    exchange). The live version per key is the row with valid_to NULL.

    Output: keys, payload..., valid_from, valid_to (NULL = live).
    """
    payload = payload or [
        c for c in df.columns if c not in keys and c != order_by
    ]
    w = Window.partitionBy(*keys).orderBy(order_by)
    out = df.withColumn("_vt", F.lead(order_by).over(w))
    if tombstone is not None:
        out = out.filter(~tombstone)
    return out.select(
        *keys,
        *payload,
        F.col(order_by).alias("valid_from"),
        F.col("_vt").alias("valid_to"),
    )


def history_asof_join(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    order_col: str,
    how: str = "left",
) -> DataFrame:
    """Point-in-time enrichment against an SCD2 history (the output of
    table_history): each fact row joins the ONE dimension version whose
    [valid_from, valid_to) interval covers the fact's `order_col` value
    — "the dimension as of transaction time", the temporal-table join
    Flink exposes as `FOR SYSTEM_TIME AS OF` and a Kimball warehouse
    runs against every type-2 dimension. Facts that fall in a
    tombstoned gap (no covering interval — the key was deleted) or
    before the key's first version match nothing: NULL-padded in 'left'
    mode, dropped in 'inner'.

    Plan at scale: an EQUI-join on the keys (ONE co-partitioned shuffle
    pair — the interval predicate rides along as a join filter, it is
    never the join key), so the matching work per key is
    |facts_k| x |versions_k|, bounded by the per-key version count —
    NOT a range-join cartesian. Intervals within a key are disjoint by
    table_history's construction, so at most one version matches and
    the fact table is never multiplied.

    Output: facts.* + history payload + valid_from, valid_to.
    """
    # Alias both sides: facts and history routinely share lineage (the
    # history is built from the same changelog the facts come from),
    # and DataFrame-reference conditions on shared-lineage joins hit
    # Spark's ambiguous-self-join check on degenerate plans (e.g. both
    # sides a projection of one scan). Qualified names are always safe.
    f = facts.alias("__asof_f")
    h = history.alias("__asof_h")
    cond = [
        F.col(f"__asof_f.{k}") == F.col(f"__asof_h.{k}") for k in keys
    ]
    cond.append(F.col(f"__asof_f.{order_col}") >= F.col("__asof_h.valid_from"))
    cond.append(
        F.col("__asof_h.valid_to").isNull()
        | (F.col(f"__asof_f.{order_col}") < F.col("__asof_h.valid_to"))
    )
    joined = f.join(h, cond, how)
    return joined.select(
        *[F.col(f"__asof_f.{c}") for c in facts.columns],
        *[F.col(f"__asof_h.{c}") for c in history.columns if c not in keys],
    )
