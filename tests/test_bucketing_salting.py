"""Scale-path pins: bucketed co-located joins eliminate the shuffle;
salted joins spread a hot key and return exactly the plain-join rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_app_spark.operators import joins
from kafka_streams_app_spark.plans import plan_report
from kafka_streams_app_spark.sources.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_has_no_shuffle(spark):
    import uuid

    suffix = uuid.uuid4().hex[:8]
    t_orders, t_customers = f"b_orders_{suffix}", f"b_customers_{suffix}"
    orders = spark.range(1000).select(
        F.col("id").alias("o_id"), (F.col("id") % 100).alias("custkey")
    )
    customers = spark.range(100).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    write_bucketed(orders, t_orders, ["custkey"], 8)
    write_bucketed(customers, t_customers, ["custkey"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = bucketed_join(spark, t_orders, t_customers, ["custkey"])
        r = plan_report(j)
        assert r["shuffle_joins"] == 1
        assert r["exchanges"] == 0  # co-located: NO shuffle on either side
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_customers}")


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (900 of 1000 rows) + long tail
    left = spark.range(1000).select(
        F.col("id").alias("l_id"),
        F.when(F.col("id") < 900, 7).otherwise(F.col("id")).alias("k"),
    )
    right = spark.range(200).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    plain = {
        (r["l_id"], r["val"])
        for r in left.join(right, left["k"] == right["k"]).select("l_id", "val").collect()
    }
    salted = {
        (r["l_id"], r["val"])
        for r in joins.salted_join(left, right, "k", "k", salt=8)
        .select("l_id", "val").collect()
    }
    assert salted == plain
    # 900 hot-key rows match k=7; tail keys 900..999 have no right match
    assert len(plain) == 900
