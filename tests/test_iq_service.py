"""The REST IQ facade (iq_service.py) vs the reference's endpoint
surface (IQueriesService.java:78-176): every route answered over real
HTTP against registered stores, results cross-checked against direct
DataFrame evaluation, plus the error paths."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from kafka_streams_app_spark.iq_service import IQService
from kafka_streams_app_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def service(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    windowed = (
        ev.groupBy(F.window("ts", "10 seconds").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "event_type",
            F.unix_seconds(F.col("w.start")).alias("window_start_s"),
            "cnt",
        )
    )
    svc = IQService()
    svc.register("counts-store", counts, "user_id", key_parser=int)
    svc.register(
        "windows-store", windowed, "event_type", start_col="window_start_s"
    )
    port = svc.start()
    yield svc, port, counts, windowed
    svc.stop()


def _get(port: int, path: str):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_q1_point_lookup_http(service):
    svc, port, counts, _ = service
    row = counts.orderBy("user_id").first()
    status, body = _get(port, f"/state/keyvalue/counts-store/{row['user_id']}")
    assert status == 200
    assert body == [{"user_id": row["user_id"], "cnt": row["cnt"]}]


def test_q2_full_scan_http(service):
    svc, port, counts, _ = service
    status, body = _get(port, "/state/keyvalues/counts-store/all")
    assert status == 200
    assert len(body) == counts.count()
    assert sum(r["cnt"] for r in body) == 10000


def test_q3_range_scan_http(service):
    svc, port, counts, _ = service
    expect = counts.filter(F.col("user_id").between(10, 20)).count()
    status, body = _get(port, "/state/keyvalues/counts-store/range/10/20")
    assert status == 200
    assert len(body) == expect > 0
    assert all(10 <= r["user_id"] <= 20 for r in body)


def test_q4_window_fetch_http(service):
    svc, port, _, windowed = service
    some = windowed.orderBy("window_start_s").first()
    t0, t1 = some["window_start_s"], some["window_start_s"] + 3600
    expect = windowed.filter(
        (F.col("event_type") == some["event_type"])
        & F.col("window_start_s").between(t0, t1)
    ).count()
    status, body = _get(
        port, f"/state/windowed/windows-store/{some['event_type']}/{t0}/{t1}"
    )
    assert status == 200 and len(body) == expect > 0


def test_q5_fetch_all_http(service):
    svc, port, _, windowed = service
    t0 = windowed.agg(F.min("window_start_s")).collect()[0][0]
    t1 = t0 + 3600
    expect = windowed.filter(F.col("window_start_s").between(t0, t1)).count()
    status, body = _get(port, f"/state/windowed/windows-store/all/{t0}/{t1}")
    assert status == 200 and len(body) == expect > 0


def test_q6_metadata_routing_http(service, spark):
    svc, port, counts, _ = service
    status, body = _get(port, "/metadata/counts-store/42")
    assert status == 200
    assert body["num_partitions"] == 32
    # the advertised owner is HashPartitioning's choice for this key
    expect = spark.createDataFrame([(42,)], ["user_id"]).select(
        F.pmod(F.hash("user_id"), F.lit(32)).alias("p")
    ).collect()[0]["p"]
    assert body["partition_id"] == expect


def test_unknown_store_404(service):
    svc, port, _, _ = service
    status, body = _get(port, "/state/keyvalues/nope/all")
    assert status == 404 and "unknown store" in body["error"]


def test_windowed_on_kv_store_400(service):
    svc, port, _, _ = service
    status, body = _get(port, "/state/windowed/counts-store/42/0/1")
    assert status == 400 and "not windowed" in body["error"]


def test_bad_route_404(service):
    svc, port, _, _ = service
    status, _ = _get(port, "/state/garbage")
    assert status == 404


# --- multi-instance fan-out (IQueriesService.java:84-87,104-109) ------------


def test_portable_bucket_py_matches_spark(spark):
    """The instance-side Python routing hash must equal the Spark
    column twin — otherwise two facades would disagree on ownership."""
    from kafka_streams_app_spark.operators.pipeline import (
        portable_bucket, portable_bucket_py,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(50)] ,"k long"
    ).select("k", portable_bucket(F.col("k"), 8).alias("p"))
    for r in df.collect():
        assert portable_bucket_py(r["k"], 8) == r["p"]


@pytest.fixture(scope="module")
def two_instances(spark, sf_dir):
    """Two facades over DISJOINT partition views of the same store
    (instance A hosts partitions 0-3, B hosts 4-7), each knowing the
    other's base URL — the reference's StreamsMetadata host table."""
    from kafka_streams_app_spark.operators.pipeline import portable_bucket

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    part = portable_bucket(F.col("user_id"), 8)
    view_a = counts.filter(part < 4)
    view_b = counts.filter(part >= 4)

    svc_a, svc_b = IQService(), IQService()
    svc_a.register("counts", view_a, "user_id", key_parser=int, num_partitions=8)
    svc_b.register("counts", view_b, "user_id", key_parser=int, num_partitions=8)
    port_a, port_b = svc_a.start(), svc_b.start()
    peers_a = {p: f"http://127.0.0.1:{port_b}" for p in range(4, 8)}
    peers_b = {p: f"http://127.0.0.1:{port_a}" for p in range(0, 4)}
    svc_a.set_topology(set(range(0, 4)), peers_a)
    svc_b.set_topology(set(range(4, 8)), peers_b)
    yield port_a, port_b, counts
    svc_a.stop()
    svc_b.stop()


def test_cross_instance_point_lookup(two_instances):
    """A lookup sent to the NON-owning instance is proxied to the owner
    over HTTP and returns the same row either way (the remote hop of
    IQueriesService.java:104-109). Covers both directions."""
    from kafka_streams_app_spark.operators.pipeline import portable_bucket_py

    port_a, port_b, counts = two_instances
    rows = counts.orderBy("user_id").limit(40).collect()
    seen_remote_a = seen_remote_b = 0
    for row in rows[:20]:
        key, expect = row["user_id"], [dict(user_id=row["user_id"], cnt=row["cnt"])]
        owner = portable_bucket_py(key, 8)
        sa, ba = _get(port_a, f"/state/keyvalue/counts/{key}")
        sb, bb = _get(port_b, f"/state/keyvalue/counts/{key}")
        assert sa == sb == 200
        assert ba == bb == expect
        if owner >= 4:
            seen_remote_a += 1    # A had to hop to B
        else:
            seen_remote_b += 1    # B had to hop to A
    assert seen_remote_a > 0 and seen_remote_b > 0


def test_metadata_reports_owner_host(two_instances):
    from kafka_streams_app_spark.operators.pipeline import portable_bucket_py

    port_a, port_b, counts = two_instances
    key = counts.orderBy("user_id").first()["user_id"]
    owner = portable_bucket_py(key, 8)
    status, body = _get(port_a, f"/metadata/counts/{key}")
    assert status == 200 and body["owner_partition"] == owner
    if owner < 4:
        assert body["host"] == "local"
    else:
        assert body["host"] == f"http://127.0.0.1:{port_b}"


def test_unhosted_partition_503(spark, sf_dir):
    """A topology hole (no peer hosts the key's partition) surfaces as
    503, not a silent empty result."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    svc = IQService()
    svc.register("counts", counts, "user_id", key_parser=int, num_partitions=8)
    port = svc.start()
    try:
        svc.set_topology({0}, {})  # hosts only partition 0, knows no peers
        from kafka_streams_app_spark.operators.pipeline import portable_bucket_py

        key = next(
            r["user_id"] for r in counts.limit(50).collect()
            if portable_bucket_py(r["user_id"], 8) != 0
        )
        status, body = _get(port, f"/state/keyvalue/counts/{key}")
        assert status == 503 and "no instance hosts" in body["error"]
    finally:
        svc.stop()
