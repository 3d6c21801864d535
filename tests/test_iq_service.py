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
