"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is materialized through the `noop` data source so the full
plan executes (a bare .count() would let Catalyst prune computed
columns). Timings include plan + execution, excluding session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from kafka_streams_app_spark.engine import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the spine operators (scan->agg, windows, joins) plus the
# heaviest north-star ops (minhash dedup, ANN) — the queries whose cost
# profile matters at 100 TB.
HEADLINE = [
    "t1_wordcount",
    "a2_windowed_count",
    "a3_windowed_sum",
    "a4_session_count",
    "w3_hopping_count",
    "j1_interval_join_inner",
    "j4_asof_enrich",
    "j5_table_join_inner",
    "j8_fk_join_inner_agg",
    "q5_window_fetch_all",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_lsh_ann_topk",
    "text_quality",
    "text_pii_scrub",
    "pack_sequences",
    "tpch_q1_pricing",
    "tpch_q3_top_revenue",
    "tpch_q5_local_revenue",
    "tpch_q6_forecast_revenue",
    "tpch_q13_custdist",
    "tpch_q18_large_orders",
]


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # Warm-up (not timed): run every headline query once at the smallest
    # SF. This pays the one-time JVM JIT + Python-worker-pool startup
    # outside the measurement, so timings reflect steady-state per-query
    # cost (no result caching — different data directory).
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    # best-of-3, INTERLEAVED: single runs on this box show intermittent
    # multi-second GC/contention spikes on otherwise sub-second queries
    # (r2 recorded j5/j8/dedup_exact at 2-5x their steady-state cost even
    # at best-of-2). Interleaving the passes (q1..qn, q1..qn, q1..qn)
    # decorrelates a host-contention burst from any one query's samples;
    # the per-query minimum reflects the plan's actual cost.
    per_query: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            if name not in per_query or el < per_query[name]:
                per_query[name] = el
    per_query = {n: round(v, 3) for n, v in per_query.items()}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
