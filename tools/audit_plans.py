"""Print the plan-hygiene audit for every contract query at sf0.01.

Usage: python tools/audit_plans.py
Exits nonzero if any query has row-wise Python (BatchEvalPython) in its
plan — the one unconditional red flag.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from kafka_streams_app_spark.engine import get_spark
from kafka_streams_app_spark.plans import audit_registry

def main() -> int:
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # streaming entries run a query to completion just to build a plan;
    # the batch plans cover the same operators, so skip them here
    skip = {n for n in qs if n.startswith("s_")}
    reports = audit_registry(spark, qs, "/root/testdata/sf0.01", skip=skip)
    bad = 0
    hdr = f"{'query':32} {'pushF':>5} {'bcast':>5} {'shufJ':>5} {'exch':>4} " \
          f"{'cg':>3} {'pyArrow':>7} {'pyRow':>5}"
    print(hdr)
    for name, r in reports.items():
        flag = ""
        if r["rowwise_python"]:
            flag = "  <-- ROW-WISE PYTHON"
            bad += 1
        print(
            f"{name:32} {len(r['pushed_filters']):>5} {r['broadcast_joins']:>5} "
            f"{r['shuffle_joins']:>5} {r['exchanges']:>4} {r['codegen_stages']:>3} "
            f"{r['python_evals']:>7} {r['rowwise_python']:>5}{flag}"
        )
    print(f"\n{len(reports)} plans audited, {bad} with row-wise Python")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
