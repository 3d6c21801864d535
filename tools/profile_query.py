"""Profiling helper for the r15 optimization round.

Usage:
  python tools/profile_query.py <query> [<query> ...] [--plan-dir plans/r15]
      [--suffix before|after] [--runs 3] [--sf /root/testdata/sf0.1]

For each named query: capture .explain("formatted") to
<plan-dir>/<query>_<suffix>.txt, then time `runs` noop-sink executions
(warm-up run first, not timed) and print per-run + best seconds.
Everything computes from the parquet inputs — no caching across runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from kafka_streams_app_spark.engine import get_spark


def main() -> None:
    args = sys.argv[1:]

    def opt(name: str, default: str) -> str:
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    plan_dir = opt("--plan-dir", "plans/r15")
    suffix = opt("--suffix", "before")
    runs = int(opt("--runs", "3"))
    sf_dir = opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    names = args
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    for name in names:
        fn = queries[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(plan_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        # warm-up at the smallest SF (JIT + Python worker pool), untimed
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: best={min(times):.3f}s runs="
            + ",".join(f"{t:.3f}" for t in times)
            + f" plan={path}"
        )


if __name__ == "__main__":
    main()
