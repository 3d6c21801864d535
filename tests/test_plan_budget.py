"""Frozen-bench plan-shape budget (r14 verdict ask #4): the audit
counters (tools/audit_plans.py / plans/audit.py) are re-run every
round, but until now nothing FAILED FAST when a frozen-path plan grew
a shuffle join, a row-wise Python eval, or a driver collect — a
regression would only surface as a bench slowdown two artifacts
later. This test pins the 36 frozen bench queries (23 headline + 6
curation + 7 sketches) against tests/fixtures/plan_budget.json:

- rowwise_python: must be 0, always (the one unconditional red flag)
- shuffle_joins, build_collects, build_collect_rows, python_evals:
  exact ceilings — growth means a broadcast fell back to shuffle, a
  new driver pull appeared, or a JVM path moved into Python
- exchanges: +1 slack (size-estimate join flips can add/remove one
  Exchange even with AQE disabled; runtime AQE only improves on it)

Deliberate plan changes regenerate the fixture via
`python tools/gen_plan_budget.py` — the fixture diff is the review
artifact.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "plan_budget.json"

_EXACT_KEYS = ["shuffle_joins", "build_collects", "build_collect_rows",
               "python_evals"]


@pytest.fixture(scope="module")
def reports(spark):
    import __spark_entry__ as entry_mod
    import bench
    from kafka_streams_app_spark.plans import audit_registry

    names = bench.HEADLINE + bench.CURATION + bench.SKETCHES
    qs = entry_mod.queries()
    return audit_registry(
        spark, {n: qs[n] for n in names}, "/root/testdata/sf0.01"
    )


def test_frozen_bench_plans_within_budget(reports):
    budget = json.loads(FIXTURE.read_text())
    assert set(reports) == set(budget), (
        "frozen bench set changed; regenerate tools/gen_plan_budget.py"
    )
    errors = []
    for name, got in reports.items():
        want = budget[name]
        if got["rowwise_python"] != 0:
            errors.append(f"{name}: rowwise_python={got['rowwise_python']}")
        for k in _EXACT_KEYS:
            if got[k] > want[k]:
                errors.append(f"{name}: {k} {got[k]} > budget {want[k]}")
        if got["exchanges"] > want["exchanges"] + 1:
            errors.append(
                f"{name}: exchanges {got['exchanges']} > budget "
                f"{want['exchanges']}+1"
            )
    assert not errors, (
        "frozen-path plan regression(s):\n  " + "\n  ".join(errors)
        + "\n(if deliberate: python tools/gen_plan_budget.py and review "
        "the fixture diff)"
    )
