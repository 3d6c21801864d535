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


def _final_plan(df) -> str:
    """Executed (AQE-final) plan text, with the trailing '== Initial
    Plan ==' echo stripped — assertions must read what actually ran."""
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("Initial Plan")[0]


def _live_file_scans(plan: str) -> int:
    """FileScan leaves that EXECUTE in this plan: every InMemoryTableScan
    echoes its cache-build subplan (indented under an InMemoryRelation
    line), so a bare string count overstates the scans actually run.
    A FileScan whose nearest shallower-indented ancestor line mentions
    InMemoryRelation is part of such an echo, not a live scan."""
    lines = plan.splitlines()
    # tree depth = offset past the " :|" gutter (the ':' continuation
    # columns of sibling branches sit at FIXED columns, so a plain
    # leading-space count would flatten every line under them)
    indents = [len(l) - len(l.lstrip(" :|")) for l in lines]
    live = 0
    for i, l in enumerate(lines):
        if "FileScan" not in l:
            continue
        cur = indents[i]
        cached = False
        # walk the ancestor chain: each strictly-shallower line above
        for j in range(i - 1, -1, -1):
            if lines[j].strip() and indents[j] < cur:
                if "InMemoryRelation" in lines[j]:
                    cached = True
                    break
                cur = indents[j]
        if not cached:
            live += 1
    return live


def test_cms_topk_single_scan_at_scale(spark, monkeypatch):
    """r15 verdict item #6/#8: the self-scored cms_topk claimed its two
    consumers shared one scan via runtime exchange reuse — the executed
    plan showed TWO input scans (reuse never fired). The r16 fix
    materializes the per-item count once for corpus-sized inputs
    (scale-gated, see CMS_SINGLE_SCAN_MIN_BYTES). This EXECUTES the
    query and asserts the final adaptive plan against both gate
    directions."""
    from kafka_streams_app_spark.operators import sketches
    from kafka_streams_app_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    # below the gate: the (cheap) double-scan plan of r15, unchanged
    df = sketches.cms_topk(ev, "user_id", n=5)
    df.collect()
    assert _live_file_scans(_final_plan(df)) == 2
    # at/above the gate: the input scan ran once inside the count
    # materialization (at call time) — the final plan reads the
    # checkpoint blocks (ExistingRDD) and scans NO file at all
    monkeypatch.setattr(sketches, "CMS_SINGLE_SCAN_MIN_BYTES", 0)
    df1 = sketches.cms_topk(ev, "user_id", n=5)
    rows1 = df1.collect()
    plan1 = _final_plan(df1)
    assert _live_file_scans(plan1) == 0 and "ExistingRDD" in plan1
    assert rows1 == df.collect()


def test_minhash_band_join_reads_cache_not_rescans(spark):
    """r15 verdict item #8 (adapted to what the executed plan actually
    shows): the minhash band self-join's two sides and the Jaccard
    attach both read the PERSISTED signature table — the executed plan
    must contain the documents FileScan only beneath the InMemory
    relation build (i.e. at most once), never as a live re-scan per
    join side. Runs the real candidate subplan at sf0.01."""
    from pyspark.sql import functions as F

    from kafka_streams_app_spark.operators.dedup import _sig_table
    from kafka_streams_app_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    sig = _sig_table(docs, "text", "doc_id", 3).persist()
    try:
        bands = sig.select("_id", F.explode("_bh").alias("bh"))
        cand = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.bh") == F.col("y.bh"))
                & (F.col("x._id") < F.col("y._id")),
            )
            .select(F.col("x._id").alias("doc_a"),
                    F.col("y._id").alias("doc_b"))
            .distinct()
        )
        cand.collect()
        plan = _final_plan(cand)
        # the join reads the cache (AQE may print the second side
        # inside a broadcast/table-cache stage wrapper, so >= 1)...
        assert plan.count("InMemoryTableScan") >= 1
        # ...and no LIVE parquet re-scan exists outside the cache build
        # (every FileScan in the text is an InMemoryRelation echo)
        scans = _live_file_scans(plan)
        assert scans == 0, f"band join re-scanned the corpus: {scans} scans"
    finally:
        sig.unpersist()
