"""Physical-plan hygiene tooling.

The reference runs its DSL graph as written (no optimizer —
SURVEY.md §4.1); this engine leans on Catalyst, so plan SHAPE is part
of correctness-at-scale: a filter that misses the parquet scan or a
dimension join that shuffles instead of broadcasting is a 100 TB bug
that no row-level test catches. plans.audit inspects executed plans for
those properties; tools/audit_plans.py runs it over the whole query
registry.
"""

from kafka_streams_app_spark.plans.audit import audit_registry, plan_report

__all__ = ["plan_report", "audit_registry"]
