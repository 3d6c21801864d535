"""Vector column functions for similarity search (BASELINE.json north-star).

Embeddings are `array<float>` columns; all arithmetic is done in DOUBLE
with sequential left-fold accumulation (F.aggregate), which makes dot
products bit-reproducible across partitionings and engines — the
correctness oracle depends on that.

JVM-side higher-order functions, no Python in the hot path; for very
wide vectors a pandas_udf + numpy path could be swapped in per-operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
