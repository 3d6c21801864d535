"""Grouped-replay execution of the streaming state machines WITHOUT
transformWithStateInPandas (TWS).

Why this exists: TWS spawns an extra protobuf-dependent Python worker
(the state-server client). In this container google.protobuf only
reaches workers through the _vendor PYTHONPATH shim injected BEFORE the
JVM launches (engine._ensure_vendor_pythonpath). A SparkSession created
by an external owner before that injection leaves TWS workers unable to
import protobuf — they crash with "TransformWithStateInPySpark driver
worker exited unexpectedly". Regular Arrow-batched applyInPandas has no
protobuf dependency, so the SAME StatefulProcessor state machines
(streaming/ktable.py, pk_join.py, fk_join.py) can be replayed per key
over a batch frame: groupBy(keys) shuffles each key's full changelog to
one task, the processor runs once per key from empty state, and the
emitted changelog is identical to what the incremental TWS run yields
(the processors are deterministic in seq order).

This is the fallback path for the driver-gate contract entries only;
tests pin the genuinely incremental multi-batch behavior through TWS
via MicroBatchReplay. Scale note: the replay is fully distributed (one
shuffle on the grouping key, same as TWS's repartition), but it holds a
key's whole history in one task — fine for snapshot reductions, not a
replacement for incremental state at unbounded retention.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


class _ValueStateShim:
    """Duck-typed stand-in for StatefulProcessorHandle ValueState."""

    def __init__(self) -> None:
        self._val: tuple | None = None

    def exists(self) -> bool:
        return self._val is not None

    def get(self) -> tuple:
        return self._val  # type: ignore[return-value]

    def update(self, value) -> None:
        self._val = tuple(value)

    def clear(self) -> None:
        self._val = None


class _MapStateShim:
    """Duck-typed stand-in for StatefulProcessorHandle MapState."""

    def __init__(self) -> None:
        self._map: dict[tuple, tuple] = {}

    def exists(self) -> bool:
        return bool(self._map)

    def iterator(self):
        return iter(list(self._map.items()))

    def keys(self):
        return iter(list(self._map.keys()))

    def values(self):
        return iter(list(self._map.values()))

    def containsKey(self, key) -> bool:
        return tuple(key) in self._map

    def getValue(self, key):
        return self._map.get(tuple(key))

    def updateValue(self, key, value) -> None:
        self._map[tuple(key)] = tuple(value)

    def removeKey(self, key) -> None:
        self._map.pop(tuple(key), None)

    def clear(self) -> None:
        self._map.clear()


class _HandleShim:
    """Duck-typed StatefulProcessorHandle: hands out in-memory state."""

    def getValueState(self, name: str, schema, ttlDurationMs=None) -> _ValueStateShim:
        return _ValueStateShim()

    def getMapState(self, name: str, key_schema, value_schema,
                    ttlDurationMs=None) -> _MapStateShim:
        return _MapStateShim()


def grouped_replay(
    df: DataFrame,
    group_cols: list[str],
    processor,
    out_schema: StructType,
) -> DataFrame:
    """Run a StatefulProcessor state machine over a BATCH changelog.

    groupBy(group_cols).applyInPandas: each key's rows arrive as one
    pandas frame; processor.init gets fresh in-memory state shims, then
    handleInputRows replays the key's history in seq order — bit-for-bit
    the changelog the TWS incremental operator emits for the same input.
    """
    out_cols = [f.name for f in out_schema.fields]

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        processor.init(_HandleShim())  # fresh state per key group
        outs = list(processor.handleInputRows(tuple(key), iter([pdf]), None))
        if not outs:
            return pd.DataFrame([], columns=out_cols)
        return pd.concat(outs, ignore_index=True)

    return df.groupBy(*group_cols).applyInPandas(run, schema=out_schema)


_TWS_PROBE_CACHE: dict[str, bool] = {}


def tws_available(spark) -> bool:
    """Can transformWithStateInPandas run under THIS session's workers?

    Probes an actual Python worker for google.protobuf (the only import
    TWS needs beyond what applyInPandas already uses) with a 1-partition
    job, cached per application id. Returns False — and callers fall
    back to grouped_replay — when the session owner launched the JVM
    before the _vendor shim reached PYTHONPATH.
    """
    app_id = spark.sparkContext.applicationId
    if app_id not in _TWS_PROBE_CACHE:
        def _probe(_):
            # NOTE: a bare `import google.protobuf` is NOT sufficient — the
            # spark-core jar on the worker path exposes google/protobuf/*.proto
            # resources, so that import "succeeds" as an empty namespace
            # package (and proto/__init__ is lazy). Import the generated
            # state-server message module the TWS worker actually loads: it
            # pulls in the real protobuf runtime (google.protobuf.descriptor,
            # version check relaxed by the _vendor shim) or dies trying.
            try:
                from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401
                return True
            except Exception:
                return False

        def _run_probe() -> bool:
            return bool(spark.sparkContext.parallelize([0], 1).map(_probe).first())

        try:
            ok = _run_probe()
        except Exception:
            # The probe returns False on a worker ImportError; reaching
            # here means the probe JOB itself failed (transient executor
            # loss, task serialization, ...). Caching that as "TWS
            # unavailable" would silently demote every streaming entry
            # to batch replay — retry once, then surface the real error
            # instead of mislabeling the session.
            ok = _run_probe()
        if not ok:
            import warnings

            warnings.warn(
                "transformWithStateInPandas workers cannot import protobuf "
                f"in application {app_id}; streaming operators will execute "
                "via batch grouped-replay (streaming/replay.py) instead of "
                "the incremental TWS path.",
                RuntimeWarning,
                stacklevel=2,
            )
        _TWS_PROBE_CACHE[app_id] = ok
    return _TWS_PROBE_CACHE[app_id]
