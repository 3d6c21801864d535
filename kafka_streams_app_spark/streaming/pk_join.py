"""Incremental KTable-KTable primary-key join (SURVEY §2.5 J5/J6,
incremental changelog semantics).

Reference: productTable.leftJoin(merchantTable, joiner).toStream
(/root/reference/src/test/scala/com/ayoubom/kafka/TopologiesTest.scala:437-452,
 pinned by the tombstone test at :219-239). Both tables share the
primary key, so unlike the FK join no re-subscription routing is
needed: union-tag the two raw changelogs, group by key, and keep
(left value, right value) state per key. Each input record emits at
most one join-changelog row:

- left upsert:  emit (k, upsert, l, r?) — for inner only if r present
- left delete:  emit (k, delete) if a join row existed
- right upsert: emit (k, upsert, l, r) if l present (left join: always
  when l present; inner: same — no l, no row)
- right delete: inner -> delete if row existed; left -> downgrade to
  (k, upsert, l, null) (the reference's tombstone test end state:
  (key1, null) — TopologiesTest.scala:234-238)

A delete on an absent side is suppressed (Kafka null->null).

Two physical layouts, identical changelog output:
- per-key (default): TWS grouping key = the join key; ValueState per
  side.
- bucketed (n_buckets): TWS grouping key = pmod(xxhash64(key),
  n_buckets); per-key state lives in MapStates keyed by the logical
  key. transformWithStateInPandas pays a fixed framework cost PER
  GROUPING KEY per micro-batch (~85% of wall with a no-op processor,
  SCALE.md), so bucketing divides that term by (keys/buckets) —
  the same trade the bucketed ktable measured at 1.67x.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import StringType, StructField, StructType

from kafka_streams_app_spark.streaming._pdnorm import (
    is_shielded,
    normalize_nullable,
    pykey,
    pynative,
    shield_long,
)
from kafka_streams_app_spark.streaming.ktable import _require_rocksdb


def _pk_apply(
    records: list[dict],
    key: tuple,
    l_present: bool,
    l_val: tuple,
    r_present: bool,
    r_val: tuple,
    left_cols: list[str],
    right_cols: list[str],
    left_join: bool,
) -> tuple[list[tuple], bool, tuple, bool, tuple]:
    """PK-join state transition for ONE logical key's in-order records.

    Returns (output rows, new left/right state). Shared by the per-key
    and bucketed processors — identical emissions by construction.
    """
    l_nulls = (None,) * len(left_cols)
    r_nulls = (None,) * len(right_cols)
    out: list[tuple] = []

    for rec in records:
        om = (pynative(rec["seq"]),)  # emission order tag
        if rec["side"] == "l":
            if pynative(rec["is_delete"]):
                if l_present:
                    had = l_present and (left_join or r_present)
                    l_present, l_val = False, ()
                    if had:
                        out.append(key + ("delete",) + l_nulls + r_nulls + om)
            else:
                l_present = True
                l_val = pykey(rec[c] for c in left_cols)
                if left_join or r_present:
                    out.append(
                        key + ("upsert",) + l_val
                        + (r_val if r_present else r_nulls) + om
                    )
        else:  # right side
            if pynative(rec["is_delete"]):
                if r_present:
                    r_present, r_val = False, ()
                    if l_present:
                        out.append(
                            (key + ("upsert",) + l_val + r_nulls if left_join
                             else key + ("delete",) + l_nulls + r_nulls) + om
                        )
            else:
                r_present = True
                r_val = pykey(rec[c] for c in right_cols)
                if l_present:
                    out.append(key + ("upsert",) + l_val + r_val + om)
    return out, l_present, l_val, r_present, r_val


class _PKJoinProcessor(StatefulProcessor):
    def __init__(
        self,
        left_cols: list[str],
        right_cols: list[str],
        left_schema: StructType,
        right_schema: StructType,
        out_columns: list[str],
        how: str,
    ) -> None:
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.left_schema = left_schema
        self.right_schema = right_schema
        self.out_columns = out_columns
        self.how = how
        # LongType payloads are decimal-shielded (arrive object-exact);
        # pin the remaining integral/bool payloads to extension dtypes
        self._norm_fields = [
            (c, f.dataType)
            for c, f in [(c, left_schema[c]) for c in left_cols]
            + [(c, right_schema[c]) for c in right_cols]
            if not is_shielded(f.dataType)
        ]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.left = handle.getValueState("left", self.left_schema)
        self.right = handle.getValueState("right", self.right_schema)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        # normalize BEFORE touching cells: each side's rows carry nulls
        # in the other side's columns by construction, so an int64
        # payload column always reaches pandas nullable — without the
        # extension-dtype pin it arrives float64 and values above 2^53
        # are silently rounded (see _pdnorm.py)
        pdf = normalize_nullable(
            pd.concat(list(rows)).sort_values("seq", kind="stable"),
            self._norm_fields,
        )
        l_present = self.left.exists()
        l_val: tuple = tuple(self.left.get()) if l_present else ()
        r_present = self.right.exists()
        r_val: tuple = tuple(self.right.get()) if r_present else ()
        out, l_present, l_val, r_present, r_val = _pk_apply(
            pdf.to_dict("records"), tuple(key), l_present, l_val,
            r_present, r_val, self.left_cols, self.right_cols,
            self.how == "left",
        )
        for state, present, val in (
            (self.left, l_present, l_val), (self.right, r_present, r_val)
        ):
            if present:
                state.update(val)
            else:
                state.clear()
        if out:
            # dtype=object: pandas would infer mixed None/int64 columns
            # as float64, rounding values above 2^53 (see ktable.py)
            yield pd.DataFrame(out, columns=self.out_columns, dtype=object)

    def close(self) -> None:
        pass


class _PKJoinProcessorBucketed(StatefulProcessor):
    """PK join over a BUCKETED key space: the TWS grouping key is
    pmod(xxhash64(key), n_buckets); per-logical-key (left, right) state
    lives in two MapStates keyed by the logical key. Records are
    globally seq-sorted within the bucket, then applied per logical key
    in order via the same _pk_apply transition the per-key processor
    uses — identical changelog output, ~(keys/buckets)x less per-key
    TWS framework overhead (see ktable._LatestPerKeyBucketed)."""

    def __init__(
        self,
        key_col: str,
        key_schema: StructType,
        left_cols: list[str],
        right_cols: list[str],
        left_schema: StructType,
        right_schema: StructType,
        out_schema: StructType,
        how: str,
    ) -> None:
        self.key_col = key_col
        self.key_schema = key_schema
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.left_schema = left_schema
        self.right_schema = right_schema
        self.out_columns = [f.name for f in out_schema.fields]
        # per-output-column Spark types drive the dense (native-dtype)
        # emission path — see _pdnorm.dense_input and fk_join._fast_path
        self._out_types = {f.name: f.dataType for f in out_schema.fields}
        self.how = how
        # the key column is na.drop'd (never null-mixed, arrives exact);
        # LongType payloads are decimal-shielded — pin the rest
        self._norm_fields = [
            (key_col, key_schema[key_col].dataType)
        ] + [
            (c, dt)
            for c, dt in [(c, left_schema[c].dataType) for c in left_cols]
            + [(c, right_schema[c].dataType) for c in right_cols]
            if not is_shielded(dt)
        ]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.left = handle.getMapState("left", self.key_schema, self.left_schema)
        self.right = handle.getMapState("right", self.key_schema, self.right_schema)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = normalize_nullable(
            pd.concat(list(rows))
            .sort_values("seq", kind="stable")
            .reset_index(drop=True),
            self._norm_fields,
        )
        if not bool(pdf["is_delete"].any()):
            yield from self._fast_path(pdf)
            return
        yield from self._slow_path(pdf)

    def _fast_path(self, pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        """Vectorized all-upsert path (the overwhelmingly common batch
        shape): within the seq-sorted bucket frame, the join partner of
        each record is the MOST RECENT row of the OTHER side for the
        same logical key — a per-key forward-fill. Because the two
        sides interleave, the fill runs on row POINTERS (per-key cummax
        of each side's row index), then one numpy take per payload
        column resolves values; Python touches only per-distinct-key
        state lookups/writes, never per record.

        Output columns are NATIVE-dtype (r7, same treatment as
        fk_join._fast_path): object/Decimal cells made the python->JVM
        Arrow crossing pay per-cell conversion — see
        _pdnorm.dense_input. Inputs convert once (O(inputs)); emissions
        are numpy takes; columns finalize as float64 / Integer /
        Boolean extension arrays with exact null parity."""
        import numpy as np

        from kafka_streams_app_spark.streaming._pdnorm import (
            dcol_finalize,
            dcol_in,
            dcol_nullify,
            dcol_state,
            dcol_take,
            dcol_where,
        )

        n = len(pdf)
        left_join = self.how == "left"
        codes, uniques = pd.factorize(pdf[self.key_col], use_na_sentinel=False)
        ukeys = [pykey((k,)) for k in uniques]
        l_states = [self.left.getValue(k) for k in ukeys]
        r_states = [self.right.getValue(k) for k in ukeys]
        side_l = (pdf["side"] == "l").to_numpy()
        idx = np.arange(n)
        # per-row pointer to the latest row of each side for this key
        # (cummax at an own-side row points at itself)
        lptr = pd.Series(np.where(side_l, idx, -1)).groupby(codes).cummax().to_numpy()
        rptr = pd.Series(np.where(~side_l, idx, -1)).groupby(codes).cummax().to_numpy()
        l_state_present = np.array([s is not None for s in l_states])[codes]
        r_state_present = np.array([s is not None for s in r_states])[codes]
        l_present = (lptr >= 0) | l_state_present
        r_present = (rptr >= 0) | r_state_present
        # l upsert emits iff left join or right present; r upsert iff
        # left present (exactly _pk_apply's all-upsert branches)
        emit = np.where(side_l, left_join | r_present, l_present)

        def resolve(cols_names, states, ptr, j_present):
            ptr_pos = np.maximum(ptr, 0)
            resolved = {}
            for j, c in enumerate(cols_names):
                own = dcol_in(pdf, c, self._out_types[c])
                sk, sv, sm = dcol_state(states, j, own[0])
                sv_codes = (sk, sv[codes], sm[codes] if sm is not None else None)
                vals = dcol_where(ptr >= 0, dcol_take(own, ptr_pos), sv_codes)
                resolved[c] = dcol_nullify(vals, ~j_present)
            return resolved

        res_l = resolve(self.left_cols, l_states, lptr, l_present)
        res_r = resolve(self.right_cols, r_states, rptr, r_present)
        if emit.any():
            key_out = self.out_columns[0]
            cols: dict[str, object] = {
                key_out: dcol_finalize(
                    dcol_take(dcol_in(pdf, self.key_col, self._out_types[key_out]),
                              emit)),
                "action": "upsert",
            }
            for c in self.left_cols:
                cols[c] = dcol_finalize(dcol_take(res_l[c], emit))
            for c in self.right_cols:
                cols[c] = dcol_finalize(dcol_take(res_r[c], emit))
            cols["_seq"] = dcol_finalize(
                dcol_take(dcol_in(pdf, "seq", self._out_types["_seq"]), emit))
            yield pd.DataFrame(cols, columns=self.out_columns)
        # state: each key's LAST row per side wins (Python per distinct
        # key only)
        lmax = pd.Series(np.where(side_l, idx, -1)).groupby(codes).max()
        rmax = pd.Series(np.where(~side_l, idx, -1)).groupby(codes).max()
        l_cols = [pdf[c] for c in self.left_cols]
        r_cols = [pdf[c] for c in self.right_cols]
        for code, ukey in enumerate(ukeys):
            li, ri = int(lmax[code]), int(rmax[code])
            if li >= 0:
                self.left.updateValue(ukey, pykey(c.iat[li] for c in l_cols))
            if ri >= 0:
                self.right.updateValue(ukey, pykey(c.iat[ri] for c in r_cols))

    def _slow_path(self, pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        out: list[tuple] = []
        left_join = self.how == "left"
        # groupby preserves within-group row order, so each logical key
        # still sees its records in global seq order
        for ukey, grp in pdf.groupby(self.key_col, sort=False, dropna=False):
            ukey = pykey((ukey,))
            l_val0 = self.left.getValue(ukey)
            r_val0 = self.right.getValue(ukey)
            rows_out, l_present, l_val, r_present, r_val = _pk_apply(
                grp.to_dict("records"), ukey,
                l_val0 is not None, tuple(l_val0) if l_val0 is not None else (),
                r_val0 is not None, tuple(r_val0) if r_val0 is not None else (),
                self.left_cols, self.right_cols, left_join,
            )
            out.extend(rows_out)
            for state, present, val, was in (
                (self.left, l_present, l_val, l_val0),
                (self.right, r_present, r_val, r_val0),
            ):
                if present:
                    state.updateValue(ukey, pykey(val))
                elif was is not None:
                    state.removeKey(ukey)
        if out:
            yield pd.DataFrame(out, columns=self.out_columns, dtype=object)

    def close(self) -> None:
        pass


def _pk_join_plan(
    left_raw: DataFrame,
    right_raw: DataFrame,
    *,
    key: str,
    left_payload: list[str],
    right_payload: list[str],
    seq: str,
    left_tombstone: str | None,
    right_tombstone: str | None,
    how: str,
    n_buckets: int | None = None,
) -> tuple[DataFrame, StatefulProcessor, StructType, list[str]]:
    """Shared union-tag input + processor + output schema for the
    stream (TWS) and batch (grouped replay) paths. Returns the tagged
    union, the processor, the output schema, and the grouping columns
    (the key, or the derived bucket column when n_buckets is set)."""
    l_schema, r_schema = left_raw.schema, right_raw.schema

    def tag(df: DataFrame, side: str, payload: list[str], other: list[str],
            other_schema, tombstone: str | None) -> DataFrame:
        # Kafka Streams ignores null-key records in table-table joins;
        # dropping them here also keeps the TWS group-key batch int64-
        # exact (see ktable.py null-key note). Payload columns mix nulls
        # BY CONSTRUCTION (each side's rows are null in the other
        # side's columns), so LongType payloads ride the Arrow crossing
        # as decimal(20,0) — see _pdnorm.shield_long.
        df = df.na.drop(subset=[key])
        sch = df.schema
        return df.select(
            F.col(key),
            F.lit(side).alias("side"),
            *[shield_long(F.col(c), sch[c].dataType).alias(c) for c in payload],
            *[shield_long(F.lit(None).cast(other_schema[c].dataType),
                          other_schema[c].dataType).alias(c) for c in other],
            F.col(seq).alias("seq"),
            (F.col(tombstone) if tombstone else F.lit(False)).alias("is_delete"),
        )

    unioned = tag(left_raw, "l", left_payload, right_payload, r_schema,
                  left_tombstone).unionByName(
        tag(right_raw, "r", right_payload, left_payload, l_schema,
            right_tombstone).select(
            key, "side", *left_payload, *right_payload, "seq", "is_delete"
        )
    )
    left_state = StructType(
        [StructField(c, l_schema[c].dataType, True) for c in left_payload]
    )
    right_state = StructType(
        [StructField(c, r_schema[c].dataType, True) for c in right_payload]
    )
    out_schema = StructType(
        [StructField(key, l_schema[key].dataType, True),
         StructField("action", StringType(), False)]
        + [StructField(c, l_schema[c].dataType, True) for c in left_payload]
        + [StructField(c, r_schema[c].dataType, True) for c in right_payload]
        + [StructField("_seq", l_schema[seq].dataType, True)]
    )
    out_columns = [f.name for f in out_schema.fields]
    if n_buckets is None:
        proc: StatefulProcessor = _PKJoinProcessor(
            left_payload, right_payload, left_state, right_state,
            out_columns, how,
        )
        return unioned, proc, out_schema, [key]
    key_schema = StructType([StructField(key, l_schema[key].dataType, True)])
    proc = _PKJoinProcessorBucketed(
        key, key_schema, left_payload, right_payload, left_state,
        right_state, out_schema, how,
    )
    unioned = unioned.withColumn(
        "_pkj_bucket", F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")
    )
    return unioned, proc, out_schema, ["_pkj_bucket"]


def pk_join_stream(
    left_raw: DataFrame,
    right_raw: DataFrame,
    *,
    key: str,
    left_payload: list[str],
    right_payload: list[str],
    seq: str = "seq",
    left_tombstone: str | None = None,
    right_tombstone: str | None = None,
    how: str = "inner",
    n_buckets: int | None = None,
) -> DataFrame:
    """Join two streaming table changelogs on their shared primary key.

    Inputs are RAW changelog streams (key, payload cols, seq, optional
    boolean tombstone col). Output: join changelog (key, action,
    left payload, right payload) — exactly the rows the reference's
    output-join topic carries.

    n_buckets: when set, group the stateful operator by
    pmod(xxhash64(key), n_buckets) instead of the key — identical
    output, ~(keys/buckets)x less per-key TWS framework overhead
    (see _PKJoinProcessorBucketed). Pick >= 2-4x total cores.
    """
    _require_rocksdb(left_raw.sparkSession)
    unioned, proc, out_schema, group_cols = _pk_join_plan(
        left_raw, right_raw, key=key, left_payload=left_payload,
        right_payload=right_payload, seq=seq, left_tombstone=left_tombstone,
        right_tombstone=right_tombstone, how=how, n_buckets=n_buckets,
    )
    return unioned.groupBy(*group_cols).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def pk_join_batch(
    left_raw: DataFrame,
    right_raw: DataFrame,
    *,
    key: str,
    left_payload: list[str],
    right_payload: list[str],
    seq: str = "seq",
    left_tombstone: str | None = None,
    right_tombstone: str | None = None,
    how: str = "inner",
    n_buckets: int | None = None,
) -> DataFrame:
    """Same PK-join state machine over BATCH changelog frames via
    grouped replay (applyInPandas; no TWS/protobuf dependency)."""
    from kafka_streams_app_spark.streaming.replay import grouped_replay

    unioned, proc, out_schema, group_cols = _pk_join_plan(
        left_raw, right_raw, key=key, left_payload=left_payload,
        right_payload=right_payload, seq=seq, left_tombstone=left_tombstone,
        right_tombstone=right_tombstone, how=how, n_buckets=n_buckets,
    )
    return grouped_replay(unioned, group_cols, proc, out_schema)
