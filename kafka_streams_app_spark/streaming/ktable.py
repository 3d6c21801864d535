"""Incremental KTable: latest-per-key changelog view with tombstone
retraction (SURVEY.md §7.1 M4, the hard 20%).

The reference's KTable materializes "latest value per key; null value =
delete" and forwards one changelog record per input update
(/root/reference/src/main/scala/com/ayoubom/kafka/apps/ForeignJoin.scala:28-34;
tombstones piped at
/root/reference/src/test/scala/com/ayoubom/kafka/TopologiesTest.scala:128,234-235).

Here the same semantics run as a keyed stateful operator
(transformWithStateInPandas, Spark 4.x): state = the current value per
key; each input record (in seq order) emits exactly one changelog row —
an upsert carrying (old, new) or a delete carrying the retracted value.
A delete of an absent key emits nothing (Kafka suppresses null->null).

The emitted old_* columns are what make downstream incremental joins
possible: the FK join consumes old_fk/new_fk transitions to re-route
its subscription (streaming/fk_join.py), exactly like Kafka's
subscription topics.

Scale: state is hash-partitioned by key across executors (RocksDB
provider), the shuffle is the same repartition a Kafka changelog topic
implies, and each task streams Arrow batches — no driver involvement.

The batch twin (one max_by aggregate) is operators/ktable.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from kafka_streams_app_spark.streaming._pdnorm import (
    is_shielded,
    normalize_nullable,
    pykey,
    shield_long,
)


def _require_rocksdb(spark) -> None:
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def _changelog_for_key(
    key: tuple,
    seqs: list,
    pay: list[list],
    tombs: list[bool] | None,
    cur: tuple | None,
    keys: list[str],
    payload: list[str],
    seq_col: str,
    out_columns: list[str],
) -> tuple[pd.DataFrame | None, tuple | None]:
    """Latest-per-key state transition for ONE logical key's in-order
    records: returns (changelog frame or None, new state or None).
    Shared by the per-key and bucketed processors — identical output."""
    if tombs is None or not any(tombs):
        # Fast path (every record an upsert — the overwhelmingly
        # common shape): each row's old payload is the previous
        # row's new payload, i.e. a shift-by-one with the carried
        # state in slot 0. Column-wise list slicing instead of a
        # per-row Python loop — measured ~3x on the throughput
        # smoke (tools/stream_throughput.py, ktable_latest_tws).
        n = len(seqs)
        cols: dict[str, list] = {}
        for i, k in enumerate(keys):
            cols[k] = [key[i]] * n
        cols["action"] = ["upsert"] * n
        cols["old_present"] = [cur is not None] + [True] * (n - 1)
        for j, c in enumerate(payload):
            # dtype=object: pandas would infer a [None, int...] list as
            # float64 (NaN-fill), silently rounding int64 payloads above
            # 2^53; object columns reach Arrow losslessly
            cols[f"old_{c}"] = pd.Series(
                [cur[j] if cur is not None else None] + pay[j][:-1], dtype=object
            )
            cols[f"new_{c}"] = pay[j]
        cols[seq_col] = seqs
        return pd.DataFrame(cols, columns=out_columns), tuple(p[-1] for p in pay)
    nulls = (None,) * len(payload)
    out: list[tuple] = []
    for i, seq in enumerate(seqs):
        old_present = cur is not None
        old = cur if old_present else nulls
        if tombs[i]:
            if old_present:  # delete of absent key: suppressed
                out.append(key + ("delete", True) + old + nulls + (seq,))
                cur = None
        else:
            new = tuple(p[i] for p in pay)
            out.append(key + ("upsert", old_present) + old + new + (seq,))
            cur = new
    # dtype=object: see fast path — mixed None/int64 columns must not
    # pass through float64 inference
    frame = (
        pd.DataFrame(out, columns=out_columns, dtype=object) if out else None
    )
    return frame, cur


class _LatestPerKey(StatefulProcessor):
    def __init__(
        self,
        keys: list[str],
        seq_col: str,
        payload: list[str],
        tombstone_col: str | None,
        state_schema: StructType,
        out_columns: list[str],
    ) -> None:
        self.keys = keys
        self.seq_col = seq_col
        self.payload = payload
        self.tombstone_col = tombstone_col
        self.state_schema = state_schema
        self.out_columns = out_columns
        self._norm_fields = [
            (c, f.dataType) for c, f in zip(payload, state_schema.fields)
        ]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("latest", self.state_schema)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        # pin nullable integral payloads (raises loudly when an
        # UNshielded int64 already lost precision — see _pdnorm.py)
        pdf = normalize_nullable(
            pd.concat(list(rows)).sort_values(self.seq_col, kind="stable"),
            self._norm_fields,
        )
        cur: tuple | None = tuple(self.state.get()) if self.state.exists() else None
        seqs = pdf[self.seq_col].tolist()
        pay = [pdf[c].tolist() for c in self.payload]
        tombs = (
            [bool(t) for t in pdf[self.tombstone_col].tolist()]
            if self.tombstone_col else None
        )
        frame, new_cur = _changelog_for_key(
            key, seqs, pay, tombs, cur,
            self.keys, self.payload, self.seq_col, self.out_columns,
        )
        if new_cur is None:
            self.state.clear()
        else:
            # pykey: shielded payloads surface as Decimal (and extension
            # dtypes as pd.NA/np scalars) — state wants plain python
            self.state.update(pykey(new_cur))
        if frame is not None:
            yield frame

    def close(self) -> None:
        pass


class _LatestPerKeyBucketed(StatefulProcessor):
    """Latest-per-key over a BUCKETED key space: the TWS grouping key is
    pmod(xxhash64(logical keys), n_buckets), and the per-logical-key
    state lives in a MapState keyed by the logical key.

    Why: transformWithStateInPandas pays a fixed framework cost PER
    GROUPING KEY per micro-batch (Arrow slice + python-worker dispatch;
    measured ~85% of ktable wall with a no-op processor — SCALE.md).
    Grouping by bucket divides that per-key term by (keys/buckets) while
    keeping identical semantics: records are globally seq-sorted within
    the bucket, then applied per logical key in order via the same
    _changelog_for_key transition the per-key processor uses. State
    remains hash-partitioned across executors (by bucket), RocksDB holds
    one map entry per logical key, and no bucket ever materializes more
    than its micro-batch slice plus one map lookup per distinct key.

    Bucket count is a deploy dial: enough buckets to spread across
    executors and bound per-group batch size (>= 2-4x total cores);
    few enough that the per-group framework cost stays amortized.
    """

    def __init__(
        self,
        keys: list[str],
        seq_col: str,
        payload: list[str],
        tombstone_col: str | None,
        key_schema: StructType,
        state_schema: StructType,
        out_columns: list[str],
    ) -> None:
        self.keys = keys
        self.seq_col = seq_col
        self.payload = payload
        self.tombstone_col = tombstone_col
        self.key_schema = key_schema
        self.state_schema = state_schema
        self.out_columns = out_columns

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getMapState("latest", self.key_schema, self.state_schema)

    @staticmethod
    def _pykey(row_vals) -> tuple:
        return pykey(row_vals)

    def _normalize_pdf(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """Pin integral/bool key+payload columns to pandas NULLABLE
        extension dtypes before any shift/groupby/state access — closes
        the float64 corruption paths documented in _pdnorm.py (ADVICE
        r5)."""
        return normalize_nullable(
            pdf,
            [(name, f.dataType) for name, f in zip(
                self.keys + self.payload,
                list(self.key_schema.fields) + list(self.state_schema.fields),
            )],
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = self._normalize_pdf(
            pd.concat(list(rows))
            .sort_values(self.seq_col, kind="stable")
            .reset_index(drop=True)
        )
        if self.tombstone_col is not None and bool(pdf[self.tombstone_col].any()):
            yield from self._slow_path(pdf)
            return
        # Vectorized all-upsert path: within the seq-sorted bucket frame,
        # each row's old payload is the PREVIOUS row of the same logical
        # key — a per-key shift(1) — and only each key's first row needs
        # a state lookup (its carry-in), only each key's last row a state
        # write. All per-row work is pandas C; Python touches only the
        # ~distinct-keys-per-bucket boundary rows.
        n = len(pdf)
        first_mask = ~pdf.duplicated(self.keys)
        last_mask = ~pdf.duplicated(self.keys, keep="last")
        first_pos = first_mask.to_numpy().nonzero()[0]
        gb = pdf.groupby(self.keys, sort=False, dropna=False)
        # per-column extraction (NOT a .to_numpy() block: numeric
        # mixed-dtype frames upcast to float64, corrupting long keys)
        key_cols = [pdf[k] for k in self.keys]
        curs = [
            self.state.getValue(self._pykey([c.iat[i] for c in key_cols]))
            for i in first_pos
        ]
        cols: dict[str, object] = {k: pdf[k] for k in self.keys}
        cols["action"] = ["upsert"] * n
        old_present = pd.Series(True, index=pdf.index)
        old_present.iloc[first_pos] = [c is not None for c in curs]
        cols["old_present"] = old_present
        for j, c in enumerate(self.payload):
            # _normalize_pdf pinned integral/bool payloads to extension
            # dtypes, so this shift fills pd.NA natively — int64 values
            # never round-trip through float64 (exact above 2^53)
            old = gb[c].shift(1)
            fill = [cur[j] if cur is not None else None for cur in curs]
            if pd.api.types.is_float_dtype(old.dtype):
                # float64 columns want NaN, not None (pandas deprecates
                # object fills into float blocks)
                fill = [float("nan") if v is None else v for v in fill]
            old.iloc[first_pos] = fill
            cols[f"old_{c}"] = old
            cols[f"new_{c}"] = pdf[c]
        cols[self.seq_col] = pdf[self.seq_col]
        pay_cols = [pdf[c] for c in self.payload]
        for i in last_mask.to_numpy().nonzero()[0]:
            self.state.updateValue(
                self._pykey([c.iat[i] for c in key_cols]),
                self._pykey([c.iat[i] for c in pay_cols]),
            )
        yield pd.DataFrame(cols, columns=self.out_columns)

    def _slow_path(self, pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        frames: list[pd.DataFrame] = []
        # groupby preserves within-group row order, so each logical key
        # still sees its records in global seq order.
        for ukey, grp in pdf.groupby(self.keys, sort=False, dropna=False):
            if not isinstance(ukey, tuple):
                ukey = (ukey,)
            ukey = self._pykey(ukey)
            cur = self.state.getValue(ukey)
            cur = tuple(cur) if cur is not None else None
            seqs = grp[self.seq_col].tolist()
            pay = [grp[c].tolist() for c in self.payload]
            tombs = [bool(t) for t in grp[self.tombstone_col].tolist()]
            frame, new_cur = _changelog_for_key(
                ukey, seqs, pay, tombs, cur,
                self.keys, self.payload, self.seq_col, self.out_columns,
            )
            if new_cur is None:
                if cur is not None:
                    self.state.removeKey(ukey)
            else:
                # _pykey also for the VALUE tuple: normalized Int64
                # payload cells surface as pd.NA / np scalars here
                self.state.updateValue(ukey, self._pykey(new_cur))
            if frame is not None:
                frames.append(frame)
        if frames:
            yield pd.concat(frames, ignore_index=True)

    def close(self) -> None:
        pass


def _ktable_plan(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    payload: list[str],
    tombstone_col: str | None,
) -> tuple[_LatestPerKey, StructType]:
    """Shared processor + output schema for the stream and batch paths."""
    in_schema = df.schema
    state_schema = StructType(
        [StructField(c, in_schema[c].dataType, True) for c in payload]
    )
    key_fields = [StructField(k, in_schema[k].dataType, True) for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("action", StringType(), False),
            StructField("old_present", BooleanType(), False),
        ]
        + [StructField(f"old_{c}", in_schema[c].dataType, True) for c in payload]
        + [StructField(f"new_{c}", in_schema[c].dataType, True) for c in payload]
        + [StructField(seq_col, in_schema[seq_col].dataType, True)]
    )
    proc = _LatestPerKey(
        keys, seq_col, payload, tombstone_col, state_schema,
        [f.name for f in out_schema.fields],
    )
    return proc, out_schema


def _shield_payload(df: DataFrame, payload: list[str]) -> DataFrame:
    """exact_longs: LongType payload columns ride the Arrow crossing as
    decimal(20,0) so null-mixed batches can't round values above 2^53
    (see _pdnorm.shield_long). State/output schemas keep LongType —
    output cells come back as exact ints."""
    from pyspark.sql import functions as F

    sch = df.schema
    return df.select(
        *[
            shield_long(F.col(c), sch[c].dataType).alias(c)
            if c in payload and is_shielded(sch[c].dataType) else F.col(c)
            for c in df.columns
        ]
    )


def ktable_changelog_stream(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    payload: list[str],
    tombstone_col: str | None = None,
    n_buckets: int | None = None,
    exact_longs: bool = False,
) -> DataFrame:
    """Incremental latest-per-key view over a streaming changelog.

    df: streaming DataFrame of raw changelog records (key cols, payload
    cols, a monotonic seq col, optionally a boolean tombstone col).
    Returns the derived changelog (KTable.toStream): one row per input
    update with columns keys..., action ('upsert'|'delete'),
    old_present (did the key hold a value before this update — lets
    consumers distinguish a first insert from an update whose old
    payload happens to be all-null), old_<payload>..., new_<payload>...,
    and the originating seq (for downstream ordering, e.g. the FK join).

    n_buckets: when set, group the stateful operator by
    pmod(xxhash64(keys), n_buckets) instead of the logical keys —
    identical output, ~(keys/buckets)x less per-key TWS framework
    overhead (see _LatestPerKeyBucketed). Pick >= 2-4x total cores.

    exact_longs: when True, LongType payload columns ride the Arrow
    crossing as decimal(20,0) so a null-mixed micro-batch cannot round
    values above 2^53 (see _pdnorm.shield_long; the PK/FK joins shield
    unconditionally because their union mixes nulls by construction).
    Off by default — the crossing is cheaper and the normalize step
    RAISES if an unshielded batch would actually have lost precision.
    """
    from pyspark.sql import functions as F

    _require_rocksdb(df.sparkSession)
    # project to exactly the consumed columns BEFORE the keyed shuffle:
    # every extra column rides the exchange AND the JVM->Arrow->pandas
    # per-key chunking, the dominant cost of the TWS path (see SCALE.md)
    needed = list(dict.fromkeys(
        keys + [seq_col] + payload + ([tombstone_col] if tombstone_col else [])
    ))
    # Kafka Streams drops records with a null key for all KTable
    # operations ("records with null key are ignored") — mirror that.
    # This also keeps the TWS grouping exact: pyspark's worker-side
    # group splitting reads keys from the pandas-converted batch, and a
    # single null in an int64 key column upcasts the whole column to
    # float64, corrupting every key above 2^53 in that batch.
    df = df.select(*needed).na.drop(subset=keys)
    if n_buckets is None:
        proc, out_schema = _ktable_plan(df, keys, seq_col, payload, tombstone_col)
        if exact_longs:  # AFTER the plan: schemas keep LongType
            df = _shield_payload(df, payload)
        return df.groupBy(*keys).transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    _, out_schema = _ktable_plan(df, keys, seq_col, payload, tombstone_col)
    in_schema = df.schema
    key_schema = StructType(
        [StructField(k, in_schema[k].dataType, True) for k in keys]
    )
    state_schema = StructType(
        [StructField(c, in_schema[c].dataType, True) for c in payload]
    )
    proc = _LatestPerKeyBucketed(
        keys, seq_col, payload, tombstone_col,
        key_schema, state_schema, [f.name for f in out_schema.fields],
    )
    if exact_longs:  # AFTER the schemas: state/output keep LongType
        df = _shield_payload(df, payload)
    bucketed = df.withColumn(
        "_kt_bucket", F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("_kt_bucket").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def ktable_changelog_batch(
    df: DataFrame,
    keys: list[str],
    seq_col: str,
    payload: list[str],
    tombstone_col: str | None = None,
    exact_longs: bool = False,
) -> DataFrame:
    """Same state machine over a BATCH changelog frame via grouped
    replay (applyInPandas; no TWS/protobuf dependency) — emits the
    identical changelog rows. See streaming/replay.py for when/why."""
    from kafka_streams_app_spark.streaming.replay import grouped_replay

    df = df.na.drop(subset=keys)  # Kafka null-key drop, as in the stream path
    proc, out_schema = _ktable_plan(df, keys, seq_col, payload, tombstone_col)
    if exact_longs:  # AFTER the plan: schemas keep LongType
        df = _shield_payload(df, payload)
    return grouped_replay(df, keys, proc, out_schema)


def changelog_to_intervals(
    changelog: DataFrame,
    keys: list[str],
    seq_col: str,
    payload: list[str],
) -> DataFrame:
    """Project a latest-per-key changelog (the output of
    ktable_changelog_stream/_batch, with seq_col INCLUDED in its
    payload so old_<seq_col> is available) into SCD2 interval EVENTS —
    the incremental maintenance stream of operators/ktable.py:
    table_history:

    - every update with a prior value emits a CLOSE for the previous
      version: (old payload, valid_from = old seq, valid_to = this
      seq);
    - every upsert emits an OPEN for the new version:
      (new payload, valid_from = this seq, valid_to = NULL);
    - a delete emits only the CLOSE (tombstones end an interval and
      open none); a delete of an absent key emits nothing.

    The materialized history = ONE row per (keys, valid_from), keeping
    the row with the non-null valid_to when both exist (the CLOSE
    supersedes its OPEN; both carry the same payload by construction,
    so the reduction is groupBy(keys, payload, valid_from) .
    agg(max(valid_to))). That reduced table equals the batch
    table_history bit-for-bit — the oracle's pin.

    Pure projection: no state beyond the upstream changelog operator,
    no extra shuffle (explode is scan-stage).
    """
    from pyspark.sql import functions as F

    seq_t = changelog.schema[seq_col].dataType
    iv_fields = lambda vals, vf, vt: F.struct(
        *[v.alias(c) for c, v in zip(payload, vals)],
        vf.alias("valid_from"),
        vt.alias("valid_to"),
    )
    # typed empty array: a zero-length slice of a one-null-struct
    # array (F.array().cast cannot spell arbitrary payload types)
    _empty_struct = iv_fields(
        [F.lit(None).cast(changelog.schema[f"new_{c}"].dataType)
         for c in payload],
        F.lit(None).cast(seq_t),
        F.lit(None).cast(seq_t),
    )
    empty = F.slice(F.array(_empty_struct), 1, 0)
    close = F.when(
        F.col("old_present"),
        F.array(iv_fields(
            [F.col(f"old_{c}") for c in payload],
            F.col(f"old_{seq_col}").cast(seq_t),
            F.col(seq_col),
        )),
    ).otherwise(empty)
    opened = F.when(
        F.col("action") == "upsert",
        F.array(iv_fields(
            [F.col(f"new_{c}") for c in payload],
            F.col(seq_col),
            F.lit(None).cast(seq_t),
        )),
    ).otherwise(empty)
    return changelog.select(
        *keys, F.explode(F.concat(close, opened)).alias("_iv")
    ).select(*keys, "_iv.*")
