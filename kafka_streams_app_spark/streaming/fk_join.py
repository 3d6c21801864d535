"""Incremental KTable-KTable foreign-key join with re-subscription
(SURVEY.md §7.1 M4 — the hardest operator).

Reference: leftTable.join(rightTable, fkExtractor, joiner)
(/root/reference/src/main/scala/com/ayoubom/kafka/apps/ForeignJoin.scala:37-42).
Kafka implements this with internal subscription/response topics: the
left side publishes (fk -> pk) subscriptions, partitioned BY FK so each
right-side task can answer lookups locally; an FK change re-routes the
subscription. This module mirrors that architecture Spark-first:

  left raw changelog
    -> ktable_changelog_stream (keyed by pk; emits old_fk/new_fk)   [query 1]
    -> fk_instructions (stateless flatMap: sub/unsub per FK change)
    -> union with tagged right changelog
    -> groupBy(fk) + transformWithStateInPandas                      [query 2]
       state per fk: right value + subscription map {pk -> left payload}
    -> join changelog (pk, action, left payload, right value)

The groupBy(fk) shuffle IS Kafka's subscription topic; the two chained
stateful queries are connected by an intermediate changelog directory
(Kafka's response topic) because Spark disallows two update-mode
stateful operators in one query — see FKJoinReplay.

Correct (bug-free) semantics pinned by tests/test_fk_join_stream.py,
fixing the reference's documented upstream bugs
(TopologiesTest.scala:101,117,134 comments):
- delete of a joined left row emits exactly ONE retraction (not two);
- FK change to nonexistent/null emits one retraction, no spurious row;
- inner join emits nothing for unmatched subscribes.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
from kafka_streams_app_spark.streaming.harness import MicroBatchReplay
from kafka_streams_app_spark.streaming.ktable import (
    _require_rocksdb,
    ktable_changelog_stream,
)

KIND_SUB = "sub"
KIND_UNSUB_MOVE = "unsub_move"      # FK changed: leave the old FK group
KIND_UNSUB_DELETE = "unsub_delete"  # left row deleted
KIND_RIGHT = "right"


def fk_instructions(
    left_view: DataFrame, pk: str, fk: str, payload: list[str], seq_col: str
) -> DataFrame:
    """Stateless flatMap of the left view changelog into subscription
    instructions partitioned by FK (Kafka's subscription topic records).

    One changelog row yields:
    - upsert, FK unchanged (or first insert): [sub(new_fk)]
    - upsert, FK changed: [unsub_move(old_fk), sub(new_fk)]
    - delete: [unsub_delete(old_fk)]
    `minor` orders unsub before sub at equal seq.
    """
    val_cols = [c for c in payload if c != fk]
    old_fk, new_fk = F.col(f"old_{fk}"), F.col(f"new_{fk}")
    fk_changed = F.col("old_present") & ~old_fk.eqNullSafe(new_fk)

    def instr(kind: str, fk_col, minor: int, with_payload: bool):
        return F.struct(
            fk_col.alias("fk"),
            F.lit(kind).alias("kind"),
            F.col(pk).alias("pk"),
            *[
                (F.col(f"new_{c}") if with_payload else F.lit(None).cast(
                    left_view.schema[f"new_{c}"].dataType)).alias(c)
                for c in val_cols
            ],
            F.col(seq_col).alias("seq"),
            F.lit(minor).alias("minor"),
        )

    sub = instr(KIND_SUB, new_fk, 1, True)
    unsub_move = instr(KIND_UNSUB_MOVE, old_fk, 0, False)
    unsub_delete = instr(KIND_UNSUB_DELETE, old_fk, 0, False)

    arr = (
        F.when(F.col("action") == "delete", F.array(unsub_delete))
        .when(fk_changed, F.array(unsub_move, sub))
        .otherwise(F.array(sub))
    )
    return left_view.select(F.explode(arr).alias("i")).select("i.*")


class _SubsView:
    """Current subscription view for ONE fk during a batch: a pre-batch
    snapshot (or a point-lookup fallback when no snapshot was taken)
    overlaid with this batch's mutations.

    Why an overlay: state writes made earlier in a batch are not
    guaranteed visible to MapState.iterator()/containsKey() within the
    same batch, so a same-batch sub followed by a right update would
    miss the fan-out without it. The caller mirrors `touched` to the
    real state after the transition.
    """

    def __init__(self, snapshot: dict | None, contains_fn=None) -> None:
        self._snap = snapshot        # pre-batch {pk: left payload}
        self._contains = contains_fn  # pre-batch point membership
        self.touched: dict = {}       # pk -> payload | None (= removed)

    def set(self, pk, pay: tuple) -> None:
        self.touched[pk] = pay

    def remove(self, pk) -> None:
        self.touched[pk] = None

    def contains(self, pk) -> bool:
        if pk in self.touched:
            return self.touched[pk] is not None
        if self._snap is not None:
            return pk in self._snap
        return bool(self._contains(pk))

    def items(self):
        """Full current view — fan-out on right-side records. Only legal
        when a snapshot was taken (the bucketed processor guarantees one
        for every fk with right-side records in the batch)."""
        cur = dict(self._snap)
        for pk, pay in self.touched.items():
            if pay is None:
                cur.pop(pk, None)
            else:
                cur[pk] = pay
        return cur.items()


def _fk_apply(
    records: list[dict],
    r_present: bool,
    r_val: tuple,
    subs: _SubsView,
    left_cols: list[str],
    right_cols: list[str],
    left_join: bool,
) -> tuple[list[tuple], bool, tuple]:
    """FK-join state transition for ONE fk's in-order records. Returns
    (output rows, new right state); subscription mutations accumulate
    in `subs.touched`. Shared by the per-fk and bucketed processors —
    identical emissions by construction."""
    r_nulls = (None,) * len(right_cols)
    l_nulls = (None,) * len(left_cols)
    out: list[tuple] = []

    for rec in records:
        kind, pk = rec["kind"], pynative(rec["pk"])
        om = (pynative(rec["seq"]), pynative(rec["minor"]))  # order tag
        if kind == KIND_RIGHT:
            if pynative(rec["right_is_delete"]):
                if r_present:
                    r_present, r_val = False, ()
                    for spk, spay in subs.items():
                        out.append(
                            ((spk, "upsert") + spay + r_nulls if left_join
                             else (spk, "delete") + l_nulls + r_nulls) + om
                        )
            else:
                r_present = True
                r_val = pykey(rec[c] for c in right_cols)
                for spk, spay in subs.items():
                    out.append((spk, "upsert") + spay + r_val + om)
        elif kind == KIND_SUB:
            pay = pykey(rec[c] for c in left_cols)
            subs.set(pk, pay)
            if left_join:
                out.append(
                    (pk, "upsert") + pay + (r_val if r_present else r_nulls) + om
                )
            elif r_present:
                out.append((pk, "upsert") + pay + r_val + om)
        else:  # unsub_move / unsub_delete
            if subs.contains(pk):
                subs.remove(pk)
                if left_join:
                    if kind == KIND_UNSUB_DELETE:
                        out.append((pk, "delete") + l_nulls + r_nulls + om)
                    # unsub_move: the paired sub's upsert supersedes
                elif r_present:
                    # a join row existed for this pk iff right present
                    out.append((pk, "delete") + l_nulls + r_nulls + om)
    return out, r_present, r_val


class _FKJoinProcessor(StatefulProcessor):
    """Per-FK-group state: current right value + {pk -> left payload}."""

    def __init__(
        self,
        left_cols: list[str],
        right_cols: list[str],
        sub_schema: StructType,
        right_schema: StructType,
        out_columns: list[str],
        how: str,
        pk_schema: StructType,
    ) -> None:
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.sub_schema = sub_schema
        self.right_schema = right_schema
        self.out_columns = out_columns
        self.how = how
        self.pk_schema = pk_schema
        # LongType columns are decimal-shielded (arrive object-exact);
        # pin the remaining integral/bool columns to extension dtypes
        # right_cols are the r_-prefixed union column names; the state
        # schema fields are positional twins with the original names
        self._norm_fields = [
            (c, dt)
            for c, dt in [("pk", pk_schema["pk"].dataType)]
            + [(c, sub_schema[c].dataType) for c in left_cols]
            + [(c, f.dataType) for c, f in zip(right_cols, right_schema.fields)]
            if not is_shielded(dt)
        ]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.right = handle.getValueState("right", self.right_schema)
        self.subs = handle.getMapState("subs", self.pk_schema, self.sub_schema)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        # normalize BEFORE touching cells: instruction rows carry nulls
        # in the r_* columns and right rows in the left columns BY
        # CONSTRUCTION, so int64 payloads would otherwise arrive float64
        # and round above 2^53 (see _pdnorm.py)
        pdf = normalize_nullable(
            pd.concat(list(rows)).sort_values(["seq", "minor"], kind="stable"),
            self._norm_fields,
        )
        r_present = self.right.exists()
        r_val: tuple = tuple(self.right.get()) if r_present else ()
        subs = _SubsView({k[0]: tuple(v) for k, v in self.subs.iterator()})
        out, r_present, r_val = _fk_apply(
            pdf.to_dict("records"), r_present, r_val, subs,
            self.left_cols, self.right_cols, self.how == "left",
        )
        for pk, pay in subs.touched.items():
            if pay is None:
                self.subs.removeKey((pk,))
            else:
                self.subs.updateValue((pk,), pay)
        if r_present:
            self.right.update(r_val)
        else:
            self.right.clear()
        if out:
            # dtype=object: pandas would infer mixed None/int64 columns
            # as float64, rounding values above 2^53 (see ktable.py)
            yield pd.DataFrame(out, columns=self.out_columns, dtype=object)

    def close(self) -> None:
        pass


class _FKJoinProcessorBucketed(StatefulProcessor):
    """FK join over a BUCKETED fk space: the TWS grouping key is
    pmod(xxhash64(fk), n_buckets); per-fk state lives in two MapStates —
    right values keyed by (fk,), subscriptions keyed by (fk, pk).

    Same trade as ktable._LatestPerKeyBucketed: TWS pays a fixed
    framework cost per grouping key per micro-batch, so bucketing
    divides it by (fks/buckets) while the per-fk transition stays
    identical (_fk_apply).

    Fan-out on a right-side record needs every subscription of that fk;
    MapState has no prefix scan, so the processor takes ONE pass over
    the bucket's subscription map per batch, keeping only fks that have
    right-side records in the batch (sub/unsub-only batches skip the
    scan entirely — membership checks are point lookups). Cost:
    O(subscriptions in bucket) per batch WITH right traffic, vs the
    per-fk mode's O(subs of that fk). Size n_buckets so a bucket's
    subscription state stays scannable (>= 2-4x cores, more under very
    large left tables); under fan-out-heavy skew the per-fk mode
    remains the better layout.
    """

    def __init__(
        self,
        left_cols: list[str],
        right_cols: list[str],
        sub_schema: StructType,
        right_schema: StructType,
        out_schema: StructType,
        how: str,
        fk_schema: StructType,
        fkpk_schema: StructType,
    ) -> None:
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.sub_schema = sub_schema
        self.right_schema = right_schema
        self.out_columns = [f.name for f in out_schema.fields]
        # per-output-column Spark types drive the dense (native-dtype)
        # emission path — see _pdnorm.dense_input/_fast_path
        self._out_types = {f.name: f.dataType for f in out_schema.fields}
        self.how = how
        self.fk_schema = fk_schema
        self.fkpk_schema = fkpk_schema
        # LongType columns are decimal-shielded (arrive object-exact);
        # pin the remaining integral/bool columns to extension dtypes
        # right_cols are the r_-prefixed union column names; the state
        # schema fields are positional twins with the original names
        self._norm_fields = [
            (c, dt)
            for c, dt in [("fk", fk_schema["fk"].dataType),
                          ("pk", fkpk_schema["pk"].dataType)]
            + [(c, sub_schema[c].dataType) for c in left_cols]
            + [(c, f.dataType) for c, f in zip(right_cols, right_schema.fields)]
            if not is_shielded(dt)
        ]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.right = handle.getMapState("right", self.fk_schema, self.right_schema)
        self.subs = handle.getMapState("subs", self.fkpk_schema, self.sub_schema)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdf = normalize_nullable(
            pd.concat(list(rows))
            .sort_values(["seq", "minor"], kind="stable")
            .reset_index(drop=True),
            self._norm_fields,
        )
        # one subscription-map pass, only when the batch carries right-
        # side records, filtered to exactly those fks (fan-out inputs)
        fks_right = {
            pynative(v)
            for v in pdf.loc[pdf["kind"] == KIND_RIGHT, "fk"].unique()
        }
        snapshots: dict = {fk: {} for fk in fks_right}
        if fks_right:
            for k, v in self.subs.iterator():
                fk, pk = k[0], k[1]
                if fk in snapshots:
                    snapshots[fk][pk] = tuple(v)
        kinds = pdf["kind"]
        if (
            not bool(kinds.isin([KIND_UNSUB_MOVE, KIND_UNSUB_DELETE]).any())
            and not bool(pdf["right_is_delete"].any())
        ):
            yield from self._fast_path(pdf, snapshots)
            return
        yield from self._slow_path(pdf, snapshots)

    def _fast_path(
        self, pdf: pd.DataFrame, snapshots: dict
    ) -> Iterator[pd.DataFrame]:
        """Vectorized sub/right-upsert path (the common batch shape: the
        left table emits only subscribes while its FKs are stable, the
        right side only upserts).

        Two emission families, both built as NATIVE-dtype numpy /
        pandas-extension columns (r7): the N:1 fan-out makes the OUTPUT
        the dominant volume (17x the input on the 1M-event smoke), and
        object-dtype output columns made the python->JVM Arrow crossing
        pay per-cell conversion — 12.2 s per 17.3M decimal-shielded
        long cells vs ~0 s native (measured; see _pdnorm.dense_input).
        Input columns convert to (values, null-mask) pairs ONCE
        (O(inputs)); every emission is then numpy takes over native
        arrays, and each output column finalizes as float64 (NaN==null,
        matching the object path) or an Integer/Boolean extension array.

        - subscribe rows: the joining right value is the most recent
          right row of the same fk (per-fk cummax over row pointers,
          exactly the PK join's partner-resolution trick) or the fk's
          right state.
        - right rows: fan out to every pk subscribed AT THAT ROW. Per
          fk, a (rows+1) x pks matrix of 'latest in-batch sub ordinal'
          is forward-filled with np.maximum.accumulate; its right-row
          slices give, per (right row, pk) pair, the sub whose payload
          joins (or the pre-batch snapshot payload). Pairs materialize
          by np.nonzero(present) fancy-indexing — transient memory is
          O(live pairs), never the unmasked rows x pks cross product.
        """
        import numpy as np

        from kafka_streams_app_spark.streaming._pdnorm import (
            dcol_concat,
            dcol_finalize,
            dcol_from_list,
            dcol_in,
            dcol_nullify,
            dcol_state,
            dcol_take,
            dcol_where,
        )

        left_join = self.how == "left"
        n = len(pdf)
        idx = np.arange(n)
        kinds = pdf["kind"].to_numpy()
        is_right = kinds == KIND_RIGHT
        codes, uniques = pd.factorize(pdf["fk"], use_na_sentinel=False)
        ufks = [pynative(k) for k in uniques]
        r_states = [self.right.getValue((k,)) for k in ufks]
        rptr = pd.Series(np.where(is_right, idx, -1)).groupby(codes).cummax().to_numpy()
        r_state_present = np.array([s is not None for s in r_states])[codes]
        r_present = (rptr >= 0) | r_state_present
        # object copies for state writes / python dict keys (O(inputs))
        pk_arr = pdf["pk"].to_numpy(dtype=object)
        l_arrs = {c: pdf[c].to_numpy(dtype=object) for c in self.left_cols}
        r_arrs = {c: pdf[c].to_numpy(dtype=object) for c in self.right_cols}

        # dense/object dual representation of every output-bound column
        # ((kind, values, mask) triples — see _pdnorm's dcol_* family);
        # input conversions are O(inputs), emissions are numpy takes.
        def in_col(src: str, out: str):
            return dcol_in(pdf, src, self._out_types[out])

        take, where, nullify = dcol_take, dcol_where, dcol_nullify
        from_list, state_pairs, concat = dcol_from_list, dcol_state, dcol_concat

        pk_col = in_col("pk", "pk")
        seq_col = in_col("seq", "_seq")
        minor_col = in_col("minor", "_minor")
        l_cols = {c: in_col(c, c) for c in self.left_cols}
        r_cols = {c: in_col(c, c) for c in self.right_cols}

        # --- subscribe emissions (bucket-wide, vectorized) ---
        emit_sub = ~is_right if left_join else (~is_right & r_present)
        blocks: list[dict] = []
        if emit_sub.any():
            blk = {
                "pk": take(pk_col, emit_sub),
                **{c: take(l_cols[c], emit_sub) for c in self.left_cols},
                "_seq": take(seq_col, emit_sub),
                "_minor": take(minor_col, emit_sub),
                "_pos": idx[emit_sub],
                "_ord": np.zeros(int(emit_sub.sum()), dtype=np.int64),
            }
            rptr_pos = np.maximum(rptr, 0)
            for j, c in enumerate(self.right_cols):
                own = r_cols[c]
                sv_k, sv_v, sv_m = state_pairs(r_states, j, own[0])
                sv = (sv_k, sv_v[codes],
                      sv_m[codes] if sv_m is not None else None)
                vals = where(rptr >= 0, take(own, rptr_pos), sv)
                blk[c] = take(nullify(vals, ~r_present), emit_sub)
            blocks.append(blk)

        # --- right-row fan-out (per fk with right rows; numpy inside) ---
        ords = np.empty(n, dtype=np.int64)
        for code in np.unique(codes[is_right]):
            g = idx[codes == code]  # this fk's rows, ascending (sorted)
            g_is_right = is_right[g]
            sub_rows = g[~g_is_right]
            right_rows = g[g_is_right]
            snap = snapshots.get(ufks[code], {})
            # pk universe: snapshot first (dict iteration order), then
            # in-batch subs in first-seen order — the same order the
            # per-record machine's subs dict would hold
            pk_list = list(snap.keys())
            pk_index = {pk: j for j, pk in enumerate(pk_list)}
            sub_pkcodes = np.empty(len(sub_rows), dtype=np.int64)
            for i, row in enumerate(sub_rows):
                pk = pynative(pk_arr[row])
                j = pk_index.get(pk)
                if j is None:
                    j = pk_index[pk] = len(pk_list)
                    pk_list.append(pk)
                sub_pkcodes[i] = j
            P = len(pk_list)
            if P == 0:
                continue
            n_g = len(g)
            # ordinal of each group row within the group
            ords[g] = np.arange(n_g)
            # latest in-batch sub INDEX (into sub_rows) per (row, pk)
            M = np.full((n_g + 1, P), -1, dtype=np.int64)
            M[ords[sub_rows] + 1, sub_pkcodes] = np.arange(len(sub_rows))
            np.maximum.accumulate(M, axis=0, out=M)
            L = M[ords[right_rows] + 1]  # (r x P)
            has_state = np.array([pk in snap for pk in pk_list], dtype=bool)
            present = (L >= 0) | has_state[None, :]
            ri, pi = np.nonzero(present)  # live (right row, pk) pairs only
            if len(ri) == 0:
                continue
            sel = L[ri, pi]  # sub index per pair; -1 = snapshot payload
            use_sub = sel >= 0
            sel_pos = np.maximum(sel, 0)
            blk = {
                "pk": take(from_list(pk_list, pk_col[0]), pi),
                "_seq": take(take(seq_col, right_rows), ri),
                "_minor": take(take(minor_col, right_rows), ri),
                "_pos": right_rows[ri],
                "_ord": pi.astype(np.int64),
            }
            snap_tuples = [snap.get(pk) for pk in pk_list]
            for j, c in enumerate(self.left_cols):
                snap_col = take(
                    state_pairs(snap_tuples, j, l_cols[c][0]), pi)
                if len(sub_rows):
                    own_pairs = take(take(l_cols[c], sub_rows), sel_pos)
                    blk[c] = where(use_sub, own_pairs, snap_col)
                else:
                    blk[c] = snap_col
            for c in self.right_cols:
                blk[c] = take(take(r_cols[c], right_rows), ri)
            blocks.append(blk)

        if blocks:
            # emission order of the per-record machine: triggering
            # record order, then subs-dict order within a fan-out
            pos = np.concatenate([b["_pos"] for b in blocks])
            ordn = np.concatenate([b["_ord"] for b in blocks])
            order = np.lexsort((ordn, pos))
            data = {}
            for nm in self.out_columns:
                if nm == "action":
                    data[nm] = "upsert"
                    continue
                data[nm] = dcol_finalize(
                    take(concat([b[nm] for b in blocks]), order))
            yield pd.DataFrame(data, columns=self.out_columns)

        # --- state mirror (Python per distinct key only) ---
        sub_mask = ~is_right
        if sub_mask.any():
            sub_view = pdf.loc[sub_mask, ["fk", "pk"]]
            last = ~sub_view.duplicated(["fk", "pk"], keep="last")
            for row in sub_view.index[last]:
                self.subs.updateValue(
                    (ufks[codes[row]], pynative(pk_arr[row])),
                    pykey(l_arrs[c][row] for c in self.left_cols),
                )
        rmax = pd.Series(np.where(is_right, idx, -1)).groupby(codes).max()
        for code, ufk in enumerate(ufks):
            last_r = int(rmax[code])
            if last_r >= 0:
                self.right.updateValue(
                    (ufk,), pykey(r_arrs[c][last_r] for c in self.right_cols)
                )

    def _slow_path(
        self, pdf: pd.DataFrame, snapshots: dict
    ) -> Iterator[pd.DataFrame]:
        out: list[tuple] = []
        left_join = self.how == "left"
        # groupby preserves within-group row order: per-fk seq order
        for ufk, grp in pdf.groupby("fk", sort=False, dropna=False):
            ufk = pynative(ufk)
            r_val0 = self.right.getValue((ufk,))
            subs = _SubsView(
                snapshots.get(ufk),
                lambda pk, _fk=ufk: self.subs.containsKey((_fk, pk)),
            )
            rows_out, r_present, r_val = _fk_apply(
                grp.to_dict("records"),
                r_val0 is not None, tuple(r_val0) if r_val0 is not None else (),
                subs, self.left_cols, self.right_cols, left_join,
            )
            out.extend(rows_out)
            for pk, pay in subs.touched.items():
                if pay is None:
                    self.subs.removeKey((ufk, pk))
                else:
                    self.subs.updateValue((ufk, pk), pay)
            if r_present:
                self.right.updateValue((ufk,), pykey(r_val))
            elif r_val0 is not None:
                self.right.removeKey((ufk,))
        if out:
            yield pd.DataFrame(out, columns=self.out_columns, dtype=object)

    def close(self) -> None:
        pass


def _fk_join_plan(
    instructions: DataFrame,
    right_raw: DataFrame,
    *,
    right_key: str,
    right_payload: list[str],
    right_seq: str,
    right_tombstone: str | None,
    left_value_cols: list[str],
    how: str,
    n_buckets: int | None = None,
) -> tuple[DataFrame, StatefulProcessor, StructType, list[str]]:
    """Shared union-tag input + processor + output schema for the
    stream (TWS) and batch (grouped replay) paths. Returns the tagged
    union, the processor, the output schema, and the grouping columns
    (fk, or the derived bucket column when n_buckets is set)."""
    r_schema = right_raw.schema
    # instruction rows are null in the r_* columns and right rows in
    # the pk/left columns BY CONSTRUCTION (and unsub/null-FK rows can
    # carry a null fk), so every LongType among them rides the Arrow
    # crossing as decimal(20,0) — see _pdnorm.shield_long
    fk_type = instructions.schema["fk"].dataType
    pk_type_in = instructions.schema["pk"].dataType
    tagged_right = right_raw.select(
        shield_long(F.col(right_key), fk_type).alias("fk"),
        F.lit(KIND_RIGHT).alias("kind"),
        shield_long(F.lit(None).cast(pk_type_in), pk_type_in).alias("pk"),
        *[shield_long(F.lit(None).cast(instructions.schema[c].dataType),
                      instructions.schema[c].dataType).alias(c)
          for c in left_value_cols],
        F.col(right_seq).alias("seq"),
        F.lit(2).alias("minor"),
        *[shield_long(F.col(c), r_schema[c].dataType).alias(f"r_{c}")
          for c in right_payload],
        (F.col(right_tombstone) if right_tombstone else F.lit(False))
        .alias("right_is_delete"),
    )
    tagged_left = instructions.select(
        shield_long(F.col("fk"), fk_type).alias("fk"),
        "kind",
        shield_long(F.col("pk"), pk_type_in).alias("pk"),
        *[shield_long(F.col(c), instructions.schema[c].dataType).alias(c)
          for c in left_value_cols],
        "seq", "minor",
        *[shield_long(F.lit(None).cast(r_schema[c].dataType),
                      r_schema[c].dataType).alias(f"r_{c}")
          for c in right_payload],
        F.lit(False).alias("right_is_delete"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    sub_schema = StructType(
        [StructField(c, instructions.schema[c].dataType, True)
         for c in left_value_cols]
    )
    right_state_schema = StructType(
        [StructField(c, r_schema[c].dataType, True) for c in right_payload]
    )
    pk_type = instructions.schema["pk"].dataType
    out_schema = StructType(
        [StructField("pk", pk_type, True),
         StructField("action", StringType(), False)]
        + [StructField(c, instructions.schema[c].dataType, True)
           for c in left_value_cols]
        + [StructField(f"r_{c}", r_schema[c].dataType, True)
           for c in right_payload]
        # ordering tag of the triggering instruction: lets consumers
        # reduce the changelog to an end state (latest per pk)
        + [StructField("_seq", instructions.schema["seq"].dataType, True),
           StructField("_minor", instructions.schema["minor"].dataType, True)]
    )
    out_columns = [f.name for f in out_schema.fields]
    r_cols = [f"r_{c}" for c in right_payload]
    if n_buckets is None:
        proc: StatefulProcessor = _FKJoinProcessor(
            left_value_cols, r_cols, sub_schema, right_state_schema,
            out_columns, how, StructType([StructField("pk", pk_type)]),
        )
        return unioned, proc, out_schema, ["fk"]
    proc = _FKJoinProcessorBucketed(
        left_value_cols, r_cols, sub_schema, right_state_schema,
        out_schema, how,
        StructType([StructField("fk", fk_type)]),
        StructType([StructField("fk", fk_type), StructField("pk", pk_type)]),
    )
    unioned = unioned.withColumn(
        "_fkj_bucket", F.pmod(F.xxhash64("fk"), F.lit(n_buckets)).cast("int")
    )
    return unioned, proc, out_schema, ["_fkj_bucket"]


def fk_join_changelog_stream(
    instructions: DataFrame,
    right_raw: DataFrame,
    *,
    right_key: str,
    right_payload: list[str],
    right_seq: str,
    right_tombstone: str | None,
    left_value_cols: list[str],
    how: str = "inner",
    n_buckets: int | None = None,
) -> DataFrame:
    """Query-2 builder: union(instructions, tagged right changelog)
    -> groupBy(fk) -> stateful join processor -> join changelog
    (pk, action, left value cols, right payload cols).

    n_buckets: when set, group the stateful operator by
    pmod(xxhash64(fk), n_buckets) instead of the fk — identical output,
    ~(fks/buckets)x less per-fk TWS framework overhead
    (see _FKJoinProcessorBucketed for the fan-out scan trade).
    """
    _require_rocksdb(instructions.sparkSession)
    unioned, proc, out_schema, group_cols = _fk_join_plan(
        instructions, right_raw, right_key=right_key,
        right_payload=right_payload, right_seq=right_seq,
        right_tombstone=right_tombstone, left_value_cols=left_value_cols,
        how=how, n_buckets=n_buckets,
    )
    return unioned.groupBy(*group_cols).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def fk_join_changelog_batch(
    instructions: DataFrame,
    right_raw: DataFrame,
    *,
    right_key: str,
    right_payload: list[str],
    right_seq: str,
    right_tombstone: str | None,
    left_value_cols: list[str],
    how: str = "inner",
    n_buckets: int | None = None,
) -> DataFrame:
    """Same FK-join state machine over BATCH changelog frames via
    grouped replay (applyInPandas; no TWS/protobuf dependency). The
    groupBy(fk) shuffle — Kafka's subscription topic — is identical;
    only the state backend (in-task memory vs RocksDB) differs."""
    from kafka_streams_app_spark.streaming.replay import grouped_replay

    unioned, proc, out_schema, group_cols = _fk_join_plan(
        instructions, right_raw, right_key=right_key,
        right_payload=right_payload, right_seq=right_seq,
        right_tombstone=right_tombstone, left_value_cols=left_value_cols,
        how=how, n_buckets=n_buckets,
    )
    return grouped_replay(unioned, group_cols, proc, out_schema)


class FKJoinReplay:
    """Two-query FK-join pipeline with TopologyTestDriver-style piping.

    Query 1 (left KTable): left staging dir -> ktable_changelog_stream
    -> parquet intermediate (the "subscription response topic").
    Query 2 (join): intermediate + right staging dir -> fk instructions
    union right -> stateful FK join -> memory sink.

    pipe_left/pipe_right append one micro-batch and drive both queries to
    quiescence, so per-pipe drain() shows exactly the join changelog the
    reference's readOutputTopic() would.
    """

    def __init__(
        self,
        spark: SparkSession,
        left_schema: str,
        right_schema: str,
        *,
        pk: str,
        fk: str,
        left_payload: list[str],
        left_tombstone: str,
        right_key: str,
        right_payload: list[str],
        right_tombstone: str,
        how: str = "inner",
        n_buckets: int | None = None,
        sink: str = "memory",
    ) -> None:
        self.spark = spark
        name = f"fkjoin_{uuid.uuid4().hex[:12]}"
        self._dirs = [tempfile.mkdtemp(prefix=f"{name}_{x}_")
                      for x in ("inter", "ckpt1")]
        inter_dir, ckpt1 = self._dirs
        left_value_cols = [c for c in left_payload if c != fk]

        # query 1: left raw -> latest-per-key changelog -> intermediate dir
        self._left_replay_schema = left_schema
        self._left_staging = tempfile.mkdtemp(prefix=f"{name}_lsrc_")
        self._dirs.append(self._left_staging)
        def _build_left_view() -> DataFrame:
            left_src = (
                spark.readStream.schema(left_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(self._left_staging)
            )
            return ktable_changelog_stream(
                left_src, [pk], "seq", left_payload, left_tombstone,
                n_buckets=n_buckets,
            )

        def _start_q1():
            return (
                _build_left_view().writeStream.format("parquet")
                .option("path", inter_dir)
                .option("checkpointLocation", ckpt1)
                .outputMode("append")
                .start()
            )

        self._start_q1 = _start_q1
        self.q1 = _start_q1()
        # parquet sink needs at least one committed batch before a reader
        # can infer anything; we pass the schema explicitly instead.
        inter_schema = StructType(_build_left_view().schema.fields)

        # query 2: intermediate + right staging -> join changelog
        def build(right_src: DataFrame) -> DataFrame:
            inter = (
                spark.readStream.schema(inter_schema)
                .option("maxFilesPerTrigger", 1000)
                .parquet(inter_dir)
            )
            instr = fk_instructions(inter, pk, fk, left_payload, "seq")
            return fk_join_changelog_stream(
                instr,
                right_src,
                right_key=right_key,
                right_payload=right_payload,
                right_seq="seq",
                right_tombstone=right_tombstone,
                left_value_cols=left_value_cols,
                how=how,
                n_buckets=n_buckets,
            )

        self._right = MicroBatchReplay(
            spark, right_schema, build, "update", sink=sink
        )
        self.seq = 0

    def restart(self) -> None:
        """Crash-recovery for the WHOLE 2-stage pipeline: kill both
        queries and resume each from its own checkpoint (requires
        sink='parquet' — the join query's memory sink refuses
        checkpoint recovery). Query 1's ktable state, query 2's two
        join stores AND the committed offsets of the left staging,
        right staging and intermediate ("subscription response")
        parquet sources all come back from the checkpoints, so
        committed inputs are never re-read and nothing is re-emitted."""
        if self._right._sink != "parquet":
            raise RuntimeError(
                "restart() needs FKJoinReplay(sink='parquet') — the "
                "memory sink does not support checkpoint recovery"
            )
        self.q1.stop()
        self._right.restart()
        self.q1 = self._start_q1()

    def _next_seq(self) -> int:
        self.seq += 1
        return self.seq

    def pipe_left(self, rows: list[tuple]) -> None:
        """rows WITHOUT seq; seq is appended here (global pipe order)."""
        full = [r + (self._next_seq(),) for r in rows]
        df = self.spark.createDataFrame(full, self._left_replay_schema)
        df.coalesce(1).write.mode("append").parquet(self._left_staging)
        self.q1.processAllAvailable()
        self._right.query.processAllAvailable()

    def settle(self) -> None:
        """Drive both queries to quiescence without new input — after a
        restart this consumes any committed-but-unprocessed files."""
        self.q1.processAllAvailable()
        self._right.query.processAllAvailable()

    def crash_join_query(self) -> None:
        """Kill ONLY query 2 (the join) — with query 1 still running,
        this opens the mid-pipeline crash window where intermediate
        changelog files are committed with no consumer."""
        self._right.query.stop()

    def pipe_left_q1_only(self, rows: list[tuple]) -> None:
        """Deliver a left micro-batch through query 1 ONLY (the
        intermediate "subscription response" files get committed while
        query 2 is down) — restart() must then replay the handoff from
        query 2's checkpointed source offsets exactly once."""
        full = [r + (self._next_seq(),) for r in rows]
        df = self.spark.createDataFrame(full, self._left_replay_schema)
        df.coalesce(1).write.mode("append").parquet(self._left_staging)
        self.q1.processAllAvailable()

    def pipe_right(self, rows: list[tuple]) -> None:
        self._right.pipe([r + (self._next_seq(),) for r in rows])

    def drain(self) -> list[tuple]:
        """Join-changelog rows since last drain, ordering tag stripped."""
        return [tuple(x)[:-2] for x in self._right.drain()]

    def stop(self) -> None:
        self.q1.stop()
        self._right.stop()
        for d in self._dirs:
            shutil.rmtree(d, ignore_errors=True)

    def __enter__(self) -> FKJoinReplay:
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
