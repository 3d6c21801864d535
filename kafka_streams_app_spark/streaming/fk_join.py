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


def _fk_fast_batch(
    pdf: pd.DataFrame,
    snapshots: dict,
    r_state_of,
    pre_member,
    left_cols: list[str],
    right_cols: list[str],
    out_types: dict,
    out_columns: list[str],
    left_join: bool,
    compact_rights: bool = False,
):
    """Vectorized FK-join transition for a seq-sorted batch with NO
    right-side tombstones (sub / unsub_move / unsub_delete / right
    upserts — the gate and production-common shape; right deletes take
    the per-record _fk_apply path).

    r16: the r15 fast path only covered all-sub batches, so ANY batch
    carrying an FK change (unsub_move) fell back to per-record Python —
    at the sf0.1 gate shape (5 fks x 1500 pks x 200k instructions) that
    meant ~30M output tuples appended one by one (~20 s of the 41 s
    entry wall). This kernel vectorizes the mixed sub/unsub case with
    PRESENCE INTERVALS instead of the old (rows x pks) fan-out matrix:

    - per (fk, pk), the in-batch events (sub=+, unsub=-) split the
      batch into presence intervals: [sub row, next event row) with
      that sub's payload, plus [batch start, first event row) when the
      pk was subscribed pre-batch (snapshot payload). Presence after an
      event is simply (event is sub); an unsub is EFFECTIVE iff the
      previous event of the same pk is a sub, or there is none and the
      pk was a pre-batch member.
    - fan-out pairs = for each interval, the right rows of that fk
      whose row position falls inside it — two np.searchsorted calls
      per fk and one range-expansion; transient memory is O(events +
      live pairs), never rows x pks (the old dense matrix would be
      ~70 GB at the x10 smoke shape).
    - effective unsubs emit their delete rows (inner: iff the right
      side is present at that row; left: only unsub_delete), exactly
      _fk_apply's branches.

    Emission order matches the per-record machine: rows sort by
    (triggering row position, subscription-dict position); the
    subscription-dict position list is snapshot keys first (dict
    order), then in-batch subs in first-seen order — an unsub claims
    no position (an effective unsub of a non-snapshot pk cannot exist
    when a snapshot was taken, and fks without a snapshot have no
    right rows, so no fan-out reads the order).

    All output columns are built as native (kind, values, mask)
    triples (see _pdnorm.dense_input) — the 30M-row crossing stays
    vectorized on both sides.

    compact_rights (OPT-IN, default False — emissions then match the
    per-record machine row for row): within one batch, only the FINAL
    right row per fk fans out to its subscribers; sub/delete emissions
    and all state writes are untouched, and each sub still joins the
    latest right row AT ITS OWN POSITION (rptr scans every right row).
    This is Kafka Streams' KTable cache / commit-interval semantics
    (R_1..R_n compact to R_n within an interval) and matches Spark's
    update-mode contract (latest state per key per trigger). The
    reduced end state is provably unchanged — every dropped fan-out
    row (pk, R_i) at position p_i is superseded by a kept emission for
    the same pk at a strictly later position:
      * if pk's presence interval covers R_n: the kept fan-out
        (pk, R_n), p_n > p_i;
      * else the interval ended at an (effective) unsub at p_u > p_i,
        which emits a delete (inner mode / unsub_delete in left mode)
        or — left-mode unsub_move — is immediately followed by its
        paired sub at the same seq with a higher minor (fk_instructions
        always emits the pair), which re-emits the pk.
    Positions are (seq, minor)-sorted, so "later position" = ">= order
    tag"; with the engine's unique per-row (seq, minor) tags the
    superseding emission strictly wins any latest-per-key reduction.
    ONLY enable under such a reduction (the declared s_fk_* entries) —
    the raw changelog itself loses the intermediate fan-out rows.
    Randomized pin: tests/test_fk_fast_batch.py.

    Returns (frame | None, subs_ops, right_writes):
    - subs_ops: [(ufk, pk, payload tuple | None)] — None = removeKey;
      exactly the final touched-set of the per-record machine (a pk
      whose every event was an ineffective unsub gets NO op).
    - right_writes: [(ufk, right value tuple)] — last right row per fk.
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

    n = len(pdf)
    idx = np.arange(n)
    kinds_arr = pdf["kind"].to_numpy()
    is_right = kinds_arr == KIND_RIGHT
    is_sub = kinds_arr == KIND_SUB
    is_event = ~is_right
    codes, uniques = pd.factorize(pdf["fk"], use_na_sentinel=False)
    ufks = [pynative(k) for k in uniques]
    r_states = [r_state_of(k) for k in ufks]
    rptr = pd.Series(np.where(is_right, idx, -1)).groupby(codes).cummax().to_numpy()
    r_state_present = np.array([s is not None for s in r_states])[codes]
    r_present = (rptr >= 0) | r_state_present

    # object copies for state writes / python dict keys (O(inputs))
    pk_arr = pdf["pk"].to_numpy(dtype=object)
    l_arrs = {c: pdf[c].to_numpy(dtype=object) for c in left_cols}
    r_arrs = {c: pdf[c].to_numpy(dtype=object) for c in right_cols}

    def in_col(src: str, out: str):
        return dcol_in(pdf, src, out_types[out])

    take, where, nullify = dcol_take, dcol_where, dcol_nullify
    from_list, state_pairs, concat = dcol_from_list, dcol_state, dcol_concat

    pk_col = in_col("pk", "pk")
    seq_col = in_col("seq", "_seq")
    minor_col = in_col("minor", "_minor")
    l_cols = {c: in_col(c, c) for c in left_cols}
    r_cols = {c: in_col(c, c) for c in right_cols}

    def null_col(proto, m: int):
        k = proto[0]
        if k == "f":
            return "f", np.full(m, np.nan), None
        if k == "o":
            return "o", np.full(m, None, dtype=object), None
        vals = np.zeros(m, dtype=np.int64 if k == "i" else bool)
        return k, vals, np.ones(m, dtype=bool)

    blocks: list[dict] = []

    # --- subscribe emissions (bucket-wide, vectorized) ---
    emit_sub = is_sub if left_join else (is_sub & r_present)
    if emit_sub.any():
        blk = {
            "pk": take(pk_col, emit_sub),
            "_act": "upsert",
            **{c: take(l_cols[c], emit_sub) for c in left_cols},
            "_seq": take(seq_col, emit_sub),
            "_minor": take(minor_col, emit_sub),
            "_pos": idx[emit_sub],
            "_ord": np.zeros(int(emit_sub.sum()), dtype=np.int64),
        }
        rptr_pos = np.maximum(rptr, 0)
        for j, c in enumerate(right_cols):
            own = r_cols[c]
            sv_k, sv_v, sv_m = state_pairs(r_states, j, own[0])
            sv = (sv_k, sv_v[codes], sv_m[codes] if sv_m is not None else None)
            vals = where(rptr >= 0, take(own, rptr_pos), sv)
            blk[c] = take(nullify(vals, ~r_present), emit_sub)
        blocks.append(blk)

    subs_ops: list[tuple] = []
    right_writes: list[tuple] = []
    del_rows_all: list = []
    BIG = np.int64(2**62)

    for code in range(len(ufks)):
        g = idx[codes == code]
        g_right = g[is_right[g]]
        g_ev = g[is_event[g]]
        ufk = ufks[code]
        if len(g_right):
            right_writes.append(
                (ufk, pykey(r_arrs[c][g_right[-1]] for c in right_cols))
            )
        snap = snapshots.get(ufk)  # None iff this fk has no right rows
        m = len(g_ev)
        if m:
            # --- per-pk event ids, first-occurrence order
            pk_of_aid: list = []
            aid_index: dict = {}
            aids = np.empty(m, dtype=np.int64)
            for j, row in enumerate(g_ev):
                pk = pynative(pk_arr[row])
                a = aid_index.get(pk)
                if a is None:
                    a = aid_index[pk] = len(pk_of_aid)
                    pk_of_aid.append(pk)
                aids[j] = a
            A = len(pk_of_aid)
            ev_sub = is_sub[g_ev]  # presence AFTER an event == its kind
            order = np.argsort(aids, kind="stable")
            s_aids = aids[order]
            grp_start = np.r_[True, s_aids[1:] != s_aids[:-1]]
            grp_end = np.r_[grp_start[1:], True]
            # presence BEFORE each event: the previous event's kind, or
            # pre-batch membership at a group start
            s_presence_before = np.r_[False, ev_sub[order][:-1]]
            start_aids = s_aids[grp_start]
            if snap is not None:
                pre_mem_start = np.fromiter(
                    (pk_of_aid[a] in snap for a in start_aids), bool,
                    count=len(start_aids),
                )
            else:
                # point lookups ONLY for pks whose first in-batch event
                # is an unsub (a first-event sub needs no membership)
                first_is_sub = ev_sub[order][grp_start]
                pre_mem_start = np.zeros(len(start_aids), dtype=bool)
                for i2 in np.flatnonzero(~first_is_sub):
                    pre_mem_start[i2] = bool(
                        pre_member(ufk, pk_of_aid[start_aids[i2]])
                    )
            s_presence_before[grp_start] = pre_mem_start
            presence_before = np.empty(m, dtype=bool)
            presence_before[order] = s_presence_before
            eff_unsub = ~ev_sub & presence_before
            # --- delete emissions for effective unsubs (_fk_apply's
            # unsub branches verbatim)
            if left_join:
                del_mask = eff_unsub & (kinds_arr[g_ev] == KIND_UNSUB_DELETE)
            else:
                del_mask = eff_unsub & r_present[g_ev]
            if del_mask.any():
                del_rows_all.append(g_ev[del_mask])
            # --- state mirror per pk: final presence = last event kind;
            # a pk is "touched" iff it had a sub or was a pre-batch
            # member (its first unsub was then effective)
            pre_mem_aid = np.zeros(A, dtype=bool)
            pre_mem_aid[start_aids] = pre_mem_start
            had_sub = np.zeros(A, dtype=bool)
            np.logical_or.at(had_sub, aids, ev_sub)
            last_ev = np.empty(A, dtype=np.int64)
            last_ev[s_aids[grp_end]] = order[grp_end]
            for a in range(A):
                j_last = last_ev[a]
                if ev_sub[j_last]:
                    row = g_ev[j_last]
                    subs_ops.append(
                        (ufk, pk_of_aid[a],
                         pykey(l_arrs[c][row] for c in left_cols))
                    )
                elif had_sub[a] or pre_mem_aid[a]:
                    subs_ops.append((ufk, pk_of_aid[a], None))

        # --- fan-out pairs via presence intervals ---
        if len(g_right) == 0:
            continue
        # ordering universe: snapshot keys (dict order), then in-batch
        # subs in first-seen order — the subscription-dict order the
        # per-record machine's items() iterates
        pk_index = {pk: j2 for j2, pk in enumerate(snap)}
        pk_list = list(snap)
        if m:
            sub_j = np.flatnonzero(ev_sub)
            for j in sub_j:
                pk = pk_of_aid[aids[j]]
                if pk not in pk_index:
                    pk_index[pk] = len(pk_list)
                    pk_list.append(pk)
        else:
            sub_j = np.empty(0, dtype=np.int64)
        if not pk_list:
            continue
        # interval bounds: initial [batch start, first event of pk) for
        # snapshot members; [sub row, next event of pk) per sub
        init_b = np.full(len(snap), BIG, dtype=np.int64)
        if m:
            first_pos_aid = np.full(A, BIG, dtype=np.int64)
            first_pos_aid[start_aids] = g_ev[order][grp_start]
            for j2, pk in enumerate(snap):
                a = aid_index.get(pk)
                if a is not None:
                    init_b[j2] = first_pos_aid[a]
        init_a = np.full(len(snap), -1, dtype=np.int64)
        init_src = np.full(len(snap), -1, dtype=np.int64)
        init_ord = np.arange(len(snap), dtype=np.int64)
        if m and len(sub_j):
            nxt_sorted = np.where(
                grp_end, BIG, np.r_[g_ev[order][1:], BIG]
            )
            nxt = np.empty(m, dtype=np.int64)
            nxt[order] = nxt_sorted
            ord_of_aid = np.full(A, -1, dtype=np.int64)
            for pk, j2 in pk_index.items():
                a = aid_index.get(pk)
                if a is not None:
                    ord_of_aid[a] = j2
            sub_a = g_ev[sub_j]
            sub_b = nxt[sub_j]
            sub_src = g_ev[sub_j]
            sub_ord = ord_of_aid[aids[sub_j]]
            a_arr = np.concatenate([init_a, sub_a])
            b_arr = np.concatenate([init_b, sub_b])
            src_arr = np.concatenate([init_src, sub_src])
            ord_arr = np.concatenate([init_ord, sub_ord])
        else:
            a_arr, b_arr, src_arr, ord_arr = init_a, init_b, init_src, init_ord
        # per-trigger right compaction (r16): only the FINAL right row
        # of the fk in this batch fans out — Kafka Streams' KTable
        # cache compacts R_1..R_n to R_n within a commit interval, and
        # Spark's update-mode output contract is "the latest state per
        # key per trigger", so the intermediate fan-outs are emission
        # work no downstream reduction can ever observe (every dropped
        # row is superseded by a later kept emission for its pk — see
        # the proof sketch in this function's docstring). rptr/sub
        # emissions still
        # see EVERY right row, so a sub between R_i and R_n joins R_i.
        g_right_emit = g_right[-1:] if compact_rights else g_right
        lo = np.searchsorted(g_right_emit, a_arr, side="right")
        hi = np.searchsorted(g_right_emit, b_arr, side="left")
        cnt = np.maximum(hi - lo, 0)
        tot = int(cnt.sum())
        if tot == 0:
            continue
        reps = np.repeat(np.arange(len(cnt)), cnt)
        offs = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        right_rows_g = g_right_emit[lo[reps] + offs]
        pi = ord_arr[reps]
        srcs = src_arr[reps]
        blk = {
            "pk": take(from_list(pk_list, pk_col[0]), pi),
            "_act": "upsert",
            "_seq": take(seq_col, right_rows_g),
            "_minor": take(minor_col, right_rows_g),
            "_pos": right_rows_g,
            "_ord": pi.astype(np.int64),
        }
        snap_tuples = [snap.get(pk) for pk in pk_list]
        use_sub = srcs >= 0
        src_pos = np.maximum(srcs, 0)
        for j3, c in enumerate(left_cols):
            snap_col = take(state_pairs(snap_tuples, j3, l_cols[c][0]), pi)
            own = take(l_cols[c], src_pos)
            blk[c] = where(use_sub, own, snap_col)
        for c in right_cols:
            blk[c] = take(r_cols[c], right_rows_g)
        blocks.append(blk)

    # --- effective-unsub delete emissions (bucket-wide block) ---
    if del_rows_all:
        drows = (
            np.concatenate(del_rows_all)
            if len(del_rows_all) > 1 else del_rows_all[0]
        )
        md = len(drows)
        blk = {
            "pk": take(pk_col, drows),
            "_act": "delete",
            "_seq": take(seq_col, drows),
            "_minor": take(minor_col, drows),
            "_pos": drows,
            "_ord": np.zeros(md, dtype=np.int64),
        }
        for c in left_cols:
            blk[c] = null_col(l_cols[c], md)
        for c in right_cols:
            blk[c] = null_col(r_cols[c], md)
        blocks.append(blk)

    frame = None
    if blocks:
        # emission order of the per-record machine: triggering record
        # order, then subscription-dict order within a fan-out. One
        # combined int64 key (pos * width + ord) argsorts ~2x faster
        # than a two-key lexsort at the 30M-row gate shape.
        pos = np.concatenate([b["_pos"] for b in blocks])
        ordn = np.concatenate([b["_ord"] for b in blocks])
        width = np.int64(int(ordn.max()) + 1) if len(ordn) else np.int64(1)
        order2 = np.argsort(pos * width + ordn, kind="stable")
        # action: int8 block codes gathered natively, ONE vectorized
        # object materialization at the end (a 30M-cell object gather
        # costs seconds; an int8 gather is free)
        act_names = []
        act_codes_parts = []
        for b in blocks:
            if b["_act"] not in act_names:
                act_names.append(b["_act"])
            act_codes_parts.append(
                np.full(len(b["_pos"]), act_names.index(b["_act"]),
                        dtype=np.int8)
            )
        acts_sorted = np.concatenate(act_codes_parts)[order2]
        if len(act_names) == 1:
            acts: object = act_names[0]  # scalar broadcast, zero copies
        else:
            acts = np.array(act_names, dtype=object)[acts_sorted]
        # scatter-assembly through the INVERSE permutation: one final
        # array + one scatter per column instead of concat + ordered
        # gather (2 fewer 30M-row copies per column — page faults are
        # ~20 us on this host, so copies are the wall, not CPU)
        n_out = len(pos)
        inv = np.empty(n_out, dtype=np.int64)
        inv[order2] = np.arange(n_out, dtype=np.int64)

        def assemble(cols):
            k = cols[0][0]
            if k == "o":
                out = np.empty(n_out, dtype=object)
            elif k == "f":
                out = np.empty(n_out, dtype=np.float64)
            else:
                out = np.empty(n_out, dtype=np.int64 if k == "i" else bool)
            use_mask = cols[0][2] is not None
            outm = np.empty(n_out, dtype=bool) if use_mask else None
            off = 0
            for _kk, v, m in cols:
                d = inv[off:off + len(v)]
                out[d] = v
                if use_mask:
                    outm[d] = m
                off += len(v)
            return k, out, outm

        data: dict = {}
        for nm in out_columns:
            if nm == "action":
                data[nm] = acts
                continue
            data[nm] = dcol_finalize(assemble([b[nm] for b in blocks]))
        # copy=False: the columns are freshly built arrays owned by this
        # frame — the default dict_to_mgr copy re-copies every masked
        # array (measured 7.8 s at the 14M-row shape)
        frame = pd.DataFrame(data, columns=out_columns, copy=False)
    return frame, subs_ops, right_writes


class _FKJoinProcessor(StatefulProcessor):
    """Per-FK-group state: current right value + {pk -> left payload}."""

    def __init__(
        self,
        left_cols: list[str],
        right_cols: list[str],
        sub_schema: StructType,
        right_schema: StructType,
        out_schema: StructType,
        how: str,
        pk_schema: StructType,
        compact_rights: bool = False,
    ) -> None:
        self.compact_rights = compact_rights
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.sub_schema = sub_schema
        self.right_schema = right_schema
        self.out_columns = [f.name for f in out_schema.fields]
        # per-output-column Spark types drive the dense (native-dtype)
        # emission path — see _pdnorm.dense_input / _fk_fast_batch
        self._out_types = {f.name: f.dataType for f in out_schema.fields}
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
            pd.concat(list(rows))
            .sort_values(["seq", "minor"], kind="stable")
            .reset_index(drop=True),
            self._norm_fields,
        )
        snap = {pynative(k[0]): tuple(v) for k, v in self.subs.iterator()}
        if not bool(pdf["right_is_delete"].any()):
            # vectorized kernel (r16) — one fk is just a 1-group bucket;
            # the full snapshot above means pre_member is never needed
            ufk = pynative(key[0])
            r_val0 = self.right.get()
            frame, subs_ops, right_writes = _fk_fast_batch(
                pdf, {ufk: snap},
                r_state_of=lambda _fk: (
                    tuple(r_val0) if r_val0 is not None else None
                ),
                pre_member=lambda _fk, _pk: False,
                left_cols=self.left_cols, right_cols=self.right_cols,
                out_types=self._out_types, out_columns=self.out_columns,
                left_join=self.how == "left",
                compact_rights=self.compact_rights,
            )
            for _fk, pk, pay in subs_ops:
                if pay is None:
                    self.subs.removeKey((pk,))
                else:
                    self.subs.updateValue((pk,), pay)
            for _fk, val in right_writes:
                self.right.update(val)
            if frame is not None:
                yield frame
            return
        r_val0 = self.right.get()
        r_present = r_val0 is not None
        r_val: tuple = tuple(r_val0) if r_present else ()
        subs = _SubsView(snap)
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
        compact_rights: bool = False,
    ) -> None:
        self.compact_rights = compact_rights
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
        if not bool(pdf["right_is_delete"].any()):
            # vectorized kernel (r16): covers subs, unsub_move,
            # unsub_delete and right upserts; only right tombstones
            # fall back to the per-record transition
            import os as _os
            import sys as _sys
            import time as _time
            _dbg = _os.environ.get("SPARK_GRAFT_FK_DEBUG") == "1"
            _t0 = _time.monotonic()
            frame, subs_ops, right_writes = _fk_fast_batch(
                pdf, snapshots,
                r_state_of=lambda fk: self.right.getValue((fk,)),
                pre_member=lambda fk, pk: self.subs.containsKey((fk, pk)),
                left_cols=self.left_cols, right_cols=self.right_cols,
                out_types=self._out_types, out_columns=self.out_columns,
                left_join=self.how == "left",
                compact_rights=self.compact_rights,
            )
            _t1 = _time.monotonic()
            for ufk, pk, pay in subs_ops:
                if pay is None:
                    self.subs.removeKey((ufk, pk))
                else:
                    self.subs.updateValue((ufk, pk), pay)
            for ufk, val in right_writes:
                self.right.updateValue((ufk,), val)
            _t2 = _time.monotonic()
            if _dbg:
                print(
                    f"FKDBG kernel={_t1-_t0:.2f}s state_ops={len(subs_ops)}"
                    f"/{_t2-_t1:.2f}s rows_in={len(pdf)} "
                    f"rows_out={0 if frame is None else len(frame)}",
                    file=_sys.stderr, flush=True,
                )
            if frame is not None:
                yield frame
            return
        yield from self._slow_path(pdf, snapshots)

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
    compact_rights: bool = False,
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
            out_schema, how, StructType([StructField("pk", pk_type)]),
            compact_rights=compact_rights,
        )
        return unioned, proc, out_schema, ["fk"]
    proc = _FKJoinProcessorBucketed(
        left_value_cols, r_cols, sub_schema, right_state_schema,
        out_schema, how,
        StructType([StructField("fk", fk_type)]),
        StructType([StructField("fk", fk_type), StructField("pk", pk_type)]),
        compact_rights=compact_rights,
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
    compact_rights: bool = False,
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
        how=how, n_buckets=n_buckets, compact_rights=compact_rights,
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
    compact_rights: bool = False,
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
        how=how, n_buckets=n_buckets, compact_rights=compact_rights,
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
