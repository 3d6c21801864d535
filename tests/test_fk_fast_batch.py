"""Randomized equivalence pin for the r16 vectorized FK-join kernel.

_fk_fast_batch (interval-based numpy kernel, handles sub / unsub_move /
unsub_delete / right upserts) must emit EXACTLY the rows, in EXACTLY
the order, of the per-record _fk_apply transition, and leave EXACTLY
the same subscription/right state behind — across random multi-batch
histories, both join modes, and both state layouts. Pure Python (state
shims from streaming/replay.py), no Spark session.

compact_rights=True (the declared s_fk_* entries' opt-in) is pinned
against an INDEPENDENT reference: the per-record machine's emissions
minus the fan-outs of non-final right rows (identified by the input
rows alone — the kernel's code is not consulted), plus the two
properties the entry contract rests on: every dropped row is
superseded by a kept later emission for its pk, and the
latest-per-(pk) reduction of the full multi-batch changelog is
IDENTICAL with and without compaction.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_streams_app_spark.streaming.fk_join import (
    KIND_RIGHT,
    KIND_SUB,
    KIND_UNSUB_DELETE,
    KIND_UNSUB_MOVE,
    _FKJoinProcessor,
    _FKJoinProcessorBucketed,
    pynative,
)
from kafka_streams_app_spark.streaming.replay import _HandleShim

LEFT_COLS = ["value"]
RIGHT_COLS = ["r_rvalue"]
SUB_SCHEMA = StructType([StructField("value", LongType(), True)])
RIGHT_SCHEMA = StructType([StructField("rvalue", LongType(), True)])
FK_SCHEMA = StructType([StructField("fk", StringType(), True)])
PK_SCHEMA = StructType([StructField("pk", LongType(), True)])
FKPK_SCHEMA = StructType(
    [StructField("fk", StringType(), True), StructField("pk", LongType(), True)]
)
OUT_SCHEMA = StructType(
    [
        StructField("pk", LongType(), True),
        StructField("action", StringType(), False),
        StructField("value", LongType(), True),
        StructField("r_rvalue", LongType(), True),
        StructField("_seq", LongType(), True),
        StructField("_minor", LongType(), True),
    ]
)


def _mk_bucketed(
    how: str, compact_rights: bool = False
) -> _FKJoinProcessorBucketed:
    p = _FKJoinProcessorBucketed(
        LEFT_COLS, RIGHT_COLS, SUB_SCHEMA, RIGHT_SCHEMA, OUT_SCHEMA, how,
        FK_SCHEMA, FKPK_SCHEMA, compact_rights=compact_rights,
    )
    p.init(_HandleShim())
    return p


def _mk_perfk(how: str) -> _FKJoinProcessor:
    p = _FKJoinProcessor(
        LEFT_COLS, RIGHT_COLS, SUB_SCHEMA, RIGHT_SCHEMA, OUT_SCHEMA, how,
        PK_SCHEMA,
    )
    p.init(_HandleShim())
    return p


def _random_batch(rng: random.Random, seq0: int, fks, pks, n: int):
    """One batch of (fk, kind, pk, value, seq, minor, r_rvalue,
    right_is_delete) rows — NO right deletes (the kernel's domain)."""
    rows = []
    for i in range(n):
        seq = seq0 + i
        fk = rng.choice(fks)
        r = rng.random()
        if r < 0.35:
            rows.append((fk, KIND_RIGHT, None, None, seq, 2,
                         rng.randrange(1000), False))
        elif r < 0.7:
            rows.append((fk, KIND_SUB, rng.choice(pks),
                         rng.randrange(1000), seq, 1, None, False))
        elif r < 0.88:
            rows.append((fk, KIND_UNSUB_MOVE, rng.choice(pks), None,
                         seq, 0, None, False))
        else:
            rows.append((fk, KIND_UNSUB_DELETE, rng.choice(pks), None,
                         seq, 0, None, False))
    return rows


def _to_pdf(rows) -> pd.DataFrame:
    # the real crossing delivers shielded longs as object cells (exact
    # ints / None) — build the null-mixed long columns as TRUE object
    # series so neither path sees float-upcast cells
    cols = ["fk", "kind", "pk", "value", "seq", "minor",
            "r_rvalue", "right_is_delete"]
    data = {}
    for i, c in enumerate(cols):
        vals = [r[i] for r in rows]
        if c in ("pk", "value", "r_rvalue"):
            data[c] = pd.Series(vals, dtype=object)
        else:
            data[c] = pd.Series(vals)
    return pd.DataFrame(data, columns=cols)


def _rows_of(frames) -> list[tuple]:
    """Canonically SORTED emission rows: the per-record _slow_path
    emits per-fk blocks (groupby order) while the kernel emits global
    (row position, dict position) order — the row MULTISET is the
    contract (downstream reductions key on (_seq, _minor); the frame
    order of a micro-batch is not observable through Spark), so the
    equivalence pin compares sorted rows."""
    out = []
    for f in frames:
        if f is None:
            continue
        for t in f.itertuples(index=False):
            out.append(tuple(pynative(v) for v in t))
    return sorted(out, key=lambda r: [(v is None, v) for v in r])


def _slow_reference(proc: _FKJoinProcessorBucketed, pdf: pd.DataFrame):
    """handleInputRows' snapshot step + the per-record _slow_path."""
    from kafka_streams_app_spark.streaming.fk_join import pynative as pn

    fks_right = {
        pn(v) for v in pdf.loc[pdf["kind"] == KIND_RIGHT, "fk"].unique()
    }
    snapshots: dict = {fk: {} for fk in fks_right}
    if fks_right:
        for k, v in proc.subs.iterator():
            fk, pk = k[0], k[1]
            if fk in snapshots:
                snapshots[fk][pk] = tuple(v)
    return list(proc._slow_path(pdf, snapshots))


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_kernel_equals_per_record_bucketed(how: str, seed: int) -> None:
    rng = random.Random(2026_08_18 + seed)
    fks = ["a", "b", "c"]
    pks = list(range(1, 9))
    fast = _mk_bucketed(how)
    slow = _mk_bucketed(how)
    seq0 = 1
    for _batch in range(6):
        rows = _random_batch(rng, seq0, fks, pks, rng.randrange(1, 40))
        seq0 += len(rows)
        pdf = _to_pdf(rows)
        sorted_pdf = (
            pdf.sort_values(["seq", "minor"], kind="stable")
            .reset_index(drop=True)
        )
        got = _rows_of(fast.handleInputRows(("bkt",), iter([pdf]), None))
        want = _rows_of(_slow_reference(slow, sorted_pdf.copy()))
        assert got == want, f"batch {_batch}: emission mismatch"
        # state must match exactly between batches (carry-in parity)
        assert dict(fast.subs.iterator()) == dict(slow.subs.iterator())
        assert dict(fast.right.iterator()) == dict(slow.right.iterator())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_kernel_equals_per_record_perfk(how: str) -> None:
    """Per-fk layout wrapper: single-fk batches through the kernel vs
    the _fk_apply reference inside the same processor class (forced via
    a right-delete row in a twin run is NOT used — instead the
    reference is the bucketed slow path on the same single-fk frame)."""
    rng = random.Random(814)
    pks = list(range(1, 7))
    fast = _mk_perfk(how)
    ref = _mk_bucketed(how)
    seq0 = 1
    for _batch in range(6):
        rows = _random_batch(rng, seq0, ["onlyfk"], pks, rng.randrange(1, 30))
        seq0 += len(rows)
        pdf = _to_pdf(rows)
        sorted_pdf = (
            pdf.sort_values(["seq", "minor"], kind="stable")
            .reset_index(drop=True)
        )
        got = _rows_of(fast.handleInputRows(("onlyfk",), iter([pdf]), None))
        want = _rows_of(_slow_reference(ref, sorted_pdf.copy()))
        assert got == want
        fast_subs = {k[0]: tuple(v) for k, v in fast.subs.iterator()}
        ref_subs = {k[1]: tuple(v) for k, v in ref.subs.iterator()}
        assert fast_subs == ref_subs


def _random_instr_batch(rng: random.Random, seq0: int, fks, pks,
                        subscribed: dict, n: int):
    """One batch honoring fk_instructions' INVARIANT: an unsub_move is
    always immediately followed by its paired sub at the SAME seq
    (minor 0 then 1) — the shape every declared entry's instruction
    stream has, and the precondition of compact_rights' supersession
    property in LEFT mode (an orphan unsub_move emits no row there, so
    a dropped earlier fan-out would have no kept superseder; the
    unconstrained generator above exposed exactly that)."""
    rows = []
    seq = seq0
    for _ in range(n):
        r = rng.random()
        if r < 0.35:
            rows.append((rng.choice(fks), KIND_RIGHT, None, None, seq, 2,
                         rng.randrange(1000), False))
        else:
            pk = rng.choice(pks)
            cur = subscribed.get(pk)
            if cur is None or r < 0.6:
                fk = rng.choice(fks)
                if cur is not None and cur != fk:
                    rows.append((cur, KIND_UNSUB_MOVE, pk, None, seq, 0,
                                 None, False))
                rows.append((fk, KIND_SUB, pk, rng.randrange(1000), seq, 1,
                             None, False))
                subscribed[pk] = fk
            else:
                rows.append((cur, KIND_UNSUB_DELETE, pk, None, seq, 0,
                             None, False))
                subscribed.pop(pk)
        seq += 1
    return rows, seq


def _nonfinal_right_tags(rows) -> set[tuple]:
    """(seq, minor) tags of every right row that is NOT its fk's last
    right row in the batch — computed from the INPUT rows alone. Tags
    are unique per input row (the generator's seq strictly increases),
    and sub(minor 1)/unsub(minor 0) emissions can never collide with a
    right row's (seq, 2) tag."""
    last_right: dict = {}
    for r in rows:
        if r[1] == KIND_RIGHT:
            last_right[r[0]] = r[4]
    return {
        (r[4], r[5])
        for r in rows
        if r[1] == KIND_RIGHT and last_right[r[0]] != r[4]
    }


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_compact_rights_contract(how: str, seed: int) -> None:
    """compact_rights=True vs the independent compaction of the
    per-record reference (drop non-final right rows' fan-outs), plus
    the supersession property and latest-per-pk invariance that make
    compaction invisible to the declared s_fk_* entries' reduction."""
    rng = random.Random(2026_08_18 + 77 * seed)
    fks = ["a", "b", "c"]
    pks = list(range(1, 9))
    fast = _mk_bucketed(how, compact_rights=True)
    slow = _mk_bucketed(how)
    seq0 = 1
    subscribed: dict = {}
    all_got: list[tuple] = []
    all_want_full: list[tuple] = []
    for _batch in range(6):
        rows, seq0 = _random_instr_batch(
            rng, seq0, fks, pks, subscribed, rng.randrange(1, 40))
        pdf = _to_pdf(rows)
        sorted_pdf = (
            pdf.sort_values(["seq", "minor"], kind="stable")
            .reset_index(drop=True)
        )
        got = _rows_of(fast.handleInputRows(("bkt",), iter([pdf]), None))
        want_full = _rows_of(_slow_reference(slow, sorted_pdf.copy()))
        dropped_tags = _nonfinal_right_tags(rows)
        # OUT_SCHEMA: (pk, action, value, r_rvalue, _seq, _minor)
        want = [r for r in want_full if (r[4], r[5]) not in dropped_tags]
        assert got == want, f"batch {_batch}: compacted emission mismatch"
        # supersession: every dropped row has a KEPT later emission for
        # the same pk (strictly greater (seq, minor) order tag)
        kept_latest: dict = {}
        for r in want:
            pk = r[0]
            tag = (r[4], r[5])
            if pk not in kept_latest or tag > kept_latest[pk]:
                kept_latest[pk] = tag
        for r in want_full:
            if (r[4], r[5]) in dropped_tags:
                assert r[0] in kept_latest and kept_latest[r[0]] > (r[4], r[5]), (
                    f"batch {_batch}: dropped row {r} not superseded"
                )
        # state parity: compaction must not touch state writes
        assert dict(fast.subs.iterator()) == dict(slow.subs.iterator())
        assert dict(fast.right.iterator()) == dict(slow.right.iterator())
        all_got.extend(got)
        all_want_full.extend(want_full)
    # the declared entries' reduction: latest row per pk over the FULL
    # multi-batch changelog is identical with and without compaction
    def latest_per_pk(rows_out):
        latest: dict = {}
        for r in rows_out:
            tag = (r[4], r[5])
            if r[0] not in latest or tag > latest[r[0]][0]:
                latest[r[0]] = (tag, r)
        return {pk: v[1] for pk, v in latest.items()}

    assert latest_per_pk(all_got) == latest_per_pk(all_want_full)


def test_kernel_emits_unsub_deletes_inner() -> None:
    """Directed: sub -> right -> unsub_move must emit the retraction
    (inner mode) — the r15 fast path could not see this shape at all."""
    proc = _mk_bucketed("inner")
    rows = [
        ("a", KIND_SUB, 1, 10, 1, 1, None, False),
        ("a", KIND_RIGHT, None, None, 2, 2, 77, False),
        ("a", KIND_UNSUB_MOVE, 1, None, 3, 0, None, False),
    ]
    got = _rows_of(proc.handleInputRows(("b",), iter([_to_pdf(rows)]), None))
    assert got == sorted(
        [
            (1, "upsert", 10, 77, 2, 2),   # fan-out on the right upsert
            (1, "delete", None, None, 3, 0),
        ],
        key=lambda r: [(v is None, v) for v in r],
    )
    assert dict(proc.subs.iterator()) == {}
