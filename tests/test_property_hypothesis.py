"""Property-based pins (hypothesis): the python twins that the
hand-written randomized tests check at fixed seeds are re-checked here
under generated inputs with shrinking — empty strings, punctuation-only
docs, and repeated tokens are the cases generation finds that fixed
seeds may not.

Alphabets are printable-ASCII by design: the shared tokenizer is
ASCII-pinned across Spark/DuckDB/python (functions/text.py
SPLIT_ASCII_RE docstring) — unicode case-folding differences are a
documented non-goal, not a latent bug for generation to rediscover.

Each example costs a Spark job, so max_examples stays small; shrinking
still works on failures.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streams_app_spark.functions import text as T
from kafka_streams_app_spark.operators import pipeline

from tests.test_pipeline_ops import _scrub_spans_reference, scrub_reference


@pytest.fixture(scope="module")
def spark():
    from kafka_streams_app_spark.engine import get_spark

    return get_spark(shuffle_partitions=4)


_LINE = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)
_WORDS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), max_size=24
).map(" ".join)

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(lines=st.lists(_LINE, min_size=1, max_size=12))
@_SETTINGS
def test_scrub_pii_property(spark, lines):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(lines)], "id int, line string"
    )
    got = {
        r["id"]: (r["p"]["scrubbed"], r["p"]["n_email"], r["p"]["n_url"],
                  r["p"]["n_number"])
        for r in df.select("id", T.scrub_pii("line").alias("p")).collect()
    }
    for i, s in enumerate(lines):
        assert got[i] == scrub_reference(s), repr(s)


@given(docs=st.lists(_WORDS, min_size=1, max_size=10))
@_SETTINGS
def test_scrub_duplicated_spans_property(spark, docs):
    """Tiny vocab + short docs maximize cross-doc shingle collisions;
    k=3 keeps duplicated runs likely. Checks counts AND reassembled
    text against the exact python twin."""
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["scrubbed_text"])
        for r in pipeline.scrub_duplicated_spans(
            df, "text", "doc_id", k=3
        ).collect()
    }
    assert got == _scrub_spans_reference(rows, 3, 2)


@given(
    vals=st.lists(
        st.one_of(st.integers(-2**62, 2**62), _LINE), min_size=1, max_size=20
    ),
    n=st.sampled_from([2, 7, 4096]),
)
@_SETTINGS
def test_portable_bucket_matches_python_twin(spark, vals, n):
    """The Spark md5 bucket and the driver-side python twin must agree
    on every value (the IQ facade's ownership decisions depend on it)."""
    df = spark.createDataFrame(
        [(i, str(v)) for i, v in enumerate(vals)], "i int, v string"
    )
    got = {
        r["i"]: r["b"]
        for r in df.select(
            "i", pipeline.portable_bucket(F.col("v"), n).alias("b")
        ).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == pipeline.portable_bucket_py(str(v), n), (v, n)


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    cuts=st.lists(st.integers(0, 60), max_size=4),
    seed=st.integers(0, 5),
    k=st.sampled_from([1, 3, 7]),
)
@_SETTINGS
def test_bottom_k_changelog_invariant_python_twin(ids, cuts, seed, k):
    """The streaming sample's core claim, pure-Python: for ANY batch
    split of ANY arrival order, replaying the bottom-k merge and
    emitting +1/-1 membership changes yields net-positive set == the
    batch bottom-k draw, with every net in {0, 1} (streaming/sample.py
    _BottomK's handleInputRows is exactly this fold)."""
    import hashlib

    def rank(i):
        return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)

    truth = sorted((rank(i), i) for i in ids)[:k]
    bounds = sorted({min(c, len(ids)) for c in cuts} | {0, len(ids)})
    batches = [ids[a:b] for a, b in zip(bounds, bounds[1:])]
    state: list[tuple[int, int]] = []
    net: dict[int, int] = {}
    for batch in batches:
        cand = {(rank(i), i) for i in batch}
        merged = sorted(set(state) | cand)[:k]
        for _, i in set(merged) - set(state):
            net[i] = net.get(i, 0) + 1
        for _, i in set(state) - set(merged):
            net[i] = net.get(i, 0) - 1
        state = merged
    final = sorted((rank(i), i) for i, v in net.items() if v > 0)
    assert final == truth
    assert set(net.values()) <= {0, 1}


@given(
    tss=st.lists(st.integers(0, 200), min_size=1, max_size=40),
    jitters=st.lists(st.integers(-30, 30), min_size=40, max_size=40),
    cuts=st.lists(st.integers(0, 40), max_size=5),
    horizon=st.sampled_from([1, 7, 50]),
)
@_SETTINGS
def test_time_rolling_out_of_order_converges(tss, jitters, cuts, horizon):
    """r13 rewrite of streaming/rolling._TimeRollingAvg, driven
    DIRECTLY (fake ValueState, no Spark): for ANY arrival order whose
    disorder is bounded by lateness_s and ANY batch split, last-wins
    per seq (= the max-win_n row; frames only grow) equals the exact
    event-order frame computation — late rows get their true frame
    and retro-affected rows are re-emitted corrected, with eviction
    (horizon + lateness behind max ts) never discarding a needed
    entry."""
    import pandas as pd

    from kafka_streams_app_spark.streaming.rolling import _TimeRollingAvg

    lateness = 60
    events = [
        (ts, seq, float(seq % 7), (seq % 7) * 1_000_000)
        for seq, ts in enumerate(tss)
    ]
    # arrival: event order perturbed by bounded jitter -> per-key
    # stream-time regressions never exceed the jitter span (<= 60)
    arrival = sorted(
        events, key=lambda e: (e[0] + jitters[e[1] % len(jitters)], e[1])
    )
    bounds = sorted({min(c, len(events)) for c in cuts} | {0, len(events)})
    batches = [arrival[a:b] for a, b in zip(bounds, bounds[1:]) if a < b]

    class _FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, t):
            self.v = t

    proc = _TimeRollingAvg(["k"], "seq", "ts_s", "v", horizon, lateness)
    proc.state = _FakeState()
    last: dict[int, tuple] = {}
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "k": ["k"] * len(batch),
                "ts_s": [e[0] for e in batch],
                "seq": [e[1] for e in batch],
                "v": [e[2] for e in batch],
                "zu": [e[3] for e in batch],
            }
        )
        for out in proc.handleInputRows(("k",), iter([pdf]), None):
            for row in out.itertuples(index=False):
                cur = last.get(row.seq)
                if cur is None or row.win_n > cur[2]:
                    last[row.seq] = (
                        row.ts_s, row.v, row.win_n, row.win_sum, row.win_avg
                    )

    for ts, seq, val, zu in events:
        frame = [
            e for e in events
            if e[0] > ts - horizon and (e[0], e[1]) <= (ts, seq)
        ]
        s = sum(e[3] for e in frame)
        expected = (ts, val, len(frame), s / 1e6, (s / 1e6) / len(frame))
        assert last[seq] == expected, (seq, ts)


@given(
    idx=st.lists(st.integers(0, 255), min_size=1, max_size=3000),
    mcs_bump=st.integers(0, 4),
)
@_SETTINGS
def test_gif_lzw_roundtrip_property(idx, mcs_bump):
    """GIF-LZW encode->decode is the identity for ANY symbol stream at
    ANY legal min-code-size >= the alphabet's: exercises width
    transitions at arbitrary boundaries, runs (KwKwK), and — on long
    low-entropy streams — the table-full CLEAR reset."""
    from kafka_streams_app_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    alphabet_bits = max(2, max(idx).bit_length())
    mcs = min(8, alphabet_bits + mcs_bump)
    idx = [i % (1 << mcs) for i in idx]
    assert list(_lzw_decode(_lzw_encode(idx, mcs), mcs)) == idx


def test_gif_lzw_table_full_clear_reset():
    """Deterministic pin of the table-full CLEAR reset (r13 ADVICE:
    the 3000-symbol property above can't reach 4096 table entries):
    a varied mcs=8 stream that grows a new table entry on nearly every
    symbol pair crosses the 4096 ceiling mid-stream, forcing the
    encoder to emit CLEAR and both sides to rebuild — the round-trip
    then proves the reset is synchronized."""
    from kafka_streams_app_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    # pairs (a, b) with a varying stride never repeat early: the
    # encoder's dictionary grows ~1 entry/symbol, so >4400 symbols
    # guarantees crossing 4096 (= 258 roots + ~4.1k new entries)
    idx = [(i * 37 + (i * i) % 251) % 256 for i in range(4600)]
    mcs = 8
    encoded = _lzw_encode(idx, mcs)
    assert list(_lzw_decode(encoded, mcs)) == idx


@given(
    tss=st.lists(st.integers(0, 200), min_size=1, max_size=40),
    jitters=st.lists(st.integers(-120, 120), min_size=40, max_size=40),
    cuts=st.lists(st.integers(0, 40), max_size=5),
    horizon=st.sampled_from([1, 7, 50]),
)
@_SETTINGS
def test_time_rolling_dead_letter_differential(tss, jitters, cuts, horizon):
    """Default on_late='dead_letter' (r13 verdict ask #6), driven
    directly with UNBOUNDED jitter (rows routinely land beyond
    lateness_s): beyond-bound rows come back as win_n = -1 marker rows
    instead of killing the query, and the surviving output is
    EXACTLY the strict-mode run on the arrival sequence with the
    dead-lettered rows removed — dropping never perturbs in-bound
    frames."""
    import pandas as pd

    from kafka_streams_app_spark.streaming.rolling import _TimeRollingAvg

    lateness = 30
    events = [
        (ts, seq, float(seq % 7), (seq % 7) * 1_000_000)
        for seq, ts in enumerate(tss)
    ]
    arrival = sorted(
        events, key=lambda e: (e[0] + jitters[e[1] % len(jitters)], e[1])
    )
    bounds = sorted({min(c, len(events)) for c in cuts} | {0, len(events)})
    batches = [arrival[a:b] for a, b in zip(bounds, bounds[1:]) if a < b]

    class _FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, t):
            self.v = t

    def run(batch_seq, on_late):
        proc = _TimeRollingAvg(
            ["k"], "seq", "ts_s", "v", horizon, lateness, on_late
        )
        proc.state = _FakeState()
        emitted, dead = [], set()
        for batch in batch_seq:
            if not batch:
                continue
            pdf = pd.DataFrame(
                {
                    "k": ["k"] * len(batch),
                    "ts_s": [e[0] for e in batch],
                    "seq": [e[1] for e in batch],
                    "v": [e[2] for e in batch],
                    "zu": [e[3] for e in batch],
                }
            )
            for out in proc.handleInputRows(("k",), iter([pdf]), None):
                for row in out.itertuples(index=False):
                    if row.win_n == -1:
                        dead.add(row.seq)
                    else:
                        emitted.append(
                            (row.seq, row.ts_s, row.win_n, row.win_sum)
                        )
        return emitted, dead

    got, dead = run(batches, "dead_letter")
    filtered = [
        [e for e in batch if e[1] not in dead] for batch in batches
    ]
    want, dead2 = run(filtered, "fail")
    assert dead2 == set()
    assert got == want


@given(
    data=st.lists(
        st.lists(
            st.integers(min_value=-50, max_value=50), min_size=8, max_size=8
        ),
        min_size=14,
        max_size=30,
        unique_by=tuple,
    ),
    nq=st.integers(min_value=1, max_value=4),
)
@_SETTINGS
def test_ivfpq_search_equals_topk_property(spark, data, nq):
    """Random small corpora (dim 8, m=2, tight codebook mods so both
    codebooks are non-empty at any size): the at-ingest searcher's
    frozen-index scan must emit BIT-EQUAL rows to batch ivfpq_topk
    for the same query ids — exact int64 ADC and identical
    (adc, neighbor_id) tie order under heavy collisions (small value
    range makes ADC ties common)."""
    from kafka_streams_app_spark.operators.similarity import (
        ivfpq_search,
        ivfpq_topk,
    )

    rows = [(i, [float(x) / 7 for x in v]) for i, v in enumerate(data)]
    schema = "vec_id long, embedding array<double>"
    emb = spark.createDataFrame(rows, schema)
    queries = emb.filter(F.col("vec_id") % max(2, len(rows) // nq) == 0)
    kw = dict(dim=8, k=3, m=2, coarse_mod=(5, 1), pq_mod=(3, 0), nprobe=2)
    want = sorted(
        tuple(r)
        for r in ivfpq_topk(emb, queries, "vec_id", "embedding", **kw).collect()
    )
    got = sorted(
        tuple(r)
        for r in ivfpq_search(queries, emb, "vec_id", "embedding", **kw).collect()
    )
    assert got == want


# --- multimodal sniff-and-dispatch total function property -----------------

from kafka_streams_app_spark.operators import multimodal as _mm

_MAGICS = [
    b"", b"BM", b"\x89PNG\r\n\x1a\n", b"GIF87a", b"GIF89a",
    b"RIFF1234WAVE", b"\xff\xd8",
]


@given(
    prefix=st.sampled_from(_MAGICS),
    body=st.binary(max_size=256),
)
@settings(max_examples=200, deadline=None)
def test_auto_features_total_on_arbitrary_bytes(prefix, body):
    """_auto_features_one is TOTAL over arbitrary byte strings: any
    payload — garbage, truncated magic, magic + random body — yields a
    well-formed (fmt, w, h, s0, s1, s2) tuple, never an exception. A
    100 TB crawl corpus guarantees malformed files; the dispatch layer
    must quarantine, not crash the task. Valid-looking magics may
    decode (if the random body happens to parse) or quarantine; bytes
    with no recognized magic must take the stand-in path with the
    exact byte-sum feature."""
    payload = prefix + body
    fmt, w, h, s0, s1, s2 = _mm._auto_features_one(payload)
    base = fmt.split(":", 1)
    assert base[0] in {"bmp", "png", "gif", "wav", "jpeg", "jpeg_color",
                       "raw", "corrupt"}
    assert all(isinstance(v, int) for v in (w, h, s0, s1, s2))
    if _mm.sniff_format(payload) == "raw":
        assert fmt == "raw" and (w, h) == (0, 0) and s0 == sum(payload)
    elif base[0] == "corrupt":
        # provenance: the sniffed container rides along
        assert base[1] == _mm.sniff_format(payload)
        assert (w, h, s0, s1, s2) == (0, 0, 0, 0, 0)


# --- collocation mining vs a pure-Python reference -------------------------

from kafka_streams_app_spark.operators.pipeline import corpus_collocations as _colloc


def _colloc_reference(texts, k, min_count):
    """Counter-based Dice reference replaying the operator contract."""
    import re
    from collections import Counter

    split = re.compile(r"\W+", re.ASCII)
    uni, big = Counter(), Counter()
    for t in texts:
        if not isinstance(t, str):
            continue
        toks = [w for w in split.split(t.lower()) if w]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    rows = [
        (a, b, c, uni[a], uni[b], (2_000_000 * c) // (uni[a] + uni[b]))
        for (a, b), c in big.items() if c >= min_count
    ]
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows[:k]


@given(
    texts=st.lists(_WORDS, min_size=1, max_size=10),
    k=st.integers(min_value=1, max_value=8),
    min_count=st.integers(min_value=1, max_value=3),
)
@_SETTINGS
def test_corpus_collocations_matches_reference(spark, texts, k, min_count):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [tuple(r) for r in _colloc(df, k=k, min_count=min_count).collect()]
    assert got == _colloc_reference(texts, k, min_count)
