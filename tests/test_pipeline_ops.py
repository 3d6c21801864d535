"""Pins for the training-data pipeline stages (operators/pipeline.py)
and the PII scrubber (functions/text.py:scrub_pii): Python-reference
cross-checks, determinism, and the sharded-packing invariants that make
the 100 TB layout valid."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kafka_streams_app_spark.functions import text as T
from kafka_streams_app_spark.operators import pipeline


# ---------------------------------------------------------------------------
# scrub_pii
# ---------------------------------------------------------------------------

SCRUB_CASES = [
    "contact me at jane.doe+spam@mail.example.org or on 0471 223344",
    "see https://example.com/a?b=12 and http://x.io 42",
    "no pii here at all",
    "a@b.co a@b.c 7 77 777",  # a@b.c: TLD too short -> not an email
    "",
]


def scrub_reference(line: str) -> tuple[str, int, int, int]:
    counts = []
    for _, pat, repl in T.PII_PATTERNS:
        counts.append(len(re.findall(pat, line)))
        line = re.sub(pat, repl, line)
    return (line, *counts)


def test_scrub_pii_matches_python_reference(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SCRUB_CASES)],
                               "id int, line string")
    got = {
        r["id"]: (r["p"]["scrubbed"], r["p"]["n_email"], r["p"]["n_url"],
                  r["p"]["n_number"])
        for r in df.select("id", T.scrub_pii("line").alias("p")).collect()
    }
    for i, s in enumerate(SCRUB_CASES):
        assert got[i] == scrub_reference(s), f"case {i}: {s!r}"


def test_scrub_pii_email_digits_not_double_counted(spark):
    df = spark.createDataFrame([("u123@example.com 55",)], "line string")
    r = df.select(T.scrub_pii("line").alias("p")).collect()[0]["p"]
    assert r["scrubbed"] == "<EMAIL> <NUM>"
    assert (r["n_email"], r["n_url"], r["n_number"]) == (1, 0, 1)


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

RATES = {"en": 0.5, "zh": 0.2, "de": 0.8}


def test_stratified_sample_deterministic_and_subset(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = pipeline.stratified_sample(docs, "lang", RATES, "doc_id", 0.1)
    s2 = pipeline.stratified_sample(docs, "lang", RATES, "doc_id", 0.1)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2 and len(ids1) > 0
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(ids1) <= all_ids


def test_stratified_sample_rates_approximate(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tot = {r["lang"]: r["n"] for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in
           pipeline.stratified_sample(docs, "lang", RATES, "doc_id", 0.1)
           .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in tot.items():
        rate = RATES.get(lang, 0.1)
        # md5 buckets are uniform; allow binomial noise on small strata
        assert abs(got.get(lang, 0) / n - rate) < 0.15, (lang, got.get(lang), n)


def test_stratified_sample_monotone_in_rate(spark, sf_dir):
    """A higher rate strictly grows (well: never shrinks) the sample —
    buckets are compared to a threshold, so samples are nested."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lo = {r["doc_id"] for r in
          pipeline.stratified_sample(docs, "lang", {}, "doc_id", 0.2)
          .select("doc_id").collect()}
    hi = {r["doc_id"] for r in
          pipeline.stratified_sample(docs, "lang", {}, "doc_id", 0.6)
          .select("doc_id").collect()}
    assert lo <= hi


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

CAP = 512


def pack_reference(rows: list[tuple[int, int]], cap: int) -> dict[int, tuple[int, int]]:
    """rows: (order_key, size) -> {order_key: (bin_id, bin_offset)}."""
    out, start = {}, 0
    for key, size in sorted(rows):
        out[key] = (start // cap, start % cap)
        start += size
    return out


def test_pack_sequences_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sized = docs.select("doc_id", "lang", T.token_count("text").alias("n"))
    packed = pipeline.pack_sequences(sized, "lang", "doc_id", "n", CAP)
    got = packed.select("doc_id", "lang", "n", "bin_id", "bin_offset").collect()
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append((r["doc_id"], r["n"]))
    for lang, rows in by_lang.items():
        ref = pack_reference(rows, CAP)
        for r in got:
            if r["lang"] == lang:
                assert (r["bin_id"], r["bin_offset"]) == ref[r["doc_id"]]


def test_pack_sequences_offsets_bounded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sized = docs.select("doc_id", "lang", T.token_count("text").alias("n"))
    packed = pipeline.pack_sequences(sized, "lang", "doc_id", "n", CAP)
    bad = packed.filter(
        (F.col("bin_offset") < 0) | (F.col("bin_offset") >= CAP)
        | (F.col("bin_id") < 0)
    ).count()
    assert bad == 0


def test_pack_sequences_sharded_is_valid_packing(spark, sf_dir):
    """shards>1 (the scale layout) must still be a correct packing
    within every (stratum, shard): offsets are the prefix sums of sizes
    in doc_id order, independently per shard."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sized = docs.select("doc_id", "lang", T.token_count("text").alias("n"))
    packed = pipeline.pack_sequences(sized, "lang", "doc_id", "n", CAP, shards=4)
    rows = packed.select("doc_id", "lang", "shard", "n", "bin_id",
                         "bin_offset").collect()
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    groups: dict[tuple[str, int], list] = {}
    for r in rows:
        groups.setdefault((r["lang"], r["shard"]), []).append(r)
    for (_, _), grp in groups.items():
        ref = pack_reference([(r["doc_id"], r["n"]) for r in grp], CAP)
        for r in grp:
            assert (r["bin_id"], r["bin_offset"]) == ref[r["doc_id"]]


def test_pack_sequences_rejects_bad_shards(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        pipeline.pack_sequences(docs, "lang", "doc_id", "n_chars", CAP, shards=0)


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

def test_decontaminate_planted_overlap(spark):
    """A corpus doc embedding an 8-token benchmark span is flagged with
    the right shared-shingle count; disjoint docs and the benchmark's
    own rows are not."""
    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"intro words {span} trailing words here"),   # contains the span
        (2, "totally different content with no overlap at all whatsoever"),
        (100, f"benchmark question {span} benchmark answer"),  # benchmark doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter(F.col("doc_id") == 100)
    got = {r["doc_id"]: r["n_shared"] for r in
           pipeline.decontaminate(df, bench, "text", "doc_id", k=8).collect()}
    assert 1 in got and 2 not in got and 100 not in got
    assert got[1] == 1  # exactly the planted 8-gram is shared


def test_decontaminate_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    got = {r["doc_id"]: r["n_shared"] for r in
           pipeline.decontaminate(docs, bench, "text", "doc_id", k=8).collect()}

    import re as _re
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]

    def sh8(text: str) -> set[str]:
        t = [w for w in _re.split(r"\W+", text.lower()) if w]
        return {" ".join(t[i:i + 8]) for i in range(len(t) - 7)}

    bench_sh = set()
    for did, text in rows:
        if did % 7 == 0:
            bench_sh |= sh8(text)
    expect = {}
    for did, text in rows:
        if did % 7 != 0:
            n = len(sh8(text) & bench_sh)
            if n:
                expect[did] = n
    assert got == expect and len(expect) > 0


# ---------------------------------------------------------------------------
# randomized property pins (seeded bulk cases, one Spark evaluation each —
# the style of test_property_round3.py)
# ---------------------------------------------------------------------------

def test_scrub_pii_random_ascii_vs_python_re(spark):
    """300 random printable-ASCII strings (plus planted emails/URLs/
    numbers): the JVM regex pipeline must agree with Python re on every
    one. Printable ASCII only — the PII patterns are ASCII classes, and
    ASCII is where Java regex, RE2, and Python re provably coincide."""
    import random
    rng = random.Random(31)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 .@:/%+-_?=&#!,;'\"()"
    )
    plants = ["bob@x-corp.co.uk", "https://a.b/c?d=9", "http://q.io", "12345",
              "x@y", "@@", "http:// ", "a.b@c.d.e.fg", "99"]
    cases = []
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        if rng.random() < 0.5:
            pos = rng.randrange(0, len(s) + 1)
            s = s[:pos] + rng.choice(plants) + s[pos:]
        cases.append(s)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "id int, line string"
    )
    got = {
        r["id"]: (r["p"]["scrubbed"], r["p"]["n_email"], r["p"]["n_url"],
                  r["p"]["n_number"])
        for r in df.select("id", T.scrub_pii("line").alias("p")).collect()
    }
    for i, s in enumerate(cases):
        assert got[i] == scrub_reference(s), f"case {i}: {s!r}"


def test_pack_sequences_random_sizes_vs_reference(spark):
    """Random (stratum, size) tables incl. zero-size and over-capacity
    rows: bin assignment must equal the Python prefix-sum reference."""
    import random
    rng = random.Random(47)
    rows = [
        (i, rng.choice(["a", "b", "c"]),
         rng.choice([0, 1, 7, 63, CAP - 1, CAP, CAP + 13, 3 * CAP]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k int, stratum string, size int")
    packed = pipeline.pack_sequences(df, "stratum", "k", "size", CAP)
    got = packed.select("k", "stratum", "size", "bin_id", "bin_offset").collect()
    by_s: dict[str, list[tuple[int, int]]] = {}
    for k, stratum, size in rows:
        by_s.setdefault(stratum, []).append((k, size))
    refs = {s: pack_reference(v, CAP) for s, v in by_s.items()}
    for r in got:
        assert (r["bin_id"], r["bin_offset"]) == refs[r["stratum"]][r["k"]], r


def test_hash_split_deterministic_partition(spark, sf_dir):
    """hash_split labels every row, is stable across calls, respects
    sorted-name bucket order, and approximates the requested weights."""
    from kafka_streams_app_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    a = pipeline.hash_split(docs, "doc_id", w, seed="s1")
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = docs.count()
    assert None not in counts and sum(counts.values()) == total
    assert abs(counts["train"] / total - 0.8) < 0.06
    # determinism: second run identical row-for-row
    b = pipeline.hash_split(docs, "doc_id", w, seed="s1")
    assert a.select("doc_id", "split").subtract(
        b.select("doc_id", "split")).count() == 0
    # different seed -> different (not byte-identical) assignment
    c = pipeline.hash_split(docs, "doc_id", w, seed="s2")
    assert a.select("doc_id", "split").subtract(
        c.select("doc_id", "split")).count() > 0


def test_hash_split_partial_weights_null_rest(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    out = pipeline.hash_split(df, "k", {"bench": 0.05})
    n_bench = out.filter(F.col("split") == "bench").count()
    n_null = out.filter(F.col("split").isNull()).count()
    assert n_bench + n_null == 1000 and 20 <= n_bench <= 90


def test_hash_split_rejects_overweight(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        pipeline.hash_split(df, "k", {"a": 0.7, "b": 0.4})


def test_shuffle_deterministic_is_permutation(spark, sf_dir):
    """shuffle_pos is a dense 0..n-1 permutation, stable across runs,
    seed-sensitive, and uncorrelated with input order."""
    from kafka_streams_app_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    a = pipeline.shuffle_deterministic(docs, "doc_id", seed="e0")
    pos = [r["shuffle_pos"] for r in a.select("shuffle_pos").collect()]
    assert sorted(pos) == list(range(n))
    b = pipeline.shuffle_deterministic(docs, "doc_id", seed="e0")
    assert a.select("doc_id", "shuffle_pos").subtract(
        b.select("doc_id", "shuffle_pos")).count() == 0
    c = pipeline.shuffle_deterministic(docs, "doc_id", seed="e1")
    moved = a.select("doc_id", "shuffle_pos").subtract(
        c.select("doc_id", "shuffle_pos")).count()
    assert moved > n // 2  # a different epoch reorders almost everything


def test_shuffle_deterministic_bucket_count_invariant(spark):
    """The emitted permutation ORDER depends on n_buckets (documented),
    but any bucket count yields a dense permutation of the same rows."""
    df = spark.range(500).withColumnRenamed("id", "k")
    for nb in (7, 4096):
        out = pipeline.shuffle_deterministic(df, "k", seed="x", n_buckets=nb)
        pos = [r["shuffle_pos"] for r in out.select("shuffle_pos").collect()]
        assert sorted(pos) == list(range(500))


def test_corpus_ngram_topk_matches_python(spark, sf_dir):
    from collections import Counter

    from kafka_streams_app_spark.functions.text import shingle_list
    from kafka_streams_app_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    ref = Counter()
    for t in texts:
        for g in shingle_list(t, 3):
            ref[g] += 1
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [(r["gram"], r["doc_freq"])
           for r in pipeline.corpus_ngram_topk(docs, "text", n=3, k=25).collect()]
    assert got == want


def test_hash_split_full_weights_cover_last_bucket(spark):
    """Weights {1/3, 1/3, 1/3} sum to 1.0, so EVERY bucket must get a
    label. Per-weight rounding (3333+3333+3333 = 9999) left the last
    bucket NULL (ADVICE r5); the cumulative-sum rounding fix pins a key
    that lands exactly in bucket SAMPLE_BUCKETS-1 to the last split."""
    last = next(
        k for k in range(10**6)
        if pipeline.portable_bucket_py(k, pipeline.SAMPLE_BUCKETS)
        == pipeline.SAMPLE_BUCKETS - 1
    )
    df = spark.createDataFrame([(last,), (0,)], "k long")
    out = pipeline.hash_split(df, "k", {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    got = {r["k"]: r["split"] for r in out.collect()}
    assert got[last] == "c" and all(v is not None for v in got.values())


# ---------------------------------------------------------------------------
# boilerplate_lines / scrub_boilerplate (CCNet/C4-style line dedup)
# ---------------------------------------------------------------------------

BOILER_DOCS = [
    (1, "Welcome to Example Corp\nunique prose about turtles\n  Welcome to Example Corp  \ncopyright 2024 example"),
    (2, "Welcome to Example Corp\nanother page entirely\ncopyright 2024 example"),
    (3, "totally original essay\nshort\ncopyright 2024 example"),
]


def test_boilerplate_lines_cross_doc_counts(spark):
    """A line repeated WITHIN one doc counts once (per-doc distinct);
    counts are cross-document; lines under min_len never enter the
    exchange."""
    docs = spark.createDataFrame(BOILER_DOCS, "doc_id long, text string")
    got = {r["line"]: r["ndocs"]
           for r in pipeline.boilerplate_lines(docs, min_df=2, min_len=10).collect()}
    assert got == {
        "Welcome to Example Corp": 2,   # doc 1 counts ONCE despite 2 copies
        "copyright 2024 example": 3,
    }


def test_scrub_boilerplate_keeps_order_and_counts(spark):
    docs = spark.createDataFrame(BOILER_DOCS, "doc_id long, text string")
    boiler = pipeline.boilerplate_lines(docs, min_df=2, min_len=10)
    got = {r["doc_id"]: r for r in
           pipeline.scrub_boilerplate(docs, boiler).collect()}
    assert got[1]["scrubbed_text"] == "unique prose about turtles"
    assert got[1]["kept_lines"] == 1
    assert got[2]["scrubbed_text"] == "another page entirely"
    # doc 3 keeps two lines in original order ("short" is under min_len
    # so it was never boilerplate-eligible, but it IS document content)
    assert got[3]["scrubbed_text"] == "totally original essay\nshort"
    assert got[3]["kept_lines"] == 2
    assert got[3]["kept_chars"] == len("totally original essay") + len("short")


def test_repetition_signals_hand_computed(spark):
    """Gopher repetition counts vs hand computation: 'a b a b a' has
    bigrams [a b, b a, a b, b a] -> 2 distinct of 4; line duplicated."""
    txt = "a b a b a\nx\na b a b a"
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    r = df.select(T.repetition_signals("text").alias("r")).collect()[0]["r"]
    assert r["n_words"] == 11
    assert r["total_word_chars"] == 11
    assert r["n_bigrams"] == 10 and r["n_distinct_bigrams"] == 4
    # bigrams span the newline in token space: [a b]x5 [b a]x4 [a x] [x a]
    assert r["n_lines"] == 3 and r["n_distinct_lines"] == 2


def test_repetition_signals_degenerate_docs(spark):
    """Empty and single-word docs: no bigrams, no down-counting
    sequence (sequence(1, n-1) would generate DESCENDING for n<2)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "   ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["r"] for r in
            df.select("doc_id", T.repetition_signals("text").alias("r")).collect()}
    for i in (1, 3):
        assert rows[i]["n_words"] == 0 and rows[i]["n_bigrams"] == 0
        assert rows[i]["n_lines"] == 0
    assert rows[2]["n_words"] == 1 and rows[2]["n_bigrams"] == 0
    assert rows[2]["total_word_chars"] == 4 and rows[2]["n_lines"] == 1


def test_repetition_signals_random_vs_python_reference(spark):
    """Randomized docs (words, blank lines, repeated lines, punct) vs a
    plain-Python recomputation of every signal."""
    import random
    import re as _re

    rng = random.Random(20260814)
    vocab = ["alpha", "beta", "Gamma", "x1", "the", "a", "??", "zz-top"]
    docs = []
    for i in range(40):
        lines = []
        for _ in range(rng.randrange(0, 6)):
            if rng.random() < 0.2 and lines:
                lines.append(rng.choice(lines))     # duplicate line
            else:
                lines.append(" ".join(
                    rng.choice(vocab) for _ in range(rng.randrange(0, 8))))
        docs.append((i, "\n".join(lines)))

    def ref(text):
        toks = [t for t in _re.split(r"\W+", text.lower()) if t]
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
        return (len(toks), sum(len(t) for t in toks), len(bigrams),
                len(set(bigrams)), len(lines), len(set(lines)))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["r"]["n_words"], r["r"]["total_word_chars"],
                      r["r"]["n_bigrams"], r["r"]["n_distinct_bigrams"],
                      r["r"]["n_lines"], r["r"]["n_distinct_lines"])
        for r in df.select("doc_id", T.repetition_signals("text").alias("r")).collect()
    }
    for i, text in docs:
        assert got[i] == ref(text), f"doc {i}: {text!r}"


class TestChunkDocuments:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_overlap_and_coverage(self, spark):
        words = " ".join(f"w{i}" for i in range(150))
        out = sorted(
            (r["chunk_id"], r["chunk_text"])
            for r in pipeline.chunk_documents(
                self._docs(spark, [(1, words)]), max_tokens=64, overlap=8
            ).collect()
        )
        # ceil((150-8)/56) = 3 chunks at starts 0, 56, 112
        assert [c for c, _ in out] == [0, 1, 2]
        chunks = [t.split(" ") for _, t in out]
        assert chunks[0] == [f"w{i}" for i in range(64)]
        assert chunks[1] == [f"w{i}" for i in range(56, 120)]
        assert chunks[2] == [f"w{i}" for i in range(112, 150)]
        # consecutive chunks share exactly `overlap` tokens
        assert chunks[0][-8:] == chunks[1][:8]
        # every token is covered
        assert set().union(*map(set, chunks)) == {f"w{i}" for i in range(150)}

    def test_short_and_empty_docs_keep_one_chunk(self, spark):
        out = {
            (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
            for r in pipeline.chunk_documents(
                self._docs(spark, [(1, "a b"), (2, "   "), (3, None)]),
                max_tokens=64, overlap=8,
            ).collect()
        }
        assert out == {
            (1, 0): (2, "a b"),
            (2, 0): (0, ""),   # whitespace-only: one empty chunk
            (3, 0): (0, ""),   # null text: same — no doc_id disappears
        }

    def test_bad_overlap_rejected(self, spark):
        docs = self._docs(spark, [(1, "a")])
        with pytest.raises(ValueError):
            pipeline.chunk_documents(docs, max_tokens=8, overlap=8)
        with pytest.raises(ValueError):
            pipeline.chunk_documents(docs, max_tokens=8, overlap=-1)

    def test_matches_python_reference_random(self, spark):
        import random

        rng = random.Random(777)
        rows = [
            (i, " ".join(f"t{rng.randrange(50)}"
                         for _ in range(rng.randrange(0, 200))))
            for i in range(30)
        ]
        got = sorted(
            tuple(r)
            for r in pipeline.chunk_documents(
                self._docs(spark, rows), max_tokens=32, overlap=4
            ).collect()
        )
        want = []
        stride = 28
        for i, text in rows:
            toks = [t for t in text.split(" ") if t]
            nc = max(1, -(-(len(toks) - 4) // stride))
            for c in range(nc):
                w = toks[c * stride:c * stride + 32]
                want.append((i, c, len(w), " ".join(w)))
        assert got == sorted(want)


class TestTfidfTopk:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "apple apple banana cherry"),
                (2, "banana cherry cherry"),
                (3, "apple date"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["doc_id"], r["term"]): (r["tf"], r["doc_freq"], r["score"], r["rank"])
            for r in pipeline.tfidf_topk(docs, k=2, max_df_ratio=1.0).collect()
        }
        # doc_freq: apple 2, banana 2, cherry 2, date 1
        # doc1: apple tf2 -> 2e6/3=666666; banana tf1 -> 333333; cherry 333333
        assert out[(1, "apple")] == (2, 2, 666666, 1)
        assert out[(1, "banana")] == (1, 2, 333333, 2)  # term tiebreak
        # doc2: cherry tf2 666666 rank1; banana 333333 rank2
        assert out[(2, "cherry")] == (2, 2, 666666, 1)
        # doc3: date df1 -> 1e6/2=500000 beats apple 333333
        assert out[(3, "date")] == (1, 1, 500000, 1)
        assert out[(3, "apple")] == (1, 2, 333333, 2)
        assert all(v[3] <= 2 for v in out.values())

    def test_max_df_drops_corpus_wide_terms(self, spark):
        docs = spark.createDataFrame(
            [(i, f"the w{i}") for i in range(10)], "doc_id long, text string"
        )
        out = pipeline.tfidf_topk(docs, k=5, max_df_ratio=0.5).collect()
        assert all(r["term"] != "the" for r in out)   # df=10 > 5
        assert len(out) == 10                          # each unique w_i kept

    def test_matches_python_reference_random(self, spark):
        import math
        import random

        rng = random.Random(41)
        rows = [
            (i, " ".join(f"t{rng.randrange(12)}" for _ in range(rng.randrange(1, 30))))
            for i in range(40)
        ]
        got = sorted(
            tuple(r)
            for r in pipeline.tfidf_topk(
                spark.createDataFrame(rows, "doc_id long, text string"),
                k=3, max_df_ratio=0.8,
            ).collect()
        )
        tf, dfreq = {}, {}
        for i, text in rows:
            counts = {}
            for t in text.split():
                counts[t] = counts.get(t, 0) + 1
            tf[i] = counts
            for t in counts:
                dfreq[t] = dfreq.get(t, 0) + 1
        want = []
        cap = math.floor(len(rows) * 0.8)
        for i, counts in tf.items():
            scored = sorted(
                (
                    (-(c * 1_000_000 // (dfreq[t] + 1))), t, c, dfreq[t]
                )
                for t, c in counts.items()
                if dfreq[t] <= cap
            )
            for rank, (neg, t, c, dfc) in enumerate(scored[:3], 1):
                want.append((i, t, c, dfc, -neg, rank))
        assert got == sorted(want)


class TestDecontaminateExact:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),
                (2, "a quick brown dog"),
                (3, "nothing to see here"),
            ],
            "doc_id long, text string",
        )
        spans = spark.createDataFrame(
            [(10, "quick brown"), (11, "fox"), (12, ""), (13, "zebra")],
            "span_id long, span string",
        )
        out = {
            r["doc_id"]: r["n_spans_hit"]
            for r in pipeline.decontaminate_exact(docs, spans).collect()
        }
        # empty span excluded; doc1 hits both, doc2 one, doc3 none
        assert out == {1: 2, 2: 1}

    def test_duplicate_spans_counted_once(self, spark):
        docs = spark.createDataFrame([(1, "xyz abc")], "doc_id long, text string")
        spans = spark.createDataFrame(
            [(10, "abc"), (10, "abc"), (11, "abc")], "span_id long, span string"
        )
        out = pipeline.decontaminate_exact(docs, spans).collect()
        assert [(r["doc_id"], r["n_spans_hit"]) for r in out] == [(1, 2)]


class TestDecontaminateExactAC:
    """Aho-Corasick form: pinned EQUAL to the broadcast-NLJ form (the
    r7 verdict's #7 — same output contract, span-count-independent
    match cost)."""

    def _spans(self, spark):
        return spark.createDataFrame(
            [(10, "quick brown"), (11, "fox"), (12, ""), (13, "zebra"),
             (14, "he qui"), (15, "own fox jumps")],
            "span_id long, span string",
        )

    def test_equals_nlj_hand_case(self, spark):
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps"), (2, "a quick brown dog"),
             (3, "nothing to see here"), (4, None)],
            "doc_id long, text string",
        )
        spans = self._spans(spark)
        nlj = sorted(map(tuple, pipeline.decontaminate_exact(docs, spans).collect()))
        ac = sorted(map(tuple, pipeline.decontaminate_exact_ac(docs, spans).collect()))
        assert ac == nlj
        assert dict(ac) == {1: 4, 2: 1}

    def test_equals_nlj_on_corpus(self, spark, sf_dir):
        from kafka_streams_app_spark.sources.catalog import load_table
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_dir, "documents")
        spans = docs.filter(
            (F.col("doc_id") % 20 == 0) & (F.length("text") >= 60)
        ).select(
            F.col("doc_id").alias("span_id"),
            F.substring("text", 11, 40).alias("span"),
        )
        nlj = sorted(map(tuple, pipeline.decontaminate_exact(docs, spans).collect()))
        ac = sorted(map(tuple, pipeline.decontaminate_exact_ac(docs, spans).collect()))
        assert ac == nlj and len(ac) > 0

    def test_overlapping_and_nested_patterns(self, spark):
        # suffix-path outputs must propagate through fail links:
        # "ababa" contains aba (x2 overlapping), bab, ababa
        docs = spark.createDataFrame([(1, "ababa")], "doc_id long, text string")
        spans = spark.createDataFrame(
            [(1, "aba"), (2, "bab"), (3, "ababa"), (4, "bb")],
            "span_id long, span string",
        )
        out = pipeline.decontaminate_exact_ac(docs, spans).collect()
        assert [(r["doc_id"], r["n_spans_hit"]) for r in out] == [(1, 3)]


class TestBigramLmLikelihood:
    def test_hand_computed(self, spark):
        # corpus: c2("a b")=3, c2("b a")=1, c2("b c")=1; c1(a)=3, c1(b)=2
        # V = |{a,b,c,x}| = 4
        # p_e9("a b") = floor(4e9/7) = 571428571
        # p_e9("b a") = p_e9("b c") = floor(2e9/6) = 333333333
        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c"), (3, "x"), (4, None)],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: (r["n_bigrams"], r["score_e9"])
            for r in pipeline.bigram_lm_likelihood(docs).collect()
        }
        assert out == {
            1: (3, (2 * 571428571 + 333333333) // 3),  # 492063491
            2: (2, (571428571 + 333333333) // 2),      # 452380952
        }

    def test_matches_python_reference_random(self, spark):
        import random
        from collections import Counter

        rng = random.Random(77)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(0, 25))))
            for i in range(120)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        def toks(s):
            return [t for t in s.lower().split() if t]

        c2, c1 = Counter(), Counter()
        vv = set()
        doc_bgs = {}
        for i, s in rows:
            t = toks(s)
            vv.update(t)
            bgs = [f"{a} {b}" for a, b in zip(t, t[1:])]
            doc_bgs[i] = bgs
            for g in bgs:
                c2[g] += 1
                c1[g.split(" ")[0]] += 1
        want = {}
        for i, bgs in doc_bgs.items():
            if not bgs:
                continue
            ps = [
                (c2[g] + 1) * 1_000_000_000 // (c1[g.split(" ")[0]] + len(vv))
                for g in bgs
            ]
            want[i] = (len(bgs), sum(ps) // len(bgs))
        got = {
            r["doc_id"]: (r["n_bigrams"], r["score_e9"])
            for r in pipeline.bigram_lm_likelihood(docs).collect()
        }
        assert got == want


# ---------------------------------------------------------------------------
# scrub_duplicated_spans (ExactSubstr-style, Lee et al. 2022)
# ---------------------------------------------------------------------------

def _scrub_spans_reference(docs: list[tuple[int, str]], k: int, min_df: int):
    """Python twin: duplicated k-token runs across >= min_df distinct
    docs; every covered token removed."""
    toks = {
        d: [t for t in T.SPLIT_ASCII_RE.split(s.lower()) if t]
        for d, s in docs
    }
    df_count: dict[tuple, set] = {}
    for d, t in toks.items():
        for i in range(len(t) - k + 1):
            df_count.setdefault(tuple(t[i : i + k]), set()).add(d)
    dup = {s for s, ds in df_count.items() if len(ds) >= min_df}
    out = {}
    for d, t in toks.items():
        cov = set()
        for i in range(len(t) - k + 1):
            if tuple(t[i : i + k]) in dup:
                cov.update(range(i, i + k))
        keep = [t[i] for i in range(len(t)) if i not in cov]
        out[d] = (len(t), len(t) - len(keep), " ".join(keep))
    return out


def test_scrub_duplicated_spans_hand_computed(spark):
    """A 8-token run shared by docs 1/2 is cut from both (mid-doc in 2);
    a unique doc and a doc shorter than k pass through; a run repeated
    only WITHIN one doc does not count toward min_df."""
    docs = [
        (1, "a b c d e f g h i j"),
        (2, "x x a b c d e f g h y"),
        (3, "q w e r t y u i o p"),
        (4, "a b c"),
        (5, "p q r s t u v w p q r s t u v w"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["scrubbed_text"])
        for r in pipeline.scrub_duplicated_spans(df, "text", "doc_id", k=8).collect()
    }
    assert out[1] == (10, 8, "i j")
    assert out[2] == (11, 8, "x x y")
    assert out[3] == (10, 0, "q w e r t y u i o p")
    assert out[4] == (3, 0, "a b c")
    assert out[5][1] == 0  # within-doc repeat: df=1, kept
    assert out == _scrub_spans_reference(docs, 8, 2)


def test_scrub_duplicated_spans_long_run_union(spark):
    """A shared 10-token run = union of its three 8-windows: all ten
    tokens go, not just the first window."""
    shared = "one two three four five six seven eight nine ten"
    docs = [(1, f"{shared} tailA"), (2, f"headB {shared}")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_removed"], r["scrubbed_text"])
        for r in pipeline.scrub_duplicated_spans(df, "text", "doc_id", k=8).collect()
    }
    assert out[1] == (10, "taila")
    assert out[2] == (10, "headb")


def test_scrub_duplicated_spans_random_vs_python_reference(spark):
    import random

    rng = random.Random(411)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for d in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["scrubbed_text"])
        for r in pipeline.scrub_duplicated_spans(df, "text", "doc_id", k=4).collect()
    }
    assert got == _scrub_spans_reference(docs, 4, 2)


# ---------------------------------------------------------------------------
# dsir_score (DSIR-style selection, Xie et al. 2023)
# ---------------------------------------------------------------------------

def _dsir_reference(corpus, target, n_buckets, top_n=None):
    """Exact-integer python twin of dsir_score."""
    import hashlib

    def buckets(s):
        return [
            int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % n_buckets
            for w in T.SPLIT_ASCII_RE.split(s.lower()) if w
        ]

    raw = {d: buckets(s) for d, s in corpus}
    rc: dict[int, int] = {}
    for bs in raw.values():
        for b in bs:
            rc[b] = rc.get(b, 0) + 1
    tcnt: dict[int, int] = {}
    for _, s in target:
        for b in buckets(s):
            tcnt[b] = tcnt.get(b, 0) + 1
    dr = sum(rc.values()) + n_buckets
    dt = sum(tcnt.values()) + n_buckets
    out = []
    for d, bs in raw.items():
        if not bs:
            continue
        s = sum(
            (1_000_000 * (tcnt.get(b, 0) + 1) * dr) // ((rc[b] + 1) * dt)
            for b in bs
        )
        out.append((d, len(bs), s // len(bs)))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:top_n] if top_n is not None else sorted(out)


def test_dsir_score_target_like_docs_outscore(spark):
    """Docs written in the target's vocabulary must outscore docs in a
    disjoint vocabulary, and every value must match the exact-integer
    python twin (incl. the empty doc being excluded)."""
    corpus = [
        (1, "alpha beta alpha beta gamma"),
        (2, "zz ww zz ww qq"),
        (3, "alpha beta"),
        (4, ""),
    ]
    target = [(100, "alpha beta gamma alpha"), (101, "beta gamma")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["score_e6"])
        for r in pipeline.dsir_score(cdf, tdf, n_buckets=64).collect()
    )
    ref = _dsir_reference(corpus, target, 64)
    assert got == ref
    by_id = {d: s for d, _, s in got}
    assert by_id[1] > by_id[2] and by_id[3] > by_id[2]
    assert 4 not in by_id


def test_dsir_score_top_n_order_and_tiebreak(spark):
    """top_n returns exactly the (score DESC, doc_id ASC) head — ties
    (identical docs) resolve by id, so the cut is deterministic."""
    # junk docs appear as often as the target-like ones so their raw
    # counts match — otherwise Laplace smoothing inflates raw-singleton
    # tokens (ratio ~ Dr/((rc+1)*Dt)) above genuinely target-like text
    corpus = [(i, "same text here") for i in range(6)] + [
        (10 + i, "unrelated junk words") for i in range(6)
    ]
    target = [(0, "same text")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = [
        (r["doc_id"], r["n_tokens"], r["score_e6"])
        for r in pipeline.dsir_score(cdf, tdf, n_buckets=64, top_n=4).collect()
    ]
    assert got == _dsir_reference(corpus, target, 64, top_n=4)
    assert [d for d, _, _ in got] == [0, 1, 2, 3]


def test_dsir_score_random_vs_python_reference(spark):
    import random

    rng = random.Random(2302)
    vocab = [f"tok{i}" for i in range(40)]
    corpus = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25))))
        for d in range(50)
    ]
    target = [
        (d, " ".join(rng.choice(vocab[:12]) for _ in range(rng.randint(1, 25))))
        for d in range(8)
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["score_e6"])
        for r in pipeline.dsir_score(cdf, tdf, n_buckets=32).collect()
    )
    assert got == _dsir_reference(corpus, target, 32)


# ---------------------------------------------------------------------------
# stratified_fixed_k
# ---------------------------------------------------------------------------

def test_stratified_fixed_k_exact_counts_and_determinism(spark):
    """Exactly k rows per stratum (fewer iff the stratum is smaller);
    the selected set is a pure function of (seed, ids) — stable across
    repartitionings; a different seed picks a different set."""
    import hashlib

    rows = [(i, "big" if i < 40 else "small") for i in range(46)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def run(seed, parts):
        out = pipeline.stratified_fixed_k(
            df.repartition(parts), "source", "doc_id", k=5, seed=seed
        ).collect()
        return {(r["doc_id"], r["source"], r["sample_rank"]) for r in out}

    a, b = run(3, 2), run(3, 7)
    assert a == b  # partitioning-independent
    by_src = {}
    for _, s, _ in a:
        by_src[s] = by_src.get(s, 0) + 1
    assert by_src == {"big": 5, "small": 5}
    # python twin: md5('3:id') order, id tie-break
    def ref(seed, stratum):
        ids = [i for i, s in rows if s == stratum]
        ids.sort(key=lambda i: (
            int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16), i))
        return set(ids[:5])
    assert {i for i, s, _ in a if s == "big"} == ref(3, "big")
    assert {i for i, s, _ in a if s == "small"} == ref(3, "small")
    assert run(4, 2) != a  # seed moves the sample


def test_stratified_fixed_k_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, source string"
    )
    out = pipeline.stratified_fixed_k(df, "source", "doc_id", k=10).collect()
    assert len(out) == 3
    assert sorted(r["sample_rank"] for r in out if r["source"] == "x") == [1, 2]


def test_corpus_collocations_hand_corpus(spark):
    """Dice arithmetic against hand computation: 'new york' appears 3x,
    'new' 3x, 'york' 3x -> dice 2*3/(3+3)=1.0 -> 1_000_000 ppm;
    'york is' 2x with cnt('is')=2 -> 2*2/(3+2)=0.8 -> 800_000. Null,
    single-token, and empty docs contribute nothing; min_count drops
    singleton pairs before scoring."""
    from kafka_streams_app_spark.operators.pipeline import corpus_collocations

    df = spark.createDataFrame(
        [(1, "new york is big and new york is busy"),
         (2, "the big apple new york"),
         (3, "one token"),
         (4, None),
         (5, "x")],
        "doc_id long, text string")
    got = [tuple(r) for r in corpus_collocations(df, k=5, min_count=2).collect()]
    assert got == [
        ("new", "york", 3, 3, 3, 1_000_000),
        ("york", "is", 2, 3, 2, 800_000),
    ]
    # min_count=1 admits the singleton pairs; top slot unchanged
    all_pairs = corpus_collocations(df, k=100, min_count=1).collect()
    assert all_pairs[0]["dice_ppm"] == 1_000_000
    assert all(r["cnt_ab"] >= 1 for r in all_pairs)


def test_corpus_collocations_deterministic_tie_order(spark):
    """Equal-score pairs must order by (a, b) so the top-k SET is a
    pure function of the corpus — the property the oracle hash needs."""
    from kafka_streams_app_spark.operators.pipeline import corpus_collocations

    # two disjoint perfect collocations, each 2x: identical dice score
    df = spark.createDataFrame(
        [(1, "aa bb cc. aa bb cc"), (2, "zz yy. zz yy")],
        "doc_id long, text string")
    got = [(r["a"], r["b"]) for r in
           corpus_collocations(df, k=10, min_count=2).collect()]
    # all three qualifying pairs tie at dice 1.0 -> pure (a, b) order
    assert got == [("aa", "bb"), ("bb", "cc"), ("zz", "yy")]
    # truncation keeps the lexicographically-first of the tied block
    top1 = corpus_collocations(df, k=1, min_count=2).collect()[0]
    assert (top1["a"], top1["b"]) == ("aa", "bb")
