"""Cross-method consistency pins for dedup/similarity (north-star ops).

The oracle gate checks each method against SQL; these pin the
METHOD-vs-METHOD guarantees the docstrings claim (LSH recall vs brute
force, cap-vs-uncapped equivalence on rare-shingle dups).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_app_spark.operators import dedup, similarity
from kafka_streams_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_lsh_equals_brute_force(spark):
    """At threshold 0.8 with 64x2 banding, candidate recall is ~1-4e-29:
    the LSH pipeline must return EXACTLY the brute-force pair set."""
    docs = load_table(spark, SF, "documents")
    brute = pairs(dedup.dedup_ngram_jaccard(docs, "text", "doc_id", threshold=0.8))
    lsh = pairs(dedup.dedup_minhash_lsh(docs, "text", "doc_id", threshold=0.8))
    assert lsh == brute
    assert len(brute) > 0  # testdata plants near-dups; empty would be vacuous


def test_ngram_cap_preserves_rare_shingle_dups(spark):
    """The hot-shingle cap prunes pair GENERATION only; planted dups
    share rare shingles, so capped == uncapped here."""
    docs = load_table(spark, SF, "documents")
    uncapped = pairs(dedup.dedup_ngram_jaccard(docs, "text", "doc_id", threshold=0.8))
    capped = pairs(
        dedup.dedup_ngram_jaccard(docs, "text", "doc_id", threshold=0.8, max_df=25)
    )
    assert capped == uncapped


def test_simhash_finds_planted_dups(spark):
    """Near-identical docs (jaccard ~0.99) must land within Hamming<=3."""
    docs = load_table(spark, SF, "documents")
    planted = pairs(dedup.dedup_ngram_jaccard(docs, "text", "doc_id", threshold=0.95))
    sim = pairs(dedup.dedup_simhash(docs, "text", "doc_id", max_hamming=3))
    missed = planted - sim
    # SimHash is lossier than MinHash; demand it finds most planted dups
    assert len(planted) > 0
    assert len(missed) <= len(planted) // 4


def test_embedding_lsh_subset_of_exact(spark):
    """LSH candidates are verified with exact cosine, so LSH output is a
    SUBSET of the exact method's output at the same threshold."""
    emb = load_table(spark, SF, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_embedding_cosine(
            emb, "vec_id", "embedding", threshold=0.35, method="exact"
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_embedding_cosine(
            emb, "vec_id", "embedding", threshold=0.35, method="lsh", dim=64
        ).collect()
    }
    assert lsh <= exact


def test_embedding_lsh_inline_equals_ids_first(spark):
    """n_planes='auto' switches to the inline-verify plan (cosine
    computed in the bucket join, dedup after the threshold filter);
    fixed n_planes keeps the dedup-then-attach plan. At the same
    resolved p the two plans must emit IDENTICAL (id_a, id_b, cos)
    rows — the strategies differ only in where the verify runs."""
    import math

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    p = max(6, math.ceil(math.log2(max(n, 1) / 64)))
    rows = lambda df: {
        (r["id_a"], r["id_b"], r["cos"]) for r in df.collect()
    }
    inline = rows(dedup.dedup_embedding_cosine(
        emb, "vec_id", "embedding", threshold=0.35, method="lsh", dim=64,
        n_planes="auto"))
    ids_first = rows(dedup.dedup_embedding_cosine(
        emb, "vec_id", "embedding", threshold=0.35, method="lsh", dim=64,
        n_planes=p))
    assert inline == ids_first
    assert len(inline) > 0  # empty would be vacuous


def test_lsh_ann_subset_and_ranked(spark):
    """ANN results: ranks contiguous from 1 per query, cos descending,
    and every (query, neighbor) pair scored identically to exact."""
    emb = load_table(spark, SF, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    ann = similarity.lsh_ann_topk(emb, qs, "vec_id", "embedding", dim=64, k=5)
    rows = ann.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for ranked in by_q.values():
        ranked.sort()
        assert [x[0] for x in ranked] == list(range(1, len(ranked) + 1))
        sims = [x[1] for x in ranked]
        assert sims == sorted(sims, reverse=True)


def test_containment_flags_snippet_inside_page(spark):
    """A short doc fully embedded in a long one: Jaccard is tiny (the
    union is the long doc) but containment of the snippet is 1.0 and
    DIRECTED — only (snippet -> page), never the reverse."""
    from kafka_streams_app_spark.operators.dedup import (
        dedup_containment,
        dedup_ngram_jaccard,
    )

    page_words = [f"w{i}" for i in range(200)]
    snippet = " ".join(page_words[50:60])      # 10 words inside the page
    page = " ".join(page_words)
    other = " ".join(f"z{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, page), (2, snippet), (3, other)], "doc_id long, text string"
    )
    got = [
        (r["doc_sub"], r["doc_super"], r["containment"])
        for r in dedup_containment(df, "text", "doc_id", k=3, threshold=0.9).collect()
    ]
    assert got == [(2, 1, 1.0)]
    # the same pair is invisible to symmetric Jaccard at any real threshold
    assert dedup_ngram_jaccard(df, "text", "doc_id", k=3, threshold=0.1).count() == 0


def test_embedding_dim_stats_exact(spark):
    """Per-dimension stats vs hand computation; quantization makes the
    sums exact integers independent of partition/summation order."""
    from kafka_streams_app_spark.operators.similarity import embedding_dim_stats

    df = spark.createDataFrame(
        [(1, [1.0, -0.5]), (2, [0.25, 2.0]), (3, [0.0, 0.0000005])],
        "vec_id long, embedding array<float>",
    ).repartition(3)
    got = {r["pos"]: r for r in embedding_dim_stats(df, "embedding").collect()}
    assert got[0]["n"] == 3 and got[1]["n"] == 3
    assert got[0]["sum_q"] == 1_000_000 + 250_000 + 0
    # floor quantization: -0.5 -> -500000, 5e-7 -> 0 (floor toward -inf)
    assert got[1]["sum_q"] == -500_000 + 2_000_000 + 0
    assert got[1]["min_q"] == -500_000 and got[1]["max_q"] == 2_000_000


class TestDedupWinnowing:
    def _pairs(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return sorted(
            (r["doc_a"], r["doc_b"], r["n_shared"])
            for r in dedup.dedup_winnowing(df, "text", "doc_id", **kw).collect()
        )

    def test_shared_run_guarantee(self, spark):
        """Any shared run of >= k + window - 1 tokens yields a shared
        fingerprint (Schleimer'03 guarantee); with two long disjoint
        docs embedding the same passage, the pair must surface."""
        passage = " ".join(f"p{i}" for i in range(20))  # 20 >> 5+4-1
        a = "alpha beta gamma " + passage + " delta epsilon"
        b = "one two three four five " + passage + " six seven"
        c = " ".join(f"z{i}" for i in range(40))  # unrelated
        got = self._pairs(spark, [(1, a), (2, b), (3, c)], min_shared=1)
        assert [p[:2] for p in got] == [(1, 2)]
        assert got[0][2] >= 1

    def test_disjoint_docs_no_pairs(self, spark):
        rows = [(i, " ".join(f"d{i}w{j}" for j in range(30))) for i in range(4)]
        assert self._pairs(spark, rows, min_shared=1) == []

    def test_hot_fingerprint_cap(self, spark):
        """A passage shared by MANY docs is boilerplate: max_df drops
        its fingerprints, so the all-pairs clique disappears."""
        boiler = " ".join(f"b{i}" for i in range(20))
        rows = [(i, f"u{i}a u{i}b u{i}c " + boiler) for i in range(6)]
        full = self._pairs(spark, rows, min_shared=1)
        assert len(full) == 15  # 6C2 — the boilerplate clique
        capped = self._pairs(spark, rows, min_shared=1, max_df=3)
        # the cap drops every fingerprint present in >3 docs, collapsing
        # the clique; the odd survivor pair is legal (a window near the
        # unique prefix can select an interior gram in only 2 docs,
        # keeping its df under the cap) but must stay a small subset
        assert set(p[:2] for p in capped) < set(p[:2] for p in full)
        assert len(capped) <= 3

    def test_md5_and_xxhash_find_the_same_planted_pair(self, spark):
        passage = " ".join(f"q{i}" for i in range(15))
        rows = [(1, "x y z " + passage), (2, passage + " k l m"),
                (3, "totally different words here all unique tokens")]
        for fn in ("md5", "xxhash64"):
            got = self._pairs(spark, rows, min_shared=1, hash_fn=fn)
            assert [p[:2] for p in got] == [(1, 2)], fn


# --- ANN hard negatives (r12) ------------------------------------------------

def _planted_hard_neg_corpus(spark, n_anchors=10, dim=16, seed=7):
    """n_anchors anchors (ids 0,100,200,...) each with a planted
    near-duplicate twin (id+1, cos ~0.999) under a DIFFERENT label —
    the textbook hard negative — plus 200 random background vectors."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_anchors):
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        rows.append((i * 100, f"l{i % 3}", [float(x) for x in v]))
        twin = v + rng.standard_normal(dim) * 0.01
        twin /= np.linalg.norm(twin)
        rows.append((i * 100 + 1, f"l{(i + 1) % 3}", [float(x) for x in twin]))
    for j in range(200):
        w = rng.standard_normal(dim)
        w /= np.linalg.norm(w)
        # odd ids: background must never match the %100==0 anchor filter
        rows.append((10_001 + 2 * j, f"l{j % 3}", [float(x) for x in w]))
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


def test_hard_negatives_ann_recall_on_planted_twins(spark):
    """Every anchor's planted different-label near-dup twin (cos~0.999)
    must come back at rank 1 through the LSH candidate path (sign-LSH
    at 6 planes x 8 tables catches cos>=0.9 with ~98% per-table-union
    probability; 10/10 planted twins is the deterministic-seed pin),
    and no returned negative may share the anchor's label."""
    emb = _planted_hard_neg_corpus(spark)
    anchors = emb.filter(F.col("vec_id") % 100 == 0)
    out = similarity.hard_negatives_ann(
        emb, anchors, "vec_id", "embedding", "label", dim=16, k=3,
        plane_fn="md5",
    ).collect()
    top1 = {r["anchor_id"]: r["negative_id"] for r in out if r["rank"] == 1}
    assert top1 == {i * 100: i * 100 + 1 for i in range(10)}
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    for r in out:
        assert r["neg_label"] != labels[r["anchor_id"]]
        assert r["neg_label"] == labels[r["negative_id"]]


def test_hard_negatives_ann_matches_exact_where_found(spark):
    """ANN hard negatives vs the exact twin on real sf0.001 embeddings:
    every pair the ANN path reports must carry the exact method's
    cosine, and ANN recall of the exact top-5 must beat the random-
    bucket baseline (weak-similarity regime: sign-LSH recall here is
    structural, not ~1 — see lsh_ann_topk docstring)."""
    emb = load_table(spark, SF, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 50 == 0)
    exact = similarity.hard_negatives(
        emb, anchors, "vec_id", "embedding", "label", k=5)
    ann = similarity.hard_negatives_ann(
        emb, anchors, "vec_id", "embedding", "label", dim=64, k=5,
        plane_fn="md5")
    e = {(r["anchor_id"], r["negative_id"]): r["cos_sim"] for r in exact.collect()}
    a = {(r["anchor_id"], r["negative_id"]): r["cos_sim"] for r in ann.collect()}
    hits = set(e) & set(a)
    assert len(hits) / len(e) > 0.2  # >> the 2^-6-per-table random baseline
    for pair in hits:
        assert abs(e[pair] - a[pair]) < 1e-12


def test_minhash_hot_band_cap(spark):
    """max_band_df (r14 verdict ask #5): band buckets with more than
    max_band_df members are dropped before the self-join. A 5-doc
    identical boilerplate cluster (every shared band df=5) is pruned
    at cap 4 while a rare near-dup pair (band df=2) survives; a cap
    above the max df reproduces the uncapped set exactly."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rare_a = "completely different rare content about alpine glaciers melting fast"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(1, 6)]
        + [(10, rare_a), (11, rare_a + " now")],
        "doc_id long, text string",
    )
    uncapped = pairs(
        dedup.dedup_minhash_lsh(docs, "text", "doc_id", threshold=0.8)
    )
    boiler_pairs = {(a, b) for a in range(1, 6) for b in range(a + 1, 6)}
    assert boiler_pairs <= uncapped
    assert (10, 11) in uncapped

    capped = pairs(
        dedup.dedup_minhash_lsh(
            docs, "text", "doc_id", threshold=0.8, max_band_df=4
        )
    )
    assert capped & boiler_pairs == set()
    assert (10, 11) in capped

    loose = pairs(
        dedup.dedup_minhash_lsh(
            docs, "text", "doc_id", threshold=0.8, max_band_df=100
        )
    )
    assert loose == uncapped


def test_minhash_band_cap_auto_default(spark, monkeypatch):
    """r16 verdict ask #3: max_band_df defaults to "auto" — OFF (the
    exact/oracle path) below the size threshold, the production cap
    (512, above every measured organic band df) for corpus-sized
    inputs. The gate reads the optimizer's size ESTIMATE, so it costs
    no job; this pins both directions plus result equality when the
    auto cap engages but no bucket exceeds it."""
    from kafka_streams_app_spark.sources.catalog import load_table

    # small PARQUET input (file-size-derived stats): auto resolves to
    # None — the exact/oracle path the declared entry takes at test SFs
    lake = load_table(spark, "/root/testdata/sf0.001", "documents")
    assert dedup._auto_band_cap(lake) is None
    # unknown-stat input (RDD-backed frame => Long.MaxValue estimate):
    # the cap engages — the safe direction for unbounded inputs
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, boiler + f" tail{i}") for i in range(1, 8)],
        "doc_id long, text string",
    )
    assert dedup._auto_band_cap(docs) == dedup.MINHASH_BAND_CAP_AUTO
    # with every bucket df far below 512, an engaged cap changes nothing
    baseline = pairs(
        dedup.dedup_minhash_lsh(docs, "text", "doc_id", max_band_df=None))
    assert pairs(dedup.dedup_minhash_lsh(docs, "text", "doc_id")) == baseline
    # threshold knob: a forced-low threshold engages the cap on any input
    monkeypatch.setattr(dedup, "MINHASH_BAND_CAP_MIN_BYTES", 0)
    assert dedup._auto_band_cap(lake) == dedup.MINHASH_BAND_CAP_AUTO


def test_embedding_dedup_stream_equals_batch_lsh(spark):
    """embedding_dedup_candidates_stream (r15): the at-ingest
    embedding near-dup searcher emits EXACTLY the batch
    dedup_embedding_cosine(method='lsh', plane_fn='md5') pair set —
    values bit-identical (the verify runs through the same JVM
    dot/norm/round expressions) — as a batch plan AND across an
    arbitrary micro-batch split of the same corpus."""
    from kafka_streams_app_spark.streaming.harness import MicroBatchReplay

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = sorted(
        tuple(r) for r in dedup.dedup_embedding_cosine(
            emb, "vec_id", "embedding", threshold=0.4, method="lsh",
            dim=64, plane_fn="md5",
        ).collect()
    )
    assert len(want) > 0
    got = sorted(
        tuple(r) for r in dedup.embedding_dedup_candidates_stream(
            emb, emb, "vec_id", "embedding", dim=64, threshold=0.4,
        ).collect()
    )
    assert got == want

    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.collect()
    ]
    schema = "vec_id long, embedding array<double>"
    with MicroBatchReplay(
        spark, schema,
        lambda src: dedup.embedding_dedup_candidates_stream(
            src, emb, "vec_id", "embedding", dim=64, threshold=0.4,
        ),
        "append",
    ) as r:
        r.pipe(rows[: len(rows) // 2])
        r.pipe(rows[len(rows) // 2:])
        stream = sorted(tuple(x) for x in r.drain())
    assert stream == want
