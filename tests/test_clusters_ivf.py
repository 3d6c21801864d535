"""Pins for the round-3 additions: connected-components dedup
clustering and IVF ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_app_spark.operators.dedup import dedup_clusters
from kafka_streams_app_spark.operators.similarity import cosine_topk, ivf_topk


def test_dedup_clusters_transitive_chain(spark):
    """a~b and b~c but not a~c directly: one cluster via transitivity;
    the min id labels all three; singletons label themselves."""
    docs = spark.createDataFrame(
        [(10, "x"), (11, "x"), (12, "x"), (50, "y")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12)], "doc_a long, doc_b long"
    )
    out = dict(
        (r["doc_id"], r["cluster_id"])
        for r in dedup_clusters(docs, "text", "doc_id", pairs=pairs).collect()
    )
    assert out == {10: 10, 11: 10, 12: 10, 50: 50}


def test_dedup_clusters_long_chain_converges(spark):
    """A path graph 0-1-2-...-9 needs several propagation rounds; all
    nodes must still collapse to label 0."""
    n = 10
    docs = spark.createDataFrame([(i, "t") for i in range(n)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = dedup_clusters(docs, "text", "doc_id", pairs=pairs).collect()
    assert {r["cluster_id"] for r in out} == {0}
    assert len(out) == n


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with nprobe=4 over ~29 lists must recover most of the exact
    top-10 (random data: neighbors are weak, but probing 4/29 of the
    space plus exact rerank keeps recall well above the 4/29 baseline),
    and every returned cosine must equal the exact method's value."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=10)
    approx = ivf_topk(emb, queries, "vec_id", "embedding", k=10)
    e = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in approx.collect()}
    hits = set(e) & set(a)
    assert len(hits) / len(e) > 0.3  # >> 4/29 random-probe baseline
    for pair in hits:  # cosine values identical where both report the pair
        assert abs(e[pair] - a[pair]) < 1e-12


# --- SemDeDup (r11 continuation) --------------------------------------------

def _semdedup_fixture(spark):
    """Two deterministic centroids (vec_id % 5 == 0 -> ids 0 and 5:
    A=[1,0,0,0], B=[0,1,0,0]) plus planted twins and a cross-cluster
    boundary pair. Hand-checked assignments/cosines (4-dim, exact):

      cluster 0: ids 0, 1 (cos(0,1)=.99995 twin), 2, 3, 4, 8, 9
                 (8/9 tie-break to the lowest cid; cos(8,9)=1.0)
      cluster 5: ids 5, 6 (cos(5,6)=.99995 twin), 7
      ids 3=[.55,.45,..] / 7=[.45,.55,..]: cos=.98 but OPPOSITE sides
      of the Voronoi boundary — the paper-documented recall miss.
    """
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.6, 0.0, 0.35, 0.0]),
        (3, [0.55, 0.45, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 1.0, 0.0, 0.0]),
        (6, [0.01, 0.995, 0.0, 0.0]),
        (7, [0.45, 0.55, 0.0, 0.0]),
        (8, [0.0, 0.0, 0.6, 0.8]),
        (9, [0.0, 0.0, 0.6, 0.8]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_greedy_drop_and_boundary_miss(spark):
    from kafka_streams_app_spark.operators.similarity import semdedup

    emb = _semdedup_fixture(spark)
    out = {
        r["vec_id"]: r["cluster_id"]
        for r in semdedup(
            emb, "vec_id", "embedding", threshold=0.9, centroid_mod=(5, 0)
        ).collect()
    }
    # twins 1 (vs 0), 6 (vs 5), 9 (vs 8) dropped; the boundary pair
    # (3, 7) survives in SEPARATE clusters despite cos=.98 — the
    # documented SemDeDup recall trade
    assert out == {0: 0, 2: 0, 3: 0, 4: 0, 8: 0, 5: 5, 7: 5}


def test_semdedup_threshold_binds(spark):
    from kafka_streams_app_spark.operators.similarity import semdedup

    emb = _semdedup_fixture(spark)
    kept = {
        r["vec_id"]
        for r in semdedup(
            emb, "vec_id", "embedding", threshold=0.99999, centroid_mod=(5, 0)
        ).collect()
    }
    # only the bit-exact duplicate pair (8, 9) crosses .99999 after the
    # 6dp rounding (the .99995 twins round BELOW it) -> only 9 drops
    assert kept == {0, 1, 2, 3, 4, 5, 6, 7, 8}


# --- kmeans_lloyd (r11 continuation) -----------------------------------------

def _kmeans_reference(rows, mod, rem, iters):
    """Pure-python exact-integer Lloyd twin (floor-div means, ties to
    lowest centroid id, empty clusters keep their centroid)."""
    q = {i: [int(__import__("math").floor(x * 1e6)) for x in v] for i, v in rows}
    cids = sorted(i for i in q if i % mod == rem)
    cmat = {c: list(q[c]) for c in cids}

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                cids,
                key=lambda c: (sum((a - b) ** 2 for a, b in zip(v, cmat[c])), c),
            )
            out[i] = best
        return out

    for _ in range(iters):
        a = assign()
        for c in cids:
            memb = [q[i] for i in q if a[i] == c]
            if memb:
                n = len(memb)
                cmat[c] = [sum(col) // n for col in zip(*memb)]
    return assign()


def test_kmeans_lloyd_matches_exact_python_replay(spark):
    import random

    from kafka_streams_app_spark.operators.similarity import kmeans_lloyd

    rng = random.Random(1107)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_lloyd(
            df, "vec_id", "embedding", centroid_mod=(7, 2), iters=2
        ).collect()
    }
    assert got == _kmeans_reference(rows, 7, 2, 2)


def test_kmeans_lloyd_empty_cluster_keeps_centroid(spark):
    """Duplicate centroid rows: ties go to the lowest cid, so the
    higher twin's cluster is empty in round 1 — it must KEEP its
    centroid (not crash / not NaN). The kept centroid then wins the
    exact-duplicate points BACK in round 2 (cluster 0's mean drifted
    toward the far point): if the empty cluster had been dropped,
    label 3 could never reappear."""
    from kafka_streams_app_spark.operators.similarity import kmeans_lloyd

    rows = [
        (0, [1.0, 0.0]),
        (3, [1.0, 0.0]),   # duplicate of centroid 0 -> cluster 3 empty
        (1, [0.9, 0.1]),
        (2, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_lloyd(
            df, "vec_id", "embedding", centroid_mod=(3, 0), iters=2
        ).collect()
    }
    assert got == _kmeans_reference(rows, 3, 0, 2)
    assert got[0] == 3 and got[3] == 3  # carried centroid reclaims its twins


def test_kmeans_lloyd_floor_division_is_floor_not_truncate(spark):
    """Negative coordinate sums: mean must floor toward -inf (python
    //), not truncate toward zero — q values {0, -3} average to -2
    under floor (truncation would say -1)."""
    from kafka_streams_app_spark.operators.similarity import kmeans_lloyd

    rows = [
        (0, [0.0, 0.0]),            # centroid, q [0, 0]
        (1, [-0.000003, 0.0]),      # q [-3, 0] -> c0 mean [-2, 0] floored
        (5, [1.0, 1.0]),            # far centroid keeps the pair apart
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_lloyd(
            df, "vec_id", "embedding", centroid_mod=(5, 0), iters=1
        ).collect()
    }
    assert got == _kmeans_reference(rows, 5, 0, 1)


# --- hard_negatives (r11 continuation) ---------------------------------------

def test_hard_negatives_excludes_same_label_and_ranks(spark):
    """The anchor's NEAREST vector shares its label, so it must be
    skipped; ranks order the different-label rest by cosine with the
    id tie-break; k bounds the output."""
    from kafka_streams_app_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 1),    # anchor, label 1
        (1, [0.99, 0.01], 1),  # nearest overall but SAME label -> excluded
        (2, [0.9, 0.1], 2),    # best hard negative
        (3, [0.5, 0.5], 2),
        (4, [0.0, 1.0], 3),    # orthogonal-ish, worst
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    anchors = emb.filter("vec_id = 0")
    out = [
        (r["rank"], r["negative_id"], r["neg_label"])
        for r in sorted(
            hard_negatives(emb, anchors, "vec_id", "embedding", "label", k=2)
            .collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert out == [(1, 2, 2), (2, 3, 2)]  # id 1 skipped, id 4 cut by k=2


# --- product quantization (r12) ----------------------------------------------

def test_pq_planted_duplicate_at_rank_one(spark):
    """An exact duplicate of the query vector quantizes to identical
    codes in every subspace, so its ADC equals the query's OWN
    quantization error — the minimum any vector can score against this
    query (ADC is asymmetric: query-to-centroid, never
    query-to-neighbor). The twin must come back at rank 1 with exactly
    that error, computed independently here."""
    import numpy as np
    from kafka_streams_app_spark.operators.similarity import pq_topk

    rng = np.random.default_rng(11)
    rows = []
    for i in range(120):
        v = rng.standard_normal(16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    # query 100 gets an exact twin at id 7 (neither is a codebook id:
    # 7 % 17 != 3 and 100 % 17 != 3)
    rows[7] = (7, rows[100][1])
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_topk(
        emb, emb.filter("vec_id = 100"), "vec_id", "embedding",
        dim=16, k=3, m=4, centroid_mod=(17, 3),
    ).collect()
    top1 = [r for r in out if r["rank"] == 1][0]
    assert top1["neighbor_id"] == 7

    # independent quantization-error reference
    qz = {i: np.floor(np.asarray(v) * 1e6).astype(np.int64)
          for i, v in rows}
    cids = sorted(i for i in qz if i % 17 == 3)
    csub = np.stack([qz[i] for i in cids]).reshape(len(cids), 4, 4)
    csub = csub.transpose(1, 0, 2)
    qs = qz[100].reshape(4, 4)
    d = ((qs[:, None, :] - csub) ** 2).sum(axis=2)          # (4, nc)
    self_err = int(d[np.arange(4), d.argmin(axis=1)].sum())
    assert top1["adc_dist"] == self_err


def test_pq_rank_structure_and_numpy_reference(spark, sf_dir):
    """On real embeddings: ranks contiguous from 1 per query, ADC
    non-decreasing with rank, self excluded — and every returned
    adc_dist equals an independent numpy recomputation (codebook ->
    codes -> LUT -> sum) bit-for-bit."""
    import numpy as np
    from pyspark.sql import functions as F
    from kafka_streams_app_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = pq_topk(
        emb, emb.filter(F.col("vec_id") % 100 == 0), "vec_id",
        "embedding", dim=64, k=5, m=8, centroid_mod=(17, 3),
    ).collect()
    by_q: dict = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_dist"]))
    assert by_q
    for ranked in by_q.values():
        ranked.sort()
        assert [x[0] for x in ranked] == list(range(1, len(ranked) + 1))
        dists = [x[1] for x in ranked]
        assert dists == sorted(dists)

    # independent reference
    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    qz = {i: np.floor(v * 1e6).astype(np.int64) for i, v in rows.items()}
    cids = sorted(i for i in rows if i % 17 == 3)
    cmat = np.stack([qz[i] for i in cids])            # (nc, 64)
    csub = cmat.reshape(len(cids), 8, 8).transpose(1, 0, 2)

    def sub_d(x):                                      # (8, nc)
        xs = x.reshape(8, 8)
        return ((xs[:, None, :] - csub) ** 2).sum(axis=2)

    codes = {i: sub_d(q).argmin(axis=1) for i, q in qz.items()}
    for r in out:
        lut = sub_d(qz[r["query_id"]])
        ref = int(lut[np.arange(8), codes[r["neighbor_id"]]].sum())
        assert r["adc_dist"] == ref


# --- IVF-PQ (r12) -------------------------------------------------------------

def test_ivfpq_planted_twin_and_probed_lists_only(spark):
    """(a) An exact duplicate of the query shares its coarse cell and
    its residual codes, so it scores the query's own residual
    quantization error and must come back at rank 1. (b) EVERY
    returned neighbor's coarse cell must be one of the query's nprobe
    probes (candidates never leak from unprobed lists) — both checked
    against an independent numpy rebuild of the index."""
    import numpy as np
    from kafka_streams_app_spark.operators.similarity import ivfpq_topk

    rng = np.random.default_rng(23)
    rows = []
    for i in range(300):
        v = rng.standard_normal(16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    rows[9] = (9, rows[100][1])  # exact twin of query 100 (9%17!=3, 9%13!=5)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivfpq_topk(
        emb, emb.filter("vec_id % 100 = 0"), "vec_id", "embedding",
        dim=16, k=4, m=4, coarse_mod=(17, 3), pq_mod=(13, 5), nprobe=3,
    ).collect()

    # numpy rebuild
    qz = {i: np.floor(np.asarray(v) * 1e6).astype(np.int64) for i, v in rows}
    c_ids = sorted(i for i in qz if i % 17 == 3)
    cmat = np.stack([qz[i] for i in c_ids])

    def coarse(x):
        return int(((x[None, :] - cmat) ** 2).sum(axis=1).argmin())

    cell = {i: coarse(q) for i, q in qz.items()}
    probes = {}
    for qid in (0, 100, 200):
        d = ((qz[qid][None, :] - cmat) ** 2).sum(axis=1)
        probes[qid] = set(np.argsort(d, kind="stable")[:3].tolist())
    for r in out:
        assert cell[r["neighbor_id"]] in probes[r["query_id"]], r

    top1_100 = [r for r in out if r["query_id"] == 100 and r["rank"] == 1][0]
    assert top1_100["neighbor_id"] == 9

    # twin's ADC == query's own residual quantization error
    p_ids = sorted(i for i in qz if i % 13 == 5)
    pres = np.stack([qz[i] - cmat[cell[i]] for i in p_ids])  # (ncp, 16)
    psub = pres.reshape(len(p_ids), 4, 4).transpose(1, 0, 2)
    r100 = (qz[100] - cmat[cell[100]]).reshape(4, 4)
    d = ((r100[:, None, :] - psub) ** 2).sum(axis=2)  # (4, ncp)
    self_err = int(d[np.arange(4), d.argmin(axis=1)].sum())
    assert top1_100["adc_dist"] == self_err


def test_pq_family_never_collects_query_dataframe(spark, sf_dir):
    """r12 verdict #2: the query set must stay distributed. Poison the
    query DataFrame's collect(); plan construction must still succeed
    (only the bounded codebook collects may run) and the result must
    still rank correctly."""
    from pyspark.sql import DataFrame

    from kafka_streams_app_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)

    poisoned = {"hit": False}
    orig = DataFrame.collect

    def poison(self, *a, **kw):
        poisoned["hit"] = True
        raise AssertionError("query DataFrame collected on the driver")

    queries.collect = poison.__get__(queries, DataFrame)
    out_pq = pq_topk(emb, queries, "vec_id", "embedding", dim=64, k=3)
    out_ivfpq = ivfpq_topk(emb, queries, "vec_id", "embedding", dim=64, k=3)
    assert not poisoned["hit"]
    assert orig(out_pq.filter("rank = 1").limit(1))  # executes fine
    assert orig(out_ivfpq.filter("rank = 1").limit(1))


def test_pq_assign_matches_numpy_and_stream_equals_batch(spark, sf_dir):
    """pq_assign (r14 ingest-side twin): batch codes equal an
    independent NumPy recompute of the exact-int subspace argmin
    (centroid IDS, ties -> lowest), and the streaming stream-static
    path emits the identical (id, j, cid) set per micro-batch."""
    import numpy as np

    from kafka_streams_app_spark.operators.similarity import pq_assign
    from kafka_streams_app_spark.streaming.harness import MicroBatchReplay

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = sorted(
        tuple(r)
        for r in pq_assign(
            emb, emb, "vec_id", "embedding", dim=64, m=8
        ).collect()
    )

    rows = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.collect()
    )
    q = {i: np.floor(np.array(v) * 1e6).astype(np.int64) for i, v in rows}
    cids = sorted(i for i, _ in rows if i % 17 == 3)
    want = []
    for i, _ in rows:
        for j in range(8):
            sub = q[i][j * 8:(j + 1) * 8]
            best = min(
                (int(((sub - q[c][j * 8:(j + 1) * 8]) ** 2).sum()), c)
                for c in cids
            )
            want.append((i, j, best[1]))
    assert got == sorted(want)

    # stream-static: two micro-batches over a head slice == batch
    head = rows[:40]
    schema = "vec_id long, embedding array<double>"
    batch_head = sorted(
        tuple(r)
        for r in pq_assign(
            spark.createDataFrame(head, schema), emb, "vec_id",
            "embedding", dim=64, m=8,
        ).collect()
    )
    with MicroBatchReplay(
        spark, schema,
        lambda src: pq_assign(src, emb, "vec_id", "embedding", dim=64, m=8),
        "append",
    ) as r:
        r.pipe(head[:20])
        r.pipe(head[20:])
        stream = sorted(tuple(x) for x in r.drain())
    assert stream == batch_head
    assert len(stream) == 40 * 8


def test_ivfpq_assign_matches_numpy_and_stream_equals_batch(spark, sf_dir):
    """ivfpq_assign (r14): batch (coarse_cid, j, pidx) assignments
    equal an independent NumPy rebuild of the IVF-PQ index prefix
    (coarse argmin ties->lowest cid; residual codebook in ascending-
    sample-id order; residual code ties->lowest pidx), and the
    streaming stream-static path emits the identical set."""
    import numpy as np

    from kafka_streams_app_spark.operators.similarity import ivfpq_assign
    from kafka_streams_app_spark.streaming.harness import MicroBatchReplay

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = sorted(
        tuple(r)
        for r in ivfpq_assign(
            emb, emb, "vec_id", "embedding", dim=64, m=8
        ).collect()
    )

    rows = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.collect()
    )
    q = {i: np.floor(np.array(v) * 1e6).astype(np.int64) for i, v in rows}
    ccids = sorted(i for i, _ in rows if i % 17 == 3)
    cmat = np.stack([q[c] for c in ccids])

    def coarse(vec):
        d = ((cmat - vec) ** 2).sum(axis=1)
        return int(d.argmin())  # first min = lowest cid (sorted ids)

    pids = sorted(i for i, _ in rows if i % 13 == 5)
    pres = np.stack([q[p] - cmat[coarse(q[p])] for p in pids])
    want = []
    for i, _ in rows:
        ci = coarse(q[i])
        r = q[i] - cmat[ci]
        for j in range(8):
            sub = r[j * 8:(j + 1) * 8]
            d = ((pres[:, j * 8:(j + 1) * 8] - sub) ** 2).sum(axis=1)
            want.append((i, ccids[ci], j, int(d.argmin()) + 1))
    assert got == sorted(want)

    head = rows[:30]
    schema = "vec_id long, embedding array<double>"
    batch_head = sorted(
        tuple(r)
        for r in ivfpq_assign(
            spark.createDataFrame(head, schema), emb, "vec_id",
            "embedding", dim=64, m=8,
        ).collect()
    )
    with MicroBatchReplay(
        spark, schema,
        lambda src: ivfpq_assign(src, emb, "vec_id", "embedding", dim=64, m=8),
        "append",
    ) as r:
        r.pipe(head[:15])
        r.pipe(head[15:])
        stream = sorted(tuple(x) for x in r.drain())
    assert stream == batch_head
    assert len(stream) == 30 * 8


def test_pq_family_shuffle_join_path_identical(spark, sf_dir):
    """broadcast_queries=False (the corpus-sized-query-set dial): the
    shuffle-join plan returns the IDENTICAL ranking as the broadcast
    path for both pq_topk and ivfpq_topk, and the plan genuinely drops
    the broadcast on the LUT side."""
    from kafka_streams_app_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    for fn in (pq_topk, ivfpq_topk):
        bcast = sorted(
            tuple(r)
            for r in fn(emb, queries, "vec_id", "embedding", dim=64,
                        k=3).collect()
        )
        shuf = fn(emb, queries, "vec_id", "embedding", dim=64, k=3,
                  broadcast_queries=False)
        assert sorted(tuple(r) for r in shuf.collect()) == bcast
        assert len(bcast) > 0


def test_ivfpq_search_equals_topk_batch_and_stream(spark, sf_dir):
    """ivfpq_search (r15): the at-ingest searcher (frozen code table
    riding the Arrow closure, one stateless pass per batch) emits
    BIT-EQUAL results to batch ivfpq_topk for the same query ids —
    exact int64 ADC, same (adc, neighbor_id) tie order — and the
    streaming path across an arbitrary micro-batch split emits the
    identical set."""
    from kafka_streams_app_spark.operators.similarity import (
        ivfpq_search,
        ivfpq_topk,
    )
    from kafka_streams_app_spark.streaming.harness import MicroBatchReplay

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    want = sorted(
        tuple(r) for r in ivfpq_topk(
            emb, queries, "vec_id", "embedding", dim=64, k=5,
        ).collect()
    )
    assert len(want) > 0
    got = sorted(
        tuple(r) for r in ivfpq_search(
            queries, emb, "vec_id", "embedding", dim=64, k=5,
        ).collect()
    )
    assert got == want

    qrows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in queries.collect()
    ]
    schema = "vec_id long, embedding array<double>"
    with MicroBatchReplay(
        spark, schema,
        lambda src: ivfpq_search(src, emb, "vec_id", "embedding",
                                 dim=64, k=5),
        "append",
    ) as r:
        r.pipe(qrows[:2])
        r.pipe(qrows[2:])
        stream = sorted(tuple(x) for x in r.drain())
    assert stream == want


def test_ivfpq_search_edge_cases(spark, sf_dir):
    """Hardening: an empty micro-batch yields no rows (not a crash);
    a query whose probed lists are empty emits nothing for that
    query; k larger than the candidate pool emits the full ranked
    pool."""
    from kafka_streams_app_spark.operators.similarity import (
        ivfpq_search,
        ivfpq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    schema = "vec_id long, embedding array<double>"
    # empty query set through the same plan
    empty = spark.createDataFrame([], schema)
    assert ivfpq_search(empty, emb, "vec_id", "embedding",
                        dim=64, k=5).count() == 0
    # k beyond the probed candidate pool: matches the batch twin
    queries = emb.filter("vec_id % 500 = 0")
    got = sorted(
        tuple(r) for r in ivfpq_search(
            queries, emb, "vec_id", "embedding", dim=64, k=10 ** 6,
        ).collect()
    )
    want = sorted(
        tuple(r) for r in ivfpq_topk(
            emb, queries, "vec_id", "embedding", dim=64, k=10 ** 6,
        ).collect()
    )
    assert got == want and len(got) > 0
