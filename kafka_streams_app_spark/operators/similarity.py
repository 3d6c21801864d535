"""Similarity search over embedding columns (BASELINE.json north-star).

- brute-force cosine top-k: exact baseline. Queries are broadcast; the
  corpus is scanned once, fully distributed; ranking is a per-query
  window top-k (no driver collect).
- LSH-bucketed ANN: random-hyperplane signatures (seeded, deterministic)
  with multi-probe via multiple hash tables; candidates only within
  matching buckets — the 100 TB path where a full scan per query is off
  the table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kafka_streams_app_spark.engine import ensure_parallelism
from kafka_streams_app_spark.functions.vectors import as_double, dot, norm


def embedding_dim_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension corpus statistics over an embedding column — the
    embedding-QA/drift primitive (a collapsed dimension, a scale blowup
    or a NaN-poisoned coordinate shows up here before any ANN index is
    built).

    Values are floor-quantized to integers at 1e-6 (the same
    engine-portable quantization the LSH oracle uses), so every
    aggregate is EXACT-INTEGER and summation order — which differs
    across partitionings — cannot perturb the result. Plan: posexplode
    -> one map-side-combined hash agg on the dimension index; the
    shuffle carries dim-count x partitions partial rows, never vectors.
    """
    q = F.floor(F.col("v").cast("double") * F.lit(1e6)).cast("long")
    return (
        df.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(q).alias("sum_q"),
            F.min(q).alias("min_q"),
            F.max(q).alias("max_q"),
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: query_id, neighbor_id, cos_sim (double), rank.
    Excludes the query row itself. Ties broken by neighbor_id so the
    result set is deterministic.

    Norms are hoisted to ONE fold per vector before the cross join
    (dedup_embedding_cosine's discipline): cosine() per pair would
    re-fold both norms for every (query, neighbor) pair — 3x the
    interpreted-HOF work on the O(n*q) scored rows. dot/(qn*cn) is the
    same fold and operation order as cosine(), hence bit-identical.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", norm(F.col("_qv")))
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", norm(F.col("_cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (dot(F.col("_qv"), F.col("_cv"))
             / (F.col("_qn") * F.col("_cn"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, seeded)."""
    try:
        import numpy as np

        rng = np.random.default_rng(seed)
        m = rng.standard_normal((n_planes, dim))
        return m.tolist()
    except ImportError:  # pragma: no cover
        import random

        r = random.Random(seed)
        return [[r.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def rademacher_planes(dim: int, n_planes: int, table: int) -> "np.ndarray":
    """±1 hyperplanes derived from md5(f"{table}-{plane}-{dim}") bit 0 —
    Achlioptas-style sign random projections whose entries ANY engine
    can regenerate (DuckDB: the same md5-hex-prefix bit). Statistically
    equivalent to Gaussian planes for sign-LSH (the collision
    probability 1 - theta/pi argument only needs a symmetric
    distribution), and the basis of the oracle-checkable ANN variant."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.int64)
    for p in range(n_planes):
        for j in range(dim):
            h = int(hashlib.md5(f"{table}-{p}-{j}".encode()).hexdigest()[:15], 16)
            out[p, j] = 1 if (h & 1) else -1
    return out


def _bucketed(
    df: DataFrame, idc: str, vec: str,
    dim: int, n_planes: int, n_tables: int, seed: int,
    plane_fn: str = "gaussian",
) -> DataFrame:
    """(id, vec, _tbl, _bkt) rows: each vector's bucket id in each of
    n_tables hyperplane tables, computed as ONE Arrow-batched numpy
    einsum per batch ((tables, planes, dim) x (n, dim) -> sign bits).
    The JVM higher-order-function formulation of the same dots evaluates
    interpreted lambdas per element (~15M for 5k x 64d x 48 planes) and
    measured ~6x slower.

    plane_fn='gaussian': seeded normal planes, float dots (sign flips
    vs another summation order possible only within float rounding of
    zero — irrelevant after the exact-cosine rerank).
    plane_fn='md5': Rademacher ±1 planes over floor(v*1e6) integer
    quantization — the dot is EXACT int64 arithmetic, so any engine
    (the DuckDB oracle) reproduces bit-identical buckets regardless of
    summation order.
    """
    if plane_fn == "md5":
        planes = np.stack([
            rademacher_planes(dim, n_planes, t) for t in range(n_tables)
        ])
    else:
        planes = np.stack([
            np.array(_hyperplanes(dim, n_planes, seed + 1000 * t))
            for t in range(n_tables)
        ])
    powers = 1 << np.arange(n_planes)
    quantize = plane_fn == "md5"

    @pandas_udf("array<int>")
    def bucket_ids(vs: "pd.Series") -> "pd.Series":
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        if quantize:
            m = np.floor(m * 1e6).astype(np.int64)
        dots = np.einsum("tpd,nd->ntp", planes, m)
        ids = ((dots >= 0) * powers).sum(axis=2).astype(np.int32)
        # .tolist(): ndarray cells in an object Series hit a slow
        # per-element pandas->Arrow fallback (r15 opt measurement)
        return pd.Series(ids.tolist())

    # "*" (not just idc/vec): callers that pre-compute per-vector columns
    # (e.g. dedup's norms) keep them through the explode — the extra
    # columns are a few bytes next to the vector itself.
    return df.select(
        "*", F.posexplode(bucket_ids(F.col(vec))).alias("_tbl", "_bkt")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    plane_fn: str = "gaussian",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with n_tables hash tables.

    A vector's bucket in table t = sign-bit string of its dot products
    with that table's hyperplanes. Candidates = corpus vectors sharing a
    bucket with the query in ANY table; exact cosine ranks candidates.
    Recall rises with n_tables; cost is (sum of bucket sizes) not O(n*q).

    Default 6 planes x 8 tables targets the near-duplicate regime:
    sign-LSH collision prob per plane is 1 - theta/pi, so a cos=0.9
    neighbor collides in a table with p=(0.857)^6=0.40 and in ANY of 8
    tables with ~98%; weakly-similar neighbors (cos<0.4, typical of
    random embeddings' top-k) are structurally hard for sign LSH at any
    budget — use cosine_topk when the query set is small enough to
    broadcast, or raise n_tables.

    Plan shape: every vector's n_tables bucket ids are computed in ONE
    vectorized pass (see _bucketed) and exploded to (table, bucket)
    rows, giving a single equi-join against the broadcast query buckets.
    """
    # norms once per vector BEFORE the bucket explode (and so before
    # the candidate join): cosine() per candidate pair would re-fold
    # both norms per pair; dot/(qn*cn) is the same fold and op order,
    # bit-identical (see dedup_embedding_cosine's note)
    q = _bucketed(
        queries.select(F.col(id_col).alias("query_id"),
                       as_double(F.col(vec_col)).alias("_qv"))
        .withColumn("_qn", norm(F.col("_qv"))),
        "query_id", "_qv", dim, n_planes, n_tables, seed, plane_fn,
    )
    c = _bucketed(
        ensure_parallelism(corpus).select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_cv")
        ).withColumn("_cn", norm(F.col("_cv"))),
        "neighbor_id", "_cv", dim, n_planes, n_tables, seed, plane_fn,
    )
    # Score BEFORE the (query, neighbor) dedup: a pair seen in several
    # tables scores the same cos_sim from the same two vectors (same
    # fold, same operation order — identical double), so deduping the
    # scored rows keeps the identical result set while the vectors are
    # consumed MAP-SIDE and never cross an exchange (guide §2.3 —
    # previously the dropDuplicates shuffle carried _qv/_cv per
    # candidate row). The explicit repartition by query_id then lets
    # the dedup aggregate AND the top-k window share ONE exchange
    # (hash(query_id) co-locates every (query_id, neighbor_id) group —
    # guide §2.4): 2 Exchange -> 1, and the one exchange carries
    # (id, id, double) rows only.
    scored = (
        c.join(
            F.broadcast(q),
            on=(c["_tbl"] == q["_tbl"]) & (c["_bkt"] == q["_bkt"])
            & (c["neighbor_id"] != q["query_id"]),
        )
        .select(
            "query_id", "neighbor_id",
            (dot(F.col("_qv"), F.col("_cv"))
             / (F.col("_qn") * F.col("_cn"))).alias("cos_sim"),
        )
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    centroid_mod: tuple[int, int] = (17, 3),
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: the other classic scale path next to LSH.

    Coarse quantizer = a deterministic corpus sample (id % m == r — at
    ~sqrt(n) centroids this is the standard random-sample codebook;
    k-means refinement would only move centroids, not the mechanism).
    Every corpus vector is assigned to its nearest centroid by EXACT
    integer L2 over floor(v*1e6) quantization (ties -> lowest centroid
    id), so ANY engine reproduces identical inverted lists — the DuckDB
    oracle recomputes the full pipeline. Queries probe their nprobe
    nearest centroids' lists; candidates are reranked by exact cosine.

    Scale: the codebook is O(sqrt(n)) rows pulled once to the driver —
    the standard coarse-quantizer distribution step (bounded, not a
    data-path collect); assignment is one Arrow-batched einsum per
    partition (no shuffle); the candidate join shuffles only on the
    centroid id, with per-list cost n/n_centroids * nprobe per query.
    """
    cent_rows = sorted(
        (r[0], list(r[1]))
        for r in corpus.filter(
            F.col(id_col) % centroid_mod[0] == centroid_mod[1]
        ).select(id_col, as_double(F.col(vec_col))).collect()
    )
    cids = np.array([c for c, _ in cent_rows], dtype=np.int64)
    cmat = np.floor(
        np.array([v for _, v in cent_rows], dtype=np.float64) * 1e6
    ).astype(np.int64)

    def _qmat(vs: "pd.Series") -> "np.ndarray":
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return np.floor(m * 1e6).astype(np.int64)

    @pandas_udf("long")
    def assign(vs: "pd.Series") -> "pd.Series":
        d = ((_qmat(vs)[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(cids[np.argmin(d, axis=1)])  # ties: first = lowest cid

    @pandas_udf("array<long>")
    def probes(vs: "pd.Series") -> "pd.Series":
        d = ((_qmat(vs)[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]  # stable: cid order on ties
        # cids[idx] == [cids[i] for i in idx] row-for-row; .tolist()
        # keeps the Arrow conversion on the list fast path
        return pd.Series(cids[idx].tolist())

    # norms once per vector before the candidate join (not per pair via
    # cosine() — same fold/op order, bit-identical; see cosine_topk)
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", norm(F.col("_cv")))
    c = c.withColumn("_cl", assign(F.col("_cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", norm(F.col("_qv")))
    q = q.select("query_id", "_qv", "_qn", F.explode(probes(F.col("_qv"))).alias("_cl"))
    cand = c.join(
        F.broadcast(q),
        on=(c["_cl"] == q["_cl"]) & (c["neighbor_id"] != q["query_id"]),
    ).select("query_id", "neighbor_id", "_qv", "_qn", "_cv", "_cn")
    scored = cand.select(
        "query_id", "neighbor_id",
        (dot(F.col("_qv"), F.col("_cv"))
         / (F.col("_qn") * F.col("_cn"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _int_codebook(
    corpus: DataFrame, id_col: str, vec_col: str, centroid_mod: tuple[int, int]
) -> tuple["np.ndarray", "np.ndarray"]:
    """Deterministic coarse codebook (same mechanism as ivf_topk's):
    the corpus rows with id % m == r, vectors floor-quantized to int64
    at 1e-6. O(sqrt(n))-ish rows pulled once to the driver — the
    standard codebook distribution step, bounded, not a data-path
    collect. Returns (cids sorted ascending, quantized matrix)."""
    cent_rows = sorted(
        (r[0], list(r[1]))
        for r in corpus.filter(
            F.col(id_col) % centroid_mod[0] == centroid_mod[1]
        ).select(id_col, as_double(F.col(vec_col))).collect()
    )
    cids = np.array([c for c, _ in cent_rows], dtype=np.int64)
    cmat = np.floor(
        np.array([v for _, v in cent_rows], dtype=np.float64) * 1e6
    ).astype(np.int64)
    return cids, cmat


def _nearest_cid_udf(cids: "np.ndarray", cmat: "np.ndarray"):
    """pandas_udf: nearest-centroid id by EXACT int64 L2 over the
    floor(v*1e6) quantization, ties -> lowest centroid id (cids is
    sorted, argmin takes the first minimum) — any engine reproduces
    the identical assignment, which is what lets the DuckDB oracle
    replay the clustering bit-for-bit.

    Distances use the matmul expansion ||q||^2 - 2 q.c + ||c||^2 —
    identical exact int64 values to the (q-c)^2 broadcast form, but
    O(batch x m) transient memory instead of the O(batch x m x d)
    diff cube (at a 3k-row codebook and 10k-row Arrow batches the cube
    is GBs per core; the matmul products peak at |q.c| <= d x 1e12,
    far inside int64)."""
    cT = cmat.T.copy()
    cc = (cmat.astype(np.int64) ** 2).sum(axis=1)

    @pandas_udf("long")
    def assign(vs: "pd.Series") -> "pd.Series":
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        q = np.floor(m * 1e6).astype(np.int64)
        d = (q ** 2).sum(axis=1)[:, None] - 2 * (q @ cT) + cc[None, :]
        return pd.Series(cids[np.argmin(d, axis=1)])

    return assign


def semdedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.55,
    centroid_mod: tuple[int, int] | str = "auto",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — cluster the embedding space with a coarse
    quantizer, then inside each cluster drop every vector that has a
    same-cluster neighbor with cosine >= threshold and a smaller id
    (the deterministic one-representative-per-duplicate-neighborhood
    greedy rule the paper's released implementation uses, with
    lowest-id in place of its arbitrary keep choice).

    Why clustering first: all-pairs cosine is O(n^2); nearest-centroid
    clusters bound the quadratic term to sum-of-cluster-sizes^2 — with
    ~sqrt(n) centroids that is O(n^1.5) pair work, and semantic dups
    share a cluster by construction (they are near in embedding space,
    so they quantize to the same centroid except exactly at a Voronoi
    boundary — the paper accepts that miss; raise centroid_mod's
    modulus to trade recall for cost).

    centroid_mod="auto" (default — the grow-m dial, r11 verdict #8):
    one count job picks mod = max(isqrt(n), 1), so the codebook is
    ~sqrt(n) rows (the driver collect stays bounded as the corpus
    grows) and mean occupancy is ~sqrt(n) — the O(n^1.5) sweet spot
    the paragraph above names, now enforced instead of advised. The
    oracle derives the same mod via floor(sqrt(count(*))): IEEE-754
    sqrt is correctly rounded (unlike log), so Python's exact isqrt
    and the SQL double sqrt agree for all n < ~4.5e15 (the first
    regime where 1/(2*sqrt(n)) can fall under half an ulp). A fixed
    (mod, rem) tuple remains the hold-m deploy rule for when
    assignment cost, not verification, dominates (SCALE.md
    §curation100).

    Plan at scale: ONE bounded codebook collect, one Arrow-batched
    assignment pass (no shuffle), one self-join shuffled on the
    cluster id (clusters are the unit of parallelism), one left-anti
    join back. The fact table never broadcast-collects.

    Output: survivors only — id_col, cluster_id, plus cos-rounding-
    stable `n_dropped` per cluster is derivable by the caller via a
    groupBy; we keep the operator minimal.
    """
    from kafka_streams_app_spark.engine import ensure_parallelism
    from kafka_streams_app_spark.functions.vectors import dot

    if centroid_mod == "auto":
        import math

        mod = max(math.isqrt(max(corpus.count(), 1)), 1)
        centroid_mod = (mod, 3 % mod)
    cids, cmat = _int_codebook(corpus, id_col, vec_col, centroid_mod)
    assign = _nearest_cid_udf(cids, cmat)
    base = ensure_parallelism(corpus).select(
        F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_cl", assign(F.col("_v")))
    # norms once per vector (see dedup_embedding_cosine's note: cosine()
    # per pair would re-fold both norms for every candidate pair)
    from kafka_streams_app_spark.functions.vectors import norm as _norm

    base = base.withColumn("_n", _norm(F.col("_v")))
    # localCheckpoint: base feeds THREE plan subtrees (both self-join
    # sides and the survivor anti-join), and without materialization
    # each subtree re-runs the scan + Arrow assignment pass + norm fold
    # (measured: 3 ArrowEvalPython nodes in the physical plan).
    # Checkpointing computes the assignment ONCE and truncates lineage —
    # the dedup_minhash_lsh pattern; at cluster scale the blocks are
    # (id, vec, cl, norm) rows, strictly smaller than three re-reads +
    # re-assignments of the corpus. Recomputed fresh per invocation (no
    # cross-run reuse — CacheManager plan matching is not involved).
    # EAGER, deliberately (r16 A/B): a lazy checkpoint was tried — the
    # caller's job would materialize the blocks — but this operator's
    # three consumers are roots of CONCURRENT stages, so the lazy cache
    # races and the corpus-wide Arrow assignment pass can run 2-3x in
    # parallel; at 100 TB that duplicated pass is a real cost even
    # though sf0.1 walls sat inside host noise (1.31-1.63 s across
    # interleaved readings either way). dsir_score keeps the lazy form
    # because its first consumer is an in-call driver collect that
    # strictly precedes the returned plan (no concurrency window).
    base = base.localCheckpoint(eager=True)
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_cl").alias("_cla"),
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_cl").alias("_clb"),
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    )
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    dropped = (
        a.join(b, (a["_cla"] == b["_clb"]) & (a["id_a"] < b["id_b"]))
        .filter(F.round(cos, 6) >= threshold)
        .select(F.col("id_b").alias("_id"))
        .distinct()
    )
    return base.join(dropped, "_id", "left_anti").select(
        F.col("_id").alias(id_col), F.col("_cl").alias("cluster_id")
    )


def kmeans_lloyd(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_mod: tuple[int, int] = (17, 3),
    iters: int = 2,
) -> DataFrame:
    """Distributed Lloyd k-means in EXACT integer arithmetic — the
    clustering primitive under SemDeDup/IVF-style curation (centroid
    refinement moves the codebook toward the data's density; the
    deterministic-sample init is the standard k-means|| stand-in at
    sqrt(n) centroids).

    Every quantity any engine must reproduce is an integer: vectors
    are floor(v*1e6) int64; assignment is exact int L2 with ties to
    the lowest centroid id; the updated centroid is the per-dimension
    FLOOR-DIV mean of its members (sum//n — floor semantics, which
    DuckDB replays as (s - ((s%n)+n)%n)/n); an emptied cluster keeps
    its previous centroid. So the DuckDB oracle unrolls the same
    iterations and matches bit-for-bit.

    Per-iteration distributed cost: one Arrow-batched assignment pass
    (no shuffle) + one map-side-combined (cluster, dim) agg whose
    output is m*d rows — the only driver traffic, bounded by the
    codebook size, never by n. This is textbook distributed Lloyd:
    at 1000 executors each pass is embarrassingly parallel and the
    reduce is m*d partial sums. int64 is safe to ~9e12 members per
    cluster at |q| <= 1e6. Each iteration IS one synchronous job
    round-trip (collect sums -> rebroadcast centroids) — inherent to
    Lloyd's data dependency, which is why `iters` defaults small (2);
    production k-means trades exactness for fewer rounds via
    mini-batching, out of scope for this oracle-exact form. If iters
    ever grows large, the per-iteration driver collect stays m*d-
    bounded but the SEQUENTIAL round count becomes the term to attack:
    the Spark-native remedy is a treeAggregate-shaped reduction of the
    (cluster, dim) partials (depth-2 combine keeps the driver fan-in
    at sqrt(partitions)) and/or batching multiple Lloyd steps per pass
    over a broadcast history — noted here per the r13 review so the
    dial is named before anyone raises iters.

    Output: (id_col, cluster_id) after `iters` refinements, cluster_id
    = the INITIAL sample row's id (stable labels across iterations).
    """
    # persist the (id, double-vector) points across iterations: Lloyd
    # makes iters+2 full passes (the codebook-seed collect, one
    # assignment per refinement round, and the final labeling), and
    # without a cache every pass re-reads the parquet and re-runs the
    # as_double conversion — at 100 TB that is iters+2 reads of the
    # lake, the classic un-cached-Lloyd mistake (guide §5: reuse
    # across actions is THE persist case). The cached rows are exactly
    # the working set (id, array<double>), released before returning
    # via the eager localCheckpoint of the final (id, cluster)
    # labeling (the dedup_minhash_lsh discipline — no cached blocks
    # outlive the call). The codebook seed is read off the SAME cached
    # table (as_double over an already-double array is a no-op cast,
    # so _int_codebook sees identical vectors).
    base = corpus.select(
        F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v")
    ).persist()
    cids, cmat = _int_codebook(base, "_id", "_v", centroid_mod)
    qarr = F.transform(F.col("_v"), lambda x: F.floor(x * 1e6).cast("long"))
    row_of = {int(c): j for j, c in enumerate(cids)}
    try:
        for _ in range(iters):
            assign = _nearest_cid_udf(cids, cmat)
            stats = (
                base.withColumn("_cl", assign(F.col("_v")))
                .select("_cl", F.posexplode(qarr).alias("_pos", "_q"))
                .groupBy("_cl", "_pos")
                .agg(F.sum("_q").alias("_s"), F.count(F.lit(1)).alias("_n"))
                .collect()
            )
            nxt = cmat.copy()
            for r in stats:
                nxt[row_of[int(r["_cl"])], int(r["_pos"])] = (
                    int(r["_s"]) // int(r["_n"])
                )
            cmat = nxt
        assign = _nearest_cid_udf(cids, cmat)
        return (
            base.withColumn("_cl", assign(F.col("_v")))
            .select(F.col("_id").alias(id_col), F.col("_cl").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
    finally:
        base.unpersist()


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    each anchor, the k corpus vectors MOST similar to it that carry a
    DIFFERENT label — the negatives that actually move a contrastive
    loss (random negatives are trivially separable; the informative
    ones sit just across the decision boundary, i.e. highest cosine
    under a different label).

    Same distributed shape as cosine_topk: anchors broadcast, corpus
    scanned once, per-anchor window top-k — no driver collect, no
    corpus shuffle. The label inequality filters BEFORE the rank, so k
    negatives survive per anchor even when its nearest neighbors are
    same-label. At 100 TB use hard_negatives_ann — the same rank over
    LSH candidate buckets instead of the full scan; the exact form
    here is its recall baseline and oracle twin.

    Output: anchor_id, negative_id, neg_label, rank, cos_sim (6dp).
    """
    q = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("_al"),
        as_double(F.col(vec_col)).alias("_qv"),
    ).withColumn("_qn", norm(F.col("_qv")))
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("neg_label"),
        as_double(F.col(vec_col)).alias("_cv"),
    ).withColumn("_cn", norm(F.col("_cv")))
    # norms hoisted to once per vector; dot/(qn*cn) is cosine()'s exact
    # fold and op order — bit-identical (see cosine_topk)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("_al"))
        .select(
            "anchor_id", "negative_id", "neg_label",
            (dot(F.col("_qv"), F.col("_cv"))
             / (F.col("_qn") * F.col("_cn"))).alias("_cs"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("_cs").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id", "negative_id", "neg_label", "rank",
            F.round("_cs", 6).alias("cos_sim"),
        )
    )


def hard_negatives_ann(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    plane_fn: str = "gaussian",
) -> DataFrame:
    """ANN-candidate hard-negative mining: the same per-anchor
    highest-cosine-under-a-different-label rank as hard_negatives, but
    over sign-LSH candidate buckets instead of a full corpus scan —
    the 100 TB path (per-anchor cost = sum of its bucket sizes, not
    O(n) per anchor).

    Candidates = corpus vectors sharing a bucket with the anchor in
    ANY of n_tables hyperplane tables; both sides' bucket ids come
    from ONE vectorized Arrow pass each (see _bucketed). The label
    inequality is applied INSIDE the candidate join — before the
    dedup and the exact-cosine rerank — so same-label near-neighbors
    never reach the shuffle. With plane_fn='md5' (Rademacher planes
    over floor(v*1e6) integer dots) the whole approximate pipeline is
    engine-portable and the DuckDB oracle replays it bit-for-bit;
    recall vs the exact hard_negatives twin is pinned in
    tests/test_dedup_similarity.py.

    Output: anchor_id, negative_id, neg_label, rank, cos_sim (6dp).
    """
    # norms once per vector BEFORE the bucket explode and candidate
    # join (not per pair via cosine() — same fold/op order,
    # bit-identical; see cosine_topk)
    q = _bucketed(
        anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(label_col).alias("_al"),
            as_double(F.col(vec_col)).alias("_qv"),
        ).withColumn("_qn", norm(F.col("_qv"))),
        "anchor_id", "_qv", dim, n_planes, n_tables, seed, plane_fn,
    )
    c = _bucketed(
        ensure_parallelism(corpus).select(
            F.col(id_col).alias("negative_id"),
            F.col(label_col).alias("neg_label"),
            as_double(F.col(vec_col)).alias("_cv"),
        ).withColumn("_cn", norm(F.col("_cv"))),
        "negative_id", "_cv", dim, n_planes, n_tables, seed, plane_fn,
    )
    # score before the (anchor, negative) dedup and share ONE
    # hash(anchor_id) exchange between the dedup aggregate and the
    # top-k window — identical doubles per pair across tables, vectors
    # consumed map-side, 2 Exchange -> 1 (see lsh_ann_topk's note)
    scored = (
        c.join(
            F.broadcast(q),
            on=(c["_tbl"] == q["_tbl"]) & (c["_bkt"] == q["_bkt"])
            & (c["negative_id"] != q["anchor_id"])
            & (c["neg_label"] != q["_al"]),
        )
        .select(
            "anchor_id", "negative_id", "neg_label",
            (dot(F.col("_qv"), F.col("_cv"))
             / (F.col("_qn") * F.col("_cn"))).alias("_cs"),
        )
        .repartition("anchor_id")
        .dropDuplicates(["anchor_id", "negative_id"])
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("_cs").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id", "negative_id", "neg_label", "rank",
            F.round("_cs", 6).alias("cos_sim"),
        )
    )


def _pq_model(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int,
    centroid_mod: tuple[int, int],
):
    """Frozen PQ model shared by pq_topk and pq_assign: the
    deterministic sub-codebooks (ONE bounded collect, O(sample x d)
    ints) plus the two Arrow passes built over them — `encode` (m int
    codes per vector, exact int64 L2 argmin per subspace, ties ->
    lowest centroid id) and `q_lut` (flat m x nc exact-int64 ADC
    table per query). The codebook arrays ride the UDF closures, so
    the same model object serves batch scans and stream-static
    micro-batch encoding alike."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    cids, cmat = _int_codebook(corpus, id_col, vec_col, centroid_mod)
    nc = len(cids)
    if nc == 0:
        raise ValueError(
            "pq model: empty codebook — no corpus id satisfies "
            f"id % {centroid_mod[0]} == {centroid_mod[1]}"
        )
    csub = cmat.reshape(nc, m, dsub).transpose(1, 0, 2).copy()  # (m, nc, dsub)
    c2 = (csub ** 2).sum(axis=2)  # (m, nc)

    def _sub_dists(mat: "np.ndarray") -> "np.ndarray":
        """(n, dim) quantized int64 -> (n, m, nc) exact int64 L2."""
        sub = mat.reshape(len(mat), m, dsub)
        x2 = (sub ** 2).sum(axis=2)
        xc = np.einsum("nmd,mcd->nmc", sub, csub)
        return x2[:, :, None] - 2 * xc + c2[None, :, :]

    def _quant(vs: "pd.Series") -> "np.ndarray":
        mm = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return np.floor(mm * 1e6).astype(np.int64)

    @pandas_udf("array<int>")
    def encode(vs: "pd.Series") -> "pd.Series":
        # argmin takes the FIRST minimum; cids is sorted, so index
        # order == centroid-id order -> ties resolve to lowest cid,
        # matching the oracle's (dist, cid) row_number
        codes = _sub_dists(_quant(vs)).argmin(axis=2).astype(np.int32)
        # .tolist(): list cells convert to Arrow ~2x faster than
        # ndarray cells (r15 opt measurement)
        return pd.Series(codes.tolist())

    @pandas_udf("array<long>")
    def q_lut(vs: "pd.Series") -> "pd.Series":
        # flat (m * nc) exact-int64 ADC table per query vector
        luts = _sub_dists(_quant(vs)).reshape(len(vs), m * nc)
        return pd.Series(luts.tolist())

    return cids, nc, encode, q_lut


def pq_assign(
    df: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    centroid_mod: tuple[int, int] = (17, 3),
) -> DataFrame:
    """PQ code ASSIGNMENT for new vectors — the ingest-side face of
    pq_topk (r13 verdict ask #4): freeze the sub-codebooks from the
    static `corpus` (the same deterministic id-sample, ONE bounded
    collect riding the Arrow UDF closure as a broadcast), then encode
    each arriving vector to its m subspace codes in one vectorized
    pass. `df` may be a BATCH or a STREAMING DataFrame: the plan is a
    stateless stream-static projection (no shuffle, no state), so
    under Structured Streaming each micro-batch encodes independently
    and a new document's codes are available the moment it lands —
    completing the at-ingest curation family (dedup / decontam /
    quality already have streaming twins).

    Output: (id_col, j, cid) — one row per (vector, subspace); cid is
    the CENTROID ID (the codebook sample's vector id, the
    engine-portable name), mapped JVM-side from encode's internal
    codebook index via a literal id array. Codes are bit-for-bit the
    assignments pq_topk scores against for the same corpus (exact
    int64 L2, ties -> lowest centroid id; equality pinned in
    tests/test_clusters_ivf.py and by the shared driver oracle).
    """
    cids, _, encode, _ = _pq_model(corpus, id_col, vec_col, dim, m,
                                   centroid_mod)
    cid_arr = F.array([F.lit(int(c)) for c in cids])
    return (
        df.select(
            F.col(id_col),
            encode(as_double(F.col(vec_col))).alias("_code"),
        )
        .select(
            id_col,
            F.posexplode("_code").alias("j", "_ci"),
        )
        .select(
            id_col,
            F.col("j").cast("long").alias("j"),
            F.element_at(cid_arr, F.col("_ci") + 1).cast("long").alias("cid"),
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    m: int = 8,
    centroid_mod: tuple[int, int] = (17, 3),
    broadcast_queries: bool = True,
) -> DataFrame:
    """Product-quantization ANN (Jégou, Douze, Schmid 2011, "Product
    Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)): split
    each vector into m subvectors, quantize each subspace against its
    own codebook, and answer queries by scanning the COMPRESSED codes
    with per-subspace lookup-table adds (ADC — asymmetric distance
    computation). The memory-bandwidth ANN: the query scan reads m
    small codes per vector instead of d floats — the technique that
    makes billion-vector search RAM-resident.

    Exact-integer formulation (same discipline as ivf_topk/semdedup, no
    paper ships this): vectors floor-quantize at 1e-6; sub-codebooks
    are the deterministic id-sample's subvectors; assignment is exact
    int64 L2 per subspace, ties -> lowest centroid id; ADC distances
    are exact int64 sums — so the DuckDB oracle replays codebooks,
    codes, LUTs and ranking bit-for-bit.

    Plan at scale: ONE bounded codebook collect (the coarse-quantizer
    distribution step, O(sample x d) ints); encoding is one
    Arrow-batched einsum pass, NO shuffle, emitting m int codes per
    vector (8x smaller than the double vector here; a production
    deployment packs uint8 codes for 64x — the longs keep the oracle
    portable); queries stay DISTRIBUTED (r12 verdict: no driver
    collect of the query set) — one Arrow pass turns each query into
    its flat (m x n_centroids) int64 ADC LUT, and the scan side joins
    the broadcast query/LUT table, summing m JVM-side element_at
    lookups per (code, query) pair — scoring reads ONLY the codes,
    never q x d float ops, with no Python in the scoring path at all;
    ranking is the per-query window top-k. For corpus-sized query
    sets pass broadcast_queries=False — the LUT side then shuffles
    instead of shipping to every executor (ADC's full scan is
    inherently O(n x q) work either way, but nothing bottlenecks on
    broadcast memory); results are identical (pinned).
    Recall behaves like IVF at matched budget (quantization error is
    the documented trade; raise m to shrink cells); the
    planted-duplicate and rank-structure pins live in
    tests/test_clusters_ivf.py.

    Output: query_id, neighbor_id, rank, adc_dist (exact int64).
    Excludes the query row itself. ADC is ASYMMETRIC by construction:
    adc(q, n) = sum_j L2(q_sub_j, centroid[code_j(n)]) — an exact
    duplicate of the query scores the query's own quantization error
    (the minimum any vector sharing its codes can score), not 0.
    """
    _, nc, encode, q_lut = _pq_model(corpus, id_col, vec_col, dim, m,
                                     centroid_mod)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        q_lut(as_double(F.col(vec_col))).alias("_lut"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
    ).select("neighbor_id", encode(F.col("_v")).alias("_code"))
    # ADC = sum_j lut[j*nc + code_j]: m JVM-side array lookups per
    # (corpus row, query) pair against the broadcast-resident LUT
    adc = F.expr(
        f"aggregate(transform(_code, (cd, j) -> element_at(_lut, "
        f"j * {nc} + cd + 1)), 0L, (acc, x) -> acc + x)"
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def _ivfpq_model(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int,
    coarse_mod: tuple[int, int],
    pq_mod: tuple[int, int],
) -> dict:
    """Frozen IVF-PQ index model shared by ivfpq_topk and
    ivfpq_assign: the coarse codebook, the residual-space PQ codebook
    (the pq-sample's residuals vs their own coarse centroids, both ONE
    bounded collect each), and the Arrow `encode` pass emitting
    (coarse index, m residual codes) per vector — all exact int64, so
    any engine replays the assignments bit-for-bit."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    c_cids, c_cmat = _int_codebook(corpus, id_col, vec_col, coarse_mod)
    ncc = len(c_cids)
    if ncc == 0:
        raise ValueError(
            "ivfpq model: empty coarse codebook — no corpus id satisfies "
            f"id % {coarse_mod[0]} == {coarse_mod[1]}"
        )
    cc2 = (c_cmat ** 2).sum(axis=1)  # (ncc,)

    def _quant(vs) -> "np.ndarray":
        mm = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return np.floor(mm * 1e6).astype(np.int64)

    def _coarse_assign(mat: "np.ndarray") -> "np.ndarray":
        # exact-int matmul expansion; argmin first-index = lowest cid
        d = (mat ** 2).sum(axis=1)[:, None] - 2 * (mat @ c_cmat.T) + cc2[None, :]
        return d.argmin(axis=1)

    # PQ codebook: residuals of the pq_mod sample vs their own coarse
    # centroids (one bounded collect; rows sorted by id like the coarse)
    p_ids, p_mat = _int_codebook(corpus, id_col, vec_col, pq_mod)
    if len(p_ids) == 0:
        raise ValueError(
            "ivfpq model: empty PQ codebook — no corpus id satisfies "
            f"id % {pq_mod[0]} == {pq_mod[1]}"
        )
    p_res = p_mat - c_cmat[_coarse_assign(p_mat)]
    ncp = len(p_ids)
    psub = p_res.reshape(ncp, m, dsub).transpose(1, 0, 2).copy()  # (m, ncp, dsub)
    p2 = (psub ** 2).sum(axis=2)  # (m, ncp)

    def _pq_dists(res: "np.ndarray") -> "np.ndarray":
        """(n, dim) int64 residuals -> (n, m, ncp) exact int64 L2."""
        sub = res.reshape(len(res), m, dsub)
        x2 = (sub ** 2).sum(axis=2)
        xc = np.einsum("nmd,mcd->nmc", sub, psub)
        return x2[:, :, None] - 2 * xc + p2[None, :, :]

    @pandas_udf("struct<cl:int, code:array<int>>")
    def encode(vs: "pd.Series") -> "pd.DataFrame":
        mat = _quant(vs)
        cl = _coarse_assign(mat)
        codes = _pq_dists(mat - c_cmat[cl]).argmin(axis=2).astype(np.int32)
        # codes.tolist(): list cells convert to Arrow ~2x faster than
        # ndarray cells (r15 opt measurement)
        return pd.DataFrame({"cl": cl.astype(np.int32), "code": codes.tolist()})

    return {
        "c_cids": c_cids, "c_cmat": c_cmat, "cc2": cc2, "ncp": ncp,
        "quant": _quant, "pq_dists": _pq_dists, "encode": encode,
    }


def ivfpq_assign(
    df: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    coarse_mod: tuple[int, int] = (17, 3),
    pq_mod: tuple[int, int] = (13, 5),
) -> DataFrame:
    """IVF-PQ index ASSIGNMENT for new vectors — the ingest-side face
    of ivfpq_topk and the production-index sibling of pq_assign: the
    coarse + residual-PQ codebooks freeze from the static `corpus`
    (two bounded collects riding the Arrow closure as broadcasts), and
    each arriving vector gets its inverted-list id and m residual
    codes in one vectorized pass. Stateless stream-static projection —
    batch or streaming `df` alike — so a new document enters the IVF
    index structure the moment it lands.

    Output: (id_col, coarse_cid, j, pidx) — coarse_cid is the coarse
    CENTROID ID (the codebook sample's vector id); pidx is the
    1-based residual-codebook position in ascending-sample-id order,
    exactly the index the ivfpq_topk oracle uses — so the codes are
    bit-for-bit the ones the batch index scores against.
    """
    mdl = _ivfpq_model(corpus, id_col, vec_col, dim, m, coarse_mod, pq_mod)
    cid_arr = F.array([F.lit(int(c)) for c in mdl["c_cids"]])
    return (
        df.select(
            F.col(id_col),
            mdl["encode"](as_double(F.col(vec_col))).alias("_e"),
        )
        .select(
            id_col,
            F.element_at(cid_arr, F.col("_e.cl") + 1).cast("long")
            .alias("coarse_cid"),
            F.posexplode("_e.code").alias("j", "_ci"),
        )
        .select(
            id_col,
            "coarse_cid",
            F.col("j").cast("long").alias("j"),
            (F.col("_ci") + 1).cast("long").alias("pidx"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    m: int = 8,
    coarse_mod: tuple[int, int] = (17, 3),
    pq_mod: tuple[int, int] = (13, 5),
    nprobe: int = 4,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-PQ ANN (Jégou et al. 2011 §V: "IVFADC") — the composition
    that runs billion-vector search RAM-resident: a coarse quantizer
    prunes the scan to nprobe inverted lists, and inside the probed
    lists distances come from PQ codes of the RESIDUAL (vector minus
    its coarse centroid) via lookup-table adds. This is the index
    structure FAISS ships as IndexIVFPQ.

    Exact-integer formulation: vectors floor-quantize at 1e-6; the
    coarse codebook is the id-sample `coarse_mod`, the (shared,
    residual-space) PQ codebook is the residuals of a SECOND
    deterministic sample `pq_mod` w.r.t. their own coarse centroids —
    both assignments exact int64 L2, ties -> lowest id; residuals are
    int64 subtractions (exact); ADC sums are exact int64. The DuckDB
    twin replays the full index build and search bit-for-bit.

    Plan at scale: two bounded codebook collects (coarse ~sqrt(n) rows,
    PQ sample similar); corpus encoding is ONE Arrow pass — coarse
    assignment + residual PQ codes, no shuffle; queries stay
    DISTRIBUTED (r12 verdict: no driver collect of the query set) —
    one Arrow pass per query emits its nprobe (coarse id, flat
    residual-LUT) probe rows (residuals differ per coarse centroid —
    the IVFADC term), and candidate scoring is an EQUI-JOIN of corpus
    codes against the probe table on the coarse id (broadcast here;
    a corpus-sized query set can shuffle-hash on that same key), so
    it touches only rows whose coarse list is probed
    (n*nprobe/n_coarse of the corpus), reading codes, not vectors,
    with the ADC sum evaluated JVM-side; ranking is the per-query
    window top-k.

    Output: query_id, neighbor_id, rank, adc_dist (exact int64).
    Excludes the query row itself; only probed-list candidates appear.
    """
    mdl = _ivfpq_model(corpus, id_col, vec_col, dim, m, coarse_mod, pq_mod)
    c_cmat, cc2, ncp = mdl["c_cmat"], mdl["cc2"], mdl["ncp"]
    _quant, _pq_dists, encode = mdl["quant"], mdl["pq_dists"], mdl["encode"]

    # queries: nprobe (coarse id, flat residual LUT) probe rows per
    # query, built in one distributed Arrow pass — broadcast size is
    # q * nprobe * m * ncp longs, on executors, never the driver
    @pandas_udf("array<struct<cl:int, lut:array<long>>>")
    def q_probes(vs: "pd.Series") -> "pd.Series":
        qmat = _quant(vs)
        qd = (
            (qmat ** 2).sum(axis=1)[:, None]
            - 2 * (qmat @ c_cmat.T)
            + cc2[None, :]
        )
        probe_idx = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]
        out = []
        for i in range(len(qmat)):
            luts = _pq_dists(qmat[i] - c_cmat[probe_idx[i]]).reshape(
                nprobe, m * ncp
            )
            out.append([
                {"cl": int(probe_idx[i, s]), "lut": luts[s].tolist()}
                for s in range(nprobe)
            ])
        return pd.Series(out)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(q_probes(as_double(F.col(vec_col)))).alias("_p"),
    ).select(
        "query_id",
        F.col("_p.cl").alias("_qcl"),
        F.col("_p.lut").alias("_lut"),
    )
    if broadcast_queries:
        # corpus-sized query sets: pass broadcast_queries=False — the
        # probe/LUT side then equi-joins on the coarse id via shuffle
        # (shuffle-hash-able), identical results (pinned)
        q = F.broadcast(q)
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("_e")
    ).select("neighbor_id", F.col("_e.cl").alias("_cl"), F.col("_e.code").alias("_code"))
    adc = F.expr(
        f"aggregate(transform(_code, (cd, j) -> element_at(_lut, "
        f"j * {ncp} + cd + 1)), 0L, (acc, x) -> acc + x)"
    )
    scored = (
        c.join(q, on=F.col("_cl") == F.col("_qcl"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def ivfpq_search(
    df: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    m: int = 8,
    coarse_mod: tuple[int, int] = (17, 3),
    pq_mod: tuple[int, int] = (13, 5),
    nprobe: int = 4,
) -> DataFrame:
    """IVF-PQ SEARCH against a FROZEN static index — the query-side
    face of ivfpq_assign and the streaming-capable twin of
    ivfpq_topk's search stage: each arriving vector (batch or
    streaming `df` alike) probes its nprobe nearest coarse lists and
    LUT-scans the resident PQ codes, emitting its top-k per
    micro-batch. Results are bit-equal to batch ivfpq_topk for the
    same query ids (shared _ivfpq_model; same exact-int64 ADC sums,
    same (adc, neighbor_id) tie order; pinned).

    Plan: the static index freezes ONCE at plan-build time — one
    distributed Arrow encode pass over the corpus, then a collect
    bounded by the COMPRESSED index size (the coarse id + m code
    bytes per vector that IVFADC exists to make RAM-resident: ~9-16
    bytes/vector, 1B vectors ~ 16 GB — the published FAISS serving
    trade, where every searcher holds the full code table and search
    is embarrassingly parallel). The posting lists ride the Arrow
    closure as a broadcast; each micro-batch is then ONE stateless
    mapInPandas pass per arriving query — no shuffle, no state, no
    per-batch re-encode of the corpus. A corpus-SCALE query set
    should use batch ivfpq_topk instead (distributed equi-join on the
    coarse id, zero index collect); this operator is the at-ingest
    searcher, where queries trickle and index residency is the point.

    Output: query_id, neighbor_id, rank, adc_dist (exact int64),
    excluding the query row itself; only probed-list candidates
    appear — exactly ivfpq_topk's contract.
    """
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    mdl = _ivfpq_model(corpus, id_col, vec_col, dim, m, coarse_mod, pq_mod)
    c_cmat, cc2, ncp = mdl["c_cmat"], mdl["cc2"], mdl["ncp"]
    _quant, _pq_dists, encode = mdl["quant"], mdl["pq_dists"], mdl["encode"]
    ncc = len(mdl["c_cids"])

    enc_rows = (
        ensure_parallelism(corpus)
        .select(F.col(id_col).alias("nid"), encode(F.col(vec_col)).alias("_e"))
        .select("nid", F.col("_e.cl").alias("cl"), F.col("_e.code").alias("code"))
        .collect()
    )
    ids_by_list: list[list[int]] = [[] for _ in range(ncc)]
    codes_by_list: list[list[list[int]]] = [[] for _ in range(ncc)]
    for r in enc_rows:
        ids_by_list[r["cl"]].append(r["nid"])
        codes_by_list[r["cl"]].append(r["code"])
    post_ids = [np.asarray(x, dtype=np.int64) for x in ids_by_list]
    post_codes = [
        np.asarray(c, dtype=np.int64) if c else np.zeros((0, m), np.int64)
        for c in codes_by_list
    ]
    jj = np.arange(m)

    out_schema = StructType([
        StructField("query_id", LongType(), True),
        StructField("neighbor_id", LongType(), True),
        StructField("rank", IntegerType(), True),
        StructField("adc_dist", LongType(), True),
    ])

    def search(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            qids = [int(x) for x in pdf[id_col]]
            qmat = _quant(pdf[vec_col])
            qd = (
                (qmat ** 2).sum(axis=1)[:, None]
                - 2 * (qmat @ c_cmat.T)
                + cc2[None, :]
            )
            probe_idx = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]
            out: list[tuple[int, int, int, int]] = []
            for i, qid in enumerate(qids):
                luts = _pq_dists(qmat[i] - c_cmat[probe_idx[i]])
                cand_ids: list[np.ndarray] = []
                cand_adc: list[np.ndarray] = []
                for s in range(nprobe):
                    ids = post_ids[probe_idx[i, s]]
                    codes = post_codes[probe_idx[i, s]]
                    if not len(ids):
                        continue
                    adc = luts[s][jj[None, :], codes].sum(axis=1)
                    keep = ids != qid
                    cand_ids.append(ids[keep])
                    cand_adc.append(adc[keep])
                if not cand_ids:
                    continue
                nid = np.concatenate(cand_ids)
                adc = np.concatenate(cand_adc)
                order = np.lexsort((nid, adc))[:k]
                out.extend(
                    (qid, int(nid[o]), rk + 1, int(adc[o]))
                    for rk, o in enumerate(order)
                )
            yield pd.DataFrame(
                out, columns=["query_id", "neighbor_id", "rank", "adc_dist"]
            )

    return df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias(vec_col)
    ).mapInPandas(search, schema=out_schema)
