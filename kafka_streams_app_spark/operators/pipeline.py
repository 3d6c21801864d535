"""Training-data pipeline stages: deterministic sampling and sequence
packing (BASELINE.json north-star: large-scale LLM data preparation).

Both operators are pure Column/Window plans — no Python in the hot path —
and both are *deterministic*: re-running the pipeline over the same corpus
reproduces the same sample / the same bins, which is what makes a 100 TB
data build auditable and resumable.

Scale design:
- stratified_sample is embarrassingly parallel (a per-row hash test that
  evaluates inside the parquet scan stage; the strata rates live in a
  literal CASE expression, no join, no shuffle).
- pack_sequences needs a per-stratum prefix sum, i.e. a sort within each
  stratum. A naive Window.partitionBy(stratum) puts an entire stratum in
  ONE task — at 100 TB a majority language would be a single 50 TB
  partition. The `shards` knob splits every stratum into `shards`
  hash-sub-strata that pack independently (bin ids are namespaced by
  shard), restoring full parallelism: packing does not require global
  contiguity, only that each emitted bin is <= capacity, which holds
  per-shard. Use shards >= cluster cores at scale; shards=1 keeps the
  single-sequence layout for small corpora and for the DuckDB oracle.
"""

from __future__ import annotations

import uuid
from collections.abc import Mapping

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_streams_app_spark.engine import ensure_parallelism
from kafka_streams_app_spark.functions.text import shingles_udf

#: Number of hash buckets the sampling rates are quantized to. 10_000
#: buckets -> rates are exact multiples of 0.01%.
SAMPLE_BUCKETS = 10_000


def portable_bucket(col: Column, n: int) -> Column:
    """Deterministic bucket in [0, n): 60-bit integer derived from the
    md5 hex prefix of the column's string form, mod n.

    Engine-portable by construction — DuckDB computes the identical
    bucket as ``CAST('0x' || substring(md5(CAST(x AS VARCHAR)),1,15) AS
    BIGINT) % n`` — so a sample drawn by this engine can be re-drawn (or
    audited) by any SQL engine with md5. md5 here is a *partitioner*,
    not a security boundary.
    """
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(n))


def portable_bucket_py(value, n: int) -> int:
    """Driver/instance-side twin of portable_bucket (pinned equal in
    tests/test_iq_service.py): a facade deciding whether it owns a key
    must not launch a Spark job to hash one value."""
    import hashlib

    return int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16) % n


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its
    id's hash bucket falls below rate * SAMPLE_BUCKETS for the row's
    stratum.

    Unlike df.sample(), membership is a pure function of (id, rates):
    stable across runs, cluster sizes, and partitionings — the property
    a reproducible training-data mix needs (e.g. down-weighting a
    dominant language). Rates are quantized to 1/SAMPLE_BUCKETS.
    """
    bucket = portable_bucket(F.col(id_col), SAMPLE_BUCKETS)
    # round, not truncate: rate=0.29 must quantize to 2900/10000, and
    # float artifacts (0.29*10000 = 2899.9999...) would otherwise shave
    # a bucket off the documented 1/SAMPLE_BUCKETS grid
    thr: Column = F.lit(int(round(default_rate * SAMPLE_BUCKETS)))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(rate * SAMPLE_BUCKETS)))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def mix_sources(
    df: DataFrame,
    source_col: str,
    weights: Mapping[str, float],
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted source mixing — the training-mixture
    construction step (domain/source reweighting a la The Pile / Dolma
    mixture tables): each source contributes ``weight x its rows``
    rows in expectation, where weight may EXCEED 1 (upsampling a small
    high-quality source by repetition) or sit below 1 (downsampling a
    dominant crawl).

    Output = input columns + ``epoch`` (0-based replica index), so
    repeated rows stay distinguishable for downstream deterministic
    shuffling (`shuffle_deterministic` keys on id+epoch to spread
    replicas apart rather than emitting them adjacent).

    Semantics per row with weight w (unlisted sources drop):
    - replicas 0..floor(w)-1 are kept unconditionally;
    - replica floor(w) survives iff the row's (id, epoch, seed) hash
      bucket < frac(w), quantized to 1/SAMPLE_BUCKETS — the same
      engine-portable md5 test as stratified_sample, salted with the
      epoch so the fractional replica set is independent of the w<1
      keep set and of other epochs.

    Scale: zero shuffle and zero Python — weights live in literal CASE
    expressions (no join), replicas come from one `explode(sequence)`
    whose fan-out is exactly ceil(w) (bounded, per-row), and the hash
    test evaluates in the scan stage. Determinism makes the mixture
    auditable and resumable: membership is a pure function of
    (id, source, weights, seed), independent of cluster size or
    partitioning. At 100 TB the operator is a single pass; changing
    the mixture re-runs only this pass, not the upstream pipeline.
    """
    n_full: Column = F.lit(0)
    frac_thr: Column = F.lit(0)
    for source, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {source!r}: {w}")
        full = int(w)
        frac = int(round((w - full) * SAMPLE_BUCKETS))
        is_src = F.col(source_col) == source
        n_full = F.when(is_src, F.lit(full)).otherwise(n_full)
        frac_thr = F.when(is_src, F.lit(frac)).otherwise(frac_thr)
    epoch = F.explode(F.sequence(F.lit(0), n_full)).alias("epoch")
    out = df.select("*", n_full.alias("_nf"), frac_thr.alias("_ft"), epoch)
    tag = F.concat_ws(
        ":", F.col(id_col).cast("string"), F.col("epoch").cast("string"),
        F.lit(str(seed)),
    )
    out = out.filter(
        (F.col("epoch") < F.col("_nf"))
        | (portable_bucket(tag, SAMPLE_BUCKETS) < F.col("_ft"))
    )
    return out.drop("_nf", "_ft")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    broadcast_benchmark: bool | None = None,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document sharing at
    least one k-token shingle with any benchmark document, report
    (id, n_shared) — the number of DISTINCT corpus shingles that also
    occur anywhere in the benchmark. Callers drop or down-weight the
    flagged docs before training; k=8 is the span where accidental
    natural-language overlap becomes unlikely (the convention of
    published LLM decontamination pipelines).

    Plan: explode both sides' distinct shingle sets, inner-join on the
    shingle, count distinct per corpus id. The benchmark side is tiny
    relative to the corpus (eval sets, not training sets) — its
    exploded shingles broadcast, so the corpus is scanned ONCE with no
    shuffle of document text; the only aggregation key is (id, shingle)
    pairs that actually matched. Corpus rows whose id also appears in
    the benchmark are excluded (self-overlap is not contamination).

    ``broadcast_benchmark``: True forces the benchmark-shingle broadcast
    (the classic tiny-eval-set case); False lets Spark/AQE pick the join
    strategy (the safe call when the "benchmark" is itself large — a
    forced broadcast of an unbounded exploded shingle set would exceed
    broadcast limits at scale); None (default) defers to AQE, which
    broadcasts automatically below the adaptive threshold using REAL
    runtime sizes rather than this function's guess.
    """
    # Arrow-batched shingling on the corpus (hot) side — see
    # functions/text.py:shingles_udf for the ~8x vs interpreted HOFs.
    c_sh = (
        ensure_parallelism(corpus)
        .select(
            F.col(id_col).alias("_cid"),
            shingles_udf(k)(F.col(text_col)).alias("_sh"),
        )
        .select("_cid", F.explode("_sh").alias("_s"))
    )
    b_ids = benchmark.select(F.col(id_col).alias("_bid")).distinct()
    b_sh = (
        benchmark.select(shingles_udf(k)(F.col(text_col)).alias("_sh"))
        .select(F.explode("_sh").alias("_s"))
        .distinct()
    )
    if broadcast_benchmark:
        b_sh = F.broadcast(b_sh)
    hits = (
        c_sh.join(F.broadcast(b_ids), c_sh["_cid"] == b_ids["_bid"], "left_anti")
        .join(b_sh, "_s")
    )
    return hits.groupBy(F.col("_cid").alias(id_col)).agg(
        F.count_distinct("_s").alias("n_shared")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float],
    seed: str = "",
) -> DataFrame:
    """Deterministic train/valid/test split: adds a `split` column whose
    value is a pure function of (seed, id, weights).

    Buckets from portable_bucket(seed || id) are carved into contiguous
    ranges in SORTED split-name order (so the assignment is independent
    of Mapping iteration order); weights are quantized to
    1/SAMPLE_BUCKETS and must sum to <= 1 — rows whose bucket falls past
    the last range get NULL (callers with partial weights use that as
    "rest"). Embarrassingly parallel: one hash + CASE per row inside the
    scan stage, no shuffle, stable across runs/cluster sizes — the
    property an auditable 100 TB corpus split needs (no reshuffle ever
    moves a document across splits).
    """
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    bucket = portable_bucket(
        F.concat(F.lit(str(seed)), F.col(id_col).cast("string")), SAMPLE_BUCKETS
    )
    expr: Column = F.lit(None).cast("string")
    # round the CUMULATIVE sum at each boundary (not each weight) so
    # quantization error never accumulates: weights {1/3, 1/3, 1/3}
    # must cover all SAMPLE_BUCKETS buckets, not leave bucket 9999 NULL
    cum_w = 0.0
    bounds: list[tuple[str, int]] = []
    for name, w in sorted(weights.items()):
        cum_w += w
        bounds.append((name, int(round(cum_w * SAMPLE_BUCKETS))))
    for name, upper in reversed(bounds):
        expr = F.when(bucket < upper, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


#: Bucket count for the two-phase deterministic shuffle below.
SHUFFLE_BUCKETS = 4096


def shuffle_deterministic(
    df: DataFrame, id_col: str, seed: str = "", n_buckets: int = SHUFFLE_BUCKETS
) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: adds
    `shuffle_pos` (0-based, dense, a permutation of row positions) that
    is a pure function of (seed, ids).

    Position = rank under (bucket, key, id) where key = md5(seed || id)
    and bucket = portable_bucket(key-derived). A global
    row_number() OVER (ORDER BY key) would put the entire corpus through
    ONE task; instead the standard two-phase construction: per-bucket
    ranks run parallel across buckets (Window.partitionBy(bucket)), and
    each bucket's global offset comes from a bucket-count prefix sum —
    n_buckets rows, a trivially small single-partition window —
    broadcast-joined back. No driver collect; scales to any corpus the
    cluster's shuffle can hash-partition. The ordering key includes id
    as tiebreak, so positions are unique even under md5 collisions.
    """
    key = F.md5(F.concat(F.lit(str(seed)), F.col(id_col).cast("string")))
    bucket = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long"), F.lit(n_buckets)
    )
    tagged = df.withColumn("_sk", key).withColumn("_sb", bucket)
    in_bucket = Window.partitionBy("_sb").orderBy("_sk", id_col)
    offsets = (
        tagged.groupBy("_sb").agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_sb").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_sb", "_off")
    )
    return (
        tagged.withColumn("_r", F.row_number().over(in_bucket))
        .join(F.broadcast(offsets), "_sb")
        .withColumn("shuffle_pos", (F.col("_off") + F.col("_r") - 1).cast("long"))
        .drop("_sk", "_sb", "_r", "_off")
    )


def corpus_ngram_topk(
    df: DataFrame, text_col: str, n: int = 3, k: int = 100
) -> DataFrame:
    """Top-k n-grams by DOCUMENT frequency (number of documents
    containing the gram — shingle sets are per-doc distinct), the
    corpus-analysis primitive behind contamination screens, boilerplate
    detection, and hot-shingle caps (dedup_ngram_jaccard's max_df).

    Plan: Arrow-batched shingling -> explode -> hash-agg count ->
    TakeOrderedAndProject top-k (count desc, gram asc for a
    deterministic total order). The aggregation combines map-side, so
    the shuffle carries one (gram, partial count) per distinct gram per
    partition; top-k never materializes a global sort.
    """
    grams = (
        ensure_parallelism(df)
        .select(shingles_udf(n)(F.col(text_col)).alias("_sh"))
        .select(F.explode("_sh").alias("gram"))
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "gram")
        .limit(k)
    )


def corpus_collocations(
    df: DataFrame, text_col: str = "text", k: int = 100, min_count: int = 5,
) -> DataFrame:
    """Top-k two-word collocations by fixed-point Dice score — the
    phrase-mining primitive behind tokenizer vocabulary prep and
    multi-word-expression detection (Smadja 1993's collocation
    extraction; the same consecutive-bigram statistic Gensim's Phrases
    scores). Dice(a,b) = 2*cnt(a,b)/(cnt(a)+cnt(b)) is chosen over PMI
    deliberately: it needs NO corpus-size factor, so the fixed-point
    form dice_ppm = (2e6 * cnt_ab) div (cnt_a + cnt_b) is a single
    int64-exact integer division replayable bit-identically by any
    engine (PMI's cnt_ab*N*1e6 product overflows int64 once N reaches
    ~1e13 tokens — exactly the 100 TB regime), and it shares PMI's
    rare-pair bias fix: the min_count floor (Church & Hanks 1990's
    standard mitigation) drops pairs seen fewer than min_count times
    BEFORE scoring. int64 bound: 2e6*cnt_ab < 2^63 holds until a
    single bigram occurs 4.6e12 times; lift to DECIMAL(38,0) beyond.

    Plan (zero Python): tokenize scan-stage -> consecutive pairs via
    arrays_zip of the array with its own tail (JVM, no explode of
    positions) -> bigram hash-agg [map-side combined] -> unigram
    hash-agg -> two equi-joins on the term (vocabulary-sized sides;
    AQE picks broadcast vs shuffle) -> TakeOrderedAndProject top-k on
    the deterministic total order (score desc, a, b) — no global sort,
    no collect, no per-doc state."""
    from kafka_streams_app_spark.functions.text import tokens

    toks = (
        ensure_parallelism(df)
        .select(tokens(F.col(text_col)).alias("_t"))
    )
    pairs = (
        toks.filter(F.size("_t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("_t", 1, F.size("_t") - 1).alias("a"),
                    F.slice("_t", 2, F.size("_t") - 1).alias("b"),
                )
            ).alias("_p")
        )
        .select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
    )
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    big = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt_ab"))
        .filter(F.col("cnt_ab") >= min_count)
    )
    scored = (
        big.join(uni.select(F.col("w").alias("a"), F.col("cnt").alias("cnt_a")), "a")
        .join(uni.select(F.col("w").alias("b"), F.col("cnt").alias("cnt_b")), "b")
        .withColumn(
            "dice_ppm",
            F.expr("(2000000 * cnt_ab) div (cnt_a + cnt_b)").cast("long"),
        )
    )
    return (
        scored.select("a", "b", "cnt_ab", "cnt_a", "cnt_b", "dice_ppm")
        .orderBy(F.desc("dice_ppm"), "a", "b")
        .limit(k)
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    min_df: int = 2,
    min_len: int = 10,
) -> DataFrame:
    """Lines repeated across >= min_df documents — the CCNet/C4-style
    line-level boilerplate detector (nav bars, cookie banners, footers
    recur verbatim across a site's pages; within-page prose does not).

    Plan: per-doc DISTINCT trimmed lines of >= min_len chars (the
    distinct + length filter happen INSIDE the array, scan-stage, so a
    page repeating its own footer 50x still contributes one posting)
    -> explode -> one map-side-combined hash agg on the line. The
    shuffle carries one (line, partial count) per distinct line per
    partition; min_len keeps degenerate hot keys ('', '-', '*') out of
    the exchange entirely.
    """
    from kafka_streams_app_spark.functions.text import trimmed_lines

    lines = df.select(
        F.explode(
            F.array_distinct(
                F.filter(
                    trimmed_lines(F.col(text_col)),
                    lambda t: F.length(t) >= min_len,
                )
            )
        ).alias("line")
    )
    return (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_df)
    )


def scrub_boilerplate(
    df: DataFrame,
    boiler: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document content after removing boilerplate lines: the
    scrubbed text (original line order preserved) plus exact kept
    counts.

    Plan: explode (pos, trimmed line) -> left_anti join against the
    boilerplate set (line-keyed shuffle join; the boiler side is the
    output of boilerplate_lines — at corpus scale it is NOT assumed
    broadcastable) -> per-doc hash agg re-assembling via
    array_sort(collect_list(struct(pos, line))). Documents whose every
    line was boilerplate drop out (nothing kept to emit).
    """
    from kafka_streams_app_spark.functions.text import trimmed_lines

    exploded = df.select(
        F.col(id_col),
        F.posexplode(trimmed_lines(F.col(text_col))).alias("pos", "line"),
    )
    kept = exploded.join(boiler.select("line"), "line", "left_anti")
    return kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_lines"),
        F.sum(F.length("line")).alias("kept_chars"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("scrubbed_text"),
    )


def pack_sequences(
    df: DataFrame,
    strata_col: str,
    order_col: str,
    size_col: str,
    capacity: int,
    shards: int = 1,
) -> DataFrame:
    """Contiguous-fill sequence packing: within each stratum (ordered by
    `order_col`) assign each row to bin ``floor(start_offset /
    capacity)`` where start_offset is the running sum of `size_col`
    before the row.

    This is the streaming-concat packing used to build fixed-length LLM
    training sequences from variable-length documents: bins are filled
    in order and a document whose start offset lands in bin b belongs to
    b (documents longer than `capacity` still get exactly one bin — the
    consumer splits them; `bin_offset` gives the position of the row's
    first token within its bin).

    Output: input columns + `shard`, `bin_id`, `bin_offset`. Bin ids are
    per-(stratum, shard); see the module docstring for why shards > 1 is
    the 100 TB configuration.
    """
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    shard = (
        portable_bucket(F.col(order_col), shards) if shards > 1 else F.lit(0)
    ).cast("int")
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy(strata_col, "shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(size_col).over(w) - F.col(size_col)).cast("long")
    return (
        out.withColumn("_start", start)
        .withColumn("bin_id", F.floor(F.col("_start") / capacity))
        .withColumn("bin_offset", (F.col("_start") % capacity).cast("long"))
        .drop("_start")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Token-window document chunking: split each document into
    whitespace-token windows of `max_tokens` with `overlap` tokens of
    context carried between consecutive chunks (stride = max_tokens -
    overlap) — the standard pre-tokenization step that turns
    variable-length documents into model-window-sized training
    examples (pack_sequences is the inverse direction: it concatenates
    short ones).

    Plan: split + per-doc struct build + explode, all inside the scan
    stage — zero shuffle, zero Python; each chunk's text reassembles
    with single-space joins so the output is engine-portable (the
    DuckDB oracle replays it exactly). An empty/whitespace-only
    document yields one empty chunk (chunk_id 0, n_chunk_tokens 0) so
    no doc_id silently disappears from the corpus.

    Long-doc scaling (the r7-verdict fan-out fix): the chunk structs
    are built BEFORE the explode, so exploded rows carry only
    (chunk_id, n_chunk_tokens, chunk_text) — never the full token
    array. The earlier form exploded chunk ids first and sliced after,
    which materialized the whole `_toks` array once PER CHUNK ROW:
    O(n_tokens^2/stride) per document — harmless on web pages,
    pathological on book-length docs (10^5 tokens -> ~1.8k chunk rows
    x 600 KB array copies). This form is O(total output chars).

    CSE guard: the token array is bound as a LAMBDA VARIABLE (a
    single-element F.array wrapper whose outer transform evaluates the
    split exactly once per row). Referencing a projected `_toks`
    column inside the lambda instead would re-tokenize per chunk —
    Catalyst's CollapseProject re-inlines the projection into every
    lambda reference (same measured pitfall as
    functions/text.py:shingles_udf, ~8x).

    Output: id_col, chunk_id, n_chunk_tokens, chunk_text.
    """
    if overlap < 0 or overlap >= max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}"
        )
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "",
    )

    def chunk_structs(t: Column) -> Column:
        # t is the lambda-bound token array: evaluated once per row.
        n_chunks = F.greatest(
            F.lit(1), F.ceil((F.size(t) - F.lit(overlap)) / F.lit(stride))
        ).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                # slice-length arithmetic, identical to size(slice(...)):
                # clamp(n - i*stride, 0, max_tokens) — avoids a second
                # slice evaluation per chunk.
                F.greatest(
                    F.lit(0),
                    F.least(F.lit(max_tokens), F.size(t) - i * stride),
                ).cast("long").alias("n_chunk_tokens"),
                F.array_join(
                    F.slice(t, i * stride + 1, max_tokens), " "
                ).alias("chunk_text"),
            ),
        )

    structs = F.element_at(F.transform(F.array(toks), chunk_structs), 1)
    return df.select(
        F.col(id_col), F.explode(structs).alias("_c")
    ).select(
        id_col,
        F.col("_c.chunk_id").alias("chunk_id"),
        F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Per-document top-k characteristic terms by a TF-IDF-flavored
    score — the keyword-extraction stage of a corpus analysis pipeline
    (topic drift monitoring, per-source vocabularies, near-dup triage).

    Scoring: score = floor(tf * 1e6 / (doc_freq + 1)), i.e. idf as the
    exact rational 1/(df+1) in fixed point instead of log((N+1)/(df+1)).
    Chosen deliberately: the rational form is INTEGER-EXACT, so the
    ranking is bit-identical across engines (the DuckDB oracle replays
    it); a log idf differs only by a monotone-in-df reweighting and is
    a one-line swap where cross-engine hash equality is not required.
    Terms appearing in more than max_df_ratio of documents are dropped
    (the classic stopword guard, computed from the corpus itself).

    Plan: explode tokens (scan stage) -> per-(doc, term) count
    [map-side-combined shuffle] -> per-term doc_freq [map-side-combined
    shuffle on the term] -> one-row corpus size broadcast-joined ->
    per-doc window top-k (ties broken by term for determinism). The
    only per-doc state is k rows; no collect, no global sort.
    """
    from kafka_streams_app_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    n_docs = df.select(
        F.count(F.lit(1)).cast("long").alias("_n_docs")
    )
    scored = (
        tf.join(docfreq, "term")
        .join(F.broadcast(n_docs))
        .filter(F.col("doc_freq") <= F.floor(F.col("_n_docs") * max_df_ratio))
        .withColumn(
            "score",
            F.floor(F.col("tf") * F.lit(1_000_000) / (F.col("doc_freq") + 1))
            .cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "score",
                F.col("rank").cast("long").alias("rank"))
    )


def decontaminate_exact(
    corpus: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_col: str = "span",
    span_id_col: str = "span_id",
) -> DataFrame:
    """Exact-substring decontamination: for every corpus document that
    contains at least one benchmark SPAN verbatim, report
    (id, n_spans_hit) — the companion check to the token-shingle
    overlap in `decontaminate` (published decontamination pipelines run
    both: n-gram overlap catches near-verbatim leakage, exact spans
    catch short high-value strings like answer keys that an 8-gram
    window can miss).

    Plan: the span list is benchmark-sized (eval sets), so it
    broadcasts; `contains` is a non-equi predicate, so the join is a
    broadcast nested-loop — each corpus partition scans its documents
    once against the in-memory span list, no shuffle of document text;
    only (id, span_id) hits reach the aggregation. Scale note: at very
    large span counts the optimized path is a multi-pattern matcher
    (Aho-Corasick) in an Arrow-batched UDF — the O(docs x spans)
    Column form here is the right trade while spans stay eval-sized
    (10^3-10^5), and it keeps the operator fully JVM-side.
    Empty spans are excluded (they would match every document).
    """
    sp = spans.select(
        F.col(span_id_col).alias("_sid"), F.col(span_col).alias("_span")
    ).filter(F.length("_span") > 0).distinct()
    hits = corpus.select(
        F.col(id_col), F.col(text_col).alias("_text")
    ).join(
        F.broadcast(sp), F.col("_text").contains(F.col("_span"))
    )
    return hits.groupBy(id_col).agg(
        F.count_distinct("_sid").alias("n_spans_hit")
    )


#: Rabin-Karp polynomial base (64-bit FNV prime); arithmetic is native
#: uint64 wraparound, so every numpy op stays branch-free. _RK_BINV is
#: B^-1 mod 2^64 (B is odd, so the inverse exists): with it, the hash
#: of EVERY window of EVERY length falls out of one prefix-sum pass —
#: W_L[i] = B^(L+i-1) * (S[i+L] - S[i]) where S is the cumulative
#: Binv-weighted byte sum — so supporting a longer filter prefix (or
#: several lengths) costs ~3 numpy ops per length, not O(L) passes.
_RK_BASE = 1099511628211
_RK_BINV = pow(_RK_BASE, -1, 1 << 64)
#: Pattern-prefix filter lengths: each pattern is filtered on the
#: largest tier <= its byte length. Longer prefixes slash candidate
#:  positions on repetitive text (measured on the sf0.1 synthetic
#: corpus: tier-8 leaves 57% of ALL positions as candidates; tier-32
#: leaves 0.3%); tiers below 8 exist only so very short spans stay
#: exact.
_RK_TIERS = (32, 16, 8, 4, 2, 1)
#: Low-bits mask for the per-tier candidate LUT (2^20 bool entries =
#: 1 MiB per tier).
_RK_LUT_MASK = (1 << 20) - 1
#: Cap on bytes hashed per vectorized pass: the uint64 working set is
#: ~48x the text bytes (byte copy, two cumprod power arrays, the
#: prefix-sum array, per-tier window hashes), so 8 MiB of text tops
#: out near 400 MiB transient per core.
_RK_CHUNK_BYTES = 8 << 20


def _rk_hash(pb: bytes, L: int) -> int:
    h = 0
    for j in range(L):
        h = (h + pb[j] * pow(_RK_BASE, L - 1 - j, 1 << 64)) & ((1 << 64) - 1)
    return h


def _rk_index(patterns: list[tuple]) -> dict:
    """Multi-pattern index for exact substring search over UTF-8 bytes:
    a Rabin-Karp rolling hash of each pattern's first L bytes (L = the
    largest _RK_TIERS entry <= the pattern's length) filters candidate
    positions in one vectorized pass per active tier; exact byte
    comparison then verifies each candidate, so the result is EXACT —
    the prefix hash only prunes. Matching cost per tier is ~3 numpy
    ops over the batch regardless of pattern count — the same
    span-count independence as an Aho-Corasick automaton, at numpy
    instead of per-char-Python throughput (measured in SCALE.md).
    Byte-level matching is sound for UTF-8: a pattern's first byte is
    never a continuation byte, so a byte-substring match always aligns
    on a character boundary.

    Returns {tier: (low-bits LUT, {hash: [(sid, pattern bytes), ...]})}
    for each non-empty tier. The LUT is a 2^20-entry bool array over
    the hash's low 20 bits — one vectorized gather classifies every
    window position, and the (rare) LUT survivors go through the exact
    dict probe + byte compare; measured ~1.6x cheaper than binary
    search (searchsorted) over the window-hash array.
    """
    by_tier: dict[int, dict[int, list]] = {}
    for sid, p in patterns:
        pb = p.encode("utf-8")
        L = next(t for t in _RK_TIERS if t <= len(pb))
        by_tier.setdefault(L, {}).setdefault(_rk_hash(pb, L), []).append(
            (sid, pb)
        )
    out = {}
    for L, table in by_tier.items():
        lut = np.zeros(_RK_LUT_MASK + 1, dtype=bool)
        lut[
            np.array(sorted(table), dtype=np.uint64) & np.uint64(_RK_LUT_MASK)
        ] = True
        out[L] = (lut, table)
    return out


#: Worker-local cache of the data-independent power arrays (B^k and
#: Binv^k for k < n): cumprod is the single most expensive pass in the
#: scan and depends only on the chunk LENGTH, so it is computed once
#: per worker at the high-water-mark length and sliced thereafter.
_RK_POWS: dict[str, np.ndarray] = {}


def _rk_powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    bp = _RK_POWS.get("bp")
    if bp is None or len(bp) < n:
        size = max(n, 2 * len(bp) if bp is not None else n)
        bp = np.full(size, np.uint64(_RK_BASE))
        bp[0] = np.uint64(1)
        _RK_POWS["bp"] = bp = np.cumprod(bp)
        ibp = np.full(size, np.uint64(_RK_BINV))
        ibp[0] = np.uint64(1)
        _RK_POWS["ibp"] = np.cumprod(ibp)
    return bp, _RK_POWS["ibp"]


# Worker-local pattern-index cache: built once per executor process per
# broadcast span set, reused across Arrow batches — the standard "ship
# data, build index worker-side" pattern. Size-1 with evict-on-miss:
# each decontaminate call mints a fresh key, and an index over
# 10^5-10^6 spans holds every pattern's bytes — unbounded growth would
# leak one index per call for the executor's lifetime.
_RK_CACHE: dict = {}


def decontaminate_exact_ac(
    corpus: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_col: str = "span",
    span_id_col: str = "span_id",
) -> DataFrame:
    """`decontaminate_exact`, multi-pattern-matcher form: identical
    output contract (docs with >= 1 verbatim span hit, distinct-span
    count), different scaling shape. The span list is collected
    (bounded by contract: eval sets are 10^3-10^6 short strings — the
    same documented-bounded-collect discipline as the IVF codebook),
    broadcast raw, and compiled once per executor into a Rabin-Karp
    prefix-hash index (`_rk_index`); each Arrow batch is then scanned
    in ONE chain of vectorized numpy ops independent of span count,
    with exact byte verification at the (rare) candidate positions.
    r9 shipped this operator as a per-char-Python Aho-Corasick walk —
    same contract, ~MB/s per core; the vectorized filter is the r10
    rewrite the r9 verdict asked for (before/after in SCALE.md).
    Crossover vs the NLJ form is measured in SCALE.md
    (tools/scale_smoke.py decontam); below it the JVM-side NLJ wins,
    above it this Arrow-batched path does.
    """
    import pandas as pd

    sp = (
        spans.select(
            F.col(span_id_col).alias("_sid"), F.col(span_col).alias("_span")
        )
        .filter(F.length("_span") > 0)
        .distinct()
    )
    pats = [(r["_sid"], r["_span"]) for r in sp.collect()]
    sc = corpus.sparkSession.sparkContext
    b = sc.broadcast(pats)
    cache_key = ("rk", uuid.uuid4().hex)  # one index per span set

    id_field = corpus.schema[id_col]
    out_schema = f"{id_col} {id_field.dataType.simpleString()}, n_spans_hit bigint"

    def run(batches):
        if not b.value:
            return
        idx = _RK_CACHE.get(cache_key)
        if idx is None:
            _RK_CACHE.clear()  # evict prior calls' indexes (size-1 cache)
            idx = _RK_CACHE[cache_key] = _rk_index(b.value)
        for pdf in batches:
            ids_in = list(pdf[id_col])
            texts = [
                t.encode("utf-8") if isinstance(t, str) else b""
                for t in pdf[text_col]
            ]
            hit_sets: dict[int, set] = {}
            # chunk the batch at doc boundaries so the uint64 working
            # set stays bounded (long-doc batches can be GBs of text);
            # a match never spans docs, so it never spans chunks
            start = 0
            while start < len(texts):
                stop, nbytes = start, 0
                while stop < len(texts) and (
                    nbytes < _RK_CHUNK_BYTES or stop == start
                ):
                    nbytes += len(texts[stop])
                    stop += 1
                chunk = texts[start:stop]
                offs = np.zeros(len(chunk) + 1, dtype=np.int64)
                np.cumsum([len(t) for t in chunk], out=offs[1:])
                buf = b"".join(chunk)
                n = len(buf)
                if n == 0:
                    start = stop
                    continue
                # shared prefix arrays: S[i] = sum_{j<i} a[j]*Binv^j,
                # bp[k] = B^k — every tier's window hashes are a diff
                # and a multiply away (see _RK_BINV note); the power
                # arrays are worker-cached (data-independent)
                a = np.frombuffer(buf, dtype=np.uint8).astype(np.uint64)
                bp, ibp = _rk_powers(n)
                s = np.zeros(n + 1, dtype=np.uint64)
                np.cumsum(a * ibp[:n], out=s[1:])
                del a
                for tier_len, (lut, table) in idx.items():
                    if n < tier_len:
                        continue
                    w = bp[tier_len - 1 : n] * (
                        s[tier_len : n + 1] - s[: n - tier_len + 1]
                    )
                    cand = np.nonzero(lut[w & np.uint64(_RK_LUT_MASK)])[0]
                    # windows crossing doc boundaries carry garbage
                    # hashes; any that collide are rejected here by
                    # the per-doc end bound (and LUT low-bit false
                    # positives die at the dict probe)
                    docs_of = np.searchsorted(offs, cand, side="right") - 1
                    for pos, d in zip(cand.tolist(), docs_of.tolist()):
                        end = offs[d + 1]
                        for sid, pb in table.get(int(w[pos]), ()):
                            if pos + len(pb) <= end and buf[
                                pos : pos + len(pb)
                            ] == pb:
                                hit_sets.setdefault(start + d, set()).add(sid)
                start = stop
            if hit_sets:
                rows = sorted(hit_sets.items())
                yield pd.DataFrame({
                    id_col: [ids_in[i] for i, _ in rows],
                    "n_spans_hit": [len(s) for _, s in rows],
                })

    # single-file corpora arrive as ONE partition at small scale —
    # rebalance so the vectorized scan uses every core (the multimodal
    # _synth_input rationale; at 100 TB the scan splits already exceed
    # parallelism and this no-ops). Streaming corpora skip the guard:
    # ensure_parallelism reads df.rdd.getNumPartitions(), which raises
    # at plan build on a streaming DataFrame (ADVICE r15) — the
    # stateless mapInPandas itself runs unchanged under streaming.
    scan = corpus.select(id_col, text_col)
    if not scan.isStreaming:
        scan = ensure_parallelism(scan)
    return scan.mapInPandas(run, out_schema)


def bigram_lm_likelihood(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality score (Wenzek et al. 2020
    score documents by LM perplexity; docs far from the model are
    flagged): trains a Laplace-smoothed BIGRAM model on the corpus
    itself and scores each document by its mean bigram likelihood,

        p(w2|w1) = (c(w1 w2) + 1) / (c(w1 *) + V)

    reported as fixed-point integer `score_e9` = floor(mean p * 1e9)
    (plus exact `n_bigrams`). Fixed-point instead of ln-perplexity for
    the same reason as text_tfidf_topk's integer score: ln is not
    correctly-rounded and differs across libms, while integer multiply/
    floor-divide is bit-identical in any engine — the oracle replays
    the score exactly. Monotonicity vs perplexity is task-equivalent
    for filtering: predictable text scores high, gibberish low.

    Plan (all linear, no all-pairs): one corpus pass explodes bigram
    occurrences (zip_with over two token-array slices — the linear
    form, see repetition_signals); two map-side-combined aggs build the
    model (bigram counts, prefix counts); V is a broadcast one-row agg;
    scoring joins each doc's DISTINCT bigrams to the model (equi-join
    on the bigram string; AQE skew-split handles hot function-word
    bigrams) and one final per-doc agg emits the mean. At 100 TB the
    model tables are corpus-sized aggregates that shuffle once;
    counts stay within int64 up to ~9e18 bigrams and the e9 multiply
    is DECIMAL(38,0) on the Spark side (HUGEINT in the DuckDB twin).

    Docs with < 2 tokens have no bigrams and are absent from the
    output (score of an empty sequence is undefined).
    """
    from kafka_streams_app_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = df.select(F.col(id_col), F.explode(bigrams).alias("_bg")).select(
        id_col, "_bg", F.substring_index("_bg", " ", 1).alias("_w1")
    )
    occ = bg.groupBy(id_col, "_bg", "_w1").agg(
        F.count(F.lit(1)).alias("_occ")
    )
    c2 = bg.groupBy("_bg").agg(F.count(F.lit(1)).alias("_c2"))
    c1 = bg.groupBy("_w1").agg(F.count(F.lit(1)).alias("_c1"))
    vocab = df.select(F.explode(toks).alias("_t")).agg(
        F.count_distinct("_t").cast("long").alias("_V")
    )
    # exact floor((c2+1)*1e9 / (c1+V)): decimal A - A%B keeps the
    # division exact (Spark decimal '/' rounds at result scale, which
    # could flip a floor at the integer boundary; subtracting the
    # remainder first makes it a no-op division)
    a = (F.col("_c2") + 1).cast("decimal(38,0)") * F.lit(1_000_000_000)
    b = (F.col("_c1") + F.col("_V")).cast("decimal(38,0)")
    p_e9 = ((a - F.pmod(a, b)) / b).cast("long")
    scored = (
        occ.join(c2, "_bg")
        .join(c1, "_w1")
        .join(F.broadcast(vocab))
        .select(id_col, "_occ", p_e9.alias("_p_e9"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("_occ").cast("long").alias("n_bigrams"),
        F.expr("sum(_occ * _p_e9) div sum(_occ)").cast("long")
        .alias("score_e9"),
    )


def scrub_duplicated_spans(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """ExactSubstr-style cross-document span scrubbing (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): remove from every document each token covered
    by a k-token run that also appears in at least min_df - 1 OTHER
    documents. The paper cuts duplicated substrings (not whole
    documents) because verbatim passages recur inside otherwise-unique
    pages; we operate at token granularity with the shared \\W+
    tokenizer so the result is engine-portable.

    Approximation vs the paper's suffix array: a token is removed iff
    it lies inside a duplicated k-shingle, which marks exactly the
    tokens of every cross-doc duplicated run of length >= k (any such
    run is a union of its k-windows, each of which is itself
    duplicated) — identical output to the suffix-array method at run
    granularity k, without a global suffix sort.

    Plan at scale (the suffix-array step is the one that does NOT
    distribute): shingle hashes are md5-derived 60-bit ints computed in
    the scan stage; duplicated hashes come from ONE map-side-combined
    hash agg over per-doc DISTINCT hashes (within-doc repetition never
    inflates the exchange); occurrences join the duplicated set
    co-partitioned on the hash; covered starts aggregate back on
    doc_id; the final token filter is a JVM lambda over the token
    array. No Python in the plan, no global sort, shuffles: hash agg +
    hash join + doc_id agg/join.

    Output: doc_id (id_col), n_tokens, n_removed, scrubbed_text.
    Documents shorter than k tokens pass through untouched.
    """
    from kafka_streams_app_spark.functions.text import tokens

    base = ensure_parallelism(corpus).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).withColumn("_n", F.size("_t"))

    # CSE guard (the r6/chunk_documents rule): the token array is bound
    # as a LAMBDA VARIABLE so slice(t, i, k) inside the per-start
    # transform cannot have the tokenizer re-inlined by CollapseProject
    # — referencing the projected _t column there re-tokenizes the
    # document once PER SHINGLE START (measured: 4.7 s -> 0.6 s for the
    # shingle stage at sf0.1).
    def _shingle_structs(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - k + 1),
            lambda i: F.struct(
                i.alias("i"),
                F.conv(
                    F.substring(
                        F.md5(F.array_join(F.slice(t, i, k), " ")), 1, 15
                    ), 16, 10,
                ).cast("long").alias("h"),
            ),
        )

    sh = F.when(
        F.col("_n") >= k,
        F.element_at(F.transform(F.array(F.col("_t")), _shingle_structs), 1),
    ).otherwise(F.array().cast("array<struct<i:int,h:long>>"))
    # NOTE (r15 measurements, sf0.1): the md5 shingle chain feeds TWO
    # subtrees (the df counter and the per-start hits join); without
    # materialization each recomputes tokenize + per-shingle md5. A
    # WIDE localCheckpoint of (id, tokens, shingle structs) was tried
    # and REVERTED (4.2 s vs 2.8 s — the token arrays are wider than
    # the arithmetic they save). The NARROW checkpoint below holds
    # ONLY (id, shingle structs) — ~16 B/shingle, no tokens, no text —
    # so the md5 pass runs ONCE while the final join's subtree
    # re-tokenizes without any md5 (its _sh column prunes away):
    # 2.88 s -> 2.18 s, output identical. Recomputed fresh per
    # invocation (no cross-run reuse).
    occ_sh = (
        base.withColumn("_sh", sh)
        .select(id_col, "_sh")
        # EAGER, deliberately — the lazy variant was A/B'd and lost
        # (1.29 -> 1.38 s at sf0.1): the df counter and the hits join
        # are concurrent stages whose lazy cache races, recomputing the
        # md5 shingle chain twice in parallel (softdedup_weights' note)
        .localCheckpoint(eager=True)
    )
    # per-doc DISTINCT hashes feed the df counter: the exchange carries
    # each (doc, shingle) once even when a doc repeats a run internally
    dup = (
        occ_sh.select(F.explode(F.array_distinct("_sh.h")).alias("_h"))
        .groupBy("_h").count()
        .filter(F.col("count") >= min_df)
        .select("_h")
    )
    hits = (
        occ_sh.select(id_col, F.explode("_sh").alias("_s"))
        .join(dup, F.col("_s.h") == F.col("_h"))
        .groupBy(id_col)
        .agg(F.collect_set(F.col("_s.i")).alias("_starts"))
    )
    # Covered starts -> disjoint merged intervals -> complement gaps ->
    # kept tokens by slicing the gaps. The former per-token
    # `~exists(starts, ...)` filter was O(n_tokens * n_starts) per doc
    # — quadratic for a fully-duplicated long document (every position
    # a start). A start p covers token positions [p, p+k-1] (1-based);
    # sorted starts merge when the next start is <= current end + 1
    # (adjacent coverage unions identically to overlapping), and since
    # starts are increasing the running end is always last-start+k-1 —
    # so runs break exactly where consecutive sorted starts differ by
    # more than k.
    #
    # r15: the merge itself is LINEAR — boundary positions via one
    # filter over indexes, intervals via one zip_with of the boundary
    # array against its shift. The r14 form was an F.aggregate fold
    # that rebuilt the accumulator array every step
    # (concat(slice(acc), ...)) — O(m^2) array copies per doc, which
    # for a heavily-duplicated long document (m ~ n_tokens starts) is
    # the same quadratic wall the fold replaced. Measured on 200 docs
    # x 5000 starts: 1.18 s -> 0.19 s (6x, growing with m); identical
    # output on 3003 randomized + adversarial cases and the oracle.
    # Both the sorted-starts and the boundary arrays are bound as
    # LAMBDA VARIABLES (the CSE guard): referenced as plain
    # expressions, array_sort would be re-inlined and re-evaluated per
    # element reference inside the lambdas — measured catastrophic
    # (the first linear prototype without the guard was SLOWER than
    # the fold).
    _ivl = "array<struct<s:int,e:int>>"

    def _merge_runs(ss: Column) -> Column:
        # 1-based index j starts a new run iff j == 1 or
        # ss[j-1] - ss[j-2] > k (0-based F.get)
        bcalc = F.filter(
            F.sequence(F.lit(1), F.size(ss)),
            lambda j: (j == 1) | (F.get(ss, j - 1) - F.get(ss, j - 2) > k),
        )

        def _zipped(bounds: Column) -> Column:
            # run i spans ss[bounds[i]-1 .. bounds[i+1]-2]; its end is
            # that last start + k - 1 (sentinel m+1 closes the last run)
            nxt = F.concat(
                F.slice(bounds, 2, F.size(bounds) - 1),
                F.array(F.size(ss) + 1),
            )
            return F.zip_with(
                bounds,
                nxt,
                lambda b, nb: F.struct(
                    F.get(ss, b - 1).alias("s"),
                    (F.get(ss, nb - 2) + k - 1).alias("e"),
                ),
            )

        return F.element_at(F.transform(F.array(bcalc), _zipped), 1)

    merged = F.when(
        F.size("_starts") > 0,
        F.element_at(
            F.transform(F.array(F.array_sort("_starts")), _merge_runs), 1
        ),
    ).otherwise(F.array().cast(_ivl))

    # kept = tokens in the complement gaps of the merged intervals.
    # The token array is bound as a lambda variable (the CSE guard
    # again) so the gap slices cannot re-inline the tokenizer.
    def _kept(t: Column, iv: Column) -> Column:
        n = F.size(t)
        gaps = F.filter(
            F.transform(
                F.sequence(F.lit(0), F.size(iv)),
                lambda j: F.struct(
                    F.when(j == 0, F.lit(1))
                    .otherwise(F.get(iv, j - 1)["e"] + 1).alias("s"),
                    F.when(j == F.size(iv), n)
                    .otherwise(F.get(iv, j)["s"] - 1).alias("e"),
                ),
            ),
            lambda g: g["s"] <= g["e"],
        )
        return F.flatten(
            F.transform(gaps, lambda g: F.slice(t, g["s"], g["e"] - g["s"] + 1))
        )

    # both the token array AND the merged-interval array are bound as
    # lambda-variable struct fields: referenced as plain columns, the
    # interval aggregate would be re-inlined per gap index by
    # CollapseProject (the same trap as the tokenizer).
    keep = F.element_at(
        F.transform(
            F.array(F.struct(F.col("_t").alias("t"), merged.alias("iv"))),
            lambda s: _kept(s["t"], s["iv"]),
        ),
        1,
    )
    return (
        base.join(hits, id_col, "left")
        .withColumn("_starts", F.coalesce("_starts", F.array().cast("array<int>")))
        .select(
            id_col,
            F.col("_n").cast("int").alias("n_tokens"),
            (F.col("_n") - F.size(keep)).cast("int").alias("n_removed"),
            F.array_join(keep, " ").alias("scrubbed_text"),
        )
    )


def dsir_score(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    top_n: int | None = None,
    target_within_corpus: bool = False,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every corpus document by how target-like its hashed
    bag-of-words is, and optionally keep the top slice — the standard
    "make 100 TB of crawl look like the curated target" selection
    stage.

    The paper's importance weight is the likelihood ratio of two
    hashed-n-gram models. We keep the ratio in EXACT fixed-point
    integer arithmetic (no logs — log is not correctly-rounded IEEE,
    so cross-engine bit-equality would be luck): per token with hashed
    bucket b,
        ratio_e6(b) = floor(1e6 * (t_b+1) * Dr / ((r_b+1) * Dt))
    (Laplace-smoothed target/raw unigram models over md5-derived
    portable buckets; Dr/Dt = total tokens + n_buckets), and per doc
        score_e6 = floor(mean of its tokens' ratio_e6)
    — the linearized (arithmetic-mean) form of the paper's per-token
    geometric mean, monotone in target-likeness and replayable by any
    engine with md5 + big-integer division.

    Plan at scale: both models are ONE map-side-combined agg each,
    output bounded by n_buckets; the totals row and the n_buckets-row
    ratio table broadcast onto the token stream (no shuffle of text);
    per-doc scoring is one map-side-combinable agg on id_col; top_n
    selection is TakeOrderedAndProject (distributed heap, never a
    global sort). Raw-model counts come from `corpus` itself; `target`
    is any DataFrame with text_col (typically a curated subset or an
    external high-quality corpus).

    Output: (id_col, n_tokens, score_e6), zero-token documents
    excluded; with top_n, the top_n rows by (score_e6 DESC, id ASC).
    """
    from kafka_streams_app_spark.functions.text import tokens

    raw_occ = ensure_parallelism(corpus).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    ).withColumn("_b", portable_bucket(F.col("_tok"), n_buckets))
    # (doc, bucket) pair table, checkpointed: the raw corpus feeds BOTH
    # the raw model (an EAGER driver collect below) and the per-doc
    # scoring aggregate — without materialization the corpus is
    # tokenized + md5-bucketed twice per invocation. The pair table
    # (<= docs x min(tokens, n_buckets) rows of three ints, map-side
    # combined before its one shuffle) is strictly smaller than the
    # token stream it replaces, and both consumers read it instead of
    # re-scanning text. Recomputed fresh per invocation.
    # LAZY checkpoint (r16): the model collect below is the first
    # action and materializes the blocks as part of its own job, so an
    # eager=True here only added a separate scan+shuffle job plus a
    # block read-back before the collect could start (measured: the
    # sf0.001 fixed floor is ~87% of the sf0.1 wall — job count IS the
    # cost at bench scale). Both consumers (the collect and the
    # returned scoring plan) still read the one materialization.
    pairs = (
        raw_occ.groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .localCheckpoint(eager=False)
    )
    rc = pairs.groupBy("_b").agg(F.sum("_cnt").alias("_rc"))
    if target_within_corpus:
        # Caller asserts target's rows are a SUBSET of corpus's rows on
        # id_col with identical text (the "curated slice of the same
        # lake" DSIR shape, e.g. lang='en' docs). Then the target model
        # is a partial sum of the pair table — sum(_cnt) over the
        # target ids per bucket is term-for-term the occurrence count
        # the tokenize pass would produce (exact ints) — and the
        # target's TEXT is never read or tokenized a second time: the
        # join needs only its id column (a pruned metadata scan; at
        # 100 TB that skips a full decode+tokenize of the slice, here
        # measured ~0.5 s of the 2.0 s query at sf0.1).
        tc = (
            pairs.join(target.select(F.col(id_col)), id_col)
            .groupBy("_b")
            .agg(F.sum("_cnt").alias("_tc"))
        )
    else:
        tgt_occ = target.select(
            F.explode(tokens(F.col(text_col))).alias("_tok")
        ).select(portable_bucket(F.col("_tok"), n_buckets).alias("_b"))
        tc = tgt_occ.groupBy("_b").agg(F.count(F.lit(1)).alias("_tc"))
    model = (
        rc.join(tc, "_b", "full_outer")
        .select(
            "_b",
            F.coalesce("_rc", F.lit(0)).alias("_rc"),
            F.coalesce("_tc", F.lit(0)).alias("_tc"),
        )
    )
    # The ratio table is only n_buckets rows, so compute it on the
    # driver in Python bigints: the numerator (tc+1)*dr*1e6 can exceed
    # decimal(38,0)'s 38 digits at very large corpora, where Spark's
    # non-ANSI decimal multiply silently returns NULL — Python ints
    # are unbounded, so the floor-div is exact at any corpus size.
    # Driver traffic stays n_buckets-bounded (the 100 TB invariant:
    # models never scale with the data, only with n_buckets).
    model_rows = model.collect()
    dr = sum(r["_rc"] for r in model_rows) + n_buckets
    dt = sum(r["_tc"] for r in model_rows) + n_buckets
    ratio = corpus.sparkSession.createDataFrame(
        [
            (r["_b"], (r["_tc"] + 1) * dr * 1_000_000 // ((r["_rc"] + 1) * dt))
            for r in model_rows
        ],
        "_b long, _ratio_e6 long",
    )
    # weighted form over the pair table: sum(ratio * cnt) == the
    # per-occurrence sum term-for-term (exact integer arithmetic in
    # DECIMAL(38,0)), and sum(cnt) == count(1) over occurrences, so
    # the floor-div and the LONG cast produce identical values
    scored = (
        pairs.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("n_tokens"),
            F.expr(
                "CAST(sum(CAST(_ratio_e6 AS DECIMAL(38,0)) * _cnt)"
                " div sum(_cnt) AS LONG)"
            ).alias("score_e6"),
        )
    )
    if top_n is not None:
        scored = scored.orderBy(
            F.col("score_e6").desc(), F.col(id_col)
        ).limit(top_n)
    return scored


def stratified_fixed_k(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic EXACT-k sample per stratum — the fixed-budget
    companion to stratified_sample's rate-based draw ("exactly 10k
    docs per source for the eval slice", not "~0.1% of each").

    Order within a stratum is the md5 of (seed, id): a pure function
    of the id, so the selected set is stable across runs, cluster
    sizes, partitionings, AND corpus growth restricted to new ids (an
    id's rank only changes if ids hashing below it arrive — the same
    monotonicity argument as hash_split). Ties on the 60-bit hash are
    broken by the id itself, so selection is a total order even under
    hash collisions.

    Plan: one shuffle on the stratum, in-partition rank, filter —
    identical shape to extras_topn_per_group; a stratum's rows must
    meet to be ranked, there is no cheaper exact form. Skewed strata
    ride the same partition; at 100 TB pre-aggregate obvious
    non-candidates away first (e.g. a cheap quality floor) or accept
    the documented rate-based draw where exactness isn't required.

    Output: the selected rows (all original columns), plus their
    sample_rank (1..k within the stratum).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
            1, 15,
        ), 16, 10,
    ).cast("long")
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def softdedup_weights(
    df: DataFrame,
    text: str,
    id_col: str,
    k: int = 3,
    alpha: int = 4,
) -> DataFrame:
    """SoftDeDup (He et al. 2024, arXiv:2401.00830): instead of DROPPING
    near-duplicates, down-weight documents by their "data commonness" so
    a training sampler sees duplicated content proportionally less. The
    hard dedup family (dedup_exact / dedup_minhash_lsh) is the remove
    dial; this is the reweight dial — no document is lost, which the
    paper shows preserves tail knowledge that hard dedup deletes.

    Commonness here is the fraction of the document's DISTINCT k-token
    shingles that occur in >= 2 documents corpus-wide (the exact-integer
    reformulation of the paper's n-gram-probability commonness: a
    shingle seen elsewhere is "common"; dup_ratio = dup_shingles / n).
    The sampling weight is the exact integer

        weight_ppm = floor(1e6 * n / (n + alpha * dup))

    i.e. 1e6/(1 + alpha*dup_ratio) in ppm fixed point: 1_000_000 for a
    fully novel document, monotonically down to 1e6/(1+alpha) for a
    fully duplicated one. alpha is the sharpness dial. All-integer ->
    bit-identical on any engine (no float division in the contract).

    Plan (inverted-index shape, the same skeleton as dedup_ngram_jaccard
    but WITHOUT the quadratic pair join — cost is linear in postings):
    explode distinct shingles -> groupBy(shingle) agg(df, min(doc)) ->
    keep df==1 rows (whose min(doc) IS the owning doc) -> groupBy(doc)
    count = unique shingles -> dup = n - unique, with n = size of the
    doc's distinct-shingle array (map-side, no explode). One exchange
    carries the postings, the second only the globally-unique-shingle
    rows; the r14 form instead joined the df table back onto the full
    posting list and re-aggregated every posting by doc (two
    full-posting exchanges + a shuffle join — the r15 rewrite is
    integer-identical and shuffles strictly fewer bytes). At 100 TB
    both aggregates are map-side combined; no all-pairs stage exists
    at any scale.

    Docs with zero shingles (shorter than k tokens) are weight 1e6 by
    definition (nothing to be common). Output: id_col, n_shingles,
    dup_shingles, weight_ppm.
    """
    src = ensure_parallelism(df)
    # localCheckpoint the per-doc DISTINCT shingle arrays: they feed
    # both the df counter and the per-doc join side, and without
    # materialization each subtree re-runs the Arrow shingle UDF over
    # the corpus (2 tokenize passes in the physical plan). The
    # materialized rows are (id, shingle array) — the same inverted-
    # index payload the shuffle already carries — and the id-only left
    # branch below reads ids from the checkpoint instead of a third
    # scan. Recomputed fresh per invocation (no cross-run reuse).
    # EAGER, deliberately (r16 A/B): lazy materialization was tried
    # (merge the checkpoint into the caller's job) and measured WORSE
    # (1.06 -> 1.22 s at sf0.1) — this operator's two consumers are
    # roots of INDEPENDENT stages that run concurrently, so the lazy
    # cache races and the Arrow shingle UDF computes twice in parallel.
    # dsir/semdedup (where an in-call action or dependent stages
    # serialize the first materialization) keep the lazy form.
    sh_tbl = src.select(
        F.col(id_col).alias("_id"),
        shingles_udf(k)(F.col(text)).alias("_sha"),
    ).localCheckpoint(eager=True)
    ex = sh_tbl.select("_id", F.explode("_sha").alias("_s"))
    # dup_shingles = n - (# of the doc's shingles that are globally
    # unique). A df==1 shingle has exactly one posting, so min(_id) in
    # the per-shingle aggregate IS its owning doc: one exchange over
    # the postings (by shingle), then a second exchange over ONLY the
    # unique-shingle rows (by doc). The previous shape joined the df
    # table back onto the full posting list and re-aggregated every
    # posting by doc — two full-posting exchanges + a shuffle join.
    # n_shingles itself never needs the explode: _sha is distinct by
    # shingles_udf's contract, so size(_sha) is exact and map-side.
    uniq_per_doc = (
        ex.groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_df"), F.min("_id").alias("_owner"))
        .filter(F.col("_df") == 1)
        .groupBy(F.col("_owner").alias("_id"))
        .agg(F.count(F.lit(1)).alias("_uniq"))
    )
    per_doc = sh_tbl.select(
        "_id", F.size("_sha").cast("long").alias("n_shingles")
    ).join(uniq_per_doc, "_id", "left").select(
        "_id",
        "n_shingles",
        (F.col("n_shingles") - F.coalesce("_uniq", F.lit(0))).alias(
            "dup_shingles"
        ),
    )
    out = per_doc.select(
        F.col("_id").alias(id_col),
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        F.coalesce("dup_shingles", F.lit(0)).cast("long").alias("dup_shingles"),
        F.when(
            F.coalesce("n_shingles", F.lit(0)) == 0, F.lit(1_000_000)
        )
        .otherwise(
            # exact bigint floor division (`div`), never `/` (double)
            F.expr(
                "(CAST(1000000 AS BIGINT) * n_shingles) div "
                f"(n_shingles + {int(alpha)} * dup_shingles)"
            )
        )
        .cast("long")
        .alias("weight_ppm"),
    )
    return out


def weighted_sample(
    df: DataFrame,
    weight_ppm_col: str,
    id_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic Bernoulli sample with PER-ROW keep probability
    weight_ppm/1e6 — the sampler half of the SoftDeDup contract
    (softdedup_weights produces the weights; this draws by them).

    keep iff md5-bucket(salt|id) mod 1e6 < weight_ppm: a pure function
    of (salt, id, weight), so the draw is reproducible and auditable by
    any md5-capable engine, stable under repartitioning, and
    INDEPENDENT of every other sampler in the pipeline (the salt
    namespaces this draw away from stratified_sample/sample_fixed_k's
    hash of the same ids). weight_ppm = 1_000_000 keeps the row always
    — novel documents are never lost, which is SoftDeDup's point.

    Zero shuffle: the test is a scan-stage filter expression.
    """
    bucket = portable_bucket(
        F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")), 1_000_000
    )
    return df.filter(bucket < F.col(weight_ppm_col))


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass data-quality PROFILE of a table: per column, the null
    count, the exact distinct count, and the total rendered length —
    the sanity dashboard every ingestion run prints before a corpus is
    allowed into training (null spikes, cardinality collapses, and
    truncated-text regressions all show up here first).

    Plan: ONE aggregate over one scan — the multi-column
    count_distinct set compiles to a single Expand + hash aggregate
    (each input row fans out once per distinct-column, the standard
    Spark multi-distinct shape), so the table is read exactly once and
    nothing but the 3*len(cols) scalar results reaches the driver. The
    wide scalar row is then unpivoted to (col_name, n_nulls,
    n_distinct, sum_len) rows by an explode over literal structs —
    driver-free, engine-portable.

    At 100 TB the exact multi-distinct's Expand multiplies the shuffle
    by len(cols); profile runs that can tolerate ~2% error swap
    count_distinct for approx_count_distinct (Spark's HLL++) or the
    repo's own sketches.hll_distinct per column — the documented dial;
    null/length sums are plain map-side-combined aggregates either
    way. All-integer output: no cross-engine float risk.

    Output: col_name, n_nulls, n_distinct, sum_len (length of the
    string rendering; ints render identically on both engines).
    """
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"_nd_{c}"),
            F.coalesce(F.sum(F.length(F.col(c).cast("string"))), F.lit(0))
            .cast("long")
            .alias(f"_sl_{c}"),
        ]
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_sl_{c}").alias("sum_len"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")
