"""Executed-plan hygiene for the r6 operators: the scan-stage ops must
stay entirely JVM-side (zero Python operators, zero shuffles), the
corpus-level ops must shuffle exactly once with a map-side partial
aggregate, and nothing anywhere may fall to row-at-a-time Python."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_app_spark.functions import text as T
from kafka_streams_app_spark.operators import pipeline
from kafka_streams_app_spark.operators.similarity import embedding_dim_stats
from kafka_streams_app_spark.plans import plan_report

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_repetition_signals_scan_stage_only(spark):
    r = plan_report(
        _docs(spark).select("doc_id", T.repetition_signals("text").alias("r"))
    )
    assert r["exchanges"] == 0 and r["python_evals"] == 0
    assert r["rowwise_python"] == 0
    assert r["codegen_stages"] >= 1


def test_winnowing_column_form_is_jvm_only(spark):
    """The r6 contract entry's winnowing plan: pure Column, no Python
    workers, no shuffle — the property the entry switch bought."""
    out = _docs(spark).select(
        "doc_id",
        F.size(
            T.winnowing_of_hashes(
                T.token_hashes(T.tokens(F.col("text")), hash_fn="md5")
            )
        ).alias("n"),
    )
    r = plan_report(out)
    assert r["exchanges"] == 0 and r["python_evals"] == 0
    assert r["rowwise_python"] == 0


def test_boilerplate_lines_single_shuffle_partial_agg(spark):
    out = pipeline.boilerplate_lines(_docs(spark), min_df=2, min_len=5)
    r = plan_report(out)
    assert r["python_evals"] == 0 and r["rowwise_python"] == 0
    # one exchange for the line-keyed agg; the HAVING filter rides it
    assert r["exchanges"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    # partial aggregation BEFORE the exchange (map-side combine)
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_embedding_dim_stats_single_shuffle(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    r = plan_report(embedding_dim_stats(emb, "embedding"))
    assert r["exchanges"] == 1
    assert r["python_evals"] == 0 and r["rowwise_python"] == 0


def test_containment_no_rowwise_python(spark):
    from kafka_streams_app_spark.operators.dedup import dedup_containment

    r = plan_report(dedup_containment(_docs(spark), "text", "doc_id", k=3))
    assert r["rowwise_python"] == 0
    # shingling is the sanctioned Arrow boundary; everything after is JVM
    assert r["python_evals"] >= 1
    assert r["shuffle_joins"] + r["broadcast_joins"] >= 1


def test_chunk_documents_scan_stage_only(spark):
    """r7 corpus_chunk: split + sequence + explode must all live in the
    scan stage — zero shuffle, zero Python (the claim the operator's
    docstring makes)."""
    r = plan_report(pipeline.chunk_documents(_docs(spark)))
    assert r["exchanges"] == 0 and r["python_evals"] == 0
    assert r["rowwise_python"] == 0


def test_tfidf_topk_no_rowwise_python_and_broadcast_n(spark):
    """r7 text_tfidf_topk: pure JVM plan — the corpus-size side joins
    as a broadcast, no Python anywhere."""
    r = plan_report(pipeline.tfidf_topk(_docs(spark)))
    assert r["python_evals"] == 0 and r["rowwise_python"] == 0
    assert r["broadcast_joins"] >= 1


def test_decontaminate_exact_broadcasts_spans(spark):
    """r7 decontam_exact: span side must broadcast (nested-loop, no
    shuffle of document text), no Python anywhere."""
    spans = _docs(spark).limit(5).select(
        F.col("doc_id").alias("span_id"),
        F.substring("text", 1, 20).alias("span"),
    )
    r = plan_report(pipeline.decontaminate_exact(_docs(spark), spans))
    assert r["python_evals"] == 0 and r["rowwise_python"] == 0


def test_bigram_lm_likelihood_jvm_only_broadcast_vocab(spark):
    """r9 text_lm_likelihood: pure JVM plan — the one-row vocab-size
    side joins as a broadcast, model joins are equi-joins, no Python
    anywhere, and the bigram-count aggs combine map-side."""
    out = pipeline.bigram_lm_likelihood(_docs(spark))
    r = plan_report(out)
    assert r["python_evals"] == 0 and r["rowwise_python"] == 0
    assert r["broadcast_joins"] >= 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_decontaminate_exact_ac_single_arrow_crossing(spark):
    """r9 decontam_exact_ac: exactly one Arrow mapInPandas crossing
    (the automaton scan), nothing row-wise, and no shuffle of document
    text BEFORE the crossing (the matcher reads scan output directly)."""
    spans = _docs(spark).limit(5).select(
        F.col("doc_id").alias("span_id"),
        F.substring("text", 1, 20).alias("span"),
    )
    out = pipeline.decontaminate_exact_ac(_docs(spark), spans)
    r = plan_report(out)
    assert r["python_evals"] == 1
    assert r["rowwise_python"] == 0


def test_embedding_lsh_inline_verify_join_shape(spark):
    """r9 inline-verify: with auto planes the whole LSH dedup is ONE
    join (the bucket self-join — cosine computed where the vectors are
    born, dedup only on threshold survivors); the fixed-planes
    ids-first form pays that join PLUS two vector re-attach joins.
    Nothing row-wise in either plan."""
    from kafka_streams_app_spark.operators import dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    inline = dedup.dedup_embedding_cosine(
        emb, "vec_id", "embedding", threshold=0.35, method="lsh", dim=64,
        n_planes="auto",
    )
    r = plan_report(inline)
    assert r["shuffle_joins"] + r["broadcast_joins"] == 1
    assert r["rowwise_python"] == 0
    ids_first = dedup.dedup_embedding_cosine(
        emb, "vec_id", "embedding", threshold=0.35, method="lsh", dim=64,
        n_planes=6,
    )
    r2 = plan_report(ids_first)
    assert r2["shuffle_joins"] + r2["broadcast_joins"] == 3
    assert r2["rowwise_python"] == 0


def test_mix_sources_scan_stage_only(spark):
    """r10 mix_sources: weights live in literal CASE expressions and
    replicas in one bounded explode(sequence) — zero Python, zero
    shuffle; the whole mixture is a single scan-stage pass."""
    out = pipeline.mix_sources(
        _docs(spark), "source", {"src0": 2.0, "src1": 0.5}, "doc_id"
    )
    r = plan_report(out)
    assert r["python_evals"] == 0 and r["rowwise_python"] == 0
    assert r["exchanges"] == 0


def test_dedup_cross_corpus_arrow_probe_no_rowwise(spark):
    """r10 dedup_cross_corpus: the bloom membership probe is the only
    Python in the plan and it is Arrow-batched (<=2 ArrowEvalPython —
    the probe column feeds both union branches); the exact anti-join
    runs only on the HIT branch; nothing row-wise anywhere."""
    from kafka_streams_app_spark.operators import dedup

    docs = _docs(spark)
    out = dedup.dedup_cross_corpus(
        docs.filter(F.col("doc_id") % 10 >= 2),
        docs.filter(F.col("doc_id") % 10 < 3),
        "text",
    )
    r = plan_report(out)
    assert r["rowwise_python"] == 0
    assert 1 <= r["python_evals"] <= 2
