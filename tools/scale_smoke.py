"""Scale smoke: measure how the heavy operators scale when the corpus
grows 10x (sf0.1 -> ~sf1, the largest dataset this box holds comfortably).

Usage: python tools/scale_smoke.py [multiplier]
       python tools/scale_smoke.py longdoc   # chunk_documents doc-length pin
       python tools/scale_smoke.py decontam  # NLJ-vs-Aho-Corasick crossover

Builds a ~sf1 dataset in .scratch/ by unioning sf0.1 `multiplier` times
with content made DISJOINT across replicas:
- documents: ids shifted AND every token prefixed with a replica tag
  (via tokens->transform->rejoin), so replicas share no shingles —
  otherwise each doc would gain (multiplier-1) near-duplicates and the
  dedup pair count would grow quadratically instead of linearly, which
  would measure the data construction, not the engine.
- events / lineitem / embeddings: key columns shifted per replica;
  value distributions untouched (aggregation group counts stay fixed,
  rows per group grow linearly — the pure scan/shuffle scaling shape).

Prints one JSON line per query: seconds at sf0.1, seconds at the
multiplied scale, and the time ratio. A scan-bound operator should show
ratio ~= multiplier x (single-pass), sublinear where fixed overheads
(session, Python UDF spin-up, stage scheduling) dominate at sf0.1;
a super-multiplier ratio flags a quadratic term — the regression this
tool exists to catch.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from kafka_streams_app_spark.engine import get_spark
from kafka_streams_app_spark.sources.catalog import load_table

from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
SCRATCH = Path("/root/repo/.scratch/scale_smoke")

QUERIES = [
    "t1_wordcount",          # explode + agg over documents
    "text_pii_scrub",        # pure regex scan
    "pack_sequences",        # per-stratum window prefix sum
    "a2_windowed_count",     # window bucketing + agg over events
    "tpch_q1_pricing",       # decimal scan-agg over lineitem
    "dedup_minhash_lsh",     # the heaviest: shingle+sig+band join+verify
    "dedup_containment",     # inverted-index self-join, directed ratios
    "corpus_line_dedup",     # chunk-line explode + hash agg (r6 op)
    "text_gopher_repetition",  # scan-stage list exprs, zero shuffle
    "embedding_dim_stats",   # posexplode + per-dim agg over embeddings
    "corpus_chunk",          # split+sequence+explode, scan stage (r7 op)
]

ID_SHIFT = 1_000_000_000


def build(spark, mult: int) -> str:
    out = SCRATCH / f"x{mult}"
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    docs = load_table(spark, BASE, "documents")
    reps = []
    for i in range(mult):
        tag = F.lit(f"r{i}")
        toks = F.filter(F.split(F.col("text"), r"\W+"), lambda t: t != "")
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * ID_SHIFT)).alias("doc_id"),
                F.array_join(
                    F.transform(toks, lambda t: F.concat(tag, t)), " "
                ).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    _union_all(reps).write.parquet(str(out / "documents.parquet"))

    ev = spark.read.parquet(f"{BASE}/events.parquet")  # keep raw nanos ts
    _union_all([
        ev.select(
            (F.col("event_id") + F.lit(i * ID_SHIFT)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
            "event_type", "value", "props",
        )
        for i in range(mult)
    ]).write.parquet(str(out / "events.parquet"))

    li = load_table(spark, BASE, "lineitem")
    _union_all([
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * ID_SHIFT))
        for i in range(mult)
    ]).write.parquet(str(out / "lineitem.parquet"))

    em = load_table(spark, BASE, "embeddings")
    _union_all([
        em.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        for i in range(mult)
    ]).write.parquet(str(out / "embeddings.parquet"))

    # small dims: symlink-equivalent copy so load_table finds them
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        shutil.copy(f"{BASE}/{t}.parquet", out / f"{t}.parquet")
    return str(out)


def _union_all(dfs):
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def timed(fn, *args) -> float:
    t0 = time.monotonic()
    fn(*args).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def _ann_fixed_queries(spark, sf_dir):
    """lsh_ann_topk with the query set PINNED to the base replica
    (vec_id < ID_SHIFT): the contract entry's `vec_id % 100 == 0` set
    grows with the corpus, which would measure queries x corpus
    (quadratic by construction) instead of corpus scaling."""
    from kafka_streams_app_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 1_000_000)
    )
    return similarity.lsh_ann_topk(
        emb, queries_df, "vec_id", "embedding", dim=64, k=10, plane_fn="md5"
    )


def _chunk_explode_first(df, max_tokens=64, overlap=8):
    """The REJECTED pre-r9 chunk_documents plan, kept here as the
    measured baseline: explode chunk ids first, slice the full token
    array after — each chunk row carries `_toks`, so per-doc row
    materialization is O(n_tokens^2/stride). The shipped form builds
    chunk structs before the explode (operators/pipeline.py
    chunk_documents docstring has the full story)."""
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"),
        lambda t: t != "",
    )
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(stride))
    ).cast("int")
    base = df.select(F.col("doc_id"), toks.alias("_toks"), n_chunks.alias("_nc"))
    chunk = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        "_toks",
    )
    window = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, max_tokens)
    return chunk.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(window).cast("long").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def longdoc_main() -> None:
    """Doc-LENGTH scaling pin for chunk_documents (r7 verdict #5):
    64 docs x 10k tokens vs 64 docs x 100k tokens — 10x the tokens
    should cost ~10x the wall (linear), not ~100x (the explode-first
    quadratic). Prints one JSON line per form."""
    from kafka_streams_app_spark.operators.pipeline import chunk_documents

    spark = get_spark(app_name="scale-smoke-longdoc")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {}
    for n_toks in (10_000, 100_000):
        out = SCRATCH / f"longdoc_{n_toks}"
        if not out.exists():
            spark.range(64).select(
                F.col("id").alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(n_toks - 1)),
                        lambda i: F.concat(F.lit("w"), i.cast("string")),
                    ),
                    " ",
                ).alias("text"),
            ).repartition(32).write.parquet(str(out))
        dirs[n_toks] = str(out)
    for label, fn in (
        ("chunk_documents[shipped struct-first]", chunk_documents),
        ("chunk_documents[rejected explode-first]", _chunk_explode_first),
    ):
        runs = {}
        for n_toks, d in dirs.items():
            df = spark.read.parquet(d)
            timed(lambda df=df: fn(df), )  # warm (session/codegen)
            runs[n_toks] = timed(lambda df=df: fn(df))
        print(json.dumps({
            "query": label, "docs": 64,
            "sec_10k_tok": runs[10_000], "sec_100k_tok": runs[100_000],
            "ratio_for_10x_tokens": round(runs[100_000] / runs[10_000], 2)
            if runs[10_000] else None,
        }))


def decontam_main() -> None:
    """Span-count crossover for exact decontamination (r7 verdict #7):
    the broadcast-NLJ form is O(docs x spans) JVM work; the
    Aho-Corasick form is O(docs x doc_len) Python work independent of
    span count. Measures both at sf0.1 over growing span sets; the
    SCALE.md row records where AC overtakes NLJ."""
    from kafka_streams_app_spark.operators.pipeline import (
        decontaminate_exact,
        decontaminate_exact_ac,
    )

    spark = get_spark(app_name="scale-smoke-decontam")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, BASE, "documents")
    n_docs = docs.count()
    for modulus in (50, 5, 1):
        spans = docs.filter(
            (F.col("doc_id") % modulus == 0) & (F.length("text") >= 60)
        ).select(
            F.col("doc_id").alias("span_id"),
            F.substring("text", 11, 40).alias("span"),
        )
        n_spans = spans.count()
        res = {}
        for label, fn in (("nlj", decontaminate_exact),
                          ("ac", decontaminate_exact_ac)):
            timed(lambda: fn(docs, spans))  # warm
            res[label] = timed(lambda: fn(docs, spans))
        print(json.dumps({
            "query": "decontam_exact[nlj vs ac]", "n_docs": n_docs,
            "n_spans": n_spans, "sec_nlj": res["nlj"], "sec_ac": res["ac"],
            "winner": "ac" if res["ac"] < res["nlj"] else "nlj",
        }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "longdoc":
        longdoc_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "decontam":
        decontam_main()
        return
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    big_dir = build(spark, mult)
    queries = entry_mod.queries()
    runners = [(n, queries[n]) for n in QUERIES]
    runners.append(("sim_lsh_ann_topk[fixed 50-query set]", _ann_fixed_queries))
    for name, fn in runners:
        fn(spark, BASE).write.format("noop").mode("overwrite").save()  # warm
        base_s = timed(fn, spark, BASE)
        big_s = timed(fn, spark, big_dir)
        print(json.dumps({
            "query": name, "mult": mult, "sec_sf01": base_s,
            "sec_big": big_s,
            "ratio": round(big_s / base_s, 2) if base_s else None,
        }))


if __name__ == "__main__":
    main()
