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
