"""Randomized property pins for the round-3 operators: bulk seeded
cases in one Spark evaluation, cross-checked against pure-Python
references (union-find for clustering, bit arithmetic for the
md5-portable simhash, the rolling-hash winnowing reference)."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from kafka_streams_app_spark.functions.text import (
    token_hashes,
    tokens,
    winnowing_of_hashes,
)
from kafka_streams_app_spark.operators.dedup import dedup_clusters, simhash

P = (1 << 31) - 1


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dedup_clusters_random_graphs_vs_union_find(spark):
    """Random sparse graphs over 300 nodes: min-label propagation must
    equal a textbook union-find's min-element-per-component."""
    rng = random.Random(11)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(180)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for x in range(n):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    expected = {x: comp_min[find(x)] for x in range(n)}

    docs = spark.createDataFrame([(i, "t") for i in range(n)], "doc_id long, text string")
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, "text", "doc_id", pairs=pairs).collect()
    }
    assert got == expected


def _tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"\W+", text.lower()) if t]


def simhash60_reference(text: str) -> int:
    votes = [0] * 60
    for t in _tokens(text):
        h = _h60(t)
        for i in range(60):
            votes[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(60):
        if votes[i] > 0:
            out |= 1 << i
    return out


def test_simhash_md5_matches_python_reference(spark):
    rng = random.Random(23)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "Theta"]
    rows = [
        (i, " ".join(rng.choices(words, k=rng.randint(1, 30))))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["_id"]: r["simhash"] for r in simhash(df, "text", "doc_id", hash_fn="md5").collect()}
    for doc_id, text in rows:
        assert got[doc_id] == simhash60_reference(text), doc_id


def winnowing_reference(text: str, k: int = 5, window: int = 4) -> set[int]:
    hs = [_h60(t) % P for t in _tokens(text)]
    grams = []
    for i in range(len(hs) - k + 1):
        acc = 0
        for h in hs[i:i + k]:
            acc = (acc * 31 + h) % P
        grams.append(acc)
    if len(grams) < window:
        return set()
    return {min(grams[i:i + window]) for i in range(len(grams) - window + 1)}


def test_winnowing_md5_matches_python_reference(spark):
    rng = random.Random(31)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "sed", "unde", "omnis"]
    rows = [
        (i, " ".join(rng.choices(words, k=rng.randint(0, 40))))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        df.select("doc_id", tokens("text").alias("_t"))
        .select("doc_id", token_hashes(F.col("_t"), hash_fn="md5").alias("_h"))
        .select("doc_id", F.size(winnowing_of_hashes(F.col("_h"))).alias("n"))
    )
    got = {r["doc_id"]: r["n"] for r in out.collect()}
    for doc_id, text in rows:
        assert got[doc_id] == len(winnowing_reference(text)), doc_id
