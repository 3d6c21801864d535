"""Boundary pin for the r15 linear interval merge in
scrub_duplicated_spans (pipeline.py): runs of covered starts merge
exactly when consecutive sorted starts differ by <= k (adjacent
coverage unions identically to overlapping), and split at k+1. The r15
rewrite replaced the O(m^2) accumulator fold with a boundary
filter + zip_with; these docs pin the merge/split boundary the two
forms must agree on.

Construction (k=8): R1 and R2 are disjoint 8-token runs, both
duplicated cross-doc (present in doc B too, separated there by unique
filler so no straddle window duplicates).

- doc A  = R1 ++ R2        -> covered starts {1, 9}, gap 8 == k
  -> ONE merged interval [1,16] -> the whole text is removed.
- doc A2 = R1 ++ [g] ++ R2 -> covered starts {1, 10}, gap 9 == k+1
  -> intervals [1,8] and [10,17] -> exactly the middle token survives.
"""

from __future__ import annotations

from kafka_streams_app_spark.operators import pipeline

K = 8
R1 = [f"r{i}" for i in range(K)]
R2 = [f"s{i}" for i in range(K)]


def _scrub(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["scrubbed_text"])
        for r in pipeline.scrub_duplicated_spans(
            df, "text", "doc_id", k=K, min_df=2
        ).collect()
    }


def test_adjacent_runs_gap_k_merge_to_full_removal(spark):
    a = " ".join(R1 + R2)
    b = " ".join(R1 + [f"x{i}" for i in range(K)] + R2)
    got = _scrub(spark, [(1, a), (2, b)])
    # doc 1: starts {1, 9}; 9 <= 8 + 1 merges -> [1, 16] covers all
    assert got[1] == (16, 16, "")


def test_runs_gap_k_plus_1_split_keep_middle_token(spark):
    a2 = " ".join(R1 + ["gap"] + R2)
    b = " ".join(R1 + [f"x{i}" for i in range(K)] + R2)
    got = _scrub(spark, [(1, a2), (2, b)])
    # doc 1: starts {1, 10}; 10 > 8 + 1 splits -> [1,8], [10,17];
    # only token 9 ("gap") survives
    assert got[1] == (17, 16, "gap")
