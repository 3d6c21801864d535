"""Stateless record transforms (SURVEY.md §2.2, T1-T5 + free extras).

Reference semantics:
- flatMapValues: 1 record -> N records
  (/root/reference/src/main/java/com/ayoubom/kafka/LineSplit.java:48,
   /root/reference/src/main/java/com/ayoubom/kafka/WordCount.java:54)
- mapValues: per-record value transform
  (/root/reference/src/test/scala/com/ayoubom/kafka/TopologiesTest.scala:43)
- selectKey: re-key a stream
  (/root/reference/src/main/scala/com/ayoubom/kafka/apps/WindowedGrouping.scala:47)
- groupBy(mapper)/groupByKey: re-key + group
  (/root/reference/src/main/java/com/ayoubom/kafka/WordCount.java:55)

All are pure Column expressions — whole-stage-codegen'd JVM-side, no
Python in the hot path. At scale the only cost is the shuffle implied by a
re-key, exactly like the reference's repartition topic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Matches Java's \W on ASCII (reference splits on "\\W+").
WORD_SPLIT_RE = r"\W+"


def flat_map_values_split(
    df: DataFrame, text_col: str, out_col: str = "word", lowercase: bool = True
) -> DataFrame:
    """LineSplit/WordCount's flatMapValues: line -> words on \\W+.

    DELIBERATE DEVIATION from Java split semantics: Java's
    ``"!x".split("\\\\W+")`` keeps a leading empty token (so the reference
    WordCount counts an "" word for punctuation-leading lines); we drop ALL
    empty tokens. The cleaned behavior is what every downstream consumer
    wants, and the oracle SQL applies the same filter, so the two engines
    agree. Pinned by tests/test_stateless.py::test_wordcount_punct_leading.
    """
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = F.explode(F.split(col, WORD_SPLIT_RE)).alias(out_col)
    other = [c for c in df.columns if c != text_col]
    return df.select(*other, words).filter(F.col(out_col) != "")


def map_values(df: DataFrame, **exprs: Column) -> DataFrame:
    """mapValues: add/replace value columns, key columns untouched."""
    out = df
    for name, col in exprs.items():
        out = out.withColumn(name, col)
    return out


def select_key(df: DataFrame, key_expr: Column, key_name: str = "key") -> DataFrame:
    """selectKey: derive a new key column (downstream groupBy shuffles on it)."""
    return df.withColumn(key_name, key_expr)


def branch(df: DataFrame, *predicates: Column) -> list[DataFrame]:
    """KStream#split/branch: one output per predicate (first match wins)."""
    out, remaining = [], F.lit(True)
    for p in predicates:
        out.append(df.filter(remaining & p))
        remaining = remaining & ~p
    return out


def merge(*dfs: DataFrame) -> DataFrame:
    """KStream#merge: unordered union by name."""
    it = iter(dfs)
    acc = next(it)
    for d in it:
        acc = acc.unionByName(d)
    return acc


def group_by(df: DataFrame, keys: Sequence[str]):
    """groupBy/groupByKey — the shuffle IS the repartition topic."""
    return df.groupBy(*[F.col(k) for k in keys])
