"""Text-analysis column functions (BASELINE.json north-star: text analysis).

All pure Column expressions (JVM-side, codegen'd) — no Python UDFs, so
these run at scan speed over 100 TB of documents. Tokenization matches
the reference's word-split convention (lower + \\W+ —
/root/reference/src/main/java/com/ayoubom/kafka/WordCount.java:54).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_SPLIT_RE = r"\W+"

# Tiny embedded stopword lists for the n-gram/stopword language heuristic.
# Deterministic and oracle-expressible; not a production lang-id model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "ich"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "que", "de", "los", "una", "por", "con"],
}


def tokens(text: str | Column, lowercase: bool = True) -> Column:
    """Non-empty \\W+ tokens."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, WORD_SPLIT_RE), lambda t: t != "")


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def stopword_score(toks: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of `lang`."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def language_id(text: str | Column) -> Column:
    """Argmax of per-language stopword hit counts; 'und' if all zero.

    Deterministic tiebreak: first language in en,de,fr,es order wins.
    """
    toks = tokens(text)
    scores = [(lang, stopword_score(toks, lang)) for lang in STOPWORDS]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate in declaration order with strict >: a later language only
    # displaces the incumbent when strictly better, so earlier langs win ties
    for lang, sc in scores:
        cond = sc > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, sc).otherwise(best_score)
    return best_lang


def punct_ratio(text: str | Column) -> Column:
    """Fraction of characters that are not alnum/whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def quality_score(text: str | Column) -> Column:
    """Heuristic doc-quality score in [0,1]:
    length factor * (1 - punct ratio) * stopword-coverage factor.
    Pure integer-derived double arithmetic -> bit-reproducible.
    """
    toks = tokens(text)
    n_tok = F.size(toks)
    len_factor = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    sw = stopword_score(toks, "en")
    sw_factor = F.least(F.lit(1.0), sw / F.lit(5.0))
    return F.round(len_factor * (F.lit(1.0) - punct_ratio(text)) * (F.lit(0.5) + F.lit(0.5) * sw_factor), 6)


def fingerprint(text: str | Column) -> Column:
    """Document content fingerprint: md5 over the normalized token stream.

    Whitespace/punctuation-insensitive: equal fingerprints == equal token
    sequences. Used as the exact-dedup key at scale (32-hex-char key
    shuffles far cheaper than full document text).
    """
    return F.md5(F.array_join(tokens(text), " "))


def shingles_of_tokens(t: Column, k: int = 3) -> Column:
    """Distinct k-token shingles from an ALREADY-MATERIALIZED tokens
    column. Prefer this over shingles(): pass a column produced by a
    prior select so the token pipeline is evaluated once per row —
    referencing a raw tokens(...) expression here would re-evaluate the
    split+filter inside the per-shingle lambda (measured 8x slower)."""
    idx = F.sequence(F.lit(0), F.size(t) - k)
    mk = F.transform(idx, lambda i: F.array_join(F.slice(t, i + 1, k), " "))
    return F.when(F.size(t) >= k, F.array_distinct(mk)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: str | Column, k: int = 3) -> Column:
    """Distinct k-token shingles (strings), the MinHash/Jaccard unit.

    Convenience single-expression form; in hot paths materialize tokens
    first and use shingles_of_tokens (see its docstring).
    """
    return shingles_of_tokens(tokens(text), k)
