"""Shared text-function builders (JVM-side column expressions, no UDFs).

The reference tokenizes two ways: whitespace split (WordCount,
``Assignment 1/a1p1_ahuja.py:184``; ``a1p2a_ahuja.py:20``) and a
punctuation class with word-boundary semantics
(``Assignment 1/a1p2b_ahuja.py:68``: ``' ',.:;\\n\\r"-'?'``). Both are
normalized here to a lowercase non-alphanumeric split so the DuckDB
oracle can reproduce them with the identical regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Identical semantics in Java regex (Spark) and RE2-ish (DuckDB).
TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Small English stopword list used by language-ID and quality scoring.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def tokens(col: Column) -> Column:
    """Lowercase tokens of a text column, empties removed.

    Equivalent DuckDB expression:
      list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t <> '')
    """
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bigrams(ts: Column, sep: str = "_") -> Column:
    """Adjacent-token bigrams of a token ARRAY, ``sep``-joined; ``[]``
    for arrays shorter than 2. The one n-gram construction shared by
    every consumer (t02 set difference, t13 repetition signals) — two
    hand-rolled variants with separately-maintained empty/singleton
    edge handling is exactly the drift surface the per-operator
    null-semantics fixes kept re-touching (round-6 review).

    Equivalent DuckDB expression:
      list_transform(range(1, len(ts)), i -> ts[i] || sep || ts[i+1])
    (DuckDB range(1, n) is empty for n <= 1, so no CASE is needed
    there.)"""
    return F.when(
        F.size(ts) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - 1),
            lambda i: F.concat_ws(
                sep, F.element_at(ts, i), F.element_at(ts, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def stopword_count(col: Column) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stop, t)))
