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


def stopword_count(col: Column) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stop, t)))
