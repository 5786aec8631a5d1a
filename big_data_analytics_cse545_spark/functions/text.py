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
    there.)

    Implementation note: ``zip_with`` over the array and its own tail —
    both operands iterate sequentially, so there is NO per-element
    ``element_at`` lookup at all. The sequence/element_at×2 form this
    replaced was A/B-measured ~4.4× slower on t13's aggregation at
    sf0.1 (fresh-session runs: 18.0s vs 4.1s; the round-6 review's
    slice+element_at suggestion measured 8.3s in the same harness, and
    a ``when`` guard alone added ~40%, hence the ``coalesce`` for the
    NULL→[] contract instead)."""
    n_bigrams = F.greatest(F.size(ts) - 1, F.lit(0))
    return F.coalesce(
        F.zip_with(
            F.slice(ts, 1, n_bigrams),
            F.slice(ts, 2, n_bigrams),
            lambda a, b: F.concat_ws(sep, a, b),
        ),
        # size(NULL) is NULL -> slices/zip are NULL -> keep the [] contract
        F.array().cast("array<string>"),
    )


def stopword_count(col: Column) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stop, t)))
