"""Skew-handling aggregation patterns for 100 TB keys.

Joins: AQE's skew-join splitting (enabled in session.py) already covers
skewed join keys at runtime. What AQE does NOT fix is a skewed
``countDistinct`` / ``collect_list`` aggregation, where one reducer
receives a hot key's entire value set. The two-phase rewrite here keys
the first shuffle by (key, value) — cardinality bounded by the distinct
pairs, never by the hot key's row count — then counts per key. This is
the engine's standing pattern for exact distincts over skewed keys
(the reference's residual-rows-to-first-chunk balancing,
``Assignment 1/a1p1_ahuja.py:114-115``, is the toy version of the same
concern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_resistant_count_distinct(
    df: DataFrame, key: str, value: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) GROUP BY key, skew-safe.

    Phase 1 shuffles on (key, value) — hot keys spread over all
    partitions; phase 2 shuffles only the deduped pairs.
    """
    return (
        df.select(key, value)
        .distinct()
        .groupBy(key)
        # count(value), not count(*): COUNT(DISTINCT value) ignores
        # NULLs, and the distinct pass keeps a (key, NULL) row that
        # must contribute 0 here (round-6 review)
        .agg(F.count(F.col(value)).alias(out_col))
    )


def skew_resistant_distinct_and_total(
    df: DataFrame,
    key: str,
    value: str,
    distinct_col: str = "n_distinct",
    total_col: str = "n_total",
) -> DataFrame:
    """COUNT(DISTINCT value) and COUNT(*) per key in one skew-safe plan.

    The fused form of :func:`skew_resistant_count_distinct`: phase 1
    groups by (key, value) — the hot key's rows spread over every
    partition and collapse to one row per distinct pair, carrying the
    pair's row count; phase 2 aggregates the pair-sized relation. A
    plain ``agg(countDistinct, count)`` funnels the hot key's full row
    set through one reducer; this never shuffles more than the distinct
    pairs after the map-side combine."""
    pairs = df.groupBy(key, value).agg(F.count(F.lit(1)).alias("_cnt"))
    return pairs.groupBy(key).agg(
        # count(value): the (key, NULL) pair row must count toward the
        # total but NOT the distinct — COUNT(DISTINCT value) ignores
        # NULLs and this helper's contract is exact equivalence
        # (round-6 review)
        F.count(F.col(value)).alias(distinct_col),
        F.sum("_cnt").alias(total_col),
    )


def salted_collect_list(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    out_col: str = "values",
) -> DataFrame:
    """collect_list per key without a single-reducer hot spot: partial
    lists per (key, salt) — salt derived from the value hash, so the
    result set is deterministic — then flatten. Output lists are sorted
    to make the operator order-insensitive (collect_list order is
    otherwise partition-dependent)."""
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(F.col(key), F.col(value), salt)
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sort_array(F.flatten(F.collect_list("_part"))).alias(out_col))
    )
