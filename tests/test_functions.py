"""functions/vectors.py — the two execution regimes (interpreted HOF vs
the codegen-unrolled ``*_sql`` builders) must return BIT-IDENTICAL
doubles, because the unrolled form is used inside oracle-hashed queries
(d11, s01…s06, p02) whose DuckDB twins reproduce the HOF fold order
exactly.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from big_data_analytics_cse545_spark.functions.vectors import (
    cosine,
    cosine_pre,
    dot,
    dot_literal_sql,
    dot_sql,
    norm,
    norm_sql,
)

DIM = 64


@pytest.fixture(scope="module")
def vec_df(spark):
    """200 seeded float32-ish pairs, adversarial values included:
    negatives, tiny magnitudes, exact zeros, repeated values."""
    rng = random.Random(12012)

    def vec():
        out = []
        for _ in range(DIM):
            r = rng.random()
            if r < 0.05:
                out.append(0.0)
            elif r < 0.10:
                out.append(rng.uniform(-1e-6, 1e-6))
            else:
                out.append(rng.uniform(-2.0, 2.0))
        return out

    rows = [(i, vec(), vec()) for i in range(200)]
    return spark.createDataFrame(
        rows, "id long, x array<float>, y array<float>"
    )


def _both(df, hof_col, unrolled_col):
    got = df.select(
        hof_col.alias("hof"), unrolled_col.alias("unrolled")
    ).collect()
    assert len(got) > 0
    for r in got:
        # exact comparison — the regimes must agree to the last bit
        if r["hof"] is None or (
            isinstance(r["hof"], float) and math.isnan(r["hof"])
        ):
            assert r["unrolled"] is None or math.isnan(r["unrolled"])
        else:
            assert r["hof"] == r["unrolled"], r
    return got


def test_dot_unrolled_matches_hof(vec_df):
    got = _both(
        vec_df,
        dot(F.col("x"), F.col("y")),
        F.expr(dot_sql("x", "y", DIM)),
    )
    # sanity: the values are real dot products, not all-zero
    assert any(abs(r["hof"]) > 1e-3 for r in got)


def test_norm_unrolled_matches_hof(vec_df):
    _both(
        vec_df,
        norm(F.col("x")),
        F.expr(norm_sql("x", DIM)),
    )


def test_cosine_pre_hoisted_norms_bit_identical(vec_df):
    """cosine_pre(dot, norm(x), norm(y)) — the hoisted-norm spelling the
    pair-join queries use, with the unrolled dot/norm — must equal
    cosine(x, y) to the last bit (the norm is the same expression either
    way; division of identical doubles is deterministic)."""
    _both(
        vec_df,
        cosine(F.col("x"), F.col("y")),
        cosine_pre(
            F.expr(dot_sql("x", "y", DIM)),
            F.expr(norm_sql("x", DIM)),
            F.expr(norm_sql("y", DIM)),
        ),
    )


def test_dot_literal_sql_matches_hof_array_form(vec_df):
    """dot_literal_sql(weights, y) — the scalar-literal unroll the
    hyperplane-bucket and random-projection expressions use — must be
    bit-identical to the HOF dot against the same weights as an array
    literal (which is how the DuckDB oracles spell it). Weights include
    the ±1/0 plane values AND arbitrary doubles (repr round-trip)."""
    rng = random.Random(545)
    weights = []
    for _ in range(DIM):
        r = rng.random()
        if r < 0.3:
            weights.append(1.0)
        elif r < 0.6:
            weights.append(-1.0)
        elif r < 0.8:
            weights.append(0.0)
        else:
            weights.append(rng.uniform(-3.0, 3.0))
    signs = F.array(*[F.lit(w) for w in weights])
    _both(
        vec_df,
        dot(signs, F.col("x")),
        F.expr(dot_literal_sql(weights, "x")),
    )


def test_null_element_nulls_both_regimes(spark):
    """A NULL element nulls the whole sum identically in both regimes
    (zip_with propagates null products through aggregate; the unrolled
    chain propagates null through + the same way)."""
    df = spark.createDataFrame(
        [(list(range(3)), [1.0, None, 2.0])],
        "x array<int>, y array<double>",
    )
    got = df.select(
        dot(F.col("x"), F.col("y")).alias("hof"),
        F.expr(dot_sql("x", "y", 3)).alias("unrolled"),
    ).collect()[0]
    assert got["hof"] is None and got["unrolled"] is None


def test_unrolled_plan_is_codegen_not_hof(spark):
    """The point of the *_sql builders: the unrolled expression must NOT
    contain the interpreted ArrayAggregate/ZipWith nodes (those fall out
    of whole-stage codegen and were the d11/s-family execution hot
    spot)."""
    df = spark.range(1).select(
        F.array(*[F.lit(float(i)) for i in range(DIM)]).alias("x")
    )
    plan_unrolled = df.select(
        F.expr(dot_sql("x", "x", DIM))
    )._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(" not in plan_unrolled
    plan_hof = df.select(
        dot(F.col("x"), F.col("x"))
    )._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(" in plan_hof
