"""DuckDB-oracle differential harness, mirroring the driver's compare:
row count, schema (column names sorted), and order-insensitive value
compare. Floats are compared exactly first (predicting the driver's
value-hash) with a tolerant fallback that reports near-misses loudly.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from big_data_analytics_cse545_spark.sources import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
            drop=True
        )
    return df


def _value_eq(a, b) -> tuple[bool, bool]:
    """Returns (exact_equal, close_enough)."""
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    try:
        a_null = a_null or pd.isna(a)
        b_null = b_null or pd.isna(b)
    except (ValueError, TypeError):
        pass
    if a_null or b_null:
        return (bool(a_null) == bool(b_null),) * 2  # type: ignore[return-value]
    if isinstance(a, float) or isinstance(b, float):
        # int-vs-float kind mismatch would change the driver's value-hash
        # even when numerically equal — count it as inexact.
        same_kind = isinstance(a, float) == isinstance(b, float)
        exact = same_kind and float(a) == float(b)
        close = math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        return exact, close
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        if len(la) != len(lb):
            return False, False
        pairs = [_value_eq(x, y) for x, y in zip(la, lb)]
        return all(p[0] for p in pairs), all(p[1] for p in pairs)
    return (str(a) == str(b),) * 2  # type: ignore[return-value]


def assert_parity(spark_df, oracle_sql, sf_dir: str, name: str = "query"):
    if callable(oracle_sql):  # lazy SQL builder (e.g. t10's fixture-writing one)
        oracle_sql = oracle_sql()
    got = _normalize(spark_df.toPandas())
    exp = _normalize(run_oracle(oracle_sql, sf_dir))
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count spark={len(got)} oracle={len(exp)}"
    n_inexact = 0
    for i in range(len(got)):
        for c in got.columns:
            exact, close = _value_eq(got.iloc[i][c], exp.iloc[i][c])
            assert close, (
                f"{name}: value mismatch row {i} col {c}: "
                f"spark={got.iloc[i][c]!r} oracle={exp.iloc[i][c]!r}"
            )
            if not exact:
                n_inexact += 1
    assert n_inexact == 0, (
        f"{name}: {n_inexact} values only approximately equal — "
        "driver value-hash would mismatch; tighten determinism"
    )
