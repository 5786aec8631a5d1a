"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001 (smoke check).
``queries()``   — every implemented operator from SURVEY.md §2 as
                  (spark, sf_dir) -> DataFrame callables.
``oracle_sql()``— DuckDB-runnable ANSI SQL twin for each SQL-expressible
                  query (same column aliases; driver hash-compares).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: lineitem pricing summary at sf0.001."""
    from big_data_analytics_cse545_spark.operators import relational
    from big_data_analytics_cse545_spark.session import configure_runtime

    configure_runtime(spark)
    return relational.q01_pricing_summary(spark, SF0001)


def _modules():
    from big_data_analytics_cse545_spark.operators import relational

    mods = [relational]
    for name in ("text", "dedup", "similarity", "projection", "multimodal"):
        try:
            mod = __import__(
                f"big_data_analytics_cse545_spark.operators.{name}", fromlist=[name]
            )
            mods.append(mod)
        except ImportError:
            pass
    try:
        from big_data_analytics_cse545_spark.streaming import ops as streaming_ops

        mods.append(streaming_ops)
    except ImportError:
        pass
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLE", {}))
    return out
