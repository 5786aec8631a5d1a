"""Bucketed co-located join — the shuffle-elimination strategy for a
repeatedly-joined 100 TB fact table (SURVEY §7 step 6 partition tuning).

Writing both join sides bucketed by the join key lets Spark sort-merge
join them with ZERO exchanges: the 'pre-partitioned co-located join' the
brief calls out. The test pins that property by asserting no Exchange
operator appears in the joined plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_cse545_spark.plans import explain_str
from big_data_analytics_cse545_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed_warehouse(spark, sf_smoke):
    # spark.sql.warehouse.dir is a static conf — tables land in the
    # default ./spark-warehouse (gitignored), dropped after the test.
    import shutil

    l = load_table(spark, sf_smoke, "lineitem")
    o = load_table(spark, sf_smoke, "orders")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df, key in (("l_bkt", l, "l_orderkey"), ("o_bkt", o, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    yield
    spark.sql("DROP TABLE IF EXISTS l_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_warehouse):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path so bucketing is what saves the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("l_bkt")
            .join(spark.table("o_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Bucketed: true") == 2, f"scans not bucketed:\n{plan}"
        # exactly ONE exchange — the final groupBy repartition; the join
        # itself reads co-located buckets with no shuffle on either side
        assert plan.count("Exchange") == 1, f"bucketed join still shuffles:\n{plan}"
        # correctness unchanged vs the unbucketed join
        base = (
            spark.table("l_bkt")
            .join(spark.table("o_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert base == sum(r["n"] for r in joined.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
