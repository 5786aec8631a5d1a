"""Structured Streaming: oracle parity + batch/stream parity (SURVEY §7 step 5)."""

from __future__ import annotations

import pytest

from big_data_analytics_cse545_spark.streaming import ops as st
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(st.QUERIES))
def test_streaming_oracle_parity(spark, sf_correctness, name):
    df = st.QUERIES[name](spark, sf_correctness)
    assert_parity(df, st.ORACLE[name], sf_correctness, name)


def test_batch_stream_parity_tumbling(spark, sf_correctness):
    """The same tumbling-window aggregation computed in pure batch mode
    must equal the streaming result (Trigger.AvailableNow semantics)."""
    from pyspark.sql import functions as F

    from big_data_analytics_cse545_spark.sources import load_table

    e = load_table(spark, sf_correctness, "events")
    batch = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )
    streamed = st.st01_tumbling_window(spark, sf_correctness)
    assert [r.asDict() for r in batch.collect()] == [
        r.asDict() for r in streamed.collect()
    ]
