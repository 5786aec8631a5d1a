"""Property-based tests (hypothesis) for algebraic invariants — the
industrialized form of the reference's randomized SetDifference check
(a1p1_ahuja.py:266-267, unseeded random sets; SURVEY §5.2)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_analytics_cse545_spark.functions.skew import (
    salted_collect_list,
    skew_resistant_count_distinct,
)

ints = st.lists(st.integers(min_value=-1000, max_value=1000), max_size=30)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(r=ints, s=ints)
def test_set_difference_invariants(spark, r, s):
    """R−S semantics for arbitrary comparable inputs (A1 PDF p.2
    genericity requirement): result == set(R)−set(S); (R−S) ∩ S = ∅."""
    r_df = spark.createDataFrame([(x,) for x in r] or [(0,)], ["elem"]).limit(len(r))
    s_df = spark.createDataFrame([(x,) for x in s] or [(0,)], ["elem"]).limit(len(s))
    got = {
        row["elem"]
        for row in r_df.distinct().join(s_df, "elem", "left_anti").collect()
    }
    assert got == set(r) - set(s)
    assert not (got & set(s))


def test_skew_resistant_count_distinct_matches_builtin(spark, sf_correctness):
    from big_data_analytics_cse545_spark.sources import load_table

    e = load_table(spark, sf_correctness, "events")
    got = {
        (r["event_type"], r["n_distinct"])
        for r in skew_resistant_count_distinct(e, "event_type", "user_id").collect()
    }
    exp = {
        (r["event_type"], r["n"])
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exp


def test_salted_collect_list_matches_plain(spark, sf_correctness):
    from big_data_analytics_cse545_spark.sources import load_table

    d = load_table(spark, sf_correctness, "documents")
    got = {
        r["lang"]: r["values"]
        for r in salted_collect_list(d, "lang", "doc_id", n_salts=8).collect()
    }
    exp = {
        r["lang"]: sorted(r["v"])
        for r in d.groupBy("lang").agg(F.collect_list("doc_id").alias("v")).collect()
    }
    assert got == exp
