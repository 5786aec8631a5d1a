"""L1 relational core: DuckDB-oracle parity for every query (SURVEY §7 step 2)."""

from __future__ import annotations

import pytest

from big_data_analytics_cse545_spark.operators import relational
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_oracle_parity(spark, sf_correctness, name):
    df = relational.QUERIES[name](spark, sf_correctness)
    if name not in relational.ORACLE:  # rows-only queries (e.g. sketches)
        assert df.count() > 0
        return
    assert_parity(df, relational.ORACLE[name], sf_correctness, name)


def test_q01_nonempty(spark, sf_smoke):
    rows = relational.q01_pricing_summary(spark, sf_smoke).collect()
    assert len(rows) > 0
    assert rows[0]["count_order"] > 0


def test_q30_wau_equals_naive_trailing_window(spark, sf_smoke):
    """The linear fan-out rewrite must equal the naive per-day trailing
    count (computable at smoke scale), and WAU >= DAU always."""
    import datetime

    from pyspark.sql import functions as F

    from big_data_analytics_cse545_spark.operators import relational
    from big_data_analytics_cse545_spark.sources import load_table

    got = {
        r["day"]: (r["dau"], r["wau"])
        for r in relational.q30_sliding_dau(spark, sf_smoke).collect()
    }
    ud = (
        load_table(spark, sf_smoke, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    by_day = {}
    for r in ud:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    for day_s, (dau, wau) in got.items():
        d = datetime.date.fromisoformat(day_s)
        naive = set()
        for k in range(relational.Q30_WINDOW_DAYS):
            naive |= by_day.get(d - datetime.timedelta(days=k), set())
        assert dau == len(by_day[d])
        assert wau == len(naive)
        assert wau >= dau
