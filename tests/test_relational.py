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
