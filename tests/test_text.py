"""L2 text analytics: DuckDB-oracle parity (SURVEY §7 step 3)."""

from __future__ import annotations

import pytest

from big_data_analytics_cse545_spark.operators import text
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_oracle_parity(spark, sf_correctness, name):
    df = text.QUERIES[name](spark, sf_correctness)
    assert_parity(df, text.ORACLE[name], sf_correctness, name)


def test_wordcount_counts_are_case_insensitive(spark, sf_smoke):
    """WordCount reference semantics: lowercase before counting
    (a1p1_ahuja.py:184)."""
    rows = text.t01_wordcount(spark, sf_smoke).collect()
    assert rows, "expected non-empty wordcount"
    assert all(r["word"] == r["word"].lower() for r in rows)
    assert rows[0]["n"] >= rows[-1]["n"]
