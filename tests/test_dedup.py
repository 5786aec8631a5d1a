"""L3 dedup: DuckDB-oracle parity + LSH-vs-exact recall invariant."""

from __future__ import annotations

import pytest

from big_data_analytics_cse545_spark.operators import dedup
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(dedup.QUERIES))
def test_dedup_oracle_parity(spark, sf_correctness, name):
    df = dedup.QUERIES[name](spark, sf_correctness)
    assert_parity(df, dedup.ORACLE[name], sf_correctness, name)


def test_lsh_recalls_planted_duplicates(spark, sf_correctness):
    """Every jaccard≥0.8 pair found exactly (d02) must be recalled by the
    MinHash-LSH funnel (d03) — the reference's candidate-recall property
    (A2 PDF p.3 acceptance band, SURVEY §5.4)."""
    exact = {
        (r["d1"], r["d2"])
        for r in dedup.d02_ngram_jaccard_pairs(spark, sf_correctness).collect()
    }
    lsh = {
        (r["d1"], r["d2"])
        for r in dedup.d03_minhash_lsh_dedup(spark, sf_correctness).collect()
    }
    assert exact, "fixture should contain planted near-duplicates"
    missed = exact - lsh
    assert not missed, f"LSH missed planted near-dup pairs: {sorted(missed)}"
