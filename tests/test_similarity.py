"""L3 similarity search: oracle parity + ANN-vs-exact recall sanity."""

from __future__ import annotations

import pytest

from big_data_analytics_cse545_spark.operators import similarity
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_oracle_parity(spark, sf_correctness, name):
    df = similarity.QUERIES[name](spark, sf_correctness)
    assert_parity(df, similarity.ORACLE[name], sf_correctness, name)


def test_ivf_finds_exact_top1_mostly(spark, sf_correctness):
    """IVF with nprobe=2 should find the exact nearest neighbor for most
    queries (coarse cells are label clusters, so the top hit is usually
    in the probed cells)."""
    exact = {
        r["q_id"]: r["neighbor_id"]
        for r in similarity.s01_knn_bruteforce(spark, sf_correctness).collect()
        if r["rk"] == 1
    }
    ivf = {
        r["q_id"]: r["neighbor_id"]
        for r in similarity.s03_ann_ivf(spark, sf_correctness).collect()
        if r["rk"] == 1
    }
    assert exact, "expected at least one query vector"
    hits = sum(1 for q, n in exact.items() if ivf.get(q) == n)
    assert hits / len(exact) >= 0.5, (
        f"IVF recall@1 too low: {hits}/{len(exact)}"
    )
