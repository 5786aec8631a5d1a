"""L3 similarity search: oracle parity + ANN-vs-exact recall sanity."""

from __future__ import annotations

import pytest

from big_data_analytics_cse545_spark.operators import similarity
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_oracle_parity(spark, sf_correctness, name):
    df = similarity.QUERIES[name](spark, sf_correctness)
    if name not in similarity.ORACLE:  # rows-only (e.g. MLlib LSH)
        assert df.count() > 0
        return
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


def test_brp_lsh_recalls_exact_euclidean_top1(spark, sf_correctness):
    """MLlib BucketedRandomProjectionLSH candidates must contain the exact
    euclidean nearest neighbor for most queries."""
    import numpy as np

    from big_data_analytics_cse545_spark.sources import load_table

    rows = load_table(spark, sf_correctness, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    ids = sorted(vecs)
    exact_top1 = {}
    for q in (i for i in ids if i % similarity.QUERY_MOD == 0):
        dists = [(np.linalg.norm(vecs[q] - vecs[j]), j) for j in ids if j != q]
        exact_top1[q] = min(dists)[1]
    cands: dict[int, set] = {}
    for r in similarity.QUERIES["s04_brp_lsh_mllib"](spark, sf_correctness).collect():
        cands.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, n in exact_top1.items() if n in cands.get(q, set()))
    assert hits / len(exact_top1) >= 0.6, f"recall {hits}/{len(exact_top1)}"
