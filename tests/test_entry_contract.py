"""Driver-contract guards: entry()/queries()/oracle_sql() shape, and
schema stability across scale factors (the driver smoke-checks entry at
sf0.001 and runs queries at sf0.01 — schemas must agree)."""

from __future__ import annotations

import inspect

import __spark_entry__ as em


def test_entry_returns_rows(spark):
    df = em.entry(spark)
    assert df.count() > 0
    assert len(df.schema) == 10


def test_every_oracle_has_a_query():
    qs, osql = em.queries(), em.oracle_sql()
    assert set(osql) <= set(qs), f"orphan oracles: {set(osql) - set(qs)}"
    assert len(qs) >= 50
    for name, fn in qs.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_query_schemas_stable_across_scale_factors(spark, sf_smoke, sf_correctness):
    """Same column names and types at sf0.001 and sf0.01 — a schema that
    drifts with data size would break the driver's hash compare."""
    qs = em.queries()
    # streaming queries execute on build; representative batch sample
    # covers every module family without paying streaming startup twice
    sample = [
        "q01_pricing_summary", "q18_asof_join", "q26_pivot",
        "t01_wordcount", "t09_pseudo_xml_extract",
        "d03_minhash_lsh_dedup", "d05_embedding_near_dup",
        "s01_knn_bruteforce", "p01_dim_stats", "m01_image_similarity_funnel",
    ]
    for name in sample:
        a = qs[name](spark, sf_smoke).schema
        b = qs[name](spark, sf_correctness).schema
        assert [(f.name, f.dataType) for f in a] == [
            (f.name, f.dataType) for f in b
        ], f"{name} schema drifts between scale factors"
