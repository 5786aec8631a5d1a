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
    # the driver checks exactly the first 50 insertion-order entries —
    # emit exactly 50 so nothing ever falls off the end silently
    assert len(qs) == 50, f"driver-facing queries() must be exactly 50, got {len(qs)}"
    for name, fn in qs.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_registry_size_and_docstrings():
    """The registry count documented in __spark_entry__ must be real,
    and every query must carry a docstring — a formatted string literal
    in docstring position is an expression (``__doc__`` becomes None),
    a bug that shipped twice before this gate existed."""
    full = em.all_queries()
    assert len(full) == 126, f"registry is {len(full)}, docs say 126"
    undocumented = [n for n, fn in full.items() if not fn.__doc__]
    assert not undocumented, f"queries with no docstring: {undocumented}"


def test_eager_loop_markers():
    """tools/plan_audit.py skips queries whose driver loop runs EAGERLY
    while fn() builds, collected from definition-site ``__eager_loop__``
    markers (r8 ADVICE: a tool-side allowlist silently misses the next
    eager-loop query). Pin the marked set — adding an eager-loop query
    without a marker means the audit re-runs its training job and
    commits a false '0 exchanges' row; marking a lazy query hides its
    plan from the audit. The marker must also survive _wrap()."""
    marked = {
        n for n, fn in em.all_queries().items()
        if hasattr(fn, "__eager_loop__")
    }
    assert marked == {
        "p05_kmeans_iterative",
        "t24_bpe_train",
        "t25_bpe_encode",  # trains its table via train_bpe before encoding
        "p08_kmeans_trace",
    }, marked


def test_rotation_budget_is_consistent():
    """_TEST_GATED/_DEMOTED_BASELINES/_HELD_OUT must reference real
    queries, be pairwise disjoint, and together account for the full
    registry minus the 50 emitted."""
    full, active = em.all_queries(), em.queries()
    buckets = [
        em._TEST_GATED,
        em._DEMOTED_BASELINES,
        em._DEMOTED_TWINNED,
        em._HELD_OUT,
        em._NEW_AWAITING_ROTATION,
    ]
    for b in buckets:
        assert b <= set(full)
    for i, a in enumerate(buckets):
        for b in buckets[i + 1 :]:
            assert not (a & b)
    assert set(active) == set(full) - set().union(*buckets)


def test_reference_citations_resolve():
    """Every ``file:line`` reference citation in the repo must point at
    a real file under /root/reference/ with in-range lines (round-5
    VERDICT found one stale path; this sweep pins the fix)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.check_citations import check

    assert check() == []


def test_held_out_queries_still_pass_their_oracle(spark, sf_correctness):
    """Rotation must not lose the hard check: every held-out query that
    has an oracle is compared here with the driver's own contract."""
    from tests.oracle_utils import assert_parity

    full = em.all_queries()
    held = em.held_out_oracle_sql()
    assert held, "expected at least one held-out oracle-checked query"
    for name, sql in held.items():
        assert_parity(full[name](spark, sf_correctness), sql, sf_correctness, name)


def test_query_schemas_stable_across_scale_factors(spark, sf_smoke, sf_correctness):
    """Same column names and types at sf0.001 and sf0.01 — a schema that
    drifts with data size would break the driver's hash compare."""
    qs = em.all_queries()
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
