"""Dataset split / mixing operators (x01-x02) and the t13 repetition
signals: DuckDB-oracle parity plus semantic invariants (hashlib is the
determinism referee — md5 is identical in Spark, DuckDB, and Python)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from big_data_analytics_cse545_spark import api
from big_data_analytics_cse545_spark.operators import sampling, text
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(sampling.QUERIES))
def test_sampling_oracle_parity(spark, sf_correctness, name):
    df = sampling.QUERIES[name](spark, sf_correctness)
    assert_parity(df, sampling.ORACLE[name], sf_correctness, name)


def test_x01_buckets_match_hashlib(spark, sf_correctness):
    """The split is a pure function of md5: recompute every bucket in
    Python and compare — proves the assignment survives any engine,
    partitioning, or rerun."""
    rows = sampling.x01_hash_split(spark, sf_correctness).collect()
    assert rows
    for r in rows:
        h = hashlib.md5(f"split|{r['doc_id']}".encode()).hexdigest()
        assert r["bucket"] == int(h[:8], 16) % 100, r
    splits = {r["doc_id"]: r["split"] for r in rows}
    counts = {s: sum(1 for v in splits.values() if v == s) for s in ("train", "val", "test")}
    # 98/1/1 in expectation; allow generous binomial slack at 500 docs
    assert counts["train"] >= 0.9 * len(rows)
    assert counts["val"] + counts["test"] >= 1


def test_x02_smallest_source_keeps_everything(spark, sf_correctness):
    rows = sampling.x02_temperature_mix(spark, sf_correctness).collect()
    assert rows
    smallest = min(rows, key=lambda r: r["n_total"])
    assert smallest["keep_rate"] == 1.0
    assert smallest["n_kept"] == smallest["n_total"]
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_total"]
        assert 0.0 < r["keep_rate"] <= 1.0


def test_api_hash_split_matches_x01(spark, sf_correctness):
    from big_data_analytics_cse545_spark.sources import load_table

    d = load_table(spark, sf_correctness, "documents")
    via_api = {
        r["doc_id"]: r["split"]
        for r in api.hash_split(d, "doc_id").select("doc_id", "split").collect()
    }
    via_op = {
        r["doc_id"]: r["split"]
        for r in sampling.x01_hash_split(spark, sf_correctness).collect()
    }
    assert via_api == via_op


def test_api_temperature_mix_matches_x02_counts(spark, sf_correctness):
    from big_data_analytics_cse545_spark.sources import load_table

    d = load_table(spark, sf_correctness, "documents")
    kept = (
        api.temperature_mix(d, "source", "doc_id", alpha=0.5)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = {
        r["source"]: r["n_kept"]
        for r in sampling.x02_temperature_mix(spark, sf_correctness).collect()
    }
    assert {r["source"]: r["n"] for r in kept} == expected


def test_api_repetition_signals_match_t13(spark, sf_correctness):
    """The shuffle-free array-expression form (api) and the
    explode+groupBy form (t13) must produce identical fractions."""
    from big_data_analytics_cse545_spark.sources import load_table

    d = load_table(spark, sf_correctness, "documents")
    via_api = {
        r["doc_id"]: (r["dup_token_frac"], r["top_bigram_frac"])
        for r in api.repetition_signals(d, "text")
        .select("doc_id", "dup_token_frac", "top_bigram_frac")
        .collect()
    }
    via_op = {
        r["doc_id"]: (r["dup_token_frac"], r["top_bigram_frac"])
        for r in text.t13_repetition_filter(spark, sf_correctness).collect()
    }
    assert via_api == via_op


def test_repetition_signals_planted(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),  # one token repeated
        (2, "alpha beta gamma delta epsilon"),  # all distinct
        (3, "one"),  # single token: no bigrams
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r
        for r in api.repetition_signals(df, "text").collect()
    }
    assert got[1]["dup_token_frac"] == pytest.approx(5 / 6)
    assert got[1]["top_bigram_frac"] == 1.0  # "spam spam" is every bigram
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == pytest.approx(1 / 4)  # all unique
    assert got[3]["top_bigram_frac"] == 0.0


def test_x04_budget_respected_and_maximal(spark, sf_correctness):
    """Selected token mass fits the budget, and the selection is maximal
    under the (score DESC, doc_id) order: the first excluded doc in that
    order would overflow the budget."""
    sel = sampling.x04_token_budget_select(spark, sf_correctness).collect()
    assert sel
    total = sum(r["n_tok"] for r in sel)
    assert total <= sampling.TOKEN_BUDGET
    # rebuild the full ranked universe and walk it greedily per the
    # histogram-offset rule: the operator must pick the same prefix
    from big_data_analytics_cse545_spark.functions.text import tokens
    from big_data_analytics_cse545_spark.sources import load_table

    d = load_table(spark, sf_correctness, "documents")
    base = d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        F.floor(
            F.lit(1000.0)
            * F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
            / F.col("n_chars")
        ).cast("long").alias("score"),
    ).collect()
    universe = sorted(base, key=lambda r: (-r["score"], r["doc_id"]))
    # exact operator semantics: global walk in (score DESC, doc_id)
    # order where prev_tok counts EVERY higher bucket's full token mass;
    # the first doc that overflows ends the selection (later buckets'
    # offsets are already past the budget)
    expected, acc = [], 0
    for r in universe:
        if acc + r["n_tok"] > sampling.TOKEN_BUDGET:
            break
        expected.append(r["doc_id"])
        acc += r["n_tok"]
    got = [r["doc_id"] for r in sel]
    assert got == expected


def test_x05_two_phase_equals_naive_window(spark, sf_correctness):
    """The salted two-phase top-K must equal the single-window spelling
    exactly (the local top-K of each salt group is a superset of the
    global winners hashed into it)."""
    from pyspark.sql.window import Window

    from big_data_analytics_cse545_spark.sources import load_table

    got = {
        (r["lang"], r["rank"]): r["doc_id"]
        for r in sampling.x05_stratified_sample(spark, sf_correctness).collect()
    }
    d = load_table(spark, sf_correctness, "documents")
    h = sampling.hash_bucket(F.col("doc_id"), "strat|")
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    naive = {
        (r["lang"], r["rank"]): r["doc_id"]
        for r in d.select("lang", "doc_id", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= sampling.STRATUM_K)
        .collect()
    }
    assert got == naive
    # exactly K per stratum (each stratum here is larger than K)
    langs = {k[0] for k in got}
    for lang in langs:
        assert sum(1 for k in got if k[0] == lang) == sampling.STRATUM_K


def test_x06_near_dups_never_straddle_the_split(spark, sf_correctness):
    """The whole point: every near-dup pair (d04 semantics) must land on
    ONE side of the split, and singletons must match x01's assignment."""
    from big_data_analytics_cse545_spark.operators import dedup, sampling
    from big_data_analytics_cse545_spark.sources import load_table

    split = {
        r["doc_id"]: (r["split_key"], r["split"])
        for r in sampling.x06_leakage_safe_split(spark, sf_correctness).collect()
    }
    d = load_table(spark, sf_correctness, "documents")
    pairs = dedup.simhash_near_dup_pairs(d).collect()
    assert pairs, "fixture must contain near-dup pairs"
    for p in pairs:
        assert split[p["d1"]][1] == split[p["d2"]][1], (p, split[p["d1"]], split[p["d2"]])
        assert split[p["d1"]][0] == split[p["d2"]][0]
    x01 = {
        r["doc_id"]: r["split"]
        for r in sampling.x01_hash_split(spark, sf_correctness).collect()
    }
    for doc, (key, sp) in split.items():
        if key == doc:  # singleton → identical to the per-doc split
            assert sp == x01[doc]


def test_x07_quota_and_partition_invariance(spark, sf_correctness):
    """DSIR selection must (a) fill exactly ⌊n_scored/10⌋ slots, where
    n_scored = docs with ≥ 2 tokens (≥ 1 bigram), and (b) return the
    identical set under a different shuffle-partition count — the
    histogram-offset top-K may not depend on physical partitioning."""
    from big_data_analytics_cse545_spark.functions.text import token_count
    from big_data_analytics_cse545_spark.sources import load_table

    a = sorted(
        (r["doc_id"], r["dsir_score"])
        for r in sampling.x07_dsir_select(spark, sf_correctness).collect()
    )
    n_scored = (
        load_table(spark, sf_correctness, "documents")
        .filter(token_count(F.col("text")) >= 2)
        .count()
    )
    assert len(a) == n_scored // sampling.DSIR_KEEP_DIV
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = sorted(
            (r["doc_id"], r["dsir_score"])
            for r in sampling.x07_dsir_select(spark, sf_correctness).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
