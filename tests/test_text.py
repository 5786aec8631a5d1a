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


def test_t11_detects_and_scrubs_planted_pii(spark, sf_correctness):
    """Every PII_MOD-th doc carries the planted contact line: it must be
    detected (all three pattern kinds) and the scrub must leave no
    residual matches."""
    from pyspark.sql import functions as F

    rows = text.t11_pii_scrub(spark, sf_correctness).collect()
    assert rows
    planted = [r for r in rows if r["doc_id"] % text.PII_MOD == 0]
    assert planted, "no planted-PII docs surfaced"
    assert all(
        r["n_emails"] >= 1 and r["n_ips"] >= 1 and r["n_phones"] >= 1
        for r in planted
    )
    # api.pii_scrub: scrubbed text contains no remaining matches
    from big_data_analytics_cse545_spark import api

    df = spark.createDataFrame(
        [(1, "mail a.b@x.io or 10.1.2.3 or 555-123-4567 end")],
        "id long, text string",
    )
    out = api.pii_scrub(df, "text").first()["text"]
    assert out == "mail <EMAIL> or <IP> or <PHONE> end"
    for pat in (text.PII_EMAIL, text.PII_IP, text.PII_PHONE):
        assert (
            df.sparkSession.createDataFrame([(out,)], "t string")
            .filter(F.expr(f"t rlike '{pat.replace(chr(92), chr(92) * 2)}'"))
            .count()
            == 0
        )


def test_t12_pack_sequences_boundaries(spark):
    """api.pack_sequences: known token counts → known pack boundaries
    (concatenate-and-chunk: a row packs where its first token lands)."""
    from big_data_analytics_cse545_spark import api

    rows = [
        (1, "s", " ".join(["w"] * 300)),   # tokens 0-299    → pack 0
        (2, "s", " ".join(["w"] * 300)),   # starts at 300   → pack 0
        (3, "s", " ".join(["w"] * 100)),   # starts at 600   → pack 1
        (4, "t", " ".join(["w"] * 10)),    # own stream      → pack 0
    ]
    df = spark.createDataFrame(rows, "id long, src string, text string")
    got = {
        (r["src"], r["id"]): r["pack_id"]
        for r in api.pack_sequences(df, "text", "id", "src", max_len=512).collect()
    }
    assert got == {("s", 1): 0, ("s", 2): 0, ("s", 3): 1, ("t", 4): 0}
