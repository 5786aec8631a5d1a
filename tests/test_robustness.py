"""Malformed-input robustness — the reference's lenient decode
(errors='replace', a1p2b_ahuja.py:8-17) and tolerant parser (spec: 'not
well-formed XML') generalized: PERMISSIVE parsing with corrupt-record
capture, and bad-date tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_permissive_json_with_corrupt_records(spark, tmp_path):
    p = tmp_path / "mixed.json"
    p.write_text(
        '{"id": 1, "v": 10}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": 20}\n'
        '{"id": 3, "v": "not_a_number"}\n'
    )
    df = (
        spark.read.schema("id long, v long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} == {1, 2}
    assert len(bad) == 2  # the non-JSON line and the type-mismatched row


def test_lenient_date_parsing(spark):
    """try_to_timestamp: malformed dates → NULL, not job failure (the
    engine's spelling of errors='replace')."""
    df = spark.createDataFrame(
        [("12,January,2024",), ("garbage",), ("31,February,2024",)], ["d"]
    ).select(F.try_to_timestamp(F.col("d"), F.lit("dd,MMMM,yyyy")).alias("ts"))
    vals = [r["ts"] for r in df.collect()]
    assert vals[0] is not None
    assert vals[1] is None
    assert vals[2] is None  # Feb 31 rejected, not silently wrapped


def test_csv_malformed_rows_dropped_in_dropmalformed(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,v\n1,10\nbroken_row_with_no_comma_number,\n2,20\n")
    df = (
        spark.read.schema("id long, v long")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert {r["id"] for r in df.collect()} == {1, 2}


def test_null_key_semantics_match_sql(spark, sf_correctness, tmp_path):
    """NULL join/distinct keys must follow SQL semantics, pinned on a
    null-injected twin corpus (round-6 null probe): COUNT(DISTINCT)
    ignores NULL user_ids (q29's skew helper, st04/st10's
    dropDuplicates+count lowering used to count the NULL group); a
    NULL-user purchase never as-of-matches a NULL-user click (window
    partitionBy groups NULLs, joins do not — q18); an all-NULL-n_chars
    host sums junk_docs to 0, not NULL (t23); a NULL p_brand flows
    through q13's try_cast as NULL instead of killing the scan."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from big_data_analytics_cse545_spark.operators import relational, text
    from big_data_analytics_cse545_spark.streaming import ops as st
    from tests.oracle_utils import assert_parity

    plan = {
        "events.parquet": ("event_id", [("user_id", 3, 1)]),
        "documents.parquet": ("doc_id", [("n_chars", 3, 2)]),
        "part.parquet": ("p_partkey", [("p_brand", 3, 0)]),
    }
    d = str(tmp_path / "null_keys_sf")
    os.makedirs(d)
    planted = 0
    for f in os.listdir(sf_correctness):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(sf_correctness, f))
        key, cols = plan.get(f, (None, []))
        for col, mod, rem in cols:
            keys = t.column(key).to_numpy()
            mask = pa.array((keys % mod) == rem)
            idx = t.schema.get_field_index(col)
            t = t.set_column(
                idx,
                col,
                pc.if_else(
                    mask,
                    pa.scalar(None, t.schema.field(col).type),
                    t.column(col).combine_chunks(),
                ),
            )
            planted += t.column(col).null_count
        pq.write_table(t, os.path.join(d, f))
    assert planted > 0, "fixture must actually plant nulls"
    for name, fn in (
        ("q29", relational.q29_skew_safe_distinct),
        ("q18", relational.q18_asof_join),
        ("q13", relational.q13_string_funcs),
        ("t23", text.t23_host_reputation),
        ("st04", st.st04_streaming_dedup),
        ("st10", st.st10_sliding_distinct_users),
    ):
        mod = text if name.startswith("t2") else (
            st if name.startswith("st") else relational
        )
        oracle = next(
            sql for qname, sql in mod.ORACLE.items() if qname.startswith(name)
        )
        assert_parity(fn(spark, d), oracle, d, name)
