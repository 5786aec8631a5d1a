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
