"""File-format ingestion (f01 JSONL, f02 CSV): DuckDB parity over the
SAME on-disk files, plus fixture-integrity and type round-trip checks."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from big_data_analytics_cse545_spark.operators import ingest
from big_data_analytics_cse545_spark.sources import load_table
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(ingest.ORACLE))
def test_ingest_oracle_parity(spark, sf_correctness, name):
    df = ingest.QUERIES[name](spark, sf_correctness)
    assert_parity(df, ingest.ORACLE[name](sf_correctness), sf_correctness, name)


def test_jsonl_round_trips_every_document(spark, sf_correctness):
    """Every doc must survive the parquet→JSONL→Spark trip byte-exact:
    per-doc md5(text) equality against the parquet original (a stronger
    check than f01's per-group min hash)."""
    path = ingest.jsonl_fixture_dir(sf_correctness)
    files = sorted(glob.glob(os.path.join(path, "part-*.jsonl")))
    assert len(files) == ingest.N_SHARDS
    j = (
        spark.read.schema(ingest._JSONL_SCHEMA)
        .json(path)
        .select("doc_id", F.md5("text").alias("h_json"))
    )
    p = load_table(spark, sf_correctness, "documents").select(
        "doc_id", F.md5("text").alias("h_pq")
    )
    joined = j.join(p, "doc_id")
    assert joined.count() == p.count() == j.count()
    assert joined.filter("h_json <> h_pq").count() == 0


def test_csv_decimal_and_date_round_trip(spark, sf_correctness):
    """The CSV money column must re-parse to the EXACT decimal total of
    the parquet source (no float drift), and the date column to real
    dates."""
    path = ingest.csv_fixture_dir(sf_correctness)
    c = spark.read.schema(ingest._CSV_SCHEMA).option("header", "true").csv(path)
    p = load_table(spark, sf_correctness, "orders")
    got = c.agg(
        F.sum("o_totalprice").alias("total"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    want = p.agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("total"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert got["n"] == want["n"]
    assert got["total"] == want["total"]
    assert dict(c.dtypes)["o_orderdate"] == "date"


def test_f03_quarantines_exactly_the_planted_lines(spark, sf_correctness):
    """The corrupt row count must equal the number of planted truncated
    lines (doc_id % CORRUPT_MOD == 2), and good rows must exclude them."""
    import duckdb

    from big_data_analytics_cse545_spark.operators import ingest

    rows = ingest.f03_jsonl_corrupt_tolerant(spark, sf_correctness).collect()
    # the quarantine key is the boolean is_corrupt column, never a
    # sentinel value in source's own value space (round-6 advice)
    got_corrupt = [r for r in rows if r["is_corrupt"]][0]["n_docs"]
    con = duckdb.connect()
    n_total, n_planted = con.execute(
        f"SELECT COUNT(*), SUM(CASE WHEN doc_id % {ingest.CORRUPT_MOD} = 2 "
        f"THEN 1 ELSE 0 END) FROM '{sf_correctness}/documents.parquet'"
    ).fetchone()
    assert got_corrupt == n_planted
    n_good = sum(r["n_docs"] for r in rows if not r["is_corrupt"])
    assert n_good == n_total - n_planted
    assert sum(1 for r in rows if r["is_corrupt"]) == 1, "exactly one quarantine bucket"


def test_f03_source_named_corrupt_stays_out_of_quarantine(spark, tmp_path, monkeypatch):
    """The quarantine key is a BOOLEAN, not a sentinel in source's value
    space (round-6 advice): a legitimate source literally named
    '_corrupt' must keep its good-row stats in its own
    (source='_corrupt', is_corrupt=false) group, disjoint from the
    (source=NULL, is_corrupt=true) quarantine bucket."""
    import json

    d = str(tmp_path / "jsonl")
    os.makedirs(d)
    rows = [
        {"doc_id": 1, "text": "alpha", "lang": "en", "source": "_corrupt", "n_chars": 5},
        {"doc_id": 2, "text": "beta", "lang": "en", "source": "_corrupt", "n_chars": 4},
        {"doc_id": 3, "text": "gamma", "lang": "en", "source": "web", "n_chars": 5},
    ]
    with open(os.path.join(d, "part-0.jsonl"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        fh.write('{"doc_id": 4, "text": "torn')  # planted truncated line
    monkeypatch.setattr(ingest, "corrupt_jsonl_fixture_dir", lambda sf: d)
    got = {
        (r["source"], r["is_corrupt"]): r["n_docs"]
        for r in ingest.f03_jsonl_corrupt_tolerant(spark, "ignored").collect()
    }
    assert got == {
        ("_corrupt", False): 2,  # the real source, intact
        ("web", False): 1,
        (None, True): 1,  # exactly the torn line
    }


def test_f07_xml_escaping_and_null_elements_round_trip(spark, tmp_path, monkeypatch):
    """The sf corpora contain no XML metacharacters, so oracle parity
    alone never exercises f07's escape path — plant values with &, <,
    > and quotes plus NULLs and verify the write -> escape -> native
    xml read chain returns them byte-exactly, with omitted elements
    back as NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "sfxml")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["x", "y", "z"]),
                "lang": pa.array(["a&b<c>", 'quo"te', None]),
                "source": pa.array([None, "s&amp;neaky", "plain"]),
                "n_chars": pa.array([5, None, 7], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    rows = {
        r["doc_id"]: (r["lang"], r["source"], r["n_chars"])
        for r in (
            spark.read.format("xml")
            .schema(ingest._XML_SCHEMA)
            .option("rowTag", "doc")
            .load(ingest.xml_fixture_dir(d))
            .collect()
        )
    }
    assert rows == {
        1: ("a&b<c>", None, 5),
        # a value that IS an entity string must survive double-escaping
        2: ('quo"te', "s&amp;neaky", None),
        3: (None, "plain", 7),
    }


def test_f06_reader_pushdown_and_partition_pruning():
    """Connector-level contracts without Spark in the loop: host_id
    filters are absorbed (not returned), epoch bounds prune whole
    partitions, and read() honors the absorbed predicates."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from big_data_analytics_cse545_spark.sources.pysource import (
        CRAWL_EPOCH0,
        CRAWL_EPOCH_STEP,
        CrawlLogReader,
    )

    r = CrawlLogReader({"n_rows": "4000", "n_parts": "8"})
    leftover = list(
        r.pushFilters(
            [
                EqualTo(("host_id",), 7),
                GreaterThanOrEqual(("fetch_epoch",), CRAWL_EPOCH0 + CRAWL_EPOCH_STEP * 1000),
                EqualTo(("status",), 200),  # unsupported → must come back
            ]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["EqualTo"]
    assert leftover[0].attribute == ("status",)
    parts = r.partitions()
    assert len(parts) == 6, "first 1000 rows span 2 of 8 partitions — pruned"
    assert parts[0].start == 1000
    rows = [row for p in parts for row in r.read(p)]
    assert rows and all(row[2] == 7 for row in rows)
    assert all(row[5] >= CRAWL_EPOCH0 + CRAWL_EPOCH_STEP * 1000 for row in rows)
    # unfiltered reader sees every row exactly once
    r2 = CrawlLogReader({"n_rows": "4000", "n_parts": "8"})
    all_i = [row[0] for p in r2.partitions() for row in r2.read(p)]
    assert sorted(all_i) == list(range(4000))


def test_f06_spark_plan_carries_no_reapplied_host_filter(spark, sf_correctness):
    """End-to-end through Spark: the source must produce exactly the
    oracle row set with the pushed filters applied at the source (row
    counts prove absorption — a broken pushFilters that dropped rows
    AND got re-filtered would still pass parity, so check totals)."""
    from pyspark.sql import functions as F

    from big_data_analytics_cse545_spark.operators.ingest import (
        f06_python_datasource_scan,
    )

    got = f06_python_datasource_scan(spark, sf_correctness)
    tot = got.agg(F.sum("n_pages").alias("n")).collect()[0]["n"]
    # hosts cycle with period 50 over i≥1000 ⇒ 3000/50 = 60 rows
    assert tot == 60


def test_f03_survives_full_column_pruning(spark, sf_correctness):
    """Regression (round 5): df.count() prunes every output column, and
    over the raw .json() reader that pruning tripped Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN rule (the scan's pruned schema hit
    the corrupt-column-only case). The text+from_json scan shape must
    stay prune-safe under ANY downstream projection."""
    df = ingest.f03_jsonl_corrupt_tolerant(spark, sf_correctness)
    assert df.count() == df.select("source").distinct().count()


# ---------------------------------------------------------------------------
# f08 — the pure-stdlib Avro codec and the pyavro block-split DataSource
# ---------------------------------------------------------------------------


_AVRO_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "x", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "flag", "type": "boolean"},
    ],
}


def _adversarial_rows():
    return [
        {"k": -(2**62), "x": 1e308, "s": "", "opt": None, "flag": True},
        {"k": 2**62, "x": -1e-308, "s": "héllo 日本語 \U0001f600", "opt": -1, "flag": False},
        {"k": 0, "x": 0.0, "s": "a\nb\tc\"d", "opt": 0, "flag": True},
        {"k": -1, "x": -0.0, "s": "x" * 5000, "opt": 2**61, "flag": False},
    ] + [
        {"k": i, "x": i / 7.0, "s": f"r{i}", "opt": None if i % 3 == 0 else i, "flag": bool(i % 2)}
        for i in range(400)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_codec_round_trips_adversarial_values(tmp_path, codec):
    """The spec-exactness gate for the from-scratch codec: zigzag
    varints at ±2^62, empty/multi-script/huge strings, union nulls on
    both branches, booleans, and BIT-exact doubles (±0.0 distinguished
    via struct packing, denormals, 1e308) — through both codecs."""
    import struct

    from big_data_analytics_cse545_spark.sources.avro_io import (
        _field_types,
        block_index,
        read_block,
        write_avro,
    )

    rows = _adversarial_rows()
    p = str(tmp_path / f"t_{codec}.avro")
    write_avro(rows, _AVRO_SCHEMA, p, codec=codec, block_records=64)
    schema, cdc, sync, blocks = block_index(p)
    assert cdc == codec and len(blocks) > 1
    fields = _field_types(schema)
    back = []
    for off, _, _ in blocks:
        back.extend(read_block(p, off, fields, cdc, sync))
    exp = [(r["k"], r["x"], r["s"], r["opt"], r["flag"]) for r in rows]
    assert [t[0] for t in back] == [e[0] for e in exp]
    assert [t[2:] for t in back] == [e[2:] for e in exp]
    # doubles compared at the BIT level (−0.0 vs 0.0 must survive)
    assert [struct.pack("<d", t[1]) for t in back] == [
        struct.pack("<d", e[1]) for e in exp
    ]


def test_avro_source_block_split_knob(spark, tmp_path):
    """Scan parallelism = block count at blocks_per_partition=1 (the
    finest split — splittability is real, not per-file); the default
    byte-targeted grouping and a coarse explicit count change only the
    partitioning, never a value."""
    from big_data_analytics_cse545_spark.sources import avro_source
    from big_data_analytics_cse545_spark.sources.avro_io import write_avro

    rows = _adversarial_rows()
    d = str(tmp_path)
    write_avro(rows, _AVRO_SCHEMA, f"{d}/a.avro", codec="null", block_records=64)
    write_avro(rows, _AVRO_SCHEMA, f"{d}/b.avro", codec="deflate", block_records=64)
    avro_source.register(spark)
    read = spark.read.format("pyavro").option("path", d)
    fine = read.option("blocks_per_partition", 1).load()
    default = spark.read.format("pyavro").option("path", d).option(
        "target_partition_bytes", 4096
    ).load()
    coarse = spark.read.format("pyavro").option("path", d).option(
        "blocks_per_partition", 100
    ).load()
    n_fine = fine.rdd.getNumPartitions()
    n_default = default.rdd.getNumPartitions()
    assert n_fine > 2  # more partitions than files = block-level splits
    assert n_fine >= n_default > coarse.rdd.getNumPartitions() == 2
    a = sorted(map(tuple, fine.collect()))
    b = sorted(map(tuple, coarse.collect()))
    c = sorted(map(tuple, default.collect()))
    assert a == b == c and len(a) == 2 * len(rows)


def test_avro_failure_modes_are_loud(spark, tmp_path):
    """No silent partial decode: a non-Avro file, an unsupported codec,
    an unsupported schema type, and schema disagreement across shards
    must all raise with a pointed message."""
    from big_data_analytics_cse545_spark.sources import avro_source
    from big_data_analytics_cse545_spark.sources.avro_io import (
        block_index,
        write_avro,
    )

    p = str(tmp_path / "notavro.avro")
    with open(p, "wb") as fh:
        fh.write(b"PAR1 not an avro file")
    with pytest.raises(ValueError, match="magic"):
        block_index(p)
    with pytest.raises(ValueError, match="codec"):
        write_avro([], _AVRO_SCHEMA, str(tmp_path / "x.avro"), codec="snappy")
    bad_schema = {"type": "record", "name": "t",
                  "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}]}
    with pytest.raises(ValueError, match="unsupported Avro type"):
        write_avro([], bad_schema, str(tmp_path / "y.avro"))
    # shard schema disagreement surfaces at plan time, not mid-scan
    d2 = tmp_path / "mixed"
    d2.mkdir()
    write_avro([], _AVRO_SCHEMA, str(d2 / "a.avro"))
    other = {"type": "record", "name": "t",
             "fields": [{"name": "z", "type": "long"}]}
    write_avro([], other, str(d2 / "b.avro"))
    avro_source.register(spark)
    with pytest.raises(Exception, match="disagrees"):
        spark.read.format("pyavro").option("path", str(d2)).load().collect()


def test_f08_fixture_exercises_both_codecs_and_the_union(spark, sf_correctness):
    """The f08 parity row only certifies what the fixture exercises —
    assert the shards actually alternate null/deflate codecs and the
    nullable-union branch actually fires (some priority nulls exist)."""
    import os as _os

    from pyspark.sql import functions as F

    from big_data_analytics_cse545_spark.sources.avro_io import block_index

    path = ingest.avro_fixture_dir(sf_correctness)
    codecs = {
        f: block_index(_os.path.join(path, f))[1]
        for f in sorted(_os.listdir(path))
        if f.endswith(".avro")
    }
    assert set(codecs.values()) == {"null", "deflate"}
    out = ingest.f08_avro_scan(spark, sf_correctness)
    nulls = out.agg(F.sum("n_null_priority").alias("n")).collect()[0]["n"]
    assert nulls > 0, "union null branch never exercised by the fixture"


def test_avro_source_survives_zero_row_shards(spark, tmp_path):
    """--empty chaos-sweep pin (round 10): a 0-row Avro shard has 0
    blocks, and a partitions() that returned an empty list made Spark
    schedule one task with a None partition (AttributeError mid-scan).
    The sentinel empty run must yield an empty DataFrame instead."""
    from big_data_analytics_cse545_spark.sources import avro_source
    from big_data_analytics_cse545_spark.sources.avro_io import write_avro

    d = str(tmp_path)
    write_avro([], _AVRO_SCHEMA, f"{d}/a.avro")
    write_avro([], _AVRO_SCHEMA, f"{d}/b.avro", codec="deflate")
    avro_source.register(spark)
    df = spark.read.format("pyavro").option("path", d).load()
    assert df.count() == 0
    assert df.schema.simpleString().startswith("struct<k:bigint")


def test_avro_header_beyond_64kib_and_truncation_are_handled(tmp_path):
    """r10 ADVICE: the old fixed 64 KiB header read hit IndexError (or
    silently truncated slices) on a header larger than the guess. The
    incremental reader must round-trip a >64 KiB metadata map, and a
    header torn mid-map must raise a pointed ValueError, not garbage."""
    from big_data_analytics_cse545_spark.sources.avro_io import (
        _field_types,
        block_index,
        header_of,
        read_block,
        write_avro,
    )

    rows = _adversarial_rows()[:50]
    p = str(tmp_path / "fat_header.avro")
    write_avro(
        rows,
        _AVRO_SCHEMA,
        p,
        block_records=16,
        extra_meta={"app.blob": b"x" * (80 << 10), "app.k2": b"y" * 4096},
    )
    schema, codec, sync, start = header_of(p)
    assert start > (80 << 10)  # the map really exceeded the old read
    _, _, _, blocks = block_index(p)
    back = []
    for off, _, _ in blocks:
        back.extend(read_block(p, off, _field_types(schema), codec, sync))
    assert len(back) == len(rows) and back[0][0] == rows[0]["k"]
    # torn mid-map: cut inside the metadata map, before its terminator
    t = str(tmp_path / "torn.avro")
    with open(p, "rb") as fh:
        blob = fh.read(40 << 10)
    with open(t, "wb") as fh:
        fh.write(blob)
    with pytest.raises(ValueError, match="truncated Avro header"):
        header_of(t)
    # reserved-prefix discipline on the writer side
    with pytest.raises(ValueError, match="reserved"):
        write_avro(rows, _AVRO_SCHEMA, str(tmp_path / "z.avro"),
                   extra_meta={"avro.codec": b"evil"})


def test_avro_writer_rejects_out_of_range_integers(tmp_path):
    """r10 ADVICE: a Python int beyond the declared width zigzag-encodes
    to a varint THIS reader round-trips but spec-conformant readers
    (spark-avro, fastavro) reject — the writer must fail loudly instead
    of shipping nonconformant bytes. Both widths, both signs, and the
    exact boundary values still write."""
    from big_data_analytics_cse545_spark.sources.avro_io import write_avro

    ok = {"k": 2**63 - 1, "x": 0.0, "s": "", "opt": -(2**63), "flag": True}
    write_avro([ok], _AVRO_SCHEMA, str(tmp_path / "ok.avro"))
    for bad_k in (2**63, -(2**63) - 1):
        with pytest.raises(ValueError, match="out of range for Avro 'long'"):
            write_avro([dict(ok, k=bad_k)], _AVRO_SCHEMA,
                       str(tmp_path / "bad.avro"))
    int_schema = {"type": "record", "name": "t",
                  "fields": [{"name": "i", "type": "int"}]}
    write_avro([{"i": 2**31 - 1}, {"i": -(2**31)}], int_schema,
               str(tmp_path / "i.avro"))
    with pytest.raises(ValueError, match="out of range for Avro 'int'"):
        write_avro([{"i": 2**31}], int_schema, str(tmp_path / "i2.avro"))


def test_avro_columns_option_projects_without_decoding(spark, tmp_path):
    """The caller-declared projection (r10 VERDICT #8): 'columns'
    restricts both the plan-time schema and the decoded tuples —
    values must equal the full scan's projection exactly, file field
    order is preserved regardless of request order, and unknown names
    raise at plan time."""
    from big_data_analytics_cse545_spark.sources import avro_source
    from big_data_analytics_cse545_spark.sources.avro_io import write_avro

    rows = _adversarial_rows()
    d = str(tmp_path)
    write_avro(rows, _AVRO_SCHEMA, f"{d}/a.avro", codec="null", block_records=64)
    write_avro(rows, _AVRO_SCHEMA, f"{d}/b.avro", codec="deflate", block_records=64)
    avro_source.register(spark)
    full = spark.read.format("pyavro").option("path", d).load()
    # request order reversed on purpose — output must be file order
    proj = (
        spark.read.format("pyavro")
        .option("path", d)
        .option("columns", "opt, k")
        .load()
    )
    assert proj.schema.simpleString() == "struct<k:bigint,opt:bigint>"
    nones_last = lambda t: (t[0], t[1] is not None, t[1] or 0)  # noqa: E731
    a = sorted(map(tuple, full.select("k", "opt").collect()), key=nones_last)
    b = sorted(map(tuple, proj.collect()), key=nones_last)
    assert a == b and len(b) == 2 * len(rows)
    with pytest.raises(Exception, match="not in Avro schema"):
        spark.read.format("pyavro").option("path", d).option(
            "columns", "k,nope"
        ).load()


def test_avro_negative_lengths_are_loud(tmp_path):
    """r11 ADVICE: negative varint lengths pass a pos+len upper-bound
    check (pos+len < pos) and walk the parse position BACKWARD — a
    corrupt or hostile header/value could cycle the parser instead of
    raising. All three decode sites must fail loudly."""
    from big_data_analytics_cse545_spark.sources.avro_io import (
        _decode_value,
        _parse_meta_map,
        _skip_value,
        _zigzag_encode,
    )

    # meta map: count=1, key length = -1
    hostile = _zigzag_encode(1) + _zigzag_encode(-1)
    with pytest.raises(ValueError, match="negative metadata key length"):
        _parse_meta_map(memoryview(hostile))
    # meta map: count=1, key 'a', value length = -3
    hostile = _zigzag_encode(1) + _zigzag_encode(1) + b"a" + _zigzag_encode(-3)
    with pytest.raises(ValueError, match="negative metadata value length"):
        _parse_meta_map(memoryview(hostile))
    # record values: negative string length in decode and skip
    neg = _zigzag_encode(-5)
    with pytest.raises(ValueError, match="negative Avro string length"):
        _decode_value(memoryview(neg), 0, "string")
    with pytest.raises(ValueError, match="negative Avro string length"):
        _skip_value(memoryview(neg), 0, "string")


def test_avro_empty_projection_is_loud(spark, tmp_path):
    """r11 ADVICE: columns='' (or only commas/whitespace) used to keep
    ZERO columns and emit an empty DDL schema — an opaque Spark
    schema-parse failure. It must be a pointed error at the source."""
    from big_data_analytics_cse545_spark.sources import avro_source
    from big_data_analytics_cse545_spark.sources.avro_io import write_avro

    rows = _adversarial_rows()[:10]
    d = str(tmp_path)
    write_avro(rows, _AVRO_SCHEMA, f"{d}/a.avro", codec="null")
    avro_source.register(spark)
    for bad in ("", " , ,", "   "):
        with pytest.raises(Exception, match="empty projection"):
            (
                spark.read.format("pyavro")
                .option("path", d)
                .option("columns", bad)
                .load()
                .collect()
            )


def test_avro_negative_block_headers_and_bad_union_branch_are_loud(tmp_path):
    """Round-12 review: the negative-length hardening must also cover
    the block walk (a negative size makes the seek arithmetic a no-op
    — an infinite planning loop) and the union branch index (Python
    negative indexing would silently decode the WRONG branch)."""
    from big_data_analytics_cse545_spark.sources.avro_io import (
        _decode_value,
        _skip_value,
        _zigzag_encode,
        block_index,
        header_of,
        read_block,
        write_avro,
    )

    rows = _adversarial_rows()[:20]
    p = str(tmp_path / "ok.avro")
    write_avro(rows, _AVRO_SCHEMA, p, codec="null", block_records=8)
    _, _, _, start = header_of(p)
    # corrupt the first block header: count=2, size=-18
    with open(p, "r+b") as fh:
        fh.seek(start)
        fh.write(_zigzag_encode(2) + _zigzag_encode(-18))
    with pytest.raises(ValueError, match="negative Avro block header"):
        block_index(p)
    with pytest.raises(ValueError, match="negative Avro block header"):
        list(read_block(p, start, [("k", "long")], "null", b"\x00" * 16))
    # union branch out of range: branch=-1 and branch=2 on a 2-branch union
    u = ["null", "long"]
    for bad in (-1, 2):
        buf = memoryview(_zigzag_encode(bad))
        with pytest.raises(ValueError, match="union branch"):
            _decode_value(buf, 0, u)
        with pytest.raises(ValueError, match="union branch"):
            _skip_value(buf, 0, u)
