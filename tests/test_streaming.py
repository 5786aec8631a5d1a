"""Structured Streaming: oracle parity + batch/stream parity (SURVEY §7 step 5)."""

from __future__ import annotations

import pytest

from big_data_analytics_cse545_spark.streaming import ops as st
from tests.oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(st.QUERIES))
def test_streaming_oracle_parity(spark, sf_correctness, name):
    df = st.QUERIES[name](spark, sf_correctness)
    assert_parity(df, st.ORACLE[name], sf_correctness, name)


def test_batch_stream_parity_tumbling(spark, sf_correctness):
    """The same tumbling-window aggregation computed in pure batch mode
    must equal the streaming result on the watermark-CLOSED windows —
    st01 runs in append mode (the one mode where the watermark evicts
    window state), so the batch twin applies the same emission horizon
    (window_end ≤ max ts − 1 h, the st10 pattern)."""
    from pyspark.sql import functions as F

    from big_data_analytics_cse545_spark.sources import load_table

    e = load_table(spark, sf_correctness, "events")
    horizon = e.agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("h")
    ).collect()[0]["h"]
    batch = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("sum_value"),
        )
        .filter(F.col("w.end") <= F.lit(horizon))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )
    streamed = st.st01_tumbling_window(spark, sf_correctness)
    assert [r.asDict() for r in batch.collect()] == [
        r.asDict() for r in streamed.collect()
    ]


def test_session_window_exact_gap_boundary(spark):
    """Pin Spark's exact-boundary semantics (verified empirically): an
    event exactly GAP seconds after the previous one MERGES into the same
    session; only diff > gap starts a new one. The st03 oracle's island
    predicate must therefore be strictly >."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00"),   # session A
        (1, "2024-01-01 00:10:00"),   # exactly GAP (600s) later -> merges
        (2, "2024-01-01 00:00:00"),   # session B
        (2, "2024-01-01 00:10:01"),   # GAP+1s later -> new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = (
        df.groupBy(F.session_window("ts", f"{st.GAP_SECONDS} seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("user_id", "session_window.start")
        .collect()
    )
    assert [(r["user_id"], r["n"]) for r in out] == [(1, 2), (2, 1), (2, 1)]


def test_drop_duplicates_within_watermark(spark, sf_correctness):
    """dropDuplicatesWithinWatermark (SURVEY §2.5 streaming row): state
    for a key expires once the watermark passes it, unlike plain
    dropDuplicates whose state grows forever. With one micro-batch the
    result equals the batch distinct count — semantics parity check."""
    from pyspark.sql import functions as F

    from big_data_analytics_cse545_spark.sources import load_table
    from big_data_analytics_cse545_spark.streaming.ops import (
        _events_stream,
        _run_to_table,
    )

    e = _events_stream(spark, sf_correctness)
    dedup = (
        e.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {
        r["event_type"]: r["n"]
        for r in _run_to_table(dedup, spark, "ddww_mem").collect()
    }
    exp = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_correctness, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exp


def test_stream_shuffle_partitions_restored_on_error(spark):
    """The streaming shuffle-partition pin must restore the caller's conf
    even when the streaming query throws (ADVICE round 1)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with st._stream_shuffle_partitions(spark):
            assert (
                spark.conf.get("spark.sql.shuffle.partitions")
                == st.STREAM_SHUFFLE_PARTITIONS
            )
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_st09_drops_planted_corpus_duplicate(spark, tmp_path):
    """A streamed batch doc whose text already exists in the corpus must
    never reach the sink; novel batch docs must."""
    dup = "alpha beta gamma delta"
    rows = [
        (0, dup, "s0"),                  # corpus
        (4, "epsilon zeta eta", "s0"),   # corpus
        (1, dup, "s0"),                  # batch: exact corpus dup → dropped
        (5, "theta iota kappa", "s1"),   # batch: novel → kept
        (9, "lam mu nu", "s1"),          # batch: novel → kept
    ]
    import pandas as pd

    # single FILE named documents.parquet (the driver fixtures' layout —
    # the stream's pathGlobFilter matches file names, not directories)
    d = str(tmp_path)
    pd.DataFrame(rows, columns=["doc_id", "text", "source"]).to_parquet(
        d + "/documents.parquet", index=False
    )
    got = {
        r["source"]: (r["n_kept"], r["first_kept"])
        for r in st.st09_stream_incremental_dedup(spark, d).collect()
    }
    assert got == {"s1": (2, 5)}


def test_st10_equals_q30_trailing_windows(spark, sf_correctness):
    """The streaming sliding-WAU (window [start, end) ending day D+1)
    must equal the batch q30 WAU for day D on every emitted window —
    batch/stream parity across two different rewrites of the metric."""
    import datetime

    from big_data_analytics_cse545_spark.operators import relational

    stream = {
        r["window_end"]: r["wau"]
        for r in st.st10_sliding_distinct_users(spark, sf_correctness).collect()
    }
    assert stream, "expected emitted windows"
    batch = {
        r["day"]: r["wau"]
        for r in relational.q30_sliding_dau(spark, sf_correctness).collect()
    }
    for wend, wau in stream.items():
        d = datetime.date.fromisoformat(wend) - datetime.timedelta(days=1)
        if d.isoformat() in batch:  # q30 only reports days with activity
            assert wau == batch[d.isoformat()], (wend, wau, batch[d.isoformat()])


def test_st11_fallback_equals_batch_and_restores_conf(spark, sf_correctness):
    """st11 must (a) produce the exact batch aggregate through whichever
    stateful path ran, (b) leave the state-store provider conf exactly
    as it found it, and (c) fall back (not crash) when the
    transformWithState protobuf runtime is absent — which is the case
    in this container, so this test exercises the fallback for real."""
    from pyspark.sql import functions as F

    from big_data_analytics_cse545_spark.sources import load_table
    from big_data_analytics_cse545_spark.streaming import ops

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    got = {
        (r["n_types"], r["events_decade"]): (r["n_users"], r["sum_events"])
        for r in ops.st11_transform_with_state(spark, sf_correctness).collect()
    }
    assert spark.conf.get(key) == prev, "state-store provider conf leaked"
    e = load_table(spark, sf_correctness, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )
    exp = {
        (r["n_types"], r["events_decade"]): (r["n_users"], r["sum_events"])
        for r in per_user.groupBy(
            "n_types", F.expr("n_events DIV 10").alias("events_decade")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").alias("sum_events"),
        )
        .collect()
    }
    assert got == exp


def test_st11_typed_state_plan_constructs_and_dispatch_follows_probe(
    spark, sf_correctness, monkeypatch
):
    """The closest a protobuf-less, offline container can get to
    executing the typed-state path (VERDICT r4 task #6 — vendoring
    needs network; installs are out of scope here):

    (a) the ``transformWithStateInPandas`` PLAN must construct with the
        declared output schema — the StatefulProcessor wiring
        (ValueState/MapState declarations, output mode, time mode) is
        analyzed by Spark at plan build, so a signature drift fails
        here even though the protobuf runner never starts;
    (b) the probe must reflect reality (no protobuf ⇒ False here,
        True wherever google.protobuf imports); and
    (c) st11 must dispatch on the probe: forced True routes to the
        typed-state builder, forced False to the GroupState twin —
        checked with sentinel builders so neither query executes.
    """
    from big_data_analytics_cse545_spark.streaming import ops

    e = ops._events_stream(spark, sf_correctness)
    plan = ops._st11_profile_tws(e)
    assert plan.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,n_types:bigint>"
    )
    try:
        from google.protobuf import descriptor  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False
    assert ops._tws_runtime_available() == have_protobuf

    calls = []
    real_gs = ops._st11_profile_groupstate

    def fake_tws(df):
        calls.append("tws")
        return real_gs(df)

    def fake_gs(df):
        calls.append("groupstate")
        return real_gs(df)

    monkeypatch.setattr(ops, "_st11_profile_tws", fake_tws)
    monkeypatch.setattr(ops, "_st11_profile_groupstate", fake_gs)
    monkeypatch.setattr(ops, "_tws_runtime_available", lambda: True)
    ops.st11_transform_with_state(spark, sf_correctness).collect()
    monkeypatch.setattr(ops, "_tws_runtime_available", lambda: False)
    ops.st11_transform_with_state(spark, sf_correctness).collect()
    assert calls == ["tws", "groupstate"]


def test_st11_state_packing_roundtrip():
    """The fallback's hand-packed GroupState layout must be lossless:
    sorted '|'-join of the type set parses back to the same set (the
    serialization the typed MapState path makes unnecessary)."""
    seen = {"view", "click", "purchase"}
    packed = "|".join(sorted(seen))
    assert set(packed.split("|")) == seen
    assert "|".join(sorted(set(packed.split("|")))) == packed
    assert set("".split("|")) == {""}  # why the empty-string guard exists


def test_chained_join_agg_emission_horizon_is_strict(spark, tmp_path):
    """Pin the probed emission rule st06/st08's oracles encode: a
    chained join→window-agg emits a window iff window_end is STRICTLY
    below least(max view_ts, max purchase_ts) − 1 h (delay) − 1 h
    (join-range shift). Fixture: views hourly through 10:00, purchases
    on the hour through 5:00 → global watermark 4:00, downstream 3:00;
    the window ending exactly 3:00 must be WITHHELD."""
    import pandas as pd
    from pyspark.sql import functions as F

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    eid = 0
    for h in range(11):
        rows.append((eid, base + pd.Timedelta(hours=h), 1, "view", 1.0, "{}"))
        eid += 1
    for h in range(6):
        rows.append((eid, base + pd.Timedelta(hours=h), 1, "purchase", 1.0, "{}"))
        eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.to_parquet(str(tmp_path / "events.parquet"), index=False)
    got = {
        r["purchase_hour"]: r["n_pairs"]
        for r in st.st06_stream_stream_join(spark, str(tmp_path)).collect()
    }
    # purchase at hour h matches views at h-1 (boundary pts = vts+1h
    # included) and h; only windows ending 1:00 and 2:00 close below
    # the 3:00 horizon — the 3:00-ending window is withheld (strict)
    assert got == {"00": 1, "01": 2}
    # the oracle agrees on the same fixture
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    exp = {
        r[0]: r[1]
        for r in con.execute(st.ORACLE["st06_stream_stream_join"]).fetchall()
    }
    assert exp == got
