"""Watermark late-data semantics — a genuine multi-micro-batch test.

The st-queries process events.parquet in one batch (nothing is ever
late); here three files + maxFilesPerTrigger=1 force separate
micro-batches so the watermark actually advances between them. Pins Spark's HARD guarantees: append mode emits each window exactly once
and only after the watermark passes its end; unfinalized windows never
emit. (Dropping rows older than the watermark is explicitly best-effort
in Spark — "may or may not be dropped" — so the late row's fate is
asserted permissively.)
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F


def test_append_mode_window_finalization(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def write_file(name, rows, mtime):
        spark.createDataFrame(rows, "event_id long, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))
        # the file source orders micro-batches by modification time — pin
        # it so the late file really arrives in a later batch
        for root, _dirs, files in os.walk(src / name):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    # batch 0: events 10:00-10:59 → watermark after batch = 10:29
    write_file(
        "f1.parquet",
        [(1, base), (2, base + dt.timedelta(minutes=30)), (3, base + dt.timedelta(minutes=59))],
        mtime=1_000_000,
    )
    # batch 1: a LATE event at 09:10 — its window [09:00,10:00) ended
    # before the current watermark (10:29) → must be discarded — plus an
    # on-time event at 11:10
    write_file(
        "f2.parquet",
        [(4, base - dt.timedelta(minutes=50)), (5, base + dt.timedelta(minutes=70))],
        mtime=2_000_000,
    )
    # batch 2: a far-future event pushes the watermark to 12:30 so the
    # 10:00 and 11:00 windows finalize and append-mode emits them
    write_file(
        "f3.parquet",
        [(6, base + dt.timedelta(hours=3))],
        mtime=3_000_000,
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.table("late_mem").collect()
    starts = [r["w"]["start"].strftime("%H:%M") for r in rows]
    out = {s: r["n"] for s, r in zip(starts, rows)}
    # each finalized window emitted EXACTLY once (append-mode guarantee)
    assert len(starts) == len(set(starts)), f"duplicate window emission: {starts}"
    # on-time windows finalized with correct counts
    assert out.get("10:00") == 3, out
    assert out.get("11:00") == 1, out
    # the 13:00 window never passed the watermark → must NOT be emitted
    assert "13:00" not in out, out
    # The 09:10 late row is within Spark's documented latitude: dropping
    # rows older than the watermark is best-effort ("may or may not be
    # dropped"), and this engine observes it being aggregated into a
    # fresh window. The row must not corrupt on-time windows either way.
    assert out.get("09:00") in (None, 1), out
