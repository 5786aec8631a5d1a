"""Streaming file sink + foreachBatch — the durable-output half of the
streaming story (memory sinks in streaming/ops.py are for the oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_cse545_spark.streaming.ops import _events_stream


def test_streaming_parquet_sink_with_checkpoint(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    e = _events_stream(spark, sf_smoke)
    q = (
        e.select("event_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    written = spark.read.parquet(out)
    assert written.count() == 1000  # sf0.001 events rows
    # restart with the same checkpoint: no new data → no duplicates
    q2 = (
        e.select("event_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    q2.stop()
    assert spark.read.parquet(out).count() == 1000, "checkpoint replayed data"


def test_foreach_batch_sink(spark, sf_smoke, tmp_path):
    """foreachBatch: arbitrary batch-side sink logic per micro-batch."""
    out = str(tmp_path / "fb_out")
    e = _events_stream(spark, sf_smoke)
    agg = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def write_batch(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    result = spark.read.parquet(out)
    assert result.count() == 5  # five event types
    assert sum(r["n"] for r in result.collect()) == 1000


def test_checkpoint_restart_processes_only_new_files(spark, sf_smoke, tmp_path):
    """The continuous-ingestion contract end to end: a second
    AvailableNow run over the same checkpoint picks up ONLY files that
    arrived since the first run — no reprocessing, no gaps. This is the
    file-source offset-tracking that lets a nightly corpus job tail a
    landing directory."""
    import shutil

    src = tmp_path / "landing"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = str(sf_smoke) + "/events.parquet"
    shutil.copy(events, src / "batch1.parquet")

    def run():
        q = (
            spark.readStream.schema(spark.read.parquet(str(src)).schema)
            .parquet(str(src))
            .select("event_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run()
    n1 = spark.read.parquet(out).count()
    assert n1 == 1000
    # second batch lands with disjoint ids — written as a single FILE
    # (df.write.parquet creates a directory, which a non-recursive file
    # source ignores; pyarrow writes the plain file a landing dir gets)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(events)
    t = t.set_column(
        t.schema.get_field_index("event_id"),
        "event_id",
        pc.add(t["event_id"], 10_000_000),
    )
    pq.write_table(t, str(src / "batch2.parquet"))
    run()
    got = spark.read.parquet(out)
    assert got.count() == 2 * n1, "restart must append exactly the new file"
    assert got.select("event_id").distinct().count() == 2 * n1, "duplicate ids"


def test_python_stream_source_resumes_from_checkpoint(spark, tmp_path):
    """The custom streaming connector's exactly-once contract: run 1
    drains the source at high-water mark 2000 into a parquet sink; the
    'service' then grows to 4000 rows; run 2 over the SAME checkpoint
    must emit exactly rows 2000..3999 — the committed offset, not the
    initial one, is the restart point."""
    from big_data_analytics_cse545_spark.sources import pysource

    pysource.register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run(n_rows: int):
        q = (
            spark.readStream.format("graftcrawl")
            .option("n_rows", str(n_rows))
            .load()
            .select("i", "status")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()

    run(2000)
    assert spark.read.parquet(out).count() == 2000
    run(4000)
    got = spark.read.parquet(out)
    assert got.count() == 4000, "restart must emit only the new rows"
    ids = sorted(r["i"] for r in got.select("i").collect())
    assert ids == list(range(4000)), "gap or duplicate in resumed stream"
