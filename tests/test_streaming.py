"""Real Structured Streaming execution of the windowed kernels.

The driver gate runs the window kernels in batch (queries/streaming.py);
these tests prove the *same kernels* under a genuine ``readStream`` →
micro-batch → memory-sink execution:

* tumbling window agg: streaming result == batch result once all data
  is processed (watermark has closed every window),
* session windows under streaming,
* ``dropDuplicatesWithinWatermark`` removes duplicate event_ids,
* late-data drop: an event older than the watermark horizon is
  discarded in append mode.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir):
    """Events written as several parquet files (micro-batch simulation)."""
    d = tempfile.mkdtemp(prefix="fdp_stream_")
    ev = load_table(spark, sf_dir, "events")
    # several files so the file-stream source has multiple batches to pick up
    ev.repartition(4).write.mode("overwrite").parquet(f"{d}/events")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _read_stream(spark, stream_dir):
    schema = load_table(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"), "events").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/events")
    )


def _run_to_completion(sdf, name, mode="complete"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def test_streaming_tumbling_equals_batch(spark, stream_dir, sf_dir):
    stream = _read_stream(spark, stream_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    _run_to_completion(agg, "t_tumbling")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }

    from flights_data_pipeline_spark.queries import REGISTRY

    batch = REGISTRY["tumbling_window_agg"].fn(spark, sf_dir)
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_streaming_sliding_equals_batch(spark, stream_dir, sf_dir):
    stream = _read_stream(spark, stream_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )
    _run_to_completion(agg, "t_sliding")
    got = {
        r.window_start: r.n_events
        for r in spark.sql("SELECT * FROM t_sliding").collect()
    }

    from flights_data_pipeline_spark.queries import REGISTRY

    batch = REGISTRY["sliding_window_agg"].fn(spark, sf_dir)
    want = {r.window_start: r.n_events for r in batch.collect()}
    assert got == want


def test_streaming_session_window_runs(spark, stream_dir):
    stream = _read_stream(spark, stream_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    _run_to_completion(agg, "t_session")
    rows = spark.sql("SELECT * FROM t_session").collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)


def test_drop_duplicates_within_watermark(spark, stream_dir):
    stream = _read_stream(spark, stream_dir)
    # duplicate the stream against itself: every event_id appears twice
    # per micro-batch window; dedup must restore uniqueness.
    doubled = stream.unionByName(stream)
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    _run_to_completion(deduped, "t_dedup", mode="append")
    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM t_dedup").collect()[0]
    assert got.n == got.d, "dropDuplicatesWithinWatermark left duplicates"
    assert got.n > 0


def test_late_event_dropped_in_append_mode(spark, tmp_path):
    """An event behind the watermark is excluded from closed windows."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    on_time = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "event_id INT, ts_s STRING",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    late = spark.createDataFrame(
        [(3, "2024-01-01 10:00:30")], "event_id INT, ts_s STRING"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    # Two separate stream runs over one checkpoint guarantee the
    # watermark advances to 12:00-10min after run 1, so run 2's
    # 10:00:30 event arrives behind the watermark and must be dropped.
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema("event_id INT, ts TIMESTAMP").parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 minute"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q.recentProgress

    on_time.coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = {r.ws.isoformat(): r.n for r in spark.read.parquet(out).collect()}
    # watermark reached 11:50 → the 10:00 window closed with only event 1
    assert rows.get("2024-01-01T10:00:00") == 1

    late.coalesce(1).write.mode("append").parquet(src)
    progress = run_once()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in progress
        for op in p["stateOperators"]
    )
    assert dropped >= 1, f"late event not dropped by watermark: {progress}"
