"""Streaming SCD2 maintenance: the dimension maintained from a live
change stream equals the batch build over the full log, and replays
converge.

The batch twin (``scd2_user_state_history``) is oracle-gated; this
suite pins the STREAMING contract: per-micro-batch version-chain
extension (compress, close, open), idempotence under full replay via
the watermark guard.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.queries.registry import REGISTRY
from flights_data_pipeline_spark.streaming.jobs import scd2_ingest_stream

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def scd2_stream_src(spark):
    """Three time-ordered files → three micro-batches (the ordered-feed
    contract append-mode SCD2 requires)."""
    d = tempfile.mkdtemp(prefix="fdp_scd2_ingest_")
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    ev = ev.withColumn("__us", F.unix_micros("ts"))
    t1, t2 = ev.approxQuantile("__us", [0.33, 0.66], 0.0)
    parts = [
        ev.filter(F.col("__us") <= t1).drop("__us"),
        ev.filter((F.col("__us") > t1) & (F.col("__us") <= t2)).drop("__us"),
        ev.filter(F.col("__us") > t2).drop("__us"),
    ]
    os.makedirs(f"{d}/stream", exist_ok=True)
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(f"{d}/in/f{i}")
        src = glob.glob(f"{d}/in/f{i}/part-*.parquet")[0]
        shutil.copy(src, f"{d}/stream/b{i}.parquet")
    return d


def _run(spark, d, tag):
    schema = "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, event_type STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    q = scd2_ingest_stream(
        stream,
        target_path=f"{d}/dim_{tag}",
        checkpoint_dir=f"{d}/ckpt_{tag}",
    )
    q.awaitTermination(300)


def _dim(spark, path):
    return sorted(
        (
            r["user_id"],
            r["version"],
            r["state"],
            r["valid_from"],
            r["valid_to"],
        )
        for r in spark.read.parquet(path).collect()
    )


def test_streamed_dimension_equals_batch_build(spark, scd2_stream_src):
    d = scd2_stream_src
    _run(spark, d, "main")
    got = _dim(spark, f"{d}/dim_main")
    want = sorted(
        (
            r["user_id"],
            r["version"],
            r["state"],
            r["valid_from"],
            r["valid_to"],
        )
        for r in REGISTRY["scd2_user_state_history"].fn(spark, SF_DIR).collect()
    )
    assert got == want
    # multi-version users exist, so closing actually happened
    assert any(v[1] > 1 for v in got)


def test_true_replay_into_same_store(spark, scd2_stream_src):
    """Crash-replay worst case: fresh checkpoint, whole stream again,
    SAME dimension store — the watermark guard drops every
    already-applied event, so the table is bit-identical."""
    d = scd2_stream_src
    _run(spark, d, "rep2")
    before = _dim(spark, f"{d}/dim_rep2")
    schema = "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, event_type STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    q = scd2_ingest_stream(
        stream,
        target_path=f"{d}/dim_rep2",
        checkpoint_dir=f"{d}/ckpt_rep2_replay",
    )
    q.awaitTermination(300)
    assert _dim(spark, f"{d}/dim_rep2") == before
