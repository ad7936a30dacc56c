"""Streaming OLS sufficient-statistics maintenance: the trend
recovered from streamed day-level state equals the batch
``ols_trend_daily`` bit-for-bit, and a full replay converges.

The batch twin is oracle-gated (DuckDB hash-match); this suite pins
the STREAMING contract: per-batch day-count contributions keyed by
(event_type, day, __batch) so day counts split across micro-batches
reassemble exactly, and at-least-once replay rewrites rather than
double-counts.
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
from flights_data_pipeline_spark.streaming.jobs import (
    ols_stats_stream,
    ols_trend_from_state,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def ols_stream_src(spark):
    """Three files -> three micro-batches, split by event_id MOD 3 so
    every day's count straddles batches (the additive-reassembly case
    the batch-id keying exists for)."""
    d = tempfile.mkdtemp(prefix="fdp_ols_stream_")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "event_type"
    )
    os.makedirs(f"{d}/stream", exist_ok=True)
    for i in range(3):
        p = ev.filter(F.col("event_id") % 3 == i)
        p.coalesce(1).write.mode("overwrite").parquet(f"{d}/in/f{i}")
        src = glob.glob(f"{d}/in/f{i}/part-*.parquet")[0]
        shutil.copy(src, f"{d}/stream/b{i}.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, d, tag):
    schema = "event_id BIGINT, ts TIMESTAMP, event_type STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    q = ols_stats_stream(
        stream,
        state_path=f"{d}/state",
        checkpoint_dir=f"{d}/ckpt_{tag}",
    )
    q.awaitTermination(300)


def _trend(spark, d):
    return sorted(
        tuple(r) for r in ols_trend_from_state(spark, f"{d}/state").collect()
    )


def test_streamed_trend_equals_batch(spark, ols_stream_src):
    d = ols_stream_src
    _run(spark, d, "a")
    got = _trend(spark, d)
    want = sorted(
        tuple(r)
        for r in REGISTRY["ols_trend_daily"].fn(spark, SF_DIR).collect()
    )
    assert got == want

    # state is day-level, not event-level: strictly fewer state rows
    # than events, at most 3 contributions per (series, day)
    st = spark.read.parquet(f"{d}/state")
    n_events = load_table(spark, SF_DIR, "events").count()
    assert st.count() < n_events
    mx = (
        st.groupBy("event_type", "day")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert mx <= 3


def test_replay_converges(spark, ols_stream_src):
    d = ols_stream_src
    if not os.path.exists(f"{d}/state"):
        _run(spark, d, "a")
    before = _trend(spark, d)
    # fresh checkpoint -> every batch replays against existing state
    _run(spark, d, "replay")
    assert _trend(spark, d) == before
