"""Streaming transition-matrix maintenance: the matrix recovered from
streamed state equals the batch ``event_transition_matrix``, and a
full replay converges (every stored row is a pure function of its own
batch — the write path never reads cross-batch state).
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
    transition_matrix_from_state,
    transition_stats_stream,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def trans_stream_src(spark):
    """Three time-ordered files -> three micro-batches (the ordered-feed
    contract; fragments per user must not interleave in time)."""
    d = tempfile.mkdtemp(prefix="fdp_trans_stream_")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type"
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
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, d, tag):
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    q = transition_stats_stream(
        stream,
        state_path=f"{d}/state",
        checkpoint_dir=f"{d}/ckpt_{tag}",
    )
    q.awaitTermination(300)


def _matrix(spark, d):
    return sorted(
        tuple(r)
        for r in transition_matrix_from_state(spark, f"{d}/state").collect()
    )


def test_streamed_matrix_equals_batch(spark, trans_stream_src):
    d = trans_stream_src
    _run(spark, d, "a")
    got = _matrix(spark, d)
    want = sorted(
        tuple(r)
        for r in REGISTRY["event_transition_matrix"].fn(spark, SF_DIR)
        .collect()
    )
    assert got == want

    # state is fragment/count-grain, never event-grain
    n_events = load_table(spark, SF_DIR, "events").count()
    n_state = (
        spark.read.parquet(f"{d}/state/frags").count()
        + spark.read.parquet(f"{d}/state/trans").count()
    )
    assert n_state < n_events


def test_replay_converges(spark, trans_stream_src):
    d = trans_stream_src
    if not os.path.exists(f"{d}/state"):
        _run(spark, d, "a")
    before = _matrix(spark, d)
    _run(spark, d, "replay")  # fresh checkpoint -> all batches replay
    assert _matrix(spark, d) == before
