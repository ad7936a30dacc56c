"""foreachBatch stream → keyed MERGE upsert (effectively-once sink).

Proves: (a) the streamed upsert converges to exactly the batch
latest-row-per-key result regardless of how events are split across
micro-batches; (b) replaying the whole stream into the same target
(the crash-replay worst case) changes nothing — idempotent sink.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.streaming.jobs import read_events_stream, upsert_stream


@pytest.fixture(scope="module")
def stream_src(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="fdp_upsert_stream_")
    ev = load_table(spark, sf_dir, "events")
    # several files → several micro-batches with maxFilesPerTrigger=1
    ev.repartition(5).write.mode("overwrite").parquet(f"{d}/events")
    return d


def _batch_latest(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return {
        (r.user_id): (r.ts, r.event_id, float(r.value))
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .collect()
    }


def test_stream_upsert_converges_to_batch_latest(spark, sf_dir, stream_src):
    d = stream_src
    target = f"{d}/latest_by_user"
    q = upsert_stream(
        read_events_stream(spark, f"{d}/events"),
        target,
        keys=["user_id"],
        checkpoint_dir=f"{d}/ckpt1",
    )
    q.awaitTermination(300)

    got = {
        r.user_id: (r.ts, r.event_id, float(r.value))
        for r in spark.read.parquet(target).collect()
    }
    assert got == _batch_latest(spark, sf_dir)


def test_stream_upsert_replay_is_idempotent(spark, sf_dir, stream_src):
    d = stream_src
    target = f"{d}/latest_by_user_replay"
    for ckpt in ("ck_a", "ck_b"):  # fresh checkpoint = full replay
        q = upsert_stream(
            read_events_stream(spark, f"{d}/events"),
            target,
            keys=["user_id"],
            checkpoint_dir=f"{d}/{ckpt}",
        )
        q.awaitTermination(300)
    got = {
        r.user_id: (r.ts, r.event_id, float(r.value))
        for r in spark.read.parquet(target).collect()
    }
    assert got == _batch_latest(spark, sf_dir)
