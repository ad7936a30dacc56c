"""Streaming per-source quota admission: the store is the batch quota
sample of everything seen so far, in any arrival order, under replay.

The batch twin (``domain_quota_sample``) is oracle-gated; this suite
pins the STREAMING contract of ``quota_sample_stream``: after the
stream drains, the store equals the batch rule applied to all streamed
rows (order-invariant — two different batch splits converge to the
same store), replays are idempotent, and the store never exceeds
|sources| × quota rows at any point.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.streaming.jobs import quota_sample_stream

from .conftest import SF_DIR

QUOTA = 7


@pytest.fixture(scope="module")
def doc_stream_src(spark):
    """The corpus split into three micro-batch files, twice — in doc_id
    order (a/) and in REVERSED thirds (b/) — to prove order invariance."""
    d = tempfile.mkdtemp(prefix="fdp_quota_stream_")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    thirds = [
        docs.filter("doc_id % 3 = 0"),
        docs.filter("doc_id % 3 = 1"),
        docs.filter("doc_id % 3 = 2"),
    ]
    import glob
    import os
    import shutil

    for label, order in (("a", [0, 1, 2]), ("b", [2, 1, 0])):
        os.makedirs(f"{d}/{label}/stream", exist_ok=True)
        for i, ix in enumerate(order):
            thirds[ix].coalesce(1).write.mode("overwrite").parquet(
                f"{d}/{label}/in/f{i}"
            )
            src = glob.glob(f"{d}/{label}/in/f{i}/part-*.parquet")[0]
            shutil.copy(src, f"{d}/{label}/stream/b{i}.parquet")
    return d


def _run(spark, stream_dir, store, checkpoint):
    stream = (
        spark.readStream.schema("doc_id BIGINT, source STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = quota_sample_stream(stream, store, quota=QUOTA, checkpoint_dir=checkpoint)
    q.awaitTermination(300)


def _batch_rule(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return {
        (r["doc_id"], r["source"])
        for r in docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QUOTA)
        .collect()
    }


def test_store_equals_batch_quota_sample(spark, doc_stream_src):
    d = doc_stream_src
    _run(spark, f"{d}/a/stream", f"{d}/a/store", f"{d}/a/ckpt")
    got = {
        (r["doc_id"], r["source"])
        for r in spark.read.parquet(f"{d}/a/store").collect()
    }
    assert got == _batch_rule(spark)


def test_arrival_order_does_not_matter(spark, doc_stream_src):
    d = doc_stream_src
    _run(spark, f"{d}/b/stream", f"{d}/b/store", f"{d}/b/ckpt")
    got = {
        (r["doc_id"], r["source"])
        for r in spark.read.parquet(f"{d}/b/store").collect()
    }
    assert got == _batch_rule(spark)


def test_replay_is_idempotent_and_state_bounded(spark, doc_stream_src):
    d = doc_stream_src
    store = f"{d}/a/store_replay"
    _run(spark, f"{d}/a/stream", store, f"{d}/a/ckpt_r1")
    before = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    _run(spark, f"{d}/a/stream", store, f"{d}/a/ckpt_r2")
    after = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert before == after
    per_source = (
        spark.read.parquet(store).groupBy("source").count().collect()
    )
    assert all(r["count"] <= QUOTA for r in per_source)
