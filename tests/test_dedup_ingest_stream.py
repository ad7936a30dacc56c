"""Streaming exact-dedup ingest: first-seen content lands, re-ingested
copies never do, replays converge.

The batch twin (``incremental_exact_dedup``) is oracle-gated; this
suite pins the STREAMING contract: per-micro-batch first-wins merge
against all history, idempotent under full replay, and late-arriving
true-first copies still win their fingerprint.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.streaming.jobs import dedup_ingest_stream

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_stream_src(spark):
    """Three files → three micro-batches: file 2 re-ingests half of
    file 1's TEXTS under new doc_ids (the crawl-refetch case), file 3
    carries a LOWER-doc_id copy of a file-2-only text (late true
    first) plus novel docs."""
    d = tempfile.mkdtemp(prefix="fdp_dedup_ingest_")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    base = docs.filter("doc_id < 100")
    refetch = (
        docs.filter("doc_id >= 20 AND doc_id < 60")
        .withColumn("doc_id", F.col("doc_id") + 100_000)
    )
    novel2 = docs.filter("doc_id >= 100 AND doc_id < 140")
    late_first = novel2.filter("doc_id < 110").withColumn(
        "doc_id", F.col("doc_id") - 1_000
    )  # lower ids than file 2's copies of the same texts
    novel3 = docs.filter("doc_id >= 140 AND doc_id < 160")
    base.coalesce(1).write.mode("overwrite").parquet(f"{d}/in/f1")
    refetch.unionByName(novel2).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/in/f2"
    )
    late_first.unionByName(novel3).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/in/f3")
    # one flat stream dir, lexicographic file order ~ ingest order
    import glob
    import os
    import shutil

    os.makedirs(f"{d}/stream", exist_ok=True)
    for i, sub in enumerate(["f1", "f2", "f3"]):
        src = glob.glob(f"{d}/in/{sub}/part-*.parquet")[0]
        shutil.copy(src, f"{d}/stream/b{i}.parquet")
    return d


def _run_ingest(spark, d, target, checkpoint):
    schema = "doc_id BIGINT, text STRING, lang STRING, source STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    q = dedup_ingest_stream(stream, target, checkpoint_dir=checkpoint)
    q.awaitTermination(300)


def _expected_store(spark, d):
    """Batch restatement: min doc_id per normalized-content hash over
    ALL streamed rows."""
    allrows = spark.read.parquet(f"{d}/stream")
    fp = allrows.withColumn(
        "content_fp",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")),
    )
    return {
        r["content_fp"]: r["keep"]
        for r in fp.groupBy("content_fp")
        .agg(F.min("doc_id").alias("keep"))
        .collect()
    }


def test_streamed_store_equals_batch_first_wins(spark, doc_stream_src):
    d = doc_stream_src
    target = f"{d}/store"
    _run_ingest(spark, d, target, f"{d}/ckpt")
    got = {
        r["content_fp"]: r["doc_id"]
        for r in spark.read.parquet(target).collect()
    }
    assert got == _expected_store(spark, d)
    # the re-fetched copies (doc_id >= 100000) must have lost to the
    # originals, and the late-arriving true-first copies (negative
    # ids, batch 3) must have WON their fingerprints
    assert all(v < 100_000 for v in got.values())
    assert any(v < 0 for v in got.values())


def test_full_replay_is_idempotent(spark, doc_stream_src):
    d = doc_stream_src
    target = f"{d}/store2"
    _run_ingest(spark, d, target, f"{d}/ckpt2")
    before = sorted(
        tuple(r) for r in spark.read.parquet(target).collect()
    )
    # crash-replay worst case: fresh checkpoint, whole stream again
    _run_ingest(spark, d, target, f"{d}/ckpt2_replay")
    after = sorted(
        tuple(r) for r in spark.read.parquet(target).collect()
    )
    assert before == after
