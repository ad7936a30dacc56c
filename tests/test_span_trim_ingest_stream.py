"""Streaming span-grain trim at ingest: per-micro-batch LSH candidates
against all history, diagonal-scanned through the batch query's own
run/merge cores, replay-idempotent.

The batch twin (``span_trim_plan``) is oracle-gated; this suite pins
that the DRAINED plan store equals the batch twin's FULL output (every
span lands at its higher-doc_id owner's arrival batch, so doc_id-ordered
ingest reconstructs the whole plan), and that replays converge.
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
    span_trim_from_store,
    span_trim_ingest_stream,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def span_trim_stream_src(spark):
    """Three files -> three micro-batches, split by doc_id thirds
    (ingest order respects doc_id, the finality precondition)."""
    d = tempfile.mkdtemp(prefix="fdp_span_trim_ingest_")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    hi = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    cuts = [hi // 3, 2 * hi // 3]
    parts = [
        docs.filter(F.col("doc_id") < cuts[0]),
        docs.filter(
            (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
        ),
        docs.filter(F.col("doc_id") >= cuts[1]),
    ]
    os.makedirs(f"{d}/stream", exist_ok=True)
    for i, part in enumerate(parts):
        part.coalesce(1).write.mode("overwrite").parquet(f"{d}/in/f{i}")
        src = glob.glob(f"{d}/in/f{i}/part-*.parquet")[0]
        shutil.copy(src, f"{d}/stream/b{i}.parquet")
    return d


def _run(spark, d, tag, ckpt=None):
    schema = "doc_id BIGINT, text STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    q = span_trim_ingest_stream(
        stream,
        state_dir=f"{d}/state_{tag}",
        plan_path=f"{d}/plan_{tag}",
        checkpoint_dir=ckpt or f"{d}/ckpt_{tag}",
    )
    q.awaitTermination(300)


def _plan(spark, path):
    return sorted(
        tuple(r)
        for r in span_trim_from_store(spark, path).collect()
    )


def test_drained_plan_equals_batch_twin(spark, span_trim_stream_src):
    d = span_trim_stream_src
    _run(spark, d, "main")
    got = _plan(spark, f"{d}/plan_main")
    want = sorted(
        tuple(r)
        for r in REGISTRY["span_trim_plan"].fn(spark, SF_DIR).collect()
    )
    assert got == want
    # and the corpus does contain spans to trim
    assert want


def test_replay_converges(spark, span_trim_stream_src):
    d = span_trim_stream_src
    _run(spark, d, "rep")
    plan_before = _plan(spark, f"{d}/plan_rep")
    grams_before = (
        spark.read.parquet(f"{d}/state_rep/grams").count(),
        spark.read.parquet(f"{d}/state_rep/grams")
        .select("doc_id")
        .distinct()
        .count(),
    )
    # independent second run: deterministic
    _run(spark, d, "rep2")
    assert _plan(spark, f"{d}/plan_rep2") == plan_before
    # true replay into the SAME stores with a fresh checkpoint
    _run(spark, d, "rep", ckpt=f"{d}/ckpt_rep_replay")
    assert _plan(spark, f"{d}/plan_rep") == plan_before
    grams_after = (
        spark.read.parquet(f"{d}/state_rep/grams").count(),
        spark.read.parquet(f"{d}/state_rep/grams")
        .select("doc_id")
        .distinct()
        .count(),
    )
    assert grams_after == grams_before  # grow-only store did not re-add


def test_plan_rows_final_at_ingest(spark, span_trim_stream_src):
    """No plan row is ever revised: a doc's rows all carry the batch
    id of its OWN arrival (the finality claim in the job docstring)."""
    d = span_trim_stream_src
    if not os.path.isdir(f"{d}/plan_main"):
        _run(spark, d, "main")
    rows = spark.read.parquet(f"{d}/plan_main").collect()
    assert rows
    per_doc_batches = {}
    for r in rows:
        per_doc_batches.setdefault(r["doc_id"], set()).add(r["__batch"])
    assert all(len(v) == 1 for v in per_doc_batches.values())
