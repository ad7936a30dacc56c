"""Streaming maintenance of the cross-source contamination matrix.

The batch twin (``contamination_matrix``) is oracle-gated; this suite
pins the STREAMING contract of ``contamination_stream``: after the
stream drains, the matrix derived from the store equals the batch
query on all streamed documents (order-invariant across two batch
splits), replays are idempotent, and state is the distinct
(source, fingerprint) set — never per-document rows.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.queries.curation import contamination_matrix
from flights_data_pipeline_spark.queries.text import winnow_fp_set
from flights_data_pipeline_spark.streaming.jobs import (
    contamination_from_store,
    contamination_stream,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_stream_src(spark):
    d = tempfile.mkdtemp(prefix="fdp_contam_stream_")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    thirds = [docs.filter(f"doc_id % 3 = {i}") for i in range(3)]
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
        spark.readStream.schema("doc_id BIGINT, source STRING, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = contamination_stream(stream, store, checkpoint_dir=checkpoint)
    q.awaitTermination(300)


def _rows(df) -> set:
    return {
        (r["source_a"], r["source_b"], r["n_shared_fps"], r["fp_jaccard"])
        for r in df.collect()
    }


def test_store_matrix_equals_batch(spark, doc_stream_src):
    d = doc_stream_src
    _run(spark, f"{d}/a/stream", f"{d}/a/store", f"{d}/a/ckpt")
    got = _rows(contamination_from_store(spark, f"{d}/a/store"))
    want = _rows(contamination_matrix(spark, SF_DIR))
    assert got == want


def test_arrival_order_does_not_matter(spark, doc_stream_src):
    d = doc_stream_src
    _run(spark, f"{d}/b/stream", f"{d}/b/store", f"{d}/b/ckpt")
    got = _rows(contamination_from_store(spark, f"{d}/b/store"))
    want = _rows(contamination_matrix(spark, SF_DIR))
    assert got == want


def test_replay_is_idempotent_and_state_is_fp_grain(spark, doc_stream_src):
    d = doc_stream_src
    store = f"{d}/a/store_replay"
    _run(spark, f"{d}/a/stream", store, f"{d}/a/ckpt_r1")
    before = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    _run(spark, f"{d}/a/stream", store, f"{d}/a/ckpt_r2")
    after = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert before == after
    docs = load_table(spark, SF_DIR, "documents")
    n_expected = (
        winnow_fp_set(docs.select("doc_id", "text"))
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "fp_hash")
        .distinct()
        .count()
    )
    st = spark.read.parquet(store)
    assert st.count() == n_expected
    assert st.count() == st.distinct().count()
