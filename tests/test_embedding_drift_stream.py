"""Streaming drift maintenance == the batch drift query, bit for bit.

The state is batch-id-keyed sufficient statistics (the
``ols_stats_stream`` pattern); these tests pin the contract: after the
stream drains, ``embedding_drift_from_state`` equals
``embedding_label_drift`` exactly on the same vectors (labels split
across micro-batches, so the additive-across-batches path is
exercised), and a full replay converges to the identical state.
"""

from __future__ import annotations

import tempfile

import pytest

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.queries import REGISTRY
from flights_data_pipeline_spark.streaming.jobs import (
    embedding_drift_from_state,
    embedding_drift_stream,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def vec_stream_src(spark):
    """Embeddings split into three micro-batch files BY vec_id thirds —
    every label appears in every batch, so per-label stats must add
    across batches."""
    d = tempfile.mkdtemp(prefix="fdp_drift_stream_")
    e = load_table(spark, SF_DIR, "embeddings")
    import glob
    import os
    import shutil

    os.makedirs(f"{d}/stream", exist_ok=True)
    for i in range(3):
        e.filter(f"vec_id % 3 = {i}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/in/f{i}")
        src = glob.glob(f"{d}/in/f{i}/part-*.parquet")[0]
        shutil.copy(src, f"{d}/stream/b{i}.parquet")
    return d


def _run(spark, d, state, ckpt):
    stream = (
        spark.readStream.schema(
            "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    q = embedding_drift_stream(stream, state, checkpoint_dir=ckpt)
    q.awaitTermination(300)


def test_streamed_drift_equals_batch(spark, vec_stream_src):
    d = vec_stream_src
    _run(spark, d, f"{d}/state", f"{d}/ckpt")
    streamed = {
        r["label"]: (r["n_vectors"], r["drift_l2sq_milli"])
        for r in embedding_drift_from_state(spark, f"{d}/state").collect()
    }
    batch = {
        r["label"]: (r["n_vectors"], r["drift_l2sq_milli"])
        for r in REGISTRY["embedding_label_drift"].fn(spark, SF_DIR).collect()
    }
    assert streamed == batch  # bit-equal doubles: same exact-int inputs


def test_replay_converges(spark, vec_stream_src):
    d = vec_stream_src
    state = f"{d}/state_replay"
    _run(spark, d, state, f"{d}/ckpt_r1")
    before = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    _run(spark, d, state, f"{d}/ckpt_r2")
    after = sorted(tuple(r) for r in spark.read.parquet(state).collect())
    assert before == after
