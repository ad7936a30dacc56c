"""Streaming fixed point of the domain pre-filter's kept set.

The batch twin (``domain_prefilter``) is oracle-gated; this suite pins
the STREAMING contract of ``domain_prefilter_stream``: after any
prefix of the stream drains, the store's derived kept rows equal the
batch query's ``stage='kept'`` rows over exactly the documents seen so
far (order-invariant — two different batch splits converge), replays
are idempotent, and the store holds one metadata-only row per
(source, fingerprint) group.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.queries.curation import (
    DOMAIN_QUOTA,
    domain_prefilter,
)
from flights_data_pipeline_spark.streaming.jobs import (
    domain_prefilter_from_store,
    domain_prefilter_stream,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_stream_src(spark):
    """The corpus split into three micro-batch files, in doc_id-third
    order (a/) and REVERSED thirds (b/), to prove order invariance."""
    d = tempfile.mkdtemp(prefix="fdp_prefilter_stream_")
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
    q = domain_prefilter_stream(stream, store, checkpoint_dir=checkpoint)
    q.awaitTermination(300)


def _batch_kept(spark) -> set:
    return {
        (r["doc_id"], r["source"], r["sample_rank"])
        for r in domain_prefilter(spark, SF_DIR)
        .filter(F.col("stage") == "kept")
        .collect()
    }


def _store_kept(spark, store) -> set:
    return {
        (r["doc_id"], r["source"], r["sample_rank"])
        for r in domain_prefilter_from_store(
            spark, store, quota=DOMAIN_QUOTA
        ).collect()
    }


def test_store_kept_equals_batch_prefilter(spark, doc_stream_src):
    d = doc_stream_src
    _run(spark, f"{d}/a/stream", f"{d}/a/store", f"{d}/a/ckpt")
    assert _store_kept(spark, f"{d}/a/store") == _batch_kept(spark)


def test_arrival_order_does_not_matter(spark, doc_stream_src):
    d = doc_stream_src
    _run(spark, f"{d}/b/stream", f"{d}/b/store", f"{d}/b/ckpt")
    assert _store_kept(spark, f"{d}/b/store") == _batch_kept(spark)


def test_replay_is_idempotent_and_state_is_group_grain(
    spark, doc_stream_src
):
    d = doc_stream_src
    store = f"{d}/a/store_replay"
    _run(spark, f"{d}/a/stream", store, f"{d}/a/ckpt_r1")
    before = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    _run(spark, f"{d}/a/stream", store, f"{d}/a/ckpt_r2")
    after = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert before == after
    # one row per (source, fp) group, never per document
    st = spark.read.parquet(store)
    assert st.count() == st.select("source", "__fp").distinct().count()
    docs = load_table(spark, SF_DIR, "documents")
    n_groups = (
        docs.select(
            "source",
            F.md5(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
            ).alias("fp"),
        )
        .distinct()
        .count()
    )
    assert st.count() == n_groups


def test_prefix_fixed_point(spark, doc_stream_src):
    """After only the FIRST micro-batch file, the store equals the
    batch rule applied to just those documents."""
    d = doc_stream_src
    os.makedirs(f"{d}/p/stream", exist_ok=True)
    shutil.copy(f"{d}/a/stream/b0.parquet", f"{d}/p/stream/b0.parquet")
    _run(spark, f"{d}/p/stream", f"{d}/p/store", f"{d}/p/ckpt")
    seen = spark.read.parquet(f"{d}/a/stream/b0.parquet")
    from pyspark.sql.window import Window as W

    dd = seen.select(
        "doc_id",
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn(
        "dup_rn",
        F.row_number().over(
            W.partitionBy("source", "fp").orderBy("h", "doc_id")
        ),
    )
    surv = dd.filter(F.col("dup_rn") == 1).withColumn(
        "rk",
        F.row_number().over(W.partitionBy("source").orderBy("h", "doc_id")),
    )
    want = {
        (r["doc_id"], r["source"], r["rk"])
        for r in surv.filter(F.col("rk") <= DOMAIN_QUOTA).collect()
    }
    assert _store_kept(spark, f"{d}/p/store") == want
