"""Streaming split-leakage maintenance == the batch audit.

``streaming/jobs.split_leakage_stream`` maintains, at ingest time, the
exact pair store whose aggregation is
``queries/dedup.split_leakage_report`` — any arrival order, replay-
idempotent, fixed point at every prefix (round-8 VERDICT task 6).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.queries.registry import REGISTRY
from flights_data_pipeline_spark.streaming.jobs import (
    split_leakage_from_store,
    split_leakage_stream,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_stream_src(spark):
    d = tempfile.mkdtemp(prefix="fdp_leak_stream_")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
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
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = split_leakage_stream(stream, store, checkpoint_dir=checkpoint)
    q.awaitTermination(180)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_store_equals_batch_report_any_order_and_replays(
    spark, doc_stream_src
):
    expected = _rows(REGISTRY["split_leakage_report"].fn(spark, SF_DIR))
    for label in ("a", "b"):
        store = f"{doc_stream_src}/{label}/store"
        _run(
            spark,
            f"{doc_stream_src}/{label}/stream",
            store,
            f"{doc_stream_src}/{label}/ckpt",
        )
        got = _rows(split_leakage_from_store(spark, store))
        assert got == expected, label
        # the audit found actual cross-split pairs on this corpus
        assert any(r[2] for r in got), got

    # replay the same files through a FRESH checkpoint: the pair store
    # must not change (first-wins merge on deterministic pairs)
    store = f"{doc_stream_src}/a/store"
    _run(
        spark,
        f"{doc_stream_src}/a/stream",
        store,
        f"{doc_stream_src}/a/ckpt_replay",
    )
    assert _rows(split_leakage_from_store(spark, store)) == expected


def test_prefix_store_equals_batch_report_on_prefix(spark, doc_stream_src):
    """After one micro-batch the store equals the batch audit over
    just that file — a fixed point at every prefix."""
    from flights_data_pipeline_spark.queries import dedup
    from flights_data_pipeline_spark.queries.profiling import (
        TRAIN_PCT,
        VAL_PCT,
        _bucket_sql,
        _hex_val_spark,
    )
    from pyspark.sql import functions as F

    first = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter("doc_id % 3 = 0")
    )
    d = f"{doc_stream_src}/prefix"
    os.makedirs(f"{d}/stream", exist_ok=True)
    shutil.copy(
        f"{doc_stream_src}/a/stream/b0.parquet", f"{d}/stream/b0.parquet"
    )
    _run(spark, f"{d}/stream", f"{d}/store", f"{d}/ckpt")

    # batch rule inline over the prefix corpus: candidates + splits
    per_doc = dedup.minhash_state(first)
    pairs = dedup._lsh_candidates(per_doc)
    sha = per_doc.select(F.col("doc_id").alias("a_id"), F.col("hset").alias("hs_a"))
    shb = per_doc.select(F.col("doc_id").alias("b_id"), F.col("hset").alias("hs_b"))
    both = shb.join(sha.join(pairs, "a_id"), "b_id")
    n_common = F.size(F.array_intersect("hs_a", "hs_b")).cast("bigint")
    bucket = F.expr(_bucket_sql(_hex_val_spark).replace("(h,", "(md5(CAST(doc_id AS STRING)),"))
    sp = first.select(
        "doc_id",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )
    labeled = (
        both.select(
            "a_id",
            "b_id",
            (n_common / (F.size("hs_a") + F.size("hs_b") - n_common)).alias(
                "jaccard"
            ),
        )
        .join(sp.select(F.col("doc_id").alias("a_id"), F.col("split").alias("sa")), "a_id")
        .join(sp.select(F.col("doc_id").alias("b_id"), F.col("split").alias("sb")), "b_id")
    )
    expected = _rows(
        labeled.select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
            (F.least("sa", "sb") != F.greatest("sa", "sb")).alias("is_leak"),
            "jaccard",
        )
        .groupBy("split_a", "split_b", "is_leak")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("jaccard") >= 0.5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pairs_j50"),
        )
    )
    assert _rows(split_leakage_from_store(spark, f"{d}/store")) == expected
