"""Streaming token-budget admission: the store is the batch rule
(token_budget_admission) applied to everything seen so far — any
arrival order, replay-idempotent, with the rejected-boundary cut as
the extra piece of sufficient state the token rule needs (a rejected
document still consumes budget for later-hashing ones)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.streaming.jobs import (
    token_budget_from_store,
    token_budget_stream,
)

from .conftest import SF_DIR

#: small enough that the sf0.001 corpus overflows it per source —
#: the cut (eviction boundary) must actually move for the test to
#: exercise the two-piece state
BUDGET = 300


@pytest.fixture(scope="module")
def doc_stream_src(spark):
    d = tempfile.mkdtemp(prefix="fdp_tokbudget_stream_")
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
    q = token_budget_stream(
        stream, store, budget=BUDGET, checkpoint_dir=checkpoint
    )
    q.awaitTermination(120)


def _batch_rule(spark, docs):
    """The token_budget_admission rule inline, budget-parameterized."""
    n_toks = F.when(
        F.col("text").isNotNull(),
        F.size(F.split(F.trim(F.col("text")), r"\s+")),
    ).cast("bigint")
    tc = docs.select(
        "doc_id",
        "source",
        n_toks.alias("n_toks"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tc.withColumn("cum", F.sum("n_toks").over(w))
        .filter(F.col("cum") <= BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_admitted"),
            F.sum("n_toks").cast("bigint").alias("tokens_admitted"),
            F.max("cum").cast("bigint").alias("budget_used"),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_store_equals_batch_rule_any_order_and_replays(
    spark, doc_stream_src
):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    expected = _rows(_batch_rule(spark, docs))
    stores = {}
    for label in ("a", "b"):
        store = f"{doc_stream_src}/{label}/store"
        _run(spark, f"{doc_stream_src}/{label}/stream", store,
             f"{doc_stream_src}/{label}/ckpt")
        stores[label] = _rows(token_budget_from_store(spark, store))
        # the rule actually evicted: the cut store must exist non-empty
        assert spark.read.parquet(f"{store}/cut").count() > 0
        # state bound: per-source admitted tokens ≤ budget
        for r in stores[label]:
            assert r[2] <= BUDGET, r
    assert stores["a"] == expected
    assert stores["b"] == expected  # order-invariant

    # replay: drain the same files again through a FRESH checkpoint —
    # the store must not change (idempotent merge)
    store = f"{doc_stream_src}/a/store"
    _run(spark, f"{doc_stream_src}/a/stream", store,
         f"{doc_stream_src}/a/ckpt_replay")
    assert _rows(token_budget_from_store(spark, store)) == expected


def test_prefix_store_equals_batch_rule_on_prefix(spark, doc_stream_src):
    """After ONE micro-batch file, the store already equals the batch
    rule over just that file — the store is a fixed point at every
    prefix, not only at the end."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    first = docs.filter("doc_id % 3 = 0")  # file b0 of ordering 'a'
    d = f"{doc_stream_src}/prefix"
    os.makedirs(f"{d}/stream", exist_ok=True)
    shutil.copy(
        glob.glob(f"{doc_stream_src}/a/stream/b0.parquet")[0]
        if os.path.isfile(f"{doc_stream_src}/a/stream/b0.parquet")
        else f"{doc_stream_src}/a/stream/b0.parquet",
        f"{d}/stream/b0.parquet",
    )
    _run(spark, f"{d}/stream", f"{d}/store", f"{d}/ckpt")
    assert _rows(token_budget_from_store(spark, f"{d}/store")) == _rows(
        _batch_rule(spark, first)
    )


def test_duplicate_rearrival_resolves_deterministically(spark):
    """Round-8 ADVICE: a doc_id re-arriving with different text must
    resolve deterministically — the STORED (first-seen) row wins, so
    the admitted set and cut are identical across replays. The old
    dropDuplicates kept an arbitrary row."""
    base = tempfile.mkdtemp(prefix="fdp_tokdup_")
    sdir = f"{base}/stream"
    os.makedirs(sdir, exist_ok=True)
    spark.createDataFrame(
        [(1, "s", "a b c"), (2, "s", "x y")],
        "doc_id bigint, source string, text string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/in/f0")
    spark.createDataFrame(
        [(1, "s", "a"), (3, "s", "p q r s")],
        "doc_id bigint, source string, text string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/in/f1")
    for i in range(2):
        src = glob.glob(f"{base}/in/f{i}/part-*.parquet")[0]
        shutil.copy(src, f"{sdir}/b{i}.parquet")

    stores = []
    for run in ("r1", "r2"):
        store, ckpt = f"{base}/{run}/store", f"{base}/{run}/ckpt"
        _run(spark, sdir, store, ckpt)
        rows = sorted(
            map(
                tuple,
                spark.read.parquet(f"{store}/admitted")
                .select("doc_id", "source", "n_toks")
                .collect(),
            )
        )
        stores.append(rows)
    assert stores[0] == stores[1]
    by_id = {r[0]: r[2] for r in stores[0]}
    assert by_id[1] == 3  # first-seen tokens ("a b c"), not the re-arrival
