"""Streaming maintenance of the per-domain token budget.

The batch twin (``domain_token_budget``) is oracle-gated; this suite
pins the STREAMING contract of ``domain_token_budget_stream``: after
EVERY prefix of the stream, the surface derived from the winner store
equals the batch query run on exactly the documents seen so far —
including the re-apportionment (a new batch in one domain shifts
every other domain's allocation, which is why the maintained state is
the dedup winner set, not the admitted set) — on two arrival orders;
replays are idempotent; state is one metadata row per (source, fp)
group.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.queries.curation import (
    MIX_BUDGET,
    token_budget_allocation_surface,
)
from flights_data_pipeline_spark.streaming.jobs import (
    domain_token_budget_from_store,
    domain_token_budget_stream,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_stream_src(spark):
    """Corpus split into three micro-batch files, in doc_id-third
    order (a/) and REVERSED thirds (b/)."""
    d = tempfile.mkdtemp(prefix="fdp_dtb_stream_")
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
    q = domain_token_budget_stream(stream, store, checkpoint_dir=checkpoint)
    q.awaitTermination(300)


def _surface(df) -> set:
    return {
        (
            r["source"],
            r["n_surv"],
            r["surv_tokens"],
            r["alloc"],
            r["n_admitted"],
            r["tokens_admitted"],
        )
        for r in df.collect()
    }


def _batch_on(seen) -> set:
    """The batch rule applied to exactly the ``seen`` documents,
    through the same shared core the registered query uses."""
    base = seen.select(
        "doc_id",
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.when(
            F.col("text").isNotNull(),
            F.size(F.split(F.trim(F.col("text")), r"\s+")),
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    surv = (
        base.withColumn(
            "dup_rn",
            F.row_number().over(
                W.partitionBy("source", "fp").orderBy("h", "doc_id")
            ),
        )
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn", "fp")
    )
    return _surface(token_budget_allocation_surface(surv, MIX_BUDGET))


def test_every_prefix_matches_batch(spark, doc_stream_src):
    """Drain the stream one file at a time; after each prefix the
    store-derived surface equals the batch rule over the documents
    seen so far — re-apportionment included."""
    d = doc_stream_src
    pdir = f"{d}/p"
    os.makedirs(f"{pdir}/stream", exist_ok=True)
    seen = None
    for i in range(3):
        shutil.copy(f"{d}/a/stream/b{i}.parquet", f"{pdir}/stream/b{i}.parquet")
        _run(spark, f"{pdir}/stream", f"{pdir}/store", f"{pdir}/ckpt")
        part = spark.read.parquet(f"{d}/a/stream/b{i}.parquet")
        seen = part if seen is None else seen.unionByName(part)
        got = _surface(domain_token_budget_from_store(spark, f"{pdir}/store"))
        assert got == _batch_on(seen), f"prefix {i}"


def test_arrival_order_does_not_matter(spark, doc_stream_src):
    d = doc_stream_src
    _run(spark, f"{d}/b/stream", f"{d}/b/store", f"{d}/b/ckpt")
    got = _surface(domain_token_budget_from_store(spark, f"{d}/b/store"))
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    assert got == _batch_on(docs)


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
