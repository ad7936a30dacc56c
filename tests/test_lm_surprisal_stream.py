"""Streaming maintenance of the LM-surprisal quality filter.

The batch twin (``lm_surprisal_filter``) is oracle-gated; this suite
pins the STREAMING contract of ``lm_surprisal_stream``: after EVERY
prefix of the stream, the surface derived from the bigram store
equals the batch rule run on exactly the documents seen so far —
including the global model shift (every batch changes c1/c12/V for
ALL previously-seen docs, which is why the maintained state is the
per-doc bigram sufficient statistic, not any score) — on two arrival
orders; replays are idempotent; state is one row per distinct
(doc_id, bigram type) plus one sentinel per doc.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.queries.text import (
    doc_bigram_counts,
    lm_surprisal_surface,
)
from flights_data_pipeline_spark.streaming.jobs import (
    lm_surprisal_from_store,
    lm_surprisal_stream,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_stream_src(spark):
    """Corpus split into three micro-batch files, in doc_id-third
    order (a/) and REVERSED thirds (b/)."""
    d = tempfile.mkdtemp(prefix="fdp_lms_stream_")
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
    q = lm_surprisal_stream(stream, store, checkpoint_dir=checkpoint)
    q.awaitTermination(300)


def _surface(df) -> set:
    return {
        (
            r["doc_id"],
            r["n_bigrams"],
            r["total_bits"],
            r["avg_bits"],
            r["is_high_surprisal"],
            r["is_low_surprisal"],
        )
        for r in df.collect()
    }


def _batch_on(seen) -> set:
    """The batch rule applied to exactly the ``seen`` documents,
    through the same shared core the registered query uses."""
    return _surface(
        lm_surprisal_surface(seen.select("doc_id"), doc_bigram_counts(seen))
    )


def test_every_prefix_matches_batch(spark, doc_stream_src):
    """Drain the stream one file at a time; after each prefix the
    store-derived surface equals the batch rule over the documents
    seen so far — the global model shift included (doc scores from
    earlier prefixes are NOT stable; the equality proves the store
    re-derives them under the grown model)."""
    d = doc_stream_src
    pdir = f"{d}/p"
    os.makedirs(f"{pdir}/stream", exist_ok=True)
    seen = None
    for i in range(3):
        shutil.copy(f"{d}/a/stream/b{i}.parquet", f"{pdir}/stream/b{i}.parquet")
        _run(spark, f"{pdir}/stream", f"{pdir}/store", f"{pdir}/ckpt")
        part = spark.read.parquet(f"{d}/a/stream/b{i}.parquet")
        seen = part if seen is None else seen.unionByName(part)
        got = _surface(lm_surprisal_from_store(spark, f"{pdir}/store"))
        assert got == _batch_on(seen), f"prefix {i}"


def test_arrival_order_does_not_matter(spark, doc_stream_src):
    d = doc_stream_src
    _run(spark, f"{d}/b/stream", f"{d}/b/store", f"{d}/b/ckpt")
    got = _surface(lm_surprisal_from_store(spark, f"{d}/b/store"))
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    assert got == _batch_on(docs)


def test_full_stream_matches_registered_query(spark, doc_stream_src):
    """The store readout equals the oracle-gated registry query
    itself at full drain — not just the shared core."""
    from flights_data_pipeline_spark.queries import REGISTRY

    d = doc_stream_src
    store = f"{d}/a/store_reg"
    _run(spark, f"{d}/a/stream", store, f"{d}/a/ckpt_reg")
    got = _surface(lm_surprisal_from_store(spark, store))
    want = _surface(REGISTRY["lm_surprisal_filter"].fn(spark, SF_DIR))
    assert got == want


def test_replay_is_idempotent_and_state_is_bigram_grain(
    spark, doc_stream_src
):
    d = doc_stream_src
    store = f"{d}/a/store_replay"
    _run(spark, f"{d}/a/stream", store, f"{d}/a/ckpt_r1")
    # multiset compare (sentinel rows carry None, which won't sort
    # against strings)
    from collections import Counter

    before = Counter(tuple(r) for r in spark.read.parquet(store).collect())
    _run(spark, f"{d}/a/stream", store, f"{d}/a/ckpt_r2")
    after = Counter(tuple(r) for r in spark.read.parquet(store).collect())
    assert before == after
    st = spark.read.parquet(store)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()
    n_types = doc_bigram_counts(docs).count()
    assert st.filter(F.col("w1").isNull()).count() == n_docs
    assert st.filter(F.col("w1").isNotNull()).count() == n_types
    # grow-only keyed store: no duplicate (doc_id, w1, w2) anywhere
    assert (
        st.count()
        == st.select("doc_id", "w1", "w2").distinct().count()
    )
