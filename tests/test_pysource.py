"""Custom Python DataSource: determinism, partition planning, filter
pushdown exactness, Arrow-batch reads, and replayable streaming."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.pysource import register

N = 5000
OPTS = {"n_rows": str(N), "n_partitions": "4", "rows_per_batch": "500"}


@pytest.fixture()
def src(spark):
    register(spark)
    return spark.read.format("synthetic_events").options(**OPTS)


def test_batch_shape_and_determinism(spark, src):
    df = src.load()
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    a = Counter(tuple(r) for r in df.collect())
    b = Counter(tuple(r) for r in src.load().collect())
    assert a == b
    assert sum(a.values()) == N
    assert len({r for r in a}) == N  # event_id unique => all rows distinct


def test_partition_planning(spark, src):
    df = src.load()
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 4
    # every partition carries a contiguous, disjoint id range
    ranges = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"),
             F.count("*").alias("n"))
        .orderBy("lo")
        .collect()
    )
    covered = 0
    for r in ranges:
        assert r.lo == covered and r.n == r.hi - r.lo + 1
        covered = r.hi + 1
    assert covered == N


def test_filter_pushdown_matches_post_filter(spark, src):
    full = src.load().collect()
    pushed = src.load().filter(
        (F.col("event_id") >= 1200) & (F.col("event_id") < 1300)
    ).collect()
    expect = [r for r in full if 1200 <= r.event_id < 1300]
    assert Counter(map(tuple, pushed)) == Counter(map(tuple, expect))
    # point lookup via EqualTo
    one = src.load().filter(F.col("event_id") == 42).collect()
    assert len(one) == 1 and one[0].event_id == 42
    # fully-pruned range is empty, not an error
    assert src.load().filter(F.col("event_id") < 0).count() == 0
    # non-range predicate stays correct (yielded back to Spark)
    purchases = src.load().filter(F.col("event_type") == "purchase").collect()
    assert Counter(map(tuple, purchases)) == Counter(
        tuple(r) for r in full if r.event_type == "purchase"
    )


def test_value_domain(spark, src):
    row = src.load().agg(
        F.min("value").alias("vlo"), F.max("value").alias("vhi"),
        F.countDistinct("event_type").alias("nt"),
        F.countDistinct("user_id").alias("nu"),
        F.min("ts").alias("t0"),
    ).collect()[0]
    assert 0.0 <= row.vlo and row.vhi < 100.0
    assert row.nt == 5
    assert row.nu == 50
    assert row.t0.year == 2024


def test_stream_reader_replays_deterministically(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("synthetic_events")
        .options(**OPTS)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    n = got.count()
    assert n >= 500 and n % 500 == 0
    # the streamed prefix is bit-equal to the batch source's prefix
    batch = spark.read.format("synthetic_events").options(**OPTS).load().filter(
        F.col("event_id") < n
    )
    assert Counter(map(tuple, got.collect())) == Counter(
        map(tuple, batch.collect())
    )
