"""Plan-fingerprinted result cache (io/result_cache.py): hit on an
identical plan over identical inputs, miss when either changes, and
correct results either way."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.io.result_cache import cached, plan_fingerprint

from .conftest import SF_DIR


def _q(spark, sf_dir=SF_DIR):
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def test_hit_returns_same_rows_without_recompute(spark, tmp_path):
    d = str(tmp_path / "cache")
    first = sorted(tuple(r) for r in cached(spark, _q(spark), d).collect())
    # exactly one cache entry landed
    entries = [p for p in os.listdir(d) if not p.endswith("__staged")]
    assert len(entries) == 1
    marker = os.path.join(d, entries[0], "_SUCCESS")
    mtime = os.stat(marker).st_mtime_ns
    # second call: same rows, entry untouched (read path, not rewrite)
    second = sorted(tuple(r) for r in cached(spark, _q(spark), d).collect())
    assert second == first
    assert os.stat(marker).st_mtime_ns == mtime
    assert len(os.listdir(d)) == 1


def test_fingerprint_survives_rederivation_and_sees_plan_change(spark):
    a = plan_fingerprint(_q(spark))
    b = plan_fingerprint(_q(spark))  # fresh DataFrame, same plan
    assert a == b
    c = plan_fingerprint(_q(spark).filter(F.col("n") > 0))
    assert c != a


def test_input_file_change_invalidates(spark, tmp_path):
    src = str(tmp_path / "tbl")
    load_table(spark, SF_DIR, "nation").write.parquet(src)
    df = spark.read.parquet(src).groupBy("n_regionkey").count()
    k1 = plan_fingerprint(df)
    # same bytes, newer mtime -> different input state -> new key
    time.sleep(0.01)
    for root, _, names in os.walk(src):
        for n in names:
            os.utime(os.path.join(root, n))
    k2 = plan_fingerprint(spark.read.parquet(src).groupBy("n_regionkey").count())
    assert k2 != k1
