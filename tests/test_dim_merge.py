"""SCD-1 incremental dimension loads via MERGE (type-1 overwrite).

The reference rebuilds dims every run (small at demo scale); at real
scale dims load incrementally with ON CONFLICT DO UPDATE semantics
(SURVEY.md §4.4 [inferred]). ``merge_dim`` is that path: changed
attributes overwrite in place, new keys insert, untouched keys
survive, surrogate keys stay stable.
"""

from __future__ import annotations

import tempfile

import pytest

from flights_data_pipeline_spark.pipeline.transforms import merge_dim


@pytest.fixture()
def wh():
    return tempfile.mkdtemp(prefix="fdp_dim_merge_") + "/wh"


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "passenger_sk STRING, passenger_id STRING, passenger_name STRING"
    )


def test_scd1_merge_updates_in_place(spark, wh):
    v1 = _dim(spark, [("sk_a", "A", "Alice"), ("sk_b", "B", "Bob")])
    n1 = merge_dim(spark, wh, "dim_passenger", v1)
    assert n1 == 2

    # increment: A renamed (type-1 overwrite), C new, B untouched
    inc = _dim(spark, [("sk_a", "A", "Alicia"), ("sk_c", "C", "Cara")])
    n2 = merge_dim(spark, wh, "dim_passenger", inc)
    assert n2 == 3

    got = {
        r.passenger_id: (r.passenger_sk, r.passenger_name)
        for r in spark.read.parquet(f"{wh}/dim_passenger").collect()
    }
    assert got == {
        "A": ("sk_a", "Alicia"),  # updated in place, SK stable
        "B": ("sk_b", "Bob"),     # untouched key survives
        "C": ("sk_c", "Cara"),    # new key inserted
    }


def test_scd1_merge_rerun_idempotent(spark, wh):
    v1 = _dim(spark, [("sk_a", "A", "Alice")])
    merge_dim(spark, wh, "dim_passenger", v1)
    inc = _dim(spark, [("sk_a", "A", "Alicia")])
    merge_dim(spark, wh, "dim_passenger", inc)
    snap1 = sorted(map(tuple, spark.read.parquet(f"{wh}/dim_passenger").collect()))
    merge_dim(spark, wh, "dim_passenger", inc)  # replay the same increment
    snap2 = sorted(map(tuple, spark.read.parquet(f"{wh}/dim_passenger").collect()))
    assert snap1 == snap2 == [("sk_a", "A", "Alicia")]
