"""Anti-entropy bucketed checksums: agreement, sensitivity, invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.operators.checksum import (
    bucket_checksums,
    tables_agree,
)

from .conftest import SF_DIR

COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def test_identical_tables_agree_regardless_of_layout(spark):
    o = load_table(spark, SF_DIR, "orders")
    shuffled = o.repartition(13, "o_custkey")  # different partitioning
    assert tables_agree(o, shuffled, COLS)


def test_single_row_mutation_is_detected(spark):
    o = load_table(spark, SF_DIR, "orders")
    mutated = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 7, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    assert not tables_agree(o, mutated, COLS)


def test_null_and_delimiter_rows_do_not_collide(spark):
    """The canonical encoding is injective: NULL-position swaps and
    delimiter-straddling values (the classic concat_ws collisions) must
    read as DIFFERENT tables (round-7 ADVICE)."""
    cols = "a string, b string, c string"
    cases = [
        # NULL-position swap: concat_ws would render both as 'a|b'.
        ([("a", None, "b")], [("a", "b", None)]),
        # Delimiter straddle: naive join renders both as 'a|b|c'.
        ([("a|b", "c", "z")], [("a", "b|c", "z")]),
        # Value vs NULL sentinel lookalike.
        ([("\\N", "x", "y")], [(None, "x", "y")]),
        # Escape-char straddle.
        ([("a\\", "|b", "z")], [("a", "\\|b", "z")]),
    ]
    for left, right in cases:
        la = spark.createDataFrame(left, cols)
        rb = spark.createDataFrame(right, cols)
        assert not tables_agree(la, rb, ["a", "b", "c"]), (left, right)
        assert tables_agree(la, la, ["a", "b", "c"])


def test_mismatch_localizes_to_one_bucket(spark):
    """The divergent row flips exactly the buckets its old/new digests
    land in — the drill-down property the operator exists for."""
    o = load_table(spark, SF_DIR, "orders")
    mutated = o.withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") == 7, F.lit("9-FAKE")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    a = {r["bucket"]: (r["n_rows"], r["checksum"]) for r in bucket_checksums(o, COLS).collect()}
    b = {r["bucket"]: (r["n_rows"], r["checksum"]) for r in bucket_checksums(mutated, COLS).collect()}
    diff = {k for k in set(a) | set(b) if a.get(k) != b.get(k)}
    assert 1 <= len(diff) <= 2  # old digest's bucket and/or new digest's
