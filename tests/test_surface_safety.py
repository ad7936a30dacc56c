"""Registry-wide driver-safe surface lint (STATUS.md rules 41-42).

The driver's acceptance canonicalizer (pandas sort + per-cell hash)
cannot handle two type classes identically across engines:

* array/map/struct cells — pandas ``sort_values`` raises (round 7:
  ``pq_encode`` shipped red with an ``array<int>`` surface);
* DecimalType with precision > 18 — DuckDB ``.df()`` renders them as
  float64 (lossy past 2^53) while Spark ``toPandas`` yields
  ``decimal.Decimal`` objects (round 8: ``table_checksum_buckets`` and
  ``checksum_diff_report`` shipped red with DECIMAL(38,0) surfaces).

Every oracle-carrying query's RESULT surface must therefore stay in
the driver-safe set; the exotic type is fine internally. Enforcement
is layered: ``oracle_utils.assert_driver_safe_surface`` runs inside
``compare_query`` (so every ``test_oracle_match`` case lints its real
surface at zero extra cost), ``tools/driver_sim.py`` flags violations
as COMPLEX-TYPE-MISMATCH before the real driver sees them, and this
file proves the lint catches both historical failure classes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .oracle_utils import assert_driver_safe_surface


def test_lint_catches_array_surface(spark):
    """Would have caught round 7's pq_encode (array<int> surface)."""
    df = spark.range(3).select(F.array(F.col("id")).alias("codes"))
    with pytest.raises(AssertionError, match="codes"):
        assert_driver_safe_surface(df, "pq_encode_repro")


def test_lint_catches_wide_decimal_surface(spark):
    """Would have caught round 8's checksum pair (DECIMAL(38,0))."""
    df = spark.range(3).select(F.col("id").cast("decimal(38,0)").alias("checksum"))
    with pytest.raises(AssertionError, match="checksum"):
        assert_driver_safe_surface(df, "checksum_repro")


def test_lint_allows_driver_safe_types(spark):
    df = spark.range(3).select(
        F.col("id"),
        F.col("id").cast("decimal(18,2)").alias("money"),
        F.col("id").cast("string").alias("s"),
        F.col("id").cast("double").alias("d"),
        F.current_date().alias("day"),
    )
    assert_driver_safe_surface(df, "safe")


def test_checksum_queries_now_serialize(spark, sf_dir):
    """The two round-8 red rows now return string checksums."""
    from flights_data_pipeline_spark.queries import REGISTRY

    for name in ("table_checksum_buckets", "checksum_diff_report"):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert_driver_safe_surface(df, name)
        types = dict(df.dtypes)
        for c in ("checksum", "checksum_src", "checksum_replica"):
            if c in types:
                assert types[c] == "string", (name, c, types[c])
