"""jdbc_scan input validation — no database needed (raises before any
JVM reader is touched). ADVICE round 2: ds/watermark_col/table are
interpolated into pushed-down SQL and must be shape-checked;
partition_column without both bounds dies JVM-side with an opaque
NullPointerException otherwise.
"""

from __future__ import annotations

import pytest

from flights_data_pipeline_spark.io.jdbc import JdbcConfig, jdbc_scan

CFG = JdbcConfig(url="jdbc:duckdb:/tmp/nope.duckdb", table="bookings")


def test_rejects_malformed_ds(spark):
    with pytest.raises(ValueError, match="YYYY-MM-DD"):
        jdbc_scan(spark, CFG, ds="2024-1-2")
    with pytest.raises(ValueError, match="YYYY-MM-DD"):
        jdbc_scan(spark, CFG, ds="2024-01-01' OR '1'='1")


def test_rejects_non_identifier_watermark_col(spark):
    with pytest.raises(ValueError, match="identifier"):
        jdbc_scan(spark, CFG, ds="2024-01-01", watermark_col="ts; DROP TABLE x")


def test_rejects_non_identifier_table(spark):
    bad = JdbcConfig(url=CFG.url, table="bookings WHERE 1=1 --")
    with pytest.raises(ValueError, match="identifier"):
        jdbc_scan(spark, bad, ds="2024-01-01")


def test_schema_qualified_table_accepted_as_identifier():
    # bookings.flights-style names are the reference's own layout —
    # the identifier check must not reject them
    from flights_data_pipeline_spark.io.jdbc import _DS_RE, _IDENT_RE

    assert _IDENT_RE.match("bookings.flights")
    assert _IDENT_RE.match("flights")
    assert not _IDENT_RE.match("bookings.flights.extra")
    assert _DS_RE.match("2024-01-01")


def test_partition_column_requires_bounds(spark):
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        jdbc_scan(spark, CFG, partition_column="id")
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        jdbc_scan(spark, CFG, partition_column="id", lower_bound="0")
