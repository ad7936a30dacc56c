"""End-to-end: the ELT spine with a real database as the source.

``pipeline/etl.extract`` accepts a ``jdbc:`` source URL; this test
drives ``run_extract_load`` — JDBC watermark extract → CSV landing →
day-partition staging upsert — against an embedded DuckDB database
holding the flights ``bookings`` fixture rows, proving S1/S2/S6 on the
wire path the reference actually uses (its extract is a database
query, ``dags/flights_data_pipeline.py:111-112``). Skipped when no
DuckDB JDBC jar is discoverable.
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest

from flights_data_pipeline_spark.io.jdbc import find_duckdb_jdbc_jar
from flights_data_pipeline_spark.pipeline import fixtures
from flights_data_pipeline_spark.pipeline.etl import (
    LoadStatus,
    read_staging,
    run_extract_load,
)

pytestmark = pytest.mark.skipif(
    find_duckdb_jdbc_jar() is None,
    reason="no DuckDB JDBC driver jar on this machine",
)


@pytest.fixture(scope="module")
def jdbc_source(spark):
    """Fixture source tables loaded into a DuckDB file DB via parquet."""
    d = tempfile.mkdtemp(prefix="fdp_jdbc_src_")
    fixtures.write_source(spark, f"{d}/pq", seed=42, n_bookings=200)
    db = f"{d}/source.duckdb"
    con = duckdb.connect(db)
    con.execute(
        f"CREATE TABLE bookings AS SELECT * FROM '{d}/pq/bookings/*.parquet'"
    )
    con.close()
    return {"url": f"jdbc:duckdb:{db}", "parquet": f"{d}/pq", "work": d}


def test_jdbc_sourced_day_load_matches_parquet_sourced(spark, jdbc_source):
    """The same ds loaded from JDBC and from parquet lands identically."""
    ds = fixtures.DAYS[1].isoformat()
    work = jdbc_source["work"]

    r_jdbc = run_extract_load(
        spark,
        jdbc_source["url"],
        f"{work}/land_jdbc",
        f"{work}/stg_jdbc",
        "bookings",
        ds,
    )
    r_pq = run_extract_load(
        spark,
        jdbc_source["parquet"],
        f"{work}/land_pq",
        f"{work}/stg_pq",
        "bookings",
        ds,
    )
    assert r_jdbc.status == r_pq.status == LoadStatus.LOADED
    assert r_jdbc.n_rows == r_pq.n_rows > 0

    cols = ["book_ref", "book_date", "total_amount", "updated_at"]
    got = sorted(
        map(tuple, read_staging(spark, f"{work}/stg_jdbc", "bookings")
            .select(cols).collect())
    )
    want = sorted(
        map(tuple, read_staging(spark, f"{work}/stg_pq", "bookings")
            .select(cols).collect())
    )
    assert got == want


def test_jdbc_sourced_empty_day_skips(spark, jdbc_source):
    """O3 skip-on-empty holds on the JDBC path too."""
    work = jdbc_source["work"]
    r = run_extract_load(
        spark,
        jdbc_source["url"],
        f"{work}/land_skip",
        f"{work}/stg_skip",
        "bookings",
        "2031-01-01",
    )
    assert r.status == LoadStatus.SKIPPED and r.n_rows == 0
