"""Live JDBC path against an embedded DuckDB file database.

The reference's real source/sink is a database over the wire
(psycopg2 extract ``dags/flights_data_pipeline.py:111-112``, batch
insert ``:194-195``). No server ships in this environment, so the
live test uses DuckDB-over-JDBC as the stand-in engine: a file
database exercises the exact same Spark JDBC code paths (driver
class loading, dialect-generated SQL, pushed-down subquery scans,
batched inserts). Skipped when no driver jar is discoverable.
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.jdbc import (
    JdbcConfig,
    find_duckdb_jdbc_jar,
    jdbc_scan,
    jdbc_write,
)

pytestmark = pytest.mark.skipif(
    find_duckdb_jdbc_jar() is None,
    reason="no DuckDB JDBC driver jar on this machine",
)

DRIVER = "org.duckdb.DuckDBDriver"


@pytest.fixture(scope="module")
def db_path():
    d = tempfile.mkdtemp(prefix="fdp_jdbc_")
    path = f"{d}/wh.duckdb"
    con = duckdb.connect(path)
    con.execute(
        """
        CREATE TABLE bookings (
          book_ref VARCHAR, total_amount DECIMAL(18,2), updated_at TIMESTAMP
        )
        """
    )
    con.execute(
        """
        INSERT INTO bookings VALUES
          ('b1', 100.50, TIMESTAMP '2024-01-01 10:00:00'),
          ('b2', 200.00, TIMESTAMP '2024-01-02 09:30:00'),
          ('b3', 300.25, TIMESTAMP '2024-01-02 23:59:59'),
          ('b4', 400.75, TIMESTAMP '2024-01-03 00:00:00')
        """
    )
    # pre-created staging table for the batch-insert sink test (the
    # reference inserts into DDL-managed staging tables — S5 is append)
    con.execute("CREATE TABLE stg_amounts (ref VARCHAR, amount DECIMAL(18,2))")
    con.close()
    return path


def _cfg(db_path, table="bookings"):
    return JdbcConfig(url=f"jdbc:duckdb:{db_path}", table=table, driver=DRIVER)


def test_jdbc_full_scan(spark, db_path):
    """S1: full-table scan through a real JDBC connection."""
    df = jdbc_scan(spark, _cfg(db_path))
    rows = {r.book_ref: float(r.total_amount) for r in df.collect()}
    assert rows == {"b1": 100.50, "b2": 200.00, "b3": 300.25, "b4": 400.75}


def test_jdbc_watermark_scan_pushdown(spark, db_path):
    """S2: the closed day window runs INSIDE the database (the dbtable
    is a subquery), so only the day's rows cross the wire."""
    df = jdbc_scan(spark, _cfg(db_path), ds="2024-01-02")
    refs = sorted(r.book_ref for r in df.collect())
    assert refs == ["b2", "b3"]  # inclusive 23:59:59, excludes 01-03 00:00
    # the pushed-down window must appear in the scan's generated query
    assert "23:59:59" in df._jdf.queryExecution().simpleString()


def test_jdbc_batch_insert_roundtrip(spark, db_path):
    """S5: Spark writes a batch over JDBC; the database sees the rows."""
    out = spark.createDataFrame(
        [("s1", 10.0), ("s2", 20.5)], "ref STRING, amount DOUBLE"
    ).select("ref", F.col("amount").cast("decimal(18,2)").alias("amount"))
    jdbc_write(out, _cfg(db_path, table="stg_amounts"), mode="append")
    con = duckdb.connect(db_path, read_only=True)
    got = dict(con.execute("SELECT ref, amount FROM stg_amounts").fetchall())
    con.close()
    assert {k: float(v) for k, v in got.items()} == {"s1": 10.0, "s2": 20.5}


def test_jdbc_half_open_window_catches_subsecond_tail(spark, tmp_path):
    """The Postgres dialect pin made live: a timestamp(6) row at
    23:59:59.5 falls INSIDE the day but OUTSIDE the reference-shaped
    closed [00:00:00, 23:59:59] window; half_open=True (>= day AND
    < day+1) captures it and still excludes the next day's midnight."""
    path = f"{tmp_path}/frac.duckdb"
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE wm (id VARCHAR, updated_at TIMESTAMP)"
    )
    con.execute(
        """
        INSERT INTO wm VALUES
          ('in_day',    TIMESTAMP '2024-01-02 12:00:00'),
          ('tail_frac', TIMESTAMP '2024-01-02 23:59:59.500'),
          ('next_day',  TIMESTAMP '2024-01-03 00:00:00')
        """
    )
    con.close()
    cfg = JdbcConfig(url=f"jdbc:duckdb:{path}", table="wm", driver=DRIVER)

    closed = sorted(
        r.id for r in jdbc_scan(spark, cfg, ds="2024-01-02").collect()
    )
    assert closed == ["in_day"]  # the documented sub-second blind spot

    half = sorted(
        r.id
        for r in jdbc_scan(
            spark, cfg, ds="2024-01-02", half_open=True
        ).collect()
    )
    assert half == ["in_day", "tail_frac"]
    # consecutive half-open windows partition the timeline exactly once
    nxt = sorted(
        r.id
        for r in jdbc_scan(
            spark, cfg, ds="2024-01-03", half_open=True
        ).collect()
    )
    assert nxt == ["next_day"]


def test_jdbc_federated_join_broadcasts_dim(spark, tmp_path):
    """Federated plan: a parquet fact joined to a JDBC-served dim in
    ONE DataFrame plan — result equals the pure-parquet join, and the
    JDBC side (a tiny dim) is BROADCAST, so the fact never shuffles
    for it. This is the lakehouse enrichment shape: facts on object
    store, reference data in an operational database.
    """
    from .conftest import SF_DIR

    db = f"{tmp_path}/dim.duckdb"
    con = duckdb.connect(db)
    con.execute(
        f"CREATE TABLE nation AS "
        f"SELECT * FROM '{SF_DIR}/nation.parquet'"
    )
    con.close()

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    dim = jdbc_scan(spark, JdbcConfig(url=f"jdbc:duckdb:{db}", table="nation", driver=DRIVER))
    fed = (
        cust.join(
            F.broadcast(dim), cust.c_nationkey == dim.n_nationkey
        )
        .groupBy("n_name")
        .agg(F.count("*").cast("long").alias("n_customers"))
    )
    got = {r["n_name"]: r["n_customers"] for r in fed.collect()}

    pq_dim = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    want = {
        r["n_name"]: r["n_customers"]
        for r in cust.join(pq_dim, cust.c_nationkey == pq_dim.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .collect()
    }
    assert got == want and sum(got.values()) == cust.count()
    plan = fed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "JDBCRelation" in plan
