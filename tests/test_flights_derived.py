"""Derived flights fixtures: cross-engine staging parity + end-to-end
oracle matches.

``pipeline/derive.py`` renders ONE dialect-parameterized SQL text for
both engines; these tests pin that the two renderings agree exactly
(multiset of normalized rows) at sf0.001, table by table — the property
every ``flights_*`` registry oracle stands on — and that the registry
queries (full physical pipeline: CSV landing, day-window upserts,
transform DAG) hash-match the analytic DuckDB recomputation.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter
from decimal import Decimal

import duckdb
import pytest

from flights_data_pipeline_spark.pipeline import derive
from flights_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

_BASE_TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in _BASE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, Decimal):
        return ("d", str(v))
    if isinstance(v, dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("D", v.isoformat())
    if isinstance(v, float):
        return ("f", "nan" if math.isnan(v) else repr(v))
    if hasattr(v, "asDict"):
        v = v.asDict()
    if isinstance(v, dict):
        return ("s", tuple(sorted((k, _norm(x)) for k, x in v.items())))
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("table", derive.STAGING_TABLES)
def test_staging_derivation_matches_duckdb(spark, duck, table):
    sdf = spark.sql(derive.table_sql(derive.spark_dialect(SF), table))
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(derive.table_sql(derive.DUCK, table))
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) > 0, f"{table}: empty derivation"
    assert _multiset(sdf.columns, srows) == _multiset(ocols, orows), table


def test_updated_at_stays_inside_derive_days(spark):
    """Every derived row must be reachable by the day-window extraction
    over DERIVE_DAYS — a row outside the window silently vanishes from
    staging and the oracle mismatch would be hard to localize."""
    d = derive.spark_dialect(SF)
    lo = f"{derive.DERIVE_DAYS[0]} 00:00:00"
    hi = f"{derive.DERIVE_DAYS[-1]} 23:59:59"
    for table in derive.STAGING_TABLES:
        df = spark.sql(derive.table_sql(d, table))
        bad = df.filter(f"updated_at < '{lo}' OR updated_at > '{hi}'").count()
        assert bad == 0, f"{table}: {bad} rows outside the extraction window"


@pytest.mark.parametrize(
    "name",
    [
        "flights_seat_occupancy_daily",
        "flights_booking_ticket_rollup",
        "flights_passenger_dim",
        "flights_activity_delays",
        "flights_boarding_fact",
        "flights_dim_seat",
        "flights_dim_airport",
        "flights_dim_aircrafts",
    ],
)
def test_flights_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    assert q.oracle is not None, f"{name} must carry a DuckDB oracle"
    sdf = q.fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(q.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) > 0
    assert _multiset(sdf.columns, srows) == _multiset(ocols, orows), name


def test_booking_rollup_reconciles(spark):
    """Derived booking totals are built FROM the segment cents, so
    every booking with segments must reconcile exactly — an end-to-end
    conservation invariant across the decimal CSV round trip."""
    df = REGISTRY["flights_booking_ticket_rollup"].fn(spark, SF)
    assert df.filter("NOT reconciles").count() == 0
