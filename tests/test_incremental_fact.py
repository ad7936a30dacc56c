"""Partition-level incremental fact refresh == full rebuild.

``pipeline/incremental.py`` maintains fct_seat_occupied_daily by
recomputing only the flight_date_key partitions a day's staging load
could have touched. These tests pin the contract on the fixture
pipeline: day-by-day refresh over the full window ends bit-identical
to the full rebuild, a refresh only REWRITES the affected date
partitions (file-level check), and an idempotent re-run changes
nothing.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from flights_data_pipeline_spark.pipeline import fixtures
from flights_data_pipeline_spark.pipeline.incremental import (
    affected_flight_dates,
    build_fact_partitioned,
    refresh_seat_occupancy,
)
from flights_data_pipeline_spark.pipeline.runner import run_day

DAYS = [d.isoformat() for d in fixtures.DAYS]


@pytest.fixture(scope="module")
def staged(spark):
    """Fixture source loaded through the real extract→land→upsert
    spine for every day (staging carries updated_date partitions)."""
    base = tempfile.mkdtemp(prefix="fdp_incr_")
    dirs = {k: f"{base}/{k}" for k in ("source", "landing", "staging")}
    fixtures.write_source(spark, dirs["source"], seed=7, n_bookings=300)
    for ds in DAYS:
        run_day(spark, dirs["source"], dirs["landing"], dirs["staging"], ds)
    return base


def _snapshot(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(path)
        .select(
            "flight_sk",
            "flight_date_key",
            "flight_id",
            "aircraft_code",
            "occupied_seats",
            "total_seats",
            "occupancy_rate",
        )
        .collect()
    )


def test_daywise_refresh_equals_full_rebuild(spark, staged):
    stg = f"{staged}/staging"
    full, incr = f"{staged}/fact_full", f"{staged}/fact_incr"
    build_fact_partitioned(spark, stg, full)
    for ds in DAYS:
        refresh_seat_occupancy(spark, stg, incr, ds)
    assert _snapshot(spark, incr) == _snapshot(spark, full)


def test_refresh_rewrites_only_affected_partitions(spark, staged):
    stg = f"{staged}/staging"
    fact = f"{staged}/fact_touch"
    build_fact_partitioned(spark, stg, fact)

    def mtimes():
        out = {}
        for name in os.listdir(fact):
            if name.startswith("flight_date_key="):
                d = os.path.join(fact, name)
                out[name] = max(
                    os.path.getmtime(os.path.join(d, f))
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
        return out

    before = mtimes()
    ds = DAYS[2]
    affected = {
        f"flight_date_key={r['flight_date_key'].isoformat()}"
        for r in affected_flight_dates(spark, stg, ds).collect()
    }
    n = refresh_seat_occupancy(spark, stg, fact, ds)
    assert n == len(affected) > 0
    after = mtimes()
    rewritten = {k for k in after if after[k] != before.get(k)}
    assert rewritten == affected, (rewritten, affected)
    # untouched partitions must be byte-identical history
    assert set(before) == set(after)


def test_refresh_is_idempotent(spark, staged):
    stg = f"{staged}/staging"
    fact = f"{staged}/fact_idem"
    for ds in DAYS:
        refresh_seat_occupancy(spark, stg, fact, ds)
    before = _snapshot(spark, fact)
    refresh_seat_occupancy(spark, stg, fact, DAYS[3])
    assert _snapshot(spark, fact) == before
