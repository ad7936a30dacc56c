"""Flights star-schema pipeline exposed as driver-checkable queries.

The end-to-end reference-parity pipeline (fixtures → extract → CSV
landing → staging upsert → dims/facts; SURVEY.md §7.1 M3) runs on
generated flights-domain data, not the driver's TPC-H-ish tables, so
these queries carry no DuckDB oracle (the driver records a rows-only
check). The *real* oracle coverage lives in
``tests/test_flights_pipeline.py``: every dim/fact hash-matches a
DuckDB twin there, plus idempotency / skip-on-empty / property tests.

The pipeline materializes once per process into a temp warehouse and
each query reads the resulting parquet.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import fixtures
from ..pipeline.runner import run_pipeline
from .registry import query

_WAREHOUSE: str | None = None


def _warehouse(spark: SparkSession) -> str:
    """Run the full pipeline once per process; return the warehouse dir."""
    global _WAREHOUSE
    if _WAREHOUSE is None or not os.path.isdir(_WAREHOUSE):
        base = tempfile.mkdtemp(prefix="fdp_flights_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        dirs = {k: f"{base}/{k}" for k in ("source", "landing", "staging", "warehouse")}
        fixtures.write_source(spark, dirs["source"], seed=42, n_bookings=400)
        run_pipeline(
            spark,
            dirs["source"],
            dirs["landing"],
            dirs["staging"],
            dirs["warehouse"],
            [d.isoformat() for d in fixtures.DAYS],
        )
        _WAREHOUSE = dirs["warehouse"]
    return _WAREHOUSE


@query("flights_seat_occupancy_daily")
def flights_seat_occupancy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The minimum end-to-end slice (SURVEY.md §7.2): daily seat
    occupancy through the whole extract→stage→transform pipeline."""
    wh = _warehouse(spark)
    return spark.read.parquet(f"{wh}/fct_seat_occupied_daily")


@query("flights_booking_ticket_rollup")
def flights_booking_ticket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Booking-grain rollup of the segment fact (A4 decimal sums):
    reconciles SUM(amount) per booking against the booking total."""
    wh = _warehouse(spark)
    f = spark.read.parquet(f"{wh}/fct_booking_ticket")
    return (
        f.groupBy("book_ref", "booking_total_amount")
        .agg(
            F.count("*").cast("bigint").alias("n_segments"),
            F.sum("amount").cast("decimal(18,2)").alias("segments_amount"),
        )
        .select(
            "book_ref",
            "n_segments",
            "segments_amount",
            "booking_total_amount",
            (F.col("segments_amount") == F.col("booking_total_amount")).alias(
                "reconciles"
            ),
        )
    )


@query("flights_passenger_dim")
def flights_passenger_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_passenger: P5 dedup + F2 null-safe JSON extraction output."""
    wh = _warehouse(spark)
    return spark.read.parquet(f"{wh}/dim_passenger")
