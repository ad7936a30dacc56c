"""Clustered fact writes: same content, pruning-friendly layout."""

from __future__ import annotations

import glob
import tempfile
from collections import Counter

import pyarrow.parquet as pq
import pytest

from flights_data_pipeline_spark.pipeline import fixtures
from flights_data_pipeline_spark.pipeline.runner import run_day, run_transforms


@pytest.fixture(scope="module")
def staged(spark):
    d = tempfile.mkdtemp(prefix="fdp_cluster_")
    fixtures.write_source(spark, f"{d}/src", seed=42, n_bookings=300)
    run_day(spark, f"{d}/src", f"{d}/land", f"{d}/stg", ds=None)
    return d


def test_clustered_facts_equal_plain(spark, staged):
    d = staged
    run_transforms(spark, f"{d}/stg", f"{d}/wh_plain")
    run_transforms(spark, f"{d}/stg", f"{d}/wh_clustered", clustered=True)

    for fact in (
        "fct_booking_ticket",
        "fct_flight_activity",
        "fct_boarding_pass",
        "fct_seat_occupied_daily",
    ):
        plain = Counter(
            map(tuple, spark.read.parquet(f"{d}/wh_plain/{fact}").collect())
        )
        clustered = Counter(
            map(tuple, spark.read.parquet(f"{d}/wh_clustered/{fact}").collect())
        )
        assert plain == clustered, fact


def test_clustered_fact_files_have_disjoint_key_ranges(spark, staged):
    """Range repartitioning gives each output file its own key range —
    the file-level half of the data-skipping contract."""
    d = staged
    run_transforms(spark, f"{d}/stg", f"{d}/wh_c2", clustered=True)
    ranges = []
    for f in sorted(glob.glob(f"{d}/wh_c2/fct_booking_ticket/*.parquet")):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        for c in range(md.num_columns):
            col = md.row_group(0).column(c)
            if col.path_in_schema == "ticket_no":
                lo = col.statistics.min
                hi = md.row_group(md.num_row_groups - 1).column(c).statistics.max
                ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 2  # actually split across files
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges  # disjoint (sorted) file key ranges


def test_zorder_layout_equals_plain(spark, staged):
    """layout='zorder' rewrites multi-key facts via Morton clustering
    with identical content; single-key facts fall back to sorted."""
    d = staged
    run_transforms(spark, f"{d}/stg", f"{d}/wh_plain2")
    run_transforms(spark, f"{d}/stg", f"{d}/wh_z", clustered=True, layout="zorder")
    for fact in ("fct_seat_occupied_daily", "fct_booking_ticket"):
        plain = Counter(
            map(tuple, spark.read.parquet(f"{d}/wh_plain2/{fact}").collect())
        )
        z = Counter(map(tuple, spark.read.parquet(f"{d}/wh_z/{fact}").collect()))
        assert plain == z, fact


def test_run_transforms_rejects_unknown_layout(spark, staged):
    import pytest

    with pytest.raises(ValueError, match="layout"):
        run_transforms(
            spark, f"{staged}/stg", f"{staged}/wh_bad", clustered=True,
            layout="hilbert",
        )
