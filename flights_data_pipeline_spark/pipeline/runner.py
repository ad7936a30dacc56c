"""Pipeline runner: per-ds extract/load fan-out + ordered transforms.

Absorbs the reference's orchestration-level behavior (SURVEY.md §2.12):

* O1 — per-table extract fan-out (the 8 extracts are independent; a
  driver-side thread pool submits them as concurrent Spark jobs),
* O2 — extract→load dependency per table,
* O3 — skip-on-empty propagation (empty day window ⇒ SKIPPED,
  reference ``dags/flights_data_pipeline.py:116-117``),
* O4 — fixed transform topological order, dims before facts
  (``:229-251``),
* O6 — ``--ds`` driven daily runs with backfill; idempotency comes
  from the day-partition overwrite (S6), so re-running a ds is safe.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession

from .etl import TABLES, LoadResult, run_extract_load
from .transforms import TRANSFORM_ORDER, TRANSFORMS


def run_day(
    spark: SparkSession,
    source_dir: str,
    landing_dir: str,
    staging_dir: str,
    ds: str | None,
    max_parallel: int = 8,
) -> list[LoadResult]:
    """Extract+load all 8 tables for one ds (None ⇒ full load).

    Extracts fan out on driver threads (Spark schedules the jobs
    concurrently — O1); each table's load follows its own extract (O2).
    """
    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        futures = [
            pool.submit(
                run_extract_load, spark, source_dir, landing_dir, staging_dir, t, ds
            )
            for t in TABLES
        ]
        return [f.result() for f in futures]


def run_transforms(spark: SparkSession, staging_dir: str, warehouse_dir: str) -> None:
    """Materialize dims then facts in the reference's fixed order (O4)."""
    for name in TRANSFORM_ORDER:
        df = TRANSFORMS[name](spark, staging_dir)
        df.write.mode("overwrite").parquet(f"{warehouse_dir}/{name}")


def run_pipeline(
    spark: SparkSession,
    source_dir: str,
    landing_dir: str,
    staging_dir: str,
    warehouse_dir: str,
    ds_list: list[str],
) -> list[LoadResult]:
    """Backfill-style run over a list of logical dates, then transforms."""
    results: list[LoadResult] = []
    for ds in ds_list:
        results.extend(
            run_day(spark, source_dir, landing_dir, staging_dir, ds)
        )
    run_transforms(spark, staging_dir, warehouse_dir)
    return results
