"""SparkSession factory — M0 of the build plan (SURVEY.md §7.1).

Design decisions (all aimed at oracle-exact correctness + 100 TB posture):

* ``spark.sql.session.timeZone=UTC`` — the reference compares
  ``'{ds} 23:59:59'`` strings against timestamptz columns
  (reference ``dags/flights_data_pipeline.py:104-105``); pinning UTC makes
  day-window semantics deterministic and matches DuckDB's UTC-naive
  timestamps for the oracle tests.
* AQE on (+ coalescePartitions + skewJoin) — runtime re-planning at shuffle
  boundaries is the main lever that keeps a static plan viable at 1000×
  the test data.
* ``partitionOverwriteMode=dynamic`` — the engine's only mutation primitive
  is delete-day-window+insert (reference ``:168-177``); dynamic partition
  overwrite is the Spark-native equivalent (SURVEY.md §2.1 S6).
* shuffle partitions default to the local core count — 200 is wrong for
  local[32]; on a real cluster this would be set to ~2-3× total cores.
* Arrow enabled — every Python-side exchange (createDataFrame, toPandas,
  pandas_udf) is vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)


def get_spark(
    app_name: str = "flights-data-pipeline-spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession with pinned semantics."""
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # filter pushdown into Python DataSources (io/pysource.py) —
        # off by default in 4.1, required for pushFilters to be called
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        # ContextCleaner frees shuffle files / broadcasts only after a
        # driver GC collects their refs; on a large-heap local session
        # GC is rare, so state accumulates and repeated queries degrade
        # 10-30× (measured). Forcing a periodic GC keeps cleanup flowing.
        .config("spark.cleaner.periodicGC.interval", "1min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_persistent_spark(
    warehouse_dir: str,
    app_name: str = "flights-data-pipeline-spark-metastore",
    *,
    cpus: int | None = None,
) -> SparkSession:
    """A session whose catalog SURVIVES the process: Hive-compatible
    metastore (embedded Derby, stored under ``warehouse_dir``) instead
    of the default in-memory catalog.

    Why it exists: bucketed layouts (``io/layout.write_bucketed``) are
    only zero-shuffle-joinable while the BUCKET SPEC is in a catalog —
    with the in-memory catalog that metadata dies with the session,
    so a nightly job would re-shuffle what last night's job carefully
    co-bucketed. Production replaces Derby with a shared metastore
    service or a table format's own catalog; the calling code is
    identical, which is the point of proving the flow here.

    Caveats: Derby is single-process (fine for one driver at a time —
    exactly the local deployment), and this must be the FIRST session
    in the JVM (enableHiveSupport cannot retrofit a live session).
    """
    cpus = cpus or default_parallelism()
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.warehouse.dir", os.path.join(warehouse_dir, "wh"))
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={os.path.join(warehouse_dir, 'derby')}",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )
