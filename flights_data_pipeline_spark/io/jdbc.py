"""JDBC source/sink wrappers (SURVEY.md §2.1 S1/S2/S5).

The reference extracts with ``SELECT * FROM bookings.<t>`` over
psycopg2 (reference ``dags/flights_data_pipeline.py:111-112``) and
loads with batch inserts (``:194-195``). Spark's JDBC source replaces
both; these wrappers pin the engine's conventions:

* incremental extracts push the day window into the database
  (predicate appears in the generated WHERE clause — S2),
* reads parallelize with ``partitionColumn`` bounds (the reference is
  single-connection pandas, its documented scale ceiling —
  SURVEY.md §4.2),
* writes batch with rewriteBatchedStatements-style options.

No database *server* ships in this environment; the live-path tests
(``tests/test_jdbc.py``) run against an embedded file database when a
DuckDB JDBC driver jar is discoverable on the machine (see
``find_duckdb_jdbc_jar``), and skip otherwise. The parquet path
(``catalog``) stands in for JDBC everywhere else (SURVEY.md §2.1 S1
note).

**Postgres dialect pins** (the reference's actual engine; unprovable
live here, so the assumptions are stated where they bite):

* **Watermark column type**: the day-window literals compare cleanly
  against ``timestamp`` (without time zone). Against ``timestamptz``
  Postgres interprets the literal in the SESSION's TimeZone — a
  connection with a non-UTC default silently shifts the window. Pin
  ``options={"sessionInitStatement": "SET TIME ZONE 'UTC'"}`` (or an
  ``options=-c TimeZone=UTC`` JDBC url parameter) when the watermark
  is ``timestamptz``.
* **Sub-second watermarks**: the reference-shaped CLOSED window
  ``[00:00:00, 23:59:59]`` drops rows in ``(23:59:59, 24:00:00)`` —
  real on Postgres ``timestamp(6)``. ``half_open=True`` generates
  ``>= day AND < day+1`` instead (exactly-once across consecutive
  days at any precision); the default stays closed because the
  reference's Airflow-style contract is closed and S6's
  delete+insert upsert keys on the same window.
* **Types**: Postgres unconstrained ``numeric`` maps to Spark
  ``DecimalType(38,18)`` — declare precision in DDL or cast in a
  pushdown subquery, or downstream decimal arithmetic inherits scale
  18. ``timestamptz`` reads as ``TimestampType`` in the session zone.
  Spark writes ``TimestampType`` as ``timestamp`` (never
  ``timestamptz``).
* **Identifiers**: ``_IDENT_RE`` accepts only unquoted
  ``schema.table`` names — the safe subset that Postgres folds to
  lower-case; mixed-case/quoted identifiers are rejected rather than
  interpolated into pushdown SQL.
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

_DS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def find_duckdb_jdbc_jar() -> str | None:
    """Locate a DuckDB JDBC driver jar in the usual local caches
    (maven/ivy/coursier layouts). Returns None when absent — callers
    gate the live JDBC path on it.
    """
    home = os.path.expanduser("~")
    patterns = [
        f"{home}/.m2/repository/org/duckdb/**/duckdb_jdbc-*.jar",
        f"{home}/.ivy2/**/duckdb_jdbc*.jar",
        f"{home}/.cache/coursier/**/duckdb_jdbc-*.jar",
    ]
    for p in patterns:
        hits = sorted(glob.glob(p, recursive=True))
        if hits:
            return hits[-1]
    return None


@dataclass
class JdbcConfig:
    url: str
    table: str
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    fetch_size: int = 10_000
    batch_size: int = 10_000
    properties: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        opts = {"url": self.url, "dbtable": self.table,
                "fetchsize": str(self.fetch_size), **self.properties}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.driver:
            opts["driver"] = self.driver
        return opts


def jdbc_scan(
    spark: SparkSession,
    cfg: JdbcConfig,
    *,
    ds: str | None = None,
    watermark_col: str = "updated_at",
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: str | None = None,
    upper_bound: str | None = None,
    half_open: bool = False,
) -> DataFrame:
    """S1 full / S2 incremental scan over JDBC.

    With ``ds``, the day window lands in a pushed-down query so only
    the day's rows leave the database — the reference's watermark
    extract (``dags/flights_data_pipeline.py:102-109``). The default
    window is the reference-shaped CLOSED ``[00:00:00, 23:59:59]``;
    ``half_open=True`` generates ``>= day AND < day+1`` instead — the
    correct form for sub-second watermark columns (see the module
    docstring's Postgres dialect pins). With ``partition_column``
    bounds, the read fans out over ``num_partitions`` connections (the
    scale axis the reference's single pandas connection lacks).
    """
    opts = cfg.reader_options()
    if ds is not None:
        # ds flows in from the CLI --ds flag and watermark_col/table from
        # config; all three are interpolated into pushed-down SQL, so they
        # must be shape-checked, not trusted.
        if not _DS_RE.match(ds):
            raise ValueError(f"ds must be YYYY-MM-DD, got {ds!r}")
        if not _IDENT_RE.match(watermark_col):
            raise ValueError(f"watermark_col is not an identifier: {watermark_col!r}")
        if not _IDENT_RE.match(cfg.table):
            raise ValueError(f"table is not an identifier: {cfg.table!r}")
        if half_open:
            import datetime as _dt

            nxt = (
                _dt.date.fromisoformat(ds) + _dt.timedelta(days=1)
            ).isoformat()
            upper = f"{watermark_col} < '{nxt} 00:00:00'"
        else:
            upper = f"{watermark_col} <= '{ds} 23:59:59'"
        opts["dbtable"] = (
            f"(SELECT * FROM {cfg.table} "
            f"WHERE {watermark_col} >= '{ds} 00:00:00' "
            f"AND {upper}) AS w"
        )
    reader: DataFrameReader = spark.read.format("jdbc")
    for k, v in opts.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires both lower_bound and upper_bound "
                "(a None bound reaches the JVM as a null option and fails "
                "with an opaque error)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return reader.load()


def jdbc_write(df: DataFrame, cfg: JdbcConfig, mode: str = "append") -> None:
    """S5 batch-insert sink (reference ``execute_values``, ``:194-195``)."""
    writer = df.write.format("jdbc").mode(mode)
    for k, v in cfg.reader_options().items():
        writer = writer.option(k, v)
    writer.option("batchsize", str(cfg.batch_size)).save()
