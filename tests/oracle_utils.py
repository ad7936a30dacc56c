"""DuckDB-oracle comparison harness.

Mirrors the driver's correctness gate (SURVEY.md §5.2): run the Spark
query and the oracle SQL on identical parquet inputs, sort columns by
name, compare row multisets. Exact equality for ints/strings/decimals/
timestamps; floats compare exactly first and fall back to a tiny
relative tolerance only to produce a clearer failure message (the
engine's queries are designed to be exact — decimal sums, rounded
doubles — so the tolerant path flags a design bug).
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter
from decimal import Decimal

import duckdb

from flights_data_pipeline_spark.io.catalog import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    # Decimals compare RAW (no normalize()): the driver's gate hashes
    # scale-sensitively, so "123.4" vs "123.40" must FAIL here too.
    # Queries therefore cast final-output decimals to double
    # (functions.scalars.money_out) on both engines.
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, list):
        return ("list", tuple(_norm(x) for x in v))
    return v


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def assert_driver_safe_surface(sdf, name: str = "?") -> None:
    """Every oracle-carrying result surface must use types the driver's
    pandas canonicalizer renders identically for DuckDB and Spark.
    Two classes have shipped red rows before and are banned here:
    array/map/struct cells (r7 ``pq_encode`` — pandas sort dies) and
    decimals with precision > 18 (r8 checksum pair — DuckDB ``.df()``
    converts to float64, Spark ``toPandas`` yields ``Decimal``).
    Serialize at the surface (join arrays, cast wide decimals to
    string) and keep the exotic type internal."""
    unsafe = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
        or (f.dataType.typeName() == "decimal" and f.dataType.precision > 18)
    ]
    assert not unsafe, (
        f"{name}: driver-unsafe surface columns {unsafe} — serialize "
        "them (string-join / cast to string) before returning"
    )


def compare_query(spark, sf_dir: str, fn, oracle: str, name: str = "?"):
    sdf = fn(spark, sf_dir)
    assert_driver_safe_surface(sdf, name)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    cur = con.execute(oracle)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_ms = rows_to_multiset(s_rows, s_cols)
    o_ms = rows_to_multiset(o_rows, o_cols)
    if s_ms != o_ms:
        only_s = list((s_ms - o_ms).items())[:5]
        only_o = list((o_ms - s_ms).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch.\n  spark-only (5): {only_s}\n"
            f"  oracle-only (5): {only_o}\n  cols={sorted(s_cols)}"
        )
    return len(s_rows)
