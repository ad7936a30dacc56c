"""Query registry plumbing.

A *query* is a named, tested unit of the engine contract:

* ``fn(spark, sf_dir) -> DataFrame`` — the Spark-side implementation
  (DataFrame API or spark.sql over registered views).
* ``oracle`` — an equivalent ANSI SQL string for DuckDB, or ``None`` for
  genuinely non-SQL-expressible operators (the driver then records a
  weaker rows-only check; the judge sees which).

Column names are part of the contract: the driver sorts columns by name
before hashing values, so every computed column is aliased identically
on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
