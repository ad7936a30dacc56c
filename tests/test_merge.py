"""MERGE upsert operator: DuckDB oracle + idempotency + delete clause.

SURVEY.md §4.4 infers ON CONFLICT DO UPDATE dim semantics for the
reference; ``merge_upsert`` is the engine's library MERGE. The oracle
is the relational definition of the same statement: source rows win,
unmatched target rows survive.
"""

from __future__ import annotations

import tempfile
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.operators.merge import merge_parquet, merge_upsert


@pytest.fixture()
def frames(spark):
    target = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", 30.0),
        ],
        "k INT, name STRING, v DOUBLE",
    )
    source = spark.createDataFrame(
        [
            (2, "b2", 22.0),   # update
            (4, "d", 40.0),    # insert
            (3, None, 33.0),   # update with NULL field (must stay NULL)
        ],
        "k INT, name STRING, v DOUBLE",
    )
    return target, source


def _oracle(target_rows, source_rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, name VARCHAR, v DOUBLE)")
    con.execute("CREATE TABLE s (k INT, name VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", target_rows)
    con.executemany("INSERT INTO s VALUES (?,?,?)", source_rows)
    rows = con.execute(
        """
        SELECT * FROM s
        UNION ALL
        SELECT * FROM t
        WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.k = t.k)
        """
    ).fetchall()
    con.close()
    return Counter(rows)


def test_merge_matches_oracle(spark, frames):
    target, source = frames
    got = Counter(map(tuple, merge_upsert(target, source, ["k"]).collect()))
    want = _oracle(
        [tuple(r) for r in target.collect()], [tuple(r) for r in source.collect()]
    )
    assert got == want
    # the NULL source field must NOT be back-filled from the target row
    assert got[(3, None, 33.0)] == 1


def test_merge_rejects_duplicate_source_keys(spark, frames):
    target, _ = frames
    dup = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], target.schema)
    with pytest.raises(ValueError, match="duplicate"):
        merge_upsert(target, dup, ["k"])


def test_merge_delete_clause(spark, frames):
    target, _ = frames
    # tombstone convention: v < 0 means "delete this key"
    source = spark.createDataFrame(
        [(2, "b", -1.0), (4, "d", 40.0)], target.schema
    )
    out = merge_upsert(
        target, source, ["k"], delete_condition=F.col("v") < 0
    )
    got = {r.k for r in out.collect()}
    assert got == {1, 3, 4}  # 2 deleted, 4 inserted, 1/3 kept


def test_merge_parquet_idempotent(spark, frames):
    target, source = frames
    d = tempfile.mkdtemp(prefix="fdp_merge_")
    path = f"{d}/dim"
    target.write.parquet(path)

    n1 = merge_parquet(spark, path, source, ["k"])
    snap1 = Counter(map(tuple, spark.read.parquet(path).collect()))
    n2 = merge_parquet(spark, path, source, ["k"])  # re-run, same source
    snap2 = Counter(map(tuple, spark.read.parquet(path).collect()))
    assert n1 == n2 == 4
    assert snap1 == snap2  # byte-identical rerun — the S6 guarantee, keyed


def test_merge_parquet_creates_target(spark, frames):
    _, source = frames
    d = tempfile.mkdtemp(prefix="fdp_merge_new_")
    path = f"{d}/dim_new"
    n = merge_parquet(spark, path, source, ["k"])
    assert n == 3
    assert spark.read.parquet(path).count() == 3
