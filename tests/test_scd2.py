"""SCD-2 merge: versioned dimension history with a DuckDB oracle,
replay idempotency, and point-in-time reconstruction."""

from __future__ import annotations

import datetime as dt
from collections import Counter

import duckdb
import pytest

from flights_data_pipeline_spark.operators.merge import (
    merge_scd2,
    merge_scd2_parquet,
    scd2_snapshot,
)

T1, T2, T3 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"
SCHEMA = "k INT, name STRING, city STRING"

B1 = [(1, "alice", "rome"), (2, "bob", "oslo"), (3, "cara", "lima")]
B2 = [(1, "alice", "rome"),   # unchanged
      (2, "bob", "kiev"),     # changed
      (4, "dan", "baku")]     # new key
B3 = [(2, "bob", "oslo")]     # changes BACK to the original value


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def _oracle_scd2(batches):
    """Independent SQL statement of the same semantics: every (key,
    attribute-state) change event opens a version; each version closes
    at the key's next change event."""
    con = duckdb.connect()
    con.execute("CREATE TABLE b (ts TIMESTAMP, k INT, name VARCHAR, city VARCHAR)")
    for ts, rows in batches:
        con.executemany(
            "INSERT INTO b VALUES (?,?,?,?)",
            [(ts, *r) for r in rows],
        )
    return Counter(
        tuple(r)
        for r in con.execute(
            """
            WITH versioned AS (
              SELECT ts, k, name, city,
                     LAG(name) OVER w AS pname, LAG(city) OVER w AS pcity,
                     ROW_NUMBER() OVER w AS rn
              FROM b WINDOW w AS (PARTITION BY k ORDER BY ts)
            ),
            changes AS (
              SELECT * FROM versioned
              WHERE rn = 1 OR (name, city) IS DISTINCT FROM (pname, pcity)
            )
            SELECT k, name, city,
                   ts AS effective_from,
                   LEAD(ts) OVER (PARTITION BY k ORDER BY ts) AS effective_to,
                   LEAD(ts) OVER (PARTITION BY k ORDER BY ts) IS NULL
                     AS is_current
            FROM changes
            """
        ).fetchall()
    )


def _apply(spark, batches):
    dim = None
    for ts, rows in batches:
        src = spark.createDataFrame(rows, SCHEMA)
        dim = merge_scd2(dim, src, ["k"], load_ts=ts)
    return dim


@pytest.mark.parametrize(
    "batches",
    [
        [(T1, B1)],
        [(T1, B1), (T2, B2)],
        [(T1, B1), (T2, B2), (T3, B3)],
    ],
    ids=["initial", "two-batches", "flip-back"],
)
def test_scd2_matches_oracle(spark, batches):
    dim = _apply(spark, batches).select(
        "k", "name", "city", "effective_from", "effective_to", "is_current"
    )
    assert _multiset(dim) == _oracle_scd2(batches)


def test_scd2_replay_idempotent(spark):
    once = _apply(spark, [(T1, B1), (T2, B2)])
    twice = merge_scd2(
        once, spark.createDataFrame(B2, SCHEMA), ["k"], load_ts=T2
    )
    assert _multiset(once) == _multiset(twice)


def test_scd2_snapshot_reconstructs_past(spark):
    dim = _apply(spark, [(T1, B1), (T2, B2)])
    asof = scd2_snapshot(dim, "2024-01-15 00:00:00")
    assert _multiset(asof) == Counter(B1)
    now = scd2_snapshot(dim, T2)
    assert _multiset(now) == Counter(set(B2) | {(3, "cara", "lima")})


def test_scd2_flip_back_keeps_both_versions(spark):
    """A value that changes away and back must yield THREE versions of
    key 2 (oslo, kiev, oslo) — SCD-2 history is append-only, never
    collapsed by value equality across non-adjacent intervals."""
    dim = _apply(spark, [(T1, B1), (T2, B2), (T3, B3)])
    k2 = dim.filter("k = 2").orderBy("effective_from").collect()
    assert [r.city for r in k2] == ["oslo", "kiev", "oslo"]
    assert [r.is_current for r in k2] == [False, False, True]
    assert [r.effective_to for r in k2] == [
        dt.datetime.fromisoformat(T2),
        dt.datetime.fromisoformat(T3),
        None,
    ]


def test_scd2_untracked_column_does_not_version(spark):
    """Changes confined to non-tracked columns must NOT open a new
    version (the standard mixed type-1/type-2 dimension)."""
    b2 = [(1, "ALICE-RENAMED", "rome")]
    d1 = _apply(spark, [(T1, B1)])
    d2 = merge_scd2(
        d1,
        spark.createDataFrame(b2, SCHEMA),
        ["k"],
        load_ts=T2,
        tracked_cols=["city"],
    )
    assert d2.count() == 3          # no new version rows
    r1 = d2.filter("k = 1").collect()[0]
    assert r1.name == "alice"       # untracked change dropped (type-2 col wins)
    assert r1.is_current


def test_scd2_rejects_duplicate_source_keys(spark):
    with pytest.raises(ValueError, match="duplicate"):
        merge_scd2(
            None,
            spark.createDataFrame([(1, "a", "x"), (1, "b", "y")], SCHEMA),
            ["k"],
            load_ts=T1,
        )


def test_scd2_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "dim_scd2")
    n1 = merge_scd2_parquet(spark, path, spark.createDataFrame(B1, SCHEMA), ["k"], load_ts=T1)
    assert n1 == 3
    n2 = merge_scd2_parquet(spark, path, spark.createDataFrame(B2, SCHEMA), ["k"], load_ts=T2)
    assert n2 == 5  # 3 current + 1 closed + 1 new key
    stored = spark.read.parquet(path).select(
        "k", "name", "city", "effective_from", "effective_to", "is_current"
    )
    assert _multiset(stored) == _oracle_scd2([(T1, B1), (T2, B2)])
