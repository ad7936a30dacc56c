"""Incremental join maintenance: delta propagation equals full
recomputation, for every interleaving of one-sided and two-sided
appends."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.operators.ivm import IncrementalJoin

from .conftest import SF_DIR


def _sides(spark):
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    return c, o


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_incremental_equals_full_recompute(spark, tmp_path):
    c, o = _sides(spark)
    # split both sides into init + two delta batches
    c0, c1 = c.filter("c_custkey % 3 != 0"), c.filter("c_custkey % 3 = 0")
    o0 = o.filter("o_orderkey % 4 = 0")
    o1 = o.filter("o_orderkey % 4 IN (1, 2)")
    o2 = o.filter("o_orderkey % 4 = 3")

    ij = IncrementalJoin(spark, str(tmp_path / "ivm"), on=["c_custkey"])
    ij.initialize(c0, o0)
    ij.apply(delta_b=o1)               # one-sided append
    ij.apply(delta_a=c1, delta_b=o2)   # two-sided append (needs ΔA⋈ΔB)

    full = c.join(o, "c_custkey").select(*ij.read().columns)
    assert _multiset(ij.read()) == _multiset(full)


def test_empty_apply_is_noop(spark, tmp_path):
    c, o = _sides(spark)
    ij = IncrementalJoin(spark, str(tmp_path / "ivm2"), on=["c_custkey"])
    ij.initialize(c, o)
    before = _multiset(ij.read())
    assert ij.apply() == 0
    assert _multiset(ij.read()) == before


def test_initialize_rejects_ambiguous_columns(spark, tmp_path):
    c, o = _sides(spark)
    o_bad = o.withColumn("c_name", F.lit("x"))  # clashes with customer
    ij = IncrementalJoin(spark, str(tmp_path / "ivm3"), on=["c_custkey"])
    with pytest.raises(ValueError, match="c_name"):
        ij.initialize(c, o_bad)
    with pytest.raises(ValueError, match="absent"):
        IncrementalJoin(spark, str(tmp_path / "ivm4"), on=["nope"]).initialize(
            c, o
        )


def test_retraction_ivm_matches_full_recompute(spark, tmp_path):
    """Signed-multiplicity IVM: inserts, deletes, and an update
    (delete+insert) all propagate; the maintained view equals the full
    join of the CURRENT logical relations."""
    from collections import Counter

    from flights_data_pipeline_spark.operators.ivm import (
        IncrementalJoinRetract,
    )

    c, o = _sides(spark)
    c0 = c.filter("c_custkey % 2 = 0")
    c1 = c.filter("c_custkey % 2 = 1")
    o0 = o.filter("o_orderkey % 3 = 0")
    o1 = o.filter("o_orderkey % 3 != 0")
    # retract some initially-loaded orders, and "update" one customer
    o_del = o0.filter("o_orderkey % 9 = 0")
    c_upd_old = c0.filter("c_custkey = 2")
    c_upd_new = c_upd_old.withColumn("c_acctbal", F.col("c_acctbal") + 1)

    ij = IncrementalJoinRetract(spark, str(tmp_path / "rivm"), on=["c_custkey"])
    ij.initialize(c0, o0)
    ij.apply(delta_a=c1, delta_b=o1)
    ij.apply(retract_b=o_del)
    ij.apply(delta_a=c_upd_new, retract_a=c_upd_old)
    ij.compact()

    # logical current state
    cur_c = c.unionByName(c_upd_new).exceptAll(c_upd_old)
    cur_o = o.exceptAll(o_del)
    full = cur_c.join(cur_o, "c_custkey")
    got = Counter()
    for r in ij.read().collect():
        d = r.asDict()
        m = d.pop("__mult")
        got[tuple(d.values())] += m
    want = Counter(tuple(r) for r in full.select(*[
        c_ for c_ in ij.read().columns if c_ != "__mult"
    ]).collect())
    assert got == want


def test_retract_rows_read_back_from_state(spark, tmp_path):
    """Retract inputs that ALREADY carry ``__mult`` (the natural shape:
    rows read back from the maintained state, signed +1) must enter the
    delta negated — treating them as inserts would double the row and
    silently corrupt the view (compact() can't catch it because the
    multiplicities stay positive)."""
    from flights_data_pipeline_spark.operators.ivm import (
        IncrementalJoinRetract,
    )

    c, o = _sides(spark)
    ij = IncrementalJoinRetract(spark, str(tmp_path / "rivm3"), on=["c_custkey"])
    ij.initialize(c, o)
    key = ij.read().select("c_custkey").first()["c_custkey"]
    before_total = ij.read().count()
    victims = before_total - ij.read().filter(F.col("c_custkey") == key).count()

    # read the live customer row back from state — it carries __mult=+1
    live = ij._read_rel("A").filter(F.col("c_custkey") == key)
    assert "__mult" in live.columns
    ij.apply(retract_a=live)
    ij.compact()

    after = ij.read()
    assert after.filter(F.col("c_custkey") == key).count() == 0
    assert after.count() == victims
    # and every surviving multiplicity is the original +1, not doubled
    assert after.filter("__mult != 1").count() == 0
    from flights_data_pipeline_spark.operators.ivm import (
        IncrementalJoinRetract,
    )

    c, o = _sides(spark)
    ghost = c.limit(1).withColumn("c_name", F.lit("never inserted"))
    ij = IncrementalJoinRetract(spark, str(tmp_path / "rivm2"), on=["c_custkey"])
    ij.initialize(c, o)
    ij.apply(retract_a=ghost)
    with pytest.raises(ValueError, match="net-negative"):
        ij.compact()


def test_additive_rollup_accepts_retractions(spark, tmp_path):
    """Aggregate IVM handles deletes the same way the join does:
    a NEGATED increment retracts a prior contribution, and the rollup
    equals a recompute over the surviving raw rows."""
    from flights_data_pipeline_spark.operators.merge import (
        merge_additive_parquet,
    )

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderkey", F.lit(1).cast("bigint").alias("n")
    )
    day1 = o.filter("o_orderkey % 2 = 0")
    day2 = o.filter("o_orderkey % 2 = 1")
    undo = day1.filter("o_orderkey % 10 = 0")  # late-arriving deletes

    path = str(tmp_path / "rollup")
    inc = lambda df: df.groupBy("o_custkey").agg(  # noqa: E731
        F.sum("n").cast("bigint").alias("n")
    )
    merge_additive_parquet(spark, path, inc(day1), ["o_custkey"], ["n"])
    merge_additive_parquet(spark, path, inc(day2), ["o_custkey"], ["n"])
    neg = inc(undo).withColumn("n", -F.col("n"))
    merge_additive_parquet(spark, path, neg, ["o_custkey"], ["n"])

    surviving = o.exceptAll(undo)
    want = {
        (r["o_custkey"]): r["n"]
        for r in inc(surviving).collect()
    }
    got = {
        (r["o_custkey"]): r["n"]
        for r in spark.read.parquet(path).filter("n != 0").collect()
    }
    assert got == want
