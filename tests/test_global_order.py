"""Two-phase global rank/cumsum/ntile == the naive unpartitioned
window, bit-for-bit — plus the partition-balance property that is the
operator's reason to exist (round-7 VERDICT task: no corpus-grain
single-partition WindowExec)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

import pytest

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.operators import global_order
from flights_data_pipeline_spark.operators.global_order import (
    global_cumsum,
    global_ntile,
    global_row_number,
)

from .conftest import SF_DIR


@pytest.fixture(autouse=True)
def force_two_phase():
    """These tests verify the TWO-PHASE path against the naive window;
    at sf0.001 the size-adaptive dispatch would otherwise pick naive on
    both sides and the equivalence would be vacuous.
    ``test_size_adaptive_dispatch`` exercises dispatch itself."""
    global_order.FORCE = "two-phase"
    try:
        yield
    finally:
        global_order.FORCE = None


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )


def test_global_row_number_matches_naive_window(spark):
    d = _docs(spark).withColumn("h", F.md5(F.col("doc_id").cast("string")))
    naive = d.select(
        "doc_id", F.row_number().over(W.orderBy("h", "doc_id")).alias("rn")
    )
    two_phase = global_row_number(d, ["h", "doc_id"], out="rn").select(
        "doc_id", "rn"
    )
    assert sorted(map(tuple, two_phase.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_global_cumsum_matches_naive_window_inclusive_and_exclusive(spark):
    d = _docs(spark)
    for inclusive, hi in [(True, W.currentRow), (False, -1)]:
        w = W.orderBy("n_chars", "doc_id").rowsBetween(
            W.unboundedPreceding, hi
        )
        naive = d.select(
            "doc_id",
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("cum"),
        )
        two = global_cumsum(
            d, ["n_chars", "doc_id"], "n_chars", out="cum", inclusive=inclusive
        ).select("doc_id", "cum")
        assert sorted(map(tuple, two.collect())) == sorted(
            map(tuple, naive.collect())
        ), f"inclusive={inclusive}"


def test_global_ntile_matches_spark_ntile(spark):
    d = _docs(spark)
    for n in (5, 7):  # 7 does not divide the corpus → remainder path
        naive = d.select(
            "doc_id",
            F.ntile(n).over(W.orderBy("n_chars", "doc_id")).alias("band"),
        )
        two = global_ntile(d, ["n_chars", "doc_id"], n, out="band").select(
            "doc_id", "band"
        )
        assert sorted(map(tuple, two.collect())) == sorted(
            map(tuple, naive.collect())
        ), f"n={n}"


def test_global_cumsum_multi_matches_two_naive_windows(spark):
    d = _docs(spark).select(
        "doc_id",
        "n_chars",
        F.when(F.col("source") == "src0", 1).otherwise(0).alias("is0"),
        F.when(F.col("source") == "src1", 1).otherwise(0).alias("is1"),
    )
    from flights_data_pipeline_spark.operators.global_order import (
        global_cumsum_multi,
    )

    w = W.orderBy("n_chars", "doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    naive = d.select(
        "doc_id",
        F.sum("is0").over(w).alias("c0"),
        F.sum("is1").over(w).alias("c1"),
    )
    two = global_cumsum_multi(
        d, ["n_chars", "doc_id"], {"c0": "is0", "c1": "is1"}
    ).select("doc_id", "c0", "c1")
    assert sorted(map(tuple, two.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_grouped_row_number_matches_partitioned_window(spark):
    from flights_data_pipeline_spark.operators.global_order import (
        grouped_row_number,
    )

    d = _docs(spark)
    naive = d.select(
        "doc_id",
        F.row_number()
        .over(W.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("rn"),
    )
    two = grouped_row_number(
        d, "source", ["n_chars", "doc_id"], out="rn"
    ).select("doc_id", "rn")
    assert sorted(map(tuple, two.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_no_single_partition_exchange_feeds_the_rank(spark):
    """Plan pin: the naive window moves the corpus to one partition
    (Exchange SinglePartition above a scan); the two-phase rank's only
    SinglePartition exchange sits above the per-partition AGGREGATE
    (≤ shuffle.partitions rows), and the corpus moves through a
    rangepartitioning exchange instead."""
    from flights_data_pipeline_spark.operators import global_order

    d = _docs(spark)
    # flip materialization off ONLY to see the un-truncated lineage
    # (localCheckpoint hides the range exchange from the plan)
    global_order.MATERIALIZE = False
    try:
        plan = global_row_number(d, ["n_chars", "doc_id"])._jdf.queryExecution().executedPlan().toString()
    finally:
        global_order.MATERIALIZE = True
    lines = plan.splitlines()
    assert any("rangepartitioning" in ln.lower() for ln in lines), plan
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = "\n".join(lines[i + 1 : i + 3])
            assert "HashAggregate" in below, plan


def test_rank_partitions_stay_balanced_on_skewed_keys(spark):
    """Round-7 VERDICT task 8: a hub-heavy key distribution (90% of
    rows share one key prefix) must still spread across partitions —
    the naive window would put 100% of rows in ONE task. The order
    includes the unique id as tiebreak, so the range shuffle splits
    the hub freely."""
    hub = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id"),
    )
    ranked = global_row_number(hub, ["k", "id"], out="rn")
    # recompute the post-shuffle layout exactly as the operator does
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sizes = (
        hub.repartitionByRange(n, F.col("k"), F.col("id"))
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    assert max(counts) < 0.25 * sum(counts), counts
    # and the ranks are still the exact global ranks
    naive = hub.select(
        "id", F.row_number().over(W.orderBy("k", "id")).alias("rn")
    )
    assert sorted(map(tuple, ranked.select("id", "rn").collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_size_adaptive_dispatch(spark):
    """Dispatch picks the naive window for a small input (no range
    exchange, no checkpoint jobs), the two-phase path when forced, and
    both produce identical ranks. The sf0.001 documents slice is far
    under NAIVE_MAX_BYTES; a forced-naive run pins the plan shape."""
    global_order.FORCE = None
    d = _docs(spark)
    assert global_order._use_naive(d) is True
    naive_df = global_row_number(d, ["n_chars", "doc_id"], out="rn")
    plan = naive_df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan
    assert "Window" in plan, plan

    global_order.FORCE = "two-phase"
    two_df = global_row_number(d, ["n_chars", "doc_id"], out="rn")
    assert sorted(map(tuple, naive_df.select("doc_id", "rn").collect())) == sorted(
        map(tuple, two_df.select("doc_id", "rn").collect())
    )

    # an unestimatable / huge estimate goes two-phase: localCheckpointed
    # frames report a concrete in-memory size, so fake the failure path
    global_order.FORCE = None
    class _Boom:
        def __getattr__(self, _):
            raise RuntimeError("no stats")
    import types
    fake = types.SimpleNamespace(_jdf=_Boom())
    assert global_order._use_naive(fake) is False


def test_grouped_row_number_null_group_keys(spark):
    """NULL group keys are a real group (window PARTITION BY
    semantics): the two-phase rebase join must not drop them."""
    rows = [(None, 10), (None, 5), ("a", 7), ("a", 1), (None, 8)]
    d = spark.createDataFrame(rows, "g string, v int")
    from flights_data_pipeline_spark.operators.global_order import (
        grouped_row_number,
    )

    naive = d.select(
        "g",
        "v",
        F.row_number().over(W.partitionBy("g").orderBy("v")).alias("rn"),
    )
    two = grouped_row_number(d, "g", ["v"], out="rn")
    assert sorted(
        map(tuple, two.select("g", "v", "rn").collect()),
        key=lambda t: (t[0] or "", t[1]),
    ) == sorted(
        map(tuple, naive.collect()), key=lambda t: (t[0] or "", t[1])
    )


def test_global_lag_descending_order(spark):
    """The boundary patch derives each partition's last row from the
    local window itself, so a DESCENDING order key lags correctly
    (a struct-max boundary would pick the wrong 'previous' value)."""
    from flights_data_pipeline_spark.operators.global_order import global_lag

    d = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 3 % 101).alias("v")
    )
    order = [F.col("id").desc()]
    naive = d.select(
        "id", F.lag("v").over(W.orderBy(F.col("id").desc())).alias("prev")
    )
    two = global_lag(d, order, "v", out="prev").select("id", "prev")
    assert sorted(
        map(tuple, two.collect()), key=lambda t: t[0]
    ) == sorted(map(tuple, naive.collect()), key=lambda t: t[0])
