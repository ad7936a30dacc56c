"""Two-phase exact global rank / cumulative-sum — the scalable
replacement for ``Window.orderBy(...)`` with no partition spec.

An unpartitioned window is the one Spark construct that silently
serializes at scale: WindowExec moves EVERY row to a single partition
("No Partition Defined for Window operation" — the round-7 VERDICT's
last scale-killer class). But a global row number / running sum does
not need a global sort on one machine; it needs the classic
two-phase shape (the same trick ``RDD.zipWithIndex`` uses, restated
DataFrame-native so Catalyst keeps optimizing around it):

1. **Range-shuffle** on the order key (``repartitionByRange`` — the
   exact shuffle a global ``ORDER BY`` would do anyway). Partition ids
   are then monotone in the key: partition 0 holds the smallest keys.
2. **Local window** per partition (``Window.partitionBy(pid)``) — a
   parallel sort of each slice, never a single-partition sort.
3. **Per-partition prefix offsets**: aggregate each partition's
   count/sum (tiny: one row per partition), prefix-sum THOSE, and
   broadcast-join the offsets back. The only unpartitioned window left
   runs over ≤ ``spark.sql.shuffle.partitions`` aggregate rows —
   bounded by cluster configuration, not by data.

Results are bit-identical to the naive global window whenever
``order_by`` is a TOTAL order (unique key combination) — which every
cross-engine-exact query in this repo already guarantees, since a
nondeterministic tie order could not hash-match DuckDB in the first
place.

``tests/test_global_order.py`` pins equivalence against the naive
window and the partition-balance property on a skewed fixture;
``tests/test_physical_layout.py`` pins the plan shape (no
single-partition exchange feeding a corpus-grain window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: internal column names (dropped before returning).
_PID = "__go_pid"
_LOCAL = "__go_local"
_OFFSET = "__go_offset"

#: materialize the ranged frame (REQUIRED for correctness — see
#: ``_ranged``). Tests flip this off only to inspect the full
#: un-truncated plan; never run with it off.
MATERIALIZE = True


def _cols(order_by) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def _ranged(df: DataFrame, order_by, sort: bool = False) -> DataFrame:
    """Range-shuffle ``df`` on the order key and stamp the (monotone)
    partition id. Partition count follows ``spark.sql.shuffle.partitions``
    — the same default a global sort would use. The explicit partition
    count keeps AQE from coalescing (partition ids must stay stable
    between the offset job and the final job)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out = df.repartitionByRange(n, *_cols(order_by))
    if sort:
        out = out.sortWithinPartitions(*_cols(order_by))
    out = out.withColumn(_PID, F.spark_partition_id())
    # MATERIALIZE before fanning out to the row/offset branches:
    # RangePartitioner re-samples its boundaries on every action (the
    # seed hashes the per-action RDD id), so without this the offset
    # branch could see a DIFFERENT partition layout than the row branch
    # and mis-stitch ranks at partition boundaries (observed flaky at
    # sf0.01). localCheckpoint pins one layout — and doubles as the
    # standard multi-consumer reuse, so the range shuffle runs once.
    return out.localCheckpoint() if MATERIALIZE else out


def _with_offsets(
    ranged: DataFrame, agg: Column, with_total: bool = False
) -> DataFrame:
    """Broadcast-join each row with the prefix-sum (over partitions
    BEFORE its own) of ``agg`` evaluated per partition. The prefix
    window is unpartitioned but runs over one row per partition —
    cluster-config-sized, the documented exception to the
    no-unpartitioned-window rule. ``with_total`` also attaches the
    grand total as ``__go_total`` — free here (sum of the same
    per-partition rows), where a separate count would cost a job."""
    per_part = ranged.groupBy(_PID).agg(agg.alias("_t"))
    w = W.orderBy(_PID).rowsBetween(W.unboundedPreceding, -1)
    cols = [
        F.col(_PID),
        F.coalesce(F.sum("_t").over(w), F.lit(0)).alias(_OFFSET),
    ]
    if with_total:
        cols.append(
            F.sum("_t")
            .over(W.orderBy(_PID).rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
            .alias("__go_total")
        )
    offsets = per_part.select(*cols)
    return ranged.join(F.broadcast(offsets), _PID)


def global_row_number(df: DataFrame, order_by, out: str = "rn") -> DataFrame:
    """``row_number() OVER (ORDER BY order_by)`` as a bigint, computed
    two-phase with NO window at all: after the range shuffle the rows
    are sorted within each partition, so ``monotonically_increasing_id``'s
    low 33 bits ARE the local 0-based row number (the documented
    partition-record layout — the DataFrame-native ``zipWithIndex``).
    One corpus shuffle total. ``order_by`` must be a total order for
    the numbering to be deterministic (same contract as the naive
    window)."""
    ranged = _ranged(df, order_by, sort=True)
    local = ranged.withColumn(
        _LOCAL,
        F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
        + F.lit(1),
    )
    return (
        _with_offsets(local, F.count(F.lit(1)))
        .withColumn(out, (F.col(_OFFSET) + F.col(_LOCAL)).cast("bigint"))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def global_cumsum(
    df: DataFrame,
    order_by,
    value: Column | str,
    out: str = "cum",
    inclusive: bool = True,
) -> DataFrame:
    """``SUM(value) OVER (ORDER BY order_by ROWS UNBOUNDED PRECEDING
    [AND 1 PRECEDING])`` computed two-phase. With ``inclusive=False``
    the sum excludes the current row (NULL→0-coalesced to match the
    ``COALESCE(SUM(...) OVER ..., 0)`` idiom the callers use)."""
    return global_cumsum_multi(
        df, order_by, {out: value}, inclusive=inclusive
    )


def global_cumsum_multi(
    df: DataFrame,
    order_by,
    values: dict[str, Column | str],
    inclusive: bool = True,
) -> DataFrame:
    """Several running sums under ONE order, sharing a single range
    shuffle + local-window pass (the KS-statistic shape: cumulative
    counts of two sources over the merged support). ``values`` maps
    each output column name to its summand."""
    ranged = _ranged(df, order_by)
    for i, v in enumerate(values.values()):
        ranged = ranged.withColumn(
            f"__go_v{i}", F.col(v) if isinstance(v, str) else v
        )
    hi = 0 if inclusive else -1
    w = (
        W.partitionBy(_PID)
        .orderBy(*_cols(order_by))
        .rowsBetween(W.unboundedPreceding, hi)
    )
    local = ranged
    for i in range(len(values)):
        local = local.withColumn(
            f"__go_l{i}",
            F.coalesce(F.sum(f"__go_v{i}").over(w), F.lit(0)),
        )
    per_part = local.groupBy(_PID).agg(
        *[
            F.coalesce(F.sum(f"__go_v{i}"), F.lit(0)).alias(f"__go_t{i}")
            for i in range(len(values))
        ]
    )
    wo = W.orderBy(_PID).rowsBetween(W.unboundedPreceding, -1)
    offsets = per_part.select(
        _PID,
        *[
            F.coalesce(F.sum(f"__go_t{i}").over(wo), F.lit(0)).alias(
                f"__go_o{i}"
            )
            for i in range(len(values))
        ],
    )
    out = local.join(F.broadcast(offsets), _PID)
    for i, name in enumerate(values):
        out = out.withColumn(name, F.col(f"__go_o{i}") + F.col(f"__go_l{i}"))
    drop = [_PID] + [
        c
        for i in range(len(values))
        for c in (f"__go_v{i}", f"__go_l{i}", f"__go_o{i}")
    ]
    return out.drop(*drop)


def global_lag(
    df: DataFrame, order_by, value: Column | str, out: str = "lag"
) -> DataFrame:
    """``lag(value) OVER (ORDER BY order_by)`` two-phase: a local lag
    per range partition, then each partition's FIRST row is patched
    with the LAST value of the nearest non-empty partition before it
    (per-partition lasts are one row each; their LOCF scan is the
    config-bounded tiny window). The global first row keeps NULL."""
    v = F.col(value) if isinstance(value, str) else value
    ranged = _ranged(df, order_by).withColumn("__go_v", v)
    w = W.partitionBy(_PID).orderBy(*_cols(order_by))
    local = ranged.withColumn(
        "__go_lrn", F.row_number().over(w)
    ).withColumn("__go_lag", F.lag("__go_v").over(w))
    lasts = ranged.groupBy(_PID).agg(
        F.max(
            F.struct(*_cols(order_by), F.col("__go_v").alias("__go_v"))
        ).alias("__go_s")
    )
    wo = W.orderBy(_PID).rowsBetween(W.unboundedPreceding, -1)
    prevs = lasts.select(
        _PID,
        F.last(F.col("__go_s").getField("__go_v"))
        .over(wo)
        .alias("__go_prev"),
    )
    return (
        local.join(F.broadcast(prevs), _PID)
        .withColumn(
            out,
            F.when(F.col("__go_lrn") == 1, F.col("__go_prev")).otherwise(
                F.col("__go_lag")
            ),
        )
        .drop(_PID, "__go_v", "__go_lrn", "__go_lag", "__go_prev")
    )


def grouped_row_number(
    df: DataFrame, group_by, order_by, out: str = "rn"
) -> DataFrame:
    """``row_number() OVER (PARTITION BY group_by ORDER BY order_by)``
    without funneling each group into one task: take the GLOBAL
    two-phase row number under ``(group_by, order_by)`` — group values
    are contiguous in that order — and rebase each group to 1 by
    subtracting its minimum (a group-grain aggregate joined back; AQE
    broadcasts it when small). The scalable shape when there are few,
    huge groups — a plain partitioned window already parallelizes fine
    when groups are many."""
    gcols = [group_by] if isinstance(group_by, str) else list(group_by)
    grn = "__go_grn"
    with_rn = global_row_number(df, [*gcols, *_cols(order_by)], out=grn)
    mins = with_rn.groupBy(*gcols).agg(F.min(grn).alias("__go_gmin"))
    return (
        with_rn.join(mins, gcols)
        .withColumn(
            out, (F.col(grn) - F.col("__go_gmin") + F.lit(1)).cast("bigint")
        )
        .drop(grn, "__go_gmin")
    )


def global_ntile(
    df: DataFrame, order_by, n: int, out: str = "band"
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order_by)`` computed from the
    two-phase row number plus the total count: with ``N = q*n + r``,
    the first ``r`` buckets take ``q+1`` rows (Spark/DuckDB/ANSI all
    share this remainder-to-the-front rule), so the bucket is a pure
    integer function of ``(rn, N)`` — no global window at all."""
    rn = "__go_rn"
    ranged = _ranged(df, order_by, sort=True)
    local = ranged.withColumn(
        _LOCAL,
        F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
        + F.lit(1),
    )
    # the grand total rides the same per-partition aggregate as the
    # offsets — no separate count job
    with_rn = (
        _with_offsets(local, F.count(F.lit(1)), with_total=True)
        .withColumn(rn, (F.col(_OFFSET) + F.col(_LOCAL)).cast("bigint"))
        .withColumnRenamed("__go_total", "__go_n")
        .drop(_PID, _LOCAL, _OFFSET)
    )
    q = F.floor(F.col("__go_n") / n).cast("bigint")
    r = (F.col("__go_n") % n).cast("bigint")
    first_block = r * (q + 1)
    band = F.when(
        F.col(rn) <= first_block, F.floor((F.col(rn) - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((F.col(rn) - first_block - 1) / q) + 1)
    return with_rn.withColumn(out, band.cast("int")).drop(rn, "__go_n")
