"""Custom join operators the built-in surface lacks.

The reference has no as-of/range joins (SURVEY.md §2.3 — absence
observed), but they are core training-data-pipeline operators (point-
in-time feature lookup), so the engine ships them as extensions.

Both operators are compositions of existing DataFrame primitives —
no UDFs, no cartesian products — chosen for their 100 TB shape:

* ``asof_join``: ONE shuffle+sort per key partition (the union sorts
  by (key, time)), then a running ``last(..., ignorenulls=True)``
  window. This is the classic merge-asof plan; cost is O(n log n) per
  key partition regardless of time-gap distribution. A naive
  formulation (per-left-row max-subquery, or a range theta-join)
  degrades to O(n_left · n_right) per key.
* ``salted_join``: standard skew salting — replicate the small side K
  ways, spray the big side across the K copies — so one hot key
  spreads over K reducers. AQE's skew handling covers sort-merge
  joins; salting remains the lever for skewed broadcast-ineligible
  hash joins and for deterministic layout control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    *,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` (``<`` when ``strict``), per ``on`` key.

    Left-outer semantics: left rows with no earlier right row keep
    NULLs (matches DuckDB ``ASOF LEFT JOIN``). ``right_values`` names
    must not collide with left column names.

    Implementation: tag and union both sides, then per key sort by
    (time, side) and carry the last matched right ROW forward as ONE
    struct — ``last(ignorenulls=True)`` over per-column carries would
    tear rows when a right value column is NULL (that column filled
    from an older right row while siblings come from the newer one);
    a struct is non-null whenever the right row exists, so all value
    columns travel together and NULL fields stay NULL, matching DuckDB
    ``ASOF LEFT JOIN`` row semantics.
    For inclusive semantics right rows sort *before* left rows at equal
    timestamps; for strict semantics they sort after (so an equal-time
    right row is not yet visible to the left row's frame).
    """
    from pyspark.sql import types as T

    # side markers chosen so ascending sort yields the wanted tie order
    right_marker, left_marker = (0, 1) if not strict else (1, 0)
    rv_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in right_values]
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(right_marker).alias("__side"),
        F.lit(True).alias("__is_right"),
        F.struct(*[F.col(c) for c in right_values]).alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(left_marker).alias("__side"),
        F.lit(False).alias("__is_right"),
        F.lit(None).cast(rv_type).alias("__rv"),
        *left.columns,
    )
    unioned = l.unionByName(r)
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__rv", ignorenulls=True).over(w).alias("__asof")
    )
    return carried.filter(~F.col("__is_right")).select(
        *left.columns,
        *[F.col("__asof").getField(c).alias(c) for c in right_values],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_time: str,
    bin_seconds: int = 1800,
) -> DataFrame:
    """Point-in-interval range join: pairs where
    ``left_start <= right_time <= left_end``, per ``on`` key.

    Naive Spark planning turns a pure inequality join into an equi-join
    on the key with a post-filter — per-key quadratic on hot keys. This
    operator uses **interval binning**: each left interval is exploded
    into the coarse time bins it covers; each right point maps to its
    single bin; the join becomes an equi-join on (key, bin) followed by
    the exact range filter. A point lies in exactly one bin, so no
    dedup is needed; work scales with rows × bins-per-interval instead
    of per-key row products. ``bin_seconds`` should be on the order of
    the typical interval length.
    """
    ls, le = F.col(left_start).cast("long"), F.col(left_end).cast("long")
    lbins = F.sequence(
        F.floor(ls / bin_seconds).cast("long"),
        F.floor(le / bin_seconds).cast("long"),
    )
    l = left.withColumn("__bin", F.explode(lbins))
    r = right.withColumn(
        "__bin",
        F.floor(F.col(right_time).cast("long") / bin_seconds).cast("long"),
    )
    joined = l.join(r, [on, "__bin"]).drop("__bin")
    return joined.filter(
        (F.col(right_time) >= F.col(left_start))
        & (F.col(right_time) <= F.col(left_end))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int = 86400,
) -> DataFrame:
    """Interval×interval overlap join: all (left, right) pairs sharing
    a key whose closed intervals intersect
    (``left_start <= right_end AND right_start <= left_end``).

    Same scale reasoning as ``range_join_binned`` (which handles the
    point-in-interval case): naive planning turns the overlap predicate
    into a per-key equi-join + post-filter — quadratic on hot keys.
    Here BOTH sides explode to the coarse bins their interval covers
    and the join becomes an equi-join on ``(key, bin)`` plus the exact
    overlap filter. Two overlapping intervals can share many bins, so
    exactly-once output needs an OWNERSHIP rule instead of a
    ``distinct()`` (which would shuffle the full pre-dedup pair set):
    a pair is emitted only in the bin containing
    ``greatest(left_start, right_start)`` — a point that overlap
    guarantees lies inside BOTH intervals, hence inside exactly one
    shared bin. ``bin_width`` (in the columns' own units) should be on
    the order of the typical interval length: work scales with
    rows × bins-per-interval, never per-key row products.
    """
    ls, le = F.col(left_start).cast("long"), F.col(left_end).cast("long")
    rs, re_ = F.col(right_start).cast("long"), F.col(right_end).cast("long")
    l = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(ls / bin_width).cast("long"),
                F.floor(le / bin_width).cast("long"),
            )
        ),
    )
    r = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(rs / bin_width).cast("long"),
                F.floor(re_ / bin_width).cast("long"),
            )
        ),
    )
    joined = l.join(r, [on, "__bin"])
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    owner = F.floor(
        F.greatest(
            F.col(left_start).cast("long"), F.col(right_start).cast("long")
        )
        / bin_width
    ).cast("long")
    return joined.filter(overlap & (F.col("__bin") == owner)).drop("__bin")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key skew spread over ``n_salts`` reducers.

    The small side is replicated ``n_salts`` times; each big-side row
    picks one replica via a per-row salt. Result equals
    ``big.join(small, on, how)`` exactly for ``inner``/``left`` (the
    only sides where replication cannot duplicate unmatched rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    # deterministic salt: hash of the full row, so reruns produce the
    # same layout/plan (monotonically_increasing_id varies per run);
    # only byte-identical duplicate rows share a salt, which is harmless
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    return salted_big.join(salted_small, [on, "__salt"], how).drop("__salt")
