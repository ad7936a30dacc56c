"""Library MERGE (upsert) on plain Spark DataFrames.

SURVEY.md §4.4 infers ``ON CONFLICT DO UPDATE`` semantics for the
reference's dimension loads (dims load after staging upserts,
reference ``dags/flights_data_pipeline.py:229-251``); the engine's
other mutation primitive — day-window delete+insert (S6) — covers
facts but not keyed dim updates once a dim is too big to rebuild.
This module supplies the missing primitive as a *library function*
(no Delta, no custom Catalyst rule — SURVEY.md §7.3):

    WHEN MATCHED THEN UPDATE SET *   (source row wins)
    WHEN NOT MATCHED THEN INSERT *
    [WHEN MATCHED AND <cond> THEN DELETE]

Scale posture (100 TB): one full-outer shuffle on the merge keys —
the same cost class as any keyed MERGE engine pays. On a real
cluster the target should be bucketed by the merge keys so only the
source side shuffles; rewriting only the partitions that contain
matched keys (dynamic partition overwrite) bounds write amplification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    delete_condition: Column | None = None,
) -> DataFrame:
    """MERGE ``source`` into ``target`` on ``keys``; returns the merged
    DataFrame (caller persists it — e.g. ``merge_parquet`` below).

    Semantics: matched rows take ALL non-key columns from the source
    (update), unmatched source rows insert, unmatched target rows are
    kept. ``delete_condition`` (evaluated on the matched source row)
    drops matched rows instead of updating them. ``source`` must be
    unique per key (enforced — a duplicate-key source makes MERGE
    ambiguous; engines reject it at runtime, so do we).

    Idempotent by construction: merging the same source twice yields a
    byte-identical table.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"merge_upsert: schema mismatch target={sorted(target.columns)} "
            f"source={sorted(source.columns)}"
        )
    source = source.select(*target.columns)  # align column order
    non_keys = [c for c in target.columns if c not in keys]

    # ambiguity guard: >1 source row per key cannot merge deterministically
    dup = (
        source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError("merge_upsert: source has duplicate merge keys")

    t = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in keys],
        F.lit(True).alias("__in_t"),
        *[F.col(c).alias(f"__t_{c}") for c in non_keys],
    )
    s = source.select(
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        F.lit(True).alias("__in_s"),
        *[F.col(c).alias(f"__s_{c}") for c in non_keys],
    )
    cond = None
    for k in keys:
        eq = F.col(f"__tk_{k}").eqNullSafe(F.col(f"__sk_{k}"))
        cond = eq if cond is None else (cond & eq)
    joined = t.join(s, cond, "full_outer")

    matched = F.col("__in_t").isNotNull() & F.col("__in_s").isNotNull()
    if delete_condition is not None:
        # delete_condition references source column names: rebind them
        src_view = joined.select(
            "*",
            *[F.col(f"__sk_{k}").alias(k) for k in keys],
            *[F.col(f"__s_{c}").alias(c) for c in non_keys],
        )
        joined = src_view.filter(
            ~(matched & F.coalesce(delete_condition, F.lit(False)))
        ).select(joined.columns)

    out_cols = {
        k: F.coalesce(F.col(f"__sk_{k}"), F.col(f"__tk_{k}")).alias(k)
        for k in keys
    } | {
        c: F.when(F.col("__in_s").isNotNull(), F.col(f"__s_{c}"))
        .otherwise(F.col(f"__t_{c}"))
        .alias(c)
        for c in non_keys
    }
    # preserve the target's column order — repeated merges must not
    # permute the stored table's schema
    return joined.select(*[out_cols[c] for c in target.columns])


def merge_parquet(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    *,
    delete_condition: Column | None = None,
) -> int:
    """MERGE ``source`` into the parquet table at ``target_path``
    (created if absent); returns the resulting row count.

    The merged snapshot is written to a staging directory and swapped
    in whole — never ``collect()`` (the result is table-sized) and
    never an in-place overwrite of files the plan is still reading.
    The swap is the same snapshot-flip a table format performs on
    commit, done here at directory granularity.
    """
    try:
        target = spark.read.parquet(target_path)
        merged = merge_upsert(
            target, source, keys, delete_condition=delete_condition
        )
    except Exception as exc:  # first load: no target yet
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        merged = source
    return _swap_in(spark, merged, target_path)


def merge_latest_parquet(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> int:
    """Keyed upsert where the row with the GREATEST ``order_cols``
    wins — the out-of-order-safe merge a streaming sink needs.

    Plain ``merge_upsert`` lets the source win unconditionally; with
    micro-batches that regresses a key whenever a later batch carries
    an older row. Here target and source rows compete on the ordering
    columns (descending, in order) and only the winner survives, so
    replays and out-of-order arrivals both converge to the same table.
    ``order_cols`` should be a deterministic total order per key (e.g.
    event time + a unique id as tiebreak).
    """
    try:
        target = spark.read.parquet(target_path)
        combined = target.unionByName(source)
    except Exception as exc:
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        combined = source
    from pyspark.sql.window import Window as W

    w = W.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    latest = (
        combined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return _swap_in(spark, latest, target_path)


def merge_additive_parquet(
    spark: SparkSession,
    target_path: str,
    increment: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> int:
    """Incremental AGGREGATE maintenance: add a pre-aggregated
    increment into a keyed rollup table without rescanning history.

    Works for any additive/mergeable measures (sums, counts): matched
    keys add component-wise, new keys insert. This is how a daily
    pre-aggregate keeps a lifetime rollup current at 100 TB — the
    alternative (recompute from raw) rescans everything ever loaded.
    Idempotency note: unlike the latest-wins merge this is NOT replay-
    idempotent (adding twice double-counts); callers pair it with the
    day-window discipline (S6) so each increment applies exactly once.
    """
    cols = keys + sum_cols
    if sorted(increment.columns) != sorted(cols):
        raise ValueError(
            f"merge_additive: increment columns {sorted(increment.columns)} "
            f"!= keys+sums {sorted(cols)}"
        )
    try:
        target = spark.read.parquet(target_path).select(*cols)
        combined = target.unionByName(increment.select(*cols))
    except Exception as exc:
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        combined = increment.select(*cols)
    merged = combined.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    return _swap_in(spark, merged, target_path)


def _swap_in(spark: SparkSession, merged: DataFrame, target_path: str) -> int:
    """Write ``merged`` to a staging dir and swap it in whole.

    Local-filesystem only: the swap uses atomic os.rename, so a remote
    URI (s3://, hdfs://) is rejected up front rather than failing
    half-way. The live table is renamed aside before the staged copy
    moves in, so no window exists where the target is deleted but not
    yet replaced — a crash leaves either the old or the new table.
    """
    import os
    import shutil

    if "://" in target_path and not target_path.startswith("file://"):
        raise ValueError(
            f"_swap_in requires a local filesystem path, got {target_path!r}; "
            "for object stores use an overwrite-by-partition write instead"
        )
    staged = target_path.rstrip("/") + "__staged"
    merged.write.mode("overwrite").parquet(staged)
    n = spark.read.parquet(staged).count()
    old = target_path.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    had_previous = os.path.exists(target_path)
    if had_previous:
        os.rename(target_path, old)
    try:
        os.rename(staged, target_path)
    except OSError:
        if had_previous:
            os.rename(old, target_path)
        raise
    if had_previous:
        shutil.rmtree(old)
    return n
