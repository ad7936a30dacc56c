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


def store_exists(spark: SparkSession, path: str) -> bool:
    """Explicit existence probe for a parquet store directory.

    Replaces the old first-load pattern of attempting the read and
    string-matching "PATH_NOT_FOUND" in the exception text (round-9
    ADVICE): on an engine/version whose error message differs, that
    pattern misclassifies unrelated read failures (corruption,
    permissions) as "store not created yet" and silently starts over.
    The Hadoop FileSystem probe answers the actual question — works
    for bare local paths and any configured scheme — and lets every
    real read error propagate."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def read_store_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """``spark.read.parquet(path)`` if the store exists, else ``None``
    (first load). Read errors on an EXISTING store propagate."""
    return spark.read.parquet(path) if store_exists(spark, path) else None


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
    target = read_store_or_none(spark, target_path)
    merged = (
        source
        if target is None  # first load: no target yet
        else merge_upsert(target, source, keys, delete_condition=delete_condition)
    )
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
    target = read_store_or_none(spark, target_path)
    combined = source if target is None else target.unionByName(source)
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
    target = read_store_or_none(spark, target_path)
    combined = (
        increment.select(*cols)
        if target is None
        else target.select(*cols).unionByName(increment.select(*cols))
    )
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
            "for object stores use an overwrite-by-partition write instead "
            "(see io/paths.py for the engine's scheme posture)"
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


SCD2_COLS = ("effective_from", "effective_to", "is_current")


def merge_scd2(
    target: DataFrame | None,
    source: DataFrame,
    keys: list[str],
    *,
    load_ts: str,
    tracked_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: keep FULL attribute
    history with validity intervals instead of overwriting in place
    (the SCD-1 semantics of ``merge_upsert``).

    ``target`` carries the source columns plus ``effective_from``
    (timestamp), ``effective_to`` (timestamp, NULL = open) and
    ``is_current`` (boolean); pass ``None`` for the first load. Per
    source row at batch time ``load_ts`` (an ISO timestamp string):

    * new key → insert an open version ``[load_ts, NULL)``;
    * matched key with any ``tracked_cols`` difference (null-safe
      struct compare) → close the current version at ``load_ts`` and
      insert the new open version;
    * matched and unchanged → untouched (so REPLAYING a batch with the
      same ``load_ts`` is a no-op — the merge is replay-idempotent);
    * keys absent from the source → untouched (dimensions never
      implicitly delete).

    Scale posture: closed history never joins — only the ``is_current``
    slice meets the source in ONE keyed full-outer shuffle (the same
    cost class as ``merge_upsert``); history is unioned back untouched,
    so write amplification is bounded by the current slice plus the
    delta. On a cluster, bucket the stored table by ``keys`` and the
    target side of the join stays shuffle-free.
    """
    if any(c in source.columns for c in SCD2_COLS):
        raise ValueError(
            f"merge_scd2: source must not carry the bookkeeping columns {SCD2_COLS}"
        )
    non_keys = [c for c in source.columns if c not in keys]
    tracked = tracked_cols if tracked_cols is not None else non_keys
    unknown = set(tracked) - set(non_keys)
    if unknown:
        raise ValueError(f"merge_scd2: tracked_cols not in source: {sorted(unknown)}")
    dup = source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError("merge_scd2: source has duplicate merge keys")

    ts = F.lit(load_ts).cast("timestamp")
    out_cols = list(source.columns) + list(SCD2_COLS)
    fresh = source.select(
        *source.columns,
        ts.alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    if target is None:
        return fresh.select(*out_cols)
    if set(target.columns) != set(out_cols):
        raise ValueError(
            f"merge_scd2: target schema {sorted(target.columns)} != "
            f"source+bookkeeping {sorted(out_cols)}"
        )

    history = target.filter(~F.col("is_current"))
    current = target.filter(F.col("is_current"))

    t = current.select(
        *[F.col(k).alias(f"__tk_{k}") for k in keys],
        F.lit(True).alias("__in_t"),
        *[F.col(c).alias(f"__t_{c}") for c in non_keys],
        F.col("effective_from").alias("__t_from"),
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
    j = t.join(s, cond, "full_outer")

    matched = F.col("__in_t").isNotNull() & F.col("__in_s").isNotNull()
    changed = matched & ~F.struct(
        *[F.col(f"__t_{c}") for c in tracked]
    ).eqNullSafe(F.struct(*[F.col(f"__s_{c}") for c in tracked]))

    def _key(k: str) -> Column:
        return F.coalesce(F.col(f"__sk_{k}"), F.col(f"__tk_{k}")).alias(k)

    # surviving current rows: unchanged-matched and target-only keys
    kept = j.filter(F.col("__in_t").isNotNull() & ~changed).select(
        *[_key(k) for k in keys],
        *[F.col(f"__t_{c}").alias(c) for c in non_keys],
        F.col("__t_from").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    closed = j.filter(changed).select(
        *[_key(k) for k in keys],
        *[F.col(f"__t_{c}").alias(c) for c in non_keys],
        F.col("__t_from").alias("effective_from"),
        ts.alias("effective_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.filter(changed | F.col("__in_t").isNull()).select(
        *[_key(k) for k in keys],
        *[F.col(f"__s_{c}").alias(c) for c in non_keys],
        ts.alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        history.select(*out_cols)
        .unionByName(kept.select(*out_cols))
        .unionByName(closed.select(*out_cols))
        .unionByName(opened.select(*out_cols))
    )


def scd2_snapshot(dim: DataFrame, as_of: str) -> DataFrame:
    """The dimension exactly as it stood at ``as_of``: the version row
    whose validity interval ``[effective_from, effective_to)`` covers
    the instant. A plain filter — partition pruning applies if the
    stored table partitions on ``is_current``/``effective_to`` — so
    point-in-time joins against facts stay scan-shaped."""
    ts = F.lit(as_of).cast("timestamp")
    return dim.filter(
        (F.col("effective_from") <= ts)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > ts))
    ).drop(*SCD2_COLS)


def merge_scd2_parquet(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    *,
    load_ts: str,
    tracked_cols: list[str] | None = None,
) -> int:
    """``merge_scd2`` against the parquet table at ``target_path``
    (created on first load), swapped in atomically like the other
    parquet merges; returns the resulting row count."""
    target = read_store_or_none(spark, target_path)
    merged = merge_scd2(
        target, source, keys, load_ts=load_ts, tracked_cols=tracked_cols
    )
    return _swap_in(spark, merged, target_path)
