"""Time-series analytics shapes over the events stream table.

The reference's mart layer answers daily-rollup questions
(``fct_seat_occupied_daily`` — SURVEY.md §1.4); the two shapes here are
the canonical time-series constructions layered on such rollups that
plain GROUP BY cannot express:

* ``gap_fill_forward`` — a dense date spine with last-observation-
  carried-forward: reporting tables must show EVERY (entity, day) cell,
  including days with no fact rows (a missing day is not a zero — it
  is "unchanged since yesterday" for balance-like measures).
* ``cohort_retention`` — the classic product-analytics triangle:
  users grouped by first-activity week, activity counted per week
  offset, retention as a share of the cohort's size.

Float discipline: money stays decimal until the output surface
(``money_out``); ratios divide a bigint by a bigint cast to double on
both engines (identical operands → identical IEEE quotient).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.scalars import money as _dec
from ..io.catalog import load_table as t
from .registry import query


# ---------------------------------------------------------------------------
# Dense date spine + forward fill (gaps-and-carry).
# ---------------------------------------------------------------------------
@query(
    "gap_fill_forward",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events
    ),
    days AS (
      SELECT CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds b
    ),
    spine AS (
      SELECT u.user_id, days.day
      FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN days
    ),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS spend
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT s.user_id, s.day,
           CAST(d.spend AS DOUBLE) AS day_spend,
           CAST(last_value(d.spend IGNORE NULLS)
                  OVER (PARTITION BY s.user_id ORDER BY s.day
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS filled_spend,
           d.spend IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily purchase spend on a DENSE day spine, gaps
    forward-filled with the last observed value.

    The spine is generated, never stored: ``sequence(min_day,
    max_day)`` exploded against the distinct-user list — at 100 TB the
    spine is |users| × |days| rows of two small columns, built from
    one O(1) bounds aggregate; the fact table contributes only its
    actual rows via a left join on (user, day). The forward fill is
    ``last(ignorenulls)`` over an unbounded-preceding frame — one
    window pass per user partition, no self-join chain.
    """
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    users = ev.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(_dec("value")).cast("decimal(18,2)").alias("spend"))
    )
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    return joined.select(
        "user_id",
        "day",
        F.col("spend").cast("double").alias("day_spend"),
        F.last("spend", ignorenulls=True).over(w).cast("double").alias(
            "filled_spend"
        ),
        F.col("spend").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# Cohort retention triangle.
# ---------------------------------------------------------------------------
@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST((CAST(date_trunc('week', e.ts) AS DATE) - f.cohort_week)
                  / 7 AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    cohort_sizes AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           s.cohort_size,
           COUNT(*) / CAST(s.cohort_size AS DOUBLE) AS retention
    FROM activity a JOIN cohort_sizes s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    distinct-active counted at each week offset, retention as the
    cohort share still active.

    Two aggregates and one fact join: firsts (one row per user) is
    orders of magnitude smaller than events, so it broadcasts into the
    activity join; the distinct collapses (user, offset) duplicates
    map-side before the final count. Both engines compute the offset
    as exact integer day arithmetic (datediff/7 floor division) and
    retention as bigint/double(bigint) — no rounding anywhere.
    """
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.select("user_id", "ts")
        .join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active") / F.col("cohort_size").cast("double")).alias(
                "retention"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Time-based RANGE frame: rolling 7-day sum per user.
# ---------------------------------------------------------------------------
@query(
    "rolling_7day_user_spend",
    oracle="""
    SELECT user_id, ts, event_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                              AND CURRENT ROW)
                AS DECIMAL(18,2)) AS DOUBLE) AS spend_7d,
           CAST(COUNT(*)
                  OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS n_7d
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def rolling_7day_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase, the user's trailing-7-day spend and purchase count
    — the time-based RANGE frame (each row's frame is a VALUE interval
    on the ordering column, not a row count; two purchases seconds
    apart share almost the same frame, which no ROWS frame can say).

    Spark's rangeBetween needs a numeric ordering column, so the frame
    runs over ``unix_micros(ts)`` with a 7-day microsecond radius —
    identical frame membership to the oracle's INTERVAL arithmetic
    (timestamps are exact microsecond integers in both engines; ties
    on the boundary land identically). One shuffle on user_id; within
    a partition the running frame is a two-pointer pass over the
    sorted rows.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    micros_7d = 7 * 24 * 3600 * 1_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-micros_7d, 0)
    )
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(_dec("value")).over(w).cast("decimal(18,2)").cast("double").alias(
            "spend_7d"
        ),
        F.count("*").over(w).cast("bigint").alias("n_7d"),
    )


# ---------------------------------------------------------------------------
# OHLC resample: 5-minute bars per event type.
# ---------------------------------------------------------------------------
@query(
    "events_ohlc_5min",
    oracle="""
    WITH b AS (
      SELECT event_type,
             time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
             ts, event_id, value
      FROM events
    ),
    o AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket_start
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket_start
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, bucket_start,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM o
    GROUP BY event_type, bucket_start
    """,
)
def events_ohlc_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream into 5-minute OHLC bars per type —
    the resample operator every metrics/monitoring pipeline runs
    before plotting or anomaly-scoring a high-frequency series.

    open/close are order-statistics, not sums: ``min_by``/``max_by``
    with a (ts, event_id) struct key make them deterministic under
    duplicate timestamps, and no double is ever ADDED, so every output
    is an exact input value and the cross-engine compare is exact
    (the oracle states the same selection with row_number because
    DuckDB's arg_min takes no composite key). One shuffle on
    (type, bucket): min/max/count collapse map-side; the min_by/max_by
    partials are a single (key, value) pair each — at 100 TB the
    exchange carries one row per bar per task, nothing row-level.

    Bucket alignment: Spark's ``window`` aligns to the epoch, DuckDB's
    ``time_bucket`` to 2000-01-03; both origins are multiples of 300 s,
    so the 5-minute boundaries coincide.
    """
    ev = t(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization (batch).
# ---------------------------------------------------------------------------
@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                              THEN CAST(value AS DECIMAL(18,2))
                              ELSE CAST(0 AS DECIMAL(18,2)) END)
                     AS DECIMAL(18,2)) AS DOUBLE) AS session_spend
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30 min of
    user inactivity; each session reports its bounds, event count and
    purchase spend.

    The classic two-window construction — ``lag`` flags session
    starts, a running sum numbers them — then one groupBy collapses
    events to sessions. All three passes share the SAME partitioning
    (user_id), so the plan carries ONE shuffle: both window specs and
    the aggregation reuse the first Exchange (the groupBy keys are a
    superset of the window partition key). At 100 TB the state per
    task is one user's event stream — no driver involvement, and the
    running sum is streamed per partition, not materialized.
    Microsecond arithmetic (``unix_micros``) keeps the gap predicate
    exact under both MICROS and NANOS parquet physical types.
    """
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_sess")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint"),
    )
    spend = F.when(
        F.col("event_type") == "purchase", _dec("value")
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(spend).cast("decimal(18,2)").cast("double").alias(
                "session_spend"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: contiguous active-day ranges.
# ---------------------------------------------------------------------------
@query(
    "gaps_and_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    anchored AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS anchor
      FROM days
    )
    SELECT user_id,
           MIN(day) AS island_start,
           MAX(day) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM anchored
    GROUP BY user_id, anchor
    """,
)
def gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous runs of active DAYS per user (gaps-and-islands): a
    run breaks wherever a calendar day with no events intervenes.

    The ``day - row_number`` anchor trick: within a contiguous run the
    difference between the day and its per-user rank is constant, so
    grouping by (user, anchor) collapses each island without any
    self-join or iterative pass. Same single-shuffle profile as
    sessionization — distinct, window, and groupBy all hash on
    user_id, and the distinct pre-collapses map-side so the window
    sees days, not raw events.
    """
    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    anchored = days.withColumn("anchor", F.date_sub(F.col("day"), rn))
    return (
        anchored.groupBy("user_id", "anchor")
        .agg(
            F.min("day").alias("island_start"),
            F.max("day").alias("island_end"),
            F.count("*").cast("bigint").alias("n_days"),
        )
        .drop("anchor")
    )


# ---------------------------------------------------------------------------
# Z-score anomaly detection with cross-engine-exact moments.
# ---------------------------------------------------------------------------
@query(
    "anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ),
    scored AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - s.s1 / s.n)
               / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS zscore
      FROM events e JOIN stats s USING (event_type)
    )
    SELECT event_id, event_type, value, zscore
    FROM scored WHERE abs(zscore) > 3.0
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is a >3-sigma outlier within its event type.

    Cross-engine float discipline: the naive ``stddev_samp`` is an
    order-dependent double fold (and Spark/DuckDB use different
    accumulation algorithms), so the moments are computed as EXACT
    decimal sums — sum(x) and sum(x*x) over DECIMAL(18,2) (products
    widen to DECIMAL(38,4); both engines sum decimals exactly) — and
    only then cast to double. From identical (n, s1, s2) doubles, the
    variance/sqrt/division chain is correctly-rounded IEEE arithmetic,
    bit-identical on both engines, so even the ``> 3.0`` knife-edge
    classifies identically.

    Plan shape: one groupBy per type (map-side partials), the 5-row
    stats side broadcast into the second scan — two scans, zero
    row-level shuffles. At 100 TB this is the canonical
    "tiny-aggregate then broadcast re-join" profile.
    """
    ev = t(spark, sf_dir, "events")
    dec = _dec("value")
    stats = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    s = F.broadcast(stats)
    joined = ev.join(s, "event_type")
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - F.lit(1).cast("double")
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        joined.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 3.0)
        .select("event_id", "event_type", "value", "zscore")
    )


# ---------------------------------------------------------------------------
# Interval×interval overlap join (binned — the operator Spark lacks).
# ---------------------------------------------------------------------------
#: bin width for the shipment-overlap query, in DAYS: ship→receipt
#: windows run ~2-8 weeks, so 32-day bins put a typical interval in
#: 1-3 bins (work = rows × bins-per-interval, never per-key products).
OVERLAP_BIN_DAYS = 32


@query(
    "overlapping_shipments",
    oracle="""
    WITH li AS (
      SELECT l_partkey, l_orderkey, l_linenumber,
             CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE)
               + CAST(floor(l_quantity) AS INTEGER) AS e
      FROM lineitem WHERE l_returnflag = 'R'
    ),
    p AS (
      SELECT a.l_partkey,
             datediff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1
               AS overlap_days
      FROM li a JOIN li b
        ON a.l_partkey = b.l_partkey
       AND (a.l_orderkey, a.l_linenumber) < (b.l_orderkey, b.l_linenumber)
       AND a.s <= b.e AND b.s <= a.e
    )
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(overlap_days) AS BIGINT) AS total_overlap_days
    FROM p GROUP BY 1
    """,
)
def overlapping_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part: how many pairs of returned-flag shipments were in
    transit concurrently (closed [shipdate, shipdate+floor(quantity)
    days] windows overlapping — quantity stands in for transit length
    in this schema), and the total overlapping days — the
    interval×interval join underlying resource-contention analytics
    (port congestion, warehouse co-residency, GPU-reservation overlap).

    Spark has no overlap-join operator; the engine's
    ``operators.joins.interval_overlap_join`` supplies it: both sides
    explode to {OVERLAP_BIN_DAYS}-day bins, equi-join on (key, bin),
    exact overlap filter, and an OWNERSHIP-bin rule (the pair is kept
    only in the bin containing the later start) makes output
    exactly-once without a distinct over the pre-dedup pair set. The
    oracle states the same pairs with a plain inequality self-join —
    per-key quadratic, fine for DuckDB at test scale, the exact shape
    the binning avoids at 100 TB. Overlap lengths are integer day
    arithmetic, and the transit-days derivation uses ``floor`` (exact
    in both engines; a raw double→int cast rounds in DuckDB and
    truncates in Spark).
    """
    from ..operators.joins import interval_overlap_join

    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.to_date("l_shipdate").alias("s"),
            F.date_add(
                F.to_date("l_shipdate"),
                F.floor("l_quantity").cast("int"),
            ).alias("e"),
        )
    )
    # the operator bins NUMERIC interval bounds: days since epoch
    a = li.select(
        "l_partkey",
        F.col("l_orderkey").alias("a_ok"),
        F.col("l_linenumber").alias("a_ln"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
        F.unix_date("s").alias("a_sd"),
        F.unix_date("e").alias("a_ed"),
    )
    b = li.select(
        "l_partkey",
        F.col("l_orderkey").alias("b_ok"),
        F.col("l_linenumber").alias("b_ln"),
        F.unix_date("s").alias("b_sd"),
        F.unix_date("e").alias("b_ed"),
    )
    pairs = interval_overlap_join(
        a, b, "l_partkey", "a_sd", "a_ed", "b_sd", "b_ed",
        bin_width=OVERLAP_BIN_DAYS,
    )
    # unordered pairs once: the operator emits (x,y) and (y,x)
    ordered = pairs.filter(
        F.struct("a_ok", "a_ln") < F.struct("b_ok", "b_ln")
    )
    overlap_days = (
        F.least("a_ed", "b_ed") - F.greatest("a_sd", "b_sd") + F.lit(1)
    )
    return (
        ordered.select("l_partkey", overlap_days.alias("od"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").cast("bigint").alias("n_overlaps"),
            F.sum("od").cast("bigint").alias("total_overlap_days"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA (dyadic alpha): exact sequential smoothing as an ordered fold.
# ---------------------------------------------------------------------------
@query(
    "ewma_user_value",
    oracle="""
    WITH o AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             list(value ORDER BY ts, event_id) AS vals
      FROM events
      GROUP BY user_id
    )
    SELECT user_id, n_events,
           vals[len(vals)] AS last_value,
           list_reduce(vals, (acc, x) -> (acc + x) / 2.0) AS ewma
    FROM o
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values
    (α = 1/2, seeded with the first observation): the recursive
    smoother behind rate limiting, anomaly baselines, and engagement
    scores — a computation SQL window functions cannot express
    (EWMA is a linear RECURRENCE, not a frame aggregate), restated as
    an ordered array fold.

    Cross-engine exactness: α = 1/2 makes every step one addition and
    one division by 2 (exact in binary floating point); the fold is
    STRICTLY sequential over the identical (ts, event_id) order in
    both engines, so even where addition rounds, both engines round
    the same bits — the module's strict-left-fold rule applied to a
    recurrence. Plan: one groupBy(user_id) collects each user's
    ordered series in-row (bounded by per-user activity — the same
    per-entity-array posture as ``gap_fill_forward``); the fold runs
    inside codegen, no UDF, no iteration.
    """
    ev = t(spark, sf_dir, "events")
    o = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"],
        ).alias("vals"),
    )
    tail = F.slice(
        "vals", 2, F.greatest(F.size("vals") - 1, F.lit(0))
    )
    return o.select(
        "user_id",
        "n_events",
        F.element_at("vals", -1).alias("last_value"),
        F.aggregate(
            tail,
            F.element_at("vals", 1),
            lambda acc, x: (acc + x) / F.lit(2.0),
        ).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension history build from a change-event log.
# ---------------------------------------------------------------------------
@query(
    "scd2_user_state_history",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts, event_type FROM events
    ),
    changed AS (
      SELECT * FROM (
        SELECT user_id, event_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM ev
      ) WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT)
             AS version,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL AS is_current
    FROM changed
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build: compress each user's
    event stream into state VERSIONS with ``[valid_from, valid_to)``
    intervals and an ``is_current`` flag — the standard warehouse
    history-dimension shape (the reference's dim tables are SCD1
    overwrite; this is the history-preserving upgrade an analytics
    engine needs for point-in-time joins).

    Two window passes, both partitioned by the dimension's natural key:
    (1) LAG drops same-state repeats (change-log compression — the step
    that makes version counts independent of raw event volume), (2)
    LEAD closes each version with its successor's start. Ordering ties
    on ``ts`` break on ``event_id``, so the build is deterministic on
    replayed logs. Scale posture: the only shuffles are the two
    hash-partitions on user_id (and AQE coalesces them into one
    exchange reuse); no self-join, no driver state.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .drop("prev")
    )
    return changed.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Point-in-time join against the SCD2 history (time-travel enrichment).
# ---------------------------------------------------------------------------
@query(
    "point_in_time_state_join",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts, event_type FROM events
    ),
    changed AS (
      SELECT * FROM (
        SELECT user_id, event_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM ev
      ) WHERE prev IS NULL OR prev <> event_type
    ),
    scd AS (
      SELECT user_id,
             event_type AS state,
             ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT)
               AS version
      FROM changed
    )
    SELECT s.state, s.version = 1 AS in_first_version,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e
    JOIN scd s
      ON e.user_id = s.user_id
     AND e.ts >= s.valid_from
     AND (s.valid_to IS NULL OR e.ts < s.valid_to)
    GROUP BY s.state, s.version = 1
    """,
)
def point_in_time_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: every event joined to the SCD2 state
    version that was LIVE at its timestamp — the lookup the history
    dimension (``scd2_user_state_history``) exists to serve (a.k.a.
    time-travel join / temporal join; the feature-store
    "as-of-the-label-time" pattern that prevents training-data
    leakage from future attribute values).

    Interval containment ``valid_from <= ts < valid_to`` plans as an
    equi-join on ``user_id`` with the interval predicate as a join
    filter — correct at scale because a user's version count is
    change-log-compressed (bounded), so per-key fan-out stays small;
    the half-open intervals partition each user's timeline (pinned by
    ``tests/test_new_ops_invariants.py``), so every event matches
    EXACTLY one version — asserted here by construction: the output
    event total equals the events table row count.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .drop("prev")
    )
    scd = changed.select(
        F.col("user_id").alias("s_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )
    e = t(spark, sf_dir, "events").select("user_id", "ts")
    joined = e.join(
        scd,
        (e.user_id == scd.s_user)
        & (e.ts >= scd.valid_from)
        & (scd.valid_to.isNull() | (e.ts < scd.valid_to)),
    )
    return joined.groupBy(
        "state", (F.col("version") == 1).alias("in_first_version")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection over daily series (integer, window-only).
# ---------------------------------------------------------------------------
@query(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type,
             CAST(SUM(x) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS d
      FROM daily GROUP BY event_type
    ),
    scaled AS (
      SELECT daily.event_type, day, x,
             SUM(daily.x * tot.d - tot.t)
               OVER (PARTITION BY daily.event_type ORDER BY day) AS p,
             tot.t, tot.d
      FROM daily JOIN tot ON daily.event_type = tot.event_type
    ),
    cusum AS (
      SELECT event_type, day, x, t, d,
             p - LEAST(0, MIN(p) OVER (PARTITION BY event_type
                                       ORDER BY day)) AS s
      FROM scaled
    )
    SELECT event_type, day, x, CAST(s AS BIGINT) AS cusum_scaled,
           2 * s > t AS alarm
    FROM cusum
    WHERE 2 * s > t
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint alarms over the daily event-count series per
    event type (Page 1954, public): flag the days where the one-sided
    cumulative sum of deviations-above-mean exceeds the threshold —
    the standard sequential drift detector a pipeline runs on its own
    volume telemetry.

    Two exactness restatements make it cross-engine bit-exact:

    * the recurrence ``S_t = max(0, S_{t-1} + (x_t - mean))`` is
      closed-form ``S_t = P_t - min(0, min_{j<=t} P_j)`` with ``P`` the
      running sum of deviations — two plain window functions, no
      iterative fold;
    * the fractional mean ``T/D`` never materializes: everything is
      scaled by ``D`` (deviation = ``x*D - T``, threshold = ``3*T``
      i.e. 3x the mean daily count) — pure bigint arithmetic.

    Scale posture: one shuffle to daily counts, one broadcastable
    per-series total row, windows partitioned by series key. Alarm days
    only are returned (the incident list, not the full trace).
    """
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("x").cast("bigint").alias("t_sum"),
        F.count("*").cast("bigint").alias("d_cnt"),
    )
    w = W.partitionBy("event_type").orderBy("day")
    scaled = daily.join(tot, "event_type").withColumn(
        "p",
        F.sum(F.col("x") * F.col("d_cnt") - F.col("t_sum")).over(w),
    )
    cusum = scaled.withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("bigint"), F.min("p").over(w))
    )
    return cusum.filter(2 * F.col("s") > F.col("t_sum")).select(
        "event_type",
        "day",
        "x",
        F.col("s").cast("bigint").alias("cusum_scaled"),
        (2 * F.col("s") > F.col("t_sum")).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend over daily series (median of pairwise slopes).
# ---------------------------------------------------------------------------
@query(
    "theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             (b.x - a.x) / CAST(datediff('day', a.day, b.day) AS DOUBLE)
               AS slope,
             a.day AS d1, b.day AS d2
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope, d1, d2) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM slopes
    )
    SELECT event_type,
           slope AS sen_slope,
           CAST(n AS BIGINT) AS n_pairs
    FROM ranked
    WHERE rn = (n + 1) // 2
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator (Theil 1950 / Sen 1968, public) of each
    event type's daily-volume trend: the MEDIAN of all pairwise slopes
    — robust to ~29% outliers where least squares is wrecked by one bad
    day. Completes the robust-monitoring family (MAD dispersion, CUSUM
    changepoints, Theil-Sen trend).

    Exactness: every slope is one IEEE division of exact integers
    (count delta / day delta), identical in both engines; the median is
    an exact order statistic — ROW_NUMBER at rank ``(n+1) DIV 2`` with
    a total (slope, d1, d2) tiebreak, never an interpolating
    percentile (engines interpolate differently).

    Scale honesty: pairwise slopes are O(D²) in the number of DAYS per
    series — bounded and tiny (a decade is ~3.7k days → 6.6M pairs per
    series, one shuffle), never O(rows²). The equi-join on the series
    key keeps pair generation partition-local per series.
    """
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.x") - F.col("a.x"))
            / F.datediff(F.col("b.day"), F.col("a.day")).cast("double")
        ).alias("slope"),
        F.col("a.day").alias("d1"),
        F.col("b.day").alias("d2"),
    )
    w = W.partitionBy("event_type").orderBy("slope", "d1", "d2")
    wc = W.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(
        "event_type",
        F.col("slope").alias("sen_slope"),
        F.col("n").cast("bigint").alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# OLS trend over daily series (exact normal-equation arithmetic).
# ---------------------------------------------------------------------------
def ols_from_daily(daily: DataFrame) -> DataFrame:
    """OLS slope/intercept from a (event_type, day, y) daily table —
    the exact normal-equation math shared by the batch query below and
    the streaming sufficient-statistics job
    (``streaming/jobs.ols_stats_stream``), so both paths produce
    bit-identical trends from the same day-level rollup."""
    origin = daily.groupBy("event_type").agg(F.min("day").alias("day0"))
    xy = daily.join(F.broadcast(origin), "event_type").select(
        "event_type",
        F.datediff("day", "day0").cast("bigint").alias("x"),
        "y",
    )
    sums = xy.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    inum = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return sums.filter(F.col("n") >= 2).select(
        "event_type",
        F.col("n").alias("n_days"),
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        (num.cast("double") / den.cast("double")).alias("slope_per_day"),
        (inum.cast("double") / den.cast("double")).alias("intercept"),
    )


@query(
    "ols_trend_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    origin AS (
      SELECT event_type, MIN(day) AS day0 FROM daily GROUP BY 1
    ),
    xy AS (
      SELECT d.event_type,
             CAST(datediff('day', o.day0, d.day) AS BIGINT) AS x,
             d.y
      FROM daily d JOIN origin o ON d.event_type = o.event_type
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM xy GROUP BY event_type
    )
    SELECT event_type,
           n AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_per_day,
           CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS intercept
    FROM sums
    WHERE n >= 2
    """,
)
def ols_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend (slope + intercept) of each event type's
    daily volume — the parametric sibling of ``theil_sen_trend``; a
    monitoring layer reports both (OLS = efficient under clean data,
    Theil-Sen = robust) and alerts when they diverge, which is itself
    an outlier signal.

    Exactness: the normal equations are evaluated entirely in bigint
    (x is the day offset from the series' own first day, y the daily
    count; ``n·Σxy − Σx·Σy`` and ``n·Σx² − (Σx)²`` are exact integer
    sums), then slope and intercept are each ONE IEEE division of the
    same two bigints in both engines — bit-identical quotients. The
    exact numerator/denominator are also emitted so a consumer can
    compare trends without any float at all.

    Scale posture: one shuffle to daily counts, one tiny per-series
    origin join (broadcastable), one partial-aggregated groupBy — the
    classic sufficient-statistics pattern: 100 TB of raw events
    reduce to five bigints per series before any math happens.
    """
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    return ols_from_daily(daily)


# ---------------------------------------------------------------------------
# Autocorrelation at lags 1..7 (Pearson r over aligned day pairs).
# ---------------------------------------------------------------------------
@query(
    "autocorr_daily_lags",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT CAST(unnest([1,2,3,4,5,6,7]) AS BIGINT) AS lag),
    pairs AS (
      SELECT a.event_type, l.lag, a.x AS x, b.x AS y
      FROM daily a CROSS JOIN lags l
      JOIN daily b
        ON b.event_type = a.event_type
       AND b.day = a.day + CAST(l.lag AS INT) * INTERVAL 1 DAY
    ),
    sums AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, lag, n AS n_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS acf
    FROM sums
    WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def autocorr_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of each event type's daily volume at
    lags 1–7 days: Pearson r between the series and itself shifted by
    L days, over exactly the day pairs where BOTH observations exist
    (a gap day contributes no pair — never an imputed zero). The
    weekly lag-7 spike vs a flat tail is the standard seasonality
    fingerprint a forecasting pipeline checks before model choice.

    Exactness: all five sufficient statistics are exact bigint sums;
    the quotient is one double division by one double sqrt of a double
    product — every step an IEEE-correctly-rounded op on identical
    operands in both engines, so the floats hash-match. Degenerate
    series (constant within the overlap → zero variance) are filtered
    on the EXACT integer variance, not a float epsilon.

    Scale posture: the 7 lags come from one broadcast 7-row literal;
    alignment is an equi-join on the precomputed target day (hash
    join, no inequality scan); everything after is partial-aggregated
    sufficient statistics — the same 100 TB→bigints funnel as
    ``ols_trend_daily``.
    """
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    lags = spark.range(1, 8).select(F.col("id").cast("bigint").alias("lag"))
    aug = daily.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "x",
        "lag",
        F.date_add("day", F.col("lag").cast("int")).alias("tday"),
    )
    b = daily.select(
        F.col("event_type").alias("event_type"),
        F.col("day").alias("tday"),
        F.col("x").alias("y"),
    )
    pairs = aug.join(b, ["event_type", "tday"])
    sums = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.filter(
        (F.col("n") >= 2) & (vx > 0) & (vy > 0)
    ).select(
        "event_type",
        "lag",
        F.col("n").alias("n_pairs"),
        (num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double"))).alias(
            "acf"
        ),
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov estimate).
# ---------------------------------------------------------------------------
@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    trans AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    out_deg AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS out_total
      FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n AS n_transitions,
           d.out_total,
           CAST(t.n AS DOUBLE) / CAST(d.out_total AS DOUBLE) AS prob
    FROM trans t JOIN out_deg d ON t.from_type = d.from_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: for every (from_type → to_type) pair, the transition
    count and the maximum-likelihood probability ``n / out_degree`` —
    the model behind next-action prediction, funnel-leak detection,
    and bot fingerprinting (a scripted user's matrix is near-
    deterministic; a human's is diffuse).

    Ordering is a TOTAL per-user order (ts + event_id tiebreak — two
    events in the same microsecond otherwise make LEAD nondeterministic
    across engines). Counts are exact bigints; each probability is one
    IEEE division of the same two bigints in both engines.

    Scale posture: one window pass partitioned by user (the natural
    key — sequences never cross users, so partitions are independent),
    then a groupBy on the pair — output is |event_types|² rows, tiny
    at any corpus scale. The same shape runs incrementally by keeping
    each user's LAST event as state and counting transitions per
    arriving batch.
    """
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count("*").cast("bigint").alias("n_transitions")
    )
    out_deg = trans.groupBy("from_type").agg(
        F.sum("n_transitions").cast("bigint").alias("out_total")
    )
    return trans.join(out_deg, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "out_total",
        (
            F.col("n_transitions").cast("double")
            / F.col("out_total").cast("double")
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonality profile (exact rational seasonal index).
# ---------------------------------------------------------------------------
@query(
    "dow_seasonality_profile",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    by_dow AS (
      SELECT event_type,
             CAST(dayofweek(day) + 1 AS INT) AS dow,
             CAST(SUM(x) AS BIGINT) AS dow_events,
             CAST(COUNT(*) AS BIGINT) AS dow_days
      FROM daily GROUP BY 1, 2
    ),
    totals AS (
      SELECT event_type,
             CAST(SUM(dow_events) AS BIGINT) AS all_events,
             CAST(SUM(dow_days) AS BIGINT) AS all_days
      FROM by_dow GROUP BY event_type
    )
    SELECT b.event_type, b.dow, b.dow_events, b.dow_days,
           CAST(b.dow_events * t.all_days AS DOUBLE)
             / CAST(b.dow_days * t.all_events AS DOUBLE) AS seasonal_index
    FROM by_dow b JOIN totals t ON b.event_type = t.event_type
    """,
)
def dow_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type: mean daily volume on
    each weekday divided by the overall mean daily volume — index > 1
    marks the hot weekdays. The decomposition sibling of
    ``autocorr_daily_lags`` (the lag-7 ACF *detects* weekly
    seasonality; this profile *shapes* it), and the correction factor
    a forecasting or anomaly layer divides out first.

    Means are over OBSERVED days only (a day absent from the rollup is
    unknown, not zero — same missing-day stance as the ACF). The index
    is the ratio of two fractions restated as one IEEE division of two
    exact bigint PRODUCTS: ``(dow_events·all_days) /
    (dow_days·all_events)`` — no intermediate float. Weekday numbering
    pins Spark's ``dayofweek`` (1 = Sunday); the oracle maps DuckDB's
    0-based ``dayofweek`` onto the same scale.

    Scale posture: one shuffle to daily counts, one to (series, dow) —
    7 rows per series out; sufficient statistics all the way.
    """
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    by_dow = daily.groupBy(
        "event_type", F.dayofweek("day").cast("int").alias("dow")
    ).agg(
        F.sum("x").cast("bigint").alias("dow_events"),
        F.count("*").cast("bigint").alias("dow_days"),
    )
    totals = by_dow.groupBy("event_type").agg(
        F.sum("dow_events").cast("bigint").alias("all_events"),
        F.sum("dow_days").cast("bigint").alias("all_days"),
    )
    return by_dow.join(totals, "event_type").select(
        "event_type",
        "dow",
        "dow_events",
        "dow_days",
        (
            (F.col("dow_events") * F.col("all_days")).cast("double")
            / (F.col("dow_days") * F.col("all_events")).cast("double")
        ).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival time distribution (exact order-statistic summary).
# ---------------------------------------------------------------------------
@query(
    "interarrival_stats",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    gaps AS (
      SELECT event_type, CAST(gap_us AS BIGINT) AS gap_us
      FROM seq WHERE gap_us IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, gap_us,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY gap_us) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM gaps
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_us,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2
                         THEN gap_us END) AS BIGINT) AS median_us,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10
                         THEN gap_us END) AS BIGINT) AS p90_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_us
    FROM ranked
    GROUP BY event_type
    """,
)
def interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: the gaps between
    a user's CONSECUTIVE events of the same type, summarized as exact
    order statistics (min / median / p90 / max, in microseconds) — the
    telemetry a rate-limit, bot-detection, or capacity layer reads
    (a p90 gap collapsing toward the min is a burst signature).

    Exactness: gaps are bigint microsecond differences; every quantile
    is an exact RANK pick — row_number at ``(n+1) DIV 2`` and
    ``ceil(0.9n) = (9n+9) DIV 10`` under a total (gap, rank) order —
    never an interpolating percentile (engines interpolate
    differently). NULL first-events drop out before ranking.

    Scale posture: one window pass partitioned by (user, type) — the
    sequence key, so partitions are independent and skew-free — then
    one rank window per event type over the gap table (gaps ≈ events,
    one shuffle on the 5-value type key; at real cardinalities the
    rank window keys on (type, day) to bound partitions).
    """
    ev = t(spark, sf_dir, "events")
    ws = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(ws)
            ).cast("bigint").alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    wr = W.partitionBy("event_type").orderBy("gap_us")
    wn = W.partitionBy("event_type")
    ranked = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_us"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap_us")
            )
        ).cast("bigint").alias("median_us"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("gap_us")
            )
        ).cast("bigint").alias("p90_us"),
        F.max("gap_us").cast("bigint").alias("max_us"),
    )


# ---------------------------------------------------------------------------
# Discrete churn hazard by tenure day (Kaplan-Meier risk sets).
# ---------------------------------------------------------------------------
@query(
    "user_churn_hazard",
    oracle="""
    WITH span AS (
      SELECT user_id,
             CAST(datediff('day', MIN(CAST(ts AS DATE)),
                           MAX(CAST(ts AS DATE))) AS BIGINT) AS last_day
      FROM events GROUP BY user_id
    ),
    exits AS (
      SELECT last_day AS tenure_day, CAST(COUNT(*) AS BIGINT) AS d
      FROM span GROUP BY last_day
    ),
    risk AS (
      SELECT tenure_day, d,
             CAST(SUM(d) OVER (ORDER BY tenure_day DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS n_at_risk
      FROM exits
    )
    SELECT tenure_day, d AS n_exits, n_at_risk,
           CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS hazard
    FROM risk
    """,
)
def user_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete churn hazard by tenure day — the Kaplan-Meier building
    block (Kaplan & Meier 1958, public): for each tenure day t, the
    share of still-active users whose LAST activity fell on day t of
    their lifetime: ``hazard(t) = exits(t) / at_risk(t)`` with
    ``at_risk(t) = Σ_{s≥t} exits(s)`` (everyone who survived to t).
    A hazard spike at t=13 is the "day-13 cliff" a retention team
    hunts for.

    Exactness: tenure is exact integer day arithmetic per user; the
    risk set is a reversed cumulative sum over the ~|days| exit rows
    (exact bigint); each hazard is one IEEE division of the same two
    bigints in both engines. The survival CURVE (the cumulative
    product) is deliberately NOT emitted — float products are
    evaluation-order-sensitive across engines; consumers fold the
    hazard rows client-side in tenure order.

    Scale posture: one groupBy to user spans (user-grain), one to exit
    counts (day-grain — tiny), one single-partition window over ~|days|
    rows. The 100 TB cost is the first groupBy, which any retention
    metric pays.
    """
    ev = t(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).cast("bigint").alias("last_day")
    )
    exits = span.groupBy(F.col("last_day").alias("tenure_day")).agg(
        F.count("*").cast("bigint").alias("n_exits")
    )
    w = (
        W.orderBy(F.col("tenure_day").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risk = exits.withColumn(
        "n_at_risk", F.sum("n_exits").over(w).cast("bigint")
    )
    return risk.select(
        "tenure_day",
        "n_exits",
        "n_at_risk",
        (
            F.col("n_exits").cast("double") / F.col("n_at_risk").cast("double")
        ).alias("hazard"),
    )


# ---------------------------------------------------------------------------
# View→purchase conversion latency (exact rank-pick quartiles).
# ---------------------------------------------------------------------------
@query(
    "conversion_latency_quartiles",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT f.user_id,
             CAST(epoch_us(MIN(e.ts)) - epoch_us(f.first_view) AS BIGINT)
               AS latency_us
      FROM firsts f
      JOIN events e
        ON e.user_id = f.user_id
       AND e.event_type = 'purchase' AND e.ts >= f.first_view
      WHERE f.first_view IS NOT NULL
      GROUP BY f.user_id, f.first_view
    ),
    ranked AS (
      SELECT latency_us,
             row_number() OVER (ORDER BY latency_us, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM conv
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converters,
           CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN latency_us END)
                AS BIGINT) AS p25_us,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN latency_us END)
                AS BIGINT) AS median_us,
           CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN latency_us END)
                AS BIGINT) AS p75_us
    FROM ranked
    """,
)
def conversion_latency_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time from a user's FIRST view to their FIRST subsequent
    purchase, summarized as exact rank-pick quartiles — the
    time-to-convert distribution behind funnel SLAs (``user_funnel``
    counts who converts; this measures how long conversion takes).

    Semantics: the purchase must be AT OR AFTER the first view (a
    purchase that precedes any view is not a conversion of it); users
    without both events drop out structurally. Quartiles are exact
    order statistics at ceil(n/4), ceil(n/2)=(n+1) DIV 2 (lower
    median), ceil(3n/4) under a total (latency, user) order — no
    interpolation, so both engines pick the identical row.

    Scale posture: one user-grain conditional aggregate, one
    filtered equi-join back to purchases on the user key, one
    user-grain min — then a global rank over |converters| rows
    (user-grain; at real scale the rank keys on a coarse latency
    bucket first, the standard two-pass exact quantile).
    """
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        )
    ).filter(F.col("first_view").isNotNull())
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(
            (
                F.unix_micros(F.min("ts")) - F.unix_micros(F.col("first_view"))
            ).cast("bigint").alias("latency_us")
        )
    )
    wr = W.orderBy("latency_us", "user_id")
    wn = W.partitionBy()
    ranked = conv.select(
        "latency_us",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converters"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("latency_us"))
        ).cast("bigint").alias("p25_us"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("latency_us"))
        ).cast("bigint").alias("median_us"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("latency_us")
            )
        ).cast("bigint").alias("p75_us"),
    )


# ---------------------------------------------------------------------------
# Position-based multi-touch attribution (exact integer credits).
# ---------------------------------------------------------------------------
@query(
    "position_attribution",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS conv_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.conv_id, e.event_type, e.ts, e.event_id,
             row_number() OVER (PARTITION BY p.conv_id
                                ORDER BY e.ts, e.event_id) AS pos,
             COUNT(*) OVER (PARTITION BY p.conv_id) AS n_touch
      FROM purchases p
      JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('view', 'click')
       AND e.ts < p.conv_ts
       AND e.ts >= p.conv_ts - INTERVAL 7 DAY
    ),
    credited AS (
      SELECT event_type,
             CASE
               WHEN n_touch = 1 THEN CAST(1000000 AS BIGINT)
               WHEN n_touch = 2 THEN CAST(500000 AS BIGINT)
               WHEN pos = 1 THEN CAST(400000 AS BIGINT)
               WHEN pos = n_touch THEN CAST(400000 AS BIGINT)
               ELSE CAST(200000 // (n_touch - 2) AS BIGINT)
                    + CASE WHEN pos = 2
                           THEN CAST(200000 % (n_touch - 2) AS BIGINT)
                           ELSE 0 END
             END AS credit_ppm
      FROM touches
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm
    FROM credited GROUP BY event_type
    """,
)
def position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) multi-touch attribution:
    each purchase distributes credit over the user's view/click
    touches in the prior 7 days — 40% to the first touch, 40% to the
    last, 20% split across the middles — rolled up per touch type.
    The marketing-mix sibling of ``range_join_attribution`` (which is
    last-touch).

    The exactness trick is INTEGER credit: each conversion carries
    exactly 1,000,000 ppm; middles get ``200000 DIV (m)`` each with
    the division remainder assigned to the EARLIEST middle (largest-
    remainder discipline, same as ``token_budget_apportionment``) — so
    per-conversion credit sums to exactly 1e6 and the rollup is exact
    bigint addition, never an order-sensitive float sum. Degenerate
    paths keep conservation: one touch carries the full million, two
    touches split 50/50 (no middles exist for the 20% — the standard
    U-shape convention). ``tests/test_new_ops_invariants.py`` pins
    conservation against an independent DuckDB conversion count.

    Scale posture: the touch join is an equi-join on user_id with a
    time-band predicate (band pushes into the join filter; at real
    cardinalities it buckets by day like ``range_join_attribution``);
    windows partition by conversion — naturally bounded partitions.
    """
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch_ev = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    touches = purchases.join(touch_ev, "user_id").filter(
        (F.col("ts") < F.col("conv_ts"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAY"))
    )
    wp = W.partitionBy("conv_id").orderBy("ts", "event_id")
    wn = W.partitionBy("conv_id")
    positioned = touches.select(
        "event_type",
        F.row_number().over(wp).alias("pos"),
        F.count("*").over(wn).alias("n_touch"),
    )
    mid = F.col("n_touch") - 2
    credit = (
        F.when(F.col("n_touch") == 1, F.lit(1000000).cast("bigint"))
        .when(F.col("n_touch") == 2, F.lit(500000).cast("bigint"))
        .when(F.col("pos") == 1, F.lit(400000).cast("bigint"))
        .when(F.col("pos") == F.col("n_touch"), F.lit(400000).cast("bigint"))
        .otherwise(
            F.expr("200000 div (n_touch - 2)").cast("bigint")
            + F.when(
                F.col("pos") == 2,
                (F.lit(200000) % mid).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        )
    )
    return (
        positioned.select("event_type", credit.alias("credit_ppm"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_touches"),
            F.sum("credit_ppm").cast("bigint").alias("credit_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Forecast-baseline evaluation (MASE-style, exact integer error sums).
# ---------------------------------------------------------------------------
@query(
    "forecast_baseline_mase",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    joined AS (
      SELECT c.event_type,
             abs(c.x - n1.x) AS e1,
             abs(c.x - n7.x) AS e7
      FROM daily c
      JOIN daily n1 ON n1.event_type = c.event_type
                   AND n1.day = c.day - INTERVAL 1 DAY
      JOIN daily n7 ON n7.event_type = c.event_type
                   AND n7.day = c.day - INTERVAL 7 DAY
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(e1) AS BIGINT) AS naive1_abs_err,
           CAST(SUM(e7) AS BIGINT) AS naive7_abs_err,
           CAST(SUM(e7) AS DOUBLE) / CAST(SUM(e1) AS DOUBLE)
             AS mase_seasonal_vs_naive,
           SUM(e7) < SUM(e1) AS seasonal_wins
    FROM joined
    GROUP BY event_type
    HAVING SUM(e1) > 0
    """,
)
def forecast_baseline_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE-style forecast-baseline evaluation (Hyndman & Koehler
    2006, public): for each series, the total absolute error of the
    SEASONAL-naive forecast (x̂_t = x_{t−7}) against the plain naive
    (x̂_t = x_{t−1}), over exactly the days where both baselines have
    an observation. A ratio < 1 says weekly seasonality carries real
    signal — the go/no-go gate before fitting anything fancier, and
    the denominator convention MASE uses for scale-free comparison.

    Exactness: both error totals are sums of absolute integer
    differences (exact bigints); the ratio is one IEEE division, and
    the winner flag compares the INTEGERS, not the float. Alignment is
    two equi-joins on precomputed lag days — same missing-day stance
    as ``autocorr_daily_lags`` (a gap contributes no row, never an
    imputed zero).

    Scale posture: one shuffle to daily counts, two self-equi-joins on
    the series key at day grain, one rollup — sufficient statistics.
    """
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    c = daily.alias("c")
    n1 = daily.select(
        "event_type",
        F.date_add("day", 1).alias("day"),
        F.col("x").alias("x1"),
    ).alias("n1")
    n7 = daily.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("x").alias("x7"),
    ).alias("n7")
    joined = (
        c.join(n1, ["event_type", "day"])
        .join(n7, ["event_type", "day"])
        .select(
            "event_type",
            F.abs(F.col("x") - F.col("x1")).alias("e1"),
            F.abs(F.col("x") - F.col("x7")).alias("e7"),
        )
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("e1").cast("bigint").alias("naive1_abs_err"),
            F.sum("e7").cast("bigint").alias("naive7_abs_err"),
        )
        .filter(F.col("naive1_abs_err") > 0)
        .select(
            "event_type",
            "n_days",
            "naive1_abs_err",
            "naive7_abs_err",
            (
                F.col("naive7_abs_err").cast("double")
                / F.col("naive1_abs_err").cast("double")
            ).alias("mase_seasonal_vs_naive"),
            (F.col("naive7_abs_err") < F.col("naive1_abs_err")).alias(
                "seasonal_wins"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Rolling 7-day active users (DAU / WAU / stickiness).
# ---------------------------------------------------------------------------
@query(
    "wau_rolling",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM active),
    wau AS (
      SELECT d.day,
             CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
      FROM days d
      JOIN active a
        ON a.day <= d.day AND a.day >= d.day - INTERVAL 6 DAY
      GROUP BY d.day
    ),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM active GROUP BY day
    )
    SELECT d.day, d.dau, w.wau,
           CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
)
def wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, rolling 7-day WAU, and the DAU/WAU stickiness ratio per
    day — the product-health triple every growth dashboard leads with
    (sliding-window COUNT DISTINCT is NOT a window function: distinct
    users across 7 days ≠ sum of daily distincts, so the window trick
    that works for sums cannot work here).

    The exact construction: dedupe to (user, day) once (day-grain,
    orders of magnitude smaller than events), then a banded self-join
    day×active within the 7-day window and a COUNT DISTINCT per
    anchor day. The 7× fan-out happens at DAY grain — the blowup the
    naive event-grain version would pay is exactly what the early
    dedup avoids. At larger windows/cardinalities the production
    variant switches to HLL sketch unions (``hll_sketch_rollup``);
    this query is the exact twin that calibrates that sketch.

    Exactness: counts are exact; stickiness is one IEEE division.
    """
    ev = t(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    days = active.select("day").distinct()
    a = active.select(F.col("user_id"), F.col("day").alias("aday"))
    wau = (
        days.join(
            a,
            (F.col("aday") <= F.col("day"))
            & (F.col("aday") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    dau = active.groupBy("day").agg(
        F.count("*").cast("bigint").alias("dau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation between two event series.
# ---------------------------------------------------------------------------
@query(
    "crosscorr_click_purchase",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ),
    clicks AS (SELECT day, x FROM daily WHERE event_type = 'click'),
    buys AS (SELECT day, x AS y FROM daily WHERE event_type = 'purchase'),
    lags AS (SELECT CAST(unnest([-3,-2,-1,0,1,2,3]) AS BIGINT) AS lag),
    pairs AS (
      SELECT l.lag, c.x, b.y
      FROM clicks c CROSS JOIN lags l
      JOIN buys b ON b.day = c.day + CAST(l.lag AS INT) * INTERVAL 1 DAY
    ),
    sums AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT lag, n AS n_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS xcorr
    FROM sums
    WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def crosscorr_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between daily click volume and daily purchase
    volume at lags −3..+3: the lead-lag probe — if the peak sits at a
    POSITIVE lag, clicks lead purchases by that many days (the
    campaign-to-conversion delay); at zero, they co-move; the
    asymmetry of the profile is the causality-direction hint
    ``autocorr_daily_lags`` cannot give (it correlates a series with
    itself).

    Exactness: identical discipline to the ACF — five exact bigint
    sufficient statistics per lag over exactly the aligned day pairs,
    one double quotient with IEEE sqrt, degenerate lags filtered on
    exact integer variances.

    Scale posture: the two series are day-grain projections of one
    daily rollup; 7 lags broadcast; alignment is an equi-join on the
    precomputed target day.
    """
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    clicks = daily.filter(F.col("event_type") == "click").select("day", "x")
    buys = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("tday"), F.col("x").alias("y")
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("bigint").alias("lag"))
    aug = clicks.crossJoin(F.broadcast(lags)).select(
        "x",
        "lag",
        F.date_add("day", F.col("lag").cast("int")).alias("tday"),
    )
    pairs = aug.join(buys, "tday")
    sums = pairs.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.filter((F.col("n") >= 2) & (vx > 0) & (vy > 0)).select(
        "lag",
        F.col("n").alias("n_pairs"),
        (num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double")))
        .alias("xcorr"),
    )


# ---------------------------------------------------------------------------
# Top event-type trigram paths (2nd-order sequence context).
# ---------------------------------------------------------------------------
@query(
    "event_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events
    ),
    tri AS (
      SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY e1, e2, e3
    )
    SELECT e1, e2, e3, n,
           CAST(row_number() OVER (ORDER BY n DESC, e1, e2, e3) AS INT)
             AS rank,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS share
    FROM tri
    QUALIFY rank <= 15
    """,
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 length-3 event-type paths across user journeys — the
    2nd-order sequence context the transition MATRIX flattens away
    (``view→click→purchase`` vs ``view→click→error`` have the same
    pairwise edges but opposite meanings; path mining is how funnels
    are DISCOVERED rather than declared).

    Ordering is the same total per-user (ts, event_id) order as
    ``event_transition_matrix``; two LEADs build the trigram in one
    window pass (no self-joins). Counts exact; share is one IEEE
    division against the window total; ranking on (count desc, path)
    is a total order.

    Scale posture: one window pass on the user key, one trigram
    groupBy — output bounded by |types|³.
    """
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    tri = seq.groupBy("e1", "e2", "e3").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wall = W.partitionBy()
    wr = W.orderBy(F.col("n").desc(), "e1", "e2", "e3")
    return (
        tri.select(
            "e1",
            "e2",
            "e3",
            "n",
            F.row_number().over(wr).cast("int").alias("rank"),
            (F.col("n").cast("double") / F.sum("n").over(wall).cast("double"))
            .alias("share"),
        )
        .filter(F.col("rank") <= 15)
    )


# ---------------------------------------------------------------------------
# New vs returning users per day.
# ---------------------------------------------------------------------------
@query(
    "new_vs_returning_daily",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS day, f.first_day
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT day,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS new_share
    FROM active GROUP BY day
    """,
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into NEW (first-ever activity today)
    vs RETURNING — the growth-accounting companion to ``wau_rolling``
    (DAU growth driven by acquisition reads completely differently
    from DAU growth driven by resurrection, and this split is how you
    tell).

    One user-grain first-day aggregate (broadcastable), one distinct
    (user, day) pass, one day-grain rollup; new/returning are exact
    integer classifications against the first day, the share one IEEE
    division.
    """
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    active = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .join(F.broadcast(firsts), "user_id")
    )
    return active.groupBy("day").agg(
        F.sum(
            F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
        ).cast("bigint").alias("new_users"),
        F.sum(
            F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
        ).cast("bigint").alias("returning_users"),
        (
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).cast("double")
            / F.count("*").cast("double")
        ).alias("new_share"),
    )


# ---------------------------------------------------------------------------
# SCD2 dwell-time analytics (time-in-state from the version history).
# ---------------------------------------------------------------------------
@query(
    "state_dwell_times",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts, event_type FROM events
    ),
    changed AS (
      SELECT * FROM (
        SELECT user_id, event_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM ev
      ) WHERE prev IS NULL OR prev <> event_type
    ),
    hist AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM changed
    )
    SELECT state,
           CAST(COUNT(*) AS BIGINT) AS n_closed_versions,
           CAST(SUM(epoch_us(valid_to) - epoch_us(valid_from)) AS BIGINT)
             AS total_dwell_us,
           CAST(SUM(epoch_us(valid_to) - epoch_us(valid_from)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_dwell_us
    FROM hist WHERE valid_to IS NOT NULL
    GROUP BY state
    """,
)
def state_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state analytics over the SCD2 version history: for each
    state, how many CLOSED versions exist and how long users dwell in
    it before transitioning — the question an SCD2 dimension exists to
    answer (the history build is ``scd2_user_state_history``; this is
    its canonical consumer, and the reason ``valid_from``/``valid_to``
    are stored as half-open intervals: dwell = exact microsecond
    difference, no off-by-one).

    Open (current) versions are excluded — their dwell is censored,
    not observed; averaging them in would bias every state short (the
    same censoring discipline as ``user_churn_hazard``).

    Exactness: dwell totals are exact bigint microsecond sums; the
    mean is one IEEE division. One window pass per user partition,
    one state-grain rollup.
    """
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changed = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    hist = changed.select(
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).filter(F.col("valid_to").isNotNull())
    dwell = F.unix_micros("valid_to") - F.unix_micros("valid_from")
    return hist.groupBy("state").agg(
        F.count("*").cast("bigint").alias("n_closed_versions"),
        F.sum(dwell).cast("bigint").alias("total_dwell_us"),
        (F.sum(dwell).cast("double") / F.count("*").cast("double")).alias(
            "mean_dwell_us"
        ),
    )


# ---------------------------------------------------------------------------
# Peak concurrency via the +1/-1 boundary sweep (no pair join).
# ---------------------------------------------------------------------------
@query(
    "peak_concurrency_sweep",
    oracle="""
    WITH iv AS (
      SELECT l_returnflag AS flag,
             CAST(l_shipdate AS DATE) AS s,
             CAST(CAST(l_shipdate AS DATE)
               + to_days(CAST(floor(l_quantity) AS INT)) AS DATE) AS e
      FROM lineitem
    ),
    daily AS (
      SELECT flag, d,
             CAST(SUM(starts) AS BIGINT) AS starts,
             CAST(SUM(ends) AS BIGINT) AS ends
      FROM (
        SELECT flag, s AS d, 1 AS starts, 0 AS ends FROM iv
        UNION ALL
        SELECT flag, CAST(e + to_days(1) AS DATE), 0, 1 FROM iv
      ) GROUP BY flag, d
    ),
    swept AS (
      SELECT flag, d,
             COALESCE(SUM(starts - ends) OVER (
               PARTITION BY flag ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + starts AS active
      FROM daily
    )
    SELECT flag,
           CAST(MAX(active) AS BIGINT) AS peak_concurrent,
           CAST(MIN(CASE WHEN active = ma THEN d END) AS DATE) AS peak_date,
           CAST(SUM(starts_total) AS BIGINT) AS n_intervals
    FROM (
      SELECT s.flag, s.d, s.active,
             MAX(s.active) OVER (PARTITION BY s.flag) AS ma,
             dl.starts AS starts_total
      FROM swept s JOIN daily dl ON s.flag = dl.flag AND s.d = dl.d
    ) GROUP BY flag
    """,
)
def peak_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of CONCURRENTLY in-transit shipments per return
    flag, via the boundary sweep: +1 at each interval start, -1 the day
    after its (closed) end, running-sum the per-day nets, take the max.
    The scalable sibling of ``overlapping_shipments`` — that one pays a
    pairwise interval join (answers *which* overlap); this one answers
    *how many at once* with ONE shuffle to the day grain and a window
    over per-day aggregates. At 100 TB the sweep is the only viable
    shape: resource-contention peaks (GPU reservations, port slots,
    concurrent sessions) over billions of intervals reduce to
    |distinct days| window rows per group.

    Exactness: the peak at day d = (running net before d) + (starts on
    d) — computed from per-day AGGREGATES, so no row-level tie order
    exists to diverge between engines; all counts are exact bigints and
    the peak date is the MIN day achieving the max (total tiebreak).
    """
    li = t(spark, sf_dir, "lineitem")
    iv = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_shipdate").cast("date").alias("s"),
        F.date_add(
            F.col("l_shipdate").cast("date"),
            F.floor("l_quantity").cast("int"),
        ).alias("e"),
    )
    deltas = iv.select(
        "flag", F.col("s").alias("d"), F.lit(1).alias("starts"), F.lit(0).alias("ends")
    ).unionByName(
        iv.select(
            "flag",
            F.date_add("e", 1).alias("d"),
            F.lit(0).alias("starts"),
            F.lit(1).alias("ends"),
        )
    )
    daily = deltas.groupBy("flag", "d").agg(
        F.sum("starts").cast("bigint").alias("starts"),
        F.sum("ends").cast("bigint").alias("ends"),
    )
    w_prev = (
        W.partitionBy("flag")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    swept = daily.select(
        "flag",
        "d",
        "starts",
        (
            F.coalesce(F.sum(F.col("starts") - F.col("ends")).over(w_prev), F.lit(0))
            + F.col("starts")
        ).alias("active"),
    )
    ma = swept.withColumn("ma", F.max("active").over(W.partitionBy("flag")))
    return ma.groupBy("flag").agg(
        F.max("active").cast("bigint").alias("peak_concurrent"),
        F.min(F.when(F.col("active") == F.col("ma"), F.col("d"))).alias(
            "peak_date"
        ),
        F.sum("starts").cast("bigint").alias("n_intervals"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average value (TWAP) — duration-weighted, exact.
# ---------------------------------------------------------------------------
@query(
    "time_weighted_avg_value",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    iv AS (
      SELECT user_id, cents,
             epoch_us(nxt) - epoch_us(ts) AS dur_us
      FROM o WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           CAST(SUM(CAST(cents AS HUGEINT) * dur_us) AS DOUBLE)
             / CAST(SUM(dur_us) AS DOUBLE) AS twap_cents
    FROM iv GROUP BY user_id
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-WEIGHTED average of the event value: each
    observation holds until the user's next event, so its weight is
    that interval's duration (last-observation-carried-forward pricing
    — TWAP for balances, exposure-weighted risk, session-weighted
    scores). A plain AVG over-weights bursts; the time-weighted form
    is what billing and mark-to-market actually need.

    Exactness: values fix-point to cents (``floor(x·100+0.5)``, rule
    1), durations are exact epoch micros from a totally-ordered window
    (ts, event_id), and the weighted numerator Σ cents·μs accumulates
    in 128-bit integers (DECIMAL(38,0) / HUGEINT — a month of micros
    times cents overflows bigint, rule 28). ONE double division at the
    surface.

    Plan: one window shuffle on user_id, then a partial-aggregating
    groupBy on the same key — AQE coalesces the second exchange away;
    no explode, no self-join.
    """
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
        F.lead("ts").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    iv = o.select(
        "user_id",
        "cents",
        (F.unix_micros("nxt") - F.unix_micros("ts")).alias("dur_us"),
    )
    num = F.col("cents").cast("decimal(38,0)") * F.col("dur_us")
    return iv.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum("dur_us").cast("bigint").alias("total_us"),
        (F.sum(num).cast("double") / F.sum("dur_us").cast("double")).alias(
            "twap_cents"
        ),
    )
