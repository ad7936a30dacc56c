"""Windowed event-time aggregations over the ``events`` table.

The reference's "streaming" is Airflow ``@daily`` incremental batch
(SURVEY.md §2.10 — reference ``dags/flights_data_pipeline.py:63-66,
102-109``); the declared extension surface is Structured Streaming over
``events(event_id, ts, user_id, event_type, value, props)``.

Spark's windowed aggregation kernels (``window``, ``session_window``)
are the *same* expressions in batch and streaming — a batch DataFrame
here and a ``readStream`` with ``withWatermark`` produce identical
results once the watermark closes every window. The driver's gate needs
a collectable batch DataFrame, so these queries run the kernels in
batch mode against their DuckDB oracles; ``tests/test_streaming.py``
runs the *same kernels* under a real ``readStream`` → memory-sink
micro-batch execution and asserts equality with the batch results
(plus ``dropDuplicatesWithinWatermark`` and late-data handling, which
have no batch twin).

Scale posture: event-time windows groupBy (window, key) — one shuffle,
partial+final aggregation; session windows additionally sort within
user partitions. State-store sizing at 100 TB comes from the watermark
horizon, not the data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import money as _dec
from ..io.catalog import load_table as t
from .registry import query


# ---------------------------------------------------------------------------
# Tumbling window aggregate.
# ---------------------------------------------------------------------------
@query(
    "tumbling_window_agg",
    oracle="""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
           time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE
             AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling event-time windows per event type."""
    ev = t(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes")
    return (
        ev.groupBy(w, "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(_dec("value"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding (hopping) window aggregate.
# ---------------------------------------------------------------------------
@query(
    "sliding_window_agg",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL 5 MINUTE, ts)
               - k.k * INTERVAL 5 MINUTE AS window_start,
             value
      FROM events CROSS JOIN (SELECT unnest(range(2)) AS k) k
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total_value
    FROM assigned
    GROUP BY 1, 2
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event in 2 windows).

    The oracle assigns each event to its ``size/slide = 2`` containing
    windows explicitly — the relational definition of a hopping window.
    """
    ev = t(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(w)
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(_dec("value"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Session window aggregate (gaps-and-islands).
# ---------------------------------------------------------------------------
@query(
    "session_window_agg",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Spark's ``session_window`` end is ``last event + gap``; the oracle
    reproduces that with the classic gaps-and-islands construction
    (lag → new-session flag → running sum → group). Sessions are
    end-EXCLUSIVE ``[start, last + gap)``: an event at exactly
    ``last_ts + gap`` starts a NEW session, so the oracle merges only
    on strict ``lag diff < gap`` — ``<=`` would diverge at exact-
    boundary gaps.
    """
    ev = t(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw, "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(_dec("value"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Late-event accounting against a fixed watermark horizon.
# ---------------------------------------------------------------------------
@query(
    "watermark_lateness",
    oracle="""
    WITH horizon AS (
      SELECT MAX(ts) - INTERVAL 1 HOUR AS wm FROM events
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN e.ts < h.wm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_before_watermark,
           CAST(SUM(CASE WHEN e.ts >= h.wm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_horizon
    FROM events e CROSS JOIN horizon h
    GROUP BY e.event_type
    """,
)
def watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify events against a 1-hour watermark behind max event time —
    the batch rendering of ``withWatermark("ts", "1 hour")`` admission."""
    ev = t(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("wm")
    )
    return (
        ev.crossJoin(F.broadcast(horizon))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("ts") < F.col("wm"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_before_watermark"),
            F.sum(F.when(F.col("ts") >= F.col("wm"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_within_horizon"),
        )
    )
