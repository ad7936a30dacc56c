"""Warehouse transforms: 4 dims + calendar + 4 facts (SURVEY.md §1.4, §2).

The reference runs 8 LFS-hidden SQL scripts in fixed order
(``dags/flights_data_pipeline.py:229-251``): ``dim_aircrafts``,
``dim_airport``, ``dim_passenger``, ``dim_seat``, then
``fct_boarding_pass``, ``fct_booking_ticket``, ``fct_flight_activity``,
``fct_seat_occupied_daily``. The SQL text is unavailable (LFS gap), so
these transforms implement the *declared contract* of SURVEY.md §2
(P3-P5 projections/dedup, J1-J5 joins, A1-A4 aggregates, F2/F5/F6
scalar functions) — each with a DuckDB oracle twin in ``ORACLES`` that
the tests hash-match (SURVEY.md §5.2).

Determinism: surrogate keys are ``md5`` of the business key
(SURVEY.md §7.4.4), never ``uuid()``; money stays DECIMAL(18,2); delay
minutes are *integer* floor divisions (cross-engine exact).

Scale: dims are tiny → broadcast into facts; facts join on their
natural keys (Catalyst/AQE pick broadcast-hash automatically); the
daily fact groups by (date, flight) — partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.scalars import surrogate_key as _sk
from .etl import read_staging

#: transform order — dims before facts (reference ``:229-251`` [observed]).
TRANSFORM_ORDER = [
    "dim_aircrafts",
    "dim_airport",
    "dim_passenger",
    "dim_seat",
    "dim_date",
    "dim_time",
    "fct_boarding_pass",
    "fct_booking_ticket",
    "fct_flight_activity",
    "fct_seat_occupied_daily",
]


def _restrict_flights(f: DataFrame, date_filter: DataFrame | None) -> DataFrame:
    """Restrict ``flights`` to the ``flight_date_key`` dates in
    ``date_filter`` (one DATE column). Every fact derives its
    ``flight_date_key`` from ``flights.scheduled_departure`` through an
    inner join on ``flight_id``, so pre-filtering flights here yields
    EXACTLY the full transform restricted to those partitions — the
    partition-refresh fast path (``pipeline/incremental.py``) reuses
    each fact's single definition. Precisely: the broadcast semi-join
    prunes the JOIN INPUT (flights is still scanned once — one narrow
    table — but only blast-radius rows reach the expensive fact joins
    and aggregations, which is where the history recompute lived); a
    flight-date-partitioned staging layout would additionally prune
    the scan via dynamic partition pruning."""
    if date_filter is None:
        return f
    # null-safe: a NULL scheduled_departure lands in the fact's NULL
    # date partition, which must be refreshable like any other —
    # an equi-join would silently drop those flights from the
    # restricted path and break refresh == rebuild (round-8 ADVICE)
    return f.join(
        F.broadcast(date_filter),
        F.to_date(f["scheduled_departure"]).eqNullSafe(
            date_filter["flight_date_key"]
        ),
        "left_semi",
    )


# ---------------------------------------------------------------------------
# Dimensions (P3 projection + F2 JSON flattening; P5 dedup for passenger).
# ---------------------------------------------------------------------------
def dim_aircrafts(spark: SparkSession, stg: str) -> DataFrame:
    a = read_staging(spark, stg, "aircrafts_data")
    return a.select(
        _sk("aircraft_code").alias("aircraft_sk"),
        "aircraft_code",
        F.get_json_object("model", "$.en").alias("model_en"),
        F.get_json_object("model", "$.ru").alias("model_ru"),
        F.col("range").alias("range_km"),
    )


def dim_airport(spark: SparkSession, stg: str) -> DataFrame:
    a = read_staging(spark, stg, "airports_data")
    return a.select(
        _sk("airport_code").alias("airport_sk"),
        "airport_code",
        F.get_json_object("airport_name", "$.en").alias("airport_name_en"),
        F.get_json_object("city", "$.en").alias("city_en"),
        F.col("coordinates.lon").alias("lon"),
        F.col("coordinates.lat").alias("lat"),
        "timezone",
    )


def dim_passenger(spark: SparkSession, stg: str) -> DataFrame:
    """Latest record per passenger_id from tickets (no passenger source
    table exists — SURVEY.md §2.2 P5 [inferred, forced by the schema])."""
    t = read_staging(spark, stg, "tickets")
    w = W.partitionBy("passenger_id").orderBy(
        F.col("updated_at").desc(), F.col("ticket_no").desc()
    )
    return (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            _sk("passenger_id").alias("passenger_sk"),
            "passenger_id",
            "passenger_name",
            F.get_json_object("contact_data", "$.phone").alias("phone"),
            F.get_json_object("contact_data", "$.email").alias("email"),
        )
    )


def dim_seat(spark: SparkSession, stg: str) -> DataFrame:
    s = read_staging(spark, stg, "seats")
    return s.select(
        _sk("aircraft_code", "seat_no").alias("seat_sk"),
        "aircraft_code",
        "seat_no",
        "fare_conditions",
    )


def dim_date(spark: SparkSession, stg: str) -> DataFrame:
    """Calendar dim (SURVEY.md §2.9): generate-series over the data span."""
    return spark.sql(
        """
        SELECT date_key,
               CAST(year(date_key) AS INT) AS year,
               CAST(quarter(date_key) AS INT) AS quarter,
               CAST(month(date_key) AS INT) AS month,
               CAST(day(date_key) AS INT) AS day_of_month,
               CAST(weekday(date_key) + 1 AS INT) AS iso_dow,
               weekday(date_key) + 1 >= 6 AS is_weekend
        FROM (SELECT explode(sequence(to_date('2025-01-01'),
                                      to_date('2026-12-31'),
                                      interval 1 day)) AS date_key)
        """
    )


#: Spark-side body of the time-of-day dim — shared by the pipeline
#: transform and the ``calendar_time_dim`` registry query so the two
#: surfaces cannot drift.
DIM_TIME_SQL = """
    SELECT CAST(m AS INT) AS time_key,
           CAST(m DIV 60 AS INT) AS hour,
           CAST(m % 60 AS INT) AS minute,
           lpad(CAST(m DIV 60 AS STRING), 2, '0') || ':' ||
             lpad(CAST(m % 60 AS STRING), 2, '0') AS hhmm,
           CASE WHEN m DIV 60 < 12 THEN 'AM' ELSE 'PM' END AS am_pm,
           CAST(CASE WHEN (m DIV 60) % 12 = 0 THEN 12
                     ELSE (m DIV 60) % 12 END AS INT) AS hour_12,
           CASE WHEN m DIV 60 BETWEEN 5 AND 11 THEN 'morning'
                WHEN m DIV 60 BETWEEN 12 AND 16 THEN 'afternoon'
                WHEN m DIV 60 BETWEEN 17 AND 21 THEN 'evening'
                ELSE 'night' END AS day_part,
           m DIV 60 BETWEEN 9 AND 16 AS is_business_hour
    FROM (SELECT explode(sequence(0, 1439)) AS m)
"""

#: DuckDB twin of :data:`DIM_TIME_SQL` — shared by the transform
#: oracle (``ORACLES['dim_time']``) and the ``calendar_time_dim``
#: registry oracle so the two ORACLE copies cannot drift either
#: (round-10 ADVICE: the Spark body was already shared; the DuckDB
#: body was duplicated verbatim in two places).
DIM_TIME_ORACLE_SQL = """
    SELECT CAST(m AS INT) AS time_key,
           CAST(m // 60 AS INT) AS hour,
           CAST(m % 60 AS INT) AS minute,
           lpad(CAST(m // 60 AS VARCHAR), 2, '0') || ':' ||
             lpad(CAST(m % 60 AS VARCHAR), 2, '0') AS hhmm,
           CASE WHEN m // 60 < 12 THEN 'AM' ELSE 'PM' END AS am_pm,
           CAST(CASE WHEN (m // 60) % 12 = 0 THEN 12
                     ELSE (m // 60) % 12 END AS INT) AS hour_12,
           CASE WHEN m // 60 BETWEEN 5 AND 11 THEN 'morning'
                WHEN m // 60 BETWEEN 12 AND 16 THEN 'afternoon'
                WHEN m // 60 BETWEEN 17 AND 21 THEN 'evening'
                ELSE 'night' END AS day_part,
           m // 60 BETWEEN 9 AND 16 AS is_business_hour
    FROM (SELECT unnest(generate_series(0, 1439)) AS m)
"""


def dim_time(spark: SparkSession, stg: str) -> DataFrame:
    """Time-of-day calendar dim (SURVEY.md §1.4/§2.9 [inferred]: the
    17 KB ``warehouse_init.sql`` implies dim_date/dim_time calendar
    dims; reference ``include/warehouse_init.sql:3``, LFS pointer).

    Minute grain — exactly 1440 rows, time_key = minutes since
    midnight; ``fct_flight_activity.dep_time_key`` carries the FK
    (``hour(ts) * 60 + minute(ts)``) and
    ``queries/flights.flights_delay_by_day_part`` exercises the join
    end-to-end. Attributes cover the analysis
    axes a time dim exists for: 24h/12h clock, AM/PM, day-part
    buckets, business-hours flag."""
    return spark.sql(DIM_TIME_SQL)


# ---------------------------------------------------------------------------
# Facts (J1-J5 joins + F5/F6 datetime + A1-A4 aggregates).
# ---------------------------------------------------------------------------
def fct_booking_ticket(
    spark: SparkSession, stg: str, date_filter: DataFrame | None = None
) -> DataFrame:
    """Segment-grain fact: ticket_flights ⋈ tickets ⋈ bookings ⋈ flights
    (J1 FK→PK chain, 9.8 KB script in the reference)."""
    tf = read_staging(spark, stg, "ticket_flights")
    t = read_staging(spark, stg, "tickets")
    b = read_staging(spark, stg, "bookings")
    f = _restrict_flights(read_staging(spark, stg, "flights"), date_filter)
    return (
        tf.join(t.select("ticket_no", "book_ref", "passenger_id"), "ticket_no")
        .join(
            b.select("book_ref", "book_date", "total_amount"), "book_ref"
        )
        .join(
            f.select("flight_id", "flight_no", "scheduled_departure"),
            "flight_id",
        )
        .select(
            _sk("ticket_no", "flight_id").alias("booking_ticket_sk"),
            "book_ref",
            "ticket_no",
            "flight_id",
            _sk("passenger_id").alias("passenger_sk"),
            "flight_no",
            F.to_date("book_date").alias("book_date_key"),
            F.to_date("scheduled_departure").alias("flight_date_key"),
            "fare_conditions",
            F.col("amount").cast("decimal(18,2)").alias("amount"),
            F.col("total_amount").cast("decimal(18,2)").alias("booking_total_amount"),
        )
    )


def fct_flight_activity(
    spark: SparkSession, stg: str, date_filter: DataFrame | None = None
) -> DataFrame:
    """Flight-grain fact with delay metrics (F5: actual - scheduled)."""
    f = _restrict_flights(read_staging(spark, stg, "flights"), date_filter)
    dep_delay = (
        F.unix_timestamp("actual_departure") - F.unix_timestamp("scheduled_departure")
    )
    arr_delay = (
        F.unix_timestamp("actual_arrival") - F.unix_timestamp("scheduled_arrival")
    )
    return f.select(
        _sk("flight_id").alias("flight_sk"),
        "flight_id",
        "flight_no",
        F.to_date("scheduled_departure").alias("flight_date_key"),
        # minutes-since-midnight FK into dim_time (minute grain):
        # the consumer the time dim exists for (round-10 ADVICE —
        # a dim no fact can join is free-standing)
        (F.hour("scheduled_departure") * 60 + F.minute("scheduled_departure"))
        .cast("int")
        .alias("dep_time_key"),
        "departure_airport",
        "arrival_airport",
        _sk("aircraft_code").alias("aircraft_sk"),
        "status",
        "scheduled_departure",
        "actual_departure",
        "scheduled_arrival",
        "actual_arrival",
        # integer floor-div minutes: exact in both engines (F5)
        (dep_delay - (dep_delay % 60)).cast("bigint").alias("dep_delay_sec_floor"),
        (arr_delay - (arr_delay % 60)).cast("bigint").alias("arr_delay_sec_floor"),
        (F.unix_timestamp("scheduled_arrival") - F.unix_timestamp("scheduled_departure"))
        .cast("bigint")
        .alias("scheduled_duration_sec"),
    )


def fct_boarding_pass(
    spark: SparkSession, stg: str, date_filter: DataFrame | None = None
) -> DataFrame:
    """Boarding-grain fact: 5-way join (J2/J3 composite keys)."""
    bp = read_staging(spark, stg, "boarding_passes")
    tf = read_staging(spark, stg, "ticket_flights")
    t = read_staging(spark, stg, "tickets")
    f = _restrict_flights(read_staging(spark, stg, "flights"), date_filter)
    s = read_staging(spark, stg, "seats")
    return (
        bp.join(
            tf.select("ticket_no", "flight_id", "fare_conditions", "amount"),
            ["ticket_no", "flight_id"],
        )
        .join(t.select("ticket_no", "passenger_id"), "ticket_no")
        .join(
            f.select("flight_id", "flight_no", "scheduled_departure", "aircraft_code"),
            "flight_id",
        )
        .join(
            s.select(
                "aircraft_code",
                "seat_no",
                F.col("fare_conditions").alias("seat_class"),
            ),
            ["aircraft_code", "seat_no"],
        )
        .select(
            _sk("ticket_no", "flight_id").alias("boarding_pass_sk"),
            "ticket_no",
            "flight_id",
            "boarding_no",
            "seat_no",
            _sk("passenger_id").alias("passenger_sk"),
            "flight_no",
            F.to_date("scheduled_departure").alias("flight_date_key"),
            F.col("fare_conditions").alias("paid_fare"),
            "seat_class",
            F.col("amount").cast("decimal(18,2)").alias("amount"),
        )
    )


def fct_seat_occupied_daily(
    spark: SparkSession, stg: str, date_filter: DataFrame | None = None
) -> DataFrame:
    """Daily occupancy (J4 left join + A1-A3): every flight counts, even
    with zero boarding passes; rate = occupied / cabin capacity."""
    f = _restrict_flights(read_staging(spark, stg, "flights"), date_filter)
    bp = read_staging(spark, stg, "boarding_passes")
    s = read_staging(spark, stg, "seats")
    capacity = s.groupBy("aircraft_code").agg(
        F.count("*").cast("bigint").alias("total_seats")
    )
    occupied = (
        f.select("flight_id", F.to_date("scheduled_departure").alias("flight_date_key"), "aircraft_code")
        .join(bp.select("flight_id", "boarding_no"), "flight_id", "left")
        .groupBy("flight_date_key", "flight_id", "aircraft_code")
        .agg(F.count("boarding_no").cast("bigint").alias("occupied_seats"))
    )
    return occupied.join(F.broadcast(capacity), "aircraft_code").select(
        _sk("flight_id").alias("flight_sk"),
        "flight_date_key",
        "flight_id",
        "aircraft_code",
        "occupied_seats",
        "total_seats",
        (F.col("occupied_seats") / F.col("total_seats")).alias("occupancy_rate"),
    )


#: natural (business) key per dimension — the MERGE key for
#: incremental SCD-1 loads (``merge_dim`` below).
DIM_KEYS = {
    "dim_aircrafts": ["aircraft_code"],
    "dim_airport": ["airport_code"],
    "dim_passenger": ["passenger_id"],
    "dim_seat": ["aircraft_code", "seat_no"],
    "dim_date": ["date_key"],
    "dim_time": ["time_key"],
}


def merge_dim(
    spark: SparkSession, warehouse_dir: str, name: str, dim_df: DataFrame
) -> int:
    """SCD-1 incremental dimension load: MERGE the freshly-derived dim
    rows into the warehouse table on the natural key instead of
    rebuilding it (SURVEY.md §4.4's inferred ``ON CONFLICT DO UPDATE``
    dim semantics — the path a user needs the first time a dim is too
    big to rebuild). Changed attributes overwrite in place (type-1),
    surrogate keys are md5 of the natural key so they are stable
    across merges by construction. Returns the post-merge row count.
    """
    from ..operators.merge import merge_parquet

    return merge_parquet(
        spark, f"{warehouse_dir}/{name}", dim_df, DIM_KEYS[name]
    )


TRANSFORMS = {
    "dim_aircrafts": dim_aircrafts,
    "dim_airport": dim_airport,
    "dim_passenger": dim_passenger,
    "dim_seat": dim_seat,
    "dim_date": dim_date,
    "dim_time": dim_time,
    "fct_booking_ticket": fct_booking_ticket,
    "fct_flight_activity": fct_flight_activity,
    "fct_boarding_pass": fct_boarding_pass,
    "fct_seat_occupied_daily": fct_seat_occupied_daily,
}

#: DuckDB oracle twins (tests register staging parquet as views named
#: after the staging tables). Surrogate keys use the same md5 recipe;
#: the U+241F separator is written with chr(9247).
_SK = "md5({})"


def _dsk(*cols: str) -> str:
    joined = " || chr(9247) || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return f"md5({joined})"


ORACLES: dict[str, str] = {
    "dim_aircrafts": f"""
        SELECT {_dsk('aircraft_code')} AS aircraft_sk, aircraft_code,
               json_extract_string(model, '$.en') AS model_en,
               json_extract_string(model, '$.ru') AS model_ru,
               "range" AS range_km
        FROM aircrafts_data
    """,
    "dim_airport": f"""
        SELECT {_dsk('airport_code')} AS airport_sk, airport_code,
               json_extract_string(airport_name, '$.en') AS airport_name_en,
               json_extract_string(city, '$.en') AS city_en,
               coordinates.lon AS lon, coordinates.lat AS lat, timezone
        FROM airports_data
    """,
    "dim_passenger": f"""
        SELECT {_dsk('passenger_id')} AS passenger_sk, passenger_id,
               passenger_name,
               json_extract_string(contact_data, '$.phone') AS phone,
               json_extract_string(contact_data, '$.email') AS email
        FROM (
          SELECT *, row_number() OVER (PARTITION BY passenger_id
                                       ORDER BY updated_at DESC,
                                                ticket_no DESC) AS rn
          FROM tickets
        ) WHERE rn = 1
    """,
    "dim_seat": f"""
        SELECT {_dsk('aircraft_code', 'seat_no')} AS seat_sk,
               aircraft_code, seat_no, fare_conditions
        FROM seats
    """,
    "dim_date": """
        SELECT CAST(d AS DATE) AS date_key,
               CAST(year(d) AS INT) AS year,
               CAST(quarter(d) AS INT) AS quarter,
               CAST(month(d) AS INT) AS month,
               CAST(day(d) AS INT) AS day_of_month,
               CAST(isodow(d) AS INT) AS iso_dow,
               isodow(d) >= 6 AS is_weekend
        FROM (SELECT unnest(generate_series(DATE '2025-01-01',
                                            DATE '2026-12-31',
                                            INTERVAL 1 DAY)) AS d)
    """,
    "dim_time": DIM_TIME_ORACLE_SQL,
    "fct_booking_ticket": f"""
        SELECT {_dsk('tf.ticket_no', 'tf.flight_id')} AS booking_ticket_sk,
               t.book_ref, tf.ticket_no, tf.flight_id,
               {_dsk('t.passenger_id')} AS passenger_sk,
               f.flight_no,
               CAST(b.book_date AS DATE) AS book_date_key,
               CAST(f.scheduled_departure AS DATE) AS flight_date_key,
               tf.fare_conditions,
               CAST(tf.amount AS DECIMAL(18,2)) AS amount,
               CAST(b.total_amount AS DECIMAL(18,2)) AS booking_total_amount
        FROM ticket_flights tf
        JOIN tickets t ON tf.ticket_no = t.ticket_no
        JOIN bookings b ON t.book_ref = b.book_ref
        JOIN flights f ON tf.flight_id = f.flight_id
    """,
    "fct_flight_activity": f"""
        SELECT {_dsk('flight_id')} AS flight_sk, flight_id, flight_no,
               CAST(scheduled_departure AS DATE) AS flight_date_key,
               CAST(hour(scheduled_departure) * 60
                    + minute(scheduled_departure) AS INT) AS dep_time_key,
               departure_airport, arrival_airport,
               {_dsk('aircraft_code')} AS aircraft_sk, status,
               scheduled_departure, actual_departure,
               scheduled_arrival, actual_arrival,
               CAST(dd - (dd % 60) AS BIGINT) AS dep_delay_sec_floor,
               CAST(ad - (ad % 60) AS BIGINT) AS arr_delay_sec_floor,
               CAST(sd AS BIGINT) AS scheduled_duration_sec
        FROM (
          SELECT *,
                 epoch(actual_departure) - epoch(scheduled_departure) AS dd,
                 epoch(actual_arrival) - epoch(scheduled_arrival) AS ad,
                 epoch(scheduled_arrival) - epoch(scheduled_departure) AS sd
          FROM flights
        )
    """,
    "fct_boarding_pass": f"""
        SELECT {_dsk('bp.ticket_no', 'bp.flight_id')} AS boarding_pass_sk,
               bp.ticket_no, bp.flight_id, bp.boarding_no, bp.seat_no,
               {_dsk('t.passenger_id')} AS passenger_sk,
               f.flight_no,
               CAST(f.scheduled_departure AS DATE) AS flight_date_key,
               tf.fare_conditions AS paid_fare,
               s.fare_conditions AS seat_class,
               CAST(tf.amount AS DECIMAL(18,2)) AS amount
        FROM boarding_passes bp
        JOIN ticket_flights tf ON bp.ticket_no = tf.ticket_no
                              AND bp.flight_id = tf.flight_id
        JOIN tickets t ON bp.ticket_no = t.ticket_no
        JOIN flights f ON bp.flight_id = f.flight_id
        JOIN seats s ON f.aircraft_code = s.aircraft_code
                    AND bp.seat_no = s.seat_no
    """,
    "fct_seat_occupied_daily": f"""
        WITH capacity AS (
          SELECT aircraft_code, CAST(COUNT(*) AS BIGINT) AS total_seats
          FROM seats GROUP BY aircraft_code
        ),
        occupied AS (
          SELECT CAST(f.scheduled_departure AS DATE) AS flight_date_key,
                 f.flight_id, f.aircraft_code,
                 CAST(COUNT(bp.boarding_no) AS BIGINT) AS occupied_seats
          FROM flights f
          LEFT JOIN boarding_passes bp ON f.flight_id = bp.flight_id
          GROUP BY 1, 2, 3
        )
        SELECT {_dsk('o.flight_id')} AS flight_sk,
               o.flight_date_key, o.flight_id, o.aircraft_code,
               o.occupied_seats, c.total_seats,
               o.occupied_seats / c.total_seats AS occupancy_rate
        FROM occupied o JOIN capacity c ON o.aircraft_code = c.aircraft_code
    """,
}
