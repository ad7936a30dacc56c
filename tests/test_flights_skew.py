"""Skew handling on the flights shape: a hub airport dominating
``fct_flight_activity`` (the real-world skew every airline fact table
has) must engage the AQE skew-join split, and ``salted_join`` must
produce exactly the same result when the join is salted by hand.

This wires the existing skew plumbing (``tests/test_physical_layout.
test_aqe_splits_skewed_join_partition`` on synthetic keys;
``operators/joins.salted_join``) to the reference-parity pipeline: the
fact comes out of the REAL ``fct_flight_activity`` transform over a
planted staging table, not a synthetic two-column frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.operators.joins import salted_join
from flights_data_pipeline_spark.pipeline.transforms import fct_flight_activity

#: hub rows / cold rows per airport — sized so the hub's shuffle
#: partition crosses the scaled-down skew threshold.
N_HUB = 200_000
N_COLD_AIRPORTS = 100
N_COLD_EACH = 50


@pytest.fixture(scope="module")
def flights_fact(spark, tmp_path_factory):
    """fct_flight_activity over a planted hub-heavy flights staging."""
    stg = str(tmp_path_factory.mktemp("skew_stg"))
    n = N_HUB + N_COLD_AIRPORTS * N_COLD_EACH
    flights = spark.range(n).selectExpr(
        "md5(CAST(id AS STRING)) AS id",
        "CAST(id AS INT) AS flight_id",
        "concat('PG', lpad(CAST(id % 997 AS STRING), 4, '0')) AS flight_no",
        "timestampadd(SECOND, CAST(id % 86400 AS INT),"
        " TIMESTAMP '2025-06-10 00:00:00') AS scheduled_departure",
        "timestampadd(SECOND, CAST(id % 86400 + 3600 AS INT),"
        " TIMESTAMP '2025-06-10 00:00:00') AS scheduled_arrival",
        f"CASE WHEN id < {N_HUB} THEN 'HUB' ELSE"
        f" concat('AP', lpad(CAST(id % {N_COLD_AIRPORTS} AS STRING), 2, '0'))"
        " END AS departure_airport",
        "'DST' AS arrival_airport",
        "CASE WHEN id % 2 = 0 THEN 'Arrived' ELSE 'Scheduled' END AS status",
        "'AC0' AS aircraft_code",
        "CASE WHEN id % 2 = 0 THEN timestampadd(SECOND,"
        " CAST(id % 86400 + 120 AS INT), TIMESTAMP '2025-06-10 00:00:00')"
        " ELSE CAST(NULL AS TIMESTAMP) END AS actual_departure",
        "CAST(NULL AS TIMESTAMP) AS actual_arrival",
        "TIMESTAMP '2025-06-01 00:00:00' AS created_at",
        "TIMESTAMP '2025-06-10 12:00:00' AS updated_at",
    )
    flights.write.mode("overwrite").parquet(f"{stg}/flights")
    fact = fct_flight_activity(spark, stg)
    d = str(tmp_path_factory.mktemp("skew_fact"))
    fact.write.mode("overwrite").parquet(d)
    return d


def _airport_dim(spark):
    rows = [("HUB",)] + [
        (f"AP{i:02d}",) for i in range(N_COLD_AIRPORTS)
    ] + [("DST",)]
    return spark.createDataFrame(rows, "airport_code: string").withColumn(
        "airport_weight", F.length("airport_code").cast("bigint")
    )


def test_aqe_splits_hub_airport_join(spark, flights_fact):
    """The hub-airport fact⋈dim join gets its hot partition split at
    runtime (executed plan shows ``skew=true``) once broadcast is off —
    the plan a 100 TB flight-activity rollup actually needs."""
    confs = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    old = {c: spark.conf.get(c, None) for c in confs}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        fact = spark.read.parquet(flights_fact).select(
            "flight_id", "departure_airport", "dep_delay_sec_floor"
        )
        dim = _airport_dim(spark).withColumnRenamed(
            "airport_code", "departure_airport"
        )
        joined = fact.join(dim, "departure_airport")
        # execute THIS frame (count() plans a different tree) so its
        # adaptive plan finalizes
        assert len(joined.collect()) == N_HUB + N_COLD_AIRPORTS * N_COLD_EACH
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in executed, executed
        assert "skew=true" in executed, executed
    finally:
        for c, v in old.items():
            if v is not None:
                spark.conf.set(c, v)
            else:
                spark.conf.unset(c)


def test_salted_join_equals_plain_on_hub_fact(spark, flights_fact):
    """``salted_join`` over the hub-skewed fact is row-for-row equal to
    the plain join — per-airport counts and delay sums both match, so
    salting is a pure physical rewrite on the flights shape."""
    fact = spark.read.parquet(flights_fact).select(
        "departure_airport", "dep_delay_sec_floor"
    )
    dim = _airport_dim(spark).withColumnRenamed(
        "airport_code", "departure_airport"
    )

    def rollup(df):
        return {
            (r["departure_airport"], r["n"], r["w"], r["s"])
            for r in df.groupBy("departure_airport")
            .agg(
                F.count("*").alias("n"),
                F.max("airport_weight").alias("w"),
                F.sum("dep_delay_sec_floor").alias("s"),
            )
            .collect()
        }

    plain = rollup(fact.join(dim, "departure_airport"))
    salted = rollup(salted_join(fact, dim, "departure_airport", n_salts=8))
    assert plain == salted
    hub = next(r for r in plain if r[0] == "HUB")
    assert hub[1] == N_HUB
