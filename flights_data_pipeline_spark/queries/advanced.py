"""Advanced extension operators: as-of join, exact percentiles,
regex/array scalar coverage.

These extend the reference's declared surface (SURVEY.md §2.3 notes
as-of/range joins as absent; §2.8 notes regex/array functions as
extension-only) with the operators a point-in-time feature pipeline
needs, each DuckDB-oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io.catalog import load_table as t
from ..operators.joins import asof_join
from .registry import query


# ---------------------------------------------------------------------------
# As-of join: point-in-time lookup (merge-asof plan; operators/joins.py).
# ---------------------------------------------------------------------------
@query(
    "asof_join_last_purchase",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           p.event_id AS purchase_event_id,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click gets the user's most recent purchase at-or-before it.

    Spark side is the merge-asof composition in ``operators.joins``
    (one sort shuffle + running window); the oracle is DuckDB's native
    ``ASOF LEFT JOIN`` — two independent implementations of the same
    semantics.
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["purchase_event_id", "purchase_value"],
    )


# ---------------------------------------------------------------------------
# Range join: point-in-interval attribution (binned plan).
# ---------------------------------------------------------------------------
@query(
    "range_join_attribution",
    oracle="""
    SELECT c.event_id AS click_event_id,
           p.event_id AS purchase_event_id,
           c.user_id,
           p.value AS purchase_value,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS seconds_after
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 30 minutes after a click, per user — a
    point-in-interval range join via the binned operator
    (``operators.joins.range_join_binned``). The oracle is DuckDB's
    native inequality join (IEJoin) — independent plan, same semantics.
    """
    from ..operators.joins import range_join_binned

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("click_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    joined = range_join_binned(
        clicks,
        purchases,
        on="user_id",
        left_start="click_ts",
        left_end="click_end",
        right_time="purchase_ts",
        bin_seconds=1800,
    )
    return joined.select(
        "click_event_id",
        "purchase_event_id",
        "user_id",
        "purchase_value",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).cast("bigint").alias("seconds_after"),
    )


# ---------------------------------------------------------------------------
# Exact discrete percentiles via row_number (engine-portable).
# ---------------------------------------------------------------------------
@query(
    "percentile_exact",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN o_totalprice END) AS p50_totalprice,
           MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                    THEN o_totalprice END) AS p90_totalprice
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete p50/p90 per group, defined by row_number — the
    portable percentile (built-in percentile functions interpolate
    differently across engines). One window + one aggregate shuffle."""
    from ..operators.global_order import grouped_row_number

    o = t(spark, sf_dir, "orders")
    base = o.select("o_orderpriority", "o_totalprice", "o_orderkey")
    # two-phase grouped rank: 5 priority groups would otherwise funnel
    # the whole orders table into 5 window tasks
    ranked = grouped_row_number(
        base,
        ["o_orderpriority"],
        ["o_totalprice", "o_orderkey"],
        out="rn",
    ).join(
        base.groupBy("o_orderpriority").agg(F.count("*").alias("n")),
        "o_orderpriority",
    )
    target = lambda p: F.ceil(F.lit(p) * F.col("n")).cast("bigint")  # noqa: E731
    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.max(F.when(F.col("rn") == target(0.5), F.col("o_totalprice"))).alias(
            "p50_totalprice"
        ),
        F.max(F.when(F.col("rn") == target(0.9), F.col("o_totalprice"))).alias(
            "p90_totalprice"
        ),
    )


# ---------------------------------------------------------------------------
# Regex + array scalar functions (SURVEY.md §2.8 extension surface).
# ---------------------------------------------------------------------------
@query(
    "regex_array_functions",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           string_split(p_name, ' ')[1] AS first_name_word,
           CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_name_words,
           list_contains(string_split(p_name, ' '), 'widget') AS is_widget,
           array_to_string(list_sort(string_split(p_name, ' ')), ',')
             AS sorted_words,
           regexp_matches(p_type, '^(ECONOMY|PROMO)') AS is_promo_economy
    FROM part
    """,
)
def regex_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / split / array ops / rlike over the part table."""
    p = t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.element_at(words, 1).alias("first_name_word"),
        F.size(words).cast("int").alias("n_name_words"),
        F.array_contains(words, "widget").alias("is_widget"),
        F.array_join(F.array_sort(words), ",").alias("sorted_words"),
        F.col("p_type").rlike("^(ECONOMY|PROMO)").alias("is_promo_economy"),
    )


# ---------------------------------------------------------------------------
# Heavy hitters: misra-gries sketch candidates, exactly verified.
# ---------------------------------------------------------------------------
#: heavy-hitter threshold denominator: report keys above n/K of rows.
#: 105 on this near-uniform corpus (100 suppliers ≈ 1% each) puts the
#: threshold INSIDE the count distribution, so both the accept and
#: reject paths of the verifier carry gate rows at every SF; a real
#: skewed corpus uses K ≪ distinct-keys and the list is tiny.
HEAVY_K = 105


@query(
    "heavy_hitters",
    oracle=f"""
    WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
    SELECT l_suppkey AS key,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem CROSS JOIN tot
    GROUP BY l_suppkey, tot.n
    HAVING COUNT(*) * {HEAVY_K} > tot.n
    """,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys holding more than 1/{HEAVY_K} of all lineitem rows — via
    the sketch-then-verify pattern: ``freqItems`` (the Misra-Gries-
    family single-pass summary) proposes a SMALL candidate set, one
    exact count pass over only those candidates confirms or rejects
    each.

    Why this shape at 100 TB: a full GROUP BY over a high-cardinality
    key shuffles every distinct key to find the handful above
    threshold; the sketch bounds the candidate list at ~{HEAVY_K}
    entries (its guarantee: anything above n/{HEAVY_K} IS in the
    list), so the exact pass aggregates against a broadcast candidate
    filter and the shuffle carries only candidate keys. The output is
    exact — false candidates are filtered by the verified count — so
    a plain GROUP BY ... HAVING oracle pins it, unlike raw sketch
    outputs (``approx_aggregates``' rows-only bounds).

    The threshold test is division-free (``cnt·{HEAVY_K} > n``).
    """
    li = t(spark, sf_dir, "lineitem")
    cands = li.stat.freqItems(["l_suppkey"], 1.0 / HEAVY_K).first()[0]
    n = li.count()
    verified = (
        li.filter(F.col("l_suppkey").isin([int(c) for c in cands]))
        .groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") * HEAVY_K > F.lit(n))
    )
    return verified


# ---------------------------------------------------------------------------
# Top-k per group WITH ties (RANK, not ROW_NUMBER).
# ---------------------------------------------------------------------------
@query(
    "rank_with_ties_topk",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           CAST(rk AS INT) AS rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC)
               AS rk
      FROM orders
    ) WHERE rk <= 2
    """,
)
def rank_with_ties_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer KEEPING ties — ``RANK``, not
    ``ROW_NUMBER``: when two orders tie on price, both belong in a
    "top spenders" report, and a row_number cutoff would silently drop
    one on an arbitrary tiebreak. The flip side — output size is no
    longer bounded by 2·|groups| — is exactly the semantic difference
    this query pins (the gate fails if either engine resolves ties).

    Ordering is on the DECIMAL price (exact comparison; module float
    discipline), surfaced as DOUBLE. Plan: same WindowGroupLimit
    push-down as the row_number top-k (`domain_quota_sample`) — rank
    cutoffs prune below the shuffle too.
    """
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").cast("decimal(18,2)").desc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.rank().over(w).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= 2)
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM).
# ---------------------------------------------------------------------------
@query(
    "null_safe_join_counts",
    oracle="""
    WITH keyed AS (
      SELECT CASE WHEN value < 1.0 THEN NULL
                  ELSE CAST(floor(value / 20.0) AS BIGINT) END AS vbucket,
             event_type
      FROM events
    ),
    a AS (
      SELECT vbucket, CAST(COUNT(*) AS BIGINT) AS n_click
      FROM keyed WHERE event_type = 'click' GROUP BY vbucket
    ),
    b AS (
      SELECT vbucket, CAST(COUNT(*) AS BIGINT) AS n_view
      FROM keyed WHERE event_type = 'view' GROUP BY vbucket
    )
    SELECT a.vbucket, a.n_click, b.n_view
    FROM a JOIN b ON a.vbucket IS NOT DISTINCT FROM b.vbucket
    """,
)
def null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` ⇔ ``IS NOT DISTINCT FROM``): the
    NULL bucket — here "value below threshold", in practice "unknown
    segment / unparsed key" — MATCHES ITSELF instead of silently
    dropping out of the report, the way a plain ``=`` join loses every
    NULL row of both sides. Reconciliation jobs between two rollups of
    the same dirty key are the canonical use; losing the NULL cell is
    the classic silent-undercount bug this pins.

    Plan note: Spark plans `<=>` as a HASH join key (NULL hashes like
    a value under null-safe semantics) — no nested-loop penalty; both
    sides here are pre-aggregated bucket tables, so the join is
    k-row × k-row.
    """
    ev = t(spark, sf_dir, "events")
    vbucket = F.when(
        F.col("value") < 1.0, F.lit(None).cast("bigint")
    ).otherwise(F.floor(F.col("value") / 20.0).cast("bigint"))
    keyed = ev.select(vbucket.alias("vbucket"), "event_type")
    a = (
        keyed.filter(F.col("event_type") == "click")
        .groupBy("vbucket")
        .agg(F.count("*").cast("bigint").alias("n_click"))
    )
    b = (
        keyed.filter(F.col("event_type") == "view")
        .groupBy("vbucket")
        .agg(F.count("*").cast("bigint").alias("n_view"))
        .withColumnRenamed("vbucket", "vb_b")
    )
    return (
        a.join(b, F.col("vbucket").eqNullSafe(F.col("vb_b")))
        .select("vbucket", "n_click", "n_view")
    )


# ---------------------------------------------------------------------------
# Calendar-interval functions: month-end billing cycles.
# ---------------------------------------------------------------------------
@query(
    "month_end_billing",
    oracle="""
    WITH c AS (
      SELECT o_orderkey, o_orderdate,
             CAST(last_day(o_orderdate) AS DATE) AS cycle_end,
             CAST(last_day(o_orderdate + INTERVAL 1 MONTH) AS DATE)
               AS next_cycle_end,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(last_day(o_orderdate) AS DATE)) AS INT)
               AS days_to_cycle_end
      FROM orders
    )
    SELECT cycle_end,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(days_to_cycle_end) AS INT) AS min_days_left,
           CAST(MAX(days_to_cycle_end) AS INT) AS max_days_left,
           MIN(next_cycle_end) AS next_cycle_end
    FROM c GROUP BY cycle_end
    """,
)
def month_end_billing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end billing-cycle rollup — the calendar-interval function
    family (`last_day`, `add_months`, day diffs to a cycle boundary)
    that every invoicing/closing job leans on, pinned cross-engine:
    month arithmetic is where engines disagree most (adding a month to
    Jan 31, leap Februaries — `add_months` clamps to month-end in both
    engines, which the oracle's `+ INTERVAL 1 MONTH` matches for the
    last_day inputs used here).

    Plan: pure narrow date arithmetic in the scan projection + one
    groupBy on the derived cycle key — at 100 TB the cycle_end column
    is what the table would be partitioned by.
    """
    o = t(spark, sf_dir, "orders")
    c = o.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("cycle_end"),
        F.last_day(F.add_months("o_orderdate", 1)).alias("next_cycle_end"),
        F.datediff(F.last_day("o_orderdate"), F.to_date("o_orderdate"))
        .cast("int")
        .alias("days_to_cycle_end"),
    )
    return c.groupBy("cycle_end").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min("days_to_cycle_end").cast("int").alias("min_days_left"),
        F.max("days_to_cycle_end").cast("int").alias("max_days_left"),
        F.min("next_cycle_end").alias("next_cycle_end"),
    )


# ---------------------------------------------------------------------------
# Robust dispersion: median absolute deviation (nested exact medians).
# ---------------------------------------------------------------------------
@query(
    "mad_robust_dispersion",
    oracle="""
    WITH p AS (
      SELECT o_orderpriority AS grp, o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    ),
    r1 AS (
      SELECT *, row_number() OVER (PARTITION BY grp
                                   ORDER BY price, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM p
    ),
    med AS (
      SELECT grp, price AS m FROM r1 WHERE rn = (n + 1) // 2
    ),
    d AS (
      SELECT p.grp, p.o_orderkey, abs(p.price - med.m) AS dev, med.m
      FROM p JOIN med ON p.grp = med.grp
    ),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY grp
                                   ORDER BY dev, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM d
    )
    SELECT grp,
           CAST(n AS BIGINT) AS n_orders,
           CAST(m AS DOUBLE) AS median_price,
           CAST(dev AS DOUBLE) AS mad
    FROM r2 WHERE rn = (n + 1) // 2
    """,
)
def mad_robust_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per priority class — the robust
    dispersion measure anomaly baselines use where stddev is poisoned
    by the very outliers being hunted (one whale order inflates σ and
    hides every other anomaly; MAD doesn't move).

    Exactness: both medians are DISCRETE order statistics defined by
    row_number over (value, orderkey) — the module's portable
    percentile (built-in median/quantile interpolate differently
    across engines) — and the deviations are DECIMAL subtractions, so
    the nested median is exact end-to-end with floats only at the
    output surface. Plan: two windows + one join, all partitioned on
    the group key; nothing global.
    """
    o = t(spark, sf_dir, "orders")
    p = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    w1 = W.partitionBy("grp").orderBy("price", "o_orderkey")
    r1 = p.select(
        "grp",
        "o_orderkey",
        "price",
        F.row_number().over(w1).alias("rn"),
        F.count("*").over(W.partitionBy("grp")).alias("n"),
    )
    med = r1.filter(
        F.col("rn") == F.expr("(n + 1) DIV 2")
    ).select("grp", F.col("price").alias("m"))
    d = p.join(med, "grp").select(
        "grp",
        "o_orderkey",
        F.abs(F.col("price") - F.col("m")).alias("dev"),
        "m",
    )
    w2 = W.partitionBy("grp").orderBy("dev", "o_orderkey")
    r2 = d.select(
        "grp",
        "dev",
        "m",
        F.row_number().over(w2).alias("rn"),
        F.count("*").over(W.partitionBy("grp")).alias("n"),
    )
    return r2.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        "grp",
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("m").cast("double").alias("median_price"),
        F.col("dev").cast("double").alias("mad"),
    )


# ---------------------------------------------------------------------------
# Bitwise aggregates: flag rollups.
# ---------------------------------------------------------------------------
@query(
    "event_flag_rollup",
    oracle="""
    WITH f AS (
      SELECT user_id,
             CASE event_type
               WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'signup' THEN 4
               WHEN 'purchase' THEN 8 WHEN 'error' THEN 16 ELSE 0
             END AS flag
      FROM events
    )
    SELECT user_id,
           CAST(bit_or(flag) AS BIGINT) AS flags_any,
           CAST(bit_and(flag) AS BIGINT) AS flags_every,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM f GROUP BY user_id
    """,
)
def event_flag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavior flags via BITWISE aggregates: each event type
    is one bit; ``bit_or`` over a user's events is their lifetime
    capability mask ("has ever purchased" = bit 3), ``bit_and`` the
    invariant mask. One bigint per user replaces five boolean columns
    — and, like every mask, rolls up further by OR/AND without
    touching raw events again (mergeable, the sketch-family property).

    bit_or/bit_and are order-free integer lattice operations — exact
    in any engine, fully map-side combinable. Funnel membership
    queries become bitmask tests on the rollup
    (``flags_any & 10 = 10`` = clicked AND purchased).
    """
    ev = t(spark, sf_dir, "events")
    flag = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "purchase", 8)
        .when(F.col("event_type") == "error", 16)
        .otherwise(0)
    )
    return (
        ev.select("user_id", flag.alias("flag"))
        .groupBy("user_id")
        .agg(
            F.bit_or("flag").cast("bigint").alias("flags_any"),
            F.bit_and("flag").cast("bigint").alias("flags_every"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# NOT IN vs NOT EXISTS under NULLs (the three-valued-logic trap).
# ---------------------------------------------------------------------------
@query(
    "not_in_null_trap",
    oracle="""
    WITH probe AS (
      SELECT CASE WHEN value < 1.0 THEN NULL
                  ELSE CAST(floor(value) AS BIGINT) END AS v
      FROM events WHERE event_type = 'error'
    )
    SELECT
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT v FROM probe)) AS BIGINT)
        AS n_not_in,
      CAST((SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM probe p
                              WHERE p.v = c.c_custkey)) AS BIGINT)
        AS n_not_exists,
      CAST((SELECT COUNT(*) FROM probe WHERE v IS NULL) AS BIGINT)
        AS n_null_probes
    """,
)
def not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-valued-logic footgun, pinned as a row: ``NOT IN``
    against a subquery containing even ONE NULL returns ZERO rows
    (every comparison is UNKNOWN, never true), while the intended
    query — ``NOT EXISTS`` / an anti join — returns the real
    complement. Both engines implement standard SQL here; the gate
    pins that the engine's null-aware anti join preserves the
    standard's (surprising) semantics rather than "fixing" them, plus
    the witness count of NULL probes that springs the trap.

    Plan note: Spark compiles the ``NOT IN`` form to a null-aware
    anti join (BroadcastNestedLoopJoin when the probe side is small);
    ``NOT EXISTS`` compiles to a plain left-anti hash join — same
    answer only when the probe side is NULL-free, which is exactly
    what this row documents.
    """
    ev = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    ev.createOrReplaceTempView("events_v")
    c.createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        WITH probe AS (
          SELECT CASE WHEN value < 1.0 THEN NULL
                      ELSE CAST(floor(value) AS BIGINT) END AS v
          FROM events_v WHERE event_type = 'error'
        )
        SELECT
          CAST((SELECT COUNT(*) FROM customer_v
                WHERE c_custkey NOT IN (SELECT v FROM probe)) AS BIGINT)
            AS n_not_in,
          CAST((SELECT COUNT(*) FROM customer_v c
                WHERE NOT EXISTS (SELECT 1 FROM probe p
                                  WHERE p.v = c.c_custkey)) AS BIGINT)
            AS n_not_exists,
          CAST((SELECT COUNT(*) FROM probe WHERE v IS NULL) AS BIGINT)
            AS n_null_probes
        """
    )
