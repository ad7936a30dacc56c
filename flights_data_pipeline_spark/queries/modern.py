"""Modern SQL surface: recursive CTEs, LATERAL, listagg, exact bitmap
distinct rollups, VARIANT semi-structured extraction, SQL UDFs.

The reference engine's query surface is classic batch SQL (SURVEY.md
§2); this module covers the *newer* ANSI/engine surface a user
migrating from it would expect a 2026 engine to offer, each shape
oracle-matched against DuckDB on the same parquet tables.

Scale notes per query live in the docstrings; the common thread: all
of these stay JVM-side (no Python UDFs), recursion iterates on the
DRIVER plan loop exactly like ``operators/graph.py`` (Spark's
UnionLoop executes each step as a distributed batch), and the bitmap
rollup is the mergeable-partial pattern (same as the HLL rollup, but
exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.catalog import load_table as t
from .registry import query


def _view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the given tables as temp views for spark.sql queries."""
    for n in names:
        t(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# Recursive CTE: hierarchy walk with a path-dependent aggregate.
# ---------------------------------------------------------------------------
@query(
    "referral_chain_recursive",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT c_custkey, 0 AS depth,
             CAST(c_acctbal AS DECIMAL(38,2)) AS chain_bal
      FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, chain.depth + 1,
             CAST(chain.chain_bal + c.c_acctbal AS DECIMAL(38,2))
      FROM customer c
      JOIN chain ON c.c_custkey // 2 = chain.c_custkey
                AND c.c_custkey > 1
    )
    SELECT c_custkey, CAST(depth AS INT) AS depth,
           CAST(chain_bal AS DOUBLE) AS chain_bal
    FROM chain
    """,
)
def referral_chain_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy walk: customers form an implicit binary
    referral tree (parent key = ``c_custkey div 2``); for every
    customer compute its depth and the cumulative account balance
    along its chain to the root.

    This is the iterative-traversal shape (org charts, BOM explosion,
    thread ancestry) that classic engines need stored procedures for —
    Spark 4's ``WITH RECURSIVE`` runs each step as a distributed
    batch, so the recursion depth is the tree DEPTH (log₂ N here),
    not the row count: ~45 rounds covers every int64 key space. The
    chain balance accumulates in DECIMAL (exact, order-free along the
    single root-to-node path) and casts to double once at the output
    boundary.
    """
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey, 0 AS depth,
                 CAST(c_acctbal AS DECIMAL(38,2)) AS chain_bal
          FROM customer WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, chain.depth + 1,
                 CAST(chain.chain_bal + c.c_acctbal AS DECIMAL(38,2))
          FROM customer c
          JOIN chain ON c.c_custkey div 2 = chain.c_custkey
                    AND c.c_custkey > 1
        )
        SELECT c_custkey, CAST(depth AS INT) AS depth,
               CAST(chain_bal AS DOUBLE) AS chain_bal
        FROM chain
        """
    )


# ---------------------------------------------------------------------------
# LATERAL: per-row correlated top-n without a global window.
# ---------------------------------------------------------------------------
@query(
    "lateral_latest_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_orderdate
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC
      LIMIT 2
    ) o
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def lateral_latest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-2 orders per BUILDING-segment customer via a correlated
    LATERAL subquery — the per-row top-n shape stated the way a user
    thinks about it (a sorted LIMIT per customer) instead of a global
    window function.

    Catalyst decorrelates the lateral into a ranked window over one
    shuffle on ``o_custkey`` — the same physical plan the hand-written
    ``cheapest_item_per_part`` uses, which is the point: declarative
    per-row subqueries don't cost a nested loop at scale. Determinism:
    the inner ORDER BY is total (date desc, key desc).
    """
    _view(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_orderdate
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_orderdate
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC
          LIMIT 2
        ) o
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


# ---------------------------------------------------------------------------
# listagg / string_agg: ordered set aggregation.
# ---------------------------------------------------------------------------
@query(
    "brand_container_listagg",
    oracle="""
    SELECT p_brand,
           string_agg(p_type, ',' ORDER BY p_type) AS type_list,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM (SELECT DISTINCT p_brand, p_type FROM part)
    GROUP BY p_brand
    """,
)
def brand_container_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part types per brand as one ordered comma-joined
    string — ``listagg`` (ANSI 2016 ordered set aggregate, Spark 4)
    with the dedup in a subquery so both engines aggregate the same
    multiset.

    The WITHIN GROUP order makes the output deterministic — an
    unordered listagg is a hash-partition-order lottery and would
    never cross-engine match. Cost: one shuffle on the group key;
    the collected string is bounded by the distinct-type count,
    not the row count.
    """
    _view(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_brand,
               listagg(p_type, ',')
                 WITHIN GROUP (ORDER BY p_type) AS type_list,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM (SELECT DISTINCT p_brand, p_type FROM part)
        GROUP BY p_brand
        """
    )


# ---------------------------------------------------------------------------
# Exact distinct-count rollup via mergeable bitmap partials.
# ---------------------------------------------------------------------------
@query(
    "bitmap_distinct_rollup",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_buyers
    FROM orders
    GROUP BY 1
    """,
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct buyers per month computed as a two-level rollup
    of mergeable bitmap partials: day-level bitmaps of customer keys
    (``bitmap_construct_agg``) OR-merge into month level, and the
    distinct count is the merged popcount.

    This is the incremental-rollup pattern the HLL sketch query
    (``hll_sketch_rollup``) uses, but exact: day partials are small
    (bitmap buckets are 4KB spans of the key space), re-aggregation
    never touches the fact table again, and — unlike COUNT(DISTINCT)
    — the partial is STORABLE, so a 100 TB deployment materializes
    day bitmaps once and serves any ad-hoc period rollup by OR-ing
    them. The oracle states the semantic contract (plain
    COUNT DISTINCT); matching it proves the bitmap path exact.
    """
    o = t(spark, sf_dir, "orders")
    day = (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.col("o_orderdate").alias("d"),
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
            F.col("o_custkey"),
        )
        .groupBy("order_month", "d", "bucket")
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias(
                "bm"
            )
        )
    )
    month_bucket = day.groupBy("order_month", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    return month_bucket.groupBy("order_month").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_buyers")
    )


# ---------------------------------------------------------------------------
# VARIANT: open-schema semi-structured extraction.
# ---------------------------------------------------------------------------
@query(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    GROUP BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the open-schema ``events.props`` payload
    via the VARIANT type (Spark 4): ``parse_json`` once into a binary
    semi-structured value, ``variant_get`` typed paths after.

    Against ``props_map_stats``'s from_json-to-map approach, VARIANT
    is the 100 TB answer for payloads with no stable schema: parsing
    happens once into a shredded binary encoding, path extraction is
    a byte-offset lookup (not a re-parse), and unknown keys survive.
    Integer sums keep the cross-engine gate exact.
    """
    e = t(spark, sf_dir, "events")
    k = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return k.groupBy("event_type").agg(
        F.count("k").cast("bigint").alias("n_with_k"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# SQL UDF: reusable scalar logic declared in SQL, inlined by Catalyst.
# ---------------------------------------------------------------------------
@query(
    "sql_udf_discounted_class",
    oracle="""
    SELECT CASE
             WHEN l_extendedprice * (1 - l_discount) >= 50000 THEN 'high'
             WHEN l_extendedprice * (1 - l_discount) >= 20000 THEN 'mid'
             ELSE 'low'
           END AS price_class,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def sql_udf_discounted_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-band classification through a declared SQL UDF
    (``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN expr``) —
    reusable business logic that stays fully inside Catalyst.

    Unlike a Python UDF, a SQL UDF is INLINED into the plan: the
    banding expression participates in codegen, constant folding and
    (when used in WHERE) predicate pushdown, at exactly zero
    serialization cost — the right way to share scalar logic across a
    query library. The oracle states the inlined expression, proving
    the UDF path result-identical.
    """
    _view(spark, sf_dir, "lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_class(
          price DECIMAL(12,2), discount DECIMAL(12,2)
        ) RETURNS STRING
        RETURN CASE
          WHEN price * (1 - discount) >= 50000 THEN 'high'
          WHEN price * (1 - discount) >= 20000 THEN 'mid'
          ELSE 'low'
        END
        """
    )
    return spark.sql(
        """
        SELECT price_class(l_extendedprice, l_discount) AS price_class,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem
        GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL (modern aggregate shorthand, identical in both engines).
# ---------------------------------------------------------------------------
@query(
    "group_by_all_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ALL
    """,
)
def group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — the modern-SQL shorthand (Spark 3.4+/DuckDB)
    that infers the grouping keys from the non-aggregate SELECT items.
    Worth a pin because the INFERENCE is the contract: both engines
    must classify exactly the same expressions as keys (a divergence
    would change the output grouping silently). The Spark side runs
    the literal SQL through ``spark.sql`` over a registered view — the
    engine's ad-hoc SQL surface, same as the CLI ``sql`` subcommand.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                         AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY ALL
        """
    )


# ---------------------------------------------------------------------------
# CDC apply-log compaction (I/U/D change log → final snapshot).
# ---------------------------------------------------------------------------
@query(
    "cdc_apply_log",
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS k, 1 AS seq, 'I' AS op,
             o_orderstatus AS status FROM orders
      UNION ALL
      SELECT o_orderkey, 2, 'U', 'U2' FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', CAST(NULL AS VARCHAR)
      FROM orders WHERE o_orderkey % 11 = 0
    ),
    latest AS (
      SELECT k, op, status FROM (
        SELECT *, row_number() OVER (PARTITION BY k
                                     ORDER BY seq DESC) AS rn
        FROM log
      ) WHERE rn = 1
    ),
    snapshot AS (
      SELECT k, status FROM latest WHERE op <> 'D'
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum
    FROM snapshot GROUP BY status
    """,
)
def cdc_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change log (insert / update / delete ops with a
    per-key sequence) down to the final snapshot — the log-compaction
    semantics every Debezium/binlog consumer and every table format's
    MERGE implement. The log is derived deterministically from
    ``orders`` (every key inserts; every 7th updates; every 11th
    deletes), so the oracle recomputes the identical log analytically.

    Semantics pinned: last-writer-wins per key on the sequence
    (ROW_NUMBER, the ``merge_latest_parquet`` ordering), deletes
    REMOVE the key from the snapshot rather than tombstoning it into
    the output, and an update following an insert replaces the row's
    attributes. Output is the snapshot aggregated by status with an
    exact key-sum integrity column.

    Scale: one window shuffle on the key — identical to the MERGE
    exchange the real apply pays; log compaction at 100 TB is exactly
    this query per partition.
    """
    o = t(spark, sf_dir, "orders")
    log = (
        o.select(
            F.col("o_orderkey").alias("k"),
            F.lit(1).alias("seq"),
            F.lit("I").alias("op"),
            F.col("o_orderstatus").alias("status"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 7 == 0).select(
                F.col("o_orderkey").alias("k"),
                F.lit(2).alias("seq"),
                F.lit("U").alias("op"),
                F.lit("U2").alias("status"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 11 == 0).select(
                F.col("o_orderkey").alias("k"),
                F.lit(3).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("string").alias("status"),
            )
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("k").orderBy(F.col("seq").desc())
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("op") != "D")
    )
    return latest.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("k").cast("bigint").alias("key_sum"),
    )
