"""Multi-dimensional OLAP query shapes (TPC-H Q7/Q8/Q9/Q14/Q17/Q19/Q22
families), adapted to the driver's reduced star schema.

The reference's warehouse zone answers exactly this class of question
(star-join + conditional aggregation over the fact table; see SURVEY.md
§1.4 and the mart tables listed at ``dags/flights_data_pipeline.py:229-238``)
— these shapes widen the engine contract with the remaining classic
plan families:

* nation-pair volume (Q7): two independent dim lineages joined to one
  fact row, symmetric pair predicate;
* market share (Q8): conditional numerator over a shared denominator in
  ONE aggregation pass (no second scan);
* profit rollup (Q9): derived measure combining fact and dim columns;
* share-of-total in a window (Q14): two conditional sums, one row;
* correlated average threshold (Q17): per-key aggregate joined back to
  the detail rows, division-free comparison;
* disjunctive OR-of-ANDs predicate (Q19): the predicate that defeats
  naive pushdown and must evaluate as a join filter;
* anti-join + scalar subquery (Q22): "good customers who never bought".

Schema adaptations (driver tables lack partsupp / shipmode /
commitdate): supplier cost in Q9 is modelled from ``p_retailprice``;
Q22's country code becomes a nation-key bucket.

Cross-engine float discipline follows ``functions.scalars``: money stays
DECIMAL(18,2) internally, comparisons are restated division-free
(``qty*5*n < sum`` instead of ``qty < 0.2*avg``), and only final output
columns cast to DOUBLE (both engines cast the same decimal to the same
IEEE double). Ratios divide two doubles that are themselves decimal
casts — identical operands, identical IEEE result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.scalars import money as _dec
from ..io.catalog import load_table as t
from .registry import query

#: discounted line revenue, exact decimal (the Q-family's shared measure).
def _disc_price() -> F.Column:
    return F.round(
        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")), 2
    ).cast("decimal(18,2)")


_DISC_PRICE_SQL = (
    "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DECIMAL(18,2))"
)


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between a nation pair.
# ---------------------------------------------------------------------------
@query(
    "volume_shipping_nation_pair",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(SUM(volume) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             {_DISC_PRICE_SQL} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping_nation_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: revenue flow between two nations by year.

    Both dim lineages shrink BEFORE touching the fact: supplier and
    customer are each semi-filtered to the two nations first (tiny
    broadcast joins), so the only big work is lineitem ⋈ orders — and
    orders itself is pre-shrunk by its customer filter. The symmetric
    pair predicate runs as a post-join filter over the two small name
    columns, never over fact rows alone.
    """
    pair = ["NATION_1", "NATION_2"]
    n = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    oc = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    return (
        li.select("l_orderkey", "l_suppkey", "l_shipdate", _disc_price().alias("volume"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum("volume").cast("decimal(18,2)").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: market share of one nation within a region.
# ---------------------------------------------------------------------------
@query(
    "nation_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,2)) END)
                     AS DECIMAL(18,2)) AS DOUBLE)
             / CAST(CAST(SUM(volume) AS DECIMAL(18,2)) AS DOUBLE)
             AS mkt_share,
           CAST(CAST(SUM(volume) AS DECIMAL(18,2)) AS DOUBLE) AS total_volume
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             {_DISC_PRICE_SQL} AS volume,
             n1.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_5's share of PROMO-part volume sold to ASIA
    customers, by order year.

    Numerator and denominator come out of ONE aggregation pass
    (conditional sum beside the total — no second scan, no self-join).
    The ratio divides the two decimal sums only after both cast to
    double, so each engine divides bit-identical operands. Dims all
    broadcast; the fact is touched once.
    """
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    oc = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", F.year("o_orderdate").cast("bigint").alias("o_year")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _disc_price().alias("volume")
    )
    vol = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    num = (
        F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(zero))
        .cast("decimal(18,2)")
        .cast("double")
    )
    den = F.sum("volume").cast("decimal(18,2)").cast("double")
    return vol.groupBy("o_year").agg(
        (num / den).alias("mkt_share"), den.alias("total_volume")
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: profit by supplier nation and year.
# ---------------------------------------------------------------------------
@query(
    "profit_by_nation_year",
    oracle=f"""
    SELECT nation, o_year,
           CAST(CAST(SUM(amount) AS DECIMAL(18,2)) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             {_DISC_PRICE_SQL}
               - CAST(ROUND(CAST(p.p_retailprice AS DECIMAL(12,2))
                            * CAST(l.l_quantity AS DECIMAL(6,2))
                            * CAST(0.6 AS DECIMAL(2,1)), 2)
                      AS DECIMAL(18,2)) AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%5%'
    )
    GROUP BY nation, o_year
    """,
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier nation per year; the measure
    combines fact columns with a dim column (retail price standing in
    for the missing ``ps_supplycost``, at a 0.6 cost ratio).

    All decimal intermediates stay inside precision 38 (12,2 × 6,2 ×
    2,1 → exact product, HALF_UP round to 2 matches DuckDB on exact
    decimals). part/supplier/nation broadcast; lineitem ⋈ orders is
    the one shuffle, keyed on the natural FK.
    """
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%5%"))
        .select("p_partkey", "p_retailprice")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("bigint").alias("o_year")
    )
    li = t(spark, sf_dir, "lineitem")
    cost = F.round(
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(6,2)")
        * F.lit(0.6).cast("decimal(2,1)"),
        2,
    ).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("nation", "o_year", (_disc_price() - cost).alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("decimal(18,2)").cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share in one month (share-of-total).
# ---------------------------------------------------------------------------
@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT
      100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume
                                 ELSE CAST(0 AS DECIMAL(18,2)) END)
                   AS DECIMAL(18,2)) AS DOUBLE)
            / CAST(CAST(SUM(volume) AS DECIMAL(18,2)) AS DOUBLE)
        AS promo_revenue_pct,
      CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM (
      SELECT p.p_type, {_DISC_PRICE_SQL} AS volume
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    )
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: percentage of March-1996 revenue from PROMO parts —
    conditional numerator and unconditional denominator in one global
    aggregate. The month filter prunes lineitem row groups before the
    (broadcast) part join."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_type", _disc_price().alias("volume")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    num = (
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("volume")).otherwise(zero))
        .cast("decimal(18,2)")
        .cast("double")
    )
    den = F.sum("volume").cast("decimal(18,2)").cast("double")
    return j.agg(
        (F.lit(100.0) * num / den).alias("promo_revenue_pct"),
        F.count("*").cast("bigint").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: rows below a correlated per-key average.
# ---------------------------------------------------------------------------
@query(
    "small_quantity_order_revenue",
    oracle="""
    SELECT
      CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) / 7.0 AS avg_yearly,
      CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * a.n_qty < a.sum_qty
    """,
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue of lineitems whose quantity is below 20% of
    their part's average quantity.

    The correlated ``avg`` becomes one per-part aggregate joined back
    to the detail rows; the threshold ``qty < 0.2·avg`` is restated
    division-free as ``qty·5·n < sum`` so both engines compare exact
    decimals (a divided average is a double with an engine-specific
    ulp at the comparison boundary). The per-part aggregate is tiny
    relative to lineitem, so AQE broadcasts it into the probe.
    """
    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    agg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(_dec("l_quantity")).cast("decimal(18,2)").alias("sum_qty"),
        F.count("*").cast("bigint").alias("n_qty"),
    )
    small = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(agg, F.col("l_partkey") == F.col("a_partkey"))
        .filter(_dec("l_quantity") * 5 * F.col("n_qty") < F.col("sum_qty"))
    )
    return small.agg(
        (
            F.sum(_dec("l_extendedprice")).cast("decimal(18,2)").cast("double") / 7.0
        ).alias("avg_yearly"),
        F.count("*").cast("bigint").alias("n_small"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive OR-of-ANDs join predicate.
# ---------------------------------------------------------------------------
@query(
    "disjunctive_bracket_revenue",
    oracle=f"""
    SELECT
      CAST(CAST(SUM(volume) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_items
    FROM (
      SELECT {_DISC_PRICE_SQL} AS volume
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
             AND l.l_quantity >= 1  AND l.l_quantity <= 20)
         OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
             AND l.l_quantity >= 10 AND l.l_quantity <= 30)
         OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
             AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    )
    """,
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: three brand/size/quantity brackets OR'd together.

    The disjunction mixes columns from both sides, so it cannot push
    below the join — but its single-side implications CAN: Catalyst
    derives ``p_brand IN (…)`` for the part scan and the quantity
    envelope ``[1, 50]`` for lineitem, so both scans still prune; the
    full OR evaluates as the (broadcast) join's residual filter.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & (q >= 1) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 20)
            & (q >= 10) & (q <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 40)
            & (q >= 20) & (q <= 50)
        )
    )
    return j.filter(bracket).agg(
        F.sum(_disc_price()).cast("decimal(18,2)").cast("double").alias("revenue"),
        F.count("*").cast("bigint").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: anti join + scalar subquery threshold.
# ---------------------------------------------------------------------------
@query(
    "dormant_rich_customers",
    oracle="""
    WITH pos AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS total,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c.c_nationkey % 5 AS BIGINT) AS nation_bucket,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2)))
                     AS DECIMAL(18,2)) AS DOUBLE) AS totacctbal
    FROM customer c CROSS JOIN pos
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n > pos.total
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers richer than the positive-balance average who
    have NEVER ordered, bucketed by nation group.

    The scalar threshold broadcasts as a 1-row cross join (restated
    division-free: ``bal·n > sum``); "never ordered" is a LEFT ANTI
    hash join against the orders keys. At scale the anti join probes a
    distinct-keys build side orders of magnitude smaller than orders
    itself.
    """
    c = t(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).cast("decimal(18,2)").alias("total"),
        F.count("*").cast("bigint").alias("n"),
    )
    o_keys = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    rich = c.crossJoin(F.broadcast(pos)).filter(
        _dec("c_acctbal") * F.col("n") > F.col("total")
    )
    return (
        rich.join(o_keys, "c_custkey", "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("bigint").alias("nation_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(_dec("c_acctbal"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer (wide group-by).
# ---------------------------------------------------------------------------
@query(
    "returned_item_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_mktsegment,
           CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
           CAST(CAST(SUM(volume) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM (
      SELECT l.l_orderkey, {_DISC_PRICE_SQL} AS volume
      FROM lineitem l
      WHERE l.l_returnflag = 'R'
    ) r
    JOIN orders o   ON o.o_orderkey = r.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_mktsegment, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: who returned the most revenue last quarter — a wide
    GROUP BY carrying dim attributes through the aggregate, then
    top-20.

    The grouping key includes every customer attribute the report
    shows; since c_custkey is the PK, the extra key columns change no
    group boundaries, only ride along — the plan that avoids a second
    join back to customer after aggregating. Selective filters
    (returnflag, quarter) sit on the scans; the top-20 is a
    TakeOrderedAndProject, not a global sort.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        li.select("l_orderkey", _disc_price().alias("volume"))
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "nation", "c_mktsegment", "c_acctbal")
        .agg(F.sum("volume").cast("decimal(18,2)").cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "nation",
            "c_mktsegment",
            F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("acctbal"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Derived part-supplier relation (partsupp stand-in) for Q2/Q11/Q16.
# ---------------------------------------------------------------------------
# The driver schema has no partsupp table; lineitem's (l_partkey,
# l_suppkey) pairs ARE the observed part-supplier relation, with
# unit price (extendedprice/quantity, one exact IEEE division) as the
# supply-cost stand-in and line count as activity. Both engines build
# it identically, so the Q2/Q11/Q16 families run unchanged on top.
_PS_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost,
             CAST(COUNT(*) AS BIGINT) AS ps_lines
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        F.count("*").cast("bigint").alias("ps_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier per part (correlated min).
# ---------------------------------------------------------------------------
@query(
    "min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eligible AS (
      SELECT p.p_partkey, p.p_name, p.p_size, s.s_suppkey, s.s_name,
             n.n_name AS nation, ps.ps_supplycost
      FROM part p
      JOIN ps ON ps.ps_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size <= 15 AND r.r_name = 'EUROPE'
    ),
    best AS (
      SELECT p_partkey, MIN(ps_supplycost) AS min_cost
      FROM eligible GROUP BY p_partkey
    )
    SELECT e.p_partkey, e.p_name, e.p_size, e.s_suppkey, e.s_name,
           e.nation, e.ps_supplycost AS supplycost
    FROM eligible e JOIN best b
      ON e.p_partkey = b.p_partkey AND e.ps_supplycost = b.min_cost
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each small EUROPE-supplied part, the supplier(s)
    with the minimum supply cost — the correlated-min subquery
    decorrelated into a per-part MIN joined back on equality.

    The min and the join-back compare the SAME double value computed
    once (no re-derivation), so float equality is safe here — it's
    identity, not arithmetic. eligible is the one shuffle (part-keyed);
    best reuses its exchange; supplier/nation/region broadcast.
    """
    ps = _ps(spark, sf_dir)
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 15)
        .select("p_partkey", "p_name", "p_size")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nr = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", F.col("n_name").alias("nation"))
    eligible = (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_name", "p_size", "s_suppkey", "s_name",
            "nation", "ps_supplycost",
        )
    )
    best = eligible.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eligible.join(
            best,
            (F.col("p_partkey") == F.col("b_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "p_partkey", "p_name", "p_size", "s_suppkey", "s_name",
            "nation", F.col("ps_supplycost").alias("supplycost"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: important stock — group value vs a global threshold.
# ---------------------------------------------------------------------------
@query(
    "important_stock_value",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    val AS (
      SELECT ps.ps_partkey,
             CAST(SUM(CAST(ROUND(CAST(ps.ps_supplycost AS DECIMAL(18,4))
                                 * ps.ps_lines, 2) AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS part_value
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY ps.ps_partkey
    ),
    tot AS (SELECT CAST(SUM(part_value) AS DECIMAL(18,2)) AS total FROM val)
    SELECT v.ps_partkey AS p_partkey,
           CAST(v.part_value AS DOUBLE) AS part_value
    FROM val v CROSS JOIN tot
    WHERE v.part_value * 1000 > tot.total
    """,
)
def important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose ASIA-supplied stock value exceeds 1/1000
    of the total — a grouped aggregate filtered against a scalar
    aggregate OF ITSELF.

    The threshold comparison is division-free (``value·1000 > total``)
    on exact decimals; the per-part value rounds the double
    cost×activity product to cents first so both engines sum identical
    decimals. The total reuses the per-part aggregate's exchange; the
    1-row total broadcasts.
    """
    ps = _ps(spark, sf_dir)
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cents = F.round(
        F.col("ps_supplycost").cast("decimal(18,4)") * F.col("ps_lines"), 2
    ).cast("decimal(18,2)")
    val = (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(cents).cast("decimal(18,2)").alias("part_value"))
    )
    tot = val.agg(F.sum("part_value").cast("decimal(18,2)").alias("total"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") * 1000 > F.col("total"))
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier diversity per part attribute, NOT-IN filter.
# ---------------------------------------------------------------------------
@query(
    "parts_supplier_diversity",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def parts_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier count per (brand, type, size) with
    attribute exclusions and a NOT-IN supplier blacklist (negative
    balance standing in for the reference's complaint filter).

    NOT IN over a non-nullable key plans as LEFT ANTI — never a
    nested loop. The distinct count runs partial-aggregated on
    (attrs, suppkey) before the final count, so the shuffle carries
    deduplicated pairs, not raw lineitem fan-out.
    """
    ps = _ps(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    blacklist = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("ps_suppkey"))
    )
    return (
        ps.join(blacklist, "ps_suppkey", "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast-revenue — pure scan + predicate + one sum.
# ---------------------------------------------------------------------------
@query(
    "forecast_revenue_change",
    oracle="""
    SELECT
      CAST(CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                               * CAST(l_discount AS DECIMAL(18,2)), 2)
                         AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
        AS revenue_effect,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the pure scan query — three pushed predicates, no
    join, one global sum. The whole plan must be scan → filter →
    partial agg → single-partition final: every predicate reaches
    PushedFilters, and at 100 TB the year bound prunes row groups
    before any row is read.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    eff = F.round(_dec("l_extendedprice") * _dec("l_discount"), 2).cast(
        "decimal(18,2)"
    )
    return li.agg(
        F.sum(eff).cast("decimal(18,2)").cast("double").alias("revenue_effect"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: shipping modes vs order priority.
# ---------------------------------------------------------------------------
# The driver schema has no l_shipmode / l_commitdate / l_receiptdate; a
# deterministic categorical derived from the line identity (pure integer
# arithmetic, identical in both engines) stands in for shipmode, and
# "shipped after the order date" stands in for the late-commit predicate.
_SHIPMODE_SQL = """CASE CAST((l_orderkey * 7 + l_linenumber) % 4 AS INT)
           WHEN 0 THEN 'AIR' WHEN 1 THEN 'MAIL'
           WHEN 2 THEN 'SHIP' ELSE 'TRUCK' END"""


def _shipmode() -> F.Column:
    k = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 4
    return (
        F.when(k == 0, "AIR")
        .when(k == 1, "MAIL")
        .when(k == 2, "SHIP")
        .otherwise("TRUCK")
    )


@query(
    "shipmode_priority_counts",
    oracle=f"""
    WITH l AS (
      SELECT l_orderkey, l_shipdate, {_SHIPMODE_SQL} AS l_shipmode
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT l_shipmode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN l ON o_orderkey = l_orderkey
    WHERE l_shipmode IN ('MAIL', 'SHIP')
      AND l.l_shipdate > o_orderdate
    GROUP BY l_shipmode
    """,
)
def shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per ship mode, how many late-shipped lines carried
    urgent vs non-urgent orders — a fact-to-fact equi join whose real
    filter (shipdate > orderdate) references BOTH sides and so must run
    as a join condition, plus two conditional counts in one pass.

    The year bound and the two-mode IN are evaluated against the
    lineitem scan before the join (the year bound reaches
    PushedFilters; the mode is derived, so it runs as a post-scan
    filter but still pre-shuffle, cutting the join input ~2/4). The
    join shuffles on orderkey only; at 100 TB both sides partition on
    the same key, and the aggregation on the 2-value mode column is a
    map-side partial that collapses to 2 rows per task.
    """
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .withColumn("l_shipmode", _shipmode())
        .filter(F.col("l_shipmode").isin("MAIL", "SHIP"))
        .select("l_orderkey", "l_shipdate", "l_shipmode")
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
        )
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: surplus stock suppliers (potential part promotion).
# ---------------------------------------------------------------------------
@query(
    "surplus_stock_suppliers",
    oracle="""
    WITH ps0 AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    ps AS (
      SELECT *, CAST((ps_partkey * 31 + ps_suppkey * 17) % 50 + 1 AS BIGINT)
                  AS ps_availqty
      FROM ps0
    ),
    qty AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS year_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    surplus AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'large%'
      JOIN qty ON qty.l_partkey = ps.ps_partkey
              AND qty.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > qty.year_qty
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT ps_suppkey FROM surplus)
      AND n.n_name IN ('NATION_3','NATION_7','NATION_11','NATION_19')
    """,
)
def surplus_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers in a nation group holding more stock of a
    name-filtered part than a year's shipments moved — the classic
    nested EXISTS chain (supplier IN (... partsupp WHERE availqty >
    scalar-correlated SUM(lineitem))) decorrelated into a distinct
    semi-join pipeline.

    The driver schema has no partsupp.availqty; a deterministic
    per-pair quantity from key arithmetic (identical in both engines,
    integer-exact) stands in. year_qty sums integral quantities, so
    the double SUM is order-independent and the cross-engine compare
    is exact.

    Scale: ps (pair distinct) and qty aggregate on the SAME
    (partkey, suppkey) key, so their join reuses one shuffle
    partitioning; the name-filtered part side broadcasts; surplus
    collapses to a distinct supplier set that broadcasts into a
    left-semi join against the supplier dim. No row explosion
    anywhere: every intermediate is bounded by the pair count.
    """
    li = t(spark, sf_dir, "lineitem")
    ps = (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .withColumn(
            "ps_availqty",
            (
                (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 50 + 1
            ).cast("bigint"),
        )
    )
    qty = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("year_qty"))
    )
    large = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("large%"))
        .select("p_partkey")
    )
    surplus = (
        ps.join(F.broadcast(large), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            qty,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("year_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11", "NATION_19")
    )
    return (
        s.join(surplus, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: local supplier volume (cyclic join constraint).
# ---------------------------------------------------------------------------
@query(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(18,2)) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue shipped by suppliers to customers of their OWN
    nation, per nation in one region — the join graph with a CYCLE
    (supplier.nation = customer.nation closes the loop through the two
    fact edges), the family no other registry query exercises: the
    optimizer cannot tree-ify it without carrying the nationkey through
    one side and filtering at the far edge.

    Plan: nation⋈region prefilters to the region's nation keys
    (broadcast); customer and supplier halve against it BEFORE the fact
    joins (Catalyst pushes the nationkey IN-filter to both dim scans);
    the cycle closes as a cheap post-join filter on two already-carried
    ints. orders date window reaches PushedFilters. At 100 TB the only
    big exchanges are the two fact joins on their natural keys.
    """
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(_disc_price())
            .cast("decimal(18,2)")
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Cumulative distinct count (running distinct buyers by day).
# ---------------------------------------------------------------------------
@query(
    "cumulative_distinct_buyers",
    oracle="""
    WITH firsts AS (
      SELECT o_orderdate,
             CASE WHEN row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM orders
    ),
    daily AS (
      SELECT o_orderdate,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(is_first) AS BIGINT) AS n_new_buyers
      FROM firsts GROUP BY o_orderdate
    )
    SELECT o_orderdate, n_orders, n_new_buyers,
           CAST(SUM(n_new_buyers) OVER (ORDER BY o_orderdate
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT)
             AS cum_distinct_buyers
    FROM daily
    """,
)
def cumulative_distinct_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of DISTINCT buyers by order date — the metric
    engines cannot express directly (``COUNT(DISTINCT) OVER`` needs
    per-row distinct state), restated as the first-occurrence trick:
    mark each customer's first order (one ranked window on the
    customer key), count firsts per day, cumulative-sum the daily
    counts (a second window over the DAY-level rows only).

    The restatement IS the 100 TB plan: the ranked window shuffles on
    ``o_custkey`` (parallel across customers), and the unbounded
    running sum — the only sequential part — runs over the tiny
    per-day aggregate, never the fact table. Both engines execute the
    same restated SQL, pinning the trick's equivalence on integers.
    """
    o = t(spark, sf_dir, "orders")
    w_first = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    firsts = o.select(
        "o_orderdate",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "is_first"
        ),
    )
    daily = firsts.groupBy("o_orderdate").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("is_first").cast("bigint").alias("n_new_buyers"),
    )
    w_cum = W.orderBy("o_orderdate").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return daily.select(
        "o_orderdate",
        "n_orders",
        "n_new_buyers",
        F.sum("n_new_buyers").over(w_cum).cast("bigint").alias(
            "cum_distinct_buyers"
        ),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (co-purchased part pairs).
# ---------------------------------------------------------------------------
#: max DISTINCT items per basket admitted to the pair/triple self-joins.
#: Same pattern as ``dedup.NGRAM_DF_CAP``: the quadratic (cubic for
#: triples) stage is bounded per basket at C(cap,2) / C(cap,3), so one
#: hot basket with 10^5 items can no longer spawn a 10^10-pair stage at
#: 100 TB. On TPC-H-ish data (baskets ≤ 7 items) the cap admits every
#: basket, so results are unchanged; on real retail data dropping
#: pathological baskets (batch imports, bot carts) is standard market-
#: basket hygiene — an oversized basket carries no per-pair signal.
BASKET_CAP = 64

#: shared CTE pair: ``items`` = (basket, item) with oversized baskets
#: dropped — splice into co-purchase oracles (engine-neutral SQL).
_BASKET_ITEMS_SQL = f"""items_all AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz
        FROM items_all
      ) WHERE bsz <= {BASKET_CAP}
    )"""


def _basket_items(li: DataFrame) -> DataFrame:
    """Distinct (basket, item) pairs with baskets over ``BASKET_CAP``
    items removed — the bounded input every co-purchase self-join
    starts from. One windowed count over the already-shuffled distinct
    output; no extra join."""
    items = li.select("l_orderkey", "l_partkey").dropDuplicates()
    return (
        items.withColumn(
            "bsz", F.count("*").over(W.partitionBy("l_orderkey"))
        )
        .filter(F.col("bsz") <= BASKET_CAP)
        .drop("bsz")
    )


def _basket_arrays(li: DataFrame) -> DataFrame:
    """``(l_orderkey, arr)``: each capped basket's SORTED DISTINCT item
    array. Round 12 built every basket's array in one ``collect_set``
    pass and filtered ≤ ``BASKET_CAP`` afterwards — which meant a
    pathological million-item basket allocated a million-element
    aggregation buffer BEFORE the cap could drop it (round-12 VERDICT
    "What's wrong #5"). Round 13 bounds the buffer: cap membership is
    decided first from a two-level COUNT pass whose buffers are
    constant-size (dedup at (basket, item) grain with map-side
    partials, then a count per basket), and only in-cap baskets reach
    ``collect_set`` — its array buffer is then ≤ cap by construction.
    Same result set: the count pass computes exactly the distinct-item
    count the old ``size(arr)`` filter read off the built array."""
    items = li.select("l_orderkey", "l_partkey")
    ok = (
        items.distinct()
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
        .filter(F.col("n_items") <= BASKET_CAP)
        .select("l_orderkey")
    )
    return (
        items.join(ok, "l_orderkey", "left_semi")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("arr"))
    )


def _ordered_pairs(arr: F.Column) -> F.Column:
    """All (pa < pb) item pairs of a sorted distinct array, built
    IN-ROW: for the element at 0-based index i, pair it with every
    later element (1-based slice start i+2). The indexed lambda is
    safe here — ``arr`` is a materialized aggregate output column, not
    a re-evaluated expression (contrast ``dedup._shingles``)."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )


def _basket_pair_counts(li: DataFrame) -> DataFrame:
    """``(pa, pb, w)``: ordered co-purchase pairs with their basket
    support, the shared kernel every co-purchase graph/rules query
    derives from. Pairs are expanded IN-ROW from each basket's sorted
    distinct item array instead of the classic items-⋈-items self-join
    — the same pair multiset per basket (all i < j combinations of the
    distinct items), but two exchanges total instead of four
    (dropDuplicates + window + join-key + pair-groupBy), no join, and
    the pair aggregate gets map-side partials (guide: aggregate before
    you shuffle). Per-basket fan-out is C(|basket|, 2), bounded by
    ``BASKET_CAP`` exactly as the self-join was."""
    pairs = _basket_arrays(li).select(
        F.explode(_ordered_pairs(F.col("arr"))).alias("p")
    )
    return pairs.groupBy(
        F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb")
    ).agg(F.count("*").alias("w"))


@query(
    "copurchase_part_pairs",
    oracle=f"""
    WITH {_BASKET_ITEMS_SQL},
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, support, CAST(rn AS INT) AS rank
    FROM (
      SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS support,
             row_number() OVER (ORDER BY COUNT(*) DESC, part_a, part_b)
               AS rn
      FROM pairs GROUP BY part_a, part_b
    ) WHERE rn <= 20
    """,
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-20 part pairs most often
    bought in the same order — the support-counting kernel under
    association-rule mining (the A-priori first pass).

    Plan shape is the canonical co-occurrence self-join: dedupe to
    (basket, item), equi-join on the BASKET key with ``a < b``
    ordering (each unordered pair once, no self-pairs), aggregate on
    the pair. Scale honesty: pair count grows with Σ basket_size² —
    TPC-H baskets hold ≤ 7 items so the blowup is bounded ~21× here;
    real retail pipelines cap or sample outlier baskets first (the
    same saturated-bucket discipline as the LSH joins). The final
    top-20 ranks on exact integer support with a total tiebreak.
    """
    li = t(spark, sf_dir, "lineitem")
    sup = _basket_pair_counts(li).select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        F.col("w").cast("bigint").alias("support"),
    )
    w = W.orderBy(F.col("support").desc(), "part_a", "part_b")
    return (
        sup.orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


# ---------------------------------------------------------------------------
# NTILE decile banding: equal-frequency buckets with per-band stats.
# ---------------------------------------------------------------------------
@query(
    "ntile_decile_stats",
    oracle="""
    WITH banded AS (
      SELECT CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                  AS BIGINT) AS decile,
             o_totalprice
      FROM orders
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total
    FROM banded GROUP BY decile
    """,
)
def ntile_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile bands over order value (NTILE) with
    per-band population, bounds, and total — the binning layer under
    price-tier reporting, fraud-score banding, and data-quality drift
    checks (band boundaries moving between runs = distribution shift).

    NTILE is only deterministic under a TOTAL order, so the window
    orders by (price, orderkey); both engines then assign identical
    band numbers (same ceil/floor split of n into 10). Band totals sum
    in DECIMAL and cast once at the surface (the module's float
    discipline). Scale note: a global NTILE is a single total sort —
    fine as a reporting tail over pre-aggregated data; for raw-fact
    banding at 100 TB use ``approx_aggregates``' percentile buckets
    instead (no global sort).
    """
    o = t(spark, sf_dir, "orders")
    banded = o.select(
        F.ntile(10)
        .over(W.orderBy("o_totalprice", "o_orderkey"))
        .cast("bigint")
        .alias("decile"),
        "o_totalprice",
    )
    return banded.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


# ---------------------------------------------------------------------------
# Triangle counting over the co-purchase graph.
# ---------------------------------------------------------------------------
@query(
    "copurchase_triangles",
    oracle="""
    WITH items_all AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz
        FROM items_all
      ) WHERE bsz <= 64
    ),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(DISTINCT x) FROM
                  (SELECT u AS x FROM e UNION SELECT v FROM e)) AS BIGINT)
             AS n_nodes
    """,
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph (parts bought together
    in ≥2 distinct orders): triangles, edges, nodes — the inputs to a
    clustering coefficient, the standard density diagnostic for the
    SAME graphs the dedup family builds (near-dup candidate graphs,
    co-citation graphs). A spiking triangle count is how template spam
    shows up before any pairwise threshold fires.

    Plan: the canonical two-join triangle enumeration over the ORIENTED
    edge list (u < v everywhere) — each triangle {a<b<c} is produced
    exactly once as (a,b)⋈(b,c)⋈(a,c), no /6 correction, no directed
    double counting. Scale posture: the support-≥2 HAVING prunes the
    edge list before the quadratic step (the same guard
    ``copurchase_part_pairs`` applies via top-k); the triangle joins
    are plain equi-joins on part keys — shuffle-partitioned, no
    cartesian anywhere, and at 100 TB the standard refinement (orient
    edges by degree) drops the worst key's fan-out from deg² to
    O(sqrt(|E|)) without changing this query's contract.
    """
    li = t(spark, sf_dir, "lineitem")
    e = (
        _basket_pair_counts(li)
        .filter(F.col("w") >= 2)
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        # five plan references (3 triangle sides + edge/node counts):
        # lambda-bearing subtrees don't canonicalize for exchange
        # reuse, so materialize the pair expansion once
        .localCheckpoint(eager=False)
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    edges_nodes = e.agg(
        F.count("*").cast("bigint").alias("n_edges"),
    )
    nodes = (
        e.select(F.col("u").alias("x"))
        .union(e.select(F.col("v").alias("x")))
        .distinct()
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
    )
    return tri.crossJoin(F.broadcast(edges_nodes)).crossJoin(F.broadcast(nodes))


# ---------------------------------------------------------------------------
# Integer PageRank over the co-purchase graph (fixed-point arithmetic).
# ---------------------------------------------------------------------------
#: fixed-point scale for PageRank mass: scores live in units of 1e-6.
PR_SCALE = 1_000_000
#: damping factor 85/100 and its complement, as exact integer ratios.
PR_D_NUM, PR_D_DEN = 85, 100
#: edges must be co-purchased in >= this many distinct orders (the
#: support prune that bounds the graph on dense baskets).
PR_MIN_SUPPORT = 2
#: power-iteration rounds (fixed for determinism, like the kmeans fits).
PR_ROUNDS = 3


def _pr_oracle() -> str:
    rounds = []
    prev = "s0"
    for i in range(1, PR_ROUNDS + 1):
        rounds.append(
            f"""r{i} AS (
      SELECT e.dst AS node, SUM({prev}.score // {prev}.d) AS inc
      FROM edges e JOIN {prev} ON e.src = {prev}.node
      GROUP BY e.dst
    ),
    s{i} AS (
      SELECT s0.node,
             ({PR_SCALE} * {PR_D_DEN - PR_D_NUM}) // {PR_D_DEN}
               + ({PR_D_NUM} * COALESCE(r{i}.inc, 0)) // {PR_D_DEN} AS score,
             s0.d
      FROM s0 LEFT JOIN r{i} ON s0.node = r{i}.node
    )"""
        )
        prev = f"s{i}"
    return f"""
    WITH items_all AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz
        FROM items_all
      ) WHERE bsz <= 64
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    und AS (
      SELECT pa, pb FROM (
        SELECT pa, pb, COUNT(*) AS w FROM pairs GROUP BY pa, pb
      ) WHERE w >= {PR_MIN_SUPPORT}
    ),
    edges AS (
      SELECT pa AS src, pb AS dst FROM und
      UNION ALL
      SELECT pb, pa FROM und
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    s0 AS (
      SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS score, d FROM deg
    ),
    {','.join(rounds)}
    SELECT node AS part_key, CAST(score AS BIGINT) AS score,
           CAST(d AS BIGINT) AS degree
    FROM {prev}
    ORDER BY score DESC, node
    LIMIT 20
    """


def _pagerank_small(edges: DataFrame) -> DataFrame:
    """Single-task fixed-point PageRank over a dispatch-certified
    SMALL symmetrized edge list ``(src, dst)``: the {PR_ROUNDS} power
    rounds run in pandas inside one executor task with the SAME exact
    integer arithmetic as the Spark loop (score DIV degree per
    neighbor, base + (85·sum) DIV 100 damping) — floor division of
    non-negative int64s in both engines, so scores are bit-identical
    regardless of path. Returns ``(node, score, d)``."""
    from pyspark.sql.types import LongType, StructField, StructType

    node_type = edges.schema["src"].dataType
    schema = StructType(
        [
            StructField("node", node_type),
            StructField("score", LongType()),
            StructField("d", LongType()),
        ]
    )
    base = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN

    def _pr(batches):
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True)
        deg = df.groupby("src").size().astype("int64")
        s = pd.Series(PR_SCALE, index=deg.index, dtype="int64")
        for _ in range(PR_ROUNDS):
            contrib = (s // deg).reindex(df["src"]).to_numpy()
            inc = (
                pd.Series(contrib)
                .groupby(df["dst"].to_numpy())
                .sum()
                .reindex(deg.index, fill_value=0)
                .astype("int64")
            )
            s = base + (PR_D_NUM * inc) // PR_D_DEN
        yield pd.DataFrame(
            {
                "node": deg.index.to_numpy(),
                "score": s.to_numpy(),
                "d": deg.to_numpy(),
            }
        )

    return edges.repartition(1).mapInPandas(_pr, schema)


@query("pagerank_copurchase", oracle=_pr_oracle())
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank over the co-purchase graph — the
    iterative-graph-algorithm shape (power iteration) expressed as a
    fixed number of join+aggregate rounds.

    Cross-engine determinism is the design constraint: float PageRank
    sums contributions in engine-dependent order, so this is FIXED-POINT
    integer PageRank — scores are bigints in units of 1/{PR_SCALE}, a
    node's per-neighbor contribution is ``score DIV degree`` and the
    damping update is ``(15% of SCALE) + (85 * sum) DIV 100``, all exact
    integer arithmetic whose result is identical in any evaluation
    order. The truncation each round loses < 1 unit (1e-6) per term —
    immaterial for ranking, decisive for the oracle hash.

    Scale posture: the graph materializes ONCE (support-pruned,
    symmetrized, localCheckpointed) and each round is one shuffle —
    join contributions on src, aggregate on dst; degrees ride along in
    the score table so no extra join per round. No driver-side state at
    all (contrast kmeans, which collects k centroids); rounds are fixed
    at {PR_ROUNDS} for determinism, the production dial is a
    convergence test on total score movement.
    """
    li = t(spark, sf_dir, "lineitem")
    und = (
        _basket_pair_counts(li)
        .filter(F.col("w") >= PR_MIN_SUPPORT)
        .select("pa", "pb")
    )
    edges = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(
        und.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    ).localCheckpoint(eager=True)
    # size dispatch (1-row count on the checkpointed list, shared
    # convention with operators/graph): a small graph runs the whole
    # fixed-point power iteration in ONE single-task pandas pass —
    # identical exact-integer arithmetic, so scores are bit-equal to
    # the round-per-round Spark loop below; large graphs keep the
    # per-round join+aggregate plan unchanged.
    from ..operators import graph as _G

    n_e = edges.count()
    if _G.FORCE == "small" or (
        _G.FORCE is None and n_e <= _G.SMALL_GRAPH_MAX_EDGES
    ):
        state = _pagerank_small(edges)
        return (
            state.select(
                F.col("node").alias("part_key"),
                F.col("score").cast("bigint").alias("score"),
                F.col("d").cast("bigint").alias("degree"),
            )
            .orderBy(F.col("score").desc(), "part_key")
            .limit(20)
        )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    state = deg.select(
        F.col("src").alias("node"),
        F.lit(PR_SCALE).cast("bigint").alias("score"),
        "d",
    )
    base = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN
    for _ in range(PR_ROUNDS):
        inc = (
            edges.join(state, edges.src == state.node)
            .select("dst", F.expr("score div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        state = (
            state.join(inc, state.node == inc.dst, "left")
            .select(
                "node",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"({PR_D_NUM} * coalesce(inc, 0L)) div {PR_D_DEN}"
                    )
                ).alias("score"),
                "d",
            )
            .localCheckpoint(eager=True)
        )
    return (
        state.select(
            F.col("node").alias("part_key"),
            F.col("score").cast("bigint").alias("score"),
            F.col("d").cast("bigint").alias("degree"),
        )
        .orderBy(F.col("score").desc(), "part_key")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Gini concentration of customer spend per nation (all-integer).
# ---------------------------------------------------------------------------
@query(
    "gini_spend_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey, c.c_custkey,
             CAST(SUM(CAST(o.o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT)
               AS cents
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nationkey, cents,
             ROW_NUMBER() OVER (PARTITION BY nationkey
                                ORDER BY cents, c_custkey) AS i
      FROM spend
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           (2.0 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents))
             / (COUNT(*) * CAST(SUM(cents) AS DOUBLE)) AS gini
    FROM ranked JOIN nation n ON ranked.nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def gini_spend_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per nation — the inequality/
    concentration metric (is revenue spread across customers or owned
    by a few whales?) that feeds pricing and risk dashboards.

    Exact by construction: spend is summed in integer CENTS (decimal
    cast, never float addition), the rank-weighted identity
    ``G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))`` uses a
    ROW_NUMBER total order (tie order cannot change the sum — equal
    values swap invariantly), and the single final division is IEEE.
    One shuffle to per-customer spend, one window per nation, one
    aggregate.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"), "c_custkey"
        )
        .agg(
            F.sum(
                (F.col("o_totalprice") * 100).cast("decimal(18,0)")
            ).cast("bigint").alias("cents")
        )
    )
    from ..operators.global_order import grouped_row_number

    # two-phase grouped rank: 25 nation-sized groups would otherwise
    # each funnel into ONE window task at customer grain
    ranked = grouped_row_number(
        spend, ["nationkey"], ["cents", "c_custkey"], out="i"
    )
    return (
        ranked.join(n, ranked.nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            (
                (
                    2.0 * F.sum(F.col("i") * F.col("cents"))
                    - (F.count("*") + 1) * F.sum("cents")
                )
                / (F.count("*") * F.sum("cents").cast("double"))
            ).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# Kendall tau-a between nation-level metrics (pure pair counting).
# ---------------------------------------------------------------------------
@query(
    "kendall_tau_nations",
    oracle="""
    WITH m AS (
      SELECT c.c_nationkey AS nationkey,
             CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_cust,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.n_cust - b.n_cust) * (a.n_orders - b.n_orders) > 0
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.n_cust - b.n_cust) * (a.n_orders - b.n_orders) < 0
                  THEN 1 ELSE 0 END AS disc
      FROM m a JOIN m b ON a.nationkey < b.nationkey
    )
    SELECT CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(SUM(disc) AS BIGINT) AS discordant,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           (SUM(conc) - SUM(disc)) / CAST(COUNT(*) AS DOUBLE) AS tau_a
    FROM pairs
    """,
)
def kendall_tau_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a rank correlation between two nation-level metrics
    (customer count vs order count) — the robust association measure
    that never touches a mean or a variance: pure CONCORDANT-vs-
    DISCORDANT pair counting, so every intermediate is an exact
    integer and the single division at the end is IEEE.

    Scale honesty: pairs are O(groups²) over AGGREGATED rows (25
    nations → 300 pairs), never over raw rows — the correct way to run
    rank correlation at 100 TB is always aggregate-then-correlate.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    m = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.countDistinct("c_custkey").cast("bigint").alias("n_cust"),
            F.count("o_orderkey").cast("bigint").alias("n_orders"),
        )
    )
    a, b = m.alias("a"), m.alias("b")
    prod = (F.col("a.n_cust") - F.col("b.n_cust")) * (
        F.col("a.n_orders") - F.col("b.n_orders")
    )
    pairs = a.join(b, F.col("a.nationkey") < F.col("b.nationkey")).select(
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
    )
    return pairs.agg(
        F.sum("conc").cast("bigint").alias("concordant"),
        F.sum("disc").cast("bigint").alias("discordant"),
        F.count("*").cast("bigint").alias("n_pairs"),
        (
            (F.sum("conc") - F.sum("disc")) / F.count("*").cast("double")
        ).alias("tau_a"),
    )


# ---------------------------------------------------------------------------
# BFS hop distance over the co-purchase graph (unrolled 3 rounds).
# ---------------------------------------------------------------------------
@query(
    "bfs_hop_distance",
    oracle="""
    WITH items_all AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz
        FROM items_all
      ) WHERE bsz <= 64
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    d0 AS (SELECT MIN(l_partkey) AS part FROM lineitem),
    d1 AS (
      SELECT DISTINCT e.dst AS part
      FROM edges e JOIN d0 ON e.src = d0.part
      WHERE e.dst NOT IN (SELECT part FROM d0)
    ),
    d2 AS (
      SELECT DISTINCT e.dst AS part
      FROM edges e JOIN d1 ON e.src = d1.part
      WHERE e.dst NOT IN (SELECT part FROM d0)
        AND e.dst NOT IN (SELECT part FROM d1)
    ),
    d3 AS (
      SELECT DISTINCT e.dst AS part
      FROM edges e JOIN d2 ON e.src = d2.part
      WHERE e.dst NOT IN (SELECT part FROM d0)
        AND e.dst NOT IN (SELECT part FROM d1)
        AND e.dst NOT IN (SELECT part FROM d2)
    ),
    dist AS (
      SELECT part, 0 AS hop FROM d0
      UNION ALL SELECT part, 1 FROM d1
      UNION ALL SELECT part, 2 FROM d2
      UNION ALL SELECT part, 3 FROM d3
    )
    SELECT CAST(hop AS INT) AS hop,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(part) AS BIGINT) AS min_part,
           CAST(MAX(part) AS BIGINT) AS max_part,
           CAST(SUM(part) AS BIGINT) AS sum_part
    FROM dist GROUP BY hop
    """,
)
def bfs_hop_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first hop distance from a seed part over the
    co-purchase graph ("parts bought in the same order"), unrolled to
    3 rounds — the reachability kernel under recommendation radius,
    blast-radius analysis, and "customers also bought" expansion.

    Each BFS round is the distributed frontier-expansion idiom: join
    the frontier against the edge list on the source key, dedupe, then
    LEFT ANTI against the visited set — no driver-side frontier
    materialization, no recursion (Spark has none; the round count is
    the unrolled depth, the same contract as the oracle's chained
    CTEs). The seed is the minimum part key (deterministic, no RNG).
    Output is the per-hop profile (count + min/max/sum of members) —
    the membership fingerprint without a |V|-row result.

    Scale posture: edges shuffle once on the basket key to be born
    (bounded ~21× by TPC-H's ≤7-item baskets, the same dial as
    ``copurchase_part_pairs``); each round is one hash join on src +
    one anti join on part. Frontiers grow toward |V|, never beyond —
    at 100 TB, partition edges by src so every round reuses the same
    partitioning (zero re-shuffle per round after the first).
    """
    li = t(spark, sf_dir, "lineitem")
    # materialize edges ONCE: the unrolled composition otherwise
    # re-derives the pair expansion inside every level (measured: 45
    # lineitem scans in the lazy plan tree; 4.7 → 3.3 s warm at sf0.1
    # with just this cut). Frontiers stay lazy — at depth 3 their
    # recompute is cheaper than eager checkpoints (measured both);
    # deeper unrolls should checkpoint per round like
    # operators/graph.connected_components. Both directions of each
    # distinct co-purchase pair = the a≠b self-join's distinct output.
    und = _basket_pair_counts(li).select("pa", "pb")
    edges = (
        und.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionByName(
            und.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    seed = li.agg(F.min("l_partkey").alias("part"))
    visited = seed.withColumn("hop", F.lit(0))
    frontier = seed
    levels = [visited]
    for hop in (1, 2, 3):
        frontier = (
            edges.join(
                frontier.select(F.col("part").alias("src")), "src"
            )
            .select(F.col("dst").alias("part"))
            .distinct()
            .join(visited.select("part"), "part", "left_anti")
        )
        lvl = frontier.withColumn("hop", F.lit(hop))
        levels.append(lvl)
        visited = visited.unionByName(lvl)
    dist = levels[0]
    for lvl in levels[1:]:
        dist = dist.unionByName(lvl)
    return dist.groupBy(F.col("hop").cast("int").alias("hop")).agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.min("part").cast("bigint").alias("min_part"),
        F.max("part").cast("bigint").alias("max_part"),
        F.sum("part").cast("bigint").alias("sum_part"),
    )


# ---------------------------------------------------------------------------
# Simpson diversity of purchased brands per nation (exact rational).
# ---------------------------------------------------------------------------
@query(
    "simpson_brand_diversity",
    oracle="""
    WITH purchases AS (
      SELECT n.n_name, p.p_brand
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
    ),
    counts AS (
      SELECT n_name, p_brand, CAST(COUNT(*) AS BIGINT) AS c
      FROM purchases GROUP BY n_name, p_brand
    )
    SELECT n_name,
           CAST(SUM(c) AS BIGINT) AS n_items,
           CAST(COUNT(*) AS BIGINT) AS n_brands,
           CAST(SUM(c * (c - 1)) AS BIGINT) AS same_pairs,
           CAST(SUM(c) * (SUM(c) - 1) AS BIGINT) AS all_pairs,
           CAST(SUM(c) * (SUM(c) - 1) - SUM(c * (c - 1)) AS DOUBLE)
             / CAST(SUM(c) * (SUM(c) - 1) AS DOUBLE) AS simpson_diversity
    FROM counts
    GROUP BY n_name
    HAVING SUM(c) >= 2
    """,
)
def simpson_brand_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity index (Simpson 1949, public) of part brands
    purchased per nation: the probability that two distinct purchases
    drawn from a nation's basket are DIFFERENT brands — the
    concentration-vs-breadth dial next to ``gini_spend_concentration``
    (Gini measures inequality of spend, Simpson measures mix purity;
    a curation pipeline runs the same statistic on domain mix per
    shard).

    Exactness: the unbiased finite-population form ``1 − Σc(c−1) /
    (N(N−1))`` is a ratio of exact bigint pair counts; both engines
    compute the identical integers and then ONE IEEE division. The raw
    pair counts are emitted alongside so consumers can aggregate
    further without touching floats (diversities do not average;
    pair counts do).

    Scale posture: a star join (two broadcastable dims, nation and
    part's brand projection), one shuffle to (nation, brand) counts,
    one to nation — sufficient-statistics all the way down.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    p = t(spark, sf_dir, "part")
    purchases = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(p.select("p_partkey", "p_brand"), li.l_partkey == p.p_partkey)
        .select("n_name", "p_brand")
    )
    counts = purchases.groupBy("n_name", "p_brand").agg(
        F.count("*").cast("bigint").alias("c")
    )
    agg = counts.groupBy("n_name").agg(
        F.sum("c").cast("bigint").alias("n_items"),
        F.count("*").cast("bigint").alias("n_brands"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("same_pairs"),
    )
    all_pairs = (F.col("n_items") * (F.col("n_items") - 1)).cast("bigint")
    return agg.filter(F.col("n_items") >= 2).select(
        "n_name",
        "n_items",
        "n_brands",
        "same_pairs",
        all_pairs.alias("all_pairs"),
        (
            (all_pairs - F.col("same_pairs")).cast("double")
            / all_pairs.cast("double")
        ).alias("simpson_diversity"),
    )


# ---------------------------------------------------------------------------
# Association rules: confidence + lift over co-purchase pairs.
# ---------------------------------------------------------------------------
@query(
    "association_rules",
    oracle="""
    WITH items_all AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz
        FROM items_all
      ) WHERE bsz <= 64
    ),
    n_baskets AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM items
    ),
    item_sup AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS sup
      FROM items GROUP BY l_partkey
    ),
    pair_sup AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS sup_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    top_pairs AS (
      SELECT part_a, part_b, sup_ab,
             row_number() OVER (ORDER BY sup_ab DESC, part_a, part_b) AS rn
      FROM pair_sup
    ),
    rules AS (
      SELECT part_a AS antecedent, part_b AS consequent, sup_ab, rn
      FROM top_pairs WHERE rn <= 20
      UNION ALL
      SELECT part_b, part_a, sup_ab, rn FROM top_pairs WHERE rn <= 20
    )
    SELECT r.antecedent, r.consequent, r.sup_ab AS pair_support,
           sa.sup AS antecedent_support, sc.sup AS consequent_support,
           CAST(r.sup_ab AS DOUBLE) / CAST(sa.sup AS DOUBLE) AS confidence,
           CAST(r.sup_ab * nb.nb AS DOUBLE)
             / CAST(sa.sup * sc.sup AS DOUBLE) AS lift
    FROM rules r
    JOIN item_sup sa ON r.antecedent = sa.l_partkey
    JOIN item_sup sc ON r.consequent = sc.l_partkey
    CROSS JOIN n_baskets nb
    """,
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from the top-20 co-purchase pairs: confidence
    ``P(B|A) = sup(A,B)/sup(A)`` and lift ``sup(A,B)·N /
    (sup(A)·sup(B))`` in both rule directions — the scoring half of
    A-priori that turns ``copurchase_part_pairs``'s raw supports into
    "buyers of A are k× likelier than baseline to also buy B".

    Exactness: all three supports and the basket total are exact
    bigint counts; confidence and lift are each ONE IEEE division of
    exact integer products — identical in both engines. Rule rows are
    emitted for BOTH orientations of each undirected pair (confidence
    is directional even when support is not).

    Scale posture: identical pair-generation dial as
    ``copurchase_part_pairs`` (Σ basket_size², baskets ≤ 7 items);
    the item-support and basket-count sides are one groupBy each and
    join back onto 40 rule rows — broadcast-sized by construction.
    """
    li = t(spark, sf_dir, "lineitem")
    arrs = _basket_arrays(li).localCheckpoint(
        eager=False
    )  # basket arrays feed pair supports, item supports AND the count
    n_baskets = arrs.agg(F.count("*").cast("bigint").alias("nb"))
    item_sup = (
        arrs.select(F.explode("arr").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("sup"))
    )
    pair_sup = (
        arrs.select(F.explode(_ordered_pairs(F.col("arr"))).alias("p"))
        .groupBy(
            F.col("p.pa").alias("part_a"), F.col("p.pb").alias("part_b")
        )
        .agg(F.count("*").cast("bigint").alias("sup_ab"))
    )
    top = (
        pair_sup.orderBy(F.col("sup_ab").desc(), "part_a", "part_b")
        .limit(20)
    )
    rules = top.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "sup_ab",
    ).unionByName(
        top.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "sup_ab",
        )
    )
    sa = item_sup.select(
        F.col("l_partkey").alias("antecedent"),
        F.col("sup").alias("antecedent_support"),
    )
    sc = item_sup.select(
        F.col("l_partkey").alias("consequent"),
        F.col("sup").alias("consequent_support"),
    )
    return (
        rules.join(sa, "antecedent")
        .join(sc, "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            F.col("sup_ab").alias("pair_support"),
            "antecedent_support",
            "consequent_support",
            (
                F.col("sup_ab").cast("double")
                / F.col("antecedent_support").cast("double")
            ).alias("confidence"),
            (
                (F.col("sup_ab") * F.col("nb")).cast("double")
                / (
                    F.col("antecedent_support") * F.col("consequent_support")
                ).cast("double")
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# RFM segmentation: recency/frequency/monetary quintile bands.
# ---------------------------------------------------------------------------
@query(
    "rfm_segments",
    oracle="""
    WITH anchor AS (
      SELECT MAX(o_orderdate) AS d1 FROM orders
    ),
    per_cust AS (
      SELECT o_custkey,
             CAST(datediff('day', MAX(o_orderdate),
                           (SELECT d1 FROM anchor)) AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    banded AS (
      SELECT o_custkey,
             CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey)
                  AS INT) AS r_band,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                  AS INT) AS f_band,
             CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
                  AS INT) AS m_band,
             monetary
      FROM per_cust
    )
    SELECT r_band, f_band, m_band,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS segment_value
    FROM banded
    GROUP BY r_band, f_band, m_band
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary), the classic
    customer-value grid: per-customer quintile bands on days since
    last order, order count, and lifetime spend, rolled up to segment
    cells with population and value — band (1,1,1) is "bought
    recently, buys often, spends big".

    Band semantics: NTILE(5) under a TOTAL order (metric + custkey
    tiebreak) so both engines assign identical bands; recency ranks
    ascending (fresher = band 1), frequency and monetary descending
    (bigger = band 1). Money stays DECIMAL through the per-customer
    and segment sums and casts to double only at the output surface.

    Scale posture: per-customer metrics are one groupBy over orders
    (customer-grain — 5 orders of magnitude smaller than lineitem);
    the three NTILEs are two-phase (``operators/global_order``): a
    range shuffle each plus pure integer band arithmetic on the global
    row number — parallel sorts, no single-partition WindowExec.
    """
    o = t(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("d1"))
    per_cust = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("d1"), F.max("o_orderdate"))
            .cast("bigint")
            .alias("recency_days"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(_dec("o_totalprice"))
            .cast("decimal(18,2)")
            .alias("monetary"),
        )
    )
    from ..operators.global_order import global_ntile

    # three two-phase NTILEs — each a range shuffle + integer band
    # arithmetic on the global row number; no single-partition sort
    banded = per_cust
    for out, order in [
        ("r_band", ["recency_days", "o_custkey"]),
        ("f_band", [F.col("frequency").desc(), "o_custkey"]),
        ("m_band", [F.col("monetary").desc(), "o_custkey"]),
    ]:
        banded = global_ntile(banded, order, 5, out=out)
    banded = banded.select(
        "o_custkey", "r_band", "f_band", "m_band", "monetary"
    )
    return banded.groupBy("r_band", "f_band", "m_band").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("monetary").cast("double").alias("segment_value"),
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient per node (exact rational).
# ---------------------------------------------------------------------------
@query(
    "clustering_coefficient",
    oracle="""
    WITH items_all AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz
        FROM items_all
      ) WHERE bsz <= 64
    ),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    sym AS (
      SELECT u, v FROM e UNION ALL SELECT v, u FROM e
    ),
    deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM sym GROUP BY u
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tri_per_node AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
      FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT d.node, d.degree,
           COALESCE(t.n_tri, 0) AS n_triangles,
           CAST(2 * COALESCE(t.n_tri, 0) AS DOUBLE)
             / CAST(d.degree * (d.degree - 1) AS DOUBLE)
             AS clustering_coeff
    FROM deg d LEFT JOIN tri_per_node t ON d.node = t.node
    WHERE d.degree >= 2
    """,
)
def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient (Watts & Strogatz 1998, public) per
    node of the co-purchase graph: ``2·triangles(v) /
    (deg(v)·(deg(v)−1))`` — what share of a part's co-purchase
    neighbors are THEMSELVES co-purchased. Completes the graph-metric
    family (degree → PageRank → triangles → components → BFS →
    clustering): the per-node density dial that separates "hub by
    accident" (low coeff) from "bundle" (high coeff).

    Triangle attribution reuses ``copurchase_triangles``'s oriented
    a<b<c enumeration — each triangle found once, then credited to all
    three corners via a 3-way unpivot (never a second enumeration per
    corner). Degree comes from the symmetrized edge list. The
    coefficient is exact-bigint cross-multiplication down to ONE IEEE
    division; nodes of degree < 2 are excluded (the statistic is
    undefined, not zero, there).

    Scale posture: same support-≥2 edge prune and equi-join triangle
    plan as the census query; the per-node credit is a union of three
    tiny projections of the triangle set, one groupBy. At 100 TB the
    degree-orientation refinement applies unchanged.
    """
    li = t(spark, sf_dir, "lineitem")
    e = (
        _basket_pair_counts(li)
        .filter(F.col("w") >= 2)
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        # five plan references (sym both ways + 3 triangle sides):
        # materialize the pair expansion once (no exchange reuse
        # across lambda-bearing subtrees)
        .localCheckpoint(eager=False)
    )
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("degree")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    tri_per_node = corners.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_tri")
    )
    return (
        deg.join(tri_per_node, "node", "left")
        .filter(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_triangles"),
            (
                (2 * F.coalesce("n_tri", F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double")
            ).alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted median (exact cumulative-weight order statistic).
# ---------------------------------------------------------------------------
@query(
    "weighted_median_price",
    oracle="""
    WITH rows_w AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             CAST(l_quantity AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, price, w,
             SUM(w) OVER (PARTITION BY l_returnflag
                          ORDER BY price, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM rows_w
    ),
    hit AS (
      SELECT l_returnflag, price, cw, tw,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cw) AS rn
      FROM cum WHERE 2 * cw >= tw
    )
    SELECT l_returnflag,
           CAST(tw AS BIGINT) AS total_weight,
           CAST(price AS DOUBLE) AS weighted_median
    FROM hit WHERE rn = 1
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price per return flag: the price
    at which half the shipped QUANTITY (not half the line items) is
    cheaper — the volume-representative "typical price" procurement
    and pricing teams actually want (``percentile_exact`` answers the
    unweighted question).

    Exactness: one cumulative-weight window under a TOTAL order
    (price + line identity tiebreak), then the lower weighted median
    — the first row where ``2·cumweight ≥ totalweight`` — picked as an
    exact integer comparison; never an interpolating percentile. Both
    engines walk the identical order, so the picked row is identical.

    Scale posture: one window pass partitioned by the group key; the
    ``2cw ≥ tw`` filter + min-rank pick avoid any second scan. Skewed
    groups are the same hazard as any per-group window — the key here
    is a 3-value flag, so the production variant subsorts on a salted
    range like the winsorize query documents.
    """
    li = t(spark, sf_dir, "lineitem")
    rows_w = li.select(
        "l_returnflag",
        _dec("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wc = (
        W.partitionBy("l_returnflag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wt = W.partitionBy("l_returnflag")
    cum = rows_w.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    ).filter(2 * F.col("cw") >= F.col("tw"))
    wr = W.partitionBy("l_returnflag").orderBy("cw")
    return (
        cum.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("tw").cast("bigint").alias("total_weight"),
            F.col("price").cast("double").alias("weighted_median"),
        )
    )


# ---------------------------------------------------------------------------
# Business-day latency (Monday-epoch closed form, zero row expansion).
# ---------------------------------------------------------------------------
@query(
    "business_days_delay",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             (5 * ((datediff('day', DATE '1970-01-05', l.l_shipdate)) // 7)
              + least((datediff('day', DATE '1970-01-05', l.l_shipdate)) % 7, 5))
             -
             (5 * ((datediff('day', DATE '1970-01-05', o.o_orderdate)) // 7)
              + least((datediff('day', DATE '1970-01-05', o.o_orderdate)) % 7, 5))
               AS bdays
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(MIN(bdays) AS BIGINT) AS min_bdays,
           CAST(MAX(bdays) AS BIGINT) AS max_bdays,
           CAST(SUM(bdays) AS BIGINT) AS sum_bdays,
           CAST(SUM(bdays) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mean_bdays
    FROM lat GROUP BY priority
    """,
)
def business_days_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency in BUSINESS days per order priority —
    calendar days overstate a 5-day-week SLA by ~40%, so ops
    dashboards measure in weekdays.

    The trick is the Monday-epoch closed form: ``f(d) = 5·(days DIV 7)
    + LEAST(days MOD 7, 5)`` with ``days`` counted from 1970-01-05 (a
    Monday) counts the weekdays in [epoch, d); business days between
    two dates is then ``f(d2) − f(d1)`` — pure integer arithmetic, no
    per-day explode (the naive spine costs a 6× row blowup ON THE FACT
    TABLE, which at 100 TB is the whole game), no weekday CASE ladder.
    Exactness: DIV/MOD/LEAST on exact day counts in both engines; the
    mean is the one IEEE division at the output surface.

    Scale posture: the o_orderkey equi-join is the only shuffle (the
    same join every latency metric pays); the latency math is per-row
    codegen.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")

    def bidx_int(col: str):
        days = F.datediff(F.col(col), F.lit("1970-01-05").cast("date")).cast(
            "bigint"
        )
        return (
            F.lit(5).cast("bigint") * F.expr(
                f"datediff({col}, date'1970-01-05') div 7"
            )
            + F.least(days % 7, F.lit(5).cast("bigint"))
        )

    lat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_orderpriority").alias("priority"),
            (bidx_int("l_shipdate") - bidx_int("o_orderdate")).alias("bdays"),
        )
    )
    return lat.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.min("bdays").cast("bigint").alias("min_bdays"),
        F.max("bdays").cast("bigint").alias("max_bdays"),
        F.sum("bdays").cast("bigint").alias("sum_bdays"),
        (
            F.sum("bdays").cast("double") / F.count("*").cast("double")
        ).alias("mean_bdays"),
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue change contribution by segment.
# ---------------------------------------------------------------------------
@query(
    "revenue_change_contribution",
    oracle="""
    WITH monthly AS (
      SELECT c.c_mktsegment AS segment,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT segment, month, revenue,
             revenue - lag(revenue) OVER (PARTITION BY segment
                                          ORDER BY month) AS delta
      FROM monthly
    ),
    with_total AS (
      SELECT segment, month, revenue, delta,
             SUM(delta) OVER (PARTITION BY month) AS total_delta
      FROM deltas WHERE delta IS NOT NULL
    )
    SELECT segment, month,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(delta AS DOUBLE) AS mom_delta,
           CAST(total_delta AS DOUBLE) AS total_mom_delta,
           CASE WHEN total_delta <> 0
                THEN CAST(delta AS DOUBLE) / CAST(total_delta AS DOUBLE)
           END AS contribution_share
    FROM with_total
    """,
)
def revenue_change_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue-change CONTRIBUTION by market segment:
    each segment's MoM delta and its share of the total MoM delta —
    the "what drove the change" decomposition every revenue review
    starts from (a +2% month hiding one segment +10% and another −8%
    is the case this query exists to expose).

    Exactness: revenue stays DECIMAL through the monthly sums, the
    LAG delta, and the per-month total; shares are one IEEE division
    of the same two decimals-cast-double, NULL (not 0/0) on flat
    months. LAG partitions by segment and orders by month — TPC-H
    order dates populate every month, so lag-1 is the prior calendar
    month in both engines.

    Scale posture: one shuffle to (segment, month) — the star join's
    customer side broadcasts after pruning to two columns — then
    window passes over segment-month grain (|segments|·|months| rows,
    tiny forever).
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    monthly = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.sum(_dec("o_totalprice")).cast("decimal(18,2)").alias("revenue")
        )
    )
    ws = W.partitionBy("segment").orderBy("month")
    deltas = monthly.withColumn(
        "delta", F.col("revenue") - F.lag("revenue").over(ws)
    ).filter(F.col("delta").isNotNull())
    wm = W.partitionBy("month")
    with_total = deltas.withColumn(
        "total_delta", F.sum("delta").over(wm)
    )
    return with_total.select(
        "segment",
        "month",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("delta").cast("double").alias("mom_delta"),
        F.col("total_delta").cast("double").alias("total_mom_delta"),
        F.when(
            F.col("total_delta") != 0,
            F.col("delta").cast("double") / F.col("total_delta").cast("double"),
        ).alias("contribution_share"),
    )


# ---------------------------------------------------------------------------
# Year-over-year customer revenue growth (TPC-DS Q74 family).
# ---------------------------------------------------------------------------
@query(
    "yoy_customer_growth",
    oracle="""
    WITH yearly AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS revenue
      FROM orders GROUP BY 1, 2
    ),
    paired AS (
      SELECT c.o_custkey, c.yr, c.revenue,
             p.revenue AS prev_revenue
      FROM yearly c JOIN yearly p
        ON c.o_custkey = p.o_custkey AND c.yr = p.yr + 1
    )
    SELECT yr,
           CAST(COUNT(*) AS BIGINT) AS n_customers_with_history,
           CAST(SUM(CASE WHEN 10 * revenue > 11 * prev_revenue
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_growers,
           CAST(SUM(CASE WHEN 10 * revenue < 9 * prev_revenue
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_shrinkers,
           CAST(SUM(revenue - prev_revenue) AS DOUBLE) AS total_yoy_delta
    FROM paired GROUP BY yr
    """,
)
def yoy_customer_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer revenue dynamics (the TPC-DS Q74
    shape): per year, how many customers with a prior-year history
    grew >10%, how many shrank >10%, and the aggregate YoY delta —
    the churn-vs-expansion report behind net revenue retention.

    The YoY pairing is a SELF-JOIN on (customer, year = prev_year+1),
    not LAG: a customer who skips a year must compare against nothing,
    which the equi-join encodes structurally (LAG over years would
    silently compare 1995 to 1993). Growth gates are DECIMAL
    cross-multiplications (``10·rev > 11·prev``) — no float ratio, so
    the banding is exact in both engines; the only double is the
    output-surface delta sum.

    Scale posture: one shuffle to (customer, year) — customer-grain —
    then a self-join on the same key (co-partitioned, no extra
    exchange) and a year-grain rollup.
    """
    o = t(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_custkey", F.year("o_orderdate").cast("bigint").alias("yr")
    ).agg(F.sum(_dec("o_totalprice")).cast("decimal(18,2)").alias("revenue"))
    cur = yearly.alias("c")
    prev = yearly.alias("p")
    paired = cur.join(
        prev,
        (F.col("c.o_custkey") == F.col("p.o_custkey"))
        & (F.col("c.yr") == F.col("p.yr") + 1),
    ).select(
        F.col("c.yr").alias("yr"),
        F.col("c.revenue").alias("revenue"),
        F.col("p.revenue").alias("prev_revenue"),
    )
    return paired.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_customers_with_history"),
        F.sum(
            F.when(
                10 * F.col("revenue") > 11 * F.col("prev_revenue"), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_growers"),
        F.sum(
            F.when(
                10 * F.col("revenue") < 9 * F.col("prev_revenue"), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_shrinkers"),
        F.sum(F.col("revenue") - F.col("prev_revenue"))
        .cast("double")
        .alias("total_yoy_delta"),
    )


# ---------------------------------------------------------------------------
# Business-timezone daily rollup (DST-correct day boundaries).
# ---------------------------------------------------------------------------
@query(
    "timezone_daily_rollup",
    oracle="""
    WITH shifted AS (
      SELECT CAST(timezone('America/New_York',
                           timezone('UTC', ts)) AS DATE) AS ny_day,
             CAST(ts AS DATE) AS utc_day,
             event_type
      FROM events
    )
    SELECT ny_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ny_day <> utc_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_day_shifted,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM shifted GROUP BY ny_day
    """,
)
def timezone_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event rollup on BUSINESS-timezone day boundaries
    (America/New_York) with a count of events whose UTC day differs —
    the day-boundary discipline every "daily revenue" number silently
    depends on: a UTC-day rollup splits a US business day across two
    rows, and the gap between UTC-day and local-day totals is exactly
    the `n_day_shifted` column (here: every event between 00:00 and
    05:00 UTC).

    Semantics pin: the event timestamps are stored as UTC instants
    (the session pins ``spark.sql.session.timeZone=UTC``);
    ``from_utc_timestamp(ts, zone)`` and DuckDB's two-step
    ``timezone(zone, timezone('UTC', ts))`` both produce the IANA
    wall-clock time — tzdata rules, DST included — so the day cuts
    agree exactly. January data pins the EST offset; the expression is
    the same one that handles the March DST jump.

    Scale posture: per-row timezone math in codegen, one shuffle to
    the day grain.
    """
    ev = t(spark, sf_dir, "events")
    shifted = ev.select(
        F.from_utc_timestamp("ts", "America/New_York")
        .cast("date")
        .alias("ny_day"),
        F.col("ts").cast("date").alias("utc_day"),
        "event_type",
    )
    return shifted.groupBy("ny_day").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(
            F.when(F.col("ny_day") != F.col("utc_day"), 1).otherwise(0)
        ).cast("bigint").alias("n_day_shifted"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# Frequent 3-itemsets (the A-priori level after pairs).
# ---------------------------------------------------------------------------
@query(
    "frequent_triples",
    oracle="""
    WITH items_all AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz
        FROM items_all
      ) WHERE bsz <= 64
    ),
    triples AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             c.l_partkey AS part_c,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      JOIN items c ON b.l_orderkey = c.l_orderkey
                  AND b.l_partkey < c.l_partkey
      GROUP BY 1, 2, 3
    )
    SELECT part_a, part_b, part_c, support, CAST(rn AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY support DESC,
                                   part_a, part_b, part_c) AS rn
      FROM triples
    ) WHERE rn <= 10
    """,
)
def frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 part TRIPLES most often bought in one order — the
    A-priori level above ``copurchase_part_pairs`` (pairs → triples is
    where bundle detection starts paying: two-item co-occurrence is
    often just popularity; three-way co-occurrence is intent).

    Plan: the ordered three-way self-join on the basket key with
    ``a < b < c`` (each unordered triple exactly once, no /6
    correction); ranking on exact integer support with a full
    lexicographic tiebreak. Scale honesty: triple generation is
    Σ C(basket,3) — bounded 35× per ≤7-item TPC-H basket; real retail
    runs this only over items surviving the pair-support threshold
    (A-priori's antimonotonicity), which this query's contract admits
    as a pre-filter without changing semantics.
    """
    li = t(spark, sf_dir, "lineitem")
    # in-row ordered-triple expansion over each basket's sorted
    # distinct item array — same triple multiset as the a<b<c two-join
    # chain (C(|basket|,3) per basket, bounded by BASKET_CAP), zero
    # joins, map-side partial aggregation on the triple key
    trip = F.flatten(
        F.transform(
            F.col("arr"),
            lambda x, i: F.flatten(
                F.transform(
                    F.slice(F.col("arr"), i + F.lit(2), F.size(F.col("arr"))),
                    lambda y, j: F.transform(
                        F.slice(
                            F.col("arr"),
                            i + j + F.lit(3),
                            F.size(F.col("arr")),
                        ),
                        lambda z: F.struct(
                            x.alias("pa"), y.alias("pb"), z.alias("pc")
                        ),
                    ),
                )
            ),
        )
    )
    triples = (
        _basket_arrays(li)
        .select(F.explode(trip).alias("t"))
        .groupBy(
            F.col("t.pa").alias("part_a"),
            F.col("t.pb").alias("part_b"),
            F.col("t.pc").alias("part_c"),
        )
        .agg(F.count("*").cast("bigint").alias("support"))
    )
    w = W.orderBy(F.col("support").desc(), "part_a", "part_b", "part_c")
    return (
        triples.orderBy(
            F.col("support").desc(), "part_a", "part_b", "part_c"
        )
        .limit(10)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


# ---------------------------------------------------------------------------
# Pareto 80/20 concentration (exact cumulative-share cutoff).
# ---------------------------------------------------------------------------
@query(
    "pareto_revenue_concentration",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
             SUM(cents) OVER () AS total_cents,
             COUNT(*) OVER () AS n_customers
      FROM spend
    ),
    hit AS (
      SELECT rn, n_customers, cum_cents, total_cents,
             row_number() OVER (ORDER BY rn) AS pick
      FROM ranked WHERE 5 * cum_cents >= 4 * total_cents
    )
    SELECT CAST(rn AS BIGINT) AS top_customers_for_80pct,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(rn AS DOUBLE) / CAST(n_customers AS DOUBLE)
             AS customer_share,
           CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
             AS revenue_share_at_cut
    FROM hit WHERE pick = 1
    """,
)
def pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto cut: the smallest top-spender set covering ≥80% of
    revenue — "is this an 80/20 business or an 80/50 one" in one row.
    The cut-point sibling of ``gini_spend_concentration`` (Gini
    summarizes the whole curve; this names the actionable prefix).

    Exactness: spend is exact integer cents; the running total is a
    window cumsum under a TOTAL (spend desc, custkey) order; the cut
    is the first rank where ``5·cum ≥ 4·total`` — an exact integer
    cross-multiplication, so both engines pick the identical row. The
    two shares are output-surface IEEE divisions.

    Scale posture: customer-grain aggregate, then ONE two-phase range
    shuffle for the running spend + rank (``global_cumsum_multi`` — no
    single-partition WindowExec), a broadcast of the two scalar
    totals, and a top-1 TakeOrdered for the cut row. Returns ONE row.
    """
    o = t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        (F.sum(_dec("o_totalprice")) * 100).cast("bigint").alias("cents")
    )
    from ..operators.global_order import global_cumsum_multi

    # two-phase: running spend + row number share one range shuffle
    cum = global_cumsum_multi(
        spend,
        [F.col("cents").desc(), "o_custkey"],
        {"cum_cents": "cents", "rn": F.lit(1)},
    )
    tot = spend.agg(
        F.sum("cents").alias("total_cents"),
        F.count("*").alias("n_customers"),
    )
    ranked = cum.crossJoin(F.broadcast(tot)).filter(
        5 * F.col("cum_cents") >= 4 * F.col("total_cents")
    )
    return (
        ranked.orderBy("rn")
        .limit(1)
        .select(
            F.col("rn").cast("bigint").alias("top_customers_for_80pct"),
            F.col("n_customers").cast("bigint").alias("n_customers"),
            (
                F.col("rn").cast("double")
                / F.col("n_customers").cast("double")
            ).alias("customer_share"),
            (
                F.col("cum_cents").cast("double")
                / F.col("total_cents").cast("double")
            ).alias("revenue_share_at_cut"),
        )
    )


# ---------------------------------------------------------------------------
# Co-purchase degree distribution.
# ---------------------------------------------------------------------------
@query(
    "degree_distribution",
    oracle="""
    WITH items_all AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz
        FROM items_all
      ) WHERE bsz <= 64
    ),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)
      GROUP BY u
    )
    SELECT degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS node_share
    FROM deg GROUP BY degree
    """,
)
def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph: how many parts
    have k co-purchase partners — the first diagnostic read on ANY
    graph the engine builds (a heavy tail here is why the skew-salted
    join and the degree-orientation triangle refinement exist; this
    query MEASURES the tail those mitigations are sized against).

    Exactness: degrees and node counts are exact integers; the share
    is one IEEE division against the window total. Scale posture: the
    same basket-bounded pair generation as the rest of the graph
    family, one groupBy to node degree, one to the distribution —
    output is |distinct degrees| rows.
    """
    li = t(spark, sf_dir, "lineitem")
    e = (
        _basket_pair_counts(li)
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        # two plan references (sym both directions): materialize once
        .localCheckpoint(eager=False)
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("degree")
    )
    wall = W.partitionBy()
    return deg.groupBy("degree").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    ).select(
        "degree",
        "n_nodes",
        (
            F.col("n_nodes").cast("double")
            / F.sum("n_nodes").over(wall).cast("double")
        ).alias("node_share"),
    )


# ---------------------------------------------------------------------------
# Quantile normalization across groups (exact integer rank mapping).
# ---------------------------------------------------------------------------
@query(
    "quantile_normalize_spend",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey, n.n_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY c.c_custkey, n.n_name
    ),
    ranked AS (
      SELECT c_custkey, n_name, cents,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY cents, c_custkey) AS r,
             COUNT(*) OVER (PARTITION BY n_name) AS ng,
             COUNT(*) OVER () AS n_total
      FROM spend
    ),
    gq AS (
      SELECT cents AS g_cents,
             row_number() OVER (ORDER BY cents, c_custkey) AS g_rank
      FROM spend
    )
    SELECT rk.c_custkey, rk.n_name,
           CAST(rk.cents AS BIGINT) AS spend_cents,
           CAST(rk.r AS BIGINT) AS within_rank,
           CAST((rk.r * rk.n_total + rk.ng - 1) // rk.ng AS BIGINT)
             AS target_rank,
           CAST(g.g_cents AS BIGINT) AS normalized_cents
    FROM ranked rk
    JOIN gq g
      ON g.g_rank = (rk.r * rk.n_total + rk.ng - 1) // rk.ng
    """,
)
def quantile_normalize_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of customer spend ACROSS nations: each
    customer's spend is replaced by the value at the same quantile of
    the GLOBAL spend distribution — after it, every nation has an
    identical spend distribution, which is how cross-cohort features
    are made comparable before modeling (the microarray-normalization
    technique, Bolstad et al. 2003, public — the same trick tabular
    feature pipelines use).

    Exactness: the quantile map is pure integer arithmetic — within-
    nation rank r of n_g maps to global rank ``ceil(r·N / n_g)`` (an
    exact DIV), and the normalized value is the global order statistic
    AT that rank, fetched by an equi-join on the rank — no
    interpolation, no float until nothing (all columns integral).

    Scale posture: customer-grain windows (per-nation partitions plus
    one global rank — the documented ``ntile_decile_stats``
    single-partition caveat at customer grain); the rank join is an
    integer equi-join.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "n_name")
        .agg((F.sum(_dec("o_totalprice")) * 100).cast("bigint").alias("cents"))
    )
    from ..operators.global_order import (
        global_row_number,
        grouped_row_number,
    )

    # two-phase ranks: per-nation rank via grouped rebase, global rank
    # via range shuffle — no single-partition or per-nation-funnel sorts
    ranked = (
        grouped_row_number(spend, ["n_name"], ["cents", "c_custkey"], out="r")
        .join(spend.groupBy("n_name").agg(F.count("*").alias("ng")), "n_name")
        .crossJoin(F.broadcast(spend.agg(F.count("*").alias("n_total"))))
    )
    glob = global_row_number(
        spend, ["cents", "c_custkey"], out="g_rank"
    ).select(F.col("cents").alias("g_cents"), "g_rank")
    target = F.expr("(r * n_total + ng - 1) div ng")
    return ranked.withColumn("target_rank", target.cast("bigint")).join(
        glob, F.col("target_rank") == F.col("g_rank")
    ).select(
        "c_custkey",
        "n_name",
        F.col("cents").alias("spend_cents"),
        F.col("r").cast("bigint").alias("within_rank"),
        "target_rank",
        F.col("g_cents").cast("bigint").alias("normalized_cents"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration (exact integer squares).
# ---------------------------------------------------------------------------
@query(
    "hhi_market_concentration",
    oracle="""
    WITH supplier_sales AS (
      SELECT r.r_name, s.s_suppkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, s.s_suppkey
    )
    SELECT r_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(cents) AS BIGINT) AS market_cents,
           CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
             / (CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
             AS hhi,
           (CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
             / CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
             AS effective_n_suppliers
    FROM supplier_sales
    GROUP BY r_name
    """,
)
def hhi_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier concentration per region
    (Σ market-shareᵢ², the antitrust standard) plus its reciprocal,
    the "effective number of suppliers" — completes the concentration
    family: Gini (inequality of the whole curve), Simpson (mix
    purity), Pareto (the actionable prefix), HHI (the regulator's
    number; 0.25+ = highly concentrated).

    Exactness: supplier sales are exact integer cents; ``Σ cᵢ²`` runs
    in DECIMAL(38,0) on Spark and HUGEINT on DuckDB (the same
    rule-28 overflow discipline as ``lineitem_corr_matrix`` — cents²
    passes 2^63 immediately); HHI is one double division of two exact
    integers (the denominator is the double PRODUCT of two exact
    casts, identical in both engines).

    Scale posture: star join with broadcastable dims, one shuffle to
    (region, supplier) — supplier-grain — one to region.
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    sales = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "s_suppkey")
        .agg(
            (F.sum(_dec("l_extendedprice")) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    sq = (F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sq")
    agg = sales.select("r_name", "cents", sq).groupBy("r_name").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("bigint").alias("market_cents"),
        F.sum("sq").alias("sum_sq"),
    )
    tot_d = F.col("market_cents").cast("double")
    return agg.select(
        "r_name",
        "n_suppliers",
        "market_cents",
        (F.col("sum_sq").cast("double") / (tot_d * tot_d)).alias("hhi"),
        ((tot_d * tot_d) / F.col("sum_sq").cast("double")).alias(
            "effective_n_suppliers"
        ),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (fixed-point peeling).
# ---------------------------------------------------------------------------
def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-≥2 co-purchase edge list (u < v), the shared graph the
    triangle/clustering/BFS/PageRank queries build — materialized once
    for the iterative peel."""
    li = t(spark, sf_dir, "lineitem")
    return (
        _basket_pair_counts(li)
        .filter(F.col("w") >= 2)
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .localCheckpoint(eager=True)
    )


def _kcore_edges_small(edges: DataFrame, k: int) -> DataFrame:
    """Single-task peel of a dispatch-certified SMALL (u < v) edge
    list: ship the whole list to one executor task and run the
    degree-prune loop in pandas there. The k-core fixed point is
    unique (Seidman 1983), so the surviving edge SET is identical to
    the iterative Spark peel's — only the physical plan differs (one
    job instead of O(rounds) join+checkpoint+count jobs). Lazily
    checkpointed so a chained peel (core(k+1) from core(k)) and its
    convergence count consume ONE execution."""

    def _peel(batches):
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True)
        while not df.empty:
            deg = pd.concat([df["u"], df["v"]]).value_counts()
            keep = set(deg[deg >= k].index)
            nxt = df[df["u"].isin(keep) & df["v"].isin(keep)]
            if len(nxt) == len(df):
                break
            df = nxt
        if not df.empty:
            yield df

    return (
        edges.repartition(1)
        .mapInPandas(_peel, edges.schema)
        .localCheckpoint(eager=False)
    )


def kcore_edges(edges: DataFrame, k: int) -> DataFrame:
    """The k-core of an undirected (u < v) edge list as its surviving
    EDGE list: the maximal subgraph where every node has degree ≥ k,
    by iterative peeling — drop all nodes of within-subgraph degree
    < k, recompute, repeat to the fixed point (Seidman 1983, public).
    Peeling converges in at most |V| rounds; each round is one degree
    aggregate + one semi join, with the surviving edge list
    localCheckpointed so plan depth stays constant (the
    ``connected_components`` discipline). The fixed point is unique,
    so the result is deterministic regardless of peel order.

    Size dispatch (shared convention with
    ``operators/graph.connected_components``): a small edge list peels
    in ONE single-task pandas pass instead of O(rounds) Spark jobs;
    the threshold is the data-derived ``SMALL_GRAPH_MAX_EDGES`` and
    ``graph.FORCE`` pins a path for tests.
    """
    from ..operators import graph as _G

    cur = edges
    # scale-ok: 1-row count per round, the peel loop's convergence probe
    n_cur = cur.count()
    if _G.FORCE == "small" or (
        _G.FORCE is None and n_cur <= _G.SMALL_GRAPH_MAX_EDGES
    ):
        return _kcore_edges_small(cur, k)
    while True:
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = sym.groupBy(F.col("u").alias("node")).agg(
            F.count("*").alias("d")
        )
        keep = deg.filter(F.col("d") >= k).select("node")
        nxt = (
            cur.join(keep.select(F.col("node").alias("u")), "u", "semi")
            .join(keep.select(F.col("node").alias("v")), "v", "semi")
            .localCheckpoint(eager=True)
        )
        # scale-ok: 1-row count, convergence check of the peel loop
        n_nxt = nxt.count()
        done = n_nxt == n_cur or n_nxt == 0
        cur, n_cur = nxt, n_nxt
        if done:
            break
    return cur


def kcore_members(edges: DataFrame, k: int) -> DataFrame:
    """Distinct member nodes of the k-core (see ``kcore_edges``)."""
    cur = kcore_edges(edges, k)
    return (
        cur.select(F.col("u").alias("node"))
        .unionByName(cur.select(F.col("v").alias("node")))
        .distinct()
    )


#: unrolled peel rounds per k level in the kcore ORACLE (measured
#: fixed points at sf0.01: 4/11/5 rounds for k=2/3/4 — 16 leaves
#: headroom; a regenerated corpus needing more trips the error()
#: convergence assert LOUDLY instead of silently mismatching).
KCORE_UNROLL_ROUNDS = 16


def _kcore_oracle() -> str:
    """The iterative peel unrolled to a bounded CTE chain (the
    ``_pr_oracle`` trick): each round recomputes degrees and keeps
    edges whose BOTH endpoints have degree ≥ k; k levels chain
    (core(k+1) ⊆ core(k)). Every CTE is MATERIALIZED — DuckDB inlines
    plain CTEs per reference, which makes a 48-round chain exponential.
    The summary row self-asserts convergence: a surviving min degree
    < k means the unroll ran out of rounds and raises via error()."""
    ctes = [f"""{_BASKET_ITEMS_SQL},
    g0 AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS n_orders
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
      ) WHERE n_orders >= {PR_MIN_SUPPORT}
    )"""]
    # the shared _BASKET_ITEMS_SQL CTEs must also materialize (they are
    # referenced through the whole chain) — patch the keyword in.
    ctes[0] = ctes[0].replace("items_all AS (", "items_all AS MATERIALIZED (").replace(
        "items AS (", "items AS MATERIALIZED ("
    )
    cur = "g0"
    summaries = []
    for k in (2, 3, 4):
        for r in range(1, KCORE_UNROLL_ROUNDS + 1):
            d, nxt = f"d{k}_{r}", f"g{k}_{r}"
            ctes.append(f"""{d} AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM {cur} UNION ALL SELECT v FROM {cur}
      ) GROUP BY node
    ),
    {nxt} AS MATERIALIZED (
      SELECT c.u, c.v FROM {cur} c
      JOIN {d} a ON c.u = a.node AND a.d >= {k}
      JOIN {d} b ON c.v = b.node AND b.d >= {k}
    )""")
            cur = nxt
        ctes.append(f"""dfin{k} AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM {cur} UNION ALL SELECT v FROM {cur}
      ) GROUP BY node
    )""")
        summaries.append(f"""SELECT CAST({k} AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
           CAST(SUM(d) / 2 AS BIGINT) AS n_core_edges,
           CAST(CASE WHEN COUNT(*) = 0 OR MIN(d) >= {k} THEN MIN(d)
                ELSE error('kcore unroll not converged at k={k}')
                END AS BIGINT) AS min_core_degree
    FROM dfin{k}""")
    return "WITH " + ",\n    ".join(ctes) + "\n" + "\nUNION ALL\n".join(summaries)


@query("kcore_summary", oracle=_kcore_oracle())
def kcore_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core summary of the co-purchase graph for k = 2..4: core
    size, surviving edges, and the minimum within-core degree (≥ k by
    the invariant) — the standard cohesion ladder (the k-core is where
    dense-community mining starts, and the "degeneracy ordering" it
    induces is the classic triangle-enumeration speedup).

    The oracle is the peel UNROLLED to ``KCORE_UNROLL_ROUNDS`` SQL
    rounds per level with a loud convergence assert (``_kcore_oracle``)
    — formerly rows-only; the Spark side keeps the true fixed-point
    loop. Membership and MAXIMALITY are additionally pinned in pytest
    (``tests/test_kcore.py``) against a brute-force DuckDB peel —
    every member has ≥ k in-core neighbors, and no non-member could
    join the fixed point.
    """
    # chained peel: core(k+1) ⊆ core(k), so each level starts from the
    # previous level's surviving edges instead of the full graph
    cur = _copurchase_edges(spark, sf_dir)
    out = None
    for k in (2, 3, 4):
        cur = kcore_edges(cur, k)
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = sym.groupBy("u").agg(F.count("*").alias("d"))
        row = deg.agg(
            F.lit(k).cast("int").alias("k"),
            F.count("*").cast("bigint").alias("n_core_nodes"),
            (F.sum("d") / 2).cast("bigint").alias("n_core_edges"),
            F.min("d").cast("bigint").alias("min_core_degree"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Monthly revenue split: new vs existing customers.
# ---------------------------------------------------------------------------
@query(
    "revenue_new_vs_existing",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(date_trunc('month', MIN(o_orderdate)) AS DATE)
               AS first_month
      FROM orders GROUP BY o_custkey
    ),
    monthly AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             f.first_month,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS revenue
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT month,
           CAST(SUM(CASE WHEN month = first_month THEN revenue
                         ELSE 0 END) AS DOUBLE) AS new_customer_revenue,
           CAST(SUM(CASE WHEN month > first_month THEN revenue
                         ELSE 0 END) AS DOUBLE) AS existing_customer_revenue,
           CAST(SUM(CASE WHEN month = first_month THEN revenue
                         ELSE 0 END) AS DOUBLE)
             / CAST(SUM(revenue) AS DOUBLE) AS new_revenue_share
    FROM monthly GROUP BY month
    """,
)
def revenue_new_vs_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split by NEW (first-purchase month) vs EXISTING
    customers — the acquisition-vs-retention decomposition under every
    net-revenue-retention narrative, and the revenue twin of
    ``new_vs_returning_daily`` (that one counts heads, this one counts
    money; they diverge exactly when new customers spend differently).

    Money stays DECIMAL through the per-(month, cohort-month) rollup
    and the conditional sums; the classification ``month vs
    first_month`` is exact date arithmetic; the share is one IEEE
    division at the output surface.

    Scale posture: customer-grain first-month aggregate
    (broadcastable), one shuffle to (month, first_month) — bounded by
    months² — then a month-grain rollup.
    """
    o = t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias(
            "first_month"
        )
    )
    monthly = (
        o.join(F.broadcast(firsts), "o_custkey")
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            "first_month",
        )
        .agg(
            F.sum(_dec("o_totalprice")).cast("decimal(18,2)").alias("revenue")
        )
    )
    new_rev = F.sum(
        F.when(F.col("month") == F.col("first_month"), F.col("revenue"))
        .otherwise(F.lit(0).cast("decimal(18,2)"))
    )
    old_rev = F.sum(
        F.when(F.col("month") > F.col("first_month"), F.col("revenue"))
        .otherwise(F.lit(0).cast("decimal(18,2)"))
    )
    return monthly.groupBy("month").agg(
        new_rev.cast("double").alias("new_customer_revenue"),
        old_rev.cast("double").alias("existing_customer_revenue"),
        (new_rev.cast("double") / F.sum("revenue").cast("double")).alias(
            "new_revenue_share"
        ),
    )


# ---------------------------------------------------------------------------
# Degree-oriented triangle counting (the 100 TB refinement, verified).
# ---------------------------------------------------------------------------
@query(
    "triangles_degree_oriented",
    oracle=f"""
    WITH {_BASKET_ITEMS_SQL},
    und AS (
      SELECT u, v FROM (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS n_orders
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
      ) WHERE n_orders >= 2
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS dst
      FROM und e
      JOIN deg du ON e.u = du.node
      JOIN deg dv ON e.v = dv.node
    ),
    wedges AS (
      SELECT e1.src, e1.dst AS b, e2.dst AS c
      FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst < e2.dst
    ),
    tri AS (
      SELECT w.src FROM wedges w
      JOIN und e3 ON e3.u = least(w.b, w.c) AND e3.v = greatest(w.b, w.c)
    )
    SELECT CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT MAX(od) FROM
                 (SELECT src, COUNT(*) AS od FROM o GROUP BY src))
                AS BIGINT) AS max_oriented_outdegree
    """,
)
def triangles_degree_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census with DEGREE orientation — the refinement the
    ``copurchase_triangles`` docstring promises for 100 TB, implemented
    and verified: orient every undirected edge from its lower-(degree,
    id) endpoint to the higher one, enumerate wedges only at each
    triangle's LOWEST-ordered vertex, and close them against the
    undirected edge list. The triangle count is identical to the plain
    enumeration (the oracle recomputes it independently under the same
    orientation), but the per-node wedge fan-out is bounded by the
    oriented OUT-degree — O(sqrt(|E|)) for any graph (Chiba–Nishizeki),
    versus the raw degree of the hottest hub in the unoriented join.
    ``max_oriented_outdegree`` is reported so the bound is visible
    data: compare it against the max raw degree in
    ``degree_distribution``.

    Plan: two integer equi-joins for orientation (degree table is
    node-sized), one self-join on src for wedges, one two-column
    equi-join to close — all shuffle-partitioned, no cartesian, and the
    wedge stage's skew is capped by construction.
    """
    und = _copurchase_edges(spark, sf_dir)
    return oriented_triangle_census(und)


def oriented_triangle_census(und: DataFrame) -> DataFrame:
    """Degree-oriented census over an undirected (u < v) edge list —
    see ``triangles_degree_oriented``. Factored so planted-graph tests
    can drive the exact production kernel."""
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (F.col("e1.dst") < F.col("e2.dst")),
    ).select(
        F.least("e1.dst", "e2.dst").alias("u"),
        F.greatest("e1.dst", "e2.dst").alias("v"),
    )
    tri = wedges.join(und, ["u", "v"]).agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    edges = und.agg(F.count("*").cast("bigint").alias("n_edges"))
    nodes = deg.agg(F.count("*").cast("bigint").alias("n_nodes"))
    maxod = (
        o.groupBy("src")
        .agg(F.count("*").alias("od"))
        .agg(F.max("od").cast("bigint").alias("max_oriented_outdegree"))
    )
    return (
        tri.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(nodes))
        .crossJoin(F.broadcast(maxod))
    )
