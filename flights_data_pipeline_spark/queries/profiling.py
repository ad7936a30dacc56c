"""Dataset management queries: deterministic splits + table profiling.

Training-data pipelines need two operations the reference never had
but any 100 TB corpus owner runs daily:

* ``train_test_split`` — a STABLE, engine-independent assignment of
  every document to train/val/test. Random splits are nonreproducible
  and reshuffle when the corpus grows; hashing the primary key is the
  standard fix (a document keeps its split forever, new documents
  land i.i.d.). The hash is md5-hex-digit arithmetic — the engine's
  cross-engine-exact hashing discipline (``queries/dedup.py``
  docstring) — never ``rand()`` and never engine-native hashes.
* ``profile_table`` — per-column null/distinct counts in ONE scan:
  the data-quality snapshot run before/after every load. All metrics
  are exact integers, so the gate pins them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.catalog import load_table as t
from .registry import query

#: split fractions in percent: [0, TRAIN) train, [TRAIN, VAL) val, rest test.
TRAIN_PCT = 80
VAL_PCT = 90


def _hex_val_spark(expr: str, p: int) -> str:
    return f"(instr('0123456789abcdef', substr({expr}, {p + 1}, 1)) - 1)"


def _hex_val_duck(expr: str, p: int) -> str:
    return f"(strpos('0123456789abcdef', substr({expr}, {p + 1}, 1)) - 1)"


def _bucket_sql(hexval, expr: str = "h") -> str:
    """First 4 md5 hex digits → integer in [0, 65536) → percent bucket.

    ``expr`` is the SQL expression holding the md5 hex string (default
    the column ``h``); it is substituted structurally — never rewrite
    the generated SQL with string ``.replace`` afterwards, which
    corrupts the predicate the moment the template gains another
    occurrence of the search text (round-11 ADVICE).
    """
    digits = " + ".join(
        f"{hexval(expr, p)} * {16 ** (3 - p)}" for p in range(4)
    )
    return f"(({digits}) % 100)"


@query(
    "train_test_split",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    )
    SELECT doc_id, lang,
           CAST({_bucket_sql(_hex_val_duck)} AS BIGINT) AS bucket,
           CASE WHEN {_bucket_sql(_hex_val_duck)} < {TRAIN_PCT} THEN 'train'
                WHEN {_bucket_sql(_hex_val_duck)} < {VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM hashed
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by hashed primary key.

    Narrow map over the scan — no shuffle, no RNG state, no seed to
    version. Stratification across any attribute (lang here) holds in
    expectation because the hash is independent of every attribute;
    at 100 TB the same expression assigns a split to a new document
    without touching the rest of the corpus.
    """
    d = t(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    bucket = F.expr(_bucket_sql(_hex_val_spark))
    return hashed.select(
        "doc_id",
        "lang",
        bucket.cast("bigint").alias("bucket"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Data-quality expectations: referential integrity, uniqueness, nullness.
# ---------------------------------------------------------------------------
@query(
    "dq_checks",
    oracle="""
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders_orderkey_unique',
           CAST((SELECT COALESCE(SUM(n - 1), 0) FROM (
                   SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
                 ) WHERE n > 1) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_pk_unique',
           CAST((SELECT COALESCE(SUM(n - 1), 0) FROM (
                   SELECT COUNT(*) AS n FROM lineitem
                   GROUP BY l_orderkey, l_linenumber
                 ) WHERE n > 1) AS BIGINT)
    UNION ALL
    SELECT 'customer_custkey_not_null',
           CAST((SELECT COUNT(*) FROM customer WHERE c_custkey IS NULL)
                AS BIGINT)
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse data-quality expectations in one result set: orphan
    foreign keys (fact rows whose dim key is missing), primary-key
    uniqueness (excess duplicate rows), and key nullness — the checks
    a load pipeline runs between staging and publish (the reference's
    warehouse implies them via its dims→facts FK structure; SURVEY
    §2.12 O4).

    Each check is shaped for scale: orphans are LEFT ANTI joins (the
    dim side broadcast when small, never a collected key list);
    uniqueness is SUM(count-1) over a groupBy — one shuffle on the key,
    partial-aggregated, instead of count(*) - count(distinct) which
    would Expand. All counts are exact integers; a check passes iff
    its violation count is 0, so the one result row set IS the gate
    artifact a runner would assert on.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").cast("bigint").alias("n_violations"),
        )

    def excess_dupes(name: str, df: DataFrame, keys: list[str]) -> DataFrame:
        return (
            df.groupBy(*keys)
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .agg(
                F.lit(name).alias("check_name"),
                F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations"),
            )
        )

    checks = [
        count_row(
            "lineitem_orphan_orderkey",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        count_row(
            "orders_orphan_custkey",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
        ),
        excess_dupes("orders_orderkey_unique", o, ["o_orderkey"]),
        excess_dupes("lineitem_pk_unique", li, ["l_orderkey", "l_linenumber"]),
        count_row("customer_custkey_not_null", c.filter(F.col("c_custkey").isNull())),
    ]
    out = checks[0]
    for extra in checks[1:]:
        out = out.unionAll(extra)
    return out


#: columns profiled by profile_table (orders).
_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]


@query(
    "profile_table",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders
    """
        for c in _PROFILE_COLS
    ),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``orders`` — null and distinct counts.

    ONE scan: all per-column aggregates run in a single pass (Spark
    plans the multi-distinct via Expand), then the wide row unpivots
    to the (column_name, metrics) long format. The UNION-of-scans SQL
    in the oracle is the semantic definition; the Spark plan is the
    efficient one.
    """
    o = t(spark, sf_dir, "orders")
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nulls_{c}")
        )
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"distinct_{c}"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nulls_{c}, distinct_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


# ---------------------------------------------------------------------------
# Pearson correlation with cross-engine-exact moments.
# ---------------------------------------------------------------------------
@query(
    "corr_by_group",
    oracle="""
    WITH sums AS (
      SELECT p_brand,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(p_size) AS DOUBLE) AS sx,
             CAST(SUM(CAST(p_size AS BIGINT) * p_size) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               AS syy,
             CAST(SUM(p_size * CAST(p_retailprice AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxy
      FROM part GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_parts,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             AS corr_size_price
    FROM sums
    """,
)
def corr_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation between part size and retail
    price, computed from EXACT integer/decimal co-moments.

    ``F.corr`` (and DuckDB's ``corr``) accumulate doubles in
    engine-specific orders and algorithms, so their low bits differ
    across engines; here the five sums are exact (bigint / decimal —
    order-independent), cast once to double, and finished with the
    textbook formula — a correctly-rounded IEEE expression on
    identical operands, hence bit-equal results. Single groupBy with
    map-side partials; the finishing arithmetic is per-group O(1).
    """
    p = t(spark, sf_dir, "part")
    price = F.col("p_retailprice").cast("decimal(18,2)")
    size_b = F.col("p_size").cast("bigint")
    sums = p.groupBy("p_brand").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("p_size").cast("double").alias("sx"),
        F.sum(size_b * F.col("p_size")).cast("double").alias("sxx"),
        F.sum(price).cast("double").alias("sy"),
        F.sum(price * price).cast("double").alias("syy"),
        F.sum(F.col("p_size") * price).cast("double").alias("sxy"),
    )
    corr = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_parts"),
        corr.alias("corr_size_price"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit: quasi-identifier group sizes before data release.
# ---------------------------------------------------------------------------
#: minimum group size a quasi-identifier combination must reach.
K_ANON = 5


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             CAST(ts AS DATE) AS event_date,
             CAST(floor(value / 10.0) AS BIGINT) AS value_band,
             user_id
      FROM events
    ),
    g AS (
      SELECT event_type, event_date, value_band,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM q GROUP BY 1, 2, 3
    )
    SELECT event_type, event_date, value_band, n_rows, n_users,
           n_users < {K_ANON} AS violates_k
    FROM g
    WHERE n_users < {K_ANON}
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002, public): every combination of
    quasi-identifiers (event type, event date, coarse value band) must
    cover at least {K_ANON} distinct users, or releasing the grouped
    data re-identifies individuals. Returns the VIOLATING groups — the
    rows a release gate would block or generalize further.

    The privacy complement to ``pii_redaction`` (which scrubs direct
    identifiers; this audits indirect ones). One shuffle: group by the
    quasi-identifier tuple with an exact distinct-user count (the
    distinct is per-group, so the expand stays bounded by group size).
    The value band uses ``floor`` (exact in both engines — STATUS rule
    14: never a raw double→int cast across engines).
    """
    ev = t(spark, sf_dir, "events")
    g = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("event_date"),
            F.floor(F.col("value") / 10.0).cast("bigint").alias("value_band"),
            "user_id",
        )
        .groupBy("event_type", "event_date", "value_band")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )
    return g.filter(F.col("n_users") < K_ANON).withColumn(
        "violates_k", F.col("n_users") < K_ANON
    )


# ---------------------------------------------------------------------------
# Benford first-digit distribution: the fraud/corruption smoke test.
# ---------------------------------------------------------------------------
@query(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders
      WHERE o_totalprice > 0
    )
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) / (SELECT COUNT(*) FROM d) AS observed_freq
    FROM d GROUP BY digit
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals — the
    Benford's-law data-quality probe (public since Newcomb 1881):
    naturally-occurring monetary amounts concentrate on low leading
    digits, and a load whose digit histogram shifts abruptly is
    corrupt (unit mix-up, truncation, synthetic padding) before any
    row-level check can say why.

    Digit extraction routes through ``floor(price * 100)`` — an
    explicit floor because the column is physically DOUBLE and a raw
    double→bigint cast ROUNDS in DuckDB but TRUNCATES in Spark (STATUS
    rule 14); floor is exact and identical in both. The frequency is
    one int/int IEEE division. Two narrow aggregates, one broadcast
    scalar.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit")
    )
    total = d.agg(F.count("*").alias("tot"))
    return (
        d.groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            (F.col("n") / F.col("tot")).alias("observed_freq"),
        )
    )


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov drift statistic between two sources (all-integer).
# ---------------------------------------------------------------------------
@query(
    "ks_drift_statistic",
    oracle="""
    WITH lens AS (
      SELECT source, n_chars FROM documents WHERE source IN ('src0', 'src1')
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
               AS n2
      FROM lens
    ),
    cdf AS (
      SELECT n_chars,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
               OVER (ORDER BY n_chars) AS c1,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
               OVER (ORDER BY n_chars) AS c2
      FROM lens
    ),
    stepped AS (
      SELECT n_chars, MAX(c1) AS c1, MAX(c2) AS c2
      FROM cdf GROUP BY n_chars
    )
    SELECT CAST(MAX(abs(c1 * tot.n2 - c2 * tot.n1)) AS BIGINT) AS d_scaled,
           tot.n1, tot.n2,
           MAX(abs(c1 * tot.n2 - c2 * tot.n1)) / CAST(tot.n1 * tot.n2 AS DOUBLE)
             AS ks_d
    FROM stepped, tot
    GROUP BY tot.n1, tot.n2
    """,
)
def ks_drift_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between two sources'
    document-length distributions — the standard distribution-drift
    alarm a corpus pipeline runs when a new crawl slice arrives
    (`did src1's length profile shift vs src0?`).

    All-integer restatement: D = max |F1 - F2| over the merged support,
    and with counts c1, c2 at each step, |c1/n1 - c2/n2| maximizes
    exactly where |c1*n2 - c2*n1| does — so the argmax and the scaled
    statistic are pure bigint arithmetic; only the final reported
    ``ks_d`` is one IEEE division. Per-value step heights come from a
    running-count window over the union (one sort), then a per-value
    MAX collapses intra-value ordering ambiguity — the empirical CDF
    is right-continuous, so each distinct value carries its inclusive
    cumulative counts. One window sort + one aggregate; at 100 TB this
    runs per (column, slice-pair) on aggregated value counts, not raw
    rows.
    """
    d = t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    ).select("source", "n_chars")
    from pyspark.sql.window import Window as W

    tot = d.agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    from ..operators.global_order import global_cumsum_multi

    # aggregate to per-value step counts FIRST (support-grain, not
    # row-grain), then one two-phase running sum per source over the
    # merged support — no single-partition WindowExec over raw rows
    per_val = d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("a2"),
    )
    stepped = global_cumsum_multi(
        per_val, ["n_chars"], {"c1": "a1", "c2": "a2"}
    ).select("n_chars", "c1", "c2")
    return (
        stepped.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
            .cast("bigint")
            .alias("d_scaled")
        )
        .select(
            "d_scaled",
            "n1",
            "n2",
            (
                F.col("d_scaled") / (F.col("n1") * F.col("n2")).cast("double")
            ).alias("ks_d"),
        )
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) test statistic, integer-scaled ranks.
# ---------------------------------------------------------------------------
@query(
    "mann_whitney_u",
    oracle="""
    WITH s AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('click', 'view')
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2
      FROM s
    ),
    per_val AS (
      SELECT value,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1
      FROM s GROUP BY value
    ),
    ranked AS (
      SELECT value, cnt, c1,
             COALESCE(SUM(cnt) OVER (ORDER BY value
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS below
      FROM per_val
    )
    SELECT CAST(SUM(c1 * (2 * below + cnt + 1)) - tot.n1 * (tot.n1 + 1)
                AS BIGINT) AS u1_scaled,
           tot.n1, tot.n2,
           (SUM(c1 * (2 * below + cnt + 1)) - tot.n1 * (tot.n1 + 1))
             / CAST(2 * tot.n1 * tot.n2 AS DOUBLE) AS auc
    FROM ranked, tot
    GROUP BY tot.n1, tot.n2
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) statistic comparing the
    ``value`` distributions of click vs view events — the
    nonparametric two-sample test an experimentation pipeline runs
    when value distributions are skewed and a t-test's mean is
    meaningless. The normalized ``auc`` IS P(click value > view value)
    (plus half the ties) — the probabilistic-superiority effect size.

    Integer-scaled ranks make it cross-engine exact: with ``below``
    values strictly smaller and ``cnt`` tied at a value, the average
    rank doubled is ``2*below + cnt + 1`` — integer — so
    ``U1_scaled = 2*R1 - n1(n1+1)`` is pure bigint arithmetic; only
    the final ``auc`` is one IEEE division. One groupBy to per-value
    counts, one running-count window over the value support, one
    aggregate — rank computation never materializes per-row ranks.
    """
    from pyspark.sql.window import Window as W

    s = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    ).select("event_type", "value")
    tot = s.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    per_val = s.groupBy("value").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
    )
    from ..operators.global_order import global_cumsum

    # two-phase exclusive running count over the value support
    ranked = global_cumsum(
        per_val, ["value"], "cnt", out="below", inclusive=False
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            (
                F.sum(
                    F.col("c1") * (2 * F.col("below") + F.col("cnt") + 1)
                )
                - F.col("n1") * (F.col("n1") + 1)
            )
            .cast("bigint")
            .alias("u1_scaled")
        )
        .select(
            "u1_scaled",
            "n1",
            "n2",
            (
                F.col("u1_scaled")
                / (2 * F.col("n1") * F.col("n2")).cast("double")
            ).alias("auc"),
        )
    )


# ---------------------------------------------------------------------------
# Pearson correlation matrix over the numeric measures (exact sums).
# ---------------------------------------------------------------------------
#: (column, cent-scale) pairs — money/ rate decimals scale to exact
#: integers so every sufficient statistic is a bigint.
_CORR_COLS = [
    ("l_quantity", 1),
    ("l_extendedprice", 100),
    ("l_discount", 100),
    ("l_tax", 100),
]


def _corr_matrix_oracle() -> str:
    # decimal-first discipline (STATUS rule 14): the doubles hold
    # 2-dp values, so DECIMAL(18,2) is exact and the ×scale lands on
    # an integral decimal — no round(double) anywhere
    scaled = ", ".join(
        f"CAST(CAST({c} AS DECIMAL(18,2)) * {s} AS BIGINT) AS {c}"
        for c, s in _CORR_COLS
    )
    pairs = []
    names = [c for c, _ in _CORR_COLS]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            pairs.append(f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) * SUM({a} * {b}) - SUM({a}) * SUM({b}) AS DOUBLE)
             / (sqrt(CAST(COUNT(*) * SUM({a} * {a})
                          - SUM({a}) * SUM({a}) AS DOUBLE))
                * sqrt(CAST(COUNT(*) * SUM({b} * {b})
                            - SUM({b}) * SUM({b}) AS DOUBLE))) AS pearson_r
    FROM scaled""")
    body = " UNION ALL ".join(pairs)
    return f"WITH scaled AS (SELECT {scaled} FROM lineitem) {body}"


@query("lineitem_corr_matrix", oracle=_corr_matrix_oracle())
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem numeric
    measures (quantity, price, discount, tax) — the screening pass a
    feature-engineering or DQ layer runs to catch collinear columns
    and broken generators (a discount column suddenly correlating
    with quantity is a pipeline bug, not a market insight).

    Exactness: decimals scale to exact integer cents up front, so all
    five sufficient statistics per pair are exact bigint sums computed
    in ONE scan (every pair shares the same aggregate pass — Spark
    plans a single Aggregate over 14 sums, not 6 scans; the oracle's
    UNION-of-scans is the semantic definition); each correlation is
    the identical two-sqrt expression on identical bigints.

    Scale posture: one scan, one 1-row aggregate; the matrix assembly
    is driver-free row literals joined from the single aggregate row
    via an unpivot — no data movement at all beyond the partial-agg
    tree.
    """
    li = t(spark, sf_dir, "lineitem")
    scaled = li.select(
        *[
            (F.col(c).cast("decimal(18,2)") * s).cast("bigint").alias(c)
            for c, s in _CORR_COLS
        ]
    )
    names = [c for c, _ in _CORR_COLS]
    # sums live in DECIMAL(38,0): n·Σ(price²) tops 10²¹ at sf0.1 —
    # past bigint, which wraps silently with ANSI off (measured: NaN
    # correlations). DuckDB promotes the same sums to HUGEINT; both
    # engines then cast the identical exact integer to double.
    dec = "decimal(38,0)"
    aggs = [F.count("*").cast("bigint").alias("n")]
    for c in names:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast(dec)).alias(f"ss_{c}")
        )
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast(dec)).alias(f"sp_{a}_{b}")
            )
    one = scaled.agg(*aggs)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            num = F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(
                f"s_{b}"
            )
            va = F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(
                f"s_{a}"
            )
            vb = F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(
                f"s_{b}"
            )
            rows.append(
                one.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col("n"),
                    (
                        num.cast("double")
                        / (
                            F.sqrt(va.cast("double"))
                            * F.sqrt(vb.cast("double"))
                        )
                    ).alias("pearson_r"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
