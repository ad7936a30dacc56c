"""Invariant and plan pins for the round-5 operator batch.

The oracle suite pins these queries' VALUES; these tests pin what the
corpus gate cannot see — algorithmic guarantees on adversarial inputs
(CMS one-sided error, apportionment exactness, systematic-sampling
weight guarantees) and the physical-plan properties the 100 TB posture
depends on (partition pruning reaching the scan).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flights_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Largest-remainder apportionment: pure-Python reference on random inputs.
# ---------------------------------------------------------------------------
def _hamilton(budget: int, masses: dict[str, int]) -> dict[str, int]:
    total = sum(masses.values())
    base = {s: budget * n // total for s, n in masses.items()}
    rem = {s: budget * n % total for s, n in masses.items()}
    leftover = budget - sum(base.values())
    order = sorted(masses, key=lambda s: (-rem[s], s))
    for s in order[:leftover]:
        base[s] += 1
    return base


@given(
    budget=st.integers(1, 10_000),
    masses=st.dictionaries(
        st.sampled_from([f"s{i}" for i in range(8)]),
        st.integers(1, 10_000),
        min_size=1,
    ),
)
@settings(max_examples=200, deadline=None)
def test_hamilton_reference_properties(budget, masses):
    """The reference implementation itself honors the contract the
    Spark query mirrors: allocations sum EXACTLY to the budget and
    each allocation is within 1 of its real-valued quota (the
    largest-remainder guarantee)."""
    alloc = _hamilton(budget, masses)
    assert sum(alloc.values()) == budget
    total = sum(masses.values())
    for s, n in masses.items():
        quota = budget * n / total
        assert quota - 1 < alloc[s] < quota + 1


def test_apportionment_matches_reference_on_corpus(spark):
    """The Spark query equals the pure-Python Hamilton reference on the
    real corpus masses (the oracle pins Spark↔DuckDB; this pins the
    METHOD against an independent restatement)."""
    rows = REGISTRY["token_budget_apportionment"].fn(spark, SF).collect()
    masses = {r["source"]: r["n_toks"] for r in rows}
    from flights_data_pipeline_spark.queries.curation import MIX_BUDGET

    expected = _hamilton(MIX_BUDGET, masses)
    got = {r["source"]: r["alloc"] for r in rows}
    assert got == expected
    assert sum(got.values()) == MIX_BUDGET


# ---------------------------------------------------------------------------
# Weighted systematic sampling: selection-count and certainty guarantees.
# ---------------------------------------------------------------------------
def test_systematic_sample_guarantees(spark):
    from flights_data_pipeline_spark.queries.curation import SYS_SAMPLE_K

    rows = REGISTRY["weighted_systematic_sample"].fn(spark, SF).collect()
    # strata are disjoint and a doc crosses ≥1 of K boundaries → at
    # most K selected, and exactly K whenever no doc spans 2+ strata
    assert 0 < len(rows) <= SYS_SAMPLE_K
    # the systematic guarantee: every document at least one full
    # stratum long is selected with certainty
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    all_toks = dict(
        con.execute(
            "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+'))"
            " FROM documents"
        ).fetchall()
    )
    total = sum(all_toks.values())
    stratum = total / SYS_SAMPLE_K
    picked = {r["doc_id"] for r in rows}
    # certainty guarantee over the WHOLE corpus, not just selected rows:
    # any document spanning a full stratum must appear in the sample
    big = {d for d, n in all_toks.items() if n >= stratum}
    assert big <= picked


# ---------------------------------------------------------------------------
# Count-Min: the one-sided-error guarantee on every probed token.
# ---------------------------------------------------------------------------
def test_countmin_never_undercounts(spark):
    rows = REGISTRY["countmin_token_frequency"].fn(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["never_undercounts"] is True


# ---------------------------------------------------------------------------
# MMR: diversified picks are relevant-pool members, distinct, rank-keyed.
# ---------------------------------------------------------------------------
def test_mmr_selection_invariants(spark):
    from flights_data_pipeline_spark.queries.similarity import MMR_K

    rows = sorted(
        REGISTRY["mmr_diverse_topk"].fn(spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, MMR_K + 1))
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == MMR_K
    # rank-1 is the pure-relevance argmax: no prior similarity term
    assert rows[0]["max_sim_prior"] == 0
    assert rows[0]["mmr_score"] == rows[0]["relevance"]
    # every later score is relevance minus the pinned prior-max
    for r in rows[1:]:
        assert r["mmr_score"] == r["relevance"] - r["max_sim_prior"]


# ---------------------------------------------------------------------------
# Partitioned layout: the status filter must prune at PLANNING time.
# ---------------------------------------------------------------------------
def test_partitioned_roundtrip_prunes_partitions(spark):
    import tempfile

    from pyspark.sql import functions as F

    from flights_data_pipeline_spark.io.catalog import load_table

    o = load_table(spark, SF, "orders")
    land = tempfile.mkdtemp(prefix="fdp_part_pin_") + "/orders"
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(land)
    back = spark.read.parquet(land).filter(F.col("o_orderstatus") != "O")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the status predicate must reach the scan as a PARTITION filter
    # (directory-name pruning), not a data filter (inputFiles() lists
    # pre-pruning, so the plan line is the observable)
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "o_orderstatus" in pf.group(1)
    # and the data/pushed-filter sides must NOT re-check the partition
    # column — pruning happened at the directory level, not in data
    for kind in ("DataFilters", "PushedFilters"):
        m = re.search(kind + r": \[([^\]]*)\]", plan)
        assert m is not None and "o_orderstatus" not in m.group(1)


# ---------------------------------------------------------------------------
# zlib compression ratio: bit-pin vs direct CPython zlib (rows-only query).
# ---------------------------------------------------------------------------
def test_compression_ratio_matches_direct_zlib(spark):
    import zlib

    rows = REGISTRY["compression_ratio_quality"].fn(spark, SF).collect()
    import duckdb

    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    assert len(rows) == len(texts)
    for r in rows:
        raw = texts[r["doc_id"]].encode("utf-8")
        want = len(zlib.compress(raw, 6))
        assert r["n_bytes"] == len(raw)
        assert r["n_compressed"] == want, r["doc_id"]
        assert r["ratio"] == want / len(raw)


# ---------------------------------------------------------------------------
# Corrupt-file tolerance: the ingest posture for a dirty landing zone.
# ---------------------------------------------------------------------------
def test_corrupt_parquet_tolerance(spark, tmp_path):
    """A garbage file in the landing directory fails the strict read
    (data loss must be LOUD by default) and is skipped — with the good
    files' rows intact — under ignoreCorruptFiles (the explicit
    opt-in a 100 TB backfill over a flaky landing zone runs with)."""
    import pytest as _pytest

    from flights_data_pipeline_spark.io.catalog import load_table

    d = str(tmp_path / "land")
    o = load_table(spark, SF, "orders")
    o.coalesce(2).write.mode("overwrite").parquet(d)
    with open(f"{d}/part-corrupt.parquet", "wb") as f:
        f.write(b"this is not a parquet file at all")

    with _pytest.raises(Exception, match="[Cc]orrupt|[Pp]arquet|footer"):
        spark.read.parquet(d).count()

    n = (
        spark.read.option("ignoreCorruptFiles", "true").parquet(d).count()
    )
    assert n == o.count()


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity join: ZERO false negatives vs brute force.
# ---------------------------------------------------------------------------
def test_setsim_prefix_join_is_exact(spark):
    """The whole point of the prefix filter is that it's lossless:
    the join's result set must EQUAL the brute-force all-pairs scan at
    the same threshold (computed independently in DuckDB)."""
    import duckdb

    got = {
        (r["a_id"], r["b_id"]): r["n_common"]
        for r in REGISTRY["setsim_prefix_join"].fn(spark, SF).collect()
    }
    want = {
        (a, b): i
        for a, b, i in duckdb.sql(
            f"""
            WITH d AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     )) AS sh
              FROM (SELECT doc_id,
                           string_split(regexp_replace(lower(trim(text)),
                                                       '\\s+', ' ', 'g'),
                                        ' ') AS toks
                    FROM '{SF}/documents.parquet')
            )
            SELECT a.doc_id, b.doc_id,
                   len(list_intersect(a.sh, b.sh)) AS i
            FROM d a JOIN d b ON a.doc_id < b.doc_id
            WHERE 8 * len(list_intersect(a.sh, b.sh))
                  >= 3 * (len(a.sh) + len(b.sh))
            """
        ).fetchall()
    }
    assert got == want
    assert len(got) > 0  # the corpus does contain near-dups


# ---------------------------------------------------------------------------
# SCD2: versions partition each user's timeline with no gaps/overlaps.
# ---------------------------------------------------------------------------
def test_scd2_intervals_partition_timeline(spark):
    rows = REGISTRY["scd2_user_state_history"].fn(spark, SF).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for u, vs in by_user.items():
        vs.sort(key=lambda r: r["version"])
        assert [v["version"] for v in vs] == list(range(1, len(vs) + 1))
        # exactly one open (current) version, and it is the last one
        assert [v["is_current"] for v in vs] == [False] * (len(vs) - 1) + [True]
        for prev, nxt in zip(vs, vs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]  # seamless
            assert prev["valid_from"] < prev["valid_to"]  # non-empty
            assert prev["state"] != nxt["state"]  # compressed: real change
        assert vs[-1]["valid_to"] is None


# ---------------------------------------------------------------------------
# Integer PageRank: mass bounds and degree consistency.
# ---------------------------------------------------------------------------
def test_pagerank_score_bounds(spark):
    from flights_data_pipeline_spark.queries.olap import PR_SCALE

    rows = REGISTRY["pagerank_copurchase"].fn(spark, SF).collect()
    assert len(rows) == 20
    base = (PR_SCALE * 15) // 100
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # every node keeps the teleport mass; truncating DIVs mean a
        # node can never exceed the total mass of the graph
        assert r["score"] >= base
        assert r["degree"] >= 1
    # the top-20 are hubs: strictly above the teleport floor
    assert scores[0] > base


# ---------------------------------------------------------------------------
# CUSUM: the window closed form equals the textbook recurrence.
# ---------------------------------------------------------------------------
def test_cusum_closed_form_equals_recurrence(spark):
    """S_t = max(0, S_{t-1} + dev_t) computed naively in Python must
    equal the query's window restatement P_t - min(0, min P_j), alarm
    set and scaled values both."""
    import duckdb

    daily = duckdb.sql(
        f"""
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[tuple]] = {}
    for et, day, x in daily:
        series.setdefault(et, []).append((day, x))
    want = {}
    for et, rows in series.items():
        t_sum = sum(x for _, x in rows)
        d_cnt = len(rows)
        s = 0
        for day, x in rows:
            s = max(0, s + (x * d_cnt - t_sum))
            if 2 * s > t_sum:
                want[(et, day)] = s
    got = {
        (r["event_type"], r["day"]): r["cusum_scaled"]
        for r in REGISTRY["cusum_changepoint"].fn(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0


# ---------------------------------------------------------------------------
# Theil-Sen: recovers the true slope exactly under gross outliers.
# ---------------------------------------------------------------------------
def test_theil_sen_robust_to_outliers(spark):
    """A clean slope-2 line with 17% of points corrupted by +1000
    spikes: the majority of pairwise slopes are exactly 2.0, so the
    MEDIAN is exactly 2.0 (least squares would be pulled far off).
    Runs the same median-of-pairwise-slopes construction the registry
    query uses, on a controlled series."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    base = dt.date(2024, 1, 1)
    rows = []
    for d in range(30):
        x = 2 * d + 5
        if d % 7 == 3:  # days 3,10,17,24 — gross spikes
            x += 1000
        rows.append(("s", base + dt.timedelta(days=d), x))
    daily = spark.createDataFrame(rows, "event_type string, day date, x bigint")
    a, b = daily.alias("a"), daily.alias("b")
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
    med = (
        slopes.select(
            "slope",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .first()
    )
    assert med["slope"] == 2.0
    # and the mean of slopes (the non-robust estimate) is pulled well
    # off the true slope (up- and down-going spike pairs partially
    # cancel, but the residual bias is still ~2x the slope itself)
    mean_slope = slopes.agg(F.avg("slope")).first()[0]
    assert abs(mean_slope - 2.0) > 1


# ---------------------------------------------------------------------------
# Mann-Whitney: U equals the brute-force pair count (wins + half-ties).
# ---------------------------------------------------------------------------
def test_mann_whitney_u_equals_pair_count(spark):
    import duckdb

    vals = duckdb.sql(
        f"""SELECT event_type, value FROM '{SF}/events.parquet'
            WHERE event_type IN ('click','view')"""
    ).fetchall()
    clicks = sorted(v for et, v in vals if et == "click")
    views = sorted(v for et, v in vals if et == "view")
    import bisect

    wins = ties = 0
    for c in clicks:
        wins += bisect.bisect_left(views, c)
        ties += bisect.bisect_right(views, c) - bisect.bisect_left(views, c)
    row = REGISTRY["mann_whitney_u"].fn(spark, SF).first()
    assert row["n1"] == len(clicks) and row["n2"] == len(views)
    # U1 = wins + ties/2, scaled by 2 to stay integer
    assert row["u1_scaled"] == 2 * wins + ties


# ---------------------------------------------------------------------------
# KS: the scaled max-gap equals the brute-force CDF comparison.
# ---------------------------------------------------------------------------
def test_ks_statistic_equals_bruteforce(spark):
    import duckdb

    vals = duckdb.sql(
        f"""SELECT source, n_chars FROM '{SF}/documents.parquet'
            WHERE source IN ('src0','src1')"""
    ).fetchall()
    s1 = sorted(v for s, v in vals if s == "src0")
    s2 = sorted(v for s, v in vals if s == "src1")
    import bisect

    support = sorted(set(s1) | set(s2))
    want = max(
        abs(
            bisect.bisect_right(s1, v) * len(s2)
            - bisect.bisect_right(s2, v) * len(s1)
        )
        for v in support
    )
    row = REGISTRY["ks_drift_statistic"].fn(spark, SF).first()
    assert row["n1"] == len(s1) and row["n2"] == len(s2)
    assert row["d_scaled"] == want
    assert row["ks_d"] == want / (len(s1) * len(s2))


def test_position_attribution_conserves_credit(spark):
    """Every attributed conversion carries EXACTLY 1e6 ppm: the summed
    credit across touch types equals 1,000,000 x the number of
    purchases that have at least one view/click touch in their 7-day
    lookback (the largest-remainder middle split must never leak or
    double-count a ppm)."""
    import duckdb

    rows = REGISTRY["position_attribution"].fn(spark, SF).collect()
    total_ppm = sum(r["credit_ppm"] for r in rows)
    n_attributed = duckdb.sql(
        f"""
        WITH p AS (SELECT user_id, event_id, ts FROM '{SF}/events.parquet'
                   WHERE event_type = 'purchase')
        SELECT COUNT(*) FROM p
        WHERE EXISTS (
          SELECT 1 FROM '{SF}/events.parquet' e
          WHERE e.user_id = p.user_id
            AND e.event_type IN ('view', 'click')
            AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 7 DAY
        )
        """
    ).fetchone()[0]
    assert total_ppm == 1_000_000 * n_attributed


def _bdays_closed_form(days_since_monday_epoch: int) -> int:
    """The Monday-epoch closed form under test (business_days_delay)."""
    return 5 * (days_since_monday_epoch // 7) + min(
        days_since_monday_epoch % 7, 5
    )


@given(d1=st.integers(0, 40_000), span=st.integers(0, 5_000))
@settings(max_examples=200, deadline=None)
def test_business_day_closed_form_matches_weekday_loop(d1, span):
    """f(d2) - f(d1) equals literally counting Mon-Fri days in
    [d1, d2) with a weekday loop (day 0 = a Monday), for any pair —
    including negative-modulo-free ranges spanning decades."""
    d2 = d1 + span
    want = sum(1 for d in range(d1, d2) if d % 7 < 5)
    got = _bdays_closed_form(d2) - _bdays_closed_form(d1)
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 1000), st.integers(1, 50)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_lower_weighted_median_rule_properties(rows):
    """The 'first value in sort order with 2*cumw >= total' rule
    (weighted_median_price) picks a TRUE weighted median: strictly
    cheaper rows carry < half the total weight, and the picked value
    plus everything cheaper carries >= half."""
    rows = sorted(rows)
    total = sum(w for _, w in rows)
    cum = 0
    picked = None
    for v, w in rows:
        cum += w
        if 2 * cum >= total:
            picked = v
            break
    assert picked is not None
    below = sum(w for v, w in rows if v < picked)
    at_or_below = sum(w for v, w in rows if v <= picked)
    assert 2 * below < total or (
        # ties: an equal value may sit before the picked row
        any(v == picked for v, _ in rows)
    )
    assert 2 * at_or_below >= total


def test_weighted_median_query_matches_bruteforce(spark):
    """The Spark query equals an independent Python brute force over
    the same parquet (the oracle pins Spark<->DuckDB; this pins the
    METHOD against a from-scratch restatement)."""
    import duckdb
    from decimal import Decimal

    rows = duckdb.sql(
        f"""SELECT l_returnflag,
                   CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
                   CAST(l_quantity AS BIGINT) AS w,
                   l_orderkey, l_linenumber
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    by_flag: dict = {}
    for flag, price, w, ok, ln in rows:
        by_flag.setdefault(flag, []).append((price, ok, ln, w))
    want = {}
    for flag, items in by_flag.items():
        items.sort()
        total = sum(w for *_, w in items)
        cum = 0
        for price, _, _, w in items:
            cum += w
            if 2 * cum >= total:
                want[flag] = (total, float(price))
                break
    got = {
        r["l_returnflag"]: (r["total_weight"], r["weighted_median"])
        for r in REGISTRY["weighted_median_price"].fn(spark, SF).collect()
    }
    assert got == want
