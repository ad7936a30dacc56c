"""Custom operator tests: as-of join semantics, salted join equivalence."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.operators.joins import asof_join, salted_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "t1"),
            (1, "2024-01-01 10:05:00", "t2"),
            (1, "2024-01-01 09:00:00", "t0"),
            (2, "2024-01-01 10:00:00", "t3"),
            (3, "2024-01-01 10:00:00", "t4"),  # key with no quotes
        ],
        "k INT, ts_s STRING, trade_id STRING",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "trade_id")
    quotes = spark.createDataFrame(
        [
            (1, "2024-01-01 09:30:00", 100.0),
            (1, "2024-01-01 10:00:00", 101.0),  # equal-time row
            (1, "2024-01-01 10:04:00", 102.0),
            (2, "2024-01-01 09:59:59", 200.0),
        ],
        "k INT, ts_s STRING, px DOUBLE",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "px")
    return quotes, trades


def test_asof_inclusive(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, on="k", left_time="ts", right_time="ts", right_values=["px"]
        ).collect()
    }
    assert out == {
        "t0": None,      # before any quote
        "t1": 101.0,     # equal timestamp included
        "t2": 102.0,
        "t3": 200.0,
        "t4": None,      # key never quoted
    }


def test_asof_strict(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades,
            quotes,
            on="k",
            left_time="ts",
            right_time="ts",
            right_values=["px"],
            strict=True,
        ).collect()
    }
    # strict: the 10:00:00 quote is NOT visible to the 10:00:00 trade
    assert out["t1"] == 100.0
    assert out["t2"] == 102.0


def test_asof_null_right_values_do_not_tear(spark):
    """A matched right row with a NULL value column must yield NULL for
    that column — not a stale value carried from an OLDER right row
    (per-column last(ignorenulls) tears rows; the struct carry fixes it).
    """
    trades = spark.createDataFrame(
        [(1, "2024-01-01 10:06:00", "t1")],
        "k INT, ts_s STRING, trade_id STRING",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "trade_id")
    quotes = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100.0, 10.0),
            # newest matching row: bid present, ask NULL
            (1, "2024-01-01 10:05:00", 101.0, None),
        ],
        "k INT, ts_s STRING, bid DOUBLE, ask DOUBLE",
    ).select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "bid", "ask"
    )
    rows = asof_join(
        trades,
        quotes,
        on="k",
        left_time="ts",
        right_time="ts",
        right_values=["bid", "ask"],
    ).collect()
    assert len(rows) == 1
    # both columns from the SAME (newest) right row: ask stays NULL
    assert rows[0].bid == 101.0 and rows[0].ask is None


def test_salted_join_equals_plain(spark, sf_dir):
    from flights_data_pipeline_spark.io.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    o = o.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = Counter(map(tuple, li.join(o, "l_orderkey").collect()))
    salted = Counter(map(tuple, salted_join(li, o, "l_orderkey", n_salts=4).collect()))
    assert plain == salted

    plain_l = Counter(map(tuple, li.join(o, "l_orderkey", "left").collect()))
    salted_l = Counter(
        map(tuple, salted_join(li, o, "l_orderkey", n_salts=4, how="left").collect())
    )
    assert plain_l == salted_l


def test_interval_overlap_join_equals_naive(spark):
    """Binned overlap join == naive inequality join, exactly once per
    pair — including intervals spanning many bins, touching endpoints
    (closed semantics), zero-length intervals, and disjoint keys."""
    from flights_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    # deterministic fixture: ids spread intervals across bin widths
    left = spark.range(120).select(
        (F.col("id") % 5).alias("k"),
        F.col("id").alias("lid"),
        (F.col("id") * 7 % 200).alias("ls"),
        (F.col("id") * 7 % 200 + F.col("id") % 40).alias("le"),
    )
    right = spark.range(150).select(
        (F.col("id") % 5).alias("k"),
        F.col("id").alias("rid"),
        (F.col("id") * 11 % 210).alias("rs"),
        (F.col("id") * 11 % 210 + F.col("id") % 25).alias("re"),
    )
    naive = left.join(right, "k").filter(
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    for bin_width in (1, 16, 1000):  # tiny, typical, one-bin-fits-all
        got = interval_overlap_join(
            left, right, "k", "ls", "le", "rs", "re", bin_width=bin_width
        )
        assert Counter(map(tuple, got.collect())) == Counter(
            map(tuple, naive.collect())
        ), bin_width


def test_salted_join_splits_hot_key_across_partitions(spark):
    """The skew WIN, not just equivalence: one hot key concentrates a
    vanilla shuffle join's work in a single reducer partition; the
    salted path must spread the same rows across ~n_salts partitions
    (a 100 TB flight-count-per-hub join is exactly this shape —
    straggler elimination IS the operator's contract)."""
    n_hot = 40_000
    big = (
        spark.range(n_hot)
        .select(F.lit(1).cast("long").alias("k"), F.col("id").alias("v"))
        .unionAll(
            spark.range(100).select(
                (F.col("id") + 2).alias("k"), F.col("id").alias("v")
            )
        )
    )
    small = spark.range(1, 200).select(F.col("id").alias("k"))

    def max_partition_rows(df):
        dist = df.select(F.spark_partition_id().alias("p")).groupBy("p").count()
        return dist.agg(F.max("count")).first()[0]

    # pin both joins to the shuffle path (the skew scenario: small side
    # too big to broadcast) and keep AQE from coalescing the salted
    # partitions back together — the split is what's under test
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        vanilla_max = max_partition_rows(big.join(small, "k"))
        salted_max = max_partition_rows(
            salted_join(big, small, "k", n_salts=8)
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    # vanilla: every hot-key row lands in ONE reducer
    assert vanilla_max >= n_hot, vanilla_max
    # salted: the hot key is split — no reducer sees more than half
    # (8 salts into 32 shuffle partitions can collide pairwise, so the
    # bound is conservative; uniform hashing lands near n_hot/8)
    assert salted_max <= n_hot // 2, salted_max


def test_salted_join_rejects_right(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError):
        salted_join(trades, quotes, "k", how="right")


def _uf_components(edges):
    """Union-find reference implementation (pure Python)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2)],
        [(1, 2), (2, 3), (3, 4)],                   # chain (diameter > 1)
        [(1, 2), (3, 4), (5, 6), (6, 3)],           # two components
        [(10, 2), (2, 30), (7, 7), (30, 1)],        # self-loop + min not first
        [(i, i + 1) for i in range(1, 12)],         # long chain, many rounds
    ],
)
def test_connected_components_matches_union_find(spark, edges):
    from flights_data_pipeline_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "a_id BIGINT, b_id BIGINT")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


def test_connected_components_warns_when_not_converged(spark):
    """The ITERATIVE path of a graph deeper than max_iterations must
    WARN, not silently return split components (ADVICE round 2). The
    small-graph fast path closes any graph exactly in one pass, so the
    warning contract only applies to the iterative path — force it."""
    import warnings

    from flights_data_pipeline_spark.operators import graph as G

    chain = [(i, i + 1) for i in range(8)]  # diameter 8
    df = spark.createDataFrame(chain, "a_id BIGINT, b_id BIGINT")
    G.FORCE = "iterative"
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            G.connected_components(df, max_iterations=2).collect()
    finally:
        G.FORCE = None
    assert any("did not converge" in str(w.message) for w in caught)


def test_connected_components_paths_bit_equal(spark):
    """The size-dispatched single-task union-find fast path must label
    every node EXACTLY like the iterative min-label loop — bigint and
    string ids, chains, stars, self-loops, singleton edges."""
    from flights_data_pipeline_spark.operators import graph as G

    cases = [
        ([(i, i + 1) for i in range(12)] + [(100, 100), (7, 3)],
         "a_id BIGINT, b_id BIGINT"),
        ([("b", "c"), ("a", "b"), ("x", "y"), ("m", "m"), ("y", "z")],
         "a_id STRING, b_id STRING"),
    ]
    for rows, schema in cases:
        df = spark.createDataFrame(rows, schema)
        G.FORCE = "iterative"
        try:
            it = {tuple(r) for r in G.connected_components(df).collect()}
            G.FORCE = "small"
            sm = {tuple(r) for r in G.connected_components(df).collect()}
        finally:
            G.FORCE = None
        assert it == sm


def test_connected_components_dispatch_is_size_gated(spark):
    """Dispatch is data-derived: a graph whose symmetrized edge count
    exceeds SMALL_GRAPH_MAX_EDGES must take the iterative path (the
    module constant gates it, not core count)."""
    from flights_data_pipeline_spark.operators import graph as G

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "a_id BIGINT, b_id BIGINT"
    )
    old = G.SMALL_GRAPH_MAX_EDGES
    try:
        G.SMALL_GRAPH_MAX_EDGES = 10  # 100 symmetrized edges >> 10
        big = {tuple(r) for r in G.connected_components(df).collect()}
        G.SMALL_GRAPH_MAX_EDGES = old
        small = {tuple(r) for r in G.connected_components(df).collect()}
    finally:
        G.SMALL_GRAPH_MAX_EDGES = old
    assert big == small


def test_connected_components_string_ids(spark):
    """Non-numeric node ids must use the changed-row convergence probe:
    F.sum over strings is NULL under non-ANSI, so the sum-potential
    shortcut would break after round 1 and return wrong components
    (ADVICE round 3)."""
    from flights_data_pipeline_spark.operators.graph import connected_components

    edges = [("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    df = spark.createDataFrame(edges, "a_id STRING, b_id STRING")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {"b": "b", "c": "b", "d": "b", "e": "b", "x": "x", "y": "x"}


def test_adaptive_kmeans_blocks_dial():
    """The semantic-dedup block count must scale with the corpus (any
    fixed k is O(N²/k)-quadratic at scale) and stay pinned at the
    bit-verified k=8/k=16 configuration on the 500-vector corpora."""
    from flights_data_pipeline_spark.queries.similarity import (
        SEMANTIC_K_MAX,
        SEMANTIC_K_MIN,
        SEMANTIC_TARGET_BLOCK,
        adaptive_kmeans_blocks,
    )

    # the fixtures' configuration: 500 vectors → k=8 single, k=16 top-2
    assert adaptive_kmeans_blocks(500) == 8
    assert adaptive_kmeans_blocks(500, assignments_per_vector=2) == 16
    # scales linearly with the corpus …
    assert adaptive_kmeans_blocks(2000) == 32
    for n in (100, 1000, 50_000, 10_000_000):
        k = adaptive_kmeans_blocks(n)
        assert SEMANTIC_K_MIN <= k <= SEMANTIC_K_MAX
        if k < SEMANTIC_K_MAX:  # below the cap: occupancy bounded
            assert n <= k * SEMANTIC_TARGET_BLOCK
            if k > SEMANTIC_K_MIN:  # and k is the SMALLEST such
                assert n > (k - 1) * SEMANTIC_TARGET_BLOCK
    # … and the cap bounds the centroid broadcast
    assert adaptive_kmeans_blocks(10**9) == SEMANTIC_K_MAX


def test_multiblock_semantic_dedup_improves_boundary_recall(spark):
    """Top-2 multi-assignment (semantic_dedup_multiblock) must recover
    strictly more of the brute-force ground-truth duplicate set than
    single-block kmeans dedup — the boundary-miss mode it exists to
    fix — and reach a healthy absolute recall at sf0.001."""
    import numpy as np
    import pyarrow.parquet as pq

    from flights_data_pipeline_spark.queries import REGISTRY
    from flights_data_pipeline_spark.queries.similarity import SEMANTIC_DUP_COSINE

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.sqrt((X * X).sum(1))
    cos = (X @ X.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(ids), 1)
    hit = cos[iu] >= SEMANTIC_DUP_COSINE
    truth = set(ids[iu[0][hit]]) | set(ids[iu[1][hit]])

    def dup_members(name):
        rows = REGISTRY[name].fn(spark, sf).collect()
        groups: dict[int, int] = {}
        for r in rows:
            groups[r.dup_group] = groups.get(r.dup_group, 0) + 1
        return {r.vec_id for r in rows if groups[r.dup_group] >= 2}

    single = dup_members("semantic_cluster_dedup")
    multi = dup_members("semantic_dedup_multiblock")
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    assert recall_multi > recall_single + 0.1, (recall_single, recall_multi)
    assert recall_multi >= 0.75, recall_multi


def test_multiprobe_retrieves_planted_near_dups(spark):
    """The production ANN regime, measured: near-dups live at cosine
    ≥0.9 (the synthetic corpus's organic neighbors sit at ~0.34 — LSH's
    adversarial worst case, which `ann_recall_multiprobe` reports).
    Plant a deterministic cosine-0.92 twin for each query vector and
    require the Hamming≤1 multi-probe to retrieve most of them.

    The twin construction is exact: w = v̂·cosθ + r̂⊥·sinθ (scaled back
    to ‖v‖) for a fixed alternating-sign direction r — no RNG, so the
    measured retrieval rate is a constant of the corpus, not a flaky
    sample. Measured here (sf0.001): 10/10 planted twins are each
    query's exact top-1; 8/10 survive sign-LSH bucketing (the two
    misses flip ≥2 of the 4 plane signs — exactly the miss mode the
    probe budget dials away). BASELINE.md records both regimes."""
    import numpy as np
    import pyarrow.parquet as pq

    from flights_data_pipeline_spark.queries.similarity import (
        N_QUERIES,
        multiprobe_topk,
    )

    sf = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    ids = tbl.column("vec_id").to_pylist()
    X = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    d = X.shape[1]
    from flights_data_pipeline_spark.io.catalog import load_table

    e = load_table(spark, sf, "embeddings").select("vec_id", "embedding")

    target_cos = 0.92
    base = max(ids) + 1000
    r = np.array([(-1.0) ** i for i in range(d)])
    rows = []
    for qid in range(N_QUERIES):
        v = X[qid]
        nv = np.linalg.norm(v)
        vhat = v / nv
        rp = r - (r @ vhat) * vhat
        rhat = rp / np.linalg.norm(rp)
        w = (vhat * target_cos + rhat * np.sqrt(1 - target_cos**2)) * nv
        rows.append((base + qid, [float(x) for x in w]))
    planted = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")

    q, approx_topk, exact_topk = multiprobe_topk(e.unionByName(planted))
    ap = {(r.query_id, r.neighbor_id) for r in approx_topk.collect()}
    ex = {(r.query_id, r.neighbor_id) for r in exact_topk.collect()}

    # construction guarantee: every planted twin is its query's exact
    # nearest neighbor (cosine 0.92 vs organic ~0.34)
    in_exact = sum(1 for qid in range(N_QUERIES) if (qid, base + qid) in ex)
    assert in_exact == N_QUERIES, in_exact
    # the retrieval claim: multi-probe finds the planted twins at a
    # rate far above the adversarial-regime recall
    retrieved = sum(1 for qid in range(N_QUERIES) if (qid, base + qid) in ap)
    assert retrieved >= 0.7 * N_QUERIES, retrieved


def test_hll_sketch_rollup_accuracy_contract(spark, sf_dir):
    """Merged daily sketches must estimate per-type distinct users
    within the query's own 5% contract (exact at these cardinalities)."""
    from flights_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["hll_sketch_rollup"].fn(spark, sf_dir).collect()
    assert rows and all(r.within_5pct for r in rows)
    assert all(r.n_days >= 1 for r in rows)
