"""BASKET_CAP: the co-purchase family's per-basket pair bound.

One hot basket with 10^5 distinct items would turn the pair self-join
into a 10^10-row stage at 100 TB scale; ``olap.BASKET_CAP`` drops such
baskets before the quadratic step, the same way ``dedup.NGRAM_DF_CAP``
caps shingle document frequency. These tests pin (a) that every capped
oracle carries the same literal bound (lockstep with the constant),
and (b) that a planted pathological basket is actually excluded while
normal baskets pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flights_data_pipeline_spark.queries import REGISTRY
from flights_data_pipeline_spark.queries.olap import BASKET_CAP, _basket_items

CAPPED_QUERIES = [
    "copurchase_part_pairs",
    "copurchase_triangles",
    "pagerank_copurchase",
    "bfs_hop_distance",
    "association_rules",
    "clustering_coefficient",
    "frequent_triples",
    "degree_distribution",
]


def test_every_capped_oracle_carries_the_bound():
    """The oracle SQL holds the cap as a literal; if BASKET_CAP moves
    without the oracles, results diverge silently — this is the
    lockstep guard."""
    for name in CAPPED_QUERIES:
        oracle = REGISTRY[name].oracle
        assert oracle is not None, name
        assert f"bsz <= {BASKET_CAP}" in oracle, (
            f"{name}: oracle bound out of lockstep with BASKET_CAP"
        )


def test_hot_basket_is_dropped_before_the_pair_join(spark):
    """A planted basket with BASKET_CAP+1 distinct items contributes
    ZERO rows to the capped item set; normal baskets are untouched.
    The pair stage over the capped set is therefore bounded at
    C(BASKET_CAP, 2) rows per basket by construction."""
    hot = [(999, p) for p in range(BASKET_CAP + 1)]
    normal = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 13)]
    li = spark.createDataFrame(
        hot + normal, "l_orderkey: bigint, l_partkey: bigint"
    )
    items = _basket_items(li)
    got = {(r.l_orderkey, r.l_partkey) for r in items.collect()}
    assert got == set(normal)

    # and the pair join over the capped set stays tiny: C(3,2)+C(2,2)
    a, b = items.alias("a"), items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    assert pairs.count() == 3 + 1


def test_cap_admits_boundary_basket(spark):
    """A basket with exactly BASKET_CAP items is ADMITTED (<=, not <) —
    off-by-one here would silently drop legitimate baskets."""
    rows = [(7, p) for p in range(BASKET_CAP)]
    li = spark.createDataFrame(rows, "l_orderkey: bigint, l_partkey: bigint")
    assert _basket_items(li).count() == BASKET_CAP
