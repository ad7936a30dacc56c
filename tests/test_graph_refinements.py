"""Degree-oriented triangle census: equivalence + the bound it buys.

``triangles_degree_oriented`` claims (a) the oriented enumeration
counts exactly the triangles the plain enumeration counts, and (b) the
wedge fan-out is capped by the oriented out-degree, far below a hub's
raw degree. Both claims are pinned here: (a) against the existing
``copurchase_triangles`` query on the real corpus and against a brute
force on a planted hub graph, (b) by measuring the orientation's
out-degree on the planted hub.
"""

from __future__ import annotations

from itertools import combinations

from flights_data_pipeline_spark.queries import REGISTRY
from flights_data_pipeline_spark.queries.olap import oriented_triangle_census

SF = "/root/testdata/sf0.001"


def test_oriented_count_equals_plain_enumeration(spark):
    plain = REGISTRY["copurchase_triangles"].fn(spark, SF).collect()[0]
    oriented = REGISTRY["triangles_degree_oriented"].fn(spark, SF).collect()[0]
    assert oriented["n_triangles"] == plain["n_triangles"]
    assert oriented["n_edges"] == plain["n_edges"]
    assert oriented["n_nodes"] == plain["n_nodes"]


def test_planted_hub_graph_oriented_census(spark):
    """A hub star (node 0 — degree 40) with a 6-cycle closing path
    through some spokes: brute-force triangle count must match, and
    the hub's oriented out-degree must collapse to ~0 (every hub edge
    points INTO the hub, since spokes have lower degree)."""
    hub_edges = [(0, i) for i in range(1, 41)]
    # triangles through the hub: edges between consecutive spokes 1..6
    ring = [(i, i + 1) for i in range(1, 6)]
    edges = sorted({(min(u, v), max(u, v)) for u, v in hub_edges + ring})

    nodes = sorted({x for e in edges for x in e})
    es = set(edges)
    brute = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )

    und = spark.createDataFrame(edges, "u: bigint, v: bigint")
    row = oriented_triangle_census(und).collect()[0]
    assert row["n_triangles"] == brute == 5
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(nodes)
    # the hub has raw degree 40; orientation points every spoke→hub,
    # so no wedge is ever enumerated AT the hub — out-degree stays
    # bounded by the spoke degrees
    assert row["max_oriented_outdegree"] <= 3


def test_jl_distortion_concentrates_near_one(spark):
    """JL property on real data: with k=16 the per-pair distortion has
    sd ≈ sqrt(2/k) ≈ 0.35, so the 50-pair mean sits near 1 and no pair
    strays past gross bounds — the guarantee that makes the projected
    index usable."""
    import statistics

    from flights_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["jl_projection_distortion"].fn(spark, SF).collect()
    ds = [r["distortion"] for r in rows]
    assert len(ds) == 50
    assert 0.75 < statistics.mean(ds) < 1.25
    assert all(0.1 < d < 3.0 for d in ds), (min(ds), max(ds))
