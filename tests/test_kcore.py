"""k-core peeling (queries/olap.kcore_members): exact membership on a
planted graph where peeling must actually remove nodes, plus
brute-force invariants (degree + maximality) on the real corpus graph.
"""

from __future__ import annotations

import duckdb

from flights_data_pipeline_spark.queries.olap import (
    _copurchase_edges,
    kcore_members,
)
from flights_data_pipeline_spark.queries.registry import REGISTRY

from .conftest import SF_DIR


def test_planted_graph_exact_membership(spark):
    """5-clique + pendant path + isolated edge: the 2-core and 3-core
    are exactly the clique (the path and the edge must peel away, and
    peeling the path's tip must cascade to its parent)."""
    clique = [
        (u, v) for u in range(1, 6) for v in range(u + 1, 6)
    ]
    extras = [(5, 6), (6, 7), (8, 9)]
    edges = spark.createDataFrame(clique + extras, "u BIGINT, v BIGINT")
    for k in (2, 3):
        got = sorted(r["node"] for r in kcore_members(edges, k).collect())
        assert got == [1, 2, 3, 4, 5], (k, got)
    assert kcore_members(edges, 5).count() == 0  # clique degree is 4


def test_corpus_invariants_vs_bruteforce(spark):
    """On the real co-purchase graph: members' in-core degree ≥ k, no
    outsider could rejoin (maximality), and membership equals an
    independent Python peel of the same edge list."""
    k = 3
    edges_df = _copurchase_edges(spark, SF_DIR)
    edges = [(r["u"], r["v"]) for r in edges_df.collect()]
    got = sorted(r["node"] for r in kcore_members(edges_df, k).collect())

    # independent peel
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for n in list(alive):
            if len(adj[n] & alive) < k:
                alive.discard(n)
                changed = True
    assert got == sorted(alive)

    core = set(got)
    for n in core:
        assert len(adj[n] & core) >= k
    for n in set(adj) - core:
        assert len(adj[n] & core) < k  # maximality


def test_summary_runs_and_is_monotone(spark):
    rows = {
        r["k"]: r
        for r in REGISTRY["kcore_summary"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {2, 3, 4}
    # higher k -> never larger core; min degree honors the bound
    assert rows[2]["n_core_nodes"] >= rows[3]["n_core_nodes"] >= rows[4][
        "n_core_nodes"
    ]
    for k, r in rows.items():
        if r["n_core_nodes"] > 0:
            assert r["min_core_degree"] >= k
