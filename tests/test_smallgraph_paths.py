"""Size-dispatched single-task fast paths (round-12 optimization):
the kcore peel and the fixed-point PageRank must produce BIT-IDENTICAL
results on both dispatch paths — the small path is a physical-plan
change only. ``operators.graph.FORCE`` pins the path, exactly like the
candidate-join FORCE pins in test_candidate_join."""

from __future__ import annotations

import pytest

from flights_data_pipeline_spark.operators import graph as G
from flights_data_pipeline_spark.queries.registry import REGISTRY

from .conftest import SF_DIR


@pytest.fixture
def force_reset():
    yield
    G.FORCE = None


@pytest.mark.parametrize("name", ["pagerank_copurchase", "kcore_summary"])
def test_small_and_iterative_paths_bit_equal(spark, force_reset, name):
    fn = REGISTRY[name].fn
    G.FORCE = "iterative"
    it = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    G.FORCE = "small"
    sm = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    assert it == sm and len(it) > 0


def test_kcore_small_path_planted_peel_cascade(spark, force_reset):
    """The pendant path must peel away and cascade on the small path
    exactly as on the iterative peel (same planted graph as
    test_kcore's exact-membership case)."""
    from flights_data_pipeline_spark.queries.olap import kcore_members

    clique = [(u, v) for u in range(1, 6) for v in range(u + 1, 6)]
    extras = [(5, 6), (6, 7), (8, 9)]
    edges = spark.createDataFrame(clique + extras, "u BIGINT, v BIGINT")
    for force in ("small", "iterative"):
        G.FORCE = force
        for k in (2, 3):
            got = sorted(r["node"] for r in kcore_members(edges, k).collect())
            assert got == [1, 2, 3, 4, 5], (force, k, got)
