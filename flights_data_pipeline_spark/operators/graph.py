"""Iterative graph operators on plain DataFrames.

The dedup family (``queries/dedup.py``, ``queries/similarity.py``)
emits near-duplicate PAIRS; a real dedup pipeline must close those
pairs into clusters and keep one representative per cluster.
That closure is connected components — the one genuinely *iterative*
operator in the engine, implemented as a driver-side loop of
DataFrame joins (the standard Pregel-style min-label propagation;
no GraphX/GraphFrames dependency, nothing non-Spark).

Scale posture: each iteration is one equi-join + one aggregate —
linear shuffles on the edge list. Iteration count is the cluster
DIAMETER, not the corpus size; near-dup clusters are shallow (a
handful of hops), so the loop converges in single-digit rounds even
at 100 TB. ``localCheckpoint`` truncates the growing lineage each
round (the classic iterative-algorithm requirement — without it the
plan doubles every iteration and the optimizer chokes long before
the data does).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    *,
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    MINIMUM node id reachable from it (its component id).

    Returns ``(node, component)`` for every node that appears in at
    least one edge. Min-label propagation: every round each node
    adopts the smallest label among itself and its neighbors; a round
    with zero changes means convergence (guaranteed within the
    largest component's diameter, bounded by ``max_iterations``).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # undirected: propagate both ways; materialize once — the edge
    # lineage (often a whole LSH pipeline) must not re-run per round
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct().localCheckpoint(eager=True)

    labels = (
        e.select("u").distinct().select(F.col("u").alias("node"), F.col("u").alias("component"))
    )
    for _ in range(max_iterations):
        msgs = e.join(labels, e.u == labels.node).select(
            F.col("v").alias("node"), "component"
        )
        new_labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # exhausting the loop without a zero-change round means a
        # component deeper than max_iterations hops still carries
        # mixed labels — callers (e.g. near_dup_clusters) would get
        # wrong component ids silently otherwise
        warnings.warn(
            f"connected_components did not converge within "
            f"{max_iterations} iterations; returned labels may split "
            "components deeper than that. Raise max_iterations.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels
