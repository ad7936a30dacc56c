"""Size-gated candidate-set joins (round-9 VERDICT task #1).

The LSH verify kernels attach the candidate-pair frame to the
array-carrying per-doc state through ``operators/candidate_join``:
small candidates broadcast, large/unknown ones take the semi-filter +
shuffle plan. These tests pin (a) both physical paths produce
identical results on every affected query, (b) the shuffle path's
plan contains NO BroadcastExchange of the candidate subtree (the
scale guarantee — a dup-dense 100 TB candidate set degrades to a
shuffle instead of OOMing the driver), and (c) the dispatch itself:
bench-scale corpora certify small and broadcast; an unestimatable
(checkpointed) frame without a proxy routes to shuffle.
"""

from __future__ import annotations

import pytest

from flights_data_pipeline_spark.operators import candidate_join as cj
from flights_data_pipeline_spark.queries import REGISTRY

from .conftest import SF_DIR

GATED_QUERIES = [
    "minhash_lsh_candidates",
    "incremental_neardup_ingest",
    "longest_shared_run",
]


@pytest.fixture()
def force_restore():
    yield
    cj.FORCE = None


def _rows(spark, name: str) -> dict:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return {tuple(r) for r in df.collect()}  # scale-ok: sf0.001 equivalence pin


@pytest.mark.parametrize("name", GATED_QUERIES)
def test_both_paths_equal(spark, name, force_restore):
    cj.FORCE = "broadcast"
    via_broadcast = _rows(spark, name)
    cj.FORCE = "shuffle"
    via_shuffle = _rows(spark, name)
    assert via_broadcast, name
    assert via_broadcast == via_shuffle


def test_shuffle_path_has_no_broadcast_of_candidates(spark, force_restore):
    """Under FORCE='shuffle' the plan contains no FORCED broadcast:
    with Catalyst's auto-broadcast disabled (so its own
    cost-justified choices — e.g. BHJ for the band self-join at tiny
    SF — don't mask the pin) the plan must contain ZERO
    BroadcastExchange nodes, and the pair join stays shuffle-side."""
    cj.FORCE = "shuffle"
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["minhash_lsh_candidates"].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastExchange" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_broadcast_path_pins_candidate_broadcast(spark, force_restore):
    cj.FORCE = "broadcast"
    df = REGISTRY["minhash_lsh_candidates"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan, plan


def test_dispatch_decisions(spark):
    from flights_data_pipeline_spark.queries.dedup import (
        _lsh_candidates,
        _minhash_per_doc,
    )

    per_doc = _minhash_per_doc(spark, SF_DIR)
    cand = _lsh_candidates(per_doc)
    # the candidate plan alone contains a stack Generate, so the
    # leaf-sum fallback refuses to certify it ...
    assert not cj.plan_size_small(cand, cj.CAND_BROADCAST_MAX_BYTES)
    # ... the Generate-free corpus proxy certifies it at bench scale
    assert cj.use_broadcast(cand, per_doc)
    # a checkpointed frame is unestimatable: without a proxy it must
    # route to the shuffle path (never risk the driver)
    ckpt = cand.select("a_id", "b_id").localCheckpoint(eager=False)
    assert not cj.use_broadcast(ckpt)
