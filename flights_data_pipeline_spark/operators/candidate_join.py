"""Size-gated candidate-set joins for the LSH verify kernels.

The near-dup pipeline's verification stage attaches the (id-only)
candidate-pair frame produced by banded LSH to the array-carrying
per-document state (MinHash sets, positional gram tables). At bench
scale the candidate frame is a few hundred rows, and broadcasting it
is the right plan: the array payloads stay on the shuffle side and
only tiny id/count rows cross the driver (the round-2 lesson — never
broadcast the array side). But a FORCED ``F.broadcast(cand)`` is a
scale hazard the round-9 VERDICT flagged: a 100 TB corpus with high
duplicate density makes the candidate set itself GBs, and a forced
broadcast then OOMs the driver instead of degrading to a shuffle.

This module puts the dispatch the global-order operator already has
(``operators/global_order.plan_size_small`` — driver-side Catalyst
estimate, no jobs) in front of every candidate broadcast:

* **small / confidently estimable** → ``payload.join(F.broadcast(cand))``
  — one broadcast, zero shuffles of the payload;
* **large or unknown** → the production plan the dedup docstrings
  describe: LEFT-SEMI filter the payload down to candidate ids first
  (no broadcast hint — AQE converts the semi join to a broadcast at
  runtime if the id list measures small, and keeps a shuffle join if
  not, which degrades instead of OOMing), then a SHUFFLE_HASH equi
  join against the candidate frame. The semi join and the pair join
  hash-partition on the same key, so the filtered payload is not
  re-shuffled between them.

The candidate frame is typically the output of a self-join + groupBy,
whose top-of-plan estimate is join-inflated; ``plan_size_small`` then
falls back to the leaf-scan sum — candidates derived from a ≤64 MB
corpus slice broadcast, anything bigger (or checkpointed, i.e.
unestimatable) takes the shuffle plan. Like the global-order
threshold, 64 MB sits deliberately above the true crossover because
un-analyzed estimates are conservative upward; a misroute inside the
band costs a bounded extra shuffle, never a driver OOM.

``FORCE`` pins a path for tests: equivalence tests run both paths on
the same input; the plan pin asserts the shuffle path contains no
BroadcastExchange of the candidate subtree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .global_order import plan_size_small

#: dispatch override: ``None`` = size-adaptive, ``"broadcast"`` /
#: ``"shuffle"`` force a path.
FORCE: str | None = None

#: candidate frames confidently estimated at or below this broadcast;
#: everything larger or unestimatable takes the semi-filter + shuffle
#: plan. Same calibration posture as ``global_order.NAIVE_MAX_BYTES``.
CAND_BROADCAST_MAX_BYTES = 64 * 1024 * 1024


def use_broadcast(cand: DataFrame, scale_df: DataFrame | None = None) -> bool:
    """Dispatch decision for a candidate frame. Call BEFORE
    ``localCheckpoint`` — a checkpointed plan is an ExistingRDD leaf
    whose stat is the session default, which would always route to
    the shuffle path.

    ``scale_df`` is an optional Generate-free proxy for corpus scale
    (the per-doc signature frame): the LSH candidate plan contains a
    ``stack`` Generate (the band fan-out), which makes the leaf-sum
    fallback refuse to certify it, so on its own it would never
    broadcast. A corpus slice confidently under the threshold keeps
    the candidate frame broadcastable in every non-pathological case
    (the id/count rows are narrower than the documents they index); a
    pathological all-duplicates corpus that blows the pair count up
    quadratically is exactly the case the shuffle path exists for,
    and it is reached the moment the corpus itself outgrows the
    threshold."""
    if FORCE == "broadcast":
        return True
    if FORCE == "shuffle":
        return False
    if plan_size_small(cand, CAND_BROADCAST_MAX_BYTES):
        return True
    return scale_df is not None and plan_size_small(
        scale_df, CAND_BROADCAST_MAX_BYTES
    )


def join_candidates(
    payload: DataFrame,
    cand: DataFrame,
    on: str | list[str],
    *,
    broadcast: bool | None = None,
    scale_df: DataFrame | None = None,
) -> DataFrame:
    """Inner-join ``cand`` (id/count rows, no arrays) into ``payload``
    (the array-carrying side) on ``on``, choosing broadcast vs
    semi-filter + shuffle by the size dispatch.

    ``broadcast`` overrides the decision for callers that must decide
    on a pre-checkpoint plan (pass ``use_broadcast(cand)`` computed
    before the checkpoint)."""
    if broadcast is None:
        broadcast = use_broadcast(cand, scale_df)
    if broadcast:
        return payload.join(F.broadcast(cand), on)
    keys = [on] if isinstance(on, str) else list(on)
    filtered = payload.join(cand.select(*keys).distinct(), keys, "left_semi")
    return filtered.join(cand.hint("shuffle_hash"), keys)


def filter_by_keys(
    payload: DataFrame,
    keys_df: DataFrame,
    on: str | list[str],
    *,
    broadcast: bool | None = None,
) -> DataFrame:
    """Restrict ``payload`` to rows whose ``on`` keys appear in
    ``keys_df`` (a distinct key list), size-gated the same way: small
    key lists broadcast into the semi join, large/unknown ones join
    un-hinted so AQE picks broadcast-vs-shuffle at runtime."""
    if broadcast is None:
        broadcast = use_broadcast(keys_df)
    keys = [on] if isinstance(on, str) else list(on)
    right = keys_df.select(*keys).distinct()
    if broadcast:
        right = F.broadcast(right)
    return payload.join(right, keys, "left_semi")
