"""Pure-Python reference Lloyd's — the cross-engine pin for
``operators/kmeans.py``.

``kmeans_fit`` claims EXACT determinism: no RNG, hashed-key init,
IEEE-exact distance folds, and order-independent decimal re-centering.
This module replays the identical op sequence with nothing but
``hashlib`` + ``decimal`` + float arithmetic, so a pytest can assert
the Spark model's centroids are BIT-EQUAL to an independent
implementation (the verification the driver's rows-only gate cannot
provide for an iterative fixed-point algorithm).

Numeric contract replicated step for step:

- init 'hash': the k vectors with the smallest (md5(str(id)), id).
- init 'maxmin': smallest-md5 start, then greedily the vector whose
  min squared-L2 to the chosen set is largest (ties: smaller id).
- distance: left fold of ``acc + d*d`` over components in order —
  subtract / multiply / add are IEEE-exact, so bits match any engine
  evaluating the same sequence.
- assign: argmin over (d2, cluster_id) tuples.
- re-center: each component rounds to decimal(38,18) exactly as
  Spark's double→decimal cast does (shortest-repr string, HALF_UP —
  ``Decimal(repr(x)).quantize(1e-18, ROUND_HALF_UP)``), sums exactly
  in fixed point, rounds ONCE back to double, divides by the count.
- convergence: max centroid shift (same fold) < tol.
- empty clusters keep their previous centroid; k never shrinks.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal, getcontext

getcontext().prec = 60

_Q18 = Decimal("1e-18")


def _sq_l2(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc += d * d
    return acc


def _mean(members: list[list[float]], dim: int) -> list[float]:
    n = len(members)
    out = []
    for pos in range(dim):
        s = sum(
            Decimal(repr(v[pos])).quantize(_Q18, ROUND_HALF_UP) for v in members
        )
        out.append(float(s) / n)
    return out


def _md5(vec_id) -> str:
    return hashlib.md5(str(vec_id).encode()).hexdigest()


def _hash_init(vecs: dict, k: int) -> dict[int, list[float]]:
    order = sorted(vecs, key=lambda i: (_md5(i), i))[:k]
    return {c + 1: list(vecs[i]) for c, i in enumerate(order)}


def _maxmin_init(vecs: dict, k: int) -> dict[int, list[float]]:
    start = min(vecs, key=lambda i: (_md5(i), i))
    chosen = [list(vecs[start])]
    for _ in range(1, k):
        far = max(
            vecs,
            key=lambda i: (min(_sq_l2(vecs[i], c) for c in chosen), -_id_key(i)),
        )
        chosen.append(list(vecs[far]))
    return {c + 1: v for c, v in enumerate(chosen)}


def _id_key(i):
    # max() with ties broken toward the SMALLER id: negate for ints;
    # string ids need a different tiebreak — the pin corpus uses ints.
    return i


def reference_kmeans(
    vecs: dict,
    *,
    k: int,
    max_iterations: int = 10,
    tol: float = 1e-6,
    init: str = "maxmin",
):
    """vecs: {id: [float components]} — floats must already be doubles
    (float32 parquet values widened exactly, as Spark's cast does).
    Returns (centroids: {cluster_id: [float]}, n_members: {cluster_id: int},
    iterations, converged)."""
    if len(vecs) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(vecs)}")
    dim = len(next(iter(vecs.values())))
    if init == "maxmin":
        cents = _maxmin_init(vecs, k)
    elif init == "hash":
        cents = _hash_init(vecs, k)
    else:
        raise ValueError(init)

    def assign(cs):
        out = {}
        for i, v in vecs.items():
            out[i] = min(
                ((_sq_l2(v, c), cid) for cid, c in sorted(cs.items())),
            )[1]
        return out

    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        labels = assign(cents)
        members: dict[int, list] = {cid: [] for cid in cents}
        for i, cid in labels.items():
            members[cid].append(vecs[i])
        new_cents = {}
        shift = None
        for cid, old in cents.items():
            new = _mean(members[cid], dim) if members[cid] else list(old)
            new_cents[cid] = new
            s = _sq_l2(new, old)
            shift = s if shift is None or s > shift else shift
        cents = new_cents
        if shift is not None and shift < tol:
            converged = True
            break

    labels = assign(cents)
    n_members = {cid: 0 for cid in cents}
    for cid in labels.values():
        n_members[cid] += 1
    return cents, n_members, it, converged
