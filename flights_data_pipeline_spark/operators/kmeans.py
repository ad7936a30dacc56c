"""Distributed Lloyd's k-means on a DataFrame vector column.

The IVF index (``queries/similarity.ann_ivf_probe``) coarse-quantizes
with a deterministic uniform SAMPLE of vectors as centroids; k-means
refinement is what a production IVF build runs instead — it adapts the
list boundaries to the corpus so posting lists balance and probes
concentrate recall where the data is. This module is that fitting
stage, as the engine's second iterative operator (beside
``operators.graph.connected_components``), with the same
driver-loop + ``localCheckpoint`` discipline.

Plan per iteration (the classic map-reduce k-means):

1. assign: broadcast the k centroids, argmin squared-L2 per vector —
   a narrow map over the corpus, no shuffle;
2. re-center: ``posexplode`` the assigned vectors and aggregate
   per (cluster, dimension) — the ONE shuffle, and its key space is
   k·d (tiny), so map-side partial aggregation collapses nearly all
   of it before the exchange;
3. convergence: max centroid shift, one k-row driver collect.

Determinism: init picks the k vectors with the smallest md5(key) —
the same hashed-key sampling discipline as ``train_test_split`` — and
every reduction is over doubles in keyed aggregates; ties in argmin
break on cluster id. No RNG anywhere, so a re-run reproduces the
exact same model.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance as a strict fold over zipped components.

    Explicit multiply, not ``** 2``: IEEE 754 defines subtract,
    multiply and add exactly, so the left fold is bit-reproducible by
    any engine that evaluates the same op sequence (the pure-Python
    reference in ``tests/kmeans_reference.py`` pins this); ``pow`` is
    only specified to 1 ulp on the JVM."""
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.aggregate(
        F.zip_with(diff, diff, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@dataclass
class KMeansModel:
    centroids: DataFrame  #: (cluster_id int, centroid array<double>, n_members bigint)
    iterations: int
    converged: bool
    inertia: float  #: final within-cluster sum of squared distances
    #: final per-row assignment (id, cluster_id, sq_dist), checkpointed —
    #: present only when ``kmeans_fit(keep_assignments=True)``; consumers
    #: (IVF build, cluster-blocked dedup) read it instead of re-running a
    #: corpus assignment pass. ``id`` carries the caller's ``id_col`` name.
    assignments: DataFrame | None = None


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """vec rows + their nearest cluster_id (+ that distance).

    The k centroids collapse to ONE row holding array<struct<cid, c>>
    that broadcasts into a nested-loop join (a per-executor pointer,
    no corpus movement); the argmin then runs as ``array_min`` over
    per-centroid distance structs — a NARROW map over the corpus with
    zero shuffle per Lloyd round. The earlier crossJoin + groupBy(id)
    min_by shape re-shuffled the whole corpus every iteration; and
    embedding the centroids as plan literals instead would regenerate
    (and re-JIT) the codegen each round because the literal values
    change — the broadcast column keeps one stable compiled kernel.

    ``array_min`` on struct<d2, cid> orders lexicographically —
    exactly the (distance, cluster_id) tie-break the pure-Python
    reference pins — and each ``_sq_l2`` evaluates once, inside the
    transform (higher-order lambdas get no CSE, so the distance must
    not be re-derived in a separate comparison).
    """
    carr = cents.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("cluster_id").cast("int").alias("cid"),
                    F.col("centroid").alias("c"),
                )
            )
        ).alias("cents_arr")
    )
    best = F.array_min(
        F.transform(
            F.col("cents_arr"),
            lambda s: F.struct(
                _sq_l2(F.col("vec"), s["c"]).alias("d2"),
                s["cid"].alias("cid"),
            ),
        )
    )
    return vecs.crossJoin(F.broadcast(carr)).select(
        "id",
        "vec",
        best["cid"].alias("cluster_id"),
        best["d2"].alias("d2"),
    )


def _maxmin_init(vecs: DataFrame, k: int) -> DataFrame:
    """Deterministic farthest-point init: start from the smallest-md5
    vector, then greedily add the vector farthest from its nearest
    already-chosen centroid (ties on id). k-1 narrow passes over the
    corpus — affordable for the moderate k this operator targets; for
    large k use ``_maxmin_init_sampled`` (pass ``init_sample=`` to
    ``kmeans_fit``), which runs the same greedy on the md5-prefix
    sample of the corpus instead of scanning it k-1 times."""
    spark = vecs.sparkSession
    first = (
        vecs.select("id", "vec", F.md5(F.col("id").cast("string")).alias("h"))
        .orderBy("h", "id")
        .first()
    )
    chosen = [first.vec]
    for _ in range(1, k):
        cdf = F.broadcast(
            spark.createDataFrame(
                [(c,) for c in chosen], "centroid ARRAY<DOUBLE>"
            )
        )
        far = (
            # scale-ok: cdf is broadcast at creation (<= k sampled centroid rows)
            vecs.crossJoin(cdf)
            .select("id", "vec", _sq_l2(F.col("vec"), F.col("centroid")).alias("d2"))
            .groupBy("id")
            .agg(F.min("d2").alias("mind2"), F.first("vec").alias("vec"))
            .orderBy(F.col("mind2").desc(), "id")
            .first()
        )
        chosen.append(far.vec)
    return spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(chosen)],
        "cluster_id INT, centroid ARRAY<DOUBLE>",
    )


def _sq_l2_py(a: list, b: list) -> float:
    """Strict left fold of ``acc + d*d`` — the exact op sequence of the
    distributed ``_sq_l2`` (and of ``tests/kmeans_reference.py``), so
    distances computed here are bit-equal to the cluster's."""
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc += d * d
    return acc


def _maxmin_init_sampled(vecs: DataFrame, k: int, sample_size: int) -> DataFrame:
    """Farthest-point init on the md5-prefix sample of the corpus.

    The full ``_maxmin_init`` runs k-1 sequential corpus scans — fine
    for moderate k, quadratic pain for IVF-scale k. This variant takes
    the ``sample_size`` rows with the smallest (md5(id), id) — the same
    hashed-key sampling discipline as ``train_test_split``, so the
    sample is deterministic and unbiased by storage order — and runs
    the greedy sweep driver-side over that bounded set with an
    incrementally-maintained min-distance array: O(sample·k·d) float
    ops total and ONE Spark job, versus k-1 full-corpus jobs.

    ``sample_size`` bounds driver memory by construction (the caller
    picks it to fit; MLlib's k-means|| finalizes driver-side the same
    way). Distances use the identical strict fold as the distributed
    path, and ties break identically ((max mind2, then smaller id);
    start = smallest (md5, id)), so when the sample covers the whole
    corpus the chosen centroids are BIT-EQUAL to ``_maxmin_init``'s —
    pinned by test."""
    spark = vecs.sparkSession
    sample = (
        vecs.select("id", "vec", F.md5(F.col("id").cast("string")).alias("h"))
        .orderBy("h", "id")
        .limit(sample_size)
        .select("id", "vec")
        # scale-ok: bounded by limit(sample_size) — init sample, not the corpus
        .collect()
    )
    if len(sample) < k:
        raise ValueError(
            f"kmeans_fit: init_sample yielded {len(sample)} vectors but k={k}; "
            "raise init_sample (it must be >= k)"
        )
    pts = [(r.id, list(r.vec)) for r in sample]
    chosen = [pts[0][1]]
    mind2 = {pid: _sq_l2_py(v, chosen[0]) for pid, v in pts}
    for _ in range(1, k):
        best_id, best_v, best_d = None, None, None
        for pid, v in pts:
            d = mind2[pid]
            if (
                best_d is None
                or d > best_d
                or (d == best_d and pid < best_id)
            ):
                best_id, best_v, best_d = pid, v, d
        chosen.append(best_v)
        for pid, v in pts:
            d = _sq_l2_py(v, best_v)
            if d < mind2[pid]:
                mind2[pid] = d
    return spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(chosen)],
        "cluster_id INT, centroid ARRAY<DOUBLE>",
    )


def kmeans_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    max_iterations: int = 10,
    tol: float = 1e-6,
    init: str = "maxmin",
    init_sample: int | None = None,
    keep_assignments: bool = False,
    expect_convergence: bool = True,
) -> KMeansModel:
    """Fit k-means on ``df[vec_col]`` (array of numeric) with Lloyd's
    algorithm; returns the centroid table plus fit diagnostics.

    ``tol`` is the convergence threshold on the maximum squared
    centroid shift between rounds. Iterations are bounded by
    ``max_iterations``; like ``connected_components``, running out
    without converging warns rather than silently returning — the
    model is still usable (inertia is monotone non-increasing under
    Lloyd's), just not at a fixed point. Callers that fit a FIXED
    number of rounds on purpose (deterministic quantizers: a fixed
    iterate is reproducible where "until converged" depends on tol
    and data drift) pass ``expect_convergence=False`` to state that
    intent and silence the warning.

    ``init``: ``"maxmin"`` (default) = deterministic farthest-point —
    k-1 extra passes, but it separates well-separated clusters (hash
    init can seed two centroids in one cluster and Lloyd's never
    escapes that local optimum); ``"hash"`` = the k smallest-md5(id)
    vectors — one pass, the right choice when k is huge and the data
    has no hard cluster structure to miss.

    ``init_sample`` (maxmin only): run the farthest-point greedy on the
    ``init_sample`` smallest-md5(id) vectors instead of the full corpus
    — one Spark job instead of k-1 sequential scans; the default large-k
    route. ``init_sample >= corpus`` reproduces the full maxmin choice
    bit-exactly.

    ``keep_assignments=True`` checkpoints the final per-row assignment
    and exposes it as ``model.assignments`` — the diagnostics pass
    computes it anyway, so retaining it is free, and every downstream
    consumer (IVF posting-list build, cluster-blocked dedup) then skips
    a whole extra corpus assignment pass. At 100 TB this trades
    executor-local storage for a full corpus scan — the same bargain an
    IVF build makes when it materializes its posting lists.
    """
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    ).localCheckpoint(eager=True)

    # the documented invariant is "k never silently shrinks" — a corpus
    # with fewer than k vectors cannot honor it (hash init would trim
    # via limit(k); maxmin would crash opaquely on an empty input)
    n_rows = vecs.count()
    if n_rows < k:
        raise ValueError(
            f"kmeans_fit: k={k} but the input has only {n_rows} vectors; "
            "k must not exceed the corpus size"
        )

    if init_sample is not None and init != "maxmin":
        raise ValueError("init_sample only applies to init='maxmin'")
    if init == "maxmin":
        if init_sample is not None:
            cents = _maxmin_init_sampled(vecs, k, init_sample).localCheckpoint(
                eager=True
            )
        else:
            cents = _maxmin_init(vecs, k).localCheckpoint(eager=True)
    elif init == "hash":
        # row_number over an unpartitioned window is fine on k rows
        cents = (
            vecs.select("id", "vec", F.md5(F.col("id").cast("string")).alias("h"))
            .orderBy("h", "id")
            .limit(k)
            .withColumn("cluster_id", F.row_number().over(W.orderBy("h", "id")))
            .select("cluster_id", F.col("vec").alias("centroid"))
            .localCheckpoint(eager=True)
        )
    else:
        raise ValueError(f"unknown init: {init!r} (use 'maxmin' or 'hash')")

    converged = False
    it = 0
    assigned = None
    for it in range(1, max_iterations + 1):
        assigned = _assign(vecs, cents)
        # re-center: per (cluster, dim) mean — k·d keys, partials collapse.
        # (A measured alternative — ONE groupBy(cluster) with d per-
        # dimension decimal aggregates — was REJECTED: the d-wide
        # aggregate buffer row blows past codegen's method-size limits
        # and runs ~1.5× slower than this narrow two-shuffle shape,
        # despite the extra exchange. Narrow exploded rows keep every
        # stage inside whole-stage codegen.)
        # The sum runs in decimal(38,18): exact fixed-point addition is
        # ORDER-INDEPENDENT, so the mean is bit-identical no matter how
        # partitions split or partials merge — a double sum would drift
        # with shuffle order and break the model's exact-determinism
        # contract. (Constraint: components must fit decimal(38,18),
        # i.e. |x| < 1e20 — trivially true for embeddings.) The exact
        # sum then rounds once to double and divides by the count, both
        # IEEE-exact, which is what the pure-Python reference replays.
        means = (
            assigned.select("cluster_id", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                    / F.count("x")
                ).alias("m")
            )
        )
        recentered = means.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.m,
            ).alias("new_centroid")
        )
        # a cluster that lost every member keeps its old centroid
        # (standard empty-cluster handling; k never silently shrinks)
        new_cents = (
            cents.alias("o")
            .join(recentered.alias("n"), "cluster_id", "left")
            .select(
                "cluster_id",
                F.coalesce(F.col("new_centroid"), F.col("centroid")).alias(
                    "centroid"
                ),
                _sq_l2(
                    F.coalesce(F.col("new_centroid"), F.col("centroid")),
                    F.col("centroid"),
                ).alias("shift"),
            )
            .localCheckpoint(eager=True)
        )
        shift = new_cents.agg(F.max("shift").alias("s")).first().s
        cents = new_cents.select("cluster_id", "centroid")
        if shift is not None and shift < tol:
            converged = True
            break
    if not converged and expect_convergence:
        warnings.warn(
            f"kmeans_fit did not converge within {max_iterations} iterations "
            f"(last max centroid shift above tol={tol}); the model is the "
            "last Lloyd iterate, not a fixed point.",
            RuntimeWarning,
            stacklevel=2,
        )

    # one final corpus pass yields BOTH diagnostics: per-cluster counts
    # and squared-distance sums collapse to k rows, checkpointed so
    # neither the inertia reduction nor the centroid materialization
    # re-runs the assignment. With keep_assignments the checkpoint sits
    # one step earlier — on the per-row assignment — and the k-row
    # stats become a cheap aggregate over the checkpointed rows.
    final_assigned = _assign(vecs, cents)
    kept = None
    if keep_assignments:
        kept = final_assigned.select("id", "cluster_id", "d2").localCheckpoint(
            eager=True
        )
        final_assigned = kept
    final_stats = (
        final_assigned
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum("d2").alias("ssd"),
        )
    )
    if not keep_assignments:
        final_stats = final_stats.localCheckpoint(eager=True)
    inertia = final_stats.agg(F.sum("ssd").alias("i")).first().i or 0.0
    sizes = final_stats.select("cluster_id", "n_members")
    centroids = cents.join(sizes, "cluster_id", "left").select(
        "cluster_id",
        "centroid",
        F.coalesce(F.col("n_members"), F.lit(0)).cast("bigint").alias("n_members"),
    )
    assignments = (
        kept.select(
            F.col("id").alias(id_col), "cluster_id", F.col("d2").alias("sq_dist")
        )
        if kept is not None
        else None
    )
    return KMeansModel(
        centroids=centroids,
        iterations=it,
        converged=converged,
        inertia=float(inertia),
        assignments=assignments,
    )


def kmeans_assign(
    df: DataFrame,
    model: KMeansModel,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Label each row of ``df`` with its nearest model centroid —
    the IVF posting-list assignment (broadcast centroids, no shuffle)."""
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    return _assign(vecs, model.centroids).select(
        F.col("id").alias(id_col), "cluster_id", F.col("d2").alias("sq_dist")
    )
