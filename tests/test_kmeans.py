"""operators/kmeans.py: Lloyd's on DataFrames — recovery, monotonicity,
determinism, IVF wiring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.operators.kmeans import kmeans_assign, kmeans_fit


@pytest.fixture(scope="module")
def blobs(spark):
    """Three well-separated deterministic 4-d blobs, 30 points each."""
    rows = []
    centers = [(0.0, 0.0, 0.0, 0.0), (10.0, 10.0, 0.0, 0.0), (0.0, 0.0, 10.0, 10.0)]
    i = 0
    for b, c in enumerate(centers):
        for j in range(30):
            # deterministic jitter in [-0.5, 0.5) from a simple LCG
            jit = [(((j * 2654435761 + d * 40503 + b) % 1000) / 1000.0) - 0.5 for d in range(4)]
            rows.append((i, [c[d] + jit[d] for d in range(4)], b))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, true_blob INT"
    )


def test_recovers_separated_blobs(spark, blobs):
    model = kmeans_fit(blobs, k=3, max_iterations=15)
    assert model.converged
    labels = kmeans_assign(blobs, model).join(blobs, "vec_id")
    # every true blob maps to exactly one fitted cluster and vice versa
    m = labels.groupBy("true_blob").agg(
        F.countDistinct("cluster_id").alias("k_in_blob")
    )
    assert all(r.k_in_blob == 1 for r in m.collect())
    assert labels.select("cluster_id").distinct().count() == 3
    # centroids sit within the jitter radius of the true centers
    cents = {tuple(round(x) for x in r.centroid) for r in model.centroids.collect()}
    assert cents == {(0, 0, 0, 0), (10, 10, 0, 0), (0, 0, 10, 10)}


def test_inertia_not_worse_than_init_and_deterministic(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(300)
    one = kmeans_fit(e, k=8, max_iterations=1, expect_convergence=False)
    ten = kmeans_fit(e, k=8, max_iterations=8, expect_convergence=False)
    # Lloyd's is monotone: more iterations never increase inertia
    assert ten.inertia <= one.inertia + 1e-9
    again = kmeans_fit(e, k=8, max_iterations=8, expect_convergence=False)
    assert math.isclose(again.inertia, ten.inertia, rel_tol=0, abs_tol=0.0)
    a1 = {r.vec_id: r.cluster_id for r in kmeans_assign(e, ten).collect()}
    a2 = {r.vec_id: r.cluster_id for r in kmeans_assign(e, again).collect()}
    assert a1 == a2


def test_every_vector_assigned_and_sizes_sum(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(200)
    model = kmeans_fit(e, k=5, max_iterations=5, expect_convergence=False)
    n = e.count()
    assert model.centroids.agg(F.sum("n_members")).first()[0] == n
    assert kmeans_assign(e, model).count() == n
    assert model.centroids.count() == 5  # empty clusters kept, k stable


def test_k_exceeding_corpus_raises(spark):
    """k never silently shrinks: fewer than k vectors (including the
    empty corpus) must raise a clear ValueError, for both inits
    (ADVICE round 3 — hash init used limit(k); maxmin crashed with an
    opaque AttributeError on empty input)."""
    from flights_data_pipeline_spark.operators.kmeans import kmeans_fit

    small = spark.createDataFrame(
        [("a", [0.0, 1.0]), ("b", [1.0, 0.0])], "vec_id STRING, embedding ARRAY<DOUBLE>"
    )
    for init in ("maxmin", "hash"):
        with pytest.raises(ValueError, match="only 2 vectors"):
            kmeans_fit(small, k=3, init=init)
    empty = small.limit(0)
    with pytest.raises(ValueError, match="only 0 vectors"):
        kmeans_fit(empty, k=1)


# ---------------------------------------------------------------------------
# Cross-engine pin: Spark fit vs pure-Python reference Lloyd's.
# ---------------------------------------------------------------------------
def _load_vecs(sf):
    import pyarrow.parquet as pq

    t = pq.read_table(f"/root/testdata/sf{sf}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    # float32 -> Python float is the same exact widening Spark's
    # cast(float as double) performs
    return {i: [float(x) for x in v] for i, v in zip(ids, embs)}


def _pin(spark, sf, **kw):
    from .kmeans_reference import reference_kmeans

    vecs = _load_vecs(sf)
    df = load_table(spark, f"/root/testdata/sf{sf}", "embeddings")
    model = kmeans_fit(df, expect_convergence=False, **kw)
    ref_cents, ref_n, ref_it, ref_conv = reference_kmeans(vecs, **kw)
    got = {r.cluster_id: (list(r.centroid), r.n_members) for r in model.centroids.collect()}
    assert set(got) == set(ref_cents)
    for cid in ref_cents:
        assert got[cid][0] == ref_cents[cid], f"cluster {cid} centroid bits differ"
        assert got[cid][1] == ref_n[cid]
    assert (model.iterations, model.converged) == (ref_it, ref_conv)


def test_reference_pin_hash_init_sf0001(spark):
    """Bit-equal centroids vs an independent pure-Python Lloyd's at
    sf0.001 — the exact configuration the registered rows-only query
    `ivf_kmeans_fit` runs (k=8, hash init, 3 rounds). This is the
    cross-engine verification the driver gate cannot express in SQL."""
    _pin(spark, "0.001", k=8, max_iterations=3, init="hash")


def test_reference_pin_maxmin_init_sf0001(spark):
    _pin(spark, "0.001", k=4, max_iterations=4, init="maxmin")


def test_reference_pin_hash_init_sf001(spark):
    """Same pin one scale up (sf0.01, 5000 vectors): partitioning and
    partial-aggregate merge order differ from sf0.001, which is
    precisely what the decimal re-centering must be invariant to."""
    _pin(spark, "0.01", k=8, max_iterations=3, init="hash")


# ---------------------------------------------------------------------------
# Sampled maxmin init (the large-k route).
# ---------------------------------------------------------------------------
def test_sampled_maxmin_equals_full_when_sample_covers_corpus(spark, sf_dir):
    """init_sample >= corpus ⇒ the driver-side greedy sees exactly the
    rows the distributed farthest-point scans, with the same strict-fold
    distances and tie-breaks — centroids must be BIT-EQUAL."""
    e = load_table(spark, sf_dir, "embeddings").limit(120)
    full = kmeans_fit(
        e, k=5, max_iterations=3, init="maxmin", expect_convergence=False
    )
    sampled = kmeans_fit(
        e, k=5, max_iterations=3, init="maxmin", init_sample=10_000,
        expect_convergence=False,
    )
    f = {r.cluster_id: (list(r.centroid), r.n_members) for r in full.centroids.collect()}
    s = {r.cluster_id: (list(r.centroid), r.n_members) for r in sampled.centroids.collect()}
    assert f == s
    assert (full.iterations, full.converged) == (sampled.iterations, sampled.converged)
    assert full.inertia == sampled.inertia


def test_sampled_maxmin_subsample_valid_and_deterministic(spark, sf_dir):
    """A proper subsample still yields k centroids, assigns the whole
    corpus, and reproduces exactly on re-run."""
    e = load_table(spark, sf_dir, "embeddings").limit(300)
    m1 = kmeans_fit(
        e, k=6, max_iterations=4, init="maxmin", init_sample=50,
        expect_convergence=False,
    )
    m2 = kmeans_fit(
        e, k=6, max_iterations=4, init="maxmin", init_sample=50,
        expect_convergence=False,
    )
    assert m1.centroids.count() == 6
    assert m1.centroids.agg(F.sum("n_members")).first()[0] == 300
    c1 = {r.cluster_id: list(r.centroid) for r in m1.centroids.collect()}
    c2 = {r.cluster_id: list(r.centroid) for r in m2.centroids.collect()}
    assert c1 == c2


def test_sampled_maxmin_guards(spark):
    small = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    with pytest.raises(ValueError, match="init_sample"):
        kmeans_fit(small, k=4, init="hash", init_sample=8)
    with pytest.raises(ValueError, match="must be >= k"):
        kmeans_fit(small, k=4, init="maxmin", init_sample=2)
