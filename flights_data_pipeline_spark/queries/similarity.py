"""Similarity search over the ``embeddings`` table (array<float> vectors).

Extension surface for large-scale training-data pipelines (SURVEY.md
§2.11 / build plan M4): brute-force cosine top-k as the exact baseline,
and a sign-LSH bucketed variant as the scale path. The reference has no
vector operators; this is the declared LLM-pipeline extension surface.

Float determinism: a dot product is only cross-engine-exact if both
engines do the *same IEEE operations in the same order*. Both sides
here compute ``fold_left(+, 0.0, [toDouble(a_i) * toDouble(b_i)])`` —
Spark via ``aggregate(zip_with(...))``, DuckDB via
``list_reduce(list_transform(...))`` — float→double promotion is exact,
double multiply/add/sqrt/divide are IEEE-defined, so cosines are
bit-identical and rank ordering agrees exactly (ties break on id).

Scale posture: brute-force is O(Q·N) with a broadcast query side —
fine for reranking, wrong as the primary search at 100 TB. The
bucketed variant is the real plan: hash vectors into sign-pattern
buckets (random-hyperplane LSH with axis-aligned planes), shuffle once
on the bucket key, and search within buckets only. More planes and
multi-probe widen recall at scale; both knobs are data-independent.
No Python UDFs anywhere — all vector math is JVM-side higher-order
array expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io.catalog import load_table as t
from .registry import query

#: number of query vectors for the brute-force baseline.
N_QUERIES = 10
TOP_K = 5
#: sign-LSH: number of leading dimensions used as separating planes.
N_PLANES = 4
BUCKET_TOP_K = 3


def _dot(a: Column, b: Column) -> Column:
    """Strict left-fold dot product — bit-identical to the DuckDB twin."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


#: DuckDB twin: fold over an index range (1-based list access). The
#: bound derives from the actual array length — a hardcoded dimension
#: would silently truncate or NULL-pollute if the corpus dim changed.
def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        f"(x, y) -> x + y)"
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (exact baseline / reranking kernel).
# ---------------------------------------------------------------------------
@query(
    "embedding_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {_duck_dot('q.embedding', 'e.embedding')}
               / (sqrt({_duck_dot('q.embedding', 'q.embedding')})
                  * sqrt({_duck_dot('e.embedding', 'e.embedding')}))
               AS cosine
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id)
                  AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, cosine
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def embedding_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{TOP_K} for {N_QUERIES} query vectors.

    The query side is broadcast (tiny), so the scan of the candidate
    side is a single narrow pass — no shuffle until the per-query top-k
    window, which AQE keeps small (Q·N rows → Q·k).
    """
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    cand = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# Sign-LSH bucketed ANN (the 100 TB scale path).
# ---------------------------------------------------------------------------
def _duck_bucket(col: str) -> str:
    digits = " || ".join(
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(N_PLANES)
    )
    return f"({digits})"


@query(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_duck_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, a.bucket, e.vec_id AS neighbor_id,
             {_duck_dot('a.embedding', 'e.embedding')}
               / (sqrt({_duck_dot('a.embedding', 'a.embedding')})
                  * sqrt({_duck_dot('e.embedding', 'e.embedding')}))
               AS cosine
      FROM b a JOIN b e ON a.bucket = e.bucket AND a.vec_id != e.vec_id
    ),
    ranked AS (
      SELECT vec_id, bucket, neighbor_id, cosine,
             CAST(row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cosine DESC, neighbor_id)
                  AS BIGINT) AS rank
      FROM scored
    )
    SELECT vec_id, bucket, neighbor_id, rank, cosine
    FROM ranked WHERE rank <= {BUCKET_TOP_K}
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: sign-pattern LSH buckets, exact search in-bucket.

    Every vector gets a {N_PLANES}-bit bucket from the signs of its
    leading dimensions (axis-aligned random-hyperplane LSH — planes are
    data-independent so the bucketing is a narrow map). The self-join
    shuffles once on the bucket key and compares only within buckets:
    O(N²/2^planes) work instead of O(N²). At 100 TB: more planes,
    multi-probe neighboring buckets, and salt any hot bucket.
    """
    e = t(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.element_at("embedding", i + 1) >= 0, "1").otherwise("0")
            for i in range(N_PLANES)
        ]
    )
    # norms are computed once per vector BEFORE the pair join — inside
    # the join each norm would be re-folded for every pair (~bucket-size
    # times redundantly). Same fold, same bits, ~2x fewer array folds.
    b = e.select(
        "vec_id",
        "embedding",
        bucket.alias("bucket"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    a, c = b.alias("a"), b.alias("c")
    scored = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col("a.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.bucket").alias("bucket"),
        F.col("c.vec_id").alias("neighbor_id"),
        (
            _dot(F.col("a.embedding"), F.col("c.embedding"))
            / (F.col("a.nrm") * F.col("c.nrm"))
        ).alias("cosine"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= BUCKET_TOP_K)
        .select("vec_id", "bucket", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (dedup family, LSH-blocked).
# ---------------------------------------------------------------------------
NEAR_DUP_COSINE = 0.3


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {{bucket}} AS bucket,
             sqrt({_duck_dot('embedding', 'embedding')}) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS a_id, e.vec_id AS b_id,
           {_duck_dot('a.embedding', 'e.embedding')} / (a.nrm * e.nrm)
             AS cosine
    FROM b a JOIN b e ON a.bucket = e.bucket AND a.vec_id < e.vec_id
    WHERE {_duck_dot('a.embedding', 'e.embedding')} / (a.nrm * e.nrm)
          >= {NEAR_DUP_COSINE}
    """.replace("{bucket}", _duck_bucket("embedding")),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vector pairs: cosine ≥ {NEAR_DUP_COSINE} within
    sign-LSH blocks (threshold calibrated to this synthetic corpus's
    similarity range — real near-dup corpora would use ~0.95).

    The dedup-family twin of ``ann_lsh_bucketed``: same blocking (near-
    identical vectors agree on leading-dimension signs with high
    probability), but the output is the near-dup *pair list* a dedup
    pipeline would feed into connected-components / keep-one-per-group.
    At 100 TB: more planes + multi-probe for recall; candidate pairs
    stay linear in corpus size for a non-degenerate embedding space.
    """
    e = t(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.element_at("embedding", i + 1) >= 0, "1").otherwise("0")
            for i in range(N_PLANES)
        ]
    )
    b = e.select(
        "vec_id",
        "embedding",
        bucket.alias("bucket"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    a, c = b.alias("a"), b.alias("c")
    cosine = _dot(F.col("a.embedding"), F.col("c.embedding")) / (
        F.col("a.nrm") * F.col("c.nrm")
    )
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("c.vec_id").alias("b_id"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
    )


# ---------------------------------------------------------------------------
# k-NN label vote (classification on top of the exact top-k kernel).
# ---------------------------------------------------------------------------
@query(
    "knn_label_vote",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             e.label AS neighbor_label,
             {_duck_dot('q.embedding', 'e.embedding')}
               / (sqrt({_duck_dot('q.embedding', 'q.embedding')})
                  * sqrt({_duck_dot('e.embedding', 'e.embedding')}))
               AS cosine,
             e.vec_id AS neighbor_id
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id != q.vec_id
    ),
    topk AS (
      SELECT * FROM (
        SELECT query_id, true_label, neighbor_label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= {TOP_K}
    ),
    votes AS (
      SELECT query_id, true_label, neighbor_label,
             CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM topk GROUP BY 1, 2, 3
    )
    SELECT query_id, true_label,
           CAST(neighbor_label AS INT) AS predicted_label, n_votes
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, neighbor_label) AS rn
      FROM votes
    ) WHERE rn = 1
    """,
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-label vote among the cosine top-{TOP_K} neighbors."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("true_label"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    cand = e.select(
        "vec_id", "embedding", "label", _norm(F.col("embedding")).alias("nrm")
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            F.col("label").alias("neighbor_label"),
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= TOP_K
    )
    votes = topk.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count("*").cast("bigint").alias("n_votes")
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("neighbor_label")
    )
    return (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("neighbor_label").cast("int").alias("predicted_label"),
            "n_votes",
        )
    )
