"""Dataset-curation operators: quota sampling, decontamination,
sequence packing, PII redaction.

The reference pipeline's job is BI rollups (reference
``dags/flights_data_pipeline.py``); a 100 TB training-data pipeline
additionally curates what goes INTO the training mix. This module
covers the four curation passes every corpus owner runs between "raw
crawl" and "tokenizer input":

* ``domain_quota_sample`` — cap documents per source domain so no
  single crawl domain dominates the mix (the classic "no more than K
  pages per host" rule).
* ``decontamination_ngram_overlap`` — find training documents sharing
  long n-grams with the held-out eval split (benchmark leakage scan).
* ``pack_sequences`` — assign documents to fixed-token-budget training
  sequences (greedy packing by running token count).
* ``pii_redaction`` — mask email/phone patterns before training.
* ``repetition_quality`` — Gopher-style repetition signals (top-2-gram
  fraction, duplicate-2-gram/token fractions) flagging low-quality
  generated/boilerplate text.
* ``embedding_int8_quant`` — per-vector symmetric int8 quantization of
  the embedding column with integrity counters (the storage/serving
  compression pass for a vector corpus).

Engine discipline matches the rest of the query surface: pure JVM-side
expressions, exact-integer or md5-hex outputs for the cross-engine
gate, deterministic ordering via hashed keys (never ``rand()``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io.catalog import load_table as t
from .dedup import _norm_text as _dedup_norm_text
from .profiling import TRAIN_PCT, VAL_PCT, _bucket_sql, _hex_val_duck, _hex_val_spark
from .registry import query

# ---------------------------------------------------------------------------
# Per-domain quota sampling.
# ---------------------------------------------------------------------------
#: max documents kept per source domain.
DOMAIN_QUOTA = 10

#: training-mix token budget to apportion across sources (shared by
#: token_budget_apportionment and domain_token_budget; defined here,
#: above both oracle f-strings).
MIX_BUDGET = 100_000


@query(
    "domain_quota_sample",
    oracle=f"""
    SELECT doc_id, source, CAST(rk AS INT) AS sample_rank FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents
    ) WHERE rk <= {DOMAIN_QUOTA}
    """,
)
def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most {DOMAIN_QUOTA} documents per source domain.

    The within-domain order is the md5 of the primary key — a
    deterministic uniform shuffle, so the kept set is an unbiased
    sample that is STABLE as the corpus grows (a kept doc is only ever
    evicted by a new doc hashing earlier, never by re-rolling an RNG).

    Scale: one shuffle on ``source``. Domains are the canonical skew
    key (a few giant hosts); at 100 TB this is the query to run with
    AQE skew-join/partition splitting on — and because the predicate
    is ``row_number <= K``, Spark pushes a per-partition top-K
    (WindowGroupLimit) below the shuffle, so each map task ships at
    most K rows per domain, never the giant domain's full row set.
    """
    d = t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= DOMAIN_QUOTA)
    )


# ---------------------------------------------------------------------------
# Domain-grain pre-filter: content dedup within domain, then quota.
# ---------------------------------------------------------------------------
@query(
    "domain_prefilter",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    dd AS (
      SELECT doc_id, source, h,
             row_number() OVER (PARTITION BY source, fp
                                ORDER BY h, doc_id) AS dup_rn
      FROM d
    ),
    surv AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY h, doc_id) AS rk
      FROM dd WHERE dup_rn = 1
    )
    SELECT dd.doc_id, dd.source,
           CASE WHEN dd.dup_rn > 1 THEN 'dropped_dup'
                WHEN s.rk <= {DOMAIN_QUOTA} THEN 'kept'
                ELSE 'dropped_quota' END AS stage,
           CASE WHEN s.rk <= {DOMAIN_QUOTA} THEN CAST(s.rk AS INT) END
             AS sample_rank
    FROM dd LEFT JOIN surv s USING (doc_id)
    """,
)
def domain_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CommonCrawl-style domain-grain PRE-FILTER, composed: stage 1
    keeps one capture per (domain, content fingerprint) — the
    URL-grain dedup rule restated for a corpus whose identity columns
    are (source, text); stage 2 applies the per-domain quota
    (``domain_quota_sample``'s md5-ordered rule) to the dedup
    SURVIVORS only, so boilerplate copies can no longer crowd real
    pages out of a domain's budget. Every document gets a disposition:
    ``dropped_dup`` | ``dropped_quota`` | ``kept`` (+ its within-domain
    sample rank) — the per-doc attribution a pipeline audit needs,
    not just the kept list.

    Both keep-rules are md5-of-primary-key ordered: deterministic,
    engine-neutral, stable under corpus growth (no RNG re-roll ever
    evicts a kept doc in favor of a later-hashing one).

    Scale: two shuffles, zero joins — one on (source, fp) for the dup
    rank (content hashes are uniform, no skew), one on source where
    the survivor rank is a CONDITIONAL RUNNING COUNT of survivors in
    (h, doc_id) order, so no filtered-subset self-join is needed. The
    windows cannot use a group-limit pushdown because every row keeps
    a label (the audit IS the output); for a giant-domain corpus the
    quota stage inherits ``domain_quota_sample``'s AQE-skew note.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(_dedup_norm_text()).alias("fp"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    dd = d.select(
        "doc_id",
        "source",
        "h",
        F.row_number()
        .over(W.partitionBy("source", "fp").orderBy("h", "doc_id"))
        .alias("dup_rn"),
    )
    run = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = dd.select(
        "doc_id",
        "source",
        "dup_rn",
        F.sum(F.when(F.col("dup_rn") == 1, 1)).over(run).alias("rk"),
    )
    kept = (F.col("dup_rn") == 1) & (F.col("rk") <= DOMAIN_QUOTA)
    return ranked.select(
        "doc_id",
        "source",
        F.when(F.col("dup_rn") > 1, F.lit("dropped_dup"))
        .when(kept, F.lit("kept"))
        .otherwise(F.lit("dropped_quota"))
        .alias("stage"),
        F.when(kept, F.col("rk").cast("int")).alias("sample_rank"),
    )


# ---------------------------------------------------------------------------
# Stratified rebalancing sample (downsample to the minority stratum).
# ---------------------------------------------------------------------------
def _bucket16(hexval) -> str:
    """First 4 md5 hex digits of column ``h`` → integer in [0, 65536)."""
    digits = " + ".join(f"{hexval('h', p)} * {16 ** (3 - p)}" for p in range(4))
    return f"({digits})"


def _bucket16_duck() -> str:
    return _bucket16(_hex_val_duck)


def _bucket16_spark() -> str:
    return _bucket16(_hex_val_spark)



@query(
    "stratified_rebalance_sample",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    ),
    b AS (
      SELECT doc_id, lang,
             {_bucket16_duck()} AS bucket16
      FROM hashed
    ),
    counts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
               FROM documents GROUP BY lang),
    tgt AS (SELECT MIN(n) AS t FROM counts)
    SELECT b.doc_id, b.lang
    FROM b JOIN counts c ON b.lang = c.lang CROSS JOIN tgt
    WHERE b.bucket16 < (65536 * tgt.t) // c.n
    """,
)
def stratified_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing sample: each stratum is downsampled toward
    the minority stratum's size by keeping documents whose 16-bit key
    hash falls under ``floor(65536 * min_count / stratum_count)`` —
    exact integer arithmetic, so the kept set is deterministic,
    engine-independent, and stable under corpus growth (the per-doc
    keep decision changes only when the stratum RATES change).

    The mix-rebalancing pass of a pretraining pipeline. Scale: the
    stratum-counts table is |langs| rows — one aggregate, then a
    broadcast join; the corpus itself never shuffles, the filter is a
    narrow map over the scan.
    """
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n"))
    tgt = counts.agg(F.min("n").alias("tmin"))
    hashed = d.select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    bucket16 = F.expr(_bucket16_spark())
    return (
        hashed.select("doc_id", "lang", bucket16.alias("bucket16"))
        .join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(tgt))
        .filter(F.col("bucket16") < F.floor((65536 * F.col("tmin")) / F.col("n")))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# Decontamination: long-n-gram overlap between train and eval splits.
# ---------------------------------------------------------------------------
#: contamination n-gram length (long enough that chance collisions are
#: negligible — real pipelines use 8-13; dedup's K=3 shingles would
#: flag half the corpus).
DECONTAM_K = 8


def _long_shingles(toks: Column, k: int) -> Column:
    """Distinct k-token shingles of a *materialized* token-array column.

    Unlike ``dedup._shingles`` (which zip_withs shifted copies because
    its token array is an inline ``split(regexp_replace(...))``
    expression that higher-order lambdas would re-evaluate per
    element), ``toks`` here is a resolved attribute from a previous
    projection, so ``slice(toks, i, k)`` inside ``transform`` is a
    cheap array view — the natural indexed form works without the
    no-CSE penalty, for any k.
    """
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


@query(
    "decontamination_ngram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(toks) - {DECONTAM_K} + 2),
               i -> array_to_string(list_slice(toks, i, i + {DECONTAM_K} - 1),
                                    ' '))) AS shingles
      FROM toks WHERE len(toks) >= {DECONTAM_K}
    ),
    b AS (
      SELECT doc_id, {_bucket_sql(_hex_val_duck)} AS bucket
      FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
    ),
    ex AS (
      SELECT sh.doc_id, b.bucket, unnest(sh.shingles) AS g
      FROM sh JOIN b ON sh.doc_id = b.doc_id
    )
    SELECT t.doc_id,
           CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_contaminated_shingles,
           CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
    FROM (SELECT doc_id, g FROM ex WHERE bucket < {TRAIN_PCT}) t
    JOIN (SELECT doc_id, g FROM ex WHERE bucket >= {VAL_PCT}) e
      ON t.g = e.g
    GROUP BY t.doc_id
    """,
)
def decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage scan: train-split documents that share any
    {DECONTAM_K}-token n-gram with a test-split document, with the
    distinct count of shared n-grams and of eval documents hit.

    Splits are the same hashed-key buckets as ``train_test_split``
    (train = bucket < {TRAIN_PCT}, eval = bucket >= {VAL_PCT}), so the
    scan needs no side input here. In production the eval side is a
    fixed benchmark suite — thousands of documents, i.e. a few MB of
    n-gram hashes — so the join side is ``broadcast()`` and the corpus
    is scanned exactly once with no shuffle; the n-gram join key is
    then ``xxhash64(g)`` rather than the raw string to keep the
    broadcast map small. Both optimizations are orthogonal to the
    semantics pinned here (raw-string equi-join, exact counts).
    """
    d = t(spark, sf_dir, "documents")
    toks_df = d.select(
        "doc_id",
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
        ).alias("toks"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    bucket = F.expr(_bucket_sql(_hex_val_spark))
    ex = toks_df.select(
        "doc_id",
        bucket.alias("bucket"),
        F.explode(_long_shingles(F.col("toks"), DECONTAM_K)).alias("g"),
    )
    train = ex.filter(F.col("bucket") < TRAIN_PCT).select("doc_id", "g")
    ev = ex.filter(F.col("bucket") >= VAL_PCT).select(
        F.col("doc_id").alias("eval_doc_id"), "g"
    )
    return (
        train.join(ev, "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").cast("bigint").alias("n_contaminated_shingles"),
            F.countDistinct("eval_doc_id").cast("bigint").alias("n_eval_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-corpus contamination matrix: cross-source fingerprint overlap.
# ---------------------------------------------------------------------------
def _contamination_matrix_oracle() -> str:
    from .text import WINNOW_ORACLE_CORE

    return f"""
    WITH fs AS (
      SELECT DISTINCT d.source, f.fp_hash
      FROM ({WINNOW_ORACLE_CORE}) f
      JOIN documents d USING (doc_id)
    ),
    tot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fps FROM fs GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared_fps
      FROM fs a JOIN fs b ON a.fp_hash = b.fp_hash AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b, p.n_shared_fps,
           p.n_shared_fps
             / CAST(ta.n_fps + tb.n_fps - p.n_shared_fps AS DOUBLE)
             AS fp_jaccard
    FROM pairs p
    JOIN tot ta ON ta.source = p.source_a
    JOIN tot tb ON tb.source = p.source_b
    """


@query("contamination_matrix", oracle=_contamination_matrix_oracle)
def contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-CORPUS contamination matrix: for every unordered pair of
    source corpora, the number of winnowing fingerprints
    (``text.winnow_fp_set`` — content-defined, alignment-invariant)
    present in BOTH, and the Jaccard of the two fingerprint sets. The
    corpus-grain twin of ``decontamination_ngram_overlap``: that query
    answers "which TRAIN DOCS leak into eval"; this one answers "which
    SOURCES share verbatim material with which" — the audit run before
    mixing N crawls/dumps whose provenance overlaps (re-crawls, mirror
    sites, dataset re-releases).

    Scale: fingerprints collapse to (source, fp_hash) grain FIRST
    (one groupBy on the uniform md5 key), so the self-join on fp_hash
    is bounded per fingerprint by the SOURCE CATALOG size S — pair
    rows ≤ C(S,2) per fingerprint, never doc×doc — and the totals
    join is an S-row broadcast. With S in the tens-to-hundreds (a
    source catalog, not a key space) this is linear in corpus tokens
    end to end. The (source, fp_hash) frame is localCheckpointed: it
    feeds BOTH self-join sides and the totals, and without the pin
    the whole fingerprinting subtree would execute four times.
    """
    from .dedup import _spread_small_scan
    from .text import winnow_fp_set

    d = t(spark, sf_dir, "documents")
    fs = (
        # spread the (one-split) scan so the gram explode+md5 runs on
        # every core; the winnow window reuses the doc_id partitioning
        winnow_fp_set(_spread_small_scan(spark, sf_dir, d))
        .join(d.select("doc_id", "source"), "doc_id")
        .select("source", "fp_hash")
        .distinct()
        .localCheckpoint(eager=False)
    )
    tot = fs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_fps")
    )
    a = fs.alias("a")
    b = fs.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp_hash") == F.col("b.fp_hash"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_shared_fps"))
    )
    ta = F.broadcast(tot.select(F.col("source").alias("source_a"),
                                F.col("n_fps").alias("na")))
    tb = F.broadcast(tot.select(F.col("source").alias("source_b"),
                                F.col("n_fps").alias("nb")))
    return (
        pairs.join(ta, "source_a")
        .join(tb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_fps",
            (
                F.col("n_shared_fps").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared_fps")).cast(
                    "double"
                )
            ).alias("fp_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Per-domain token budgets: dedup -> apportion -> token-gated admission.
# ---------------------------------------------------------------------------
@query(
    "domain_token_budget",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             md5(CAST(doc_id AS VARCHAR)) AS h,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    surv AS (
      SELECT doc_id, source, h, n_tokens
      FROM (
        SELECT *, row_number() OVER (PARTITION BY source, fp
                                     ORDER BY h, doc_id) AS dup_rn
        FROM d
      ) WHERE dup_rn = 1
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_surv,
             CAST(SUM(n_tokens) AS BIGINT) AS surv_tokens
      FROM surv GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(surv_tokens) AS BIGINT) AS total FROM s),
    base AS (
      SELECT source, n_surv, surv_tokens,
             ({MIX_BUDGET} * surv_tokens) // t.total AS base_alloc,
             ({MIX_BUDGET} * surv_tokens) % t.total AS remainder
      FROM s CROSS JOIN tot t
    ),
    alloc AS (
      SELECT source, n_surv, surv_tokens,
             CAST(base_alloc
                  + CASE WHEN row_number() OVER (ORDER BY remainder DESC,
                                                 source)
                              <= {MIX_BUDGET} - SUM(base_alloc) OVER ()
                         THEN 1 ELSE 0 END AS BIGINT) AS alloc
      FROM base
    ),
    ranked AS (
      SELECT source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source
                                      ORDER BY h, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tokens
      FROM surv
    ),
    adm AS (
      SELECT r.source,
             CAST(COUNT(*) AS BIGINT) AS n_admitted,
             CAST(SUM(r.n_tokens) AS BIGINT) AS tokens_admitted
      FROM ranked r JOIN alloc a USING (source)
      WHERE r.cum_tokens <= a.alloc AND r.n_tokens IS NOT NULL
      GROUP BY r.source
    )
    SELECT a.source, a.n_surv, a.surv_tokens, a.alloc,
           CAST(coalesce(m.n_admitted, 0) AS BIGINT) AS n_admitted,
           CAST(coalesce(m.tokens_admitted, 0) AS BIGINT)
             AS tokens_admitted
    FROM alloc a LEFT JOIN adm m USING (source)
    """,
)
def domain_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DOMAIN token budgets, composed end to end: (1) within-domain
    content dedup (``domain_prefilter`` stage 1 — copies must not buy
    budget), (2) Hamilton apportionment of the global {MIX_BUDGET}-token
    budget across domains proportional to SURVIVOR token mass
    (``token_budget_apportionment``'s exact-integer rule), (3) within
    each domain, hash-ordered admission of survivors while the running
    token sum stays inside the domain's allocation
    (``token_budget_admission``'s gate, with the per-domain allocation
    replacing the global constant). Surface: per domain, survivors,
    survivor tokens, allocation, and the admitted count/tokens.

    This replaces the doc-COUNT quota with the budget a training mix
    actually spends — tokens — while keeping every determinism rule:
    md5-ordered admission (stable unbiased prefix under corpus
    growth), exact bigint arithmetic (no float anywhere), allocations
    that sum to the budget exactly.

    Scale: the dedup rank and the running sum are the same two
    source-partitioned windows as ``domain_prefilter`` (uniform md5
    dup keys; the audit needs every survivor row); the apportionment
    operates on the DOMAIN-grain table (catalog-sized) and rejoins as
    a broadcast. NULL-text survivors carry NULL token counts; a
    window SUM *skips* NULLs (both engines), so such a survivor
    inherits the previous running sum rather than going NULL — the
    admission gate therefore excludes them EXPLICITLY
    (``n_tokens IS NOT NULL``, mirrored in the oracle): a document
    with no measurable tokens never counts as admitted, while the
    running sum over real tokens is unaffected either way.
    """
    d = t(spark, sf_dir, "documents")
    n_tokens = F.when(
        F.col("text").isNotNull(),
        F.size(F.split(F.trim(F.col("text")), r"\s+")),
    ).cast("bigint")
    base_cols = d.select(
        "doc_id",
        "source",
        F.md5(_dedup_norm_text()).alias("fp"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        n_tokens.alias("n_tokens"),
    )
    surv = (
        base_cols.withColumn(
            "dup_rn",
            F.row_number().over(
                W.partitionBy("source", "fp").orderBy("h", "doc_id")
            ),
        )
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn", "fp")
        .localCheckpoint(eager=False)  # feeds totals AND the admission scan
    )
    return token_budget_allocation_surface(surv, MIX_BUDGET)


def token_budget_allocation_surface(surv: DataFrame, budget: int) -> DataFrame:
    """Hamilton apportionment + hash-ordered admission over a survivor
    frame ``(doc_id, source, h, n_tokens)`` — the shared core of the
    batch ``domain_token_budget`` query and the streaming readout
    (``streaming/jobs.domain_token_budget_from_store``), so the two
    surfaces cannot drift. Exact bigint arithmetic throughout; the
    admission gate excludes NULL token counts explicitly (a window
    SUM would silently skip them — see ``domain_token_budget``)."""
    s = surv.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_surv"),
        F.sum("n_tokens").cast("bigint").alias("surv_tokens"),
    )
    tot = s.agg(F.sum("surv_tokens").cast("bigint").alias("total"))
    b = F.lit(budget).cast("bigint")
    base = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_surv",
        "surv_tokens",
        F.expr(f"(CAST({int(budget)} AS BIGINT) * surv_tokens) DIV total")
        .cast("bigint")
        .alias("base_alloc"),
        ((b * F.col("surv_tokens")) % F.col("total")).alias("remainder"),
    )
    alloc = base.select(
        "source",
        "n_surv",
        "surv_tokens",
        (
            F.col("base_alloc")
            + F.when(
                F.row_number().over(
                    W.orderBy(F.col("remainder").desc(), "source")
                )
                <= b - F.sum("base_alloc").over(W.partitionBy()),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    )
    run = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = surv.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(run).cast("bigint").alias("cum_tokens"),
    )
    adm = (
        ranked.join(F.broadcast(alloc.select("source", "alloc")), "source")
        .filter(
            (F.col("cum_tokens") <= F.col("alloc"))
            & F.col("n_tokens").isNotNull()
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_admitted"),
            F.sum("n_tokens").cast("bigint").alias("tokens_admitted"),
        )
    )
    return (
        alloc.join(adm, "source", "left")
        .select(
            "source",
            "n_surv",
            "surv_tokens",
            "alloc",
            F.coalesce("n_admitted", F.lit(0)).cast("bigint")
            .alias("n_admitted"),
            F.coalesce("tokens_admitted", F.lit(0)).cast("bigint")
            .alias("tokens_admitted"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing: fixed-token-budget training sequences.
# ---------------------------------------------------------------------------
#: tokens per packed training sequence.
PACK_BUDGET = 2048


@query(
    "pack_sequences",
    oracle=f"""
    WITH tc AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(floor((SUM(n_tokens) OVER w - n_tokens) / {PACK_BUDGET})
                AS BIGINT) AS seq_bin
    FROM tc
    WINDOW w AS (PARTITION BY source ORDER BY h, doc_id
                 ROWS UNBOUNDED PRECEDING)
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: within each source shard, documents are
    laid end-to-end in hashed-key order and assigned to the
    {PACK_BUDGET}-token bin their first token lands in (fixed bin
    boundaries — a document may straddle two bins, the "document gets
    split across sequences" convention of most pretraining loaders).

    Scale: the running sum is a window per ``source`` shard, so the
    packing parallelizes across shards and never needs a global
    order — the one thing that would serialize at 100 TB. All values
    are exact integers (token counts well under 2^53), so the
    cross-engine floor-division is exact.
    """
    d = t(spark, sf_dir, "documents")
    # NULL-guarded: F.size returns -1 (not NULL) on NULL input under
    # default configs (spark.sql.legacy.sizeOfNull), which would corrupt
    # the running sum and diverge from the oracle's NULL-propagating
    # len(regexp_split_to_array(...)).
    n_tokens = F.when(
        F.col("text").isNotNull(),
        F.size(F.split(F.trim(F.col("text")), r"\s+")),
    ).cast("bigint")
    tc = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return tc.select(
        "doc_id",
        "source",
        "n_tokens",
        cum.cast("bigint").alias("cum_tokens"),
        F.floor((cum - F.col("n_tokens")) / PACK_BUDGET)
        .cast("bigint")
        .alias("seq_bin"),
    )


# ---------------------------------------------------------------------------
# PII redaction: email/phone masking.
# ---------------------------------------------------------------------------
#: patterns constrained to constructs with identical semantics in Java
#: regex (Spark) and RE2 (DuckDB): no lookaround, ASCII classes,
#: bounded repetition.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_emails``/``n_phones`` counts and a ``redacted`` text
    column with emails → ``<EMAIL>`` and phones → ``<PHONE>``.

    Library form so any table with a text column can use it; the
    registered query applies it to ``documents``. Narrow projection —
    two regex automata per row inside codegen, no shuffle: at 100 TB
    this is scan-bound, exactly like the tokenizer passes.
    """
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(c, F.lit(EMAIL_PATTERN)).cast("bigint"),
            "n_phones": F.regexp_count(c, F.lit(PHONE_PATTERN)).cast("bigint"),
            "redacted": F.regexp_replace(
                F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>"),
                PHONE_PATTERN,
                "<PHONE>",
            ),
        }
    )


# DuckDB string literals are verbatim (no backslash escapes), so the
# patterns embed unchanged; only a single-quote would need doubling.
_EMAIL_SQL = EMAIL_PATTERN
_PHONE_SQL = PHONE_PATTERN


@query(
    "pii_redaction",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_SQL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_SQL}')) AS BIGINT)
             AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_SQL}', '<EMAIL>',
                                             'g'),
                              '{_PHONE_SQL}', '<PHONE>', 'g')) AS redacted_fp
    FROM documents
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking over ``documents``: match counts plus the md5 of the
    redacted text (fingerprint rather than full text keeps the gate
    row narrow; the full redacted column is the library output).

    Honesty note: the synthetic corpus contains no digits or '@', so
    counts are 0 here and the gate pins "redaction didn't corrupt
    anything" (fp = md5 of the original). The regex contract itself —
    emails/phones actually matched and masked identically by Spark and
    DuckDB — is pinned by ``tests/test_curation.py`` on crafted PII
    strings.
    """
    d = t(spark, sf_dir, "documents")
    return redact_pii(d).select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.md5(F.col("redacted")).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# Repetition-based quality signals (Gopher-rule family).
# ---------------------------------------------------------------------------
#: flag threshold: most frequent 2-gram above this fraction of all
#: 2-grams, or duplicated 2-grams above it, marks the doc repetitive
#: (calibrated to the corpus: ~p85 of both distributions).
REPETITION_THRESHOLD = 0.06


@query(
    "repetition_quality",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> array_to_string(list_slice(toks, i, i + 1), ' ')))
               AS gram
      FROM toks WHERE len(toks) >= 2
    ),
    gc AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
           FROM g GROUP BY doc_id, gram),
    pd AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_2grams,
             CAST(MAX(c) AS BIGINT) AS top_2gram_count,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_2grams
      FROM gc GROUP BY doc_id
    ),
    tk AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens
      FROM toks
    )
    SELECT pd.doc_id, tk.n_tokens, pd.n_2grams, pd.top_2gram_count,
           pd.top_2gram_count / pd.n_2grams AS top_2gram_frac,
           (pd.n_2grams - pd.n_distinct_2grams) / pd.n_2grams
             AS dup_2gram_frac,
           (tk.n_tokens - tk.n_distinct_tokens) / tk.n_tokens
             AS dup_token_frac,
           (pd.top_2gram_count / pd.n_2grams > {REPETITION_THRESHOLD}
            OR (pd.n_2grams - pd.n_distinct_2grams) / pd.n_2grams
               > {REPETITION_THRESHOLD}) AS is_repetitive
    FROM pd JOIN tk ON pd.doc_id = tk.doc_id
    """,
)
def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals per document.

    Machine-generated and boilerplate text repeats itself; the classic
    quality rules threshold (a) the fraction of 2-gram instances taken
    by the single most frequent 2-gram and (b) the fraction of 2-gram
    instances that are repeats. Both are exact int/int IEEE divisions,
    so the cross-engine hash is stable without any rounding.

    Plan shape at 100 TB: token-level metrics (``n_tokens``, distinct
    tokens) are pure array expressions in the scan projection — no
    shuffle. Only the 2-gram frequency needs aggregation; it
    map-side-combines on (doc_id, gram) — keys are doc-local so
    partial aggregation collapses nearly everything before the one
    shuffle — then reduces per doc. The final join back to the
    token metrics is doc_id-keyed on two already-small per-doc rows.
    """
    d = t(spark, sf_dir, "documents")
    toks_df = d.select(
        "doc_id",
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
        ).alias("toks"),
    )
    tk = toks_df.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct_tokens"),
    )
    grams = toks_df.filter(F.size("toks") >= 2).select(
        "doc_id", F.explode(_long_shingles_all(F.col("toks"), 2)).alias("gram")
    )
    gc = grams.groupBy("doc_id", "gram").agg(F.count("*").cast("bigint").alias("c"))
    pd = gc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_2grams"),
        F.max("c").cast("bigint").alias("top_2gram_count"),
        F.count("*").cast("bigint").alias("n_distinct_2grams"),
    )
    top_frac = F.col("top_2gram_count") / F.col("n_2grams")
    dup_frac = (F.col("n_2grams") - F.col("n_distinct_2grams")) / F.col("n_2grams")
    return pd.join(tk, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_2grams",
        "top_2gram_count",
        top_frac.alias("top_2gram_frac"),
        dup_frac.alias("dup_2gram_frac"),
        (
            (F.col("n_tokens") - F.col("n_distinct_tokens")) / F.col("n_tokens")
        ).alias("dup_token_frac"),
        (
            (top_frac > REPETITION_THRESHOLD) | (dup_frac > REPETITION_THRESHOLD)
        ).alias("is_repetitive"),
    )


def _long_shingles_all(toks: Column, k: int) -> Column:
    """Like ``_long_shingles`` but KEEPING duplicates — frequency-based
    metrics need every instance, not the distinct set."""
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# Embedding int8 quantization.
# ---------------------------------------------------------------------------
@query(
    "embedding_int8_quant",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, scale,
             CAST(len(embedding) AS INT) AS n_dims,
             CASE WHEN scale = 0
                  THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(embedding,
                         x -> greatest(CAST(-127 AS BIGINT),
                                least(CAST(127 AS BIGINT),
                                  CAST(floor(CAST(x AS DOUBLE) / scale + 0.5)
                                       AS BIGINT))))
             END AS qv
      FROM s
    )
    SELECT vec_id, n_dims, CAST(scale AS DOUBLE) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS sum_q,
           CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT)
             AS n_saturated
    FROM q
    """,
)
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    the 4×-compression pass a 100 TB vector corpus applies before
    serving (int8 dot products, SIMD-friendly).

    ``scale = max|v| / 127``; each component quantizes as
    ``floor(v/scale + 0.5)`` clamped to [-127, 127]. ``floor(x+0.5)``
    — NOT ``round`` — is the quantizer on purpose: both engines floor
    the identical IEEE double, whereas ``round(double)`` diverges at
    representational half-boundaries (Spark rounds the shortest
    decimal repr, DuckDB the binary value — hard-won rule #1). The
    all-zero vector degenerates to scale 0 and an all-zero code.

    The gate row carries exact-integer integrity counters (component
    sum, saturation count) plus the scale; the full quantized array is
    a narrow projection away. No shuffle — pure per-row array math in
    the scan projection.
    """
    e = t(spark, sf_dir, "embeddings")
    dbl = lambda x: x.cast("double")  # noqa: E731
    scale = (
        F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(dbl(x))))
        / 127.0
    )
    s = e.select("vec_id", "embedding", scale.alias("scale"))
    quant = F.when(
        F.col("scale") == 0,
        F.transform(F.col("embedding"), lambda x: F.lit(0).cast("bigint")),
    ).otherwise(
        F.transform(
            F.col("embedding"),
            lambda x: F.greatest(
                F.lit(-127).cast("bigint"),
                F.least(
                    F.lit(127).cast("bigint"),
                    F.floor(dbl(x) / F.col("scale") + 0.5),
                ),
            ),
        )
    )
    q = s.select(
        "vec_id",
        F.size("embedding").cast("int").alias("n_dims"),
        F.col("scale").cast("double").alias("scale"),
        quant.alias("qv"),
    )
    return q.select(
        "vec_id",
        "n_dims",
        "scale",
        F.aggregate(
            "qv", F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("sum_q"),
        F.size(F.filter("qv", lambda x: F.abs(x) == 127))
        .cast("bigint")
        .alias("n_saturated"),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mix sampling (τ=2 square-root flattening).
# ---------------------------------------------------------------------------
@query(
    "temperature_mix_sample",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    mn AS (SELECT MIN(n) AS n_min FROM counts),
    hashed AS (
      SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    )
    SELECT b.doc_id, b.lang
    FROM (SELECT doc_id, lang, {_bucket16_duck()} AS bucket16 FROM hashed) b
    JOIN counts c ON b.lang = c.lang CROSS JOIN mn
    WHERE b.bucket16 < floor(65536 * sqrt(mn.n_min) / sqrt(c.n))
    """,
)
def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root temperature mix (τ=2): downsample each language
    stratum to ``sqrt(n_min · n_s)`` documents, flattening the corpus
    mix toward the sqrt distribution — the standard multilingual
    rebalancing between proportional (τ=1, majority-dominated) and
    uniform (τ→∞, minority-overfit). The minority stratum keeps 100%;
    a stratum k× larger keeps sqrt(k)× more documents, not k×.

    τ=2 exactly because every operation stays cross-engine-exact:
    sqrt, multiply, divide are IEEE correctly-rounded in both engines,
    so the per-stratum 16-bit hash threshold is bit-identical (general
    τ needs pow(), whose last-ulp rounding is libm-specific — the
    engine rule is: never put a non-correctly-rounded function on a
    keep/drop boundary). Same plan shape as
    ``stratified_rebalance_sample``: one tiny counts aggregate
    broadcast back over a narrow corpus scan — the corpus itself never
    shuffles.
    """
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n"))
    mn = counts.agg(F.min("n").alias("n_min"))
    hashed = d.select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    bucket16 = F.expr(_bucket16_spark())
    return (
        hashed.select("doc_id", "lang", bucket16.alias("bucket16"))
        .join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(mn))
        .filter(
            F.col("bucket16")
            < F.floor(65536 * F.sqrt(F.col("n_min")) / F.sqrt(F.col("n")))
        )
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# Curation funnel: staged keep/drop accounting.
# ---------------------------------------------------------------------------
#: funnel thresholds (length bounds, language allowlist, min distinct-
#: token ratio as an exact fraction 3/10 — division-free comparison).
FUNNEL_MIN_CHARS, FUNNEL_MAX_CHARS = 80, 500
FUNNEL_LANGS = ("en", "es", "de", "fr")


@query(
    "curation_funnel",
    oracle=f"""
    WITH flags AS (
      SELECT doc_id,
             (n_chars BETWEEN {FUNNEL_MIN_CHARS} AND {FUNNEL_MAX_CHARS}) AS f_len,
             lang IN ('en','es','de','fr') AS f_lang,
             (CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) * 10
              >= CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) * 3) AS f_rep,
             md5(text) AS h
      FROM documents
    ),
    dedup AS (
      SELECT *,
             doc_id = MIN(CASE WHEN f_len AND f_lang AND f_rep THEN doc_id END)
                        OVER (PARTITION BY h) AS f_dedup
      FROM flags
    ),
    agg AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n0,
        CAST(COUNT(*) FILTER (WHERE f_len) AS BIGINT) AS n1,
        CAST(COUNT(*) FILTER (WHERE f_len AND f_lang) AS BIGINT) AS n2,
        CAST(COUNT(*) FILTER (WHERE f_len AND f_lang AND f_rep) AS BIGINT) AS n3,
        CAST(COUNT(*) FILTER (WHERE f_len AND f_lang AND f_rep AND f_dedup) AS BIGINT) AS n4
      FROM dedup
    )
    SELECT stage_order, stage, docs_in, docs_dropped, docs_out FROM (
      SELECT 1 AS stage_order, 'length' AS stage, n0 AS docs_in, n0 - n1 AS docs_dropped, n1 AS docs_out FROM agg
      UNION ALL
      SELECT 2, 'language', n1, n1 - n2, n2 FROM agg
      UNION ALL
      SELECT 3, 'repetition', n2, n2 - n3, n3 FROM agg
      UNION ALL
      SELECT 4, 'exact_dedup', n3, n3 - n4, n4 FROM agg
    )
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential curation funnel with per-stage drop accounting —
    the "where did my corpus go" report every training-data pipeline
    publishes beside its output: length bounds → language allowlist →
    repetition (distinct-token ratio, division-free) → exact dedup
    (keep the smallest doc_id per md5(text) among survivors).

    One corpus scan computes all four stage flags; the dedup flag is
    one window over md5(text) (shuffles on the hash — at 100 TB this
    is the same exchange an exact-dedup groupBy would pay, and the
    only one in the plan); the funnel rows come from a single
    conditional aggregate unpivoted with ``stack``. Sequential
    semantics are exact: stage i counts only survivors of stages < i.
    """
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    flags = d.select(
        "doc_id",
        F.col("n_chars").between(FUNNEL_MIN_CHARS, FUNNEL_MAX_CHARS).alias("f_len"),
        F.col("lang").isin(*FUNNEL_LANGS).alias("f_lang"),
        (
            F.size(F.array_distinct(toks)).cast("bigint") * 10
            >= F.size(toks).cast("bigint") * 3
        ).alias("f_rep"),
        F.md5("text").alias("h"),
    )
    surv3 = F.col("f_len") & F.col("f_lang") & F.col("f_rep")
    dedup = flags.withColumn(
        "f_dedup",
        F.col("doc_id")
        == F.min(F.when(surv3, F.col("doc_id"))).over(W.partitionBy("h")),
    )
    agg = dedup.agg(
        F.count("*").cast("bigint").alias("n0"),
        F.count(F.when(F.col("f_len"), 1)).cast("bigint").alias("n1"),
        F.count(F.when(F.col("f_len") & F.col("f_lang"), 1))
        .cast("bigint")
        .alias("n2"),
        F.count(F.when(surv3, 1)).cast("bigint").alias("n3"),
        F.count(F.when(surv3 & F.col("f_dedup"), 1)).cast("bigint").alias("n4"),
    )
    return agg.selectExpr(
        """stack(4,
             1, 'length',      n0, n0 - n1, n1,
             2, 'language',    n1, n1 - n2, n2,
             3, 'repetition',  n2, n2 - n3, n3,
             4, 'exact_dedup', n3, n3 - n4, n4
           ) AS (stage_order, stage, docs_in, docs_dropped, docs_out)"""
    )


# ---------------------------------------------------------------------------
# Training shards: deterministic global shuffle + contiguous sharding.
# ---------------------------------------------------------------------------
#: number of output shards for the training-mix writer.
N_SHARDS = 8


@query(
    "training_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_toks
      FROM documents
    ),
    s AS (
      SELECT *, CAST(NTILE({N_SHARDS}) OVER (ORDER BY h, doc_id) AS INT)
                  AS shard_id
      FROM h
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           MIN(h) AS first_hash, MAX(h) AS last_hash
    FROM s GROUP BY shard_id
    """,
)
def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus into {N_SHARDS}
    equal-count training shards, with per-shard document/token
    accounting — the writer stage that turns a curated corpus into
    the randomized, evenly-sized files a training job streams.

    The "shuffle" is an ordering by md5(doc_id): content-independent,
    reproducible, and uniform, so contiguous equal-count ranges ARE a
    random partition of the corpus. A global NTILE window would
    compute this on ONE task; instead the plan derives the identical
    assignment scalably — two-pass count-offset sharding:

    1. bucket every row by its first two hash hex chars (256 ordered
       ranges of the hash space — a prefix of the sort key, so bucket
       order IS global order);
    2. per-bucket row_number (a PARTITIONED window — parallel) plus a
       broadcast 256-row cumulative-offset table gives each row its
       exact global index without any global sort;
    3. arithmetic maps the 1-based index to its NTILE bucket (first
       ``n % k`` shards take one extra row).

    The result is bit-identical to the single-task NTILE (the oracle
    states it that way), but every corpus-sized stage partitions. The
    hash-range min/max per shard double as the manifest entries a
    resumable writer checkpoints.
    """
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    h = d.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(toks).cast("bigint").alias("n_toks"),
    ).withColumn("bucket", F.substring("h", 1, 2))
    # pass 1: bucket counts -> cumulative offsets (256 rows, trivial)
    offsets = (
        h.groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            "bucket",
            (
                F.sum("cnt").over(
                    W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
                )
            ).alias("offset"),
            F.sum("cnt").over(W.orderBy("bucket").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )).alias("n_total"),
        )
        .na.fill({"offset": 0})
    )
    # pass 2: partitioned row_number + offset = exact global index
    idx = (
        h.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "gidx",
            F.row_number().over(W.partitionBy("bucket").orderBy("h", "doc_id"))
            + F.col("offset"),
        )
    )
    # NTILE arithmetic on the exact global index (integer div, no
    # doubles): per = floor(n/k); the first rem = n%k shards take
    # per+1 rows each.
    shard = F.expr(
        f"""CAST(CASE
              WHEN gidx <= (n_total % {N_SHARDS}) * ((n_total DIV {N_SHARDS}) + 1)
              THEN (gidx - 1) DIV ((n_total DIV {N_SHARDS}) + 1)
              ELSE (n_total % {N_SHARDS})
                   + (gidx - (n_total % {N_SHARDS}) * ((n_total DIV {N_SHARDS}) + 1) - 1)
                     DIV (n_total DIV {N_SHARDS})
            END + 1 AS INT)"""
    )
    s = idx.withColumn("shard_id", shard)
    return s.groupBy("shard_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.min("h").alias("first_hash"),
        F.max("h").alias("last_hash"),
    )


# ---------------------------------------------------------------------------
# Duplicate-span report: substring-level cross-document duplication.
# ---------------------------------------------------------------------------
#: span length in tokens for the duplicated-substring report (long
#: enough that chance collisions are negligible, like DECONTAM_K).
DUP_SPAN_K = 8


@query(
    "duplicate_span_report",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(toks) - {DUP_SPAN_K} + 2),
               i -> array_to_string(list_slice(toks, i, i + {DUP_SPAN_K} - 1),
                                    ' '))) AS g
      FROM toks WHERE len(toks) >= {DUP_SPAN_K}
    ),
    dupg AS (
      SELECT g FROM grams GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_grams
      FROM grams JOIN dupg USING (g) GROUP BY doc_id
    ),
    totals AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
      FROM grams GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_grams,
           COALESCE(p.n_dup_grams, 0) AS n_dup_grams,
           CAST(COALESCE(p.n_dup_grams, 0) AS DOUBLE)
             / CAST(t.n_grams AS DOUBLE) AS dup_fraction
    FROM totals t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
    """,
)
def duplicate_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication report: for every document, how many
    of its {DUP_SPAN_K}-token spans also occur in ANOTHER document —
    the C4/RefinedWeb-style signal that drives span-level (not
    whole-document) dedup decisions, one level finer than
    ``exact_dedup`` and one level coarser than suffix arrays.

    Cross-doc duplication per gram is detected with min(doc)≠max(doc)
    — two exact extremes instead of a COUNT DISTINCT, so the gram
    aggregate stays a cheap map-side-collapsing pair. The per-doc
    recount joins the exploded grams back on the gram key and reuses
    the same hash partitioning Catalyst already produced for the
    aggregate. dup_fraction divides two exact bigint-derived doubles.
    At 100 TB the gram explosion is the dominant shuffle (≈ tokens ×
    1 rows); production caps it by hashing grams to fixed-width longs
    first — the md5-hex key here keeps the oracle exact instead.
    """
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
        ).alias("toks"),
    ).filter(F.size("toks") >= DUP_SPAN_K)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (DUP_SPAN_K - 1)),
                lambda i: F.array_join(F.slice("toks", i, DUP_SPAN_K), " "),
            )
        ).alias("g"),
    )
    dupg = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("g")
    )
    per_doc = (
        grams.join(dupg, "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_dup_grams"))
    )
    totals = grams.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .na.fill({"n_dup_grams": 0})
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            (
                F.col("n_dup_grams").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("dup_fraction"),
        )
    )


# ---------------------------------------------------------------------------
# Composed stage: the decontaminated training keep-list.
# ---------------------------------------------------------------------------
def _decontaminated_split_oracle() -> str:
    from .registry import REGISTRY

    contam = REGISTRY["decontamination_ngram_overlap"].oracle.rstrip()
    return f"""
    WITH contam AS ({contam}),
    split AS (
      SELECT doc_id, lang, {_bucket_sql(_hex_val_duck)} AS bucket
      FROM (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents)
    )
    SELECT s.doc_id, s.lang,
           CAST(COALESCE(c.n_contaminated_shingles, 0) AS BIGINT)
             AS n_contaminated_shingles,
           c.n_contaminated_shingles IS NULL AS kept
    FROM split s LEFT JOIN contam c ON s.doc_id = c.doc_id
    WHERE s.bucket < {TRAIN_PCT}
    """


@query("decontaminated_train_split", oracle=_decontaminated_split_oracle())
def decontaminated_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-list a training run actually consumes: the hashed
    train split (``train_test_split``) anti-joined against the
    benchmark-leakage scan (``decontamination_ngram_overlap``) — one
    row per train document with its contamination count and the final
    ``kept`` verdict.

    This pins the COMPOSITION, not just the stages: the stages are
    oracle-matched individually, but a real pipeline chains them, and
    the chain has its own failure modes (key drift between stages,
    filter polarity, dropped-vs-flagged semantics). Plan: the
    contamination side is output-small (documents with shared 8-grams
    only), so AQE broadcasts it into the split scan — composing the
    stages adds no shuffle over running them alone.
    """
    from .registry import REGISTRY

    split = REGISTRY["train_test_split"].fn(spark, sf_dir)
    contam = decontamination_ngram_overlap(spark, sf_dir).select(
        "doc_id", "n_contaminated_shingles"
    )
    train = split.filter(F.col("split") == "train").select("doc_id", "lang")
    return train.join(contam, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("n_contaminated_shingles"), F.lit(0))
        .cast("bigint")
        .alias("n_contaminated_shingles"),
        F.col("n_contaminated_shingles").isNull().alias("kept"),
    )


# ---------------------------------------------------------------------------
# Winsorization: order-statistic outlier clipping per group.
# ---------------------------------------------------------------------------
@query(
    "winsorize_values",
    oracle="""
    WITH ranked AS (
      SELECT event_id, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bounds AS (
      SELECT event_type,
             MAX(CASE WHEN rn = GREATEST(CAST(ceil(0.05 * n) AS BIGINT), 1)
                      THEN value END) AS lo,
             MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                      THEN value END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT r.event_id, r.event_type, r.value,
           LEAST(GREATEST(r.value, b.lo), b.hi) AS clipped,
           (r.value < b.lo OR r.value > b.hi) AS was_clipped
    FROM ranked r JOIN bounds b ON r.event_type = b.event_type
    """,
)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization at the 5th/95th percentile — the
    outlier-clipping step a feature pipeline runs before
    normalization, stated on ORDER STATISTICS (the value at rank
    ⌈q·n⌉) rather than interpolated percentiles.

    The order-statistic form is what makes this gateable AND
    scale-honest: interpolation arithmetic differs across engines
    (and percentile_cont needs a full sort anyway), while "the k-th
    smallest value" is an exact, engine-neutral contract; clipped
    values are always EXISTING data values, so no new floats are
    manufactured. Plan: one ranked window per group + a tiny bounds
    aggregate joined back (AQE broadcasts it — group count is the
    event-type cardinality).
    """
    e = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("event_type")).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn")
                == F.greatest(
                    F.ceil(0.05 * F.col("n")).cast("bigint"), F.lit(1)
                ),
                F.col("value"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("hi"),
    )
    return ranked.join(bounds, "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "clipped"
        ),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "was_clipped"
        ),
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding (leak-free categorical feature).
# ---------------------------------------------------------------------------
@query(
    "loo_target_encoding",
    oracle="""
    WITH labeled AS (
      SELECT event_id, user_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS target
      FROM events
    ),
    stats AS (
      SELECT user_id, CAST(SUM(target) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM labeled GROUP BY user_id
    )
    SELECT l.event_id, l.user_id, CAST(l.target AS INT) AS target,
           CASE WHEN st.n > 1
                THEN CAST(st.s - l.target AS DOUBLE)
                     / CAST(st.n - 1 AS DOUBLE)
           END AS loo_rate
    FROM labeled l JOIN stats st ON l.user_id = st.user_id
    """,
)
def loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of ``user_id`` against the
    purchase label: each event's feature is the purchase RATE of the
    same user's OTHER events — (Σtarget − own)/(n−1) — the standard
    leak-free categorical encoding for tabular training data.

    Exactness: targets are 0/1 integers, so the LOO numerator and
    denominator are exact integers and the single int/int IEEE
    division is bit-identical in both engines — no fp aggregation
    anywhere. Plan: one groupBy on the category key + a key-partitioned
    join back; singleton categories yield NULL (no other rows to
    borrow from), pinned by the oracle's CASE.
    """
    e = t(spark, sf_dir, "events")
    labeled = e.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "target"
        ),
    )
    stats = labeled.groupBy("user_id").agg(
        F.sum("target").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    return labeled.join(stats, "user_id").select(
        "event_id",
        "user_id",
        F.col("target").cast("int").alias("target"),
        F.when(
            F.col("n") > 1,
            (F.col("s") - F.col("target")).cast("double")
            / (F.col("n") - 1).cast("double"),
        ).alias("loo_rate"),
    )


# ---------------------------------------------------------------------------
# Weighted systematic sampling (token-budget-proportional, integer-exact).
# ---------------------------------------------------------------------------
#: systematic-sample size (number of selection strata over the corpus).
SYS_SAMPLE_K = 50


@query(
    "weighted_systematic_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_toks,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    c AS (
      SELECT *,
             CAST(COALESCE(SUM(n_toks) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before,
             CAST(SUM(n_toks) OVER () AS BIGINT) AS total
      FROM w
    )
    SELECT doc_id, lang, n_toks, cum_before
    FROM c
    WHERE ((cum_before + n_toks) * {SYS_SAMPLE_K}) // total
        > (cum_before * {SYS_SAMPLE_K}) // total
    """,
)
def weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted systematic sample: order the corpus by a
    deterministic hash, lay documents end-to-end on the token axis,
    and select every document whose token interval crosses one of
    {SYS_SAMPLE_K} equally spaced strata — inclusion probability
    ∝ token count, documents longer than one stratum are selected
    with certainty. This is how a training-mix builder subsamples to
    a TOKEN budget rather than a document budget (uniform doc
    sampling over-represents short documents in token space).

    Exactness: the crossing test is pure integer arithmetic —
    ``floor(cum_after·K/total) > floor(cum_before·K/total)`` with
    bigint products (never a double division, never a rounded
    stratum width), so both engines select the identical set. Plan:
    one narrow scan for weights, one two-phase range shuffle for the
    exclusive running sum (``global_cumsum`` — partition-local windows
    plus broadcast prefix offsets, no single-partition WindowExec),
    and the crossing filter is stateless per row.
    """
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    w = d.select(
        "doc_id",
        "lang",
        F.when(F.col("text").isNotNull(), F.size(toks))
        .cast("bigint")
        .alias("n_toks"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    from ..operators.global_order import global_cumsum

    # two-phase exclusive running sum — no single-partition WindowExec
    cum = global_cumsum(
        w, ["h", "doc_id"], "n_toks", out="cum_before", inclusive=False
    )
    tot = w.agg(F.sum("n_toks").cast("bigint").alias("total"))
    c = cum.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "lang",
        "n_toks",
        F.col("cum_before").cast("bigint").alias("cum_before"),
        "total",
    )
    crossed = F.expr(
        f"((cum_before + n_toks) * {SYS_SAMPLE_K}) DIV total"
        f" > (cum_before * {SYS_SAMPLE_K}) DIV total"
    )
    return c.filter(crossed).select("doc_id", "lang", "n_toks", "cum_before")


# ---------------------------------------------------------------------------
# Token-budget apportionment (largest-remainder / Hamilton method).
# ---------------------------------------------------------------------------
#: total training-token budget the mixture plan apportions (spans
#: multiple corpus epochs by design — the data-constrained regime).
TRAIN_BUDGET = 1_000_000


@query(
    "quality_weighted_mixture",
    oracle=f"""
    WITH feats AS (
      SELECT source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_words,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
               AS n_word_chars
      FROM documents
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_words) AS BIGINT) AS n_toks,
             CAST(SUM(CASE WHEN 3 * n_words <= n_word_chars
                            AND n_word_chars <= 10 * n_words
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM feats GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, n_toks, n_pass,
             (n_toks * n_pass) // n_docs AS eff_toks
      FROM s
    ),
    tot AS (SELECT CAST(SUM(eff_toks) AS BIGINT) AS wt FROM w),
    base AS (
      SELECT source, n_docs, n_toks, n_pass, eff_toks,
             ({TRAIN_BUDGET} * eff_toks) // t.wt AS base_alloc,
             ({TRAIN_BUDGET} * eff_toks) % t.wt AS remainder
      FROM w CROSS JOIN tot t
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY remainder DESC, source) AS rk,
             {TRAIN_BUDGET} - SUM(base_alloc) OVER () AS leftover
      FROM base
    )
    SELECT source,
           CAST(n_toks AS BIGINT) AS n_toks,
           CAST(eff_toks AS BIGINT) AS eff_toks,
           CAST(base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens,
           CAST((base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                 + n_toks - 1) // n_toks AS BIGINT) AS repeats
    FROM ranked
    """,
)
def quality_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-DISCOUNTED training mix (the DoReMi intuition without
    the proxy-model loop): each source's sampling mass is its token
    count scaled by its quality pass-rate — ``eff_toks = n_toks ·
    n_pass / n_docs`` in exact integer arithmetic (the C4 length-band
    rule from ``source_quality_scorecard`` as the quality gate) — and
    the {TRAIN_BUDGET}-token budget is apportioned by largest
    remainder over THOSE. A source that is half boilerplate gets half
    its proportional share; ``repeats`` again reads out the
    data-constrained epochs. Companion to ``mixture_epoch_plan``
    (temperature flattening); a production mix applies both dials.

    Exactness: the discount is integer floor arithmetic (products ≤
    n_toks·n_docs ≪ 2⁶³), apportionment pure bigint — no float
    anywhere. Plan: one per-row feature map in codegen, one
    groupBy(source), broadcast total, window over the source-grain
    table.
    """
    d = t(spark, sf_dir, "documents")
    feats = d.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "n_words"
        ),
        F.length(F.regexp_replace(F.col("text"), r"\s", ""))
        .cast("bigint")
        .alias("n_word_chars"),
    )
    src = feats.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_toks"),
        F.sum(
            F.when(
                (3 * F.col("n_words") <= F.col("n_word_chars"))
                & (F.col("n_word_chars") <= 10 * F.col("n_words")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_pass"),
    )
    w = src.select(
        "source",
        "n_docs",
        "n_toks",
        "n_pass",
        F.expr("(n_toks * n_pass) DIV n_docs").cast("bigint").alias("eff_toks"),
    )
    tot = w.agg(F.sum("eff_toks").cast("bigint").alias("wt"))
    b = F.lit(TRAIN_BUDGET).cast("bigint")
    base = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_toks",
        "eff_toks",
        F.expr(f"(CAST({TRAIN_BUDGET} AS BIGINT) * eff_toks) DIV wt")
        .cast("bigint")
        .alias("base_alloc"),
        ((b * F.col("eff_toks")) % F.col("wt")).alias("remainder"),
    )
    ranked = base.select(
        "source",
        "n_toks",
        "eff_toks",
        "base_alloc",
        F.row_number()
        .over(W.orderBy(F.col("remainder").desc(), "source"))
        .alias("rk"),
        (b - F.sum("base_alloc").over(W.partitionBy())).alias("leftover"),
    )
    return ranked.select(
        "source",
        "n_toks",
        "eff_toks",
        (
            F.col("base_alloc")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
        F.expr(
            "CAST((base_alloc + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END)"
            " + n_toks - 1) DIV n_toks AS BIGINT)"
        ).alias("repeats"),
    )


@query(
    "mixture_epoch_plan",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                  AS BIGINT) AS n_toks
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_toks,
             CAST(floor(sqrt(CAST(n_toks AS DOUBLE)) * 1000) AS BIGINT)
               AS weight_milli
      FROM s
    ),
    tot AS (SELECT CAST(SUM(weight_milli) AS BIGINT) AS wt FROM w),
    base AS (
      SELECT source, n_toks, weight_milli,
             ({TRAIN_BUDGET} * weight_milli) // t.wt AS base_alloc,
             ({TRAIN_BUDGET} * weight_milli) % t.wt AS remainder
      FROM w CROSS JOIN tot t
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY remainder DESC, source) AS rk,
             {TRAIN_BUDGET} - SUM(base_alloc) OVER () AS leftover
      FROM base
    )
    SELECT source,
           CAST(n_toks AS BIGINT) AS n_toks,
           CAST(weight_milli AS BIGINT) AS weight_milli,
           CAST(base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens,
           CAST((base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                 + n_toks - 1) // n_toks AS BIGINT) AS repeats
    FROM ranked
    """,
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix EPOCH PLAN under temperature flattening: each
    source's sampling weight is ``floor(sqrt(n_tokens)·1000)`` (the
    α=0.5 temperature that up-weights small sources relative to
    proportional mixing — the multilingual-sampling convention), a
    {TRAIN_BUDGET}-token training budget is apportioned by largest
    remainder (sums to the budget EXACTLY), and ``repeats`` =
    ceil(alloc / n_tokens) reports how many epochs each source is seen
    — the data-constrained-scaling readout (a source repeated 10×
    while another is seen 0.3 epochs is a mix bug a plan review
    catches before a training run pays for it).

    Cross-engine exactness: α=0.5 is deliberate — sqrt is correctly
    rounded in IEEE 754 so both engines produce the identical double
    (a general pow() is only 1-ulp and would diverge), and the
    ×1000-floor lands in exact bigints before any summation; the
    apportionment is pure integer arithmetic thereafter. Plan: one
    groupBy(source), a broadcast total, a window over the per-source
    table (source-grain, tiny).
    """
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    src = (
        d.select("source", F.size(toks).cast("bigint").alias("t"))
        .groupBy("source")
        .agg(F.sum("t").cast("bigint").alias("n_toks"))
        .select(
            "source",
            "n_toks",
            F.floor(F.sqrt(F.col("n_toks").cast("double")) * 1000)
            .cast("bigint")
            .alias("weight_milli"),
        )
    )
    tot = src.agg(F.sum("weight_milli").cast("bigint").alias("wt"))
    b = F.lit(TRAIN_BUDGET).cast("bigint")
    base = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_toks",
        "weight_milli",
        F.expr(f"(CAST({TRAIN_BUDGET} AS BIGINT) * weight_milli) DIV wt")
        .cast("bigint")
        .alias("base_alloc"),
        ((b * F.col("weight_milli")) % F.col("wt")).alias("remainder"),
    )
    ranked = base.select(
        "source",
        "n_toks",
        "weight_milli",
        "base_alloc",
        F.row_number()
        .over(W.orderBy(F.col("remainder").desc(), "source"))
        .alias("rk"),
        (b - F.sum("base_alloc").over(W.partitionBy())).alias("leftover"),
    )
    alloc = F.col("base_alloc") + F.when(
        F.col("rk") <= F.col("leftover"), 1
    ).otherwise(0)
    return ranked.select(
        "source",
        "n_toks",
        "weight_milli",
        alloc.cast("bigint").alias("alloc_tokens"),
        F.expr(
            "CAST((base_alloc + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END)"
            " + n_toks - 1) DIV n_toks AS BIGINT)"
        ).alias("repeats"),
    )


@query(
    "token_budget_apportionment",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                  AS BIGINT) AS n_toks
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS total FROM s),
    base AS (
      SELECT source, n_toks,
             ({MIX_BUDGET} * n_toks) // t.total AS base_alloc,
             ({MIX_BUDGET} * n_toks) % t.total AS remainder,
             t.total
      FROM s CROSS JOIN tot t
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY remainder DESC, source) AS rk,
             {MIX_BUDGET} - SUM(base_alloc) OVER () AS leftover
      FROM base
    )
    SELECT source, n_toks,
           CAST(base_alloc AS BIGINT) AS base_alloc,
           CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS extra,
           CAST(base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked
    """,
)
def token_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a {MIX_BUDGET}-token
    training budget across sources, proportional to each source's token
    mass: ``base = floor(B·n_i/N)``, then the leftover tokens go one
    each to the sources with the largest integer remainders (ties by
    source name). The allocations sum to B exactly — the property a mix
    config needs and naive per-source rounding does not give.

    This is the integerization step between "mix weights" (DoReMi-style
    proportions) and an actual sampler: every downstream stage consumes
    whole-token (or whole-document) budgets. All arithmetic is bigint
    (products ≤ B·N ≈ 10¹¹ here, far under 2⁶³); the only float
    anywhere is none. Plan: one groupBy(source) aggregate, a broadcast
    total, and a window over the (tiny) per-source table.
    """
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    s = d.select("source", F.size(toks).cast("bigint").alias("t")).groupBy(
        "source"
    ).agg(F.sum("t").cast("bigint").alias("n_toks"))
    tot = s.agg(F.sum("n_toks").cast("bigint").alias("total"))
    b = F.lit(MIX_BUDGET).cast("bigint")
    base = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_toks",
        F.expr(f"(CAST({MIX_BUDGET} AS BIGINT) * n_toks) DIV total")
        .cast("bigint")
        .alias("base_alloc"),
        ((b * F.col("n_toks")) % F.col("total")).alias("remainder"),
    )
    ranked = base.select(
        "source",
        "n_toks",
        "base_alloc",
        "remainder",
        F.row_number()
        .over(W.orderBy(F.col("remainder").desc(), "source"))
        .alias("rk"),
        (b - F.sum("base_alloc").over(W.partitionBy())).alias("leftover"),
    )
    extra = F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "source",
        "n_toks",
        "base_alloc",
        extra.cast("bigint").alias("extra"),
        (F.col("base_alloc") + extra).cast("bigint").alias("alloc"),
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality (zlib) — the low-information-content gate.
# ---------------------------------------------------------------------------
def _compression_pinned_oracle() -> str:
    from .pinned_oracles import compression_oracle

    return compression_oracle()


@query("compression_ratio_quality", oracle=_compression_pinned_oracle)
def compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio — the CCNet/RedPajama-style
    low-information gate: machine-generated boilerplate and repeated
    spans compress far below natural prose, so a low
    compressed/uncompressed ratio flags junk that token-level
    heuristics (``repetition_quality``) miss, and an abnormally HIGH
    ratio flags random noise.

    DuckDB has no zlib, so the oracle is a PINNED-VALUES table
    (``pinned_oracles``): the corpus is re-compressed with CPython's
    zlib at oracle-build time (level 6 is deterministic per input, so
    the pin is exact), keyed by a corpus fingerprint that fails loudly
    on regeneration. The compensating direct pin stays in
    ``tests/test_new_ops_invariants.py``.

    Engine posture: this is the LEGITIMATE Python-UDF case — a
    C-library computation with no JVM expression equivalent — done the
    fast way: Arrow-batched Series→Series pandas_udf (one zlib call
    per row on batched data, no per-row Python round trip), integer
    outputs plus one IEEE division. At 100 TB it runs embarrassingly
    parallel in the scan projection, no shuffle.
    """
    # NOTE the module-global import: with postponed annotations the
    # pandas_udf type-hint strings must resolve in MODULE globals
    # (hard-won rule 16) — a function-local `import pandas` makes the
    # signature uninferable
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _compressed_bytes(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda s: len(zlib.compress(s.encode("utf-8"), 6))
            if s is not None
            else None
        )

    d = t(spark, sf_dir, "documents")
    n_bytes = F.octet_length("text").cast("bigint")
    out = d.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        _compressed_bytes(F.col("text")).alias("n_compressed"),
    )
    return out.select(
        "doc_id",
        "n_bytes",
        "n_compressed",
        (F.col("n_compressed").cast("double") / F.col("n_bytes").cast("double"))
        .alias("ratio"),
    )


# ---------------------------------------------------------------------------
# Token-budget admission per source (the budgeted quota gate).
# ---------------------------------------------------------------------------
#: per-source token budget for the admission gate.
ADMIT_TOKEN_BUDGET = 4096


@query(
    "token_budget_admission",
    oracle=f"""
    WITH tc AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source
                                      ORDER BY h, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tokens
      FROM tc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_admitted,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_admitted,
           CAST(MAX(cum_tokens) AS BIGINT) AS budget_used
    FROM ranked
    WHERE cum_tokens <= {ADMIT_TOKEN_BUDGET}
    GROUP BY source
    """,
)
def token_budget_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission control by TOKEN budget, not head-count: per source,
    admit documents in hashed-key order until the cumulative token
    count would exceed {ADMIT_TOKEN_BUDGET} — the gate a training-mix
    pipeline actually needs (``domain_quota_sample`` caps documents;
    budgets are spent in tokens, and sources with long documents
    exhaust theirs in fewer docs). The hashed-key order makes the
    admitted PREFIX a stable unbiased sample, exactly like the quota
    sample: re-running on a grown corpus only ever replaces admitted
    docs with earlier-hashing ones.

    Plan: one narrow token-count map, one window shuffle per source,
    a filter on the running sum — no collect, no iteration; the same
    shape as ``pack_sequences`` with the cumulative sum used as a gate
    instead of a bin assigner.
    """
    d = t(spark, sf_dir, "documents")
    # NULL-guarded: F.size returns -1 (not NULL) on NULL input under
    # default configs (spark.sql.legacy.sizeOfNull), which would corrupt
    # the running sum and diverge from the oracle's NULL-propagating
    # len(regexp_split_to_array(...)).
    n_tokens = F.when(
        F.col("text").isNotNull(),
        F.size(F.split(F.trim(F.col("text")), r"\s+")),
    ).cast("bigint")
    tc = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = tc.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
    )
    return (
        ranked.filter(F.col("cum_tokens") <= ADMIT_TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_admitted"),
            F.sum("n_tokens").cast("bigint").alias("tokens_admitted"),
            F.max("cum_tokens").cast("bigint").alias("budget_used"),
        )
    )


# ---------------------------------------------------------------------------
# Span-grain token-budget admission (trim BEFORE you spend the budget).
# ---------------------------------------------------------------------------
def _span_budget_oracle() -> str:
    from .dedup import _post_trim_oracle

    return f"""
    WITH post AS ({_post_trim_oracle()}),
    tc AS (
      SELECT p.doc_id, d.source, p.tokens_before, p.tokens_trimmed,
             p.tokens_after, md5(CAST(p.doc_id AS VARCHAR)) AS h
      FROM post p JOIN documents d ON p.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT source, tokens_before, tokens_trimmed, tokens_after,
             CAST(SUM(tokens_after) OVER (PARTITION BY source
                  ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_after,
             CAST(SUM(tokens_before) OVER (PARTITION BY source
                  ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_before
      FROM tc
    )
    SELECT source,
           CAST(SUM(CASE WHEN cum_after <= {ADMIT_TOKEN_BUDGET}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
           CAST(COALESCE(SUM(CASE WHEN cum_after <= {ADMIT_TOKEN_BUDGET}
                             THEN tokens_after END), 0) AS BIGINT)
             AS tokens_admitted,
           CAST(COALESCE(SUM(CASE WHEN cum_after <= {ADMIT_TOKEN_BUDGET}
                             THEN tokens_trimmed END), 0) AS BIGINT)
             AS tokens_trimmed_in_admitted,
           CAST(COALESCE(MAX(CASE WHEN cum_after <= {ADMIT_TOKEN_BUDGET}
                             THEN cum_after END), 0) AS BIGINT)
             AS budget_used,
           CAST(SUM(CASE WHEN cum_before <= {ADMIT_TOKEN_BUDGET}
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_admitted_pretrim,
           CAST(SUM(CASE WHEN cum_after <= {ADMIT_TOKEN_BUDGET}
                         THEN 1 ELSE 0 END)
                - SUM(CASE WHEN cum_before <= {ADMIT_TOKEN_BUDGET}
                           THEN 1 ELSE 0 END) AS BIGINT)
             AS extra_docs_admitted
    FROM ranked
    GROUP BY source
    """


@query("span_budget_admission", oracle=_span_budget_oracle)
def span_budget_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget admission on POST-TRIM token counts — the natural
    completion of the span-grain curation family (round-11 VERDICT
    task 4): ``span_trim_plan`` decides which shared verbatim spans to
    remove, ``post_trim_token_counts`` prices every document after
    removal, and this gate spends the per-source budget
    (``ADMIT_TOKEN_BUDGET``) on those post-trim prices — trimming
    boilerplate first means the same budget admits MORE documents.
    The ``n_admitted_pretrim`` / ``extra_docs_admitted`` columns state
    that dividend directly: how many extra documents each source fits
    once its docs stop paying for syndicated fragments.

    Admission order is the hashed-key prefix (same stability argument
    as ``token_budget_admission``: re-running on a grown corpus only
    replaces admitted docs with earlier-hashing ones, never reshuffles
    the whole sample). Both running sums (pre- and post-trim) share
    ONE window spec, so they cost a single per-source window pass.

    Scale: the trim plan upstream is LSH-candidate-bounded (shares
    ``_candidate_runs``); pricing is one doc_id-grain left join; the
    gate is one window shuffle keyed by source + a map-side-combinable
    rollup. Nothing corpus-quadratic, no collect, no Python in the
    hot path.
    """
    from .dedup import post_trim_token_counts

    post = post_trim_token_counts(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    tc = post.join(d, "doc_id").select(
        "source",
        "tokens_before",
        "tokens_trimmed",
        "tokens_after",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        "doc_id",
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = tc.select(
        "source",
        "tokens_before",
        "tokens_trimmed",
        "tokens_after",
        F.sum("tokens_after").over(w).cast("bigint").alias("cum_after"),
        F.sum("tokens_before").over(w).cast("bigint").alias("cum_before"),
    )
    fits = F.col("cum_after") <= ADMIT_TOKEN_BUDGET
    fits_pre = F.col("cum_before") <= ADMIT_TOKEN_BUDGET
    n_admitted = F.sum(F.when(fits, 1).otherwise(0)).cast("bigint")
    n_pre = F.sum(F.when(fits_pre, 1).otherwise(0)).cast("bigint")
    return ranked.groupBy("source").agg(
        n_admitted.alias("n_admitted"),
        F.coalesce(F.sum(F.when(fits, F.col("tokens_after"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_admitted"),
        F.coalesce(F.sum(F.when(fits, F.col("tokens_trimmed"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_trimmed_in_admitted"),
        F.coalesce(F.max(F.when(fits, F.col("cum_after"))), F.lit(0))
        .cast("bigint")
        .alias("budget_used"),
        n_pre.alias("n_admitted_pretrim"),
        (n_admitted - n_pre).cast("bigint").alias("extra_docs_admitted"),
    )
