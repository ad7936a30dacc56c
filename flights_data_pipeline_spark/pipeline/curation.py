"""Corpus-curation pipeline: the documents-table analogue of the
flights ETL DAG.

The query registry pins each curation stage's SEMANTICS against a
DuckDB oracle (``curation_funnel``, ``dedup_keep_list``,
``decontamination_ngram_overlap``, ``train_test_split``,
``training_shards``); this module is the ORCHESTRATION that a real
training-data run needs on top: stages materialized to parquet in
dependency order, later stages reading earlier stages' OUTPUT (the
DAG flows through storage, exactly like the reference pipeline's
landing → staging → warehouse hops, reference
``dags/flights_data_pipeline.py`` task ordering), overwrite-idempotent
reruns, and the same retry/failure-hook surface as
``runner.run_transforms`` (O-series).

Why materialize instead of composing lazily: at 100 TB each stage is
hours of work and a separate failure domain — a crashed decontamination
pass must NOT re-run the MinHash closure. Stage outputs are also the
audit surface (the keep-list parquet is what a compliance review reads).
Costs are per-stage and restartable; reruns overwrite deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.catalog import load_table as t
from ..queries.curation import (
    FUNNEL_LANGS,
    FUNNEL_MAX_CHARS,
    FUNNEL_MIN_CHARS,
    N_SHARDS,
    decontamination_ngram_overlap,
)
from ..queries.dedup import dedup_keep_list
from .runner import FailureCallback, _with_retries


def stage_doc_flags(spark: SparkSession, sf_dir: str, work: str) -> DataFrame:
    """Per-document quality gates — the funnel's single corpus scan
    (length bounds, language allowlist, division-free distinct-token
    repetition gate) plus the token count the packer/shard stages
    need. One narrow pass, no shuffle."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.col("n_chars")
        .between(FUNNEL_MIN_CHARS, FUNNEL_MAX_CHARS)
        .alias("f_len"),
        F.col("lang").isin(*FUNNEL_LANGS).alias("f_lang"),
        (
            F.size(F.array_distinct(toks)).cast("bigint") * 10
            >= F.size(toks).cast("bigint") * 3
        ).alias("f_rep"),
    )


def stage_dedup_verdicts(spark: SparkSession, sf_dir: str, work: str) -> DataFrame:
    """Exact ∧ near-dup keep verdicts — the oracle-matched
    ``dedup_keep_list`` composition (md5 exact winners ∧ MinHash-LSH
    closure representatives, unclustered docs default to keep)."""
    return dedup_keep_list(spark, sf_dir)


def stage_contamination(spark: SparkSession, sf_dir: str, work: str) -> DataFrame:
    """Benchmark-leakage scan — train-split docs sharing any long
    n-gram with the eval split (``decontamination_ngram_overlap``).
    Rows here are the CONTAMINATED docs; absence means clean."""
    return decontamination_ngram_overlap(spark, sf_dir)


def stage_curated_corpus(spark: SparkSession, sf_dir: str, work: str) -> DataFrame:
    """The final keep-list: quality gates ∧ dedup verdicts ∧ not
    contaminated, with the training-mix assignment (hashed shard id).

    Reads the PRIOR STAGES' parquet, not the raw corpus — at scale
    this join is doc-id-keyed over doc-level rows (corpus text is
    never re-read). Shard assignment is a stateless hash mod
    ``N_SHARDS`` (restartable and append-stable, unlike a global
    NTILE — the ``training_shards`` query pins the balanced-global
    variant; a daily pipeline prefers the stateless one so yesterday's
    shard assignment never changes)."""
    flags = spark.read.parquet(f"{work}/doc_flags")
    verdicts = spark.read.parquet(f"{work}/dedup_verdicts")
    contam = spark.read.parquet(f"{work}/contamination").select(
        "doc_id", F.lit(True).alias("contaminated")
    )
    hx = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(
        F.conv(F.substring(hx, 1, 4), 16, 10).cast("bigint"), F.lit(N_SHARDS)
    )
    joined = (
        flags.join(verdicts.select("doc_id", "kept"), "doc_id")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_toks",
            (
                F.col("f_len")
                & F.col("f_lang")
                & F.col("f_rep")
                & F.col("kept")
                & F.coalesce(~F.col("contaminated"), F.lit(True))
            ).alias("keep"),
            shard.cast("int").alias("shard_id"),
        )
    )
    return joined.filter(F.col("keep")).drop("keep")


def stage_curation_report(spark: SparkSession, sf_dir: str, work: str) -> DataFrame:
    """Funnel accounting over the materialized stages — the
    "where did my corpus go" report, derived from STAGE OUTPUTS so the
    numbers are auditable against the parquet a reviewer can read."""
    flags = spark.read.parquet(f"{work}/doc_flags")
    verdicts = spark.read.parquet(f"{work}/dedup_verdicts")
    contam = spark.read.parquet(f"{work}/contamination")
    final = spark.read.parquet(f"{work}/curated_corpus")
    n0 = flags.count()
    n_q = flags.filter("f_len AND f_lang AND f_rep").count()
    n_k = (
        flags.filter("f_len AND f_lang AND f_rep")
        .join(verdicts.filter("kept").select("doc_id"), "doc_id")
        .count()
    )
    n_c = contam.count()
    n_f = final.count()
    rows = [
        (1, "input", n0),
        (2, "quality_gates", n_q),
        (3, "dedup_keep", n_k),
        (4, "contaminated_flagged", n_c),
        (5, "final_corpus", n_f),
    ]
    return spark.createDataFrame(
        rows, "stage_order INT, stage STRING, docs BIGINT"
    )


#: stage name → builder, in dependency order (flags/verdicts/contam are
#: independent roots; corpus needs all three; report needs everything).
CURATION_STAGES = {
    "doc_flags": stage_doc_flags,
    "dedup_verdicts": stage_dedup_verdicts,
    "contamination": stage_contamination,
    "curated_corpus": stage_curated_corpus,
    "curation_report": stage_curation_report,
}
CURATION_ORDER = list(CURATION_STAGES)


def run_curation(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    retries: int = 0,
    on_failure: FailureCallback | None = None,
    resume: bool = False,
) -> dict[str, int]:
    """Materialize every curation stage to ``{out_dir}/{stage}`` in
    dependency order and return the report as ``{stage: docs}``.

    Same execution contract as ``runner.run_transforms``: per-stage
    retries with an alerting hook, mode("overwrite") writes so a rerun
    (or a replayed orchestrator task) converges to identical output —
    every stage is a deterministic function of the corpus, so the
    pipeline is idempotent end to end.

    ``resume=True`` skips any stage whose output already committed
    (parquet ``_SUCCESS`` marker present) — the restart-after-crash
    mode: at 100 TB a failed decontamination pass must not re-run the
    MinHash closure. A partially-written stage (no marker) re-runs;
    overwrite semantics make that safe.
    """
    import os

    for name in CURATION_ORDER:
        if resume and os.path.exists(f"{out_dir}/{name}/_SUCCESS"):
            continue

        def step(name: str = name) -> None:
            df = CURATION_STAGES[name](spark, sf_dir, out_dir)
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}")

        _with_retries(f"curation:{name}", step, retries, on_failure)

    # scale-ok: stage-count report rows (one per curation stage), never docs
    report = spark.read.parquet(f"{out_dir}/curation_report").collect()
    return {r["stage"]: r["docs"] for r in report}
