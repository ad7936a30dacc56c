"""Curation pipeline runner: materialized stage DAG over the corpus.

The stage SEMANTICS are oracle-gated through the query registry
(``curation_funnel``, ``dedup_keep_list``,
``decontamination_ngram_overlap``); these tests pin the ORCHESTRATION:
stage outputs land as parquet in dependency order, the final corpus is
exactly the conjunction of the materialized stage verdicts, reruns
converge (overwrite idempotency), and the retry/alert surface behaves
like ``run_transforms`` (O5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flights_data_pipeline_spark.pipeline import curation as cp

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curation"))
    report = cp.run_curation(spark, SF_DIR, out)
    return out, report


def test_all_stage_outputs_materialized(spark, curated):
    out, _ = curated
    # contamination may legitimately be empty on a clean corpus; every
    # other stage must carry rows (flags/verdicts cover every doc, the
    # corpus keeps some, the report always has its funnel rows)
    may_be_empty = {"contamination"}
    for name in cp.CURATION_ORDER:
        df = spark.read.parquet(f"{out}/{name}")
        n = df.count()
        assert n >= 0 if name in may_be_empty else n > 0, (name, n)


def test_final_corpus_is_conjunction_of_stage_verdicts(spark, curated):
    """Independent restatement: recompute the keep set from the
    MATERIALIZED stage parquet (not the pipeline's own join) and
    require exact equality with curated_corpus."""
    out, _ = curated
    flags = spark.read.parquet(f"{out}/doc_flags")
    verdicts = spark.read.parquet(f"{out}/dedup_verdicts")
    contam = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/contamination").collect()
    }
    kept = {r["doc_id"] for r in verdicts.filter("kept").collect()}
    qual = {
        r["doc_id"]
        for r in flags.filter("f_len AND f_lang AND f_rep").collect()
    }
    expected = (qual & kept) - contam
    final = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/curated_corpus").collect()
    }
    assert final == expected
    assert len(final) > 0  # the gate is not vacuous at sf0.001


def test_report_counts_match_parquet(spark, curated):
    out, report = curated
    assert report["input"] == spark.read.parquet(f"{out}/doc_flags").count()
    assert (
        report["final_corpus"]
        == spark.read.parquet(f"{out}/curated_corpus").count()
    )
    # funnel monotonicity: each curation gate only shrinks the corpus
    assert (
        report["input"]
        >= report["quality_gates"]
        >= report["dedup_keep"]
        >= report["final_corpus"]
    )


def test_shard_assignment_is_stable_and_bounded(spark, curated):
    out, _ = curated
    final = spark.read.parquet(f"{out}/curated_corpus")
    shards = final.select("shard_id").distinct().collect()
    assert all(0 <= r["shard_id"] < cp.N_SHARDS for r in shards)
    # stateless hash: recomputing the shard of any doc gives the same id
    re = final.withColumn(
        "re_shard",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16,
                10,
            ).cast("bigint"),
            F.lit(cp.N_SHARDS),
        ).cast("int"),
    )
    assert re.filter("shard_id != re_shard").count() == 0


def test_rerun_is_idempotent(spark, curated):
    out, report1 = curated
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{out}/curated_corpus").collect()
    )
    report2 = cp.run_curation(spark, SF_DIR, out)
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{out}/curated_corpus").collect()
    )
    assert report1 == report2
    assert before == after


def test_retry_and_failure_hook(spark, tmp_path_factory, monkeypatch):
    out = str(tmp_path_factory.mktemp("curation_fail"))
    attempts = {"n": 0}
    orig = cp.stage_doc_flags

    def flaky(spark_, sf_dir_, work_):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise RuntimeError("transient stage failure")
        return orig(spark_, sf_dir_, work_)

    monkeypatch.setitem(cp.CURATION_STAGES, "doc_flags", flaky)
    # one retry absorbs the transient failure; the hook must NOT fire
    calls: list[str] = []
    report = cp.run_curation(
        spark, SF_DIR, out, retries=1,
        on_failure=lambda step, exc: calls.append(step),
    )
    assert attempts["n"] == 2
    assert calls == []
    assert report["final_corpus"] > 0

    # zero retries: the hook fires once with the stage name, error raises
    attempts["n"] = 0
    out2 = str(tmp_path_factory.mktemp("curation_fail2"))
    with pytest.raises(RuntimeError, match="transient"):
        cp.run_curation(
            spark, SF_DIR, out2,
            on_failure=lambda step, exc: calls.append(step),
        )
    assert calls == ["curation:doc_flags"]


def test_resume_skips_committed_stages(spark, curated, monkeypatch):
    """resume=True must not re-execute stages whose output committed —
    the restart-after-crash contract (a failed late stage never re-runs
    the dedup closure)."""
    out, report = curated
    calls: list[str] = []
    orig = dict(cp.CURATION_STAGES)

    def tracking(name):
        def fn(spark_, sf_dir_, work_):
            calls.append(name)
            return orig[name](spark_, sf_dir_, work_)

        return fn

    for name in cp.CURATION_ORDER:
        monkeypatch.setitem(cp.CURATION_STAGES, name, tracking(name))
    report2 = cp.run_curation(spark, SF_DIR, out, resume=True)
    assert calls == []  # everything committed → nothing re-ran
    assert report2 == report
