#!/usr/bin/env python
"""Benchmark harness (M5, SURVEY.md §7.1 / BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], 2 warmups + 3 timed
runs per query, reports the median. Materialization uses the `noop`
sink so every output column is computed but nothing is collected to
the driver (collect would measure driver serialization, not the plan).

Two warmups, not one: generated-code-heavy queries (the md5-dense
minhash signature pass) need a second execution before HotSpot's C2
tier compiles their codegen — their first two runs measure the JIT,
not the plan (observed: 11 s → 6 s → 1.5 s steady). The cold protocol
below intentionally keeps that cliff visible.

Set SPARK_GRAFT_BENCH_COLD=1 for the cold protocol: no warmup, a
single timed run per query — the shape of a first-ever execution
(JIT/codegen/footer-cache misses included). Warm medians dodge
intermittent costs (GC from oversized broadcasts, one-off reopt); the
cold column is what catches them, so regressions are judged on both.

LSH-composer clan members (``registry.lsh_composer_clan()``) get the
``tools/iso_warm.py`` treatment instead — 5 warmups + driver GC
between EVERY run — because their warm plateau is session-heat
dependent: the 2-warmup protocol left headline clan rows swinging
2-4× round-over-round with no source change (round-11 VERDICT
"What's wrong #1"; BASELINE round-11 analysis). With the deep
treatment the headline row IS the isolated-warm yardstick.

Prints TWO JSON lines:
  1. full fidelity — {"metric", "value", "unit", "queries": {every
     headline query at 4 decimals}, "flights_pipeline_build_sec",
     "sf"} — also written to BENCH_headline_latest.json (repo root)
     so the complete per-query surface is a committed artifact.
  2. FINAL line, compact (<1 KB): the driver snapshots only the last
     2000 chars of stdout and parses the last line — a full-name
     76-query dict measures 2076+ chars (names alone are 1451), which
     is exactly why BENCH_r09..r11 carry ``parsed: null`` and why the
     round-12 compact line carried only the 14-row clan dict (leaving
     PERF_r12 blind: ``per_query: {}``). Per the round-12 VERDICT
     (Next round #1), the final line now carries EVERY headline query
     under a deterministic SHORT KEY (:func:`_short_key` — first
     letter of each underscore word, extended on collision), ~900
     chars total, so the driver's per-query and scaling comparisons
     see the full surface again. The short→full mapping is committed
     in BENCH_headline_latest.json (``short_keys``) next to the
     full-name dict, which remains line 1 verbatim (append-only,
     never renamed — the compact aliases are a transport encoding,
     not a rename).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from flights_data_pipeline_spark.queries import REGISTRY
from flights_data_pipeline_spark.queries.registry import lsh_composer_clan
from flights_data_pipeline_spark.session import get_spark

HEADLINE = [
    "watermark_scan",
    "pruned_projection",
    "dedup_latest",
    "multiway_join",
    "left_join_daily_count",
    "sum_decimal_by_key",
    "window_rank_lag",
    "date_delay_metrics",
    "pricing_summary",
    "shipping_priority",
    "volume_shipping_nation_pair",
    "topk",
    # extension operators (LLM-pipeline surface)
    "token_stats",
    "bpe_style_token_count",
    "lang_id_token_profile",
    "train_test_split",
    "profile_table",
    "exact_dedup",
    "minhash_lsh_candidates",
    "near_dup_clusters",
    "simhash_fingerprint",
    "embedding_topk_bruteforce",
    "ann_lsh_bucketed",
    "ann_recall_multiprobe",
    "ann_ivf_probe",
    "decontamination_ngram_overlap",
    "pack_sequences",
    "repetition_quality",
    "embedding_int8_quant",
    "tumbling_window_agg",
    "session_window_agg",
    # round-5 additions (compare cross-round on the common prefix;
    # BASELINE.md records the round-5 testdata regeneration)
    "countmin_token_frequency",
    "mmr_diverse_topk",
    "ivf_pq_topk",
    "weighted_systematic_sample",
    # round-6 additions
    "setsim_prefix_join",
    "incremental_neardup_ingest",
    "pagerank_copurchase",
    "scd2_user_state_history",
    "bpe_train_merges",
    # round-6 additions, second batch
    "association_rules",
    "autocorr_daily_lags",
    "clustering_coefficient",
    "c4_quality_filters",
    "interarrival_stats",
    "binary_hamming_topk",
    "wau_rolling",
    # round-7 additions: the end-to-end flights pipeline (first warmup
    # pays the one-time derived-warehouse build; timed runs measure the
    # warehouse read path) and the unrolled-oracle graph peel
    "flights_seat_occupancy_daily",
    "flights_activity_delays",
    "kcore_summary",
    "peak_concurrency_sweep",
    "triangles_degree_oriented",
    "embedding_label_drift",
    "table_checksum_buckets",
    # round-8 additions (compare cross-round on the common prefix)
    "checksum_diff_report",
    "embedding_shard_drift",
    "split_leakage_report",
    "mixture_epoch_plan",
    "substring_dup_ratio",
    "quality_weighted_mixture",
    # round-9 additions (compare cross-round on the common prefix)
    "substring_dup_unaligned",
    "domain_prefilter",
    "contamination_matrix",
    "domain_token_budget",
    "split_contamination_matrix",
    "longest_shared_run",
    # round-10 additions
    "lm_surprisal_filter",
    "cluster_representatives",
    # round-11 additions
    "surprisal_span_localization",
    "dedup_token_savings_by_source",
    "span_trim_plan",
    "trim_savings_by_source",
    "lm_surprisal_heldout",
    # round-12 additions
    "oov_rate_by_source",
    "post_trim_token_counts",
    "span_budget_admission",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def short_key_map(names: list[str]) -> dict[str, str]:
    """Deterministic collision-free abbreviation (full → short): first
    letter of each underscore-separated word; on collision, extend
    with successive letters of the LAST word, then a numeric suffix.
    Processing in sorted order makes the mapping a pure function of
    the name set, so the committed ``short_keys`` table stays stable
    round over round for unchanged names."""
    out: dict[str, str] = {}
    used: set[str] = set()
    for name in sorted(names):
        parts = name.split("_")
        key = "".join(p[0] for p in parts if p)
        tail, i = parts[-1], 1
        while key in used:
            if i < len(tail):
                key += tail[i]
                i += 1
            else:
                key += "9"
        used.add(key)
        out[name] = key
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0
    cold = os.environ.get("SPARK_GRAFT_BENCH_COLD", "") == "1"
    # discover the clan FIRST: it reads query source via inspect, so
    # doing it before the (slow) warehouse build shrinks the window in
    # which a concurrent source edit can skew the AST walk
    clan = set(lsh_composer_clan())
    spark = get_spark("fdp-spark-bench")

    # One-time flights warehouse build, timed as its OWN metric: it is
    # the honest end-to-end comparator against the reference's daily
    # DAG run (BASELINE.md), and leaving it inside the first flights
    # query's warmup distorts that query's cold read (round-7 VERDICT
    # task 7).
    from flights_data_pipeline_spark.queries.flights import _warehouse

    t0 = time.perf_counter()
    try:
        _warehouse(spark, sf_dir)
        build_sec = round(time.perf_counter() - t0, 4)
    except Exception as exc:
        print(f"bench: flights warehouse build failed: {exc}", file=sys.stderr)
        build_sec = -1.0
    spark.sparkContext._jvm.System.gc()

    def _gc() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY.get(name)
        if q is None:
            continue
        deep = name in clan  # iso_warm treatment (module docstring)
        try:
            if not cold:
                for _ in range(5 if deep else 2):
                    materialize(q.fn(spark, sf_dir))
                    if deep:
                        _gc()
            runs = []
            for _ in range(1 if cold else 3):
                t0 = time.perf_counter()
                materialize(q.fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
                if deep:
                    _gc()
            timings[name] = round(statistics.median(runs), 4)
        except Exception as exc:  # never let one query sink the whole bench
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
        # between-query hygiene (untimed): force the driver GC so
        # ContextCleaner frees dead broadcast/localCheckpoint blocks —
        # without it, accumulated session state can inflate late
        # queries well beyond their isolated cost (see bench_full.py)
        _gc()

    total = round(sum(v for v in timings.values() if v >= 0), 4)
    metric = "headline_queries_total_" + ("cold_sec" if cold else "median_sec")
    full = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "flights_pipeline_build_sec": build_sec,
        "sf": sf,
    }
    print(json.dumps(full))
    shorts = short_key_map(list(timings))
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_headline_latest.json"), "w") as f:
            json.dump(
                {**full, "short_keys": shorts}, f, indent=1, sort_keys=True
            )
            f.write("\n")
    except OSError as exc:
        print(f"bench: could not write headline artifact: {exc}", file=sys.stderr)
    # FINAL line = the driver-parsed summary (see module docstring):
    # the COMPLETE per-query surface under deterministic short keys
    # (~900 chars, inside the driver's 2000-char stdout snapshot).
    print(
        json.dumps(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "sf": sf,
                "build_sec": round(build_sec, 2),
                "n_queries": len(timings),
                "queries": {
                    shorts[n]: round(v, 2) for n, v in timings.items()
                },
                "keymap": "BENCH_headline_latest.json short_keys",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
