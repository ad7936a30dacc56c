from __future__ import annotations

import os

import pytest

from flights_data_pipeline_spark.io.jdbc import find_duckdb_jdbc_jar
from flights_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")

#: builder-tier tests (see pytest.ini): every test measured ≥ ~10 s in
#: the round-13 full-suite timing (pytest --durations), keyed
#: "<file>::<test>" with parametrize ids stripped — marking the whole
#: parameter family keeps the table short and honest. These are the
#: streaming replay/convergence twins, state-store runs, persistence
#: restarts, incremental-vs-full-rebuild equivalences and CLI
#: end-to-ends; the oracle gates, plan pins and bit-equality dispatch
#: tests all stay in the default (driver-budgeted) tier.
SLOW_TESTS = {
    "test_checksum.py::test_null_and_delimiter_rows_do_not_collide",
    "test_cli.py::test_curate_command",
    "test_cli.py::test_run_command_end_to_end",
    "test_clustered_facts.py::test_clustered_facts_equal_plain",
    "test_clustered_facts.py::test_zorder_layout_equals_plain",
    "test_incremental_fact.py::test_daywise_refresh_equals_full_rebuild",
    "test_incremental_fact.py::test_daywise_refresh_equals_full_rebuild_all_facts",
    "test_incremental_fact.py::test_refresh_is_idempotent",
    "test_kmeans.py::test_inertia_not_worse_than_init_and_deterministic",
    "test_lm_surprisal_stream.py::test_every_prefix_matches_batch",
    "test_maintenance.py::test_additive_rollup_equals_full_recompute",
    "test_neardup_ingest_stream.py::test_full_replay_converges",
    "test_operators.py::test_multiblock_semantic_dedup_improves_boundary_recall",
    "test_persistent_catalog.py::test_bucket_spec_survives_process_restart",
    "test_physical_layout.py::test_pipeline_bucketed_layout_joins_without_exchange",
    "test_pysource.py::test_sink_stream_writer_one_manifest_per_batch",
    "test_pysource.py::test_sink_time_travel_up_to_batch",
    "test_span_trim_ingest_stream.py::test_drained_plan_equals_batch_twin",
    "test_span_trim_ingest_stream.py::test_replay_converges",
    "test_split_leakage_stream.py::test_store_equals_batch_report_any_order_and_replays",
    "test_streaming.py::test_drop_duplicates_within_watermark",
    "test_streaming.py::test_late_event_dropped_in_append_mode",
    "test_streaming_jobs.py::test_dedup_stream_unique",
    "test_streaming_jobs.py::test_session_counts_rocksdb_state_metrics",
    "test_streaming_jobs.py::test_state_store_reader_matches_sink",
    "test_streaming_jobs.py::test_stateful_user_counters",
    "test_streaming_jobs.py::test_stream_stream_join_equals_batch",
    "test_streaming_jobs.py::test_stream_stream_left_outer_pads_unconverted",
    "test_streaming_jobs.py::test_tumbling_agg_under_rocksdb_state_store",
    "test_streaming_jobs.py::test_two_level_window_rollup_chained_state",
    "test_substring_dup_unaligned.py::test_guarantee_floor_any_alignment",
    "test_token_budget_stream.py::test_duplicate_rearrival_resolves_deterministically",
    "test_token_budget_stream.py::test_store_equals_batch_rule_any_order_and_replays",
    "test_transition_stream.py::test_replay_converges",
    "test_transition_stream.py::test_streamed_matrix_equals_batch",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.rsplit("/", 1)[-1].split("[", 1)[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    # jars must be on the classpath at JVM start, so the (optional)
    # embedded-DB JDBC driver is wired here for the whole test session
    jar = find_duckdb_jdbc_jar()
    extra = {"spark.jars": jar} if jar else {}
    s = get_spark(
        "fdp-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        driver_memory="8g",
        extra_conf=extra,
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
