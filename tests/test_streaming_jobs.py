"""streaming/jobs.py under real micro-batch execution, including the
applyInPandasWithState custom stateful operator."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.streaming import jobs


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="fdp_sjobs_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(3).write.mode("overwrite").parquet(f"{d}/events")
    yield f"{d}/events"
    shutil.rmtree(d, ignore_errors=True)


def _run(sdf, name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def test_tumbling_counts_stream(spark, events_dir, sf_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    _run(jobs.tumbling_counts(stream), "sj_tumbling", "complete")
    got = spark.sql("SELECT SUM(n_events) AS n FROM sj_tumbling").collect()[0].n
    want = load_table(spark, sf_dir, "events").count()
    assert got == want


def test_stateful_user_counters(spark, events_dir, sf_dir):
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    _run(jobs.user_running_counters(stream), "sj_counters", "update")
    rows = spark.sql(
        "SELECT user_id, MAX(n_events) AS n FROM sj_counters GROUP BY user_id"
    ).collect()
    got = {r.user_id: r.n for r in rows}
    want = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # every user's final running count equals the batch count
    assert got == want


def test_dedup_stream_unique(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    doubled = stream.unionByName(stream)
    _run(jobs.dedup_stream(doubled).select("event_id"), "sj_dedup", "append")
    r = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM sj_dedup"
    ).collect()[0]
    assert r.n == r.d and r.n > 0


def test_stream_stream_join_equals_batch(spark, events_dir, sf_dir):
    """Watermarked stream-stream click→purchase attribution produces
    exactly the rows the equivalent batch join produces once all data
    is processed (every window closed)."""
    from flights_data_pipeline_spark.streaming.jobs import (
        read_events_stream,
        stream_stream_attribution,
    )

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    joined = stream_stream_attribution(stream, gap_minutes=30)
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM t_ss_join").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r.c_user, r.click_id, r.purchase_id)
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_tumbling_agg_under_rocksdb_state_store(spark, events_dir, sf_dir):
    """The streaming kernels run unchanged under the RocksDB state
    store provider — the backend that keeps state on local disk
    instead of executor heap (an HDFS-backed in-memory store caps
    state at heap size; RocksDB is the 100 TB-keys setting)."""
    from flights_data_pipeline_spark.io.catalog import load_table
    from flights_data_pipeline_spark.streaming.jobs import (
        read_events_stream,
        tumbling_counts,
    )

    conf = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf, None)
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        agg = tumbling_counts(read_events_stream(spark, events_dir))
        q = (
            agg.writeStream.format("memory")
            .queryName("t_rocksdb")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM t_rocksdb").collect()
        }
    finally:
        if old is not None:
            spark.conf.set(conf, old)
        else:
            spark.conf.unset(conf)

    from flights_data_pipeline_spark.queries import REGISTRY

    batch = REGISTRY["tumbling_window_agg"].fn(spark, sf_dir)
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_session_counts_rocksdb_state_metrics(spark, events_dir, sf_dir):
    """Session-window stream under RocksDB: (a) results equal the batch
    session kernel, (b) the query's state operator reports its state
    rows and the RocksDB provider's own metrics are present — the
    observability a capacity plan needs (state rows × bytes/row =
    store size; with RocksDB that budget is local disk, not heap)."""
    from flights_data_pipeline_spark.streaming.jobs import (
        ROCKSDB_PROVIDER,
        read_events_stream,
        session_counts,
        use_rocksdb_state_store,
    )

    conf = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf, None)
    use_rocksdb_state_store(spark)
    assert spark.conf.get(conf) == ROCKSDB_PROVIDER
    try:
        sdf = session_counts(read_events_stream(spark, events_dir, 2))
        q = (
            sdf.writeStream.format("memory")
            .queryName("t_sess_rocks")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        progress = q.lastProgress
        got = {
            (r.user_id, r.session_start): (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM t_sess_rocks").collect()
        }
    finally:
        if old is not None:
            spark.conf.set(conf, old)
        else:
            spark.conf.unset(conf)

    ops = progress["stateOperators"]
    assert ops and ops[0]["numRowsTotal"] > 0
    # RocksDB-specific custom metrics prove the provider actually ran
    assert any(k.startswith("rocksdb") for k in ops[0]["customMetrics"])

    from flights_data_pipeline_spark.queries import REGISTRY

    batch = REGISTRY["session_window_agg"].fn(spark, sf_dir)
    want = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_transform_with_state_counters(spark, events_dir, sf_dir):
    """transformWithState twin of the applyInPandasWithState operator:
    final per-user counts equal the batch aggregate (requires RocksDB)."""
    import pytest

    from flights_data_pipeline_spark.streaming.jobs import (
        HAS_TWS,
        read_events_stream,
        use_rocksdb_state_store,
        user_running_counters_tws,
    )

    if not HAS_TWS:
        pytest.skip("transformWithState API not available in this Spark")

    conf = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf, None)
    use_rocksdb_state_store(spark)
    try:
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
        q = (
            user_running_counters_tws(stream)
            .writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.sql(
            "SELECT user_id, MAX(n_events) AS n, MAX(total_value) AS v "
            "FROM t_tws GROUP BY user_id"
        ).collect()
    finally:
        if old is not None:
            spark.conf.set(conf, old)
        else:
            spark.conf.unset(conf)

    got = {r.user_id: (r.n, round(r.v, 6)) for r in rows}
    want = {
        r.user_id: (r.n, round(r.v, 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("v"),
        )
        .collect()
    }
    assert got == want


def test_enrich_stream_static_dim(spark, events_dir, sf_dir):
    """Stream-static dim join: per-nation event counts from the
    enriched stream equal the batch join's, and every event survives
    the left join (all user_ids resolve in the customer dim)."""
    dim = (
        load_table(spark, sf_dir, "customer")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    _run(jobs.enrich_stream(stream, dim, ["user_id"]), "sj_enriched", "append")
    got = {
        r.n_name: r.n
        for r in spark.sql(
            "SELECT n_name, COUNT(*) AS n FROM sj_enriched GROUP BY n_name"
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.n_name: r.n
        for r in ev.join(dim, "user_id").groupBy("n_name").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    assert sum(got.values()) == ev.count()  # left join drops nothing


def test_state_store_reader_matches_sink(spark, events_dir):
    """Offline state introspection: after a tumbling-count query
    completes, (a) the state-metadata reader names the agg operator
    and its store, and (b) the statestore reader's key/value rows
    reconstruct EXACTLY the aggregate the sink emitted — state on
    disk IS the query result for a complete-mode agg, which also
    proves the checkpoint is replayable."""
    ck = tempfile.mkdtemp(prefix="fdp_ssr_ck_")
    try:
        agg = jobs.tumbling_counts(jobs.read_events_stream(spark, events_dir))
        q = (
            agg.writeStream.format("memory")
            .queryName("ssr_sink")
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        meta = jobs.read_state_metadata(spark, ck).collect()
        assert len(meta) == 1
        assert meta[0].operatorName == "stateStoreSave"
        assert meta[0].stateStoreName == "default"

        st = jobs.read_query_state(spark, ck, operator_id=meta[0].operatorId)
        got = {
            (r.key.window.start, r.key.event_type): (
                r.value["count"],
                float(r.value["sum"]),
            )
            for r in st.collect()
        }
        want = {
            (r.window_start, r.event_type): (r.n_events, float(r.total_value))
            for r in spark.sql("SELECT * FROM ssr_sink").collect()
        }
        assert got == want and len(got) > 0

        # per-partition key distribution is the skew-debugging readout
        n_parts = st.select("partition_id").distinct().count()
        assert n_parts >= 1
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def test_two_level_window_rollup_chained_state(spark, sf_dir, tmp_path_factory):
    """Two stateful aggs chained in ONE query: every emitted hourly
    row equals the batch twin, and the only rows withheld are the
    hours the final watermark hasn't closed (append-mode contract).

    Source is a SINGLE file (one micro-batch): the shared events_dir
    fixture splits rows across files at random, and a multi-trigger
    read of time-interleaved files is mass late-arrival by
    construction — the watermark advances past data still sitting in
    unread files, which append mode then rightly drops. Real feeds
    deliver roughly in event-time order; the fixture's random split
    does not model that."""
    from flights_data_pipeline_spark.io.catalog import load_table

    d = tmp_path_factory.mktemp("chained_src")
    load_table(spark, sf_dir, "events").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "events"))
    stream = jobs.read_events_stream(spark, str(d / "events"))
    got_df = _run(
        jobs.two_level_window_rollup(stream),
        "chained_rollup",
        "append",
    )
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM chained_rollup").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    want = {
        (r.window_start, r.event_type): r.n_events for r in batch.collect()
    }
    # emitted rows are exactly right...
    assert got and all(want.get(k) == v for k, v in got.items())
    # ...and the withheld remainder is only the watermark-open tail
    import datetime as dt

    max_ts = ev.agg(F.max("ts")).first()[0]
    horizon = max_ts - dt.timedelta(hours=1)
    late_open = {k for k in want if k not in got}
    assert all(k[0] + dt.timedelta(hours=1) > horizon for k in late_open)


def test_stream_stream_left_outer_pads_unconverted(spark, sf_dir, tmp_path_factory):
    """LEFT OUTER stream-stream join: matched rows equal the batch
    join, and clicks with no purchase in the window arrive NULL-padded
    once the watermark closes their match window (single-file source:
    one batch + final watermark flush)."""
    from flights_data_pipeline_spark.io.catalog import load_table

    d = tmp_path_factory.mktemp("sso_src")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(str(d / "events"))
    stream = jobs.read_events_stream(spark, str(d / "events"))
    _run(
        jobs.stream_stream_unconverted_clicks(stream),
        "sso_sink",
        "append",
    )
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM sso_sink").collect()
    }

    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    )
    want = {(r.click_id, r.purchase_id) for r in batch.collect()}

    # every matched pair must be present and correct
    got_matched = {g for g in got if g[1] is not None}
    want_matched = {w for w in want if w[1] is not None}
    assert got_matched == want_matched and got_matched
    # null-padded rows: a subset of the batch's unmatched clicks (the
    # watermark cannot close windows near the end of the feed), and never
    # a click the batch matched
    got_unmatched = {g[0] for g in got if g[1] is None}
    want_unmatched = {w[0] for w in want if w[1] is None}
    assert got_unmatched <= want_unmatched
    assert got_unmatched  # the flush emitted real padded rows


def test_dedup_then_window_agg_chained(spark, sf_dir, tmp_path_factory):
    """dropDuplicates chained INTO a windowed aggregation in one query
    (the second multi-stateful-operator shape beside window-on-window):
    a doubled feed deduped upstream yields exactly the single-feed
    batch aggregate downstream."""
    from flights_data_pipeline_spark.io.catalog import load_table

    d = tmp_path_factory.mktemp("dedup_agg_src")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(str(d / "events"))
    stream = jobs.read_events_stream(spark, str(d / "events"))
    doubled = stream.unionByName(stream)
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicates(
        ["event_id"]
    )
    agg = deduped.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n_events"))
    _run(
        agg.select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        ),
        "dedup_agg_sink",
        "append",
    )
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM dedup_agg_sink").collect()
    }
    want = {
        (r.ws, r.event_type): r.n
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    # emitted hours carry SINGLE-feed counts (dedup swallowed the
    # double), withheld hours are only the watermark-open tail
    assert got and all(want.get(k) == v for k, v in got.items())
