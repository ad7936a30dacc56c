"""Custom Python DataSource: determinism, partition planning, filter
pushdown exactness, Arrow-batch reads, and replayable streaming."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from flights_data_pipeline_spark.io.pysource import register

N = 5000
OPTS = {"n_rows": str(N), "n_partitions": "4", "rows_per_batch": "500"}


@pytest.fixture()
def src(spark):
    register(spark)
    return spark.read.format("synthetic_events").options(**OPTS)


def test_batch_shape_and_determinism(spark, src):
    df = src.load()
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    a = Counter(tuple(r) for r in df.collect())
    b = Counter(tuple(r) for r in src.load().collect())
    assert a == b
    assert sum(a.values()) == N
    assert len({r for r in a}) == N  # event_id unique => all rows distinct


def test_partition_planning(spark, src):
    df = src.load()
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 4
    # every partition carries a contiguous, disjoint id range
    ranges = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"),
             F.count("*").alias("n"))
        .orderBy("lo")
        .collect()
    )
    covered = 0
    for r in ranges:
        assert r.lo == covered and r.n == r.hi - r.lo + 1
        covered = r.hi + 1
    assert covered == N


def test_filter_pushdown_matches_post_filter(spark, src):
    full = src.load().collect()
    pushed = src.load().filter(
        (F.col("event_id") >= 1200) & (F.col("event_id") < 1300)
    ).collect()
    expect = [r for r in full if 1200 <= r.event_id < 1300]
    assert Counter(map(tuple, pushed)) == Counter(map(tuple, expect))
    # point lookup via EqualTo
    one = src.load().filter(F.col("event_id") == 42).collect()
    assert len(one) == 1 and one[0].event_id == 42
    # fully-pruned range is empty, not an error
    assert src.load().filter(F.col("event_id") < 0).count() == 0
    # non-range predicate stays correct (yielded back to Spark)
    purchases = src.load().filter(F.col("event_type") == "purchase").collect()
    assert Counter(map(tuple, purchases)) == Counter(
        tuple(r) for r in full if r.event_type == "purchase"
    )


def test_value_domain(spark, src):
    row = src.load().agg(
        F.min("value").alias("vlo"), F.max("value").alias("vhi"),
        F.countDistinct("event_type").alias("nt"),
        F.countDistinct("user_id").alias("nu"),
        F.min("ts").alias("t0"),
    ).collect()[0]
    assert 0.0 <= row.vlo and row.vhi < 100.0
    assert row.nt == 5
    assert row.nu == 50
    assert row.t0.year == 2024


def test_stream_reader_replays_deterministically(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("synthetic_events")
        .options(**OPTS)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    n = got.count()
    assert n >= 500 and n % 500 == 0
    # the streamed prefix is bit-equal to the batch source's prefix
    batch = spark.read.format("synthetic_events").options(**OPTS).load().filter(
        F.col("event_id") < n
    )
    assert Counter(map(tuple, got.collect())) == Counter(
        map(tuple, batch.collect())
    )


# ---------------------------------------------------------------------------
# Manifest-committed parquet SINK (batch + streaming writers).
# ---------------------------------------------------------------------------
def _committed(path):
    import glob
    import json
    import os

    files = []
    for mf in sorted(glob.glob(os.path.join(path, "_manifest*.json"))):
        with open(mf) as f:
            files.extend(json.load(f)["files"])
    return files


def test_sink_batch_write_manifest_roundtrip(spark, src, tmp_path):
    from flights_data_pipeline_spark.io.pysource import read_manifest_parquet

    out = str(tmp_path / "sink")
    df = src.load().filter(F.col("event_id") < 1000)
    df.write.format("manifest_parquet").mode("append").option("path", out).save()

    # a stray staged file (zombie task) must be invisible to readers
    import os

    os.makedirs(f"{out}/_staging", exist_ok=True)
    with open(f"{out}/_staging/deadbeef.parquet", "w") as f:
        f.write("garbage")

    back = read_manifest_parquet(spark, out)
    assert back.count() == 1000
    assert sorted(back.columns) == sorted(df.columns)
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in back.select(*df.columns).collect()}
    assert a == b
    # manifest lists exactly the part files it renamed into place
    names = _committed(out)
    assert names and all(n.startswith("part-") for n in names)


def test_sink_overwrite_replaces_generation(spark, src, tmp_path):
    from flights_data_pipeline_spark.io.pysource import read_manifest_parquet

    out = str(tmp_path / "sink_ow")
    src.load().filter(F.col("event_id") < 500).write.format(
        "manifest_parquet"
    ).mode("append").option("path", out).save()
    first_gen = set(_committed(out))
    src.load().filter(F.col("event_id") < 200).write.format(
        "manifest_parquet"
    ).mode("overwrite").option("path", out).save()

    assert read_manifest_parquet(spark, out).count() == 200
    import os

    # the first generation's data files are gone, not just unlisted
    for fn in first_gen:
        assert not os.path.exists(os.path.join(out, fn))


def test_sink_two_appends_accumulate(spark, src, tmp_path):
    """A second append must MERGE the prior generation into the new
    manifest — never unlist it (and therefore a vacuum after the
    second append must not delete the first append's data)."""
    from flights_data_pipeline_spark.io.pysource import (
        read_manifest_parquet,
        vacuum_manifest_parquet,
    )

    out = str(tmp_path / "sink_app2")
    a = src.load().filter(F.col("event_id") < 300)
    b = src.load().filter(
        (F.col("event_id") >= 300) & (F.col("event_id") < 500)
    )
    a.write.format("manifest_parquet").mode("append").option("path", out).save()
    b.write.format("manifest_parquet").mode("append").option("path", out).save()

    back = read_manifest_parquet(spark, out)
    assert back.count() == 500
    want = {tuple(r) for r in a.unionAll(b).collect()}
    assert {tuple(r) for r in back.select(*a.columns).collect()} == want

    # vacuum after the merge deletes nothing committed
    assert vacuum_manifest_parquet(out) == []
    assert read_manifest_parquet(spark, out).count() == 500

    import json
    import os

    with open(os.path.join(out, "_manifest.json")) as f:
        m = json.load(f)
    assert m["rows"] == 500 and len(m["files"]) == len(set(m["files"]))


def test_sink_overwrite_publishes_before_delete(spark, src, tmp_path):
    """Overwrite's visibility flip is the manifest publish; stale
    streaming manifests are removed so the post-overwrite view is
    exactly the new generation."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flights_data_pipeline_spark.io.pysource import (
        read_manifest_parquet,
    )

    out = str(tmp_path / "sink_ow_stream")
    os.makedirs(out, exist_ok=True)
    # simulate a prior STREAMING generation: one per-batch manifest
    pq.write_table(
        pa.table({"event_id": [1, 2, 3]}), f"{out}/part-00000-old.parquet"
    )
    with open(f"{out}/_manifest-00000000.json", "w") as f:
        json.dump({"files": ["part-00000-old.parquet"], "rows": 3}, f)

    src.load().filter(F.col("event_id") < 100).write.format(
        "manifest_parquet"
    ).mode("overwrite").option("path", out).save()

    # the streaming manifest and its data are gone; view = new gen only
    assert not os.path.exists(f"{out}/_manifest-00000000.json")
    assert not os.path.exists(f"{out}/part-00000-old.parquet")
    assert read_manifest_parquet(spark, out).count() == 100


def test_sink_empty_read_raises(spark, tmp_path):
    """No committed manifest → no derivable schema: a clear error, not
    a guessed single-column DataFrame."""
    import os

    from flights_data_pipeline_spark.io.pysource import read_manifest_parquet

    out = str(tmp_path / "sink_empty")
    os.makedirs(out, exist_ok=True)
    with pytest.raises(ValueError, match="no committed data files"):
        read_manifest_parquet(spark, out)


def test_sink_stream_writer_one_manifest_per_batch(spark, src, tmp_path):
    from flights_data_pipeline_spark.io.pysource import read_manifest_parquet

    out = str(tmp_path / "sink_stream")
    stream = (
        spark.readStream.format("synthetic_events").options(**OPTS).load()
    )
    # ASAP micro-batches; the bounded source feeds rows_per_batch rows
    # per poll, so the run commits ≥5 micro-batches before going idle
    q = (
        stream.writeStream.format("manifest_parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    import glob
    import json
    import os
    import time

    deadline = time.time() + 300
    while time.time() < deadline:
        rows = sum(
            json.load(open(mf))["rows"]
            for mf in glob.glob(os.path.join(out, "_manifest-*.json"))
        )
        if rows >= N:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)

    manifests = sorted(glob.glob(os.path.join(out, "_manifest-*.json")))
    assert len(manifests) >= 2  # 5000 rows at 1000/poll → ≥5 batches
    back = read_manifest_parquet(spark, out)
    want = src.load()
    assert back.count() == want.count() == N
    assert {tuple(r) for r in back.select(*want.columns).collect()} == {
        tuple(r) for r in want.collect()
    }


def test_sink_stream_commit_is_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batchId, fresh staged files) must
    publish NOTHING twice: the existing manifest wins and the replay's
    staged files are cleaned up."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flights_data_pipeline_spark.io.pysource import (
        ManifestParquetStreamWriter,
        _ParquetCommit,
    )

    out = str(tmp_path / "replay")
    os.makedirs(f"{out}/_staging", exist_ok=True)

    def stage(name):
        p = f"{out}/_staging/{name}.parquet"
        pq.write_table(pa.table({"x": [1, 2, 3]}), p)
        return _ParquetCommit(staged=p, rows=3)

    w = ManifestParquetStreamWriter({"path": out})
    w.commit([stage("first")], batchId=7)
    manifest = f"{out}/_manifest-00000007.json"
    gen1 = json.load(open(manifest))

    # replay: same batch id, different staged file
    replay_msg = stage("second")
    w.commit([replay_msg], batchId=7)
    assert json.load(open(manifest)) == gen1  # manifest unchanged
    assert not os.path.exists(replay_msg.staged)  # staged replay cleaned
    assert len(_committed(out)) == 1


def test_sink_vacuum_removes_only_unreferenced(spark, src, tmp_path):
    from flights_data_pipeline_spark.io.pysource import (
        read_manifest_parquet,
        vacuum_manifest_parquet,
    )

    out = str(tmp_path / "vac")
    df = src.load().filter(F.col("event_id") < 300)
    df.write.format("manifest_parquet").mode("append").option(
        "path", out
    ).save()
    before = {tuple(r) for r in read_manifest_parquet(spark, out).collect()}

    # plant orphans: a zombie staged file and a fake uncommitted part
    import os

    os.makedirs(f"{out}/_staging", exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": [1]}), f"{out}/_staging/zombie.parquet")
    pq.write_table(pa.table({"x": [2]}), f"{out}/part-99999-orphan.parquet")

    deleted = vacuum_manifest_parquet(out)
    assert len(deleted) == 2
    assert not os.path.exists(f"{out}/_staging")  # emptied and removed

    # committed data untouched, byte-for-byte view identical
    after = {tuple(r) for r in read_manifest_parquet(spark, out).collect()}
    assert after == before and len(after) == 300


def test_sink_output_is_restreamable(spark, src, tmp_path):
    """Full connector lifecycle: synthetic source → manifest sink →
    manifest STREAM READER → aggregate equals the batch over the same
    data; a manifest committed AFTER the first pass arrives as a new
    micro-batch (tailing works)."""
    out = str(tmp_path / "loop")
    # initial generation through the STREAMING writer (zero-padded
    # batch manifests — the name-monotone layout the tail contract
    # requires; see ManifestParquetStreamReader docstring)
    w = (
        spark.readStream.format("synthetic_events")
        .options(**OPTS)
        .option("n_rows", "2000")
        .load()
        .writeStream.format("manifest_parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "wck"))
        .start()
    )
    w.processAllAvailable()
    w.stop()
    w.awaitTermination(60)

    restream = (
        spark.readStream.format("manifest_parquet")
        .option("path", out)
        .load()
    )
    q = (
        restream.writeStream.format("memory")
        .queryName("restream_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    n1 = spark.sql("SELECT COUNT(*) c FROM restream_sink").collect()[0].c
    assert n1 == 2000

    # tail: a second committed generation becomes the next micro-batch
    import pyarrow as pa
    import pyarrow.parquet as pq
    import json
    import os

    extra = f"{out}/part-extra.parquet"
    tbl = pa.table(
        {
            "event_id": pa.array([99999], pa.int64()),
            "ts": pa.array([0], pa.timestamp("us")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([1.0]),
        }
    )
    pq.write_table(tbl, extra)
    with open(f"{out}/_manifest-tail.json", "w") as f:
        json.dump({"files": [os.path.basename(extra)], "rows": 1}, f)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    got = spark.sql(
        "SELECT COUNT(*) c, MAX(event_id) m FROM restream_sink"
    ).collect()[0]
    assert got.c == 2001 and got.m == 99999


def test_sink_abort_cleans_staged_files(tmp_path):
    """Driver-side abort contract: failed writes leave NO data files —
    abort removes every staged file the failed tasks reported, so a
    crashed job costs storage only until its abort runs (and nothing
    is ever visible, manifest or not)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flights_data_pipeline_spark.io.pysource import (
        ManifestParquetWriter,
        _ParquetCommit,
    )

    out = str(tmp_path / "abort")
    os.makedirs(f"{out}/_staging", exist_ok=True)
    staged = []
    for i in range(3):
        p = f"{out}/_staging/task{i}.parquet"
        pq.write_table(pa.table({"x": [i]}), p)
        staged.append(_ParquetCommit(staged=p, rows=1))

    w = ManifestParquetWriter({"path": out}, overwrite=False)
    w.abort(staged + [None])  # a failed task reports None
    assert all(not os.path.exists(m.staged) for m in staged)
    assert not os.path.exists(f"{out}/_manifest.json")


def test_sink_time_travel_up_to_batch(spark, src, tmp_path):
    """Streaming-sink time travel: reading with up_to_batch=k returns
    exactly the union of micro-batch generations ≤ k — any prefix of
    the stream is reconstructable, and the full read is the no-bound
    special case."""
    import glob
    import json
    import os
    import re
    import time

    from flights_data_pipeline_spark.io.pysource import read_manifest_parquet

    out = str(tmp_path / "sink_tt")
    stream = (
        spark.readStream.format("synthetic_events").options(**OPTS).load()
    )
    q = (
        stream.writeStream.format("manifest_parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_tt"))
        .start()
    )
    deadline = time.time() + 300
    while time.time() < deadline:
        rows = sum(
            json.load(open(mf))["rows"]
            for mf in glob.glob(os.path.join(out, "_manifest-*.json"))
        )
        if rows >= N:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)

    manifests = sorted(glob.glob(os.path.join(out, "_manifest-*.json")))
    assert len(manifests) >= 2
    ids = [
        int(re.match(r"_manifest-(\d+)\.json", os.path.basename(m)).group(1))
        for m in manifests
    ]
    cut = ids[0]
    expected_rows = sum(
        json.load(open(m))["rows"]
        for m, i in zip(manifests, ids)
        if i <= cut
    )
    prefix = read_manifest_parquet(spark, out, up_to_batch=cut)
    assert prefix.count() == expected_rows
    full = read_manifest_parquet(spark, out)
    assert full.count() == N
    # the prefix is a SUBSET of the full view (generations only append)
    assert prefix.count() < full.count()
