#!/usr/bin/env python
"""Streaming micro-benchmark: micro-batch throughput of the engine's
streaming kernels over the events table.

Replays the parquet events as a file-source stream (``availableNow``,
bounded) through each job and reports rows/sec from the query's own
progress metrics — the number capacity planning needs (events/sec per
core decides executor count for a target ingest rate).

Usage: python tools/bench_streaming.py  [prints one JSON line]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_STREAM_FILES (files per trigger, default 4).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flights_data_pipeline_spark.io.catalog import load_table  # noqa: E402
from flights_data_pipeline_spark.session import get_spark  # noqa: E402
from flights_data_pipeline_spark.streaming import jobs  # noqa: E402


def run_job(spark, name, builder, src, files_per_trigger, mode):
    stream = jobs.read_events_stream(
        spark, src, max_files_per_trigger=files_per_trigger
    )
    q = (
        builder(stream)
        .writeStream.format("noop")
        .outputMode(mode)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix=f"fdp_sbench_{name}_")
        )
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    rows = sum(p["numInputRows"] for p in q.recentProgress)
    batches = len(q.recentProgress)
    return {
        "rows": rows,
        "batches": batches,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fpt = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "4"))
    spark = get_spark("fdp-spark-stream-bench")

    # stage the events as a multi-file directory so the file source
    # actually micro-batches (one driver file = one giant batch)
    staged = tempfile.mkdtemp(prefix="fdp_sbench_src_") + "/events"
    load_table(spark, sf_dir, "events").repartition(16).write.parquet(staged)

    out = {}
    try:
        out["tumbling_counts"] = run_job(
            spark, "tumb", jobs.tumbling_counts, staged, fpt, "update"
        )
        # session windows only support append/complete on streams
        out["session_counts"] = run_job(
            spark, "sess", jobs.session_counts, staged, fpt, "append"
        )
        out["dedup_stream"] = run_job(
            spark, "dedup", jobs.dedup_stream, staged, fpt, "append"
        )
    finally:
        shutil.rmtree(os.path.dirname(staged), ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "streaming_throughput",
                "unit": "rows_per_sec",
                "files_per_trigger": fpt,
                "sf_dir": sf_dir,
                "jobs": out,
            }
        )
    )


if __name__ == "__main__":
    main()
