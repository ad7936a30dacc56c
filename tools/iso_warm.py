#!/usr/bin/env python
"""Isolated warm medians for the LSH-composer clan — the acceptance
yardsticks the sweep protocol is judged against.

A full-registry sweep row for a clan member is "warm level ± one slow
draw" (BASELINE rounds 9-11: tiered-JIT depth + localCheckpoint block
accumulation make one draw per sweep land 1.5-3× high, rotating
across the clan). The honest yardstick is the query's ISOLATED warm
plateau: deep warmups with inter-run GCs until the JIT settles, then
a median. This tool measures exactly that for every discovered clan
member and writes one JSON line — publish as ISO_WARM_r{N}.json next
to BENCH_full_r{N}.json so a reader can judge any sweep row without
BASELINE forensics.

Protocol per query: 5 warmup executions + median of 3 timed, forced
driver GC between EVERY run (the localCheckpoint-block mechanism),
noop sink. Queries run in discovery order within one session — by the
first timed run each query has had 5 of its own executions, which
fresh-session probes show reaches the plateau (BASELINE round-10).

Usage: python tools/iso_warm.py > ISO_WARM_rNN.json
Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flights_data_pipeline_spark.queries import REGISTRY
from flights_data_pipeline_spark.queries.registry import lsh_composer_clan
from flights_data_pipeline_spark.session import get_spark


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fdp-iso-warm")

    def _gc() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # A/B conveniences (round-13): SPARK_GRAFT_ISO_QUERIES restricts
    # the sweep to a comma-separated subset (default: the whole clan);
    # SPARK_GRAFT_ISO_WARMUPS overrides the warmup count. Protocol per
    # run is otherwise unchanged.
    subset = os.environ.get("SPARK_GRAFT_ISO_QUERIES", "")
    names = subset.split(",") if subset else lsh_composer_clan()
    n_warm = int(os.environ.get("SPARK_GRAFT_ISO_WARMUPS", "5"))

    out: dict[str, float] = {}
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            continue
        try:
            for _ in range(n_warm):
                materialize(q.fn(spark, sf_dir))
                _gc()
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                materialize(q.fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
                _gc()
            out[name] = round(statistics.median(runs), 4)
        except Exception as exc:  # pragma: no cover
            print(f"iso_warm: {name} failed: {exc}", file=sys.stderr)
            out[name] = -1.0
    print(
        json.dumps(
            {
                "metric": "lsh_clan_isolated_warm_median_sec",
                "unit": "sec",
                "queries": out,
                "sf_dir": sf_dir,
                "protocol": "5 warmups + median of 3, driver GC between every run, one session, discovery order",
            }
        )
    )


if __name__ == "__main__":
    main()
