"""Measure the naive-window vs two-phase global-order crossover.

Round-8 VERDICT task 4: the size-adaptive dispatch in
``operators/global_order`` claims the naive unpartitioned window wins
below ``NAIVE_MAX_BYTES`` and the two-phase path wins above — this
script turns that claim into numbers. It scales the sf0.1 ``orders``
table by key-shifted unions (written once to parquet under /tmp so
scan costs are realistic), then times the ``percentile_exact`` core
(grouped row_number over o_orderpriority — 5 huge groups) and a global
rank under both ``FORCE`` settings.

Usage: python tools/bench_crossover.py [--mults 1,10,40]
Output: a markdown table (paste into BASELINE.md) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from flights_data_pipeline_spark.operators import global_order  # noqa: E402
from flights_data_pipeline_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1/orders.parquet"
WORK = Path("/tmp/go_crossover")


def scaled_orders(spark, mult: int) -> str:
    """orders sf0.1 unioned ``mult`` times with shifted keys, written
    once to parquet (so each timed run pays a realistic scan)."""
    out = WORK / f"orders_x{mult}.parquet"
    if not out.exists():
        o = spark.read.parquet(BASE).select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        n = o.count()
        copies = o.withColumn("__c", F.explode(F.lit(list(range(mult)))))
        scaled = copies.select(
            (F.col("o_orderkey") + F.col("__c") * (n * 10)).alias("o_orderkey"),
            "o_orderpriority",
            # decorrelate values across copies so the sort is honest
            (
                F.col("o_totalprice")
                + F.col("__c") * F.lit(0.01) * (F.col("o_orderkey") % 97)
            ).alias("o_totalprice"),
        )
        scaled.repartition(32).write.mode("overwrite").parquet(str(out))
    return str(out)


def timed(fn, reps: int = 3) -> float:
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[reps // 2]


def grouped_rank_run(spark, path: str) -> None:
    df = spark.read.parquet(path)
    global_order.grouped_row_number(
        df, ["o_orderpriority"], ["o_totalprice", "o_orderkey"], out="rn"
    ).selectExpr("max(rn)").collect()


def global_rank_run(spark, path: str) -> None:
    df = spark.read.parquet(path)
    global_order.global_row_number(
        df, ["o_totalprice", "o_orderkey"], out="rn"
    ).selectExpr("max(rn)").collect()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10,40")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    spark = get_spark("go-crossover", cpus=32, shuffle_partitions=32)
    results = []
    for mult in mults:
        path = scaled_orders(spark, mult)
        rows = spark.read.parquet(path).count()
        row = {"mult": mult, "rows": rows}
        for shape, run in [
            ("grouped_rank", grouped_rank_run),
            ("global_rank", global_rank_run),
        ]:
            for mode in ("naive", "two-phase"):
                global_order.FORCE = mode
                try:
                    row[f"{shape}_{mode}"] = round(
                        timed(lambda: run(spark, path)), 2
                    )
                finally:
                    global_order.FORCE = None
        results.append(row)
        print(row, flush=True)

    print("\n| rows | grouped naive | grouped two-phase | global naive | global two-phase |")
    print("|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['rows']:,} | {r['grouped_rank_naive']} s "
            f"| {r['grouped_rank_two-phase']} s | {r['global_rank_naive']} s "
            f"| {r['global_rank_two-phase']} s |"
        )
    print(json.dumps({"crossover": results}))
    if not args.keep:
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
