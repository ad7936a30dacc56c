"""Measure the naive-window vs two-phase global-order crossover.

Round-8 VERDICT task 4: the size-adaptive dispatch in
``operators/global_order`` claims the naive unpartitioned window wins
below ``NAIVE_MAX_BYTES`` and the two-phase path wins above — this
script turns that claim into numbers. It scales the sf0.1 ``orders``
table by key-shifted unions (written once to parquet under /tmp so
scan costs are realistic), then times the ``percentile_exact`` core
(grouped row_number over o_orderpriority — 5 huge groups) and a global
rank under both ``FORCE`` settings.

Usage: python tools/bench_crossover.py [--mults 1,10,40] [--stats]

``--stats`` (round-9 VERDICT task 6) re-measures with CBO ON over
ANALYZE'd catalog copies of the scaled tables: every row then also
reports the CALIBRATED top-of-plan estimate (rowCount defined —
the signal ``global_order._use_naive`` trusts for the tighter
``NAIVE_MAX_BYTES_CALIBRATED`` threshold) next to the true byte size,
so the threshold can sit at the measured crossover instead of a 10×
safety margin above it.

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


def load(spark, path: str, stats: bool):
    """Read the scaled table — as an ANALYZE'd catalog table when
    measuring the calibrated-estimate path, else as a raw path scan."""
    if not stats:
        return spark.read.parquet(path)
    name = "xo_" + Path(path).stem.replace(".", "_")
    if name not in [t.name for t in spark.catalog.listTables()]:
        spark.read.parquet(path).write.mode("overwrite").saveAsTable(name)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
    return spark.table(name)


def estimates(df) -> dict:
    """What the dispatch sees: top-of-plan sizeInBytes + rowCount
    (defined only under CBO with column stats — the calibration
    signal)."""
    st = df._jdf.queryExecution().optimizedPlan().stats()
    rc = st.rowCount()
    return {
        "est_bytes": int(str(st.sizeInBytes())),
        "est_rows": int(str(rc.get())) if rc.isDefined() else None,
    }


def grouped_rank_run(spark, df) -> None:
    global_order.grouped_row_number(
        df, ["o_orderpriority"], ["o_totalprice", "o_orderkey"], out="rn"
    ).selectExpr("max(rn)").collect()


def global_rank_run(spark, df) -> None:
    global_order.global_row_number(
        df, ["o_totalprice", "o_orderkey"], out="rn"
    ).selectExpr("max(rn)").collect()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10,40")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--stats", action="store_true")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    spark = get_spark("go-crossover", cpus=32, shuffle_partitions=32)
    if args.stats:
        spark.conf.set("spark.sql.cbo.enabled", "true")
    results = []
    for mult in mults:
        path = scaled_orders(spark, mult)
        df = load(spark, path, args.stats)
        rows = df.count()
        row = {"mult": mult, "rows": rows, **estimates(df)}
        for shape, run in [
            ("grouped_rank", grouped_rank_run),
            ("global_rank", global_rank_run),
        ]:
            for mode in ("naive", "two-phase"):
                global_order.FORCE = mode
                try:
                    row[f"{shape}_{mode}"] = round(
                        timed(lambda: run(spark, df)), 2
                    )
                finally:
                    global_order.FORCE = None
        results.append(row)
        print(row, flush=True)

    print(
        "\n| rows | est bytes (rowCount) | grouped naive | grouped two-phase"
        " | global naive | global two-phase |"
    )
    print("|---|---|---|---|---|---|")
    for r in results:
        rc = f" ({r['est_rows']:,})" if r.get("est_rows") else ""
        print(
            f"| {r['rows']:,} | {r['est_bytes']:,}{rc} "
            f"| {r['grouped_rank_naive']} s "
            f"| {r['grouped_rank_two-phase']} s | {r['global_rank_naive']} s "
            f"| {r['global_rank_two-phase']} s |"
        )
    print(json.dumps({"crossover": results}))
    if not args.keep:
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
