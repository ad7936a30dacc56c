"""Command-line entry point: ``python -m flights_data_pipeline_spark``.

The reference's operational surface is an orchestrated daily pipeline
with backfill (``dags/flights_data_pipeline.py:63-66``); this CLI is
the engine's equivalent:

* ``run``   — extract → land → stage → transform for one or more
  logical dates (``--ds`` repeatable = backfill), from a parquet
  directory or a ``jdbc:`` URL source.
* ``query`` — execute one registered engine query by name and print
  a bounded preview (the full registry: ``list-queries``).
* ``list-queries`` — every registered query and its oracle status.
* ``sql`` — ad-hoc Spark SQL over the test tables (registered as temp
  views from ``--sf-dir``): the "bring your own query" surface a
  reference user expects beside the canned registry.
* ``curate`` — run the materialized corpus-curation DAG
  (``pipeline/curation.py``) and print the funnel report.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="flights_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the ELT pipeline for logical dates")
    run.add_argument("--source", required=True, help="parquet dir or jdbc: URL")
    run.add_argument("--landing", required=True)
    run.add_argument("--staging", required=True)
    run.add_argument("--warehouse", required=True)
    run.add_argument("--ds", action="append", default=[],
                     help="logical date YYYY-MM-DD (repeat to backfill); "
                          "omit for a full load")
    run.add_argument("--retries", type=int, default=1)

    q = sub.add_parser("query", help="run one registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)

    sub.add_parser("list-queries", help="list registered queries")

    s = sub.add_parser("sql", help="run ad-hoc SQL over the test tables")
    s.add_argument("statement", help="a Spark SQL statement")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--limit", type=int, default=20)

    c = sub.add_parser("curate", help="run the corpus-curation DAG")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    c.add_argument("--out", required=True, help="stage-output directory")
    c.add_argument("--retries", type=int, default=1)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from .queries import REGISTRY
    from .session import get_spark

    if args.cmd == "list-queries":
        for name, q in sorted(REGISTRY.items()):
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:32s} [{kind}] {q.doc.splitlines()[0] if q.doc else ''}")
        return 0

    spark = get_spark("fdp-spark-cli")
    if args.cmd == "sql":
        from .io.catalog import register_views

        register_views(spark, args.sf_dir)
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0

    if args.cmd == "curate":
        from .pipeline.curation import run_curation

        def curate_alert(step: str, exc: Exception) -> None:
            print(f"ALERT step={step} failed: {exc}", file=sys.stderr)

        report = run_curation(
            spark, args.sf_dir, args.out,
            retries=args.retries, on_failure=curate_alert,
        )
        for stage, docs in report.items():
            print(f"{stage:24s} {docs}")
        return 0

    if args.cmd == "query":
        if args.name not in REGISTRY:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        df = REGISTRY[args.name].fn(spark, args.sf_dir)
        df.show(args.limit, truncate=False)
        return 0

    # cmd == "run"
    from .pipeline.runner import run_pipeline

    def alert(step: str, exc: Exception) -> None:
        print(f"ALERT step={step} failed: {exc}", file=sys.stderr)

    results = run_pipeline(
        spark,
        args.source,
        args.landing,
        args.staging,
        args.warehouse,
        args.ds or [None],
        retries=args.retries,
        on_failure=alert,
    )
    for r in results:
        print(f"{r.table:18s} ds={r.ds} {r.status.value:8s} rows={r.n_rows}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
