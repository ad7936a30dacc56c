#!/usr/bin/env python
"""Dump ``explain('formatted')`` for named registry queries into
``plans/r13/<query>_<suffix>.txt`` — the before/after plan evidence for
the optimization round.

Usage: python tools/capture_plans.py <suffix> <query> [<query> ...]
Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Iterative operators (connected components, kmeans, peels) execute their
loops during plan construction; their file holds the FINAL stage's plan
(same convention as PLANS.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flights_data_pipeline_spark.queries import REGISTRY
from flights_data_pipeline_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("fdp-capture-plans")
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture the failure, keep going
            plan = f"ERROR: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
