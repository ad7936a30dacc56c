#!/usr/bin/env python
"""Generate a key-shifted scaled copy of a testdata sf dir.

The driver's testdata tops out at sf0.1 (~600k lineitem / 5k docs);
every published acceptance number has therefore been measured at a
scale where the size-adaptive dispatches (global-order naive vs
two-phase, candidate-join broadcast vs shuffle) sit on their SMALL
paths. This tool derives a larger corpus from sf0.1 so the scale
paths engage NATURALLY (round-10 VERDICT task 1): each scaling table
is unioned ``mult`` times with per-copy key shifts that preserve
referential integrity and per-copy distributions.

Semantics of a copy (deterministic, no RNG):

* ``region``/``nation`` — fixed dims, copied as-is (TPC-H scaling).
* ``customer``/``supplier``/``part`` — primary keys shift by
  ``copy * (max_key + 1)``; FK columns into fixed dims unchanged.
* ``orders`` — orderkey and custkey shift in lockstep with their
  parents; ``o_totalprice`` gets a small key-dependent perturbation so
  cross-copy sorts are honest (no 10-way value ties).
* ``lineitem`` — orderkey/partkey/suppkey shift in lockstep;
  ``l_extendedprice`` perturbed like totalprice.
* ``events`` — event_id/user_id shift; timestamps unchanged (a scaled
  corpus models a higher event RATE over the same window).
* ``documents`` — doc_id shifts; copy 0 keeps its text verbatim, copy
  c > 0 prefixes EVERY whitespace token with ``c{c}x`` so each copy
  has a disjoint vocabulary: per-copy dedup/LSH/bigram structure is
  exactly the base corpus's, with no cross-copy shingle collisions
  (an unperturbed copy would make every document a 10-way near-dup
  and blow the candidate set up quadratically — a DIFFERENT corpus,
  not a scaled one). ``n_chars`` is recomputed.
* ``embeddings`` — vec_id shifts; component 0 is nudged by
  ``copy * 1e-4`` so copies are distinct points, not coincident ones.

Usage:
    python tools/gen_scale.py --out /tmp/fdp_sf1 --mult 10
    python tools/gen_scale.py --out /tmp/fdp_docs128 --mult 128 \
        --tables documents
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COPY_AS_IS = ["region", "nation"]
SCALED = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _read(spark: SparkSession, src: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{src}/{table}.parquet")


def _stride(df: DataFrame, key: str) -> int:
    return int(df.agg(F.max(key)).collect()[0][0]) + 1  # scale-ok: 1-row agg


def _fanout(df: DataFrame, mult: int) -> DataFrame:
    return df.withColumn("__c", F.explode(F.lit(list(range(mult)))))


def _shift(col: str, stride: int):
    return (F.col(col) + F.col("__c") * F.lit(stride)).alias(col)


def _perturb(col: str, key: str):
    """Key-dependent per-copy value nudge (breaks cross-copy ties in
    sort-heavy columns without moving distributions)."""
    return (
        F.col(col) + F.col("__c") * F.lit(0.01) * (F.col(key) % 97)
    ).alias(col)


def scale_table(
    spark: SparkSession, src: str, table: str, mult: int, strides: dict
) -> DataFrame:
    base = _read(spark, src, table)
    if table in COPY_AS_IS or mult == 1:
        return base
    f = _fanout(base, mult)
    if table == "customer":
        out = f.select(
            _shift("c_custkey", strides["c_custkey"]),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        )
    elif table == "supplier":
        out = f.select(
            _shift("s_suppkey", strides["s_suppkey"]),
            "s_name", "s_nationkey", "s_acctbal",
        )
    elif table == "part":
        out = f.select(
            _shift("p_partkey", strides["p_partkey"]),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        )
    elif table == "orders":
        out = f.select(
            _shift("o_orderkey", strides["o_orderkey"]),
            _shift("o_custkey", strides["c_custkey"]),
            "o_orderstatus",
            _perturb("o_totalprice", "o_orderkey"),
            "o_orderdate", "o_orderpriority",
        )
    elif table == "lineitem":
        out = f.select(
            _shift("l_orderkey", strides["o_orderkey"]),
            _shift("l_partkey", strides["p_partkey"]),
            _shift("l_suppkey", strides["s_suppkey"]),
            "l_linenumber", "l_quantity",
            _perturb("l_extendedprice", "l_orderkey"),
            "l_discount", "l_tax", "l_returnflag", "l_linestatus",
            "l_shipdate",
        )
    elif table == "events":
        out = f.select(
            _shift("event_id", strides["event_id"]),
            "ts",
            _shift("user_id", strides["user_id"]),
            "event_type",
            _perturb("value", "event_id"),
            "props",
        )
    elif table == "documents":
        tag = F.concat(F.lit("c"), F.col("__c").cast("string"), F.lit("x"))
        # Split on \s+ (the repo-wide token convention, not a single
        # space): consecutive whitespace must not mint extra standalone
        # "c{c}x" tokens in copies, or per-copy bigram/dedup structure
        # diverges from the base corpus (round-11 ADVICE). Empty
        # fragments (leading whitespace) are passed through unprefixed.
        text = F.when(F.col("__c") == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda x: F.when(x == "", x).otherwise(F.concat(tag, x)),
                ),
                " ",
            )
        )
        out = f.select(
            _shift("doc_id", strides["doc_id"]),
            text.alias("text"),
            "lang", "source",
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    elif table == "embeddings":
        emb = F.transform(
            "embedding",
            lambda x, i: (
                x
                + F.when(
                    (i == 0) & (F.col("__c") > 0),
                    F.col("__c").cast("float") * F.lit(1e-4),
                ).otherwise(F.lit(0.0))
            ).cast("float"),
        )
        out = f.select(
            _shift("vec_id", strides["vec_id"]),
            emb.alias("embedding"),
            "label",
        )
    else:
        raise ValueError(f"no scaling rule for table {table}")
    return out


def generate(
    spark: SparkSession,
    src: str,
    out_dir: str,
    mult: int,
    tables: list[str] | None = None,
) -> dict:
    """Write scaled copies of ``tables`` (default: all) from ``src``
    to ``out_dir``; idempotent via a manifest recording (src, mult).
    Returns the manifest."""
    manifest_path = f"{out_dir}/MANIFEST.json"
    # rule_version busts the idempotence cache when a scaling rule
    # changes (round 12: documents copies split on \s+, not " ") —
    # without it a stale dir would silently satisfy the manifest check
    want = {
        "src": src,
        "mult": mult,
        "tables": tables or "all",
        "rule_version": 2,
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            have = json.load(fh)
        if {k: have.get(k) for k in want} == want:
            return have
    names = tables if tables else COPY_AS_IS + SCALED
    strides = {}
    for key_table, keys in (
        ("customer", ["c_custkey"]),
        ("supplier", ["s_suppkey"]),
        ("part", ["p_partkey"]),
        ("orders", ["o_orderkey"]),
        ("events", ["event_id", "user_id"]),
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
    ):
        if any(
            t in names for t in (key_table, "orders", "lineitem")
        ):  # parents of scaled FKs always needed
            df = _read(spark, src, key_table)
            for k in keys:
                strides[k] = _stride(df, k)
    os.makedirs(out_dir, exist_ok=True)
    counts = {}
    for tname in names:
        df = scale_table(spark, src, tname, mult, strides)
        # partition count scales with the multiplier so downstream
        # scans see realistic parallelism, not one fat file
        nparts = max(4, min(64, 4 * mult))
        df.repartition(nparts).write.mode("overwrite").parquet(
            f"{out_dir}/{tname}.parquet"
        )
        counts[tname] = spark.read.parquet(
            f"{out_dir}/{tname}.parquet"
        ).count()
    manifest = {**want, "counts": counts}
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/fdp_sf1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--tables", nargs="*", default=None)
    args = ap.parse_args()
    from flights_data_pipeline_spark.session import get_spark

    spark = get_spark("fdp-gen-scale")
    manifest = generate(spark, args.src, args.out, args.mult, args.tables)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
