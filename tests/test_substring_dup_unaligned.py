"""Pins for the alignment guarantee of ``substring_dup_unaligned``.

The oracle gate proves Spark == DuckDB on the corpus; these tests pin
the claim the corpus cannot: a verbatim cross-doc repeat of
≥ WINNOW_W + 2 tokens is detected at ANY relative alignment (the
winnowing theorem), including alignments the strided byte scan
(``substring_dup_ratio``) provably misses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flights_data_pipeline_spark.queries.dedup import SUBDUP_L, SUBDUP_STRIDE
from flights_data_pipeline_spark.queries.text import WINNOW_W, winnow_fp_set

# A shared passage of exactly WINNOW_W + 2 = 6 tokens — the guarantee
# floor. Long unique prefixes shift its start offset arbitrarily.
SHARED = "alpha beta gamma delta epsilon zeta"


def _docs(spark, prefix_a: str, prefix_b: str):
    return spark.createDataFrame(
        [
            (0, (prefix_a + " " + SHARED).strip()),
            (1, (prefix_b + " " + SHARED).strip()),
        ],
        "doc_id long, text string",
    )


def _dup_doc_ids(docs) -> set[int]:
    f = winnow_fp_set(docs).select("doc_id", "fp_hash").distinct()
    df_tab = f.groupBy("fp_hash").agg(F.count("*").alias("n_docs"))
    dups = (
        f.join(df_tab, "fp_hash")
        .filter(F.col("n_docs") > 1)
        .select("doc_id")
        .distinct()
        .collect()  # scale-ok: two-row unit fixture
    )
    return {r.doc_id for r in dups}


def test_guarantee_floor_any_alignment(spark):
    """The 6-token shared run is found at every relative token offset
    0..WINNOW_W+2 — the winnowing guarantee, alignment-free."""
    filler = ["u%d" % i for i in range(40)]
    for off in range(WINNOW_W + 3):
        pa = " ".join(filler[:10])
        pb = " ".join(f"v{i}" for i in range(10 + off))
        assert _dup_doc_ids(_docs(spark, pa, pb)) == {0, 1}, off


def test_strided_scan_misses_misaligned_repeat(spark):
    """A repeat LONGER than the strided scan's window, placed at a
    relative char offset not divisible by the stride, produces ZERO
    shared strided grams — the documented blind spot — while the
    winnowing fingerprints still flag both docs."""
    # Shared passage longer than SUBDUP_L + SUBDUP_STRIDE (guarantee
    # length for an *aligned* repeat), ~66 chars of 6 tokens repeated.
    passage = " ".join(["alpha beta gamma delta epsilon zeta"] * 2)
    assert len(passage) >= SUBDUP_L + SUBDUP_STRIDE
    # Offsets differ by 3 chars (not a multiple of SUBDUP_STRIDE=10):
    # strided windows of the two docs sample disjoint phases.
    pa, pb = "aaaaaa", "bbb"
    assert (len(pa) - len(pb)) % SUBDUP_STRIDE != 0
    docs = spark.createDataFrame(
        [(0, pa + " " + passage), (1, pb + " " + passage)],
        "doc_id long, text string",
    )

    def strided_grams(text: str) -> set[str]:
        return {
            text[i : i + SUBDUP_L]
            for i in range(0, len(text) - SUBDUP_L + 1, SUBDUP_STRIDE)
        }

    rows = {r.doc_id: r.text for r in docs.collect()}  # scale-ok: unit
    assert not (strided_grams(rows[0]) & strided_grams(rows[1]))
    assert _dup_doc_ids(docs) == {0, 1}


def test_no_false_sharing_on_disjoint_texts(spark):
    docs = spark.createDataFrame(
        [
            (0, " ".join(f"a{i}" for i in range(30))),
            (1, " ".join(f"b{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    assert _dup_doc_ids(docs) == set()
