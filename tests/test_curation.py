"""Curation operators: PII regex contract + packing/quota invariants.

The registered curation queries are oracle-gated by
``test_queries_oracle.py``; these tests pin what the corpus gate
cannot — the PII patterns MATCHING (the synthetic corpus has no PII,
so the corpus query only proves no-corruption) and the structural
invariants of quota sampling and sequence packing.
"""

from __future__ import annotations

import duckdb

from flights_data_pipeline_spark.queries.curation import (
    DOMAIN_QUOTA,
    EMAIL_PATTERN,
    PACK_BUDGET,
    PHONE_PATTERN,
    _EMAIL_SQL,
    _PHONE_SQL,
    redact_pii,
)
from flights_data_pipeline_spark.queries import REGISTRY

PII_SAMPLES = [
    (1, "contact alice.smith+spam@example.co.uk or bob@sub.domain.org now"),
    (2, "call 555-867-5309 or 555.123.4567 today"),
    (3, "mixed: x@y.io then 123-456-7890 then x@y.io again"),
    (4, "no pii here, just words and e-mail-free text @ not-an-email"),
    (5, "edge 12-345-6789 (too short) and user@host (no tld)"),
]


def test_pii_redaction_matches_duckdb_on_crafted_strings(spark):
    df = redact_pii(
        spark.createDataFrame(PII_SAMPLES, ["id", "text"]), "text"
    ).select("id", "n_emails", "n_phones", "redacted")
    got = {r["id"]: r.asDict() for r in df.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE s(id INT, text VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", PII_SAMPLES)
    want = con.execute(
        f"""
        SELECT id,
               len(regexp_extract_all(text, '{_EMAIL_SQL}')) AS n_emails,
               len(regexp_extract_all(text, '{_PHONE_SQL}')) AS n_phones,
               regexp_replace(regexp_replace(text, '{_EMAIL_SQL}', '<EMAIL>',
                                             'g'),
                              '{_PHONE_SQL}', '<PHONE>', 'g') AS redacted
        FROM s
        """
    ).fetchall()
    for id_, n_emails, n_phones, redacted in want:
        assert got[id_]["n_emails"] == n_emails, id_
        assert got[id_]["n_phones"] == n_phones, id_
        assert got[id_]["redacted"] == redacted, id_

    # the patterns actually fire (the corpus gate can't prove this)
    assert got[1]["n_emails"] == 2 and "<EMAIL>" in got[1]["redacted"]
    assert got[2]["n_phones"] == 2 and "<PHONE>" in got[2]["redacted"]
    assert got[3]["n_emails"] == 2 and got[3]["n_phones"] == 1
    assert got[4]["n_emails"] == 0 and got[4]["n_phones"] == 0
    assert got[5]["n_emails"] == 0 and got[5]["n_phones"] == 0


def test_domain_quota_caps_every_source(spark, sf_dir):
    out = REGISTRY["domain_quota_sample"].fn(spark, sf_dir)
    per_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert per_src and all(n <= DOMAIN_QUOTA for n in per_src.values())


def test_pack_sequences_bins_are_contiguous_per_source(spark, sf_dir):
    rows = REGISTRY["pack_sequences"].fn(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["cum_tokens"])
        run = 0
        for r in rs:
            # bin = floor(start_offset / budget); offsets are a prefix sum
            assert r["seq_bin"] == run // PACK_BUDGET, (src, r)
            run += r["n_tokens"]
            assert r["cum_tokens"] == run
        # bins are dense: 0..max with no gaps
        bins = sorted({r["seq_bin"] for r in rs})
        assert bins == list(range(bins[-1] + 1))


def test_training_shards_invariants(spark, sf_dir):
    """Equal-count sharding invariants: shard sizes differ by at most
    one, shards partition the corpus exactly, and the hash ranges are
    disjoint and ordered (contiguous NTILE ranges over the md5 order)."""
    from flights_data_pipeline_spark.queries.curation import N_SHARDS

    rows = sorted(
        REGISTRY["training_shards"].fn(spark, sf_dir).collect(),
        key=lambda r: r.shard_id,
    )
    assert [r.shard_id for r in rows] == list(range(1, N_SHARDS + 1))
    n_total = sum(r.n_docs for r in rows)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert n_total == n_docs
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # the first n % k shards carry the extra row, in order
    extra = n_docs % N_SHARDS
    if extra:
        assert sizes[:extra] == [sizes[-1] + 1] * extra
    # hash ranges are disjoint and ascending shard by shard
    for a, b in zip(rows, rows[1:]):
        assert a.last_hash < b.first_hash or (
            a.last_hash == b.first_hash  # duplicate hash split at boundary
        )


def test_domain_token_budget_null_text_never_admitted(spark, tmp_path):
    """A NULL-text survivor must NOT be admitted (round-9 ADVICE): a
    window SUM skips NULLs in both engines, so without the explicit
    ``n_tokens IS NOT NULL`` gate the NULL-text row inherits the
    previous running sum and is counted in n_admitted while buying no
    tokens. Pins the gate on a fixture the corpus lacks (no NULL text
    in testdata), and pins Spark == DuckDB on the same fixture."""
    import duckdb as _duck

    from flights_data_pipeline_spark.queries.curation import MIX_BUDGET
    from tests.oracle_utils import rows_to_multiset

    docs = spark.createDataFrame(
        [
            (1, "t1 t2 t3 t4 t5", "en", "a", 14),
            (2, "u1 u2 u3 u4 u5", "en", "a", 14),
            (3, "v1 v2 v3 v4 v5", "en", "a", 14),
            (4, None, "en", "a", 0),  # NULL text: must never be admitted
            (5, "w1 w2 w3 w4 w5 w6 w7", "en", "b", 20),
            (6, "x1 x2 x3 x4 x5 x6 x7", "en", "b", 20),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")

    q = REGISTRY["domain_token_budget"]
    sdf = q.fn(spark, str(tmp_path))
    rows = {r["source"]: r.asDict() for r in sdf.collect()}
    # total tokens (29) << MIX_BUDGET, so every NON-NULL survivor is
    # admitted; the NULL-text doc is a survivor (distinct fp) but must
    # be excluded from the admitted count
    assert MIX_BUDGET > 29
    assert rows["a"]["n_surv"] == 4  # NULL-text row IS a survivor
    assert rows["a"]["n_admitted"] == 3  # ...but never admitted
    assert rows["a"]["tokens_admitted"] == 15
    assert rows["b"]["n_admitted"] == 2
    assert rows["b"]["tokens_admitted"] == 14

    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    cur = con.execute(q.oracle_text())
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    con.close()
    s_rows = [tuple(r) for r in sdf.collect()]
    assert rows_to_multiset(s_rows, sdf.columns) == rows_to_multiset(
        o_rows, o_cols
    )


def test_span_budget_admission_trim_dividend_invariants(spark, sf_dir):
    """The post-trim gate can only ever admit MORE: per doc
    tokens_after <= tokens_before and the admission order (hashed key)
    is identical pre/post, so the post-trim running sum is pointwise
    <= the pre-trim one — every pre-trim-admitted doc stays admitted.
    Also: budget_used respects the cap, and the trimmed-token column
    only counts admitted docs (bounded by tokens_admitted's
    complement)."""
    from flights_data_pipeline_spark.queries.curation import (
        ADMIT_TOKEN_BUDGET,
        span_budget_admission,
    )

    rows = span_budget_admission(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_admitted"] >= r["n_admitted_pretrim"]
        assert r["extra_docs_admitted"] == (
            r["n_admitted"] - r["n_admitted_pretrim"]
        )
        assert r["extra_docs_admitted"] >= 0
        assert 0 <= r["budget_used"] <= ADMIT_TOKEN_BUDGET
        assert r["tokens_admitted"] <= r["budget_used"] or r["n_admitted"] == 0
        assert r["tokens_trimmed_in_admitted"] >= 0
