"""Independent exactness pin for ``longest_shared_run``.

The oracle gate proves Spark == DuckDB on the same diagonal-islands
formulation; this test proves the FORMULATION: for every candidate
pair the query reports, a pure-Python token-level longest-common-
substring DP over the same normalized token lists must equal
``longest_run_tokens`` exactly (a run of R consecutive matching
3-grams on one diagonal spans R+2 tokens, and any common token span
of length L ≥ 3 yields L−2 consecutive gram matches — the two are
equal whenever the LCS is at least 3 tokens).
"""

from __future__ import annotations

import re

from flights_data_pipeline_spark.io.catalog import load_table
from flights_data_pipeline_spark.queries.dedup import longest_shared_run

from .conftest import SF_DIR


def _toks(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _lcs_tokens(a: list[str], b: list[str]) -> int:
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def test_longest_run_equals_token_lcs(spark):
    got = {
        (r["a_id"], r["b_id"]): (r["longest_run_tokens"], r["n_runs"])
        for r in longest_shared_run(spark, SF_DIR).collect()
    }
    assert got, "expected at least one LSH candidate pair at sf0.001"
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()  # scale-ok: sf0.001 unit corpus read for the DP check
    }
    for (a, b), (run, n_runs) in got.items():
        want = _lcs_tokens(_toks(texts[a]), _toks(texts[b]))
        if run == 0:
            # no shared 3-gram ⇒ the true LCS is under 3 tokens (a
            # span of L ≥ 3 would have produced a gram match)
            assert want < 3 and n_runs == 0, (a, b, want, n_runs)
        else:
            assert run == want, (a, b, run, want)
            assert run >= 3 and n_runs >= 1


def test_every_candidate_pair_gets_a_row(spark):
    """Round-9 ADVICE: the output covers the candidate set exactly —
    a pair with no shared 3-gram appears with 0/0, never as a missing
    row."""
    from flights_data_pipeline_spark.queries.dedup import (
        _lsh_candidates,
        _minhash_per_doc,
    )

    per_doc = _minhash_per_doc(spark, SF_DIR)
    cand = {
        (r["a_id"], r["b_id"])
        for r in _lsh_candidates(per_doc)
        .select("a_id", "b_id")
        .collect()  # scale-ok: sf0.001 candidate list for a set-equality pin
    }
    out = {
        (r["a_id"], r["b_id"])
        for r in longest_shared_run(spark, SF_DIR).collect()
    }
    assert out == cand
