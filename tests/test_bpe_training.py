"""bpe_train_merges bit-pin: the distributed trainer reproduces a
pure-Python reference BPE exactly — learned merges AND pair counts —
plus kernel-level pins on the greedy merge-application fold."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
from pyspark.sql import functions as F

from flights_data_pipeline_spark.queries.registry import REGISTRY
from flights_data_pipeline_spark.queries.text import (
    BPE_ROUNDS,
    _bpe_apply_merge,
)

from .conftest import SF_DIR


def _reference_bpe(texts: list[str], rounds: int):
    """Reference BPE (Sennrich et al. 2016 semantics): word-frequency
    table, adjacent-pair counting, greedy leftmost non-overlapping
    merge application. Tie-break = (count desc, left, right asc)."""
    wc: Counter = Counter()
    for txt in texts:
        for w in re.split(r"\s+", txt.strip().lower()):
            wc[w] += 1
    syms = {w: list(w) for w in wc}
    out = []
    for rnd in range(1, rounds + 1):
        pc: Counter = Counter()
        for w, f in wc.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rnd, left, right, cnt))
        merged = left + right
        for w, s in syms.items():
            ns: list[str] = []
            for x in s:
                if ns and ns[-1] == left and x == right:
                    ns[-1] = merged
                else:
                    ns.append(x)
            syms[w] = ns
    return out, syms


def test_bpe_merges_match_reference_bitexact(spark):
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    want, _ = _reference_bpe(texts, BPE_ROUNDS)
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in REGISTRY["bpe_train_merges"].fn(spark, SF_DIR).collect()
    ]
    assert got == want


def test_bpe_apply_merge_kernel_edges(spark):
    """The in-row fold matches greedy leftmost semantics on the
    classic traps: self-pair chains ('aaaa' + (a,a) -> [aa, aa], never
    [aaa, a] or [aaaa]), no re-merge onto a fresh merge, empty and
    single-symbol arrays."""
    cases = [
        (["a", "a", "a", "a"], ("a", "a"), ["aa", "aa"]),
        (["a", "a", "a"], ("a", "a"), ["aa", "a"]),
        (["a", "b", "a", "b"], ("a", "b"), ["ab", "ab"]),
        (["x", "a", "b", "b"], ("a", "b"), ["x", "ab", "b"]),
        (["a"], ("a", "a"), ["a"]),
        ([], ("a", "b"), []),
        # merged symbol must not chain: (ab) then next a,b merges too,
        # but 'ab'+'a' is NOT the pair (a, b)
        (["a", "b", "a"], ("a", "b"), ["ab", "a"]),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(cases)],
        "i int, syms array<string>",
    )
    for i, (_, (left, right), want) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_bpe_apply_merge(F.col("syms"), left, right).alias("m"))
            .first()["m"]
        )
        assert got == want, (i, got, want)


def test_bpe_apply_learned_matches_reference_encoder(spark):
    """The encode half: per-doc BPE token counts after applying the
    learned merges equal the pure-Python reference encoder's, for
    every document."""
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    texts = [r[1] for r in rows]
    merges, _ = _reference_bpe(texts, BPE_ROUNDS)

    def encode_count(text: str) -> tuple[int, int, int]:
        words = re.split(r"\s+", text.strip().lower())
        n_toks = 0
        for w in words:
            s = list(w)
            for _, left, right, _ in merges:
                ns: list[str] = []
                for x in s:
                    if ns and ns[-1] == left and x == right:
                        ns[-1] = left + right
                    else:
                        ns.append(x)
                s = ns
            n_toks += len(s)
        return len(words), n_toks, sum(len(w) for w in words)

    want = {doc_id: encode_count(text) for doc_id, text in rows}
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars"])
        for r in REGISTRY["bpe_apply_learned"].fn(spark, SF_DIR).collect()
    }
    assert got == want
    # compression sanity: merges strictly reduce token counts vs chars
    assert sum(v[1] for v in got.values()) < sum(v[2] for v in got.values())
