"""Pinned-value oracles for operators whose kernels DuckDB cannot run.

Two registry queries compute with libraries the oracle engine lacks:
``compression_ratio_quality`` (zlib) and ``bpe_train_merges`` (an
iterative greedy train). Both are exactly deterministic for a given
corpus, so their DuckDB oracles can be a *pinned table of independently
recomputed answers*: this module recomputes each answer in pure CPython
(no Spark, no JVM — a genuinely independent code path for BPE; the same
canonical zlib library for compression, which is the point of that
check) over the driver's known corpora, and renders the result as a
VALUES table keyed by a corpus fingerprint.

The fingerprint — ``SUM(strlen(text))`` over ``documents`` — is
evaluated by DuckDB at oracle run time and must select exactly one
pinned corpus; a regenerated corpus matches nothing, the join yields
zero rows, and the driver's row-count gate fails LOUDLY instead of
silently comparing stale pins.

Builders run lazily (``registry.Query.oracle_text``), so importing the
package costs no I/O; the pin is computed once per process.
"""

from __future__ import annotations

import os
import re
import zlib
from collections import Counter
from functools import lru_cache

#: corpora the oracle gate runs against (TESTDATA.md driver contract).
PINNED_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@lru_cache(maxsize=None)
def _corpus(sf_dir: str) -> tuple[tuple[int, str], ...]:
    """Per-corpus read, memoized: the three oracle builders share one
    scan per corpus instead of re-reading parquet each."""
    import duckdb

    return tuple(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    )


def _pinned_dirs() -> list[str]:
    """Existing pinned corpora; a descriptive error beats the opaque
    'VALUES ' SQL syntax error an empty pin list would otherwise raise
    at oracle evaluation time (round-7 ADVICE)."""
    dirs = [sf for sf in PINNED_SF_DIRS if os.path.isdir(sf)]
    if not dirs:
        raise FileNotFoundError(
            "pinned-VALUES oracle: no pinned corpus directory exists "
            f"(looked for {PINNED_SF_DIRS}); regenerate the test data or "
            "extend PINNED_SF_DIRS"
        )
    return dirs


def _fingerprint(rows: tuple[tuple[int, str], ...]) -> int:
    return sum(len(t.encode("utf-8")) for _, t in rows if t is not None)


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def compression_oracle() -> str:
    """Pinned zlib-level-6 compressed sizes per document, per corpus."""
    values = []
    for sf in _pinned_dirs():
        rows = _corpus(sf)
        fp = _fingerprint(rows)
        for doc_id, text in rows:
            nc = (
                "NULL"
                if text is None
                else str(len(zlib.compress(text.encode("utf-8"), 6)))
            )
            values.append(f"({fp}, {doc_id}, {nc})")
    return f"""
    WITH pin AS (
      SELECT DISTINCT * FROM (
        VALUES {', '.join(values)}
      ) v(corpus_fp, doc_id, n_compressed)
    ),
    fp AS (SELECT SUM(strlen(text)) AS f FROM documents)
    SELECT d.doc_id,
           CAST(strlen(d.text) AS BIGINT) AS n_bytes,
           CAST(p.n_compressed AS BIGINT) AS n_compressed,
           CAST(p.n_compressed AS DOUBLE)
             / CAST(strlen(d.text) AS DOUBLE) AS ratio
    FROM documents d
    JOIN pin p ON p.doc_id = d.doc_id
              AND p.corpus_fp = (SELECT f FROM fp)
    """


def _reference_bpe_merges(
    texts: list[str], rounds: int
) -> list[tuple[int, str, str, int]]:
    """Independent pure-Python BPE train (Sennrich et al. 2016, public):
    word-frequency table, adjacent-pair counts, greedy leftmost
    non-overlapping merge; tie-break (count desc, left asc, right asc)
    — the same contract ``text.bpe_train_merges`` implements on Spark
    and ``tests/test_bpe_training.py`` pins bit-exactly."""
    wc: Counter = Counter()
    for txt in texts:
        if txt is None:
            continue
        for w in re.split(r"\s+", txt.strip().lower()):
            wc[w] += 1
    syms = {w: list(w) for w in wc}
    out: list[tuple[int, str, str, int]] = []
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
        for w, s in syms.items():
            ns: list[str] = []
            for x in s:
                if ns and ns[-1] == left and x == right:
                    ns[-1] = left + right
                else:
                    ns.append(x)
            syms[w] = ns
    return out


@lru_cache(maxsize=None)
def _cached_merges(sf_dir: str, rounds: int) -> list[tuple[int, str, str, int]]:
    """Memoized BPE retrain per (corpus, rounds): bpe_train_oracle and
    bpe_apply_oracle share one fit instead of retraining each."""
    return _reference_bpe_merges([t for _, t in _corpus(sf_dir)], rounds)


def bpe_apply_oracle() -> str:
    """Pinned per-document encode stats (n_words, n_bpe_tokens,
    n_chars) after applying the learned merge table — the train→encode
    round trip recomputed end-to-end in the pure-Python reference."""
    from .text import BPE_ROUNDS  # deferred: text.py references this module

    values = []
    for sf in _pinned_dirs():
        rows = _corpus(sf)
        fp = _fingerprint(rows)
        merges = _cached_merges(sf, BPE_ROUNDS)
        for doc_id, text in rows:
            if text is None:
                continue
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
            values.append(
                f"({fp}, {doc_id}, {len(words)}, {n_toks}, "
                f"{sum(len(w) for w in words)})"
            )
    return f"""
    WITH pin AS (
      SELECT DISTINCT * FROM (
        VALUES {', '.join(values)}
      ) v(corpus_fp, doc_id, n_words, n_bpe_tokens, n_chars)
    ),
    fp AS (SELECT SUM(strlen(text)) AS f FROM documents)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM pin WHERE corpus_fp = (SELECT f FROM fp)
    """


def bpe_train_oracle() -> str:
    """Pinned merge table (round, left, right, pair_count) per corpus."""
    from .text import BPE_ROUNDS  # deferred: text.py references this module

    values = []
    for sf in _pinned_dirs():
        rows = _corpus(sf)
        fp = _fingerprint(rows)
        merges = _cached_merges(sf, BPE_ROUNDS)
        for rnd, left, right, cnt in merges:
            values.append(
                f"({fp}, {rnd}, {_sql_str(left)}, {_sql_str(right)}, {cnt})"
            )
    return f"""
    WITH pin AS (
      SELECT DISTINCT * FROM (
        VALUES {', '.join(values)}
      ) v(corpus_fp, rnd, l, r, cnt)
    ),
    fp AS (SELECT SUM(strlen(text)) AS f FROM documents)
    SELECT CAST(rnd AS INT) AS round,
           l AS "left", r AS "right",
           CAST(cnt AS BIGINT) AS pair_count
    FROM pin WHERE corpus_fp = (SELECT f FROM fp)
    """
