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
#: The at-scale gate (tools/driver_sim.py --sf .../sf0.1) adds sf0.1
#: via SPARK_GRAFT_PIN_SF01=1 — opt-in because building sf0.1 pins
#: (CPython zlib over 50k docs, BPE train, kmeans reference on 20k
#: vectors) costs minutes the driver's per-round sf0.01 gate should
#: not pay.
PINNED_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"] + (
    ["/root/testdata/sf0.1"]
    if os.environ.get("SPARK_GRAFT_PIN_SF01") == "1"
    else []
)


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


# ---------------------------------------------------------------------------
# K-means-family pins: the fit is an iterative fixed point with no SQL
# twin, but it IS exactly deterministic (operators/kmeans.py contract,
# bit-pinned vs tests/kmeans_reference.py). So the oracle recomputes
# the model in the INDEPENDENT pure-Python reference per pinned corpus,
# renders centroids/assignments as fingerprint-keyed VALUES, and lets
# DuckDB evaluate everything downstream (probe routing, in-block
# cosine, closure) analytically — upgrading four rows-only queries to
# full hash-matched oracles (round-7 VERDICT task 5).
# ---------------------------------------------------------------------------

#: DuckDB-evaluated embeddings-corpus fingerprint (value-sensitive so a
#: regenerated corpus matches no pin and fails LOUDLY on row count).
EMB_FP_EXPR = (
    "CAST(SUM(CAST(floor(abs(CAST(embedding[1] AS DOUBLE)) * 1048576.0) "
    "AS BIGINT) * (vec_id + 7)) + COUNT(*) AS BIGINT)"
)


@lru_cache(maxsize=None)
def _emb_corpus(sf_dir: str) -> tuple[tuple[int, tuple[float, ...]], ...]:
    import duckdb

    return tuple(
        (int(i), tuple(map(float, v)))
        for i, v in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
            "ORDER BY vec_id"
        ).fetchall()
    )


@lru_cache(maxsize=None)
def _emb_fp(sf_dir: str) -> int:
    import duckdb

    return int(
        duckdb.sql(
            f"SELECT {EMB_FP_EXPR} FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
    )


@lru_cache(maxsize=None)
def _kmeans_pin(sf_dir: str, k: int):
    """(centroids, n_members, labels, top2_labels) from the pure-Python
    reference Lloyd's at the exact _kmeans_cached configuration
    (3-round hash init, tol=1e-6)."""
    from tests.kmeans_reference import _sq_l2, reference_kmeans

    vecs = {i: list(v) for i, v in _emb_corpus(sf_dir)}
    cents, n_members, _, _ = reference_kmeans(
        vecs, k=k, max_iterations=3, tol=1e-6, init="hash"
    )
    labels, top2 = {}, {}
    for i, v in vecs.items():
        ranked = sorted((_sq_l2(v, c), cid) for cid, c in sorted(cents.items()))
        labels[i] = ranked[0][1]
        top2[i] = [cid for _, cid in ranked[:2]]
    return cents, n_members, labels, top2


def _f32(x: float) -> float:
    """float32-widened double — Spark's double→float cast, exactly."""
    import struct as _s

    return _s.unpack("<f", _s.pack("<f", x))[0]


def _fp_gate(pin_cte: str) -> str:
    return f"""{pin_cte},
    fp AS (SELECT {EMB_FP_EXPR} AS f FROM embeddings)"""


def kmeans_fit_oracle() -> str:
    """ivf_kmeans_fit: pinned (cluster_id, n_members, centroid_norm)."""
    import math

    values = []
    for sf in _pinned_dirs():
        fp = _emb_fp(sf)
        cents, n_members, _, _ = _kmeans_pin(sf, 8)
        for cid in sorted(cents):
            acc = 0.0
            for x in cents[cid]:
                acc += x * x
            # CAST('…' AS DOUBLE): a bare decimal literal in VALUES is
            # typed DECIMAL and its cast to DOUBLE can land 1 ulp off;
            # string→double parses correctly rounded
            values.append(
                f"({fp}, {cid}, {n_members[cid]}, "
                f"CAST('{math.sqrt(acc)!r}' AS DOUBLE))"
            )
    return f"""
    WITH {_fp_gate(f'''pin AS (
      SELECT DISTINCT * FROM (VALUES {', '.join(values)})
        v(corpus_fp, cluster_id, n_members, centroid_norm)
    )''')}
    SELECT CAST(cluster_id AS INT) AS cluster_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(centroid_norm AS DOUBLE) AS centroid_norm
    FROM pin WHERE corpus_fp = (SELECT f FROM fp)
    """


def _closure_sql(pairs_cte: str) -> str:
    """Recursive-CTE min-label closure over ``pairs (a_id, b_id)`` —
    the same shape as the near_dup_clusters oracle."""
    return f"""
    edges AS (
      SELECT a_id AS u, b_id AS v FROM ({pairs_cte})
      UNION
      SELECT b_id AS u, a_id AS v FROM ({pairs_cte})
    ),
    reach AS (
      SELECT u AS node, u AS lbl FROM edges
      UNION
      SELECT e.v AS node, r.lbl
      FROM reach r JOIN edges e ON e.u = r.node
    ),
    comp AS (
      SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
    )"""


def _labels_values(k_for_sf, top2: bool) -> str:
    """Pinned (corpus_fp, vec_id, cluster_id) rows; ``k_for_sf`` maps a
    corpus dir to ITS adaptive block count — sf0.001/sf0.01 share k=8
    but sf0.1's 20k vectors block at k=32, so one global k cannot pin
    every corpus (found by the round-12 sf0.1 gate)."""
    values = []
    for sf in _pinned_dirs():
        fp = _emb_fp(sf)
        _, _, labels, top2_labels = _kmeans_pin(sf, k_for_sf(sf))
        for i in sorted(labels):
            blocks = top2_labels[i] if top2 else [labels[i]]
            for cid in blocks:
                values.append(f"({fp}, {i}, {cid})")
    return ", ".join(values)


def _semantic_dedup_oracle(k_for_sf, top2: bool) -> str:
    from .similarity import SEMANTIC_DUP_COSINE, _duck_dot
    dot_ab = _duck_dot("a.embedding", "b.embedding")
    pairs = f"""
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM v a JOIN v b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE {dot_ab} / (a.nrm * b.nrm) >= {SEMANTIC_DUP_COSINE!r}
    """
    return f"""
    WITH RECURSIVE {_fp_gate(f'''lblpin AS (
      SELECT DISTINCT * FROM (VALUES {_labels_values(k_for_sf, top2)})
        v(corpus_fp, vec_id, cluster_id)
    )''')},
    v AS (
      SELECT e.vec_id, e.embedding,
             sqrt({_duck_dot('e.embedding', 'e.embedding')}) AS nrm,
             l.cluster_id
      FROM embeddings e
      JOIN lblpin l ON l.vec_id = e.vec_id
                   AND l.corpus_fp = (SELECT f FROM fp)
    ),
    {_closure_sql(pairs)}
    SELECT CAST(node AS BIGINT) AS vec_id,
           CAST(component AS BIGINT) AS dup_group,
           node = component AS is_representative
    FROM comp
    """


def semantic_cluster_dedup_oracle() -> str:
    from .similarity import adaptive_kmeans_blocks

    return _semantic_dedup_oracle(
        lambda sf: adaptive_kmeans_blocks(len(_emb_corpus(sf))),
        top2=False,
    )


def semantic_dedup_multiblock_oracle() -> str:
    from .similarity import adaptive_kmeans_blocks

    return _semantic_dedup_oracle(
        lambda sf: adaptive_kmeans_blocks(len(_emb_corpus(sf)), 2),
        top2=True,
    )


def ann_ivf_kmeans_oracle() -> str:
    """ann_ivf_kmeans: pinned k-means assignment + float32-widened
    centroids; probe routing / in-list cosine / top-k analytically —
    the _ivf_oracle shape with the trained quantizer pinned in."""
    from .similarity import (
        IVF_N_LISTS,
        IVF_N_PROBE,
        N_QUERIES,
        TOP_K,
        _duck_dot,
    )

    cent_values = []
    for sf in _pinned_dirs():
        fp = _emb_fp(sf)
        cents, _, _, _ = _kmeans_pin(sf, IVF_N_LISTS)
        for cid in sorted(cents):
            arr = ", ".join(
                f"CAST('{_f32(x)!r}' AS DOUBLE)" for x in cents[cid]
            )
            cent_values.append(f"({fp}, {cid}, [{arr}])")
    dot_qc = _duck_dot("q.q_emb", "c.c_emb")
    dot_pa = _duck_dot("p.q_emb", "a.embedding")
    return f"""
    WITH {_fp_gate(f'''lblpin AS (
      SELECT DISTINCT * FROM (VALUES {_labels_values(lambda sf: IVF_N_LISTS, False)})
        v(corpus_fp, vec_id, list_id)
    )''')},
    centpin AS (
      SELECT * FROM (VALUES {', '.join(cent_values)})
        v(corpus_fp, list_id, c_emb)
    ),
    cent AS (
      SELECT list_id, c_emb,
             sqrt({_duck_dot('c_emb', 'c_emb')}) AS c_nrm
      FROM centpin WHERE corpus_fp = (SELECT f FROM fp)
    ),
    v AS (
      SELECT vec_id, embedding,
             sqrt({_duck_dot('embedding', 'embedding')}) AS nrm
      FROM embeddings
    ),
    assign AS (
      SELECT v.vec_id, v.embedding, v.nrm, l.list_id
      FROM v JOIN lblpin l ON l.vec_id = v.vec_id
                          AND l.corpus_fp = (SELECT f FROM fp)
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
          FROM v WHERE vec_id < {N_QUERIES}),
    qprobe AS (
      SELECT query_id, q_emb, q_nrm, list_id FROM (
        SELECT q.query_id, q.q_emb, q.q_nrm, c.list_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {dot_qc} / (q.q_nrm * c.c_nrm) DESC, c.list_id) AS rn
        FROM q CROSS JOIN cent c
      ) WHERE rn <= {IVF_N_PROBE}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {dot_pa} / (p.q_nrm * a.nrm) AS cosine
      FROM qprobe p JOIN assign a ON p.list_id = a.list_id
      WHERE a.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """
