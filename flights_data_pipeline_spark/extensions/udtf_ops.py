"""Python UDTF surface (§2.11): one row in, many typed rows out.

The reference needs no UDTF (SURVEY.md §2.11 — all transforms are
relational), but the engine exposes the surface because a training-
data pipeline eventually needs a generator-shaped operator that the
relational builtins can't express: document chunking. Fixed-size
token-window chunking with overlap IS expressible with slice/sequence
gymnastics, but the UDTF form is the one that generalizes to
tokenizer-aware or semantic chunkers, so the engine ships it as the
canonical example.

Scale note: Python UDTFs are row-at-a-time (no Arrow batching as of
Spark 4) — acceptable for generators whose output dominates their
compute (chunking emits ~n_tokens/stride rows per doc); anything
scalar-shaped belongs in a pandas_udf instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_idx: int, n_tokens: int, chunk: string")
class ChunkDocument:
    """Split whitespace-tokenized text into overlapping windows of
    ``size`` tokens advancing by ``stride`` (the standard LLM-ingest
    chunker). The tail window is emitted iff it contains new tokens.
    """

    def eval(self, text: str, size: int, stride: int):
        if text is None:
            return
        toks = text.split()
        if not toks:
            return
        idx = 0
        for start in range(0, len(toks), stride):
            window = toks[start : start + size]
            yield idx, len(window), " ".join(window)
            idx += 1
            if start + size >= len(toks):
                break


def chunk_documents(
    df: DataFrame, size: int = 64, stride: int = 48
) -> DataFrame:
    """Chunk ``documents``-shaped rows via the UDTF (lateral join):
    one output row per (doc, window)."""
    return df.lateralJoin(
        ChunkDocument(F.col("text").outer(), lit(size), lit(stride))
    ).select("doc_id", "chunk_idx", "n_tokens", "chunk")
