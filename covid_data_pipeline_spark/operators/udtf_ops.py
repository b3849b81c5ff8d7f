"""Python UDTFs (Spark 4, SPARK-43797): user-defined TABLE functions.

A UDTF is the engine-native escape hatch when one input row must become
a *variable* number of output rows under logic that column algebra can't
express (stateful parsers, external tokenizers). It runs in SQL `FROM` /
`LATERAL` position like any table function.

`ChunkTokensUDTF` deliberately mirrors
`operators/chunking.py::chunk_by_tokens` — the codegen'd explode+slice
path — and the test asserts row-for-row parity between the two. That
makes the perf hierarchy explicit and verified: the column-algebra
chunker is the 100 TB path (whole-stage codegen, zero Python), and the
UDTF is the API-parity fallback you reach for only when the logic stops
being expressible (e.g. swapping in a real BPE tokenizer, which is
exactly a UDTF body swap).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_text string, chunk_tokens int")
class ChunkTokensUDTF:
    """Overlapping token windows of one text: chunk ``i`` covers tokens
    ``[i*stride, i*stride + chunk_size)``, stride = chunk_size − overlap,
    final chunk may be short. Tokenization matches
    ``functions/text.tokens`` (split lowercased trimmed text on runs of
    whitespace)."""

    def eval(self, text: str | None, chunk_size: int, overlap: int):
        if not 0 <= overlap < chunk_size:
            raise ValueError("need 0 <= overlap < chunk_size")
        # F.split on \s+ after trim/lower; empty text yields [""] like
        # Spark's split does, so the twin semantics match exactly.
        toks = re.split(r"\s+", (text or "").strip().lower())
        stride = chunk_size - overlap
        n_chunks = (len(toks) - 1) // stride + 1
        for i in range(n_chunks):
            window = toks[i * stride : i * stride + chunk_size]
            yield i, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Register all package UDTFs on the session (SQL name = snake case)."""
    spark.udtf.register("chunk_tokens_udtf", ChunkTokensUDTF)
