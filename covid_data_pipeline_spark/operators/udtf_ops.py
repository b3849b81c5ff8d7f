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


@udtf
class TopTokensUDTF:
    """Polymorphic UDTF (Spark 4 ``analyze``-time schema): emits the k
    most frequent whitespace tokens of a text with counts — the output
    WIDTH comes from a constant argument, so the schema is computed per
    call site by ``analyze`` instead of being declared statically
    (``ChunkTokensUDTF`` shows the static form; this shows the dynamic
    one). With ``flat=true`` → long format (rank, token, cnt); with
    ``flat=false`` → one wide row (token_1, cnt_1, …, token_k, cnt_k).
    Ties break lexically, matching the engine's window tie policy."""

    @staticmethod
    def analyze(text, k, flat):  # noqa: ANN001, ANN205 — AnalyzeArgument
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StringType,
            StructType,
        )

        if not k.isConstantExpression or not flat.isConstantExpression:
            raise ValueError("k and flat must be constant")
        schema = StructType()
        if flat.value:
            schema = (
                schema.add("rank", IntegerType())
                .add("token", StringType())
                .add("cnt", LongType())
            )
        else:
            for i in range(1, int(k.value) + 1):
                schema = schema.add(f"token_{i}", StringType()).add(
                    f"cnt_{i}", LongType()
                )
        return AnalyzeResult(schema=schema)

    def eval(self, text: str | None, k: int, flat: bool):
        from collections import Counter

        toks = re.split(r"\s+", (text or "").strip().lower())
        top = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        if flat:
            for i, (tok, cnt) in enumerate(top, start=1):
                yield i, tok, cnt
        else:
            row: list = []
            for i in range(k):
                row += list(top[i]) if i < len(top) else [None, None]
            yield tuple(row)
