"""Document chunking: split texts into fixed-token windows with overlap.

The chunk step of every chunk→embed→index pipeline. Pure column algebra —
tokenize once, explode a generated chunk-start sequence, slice the token
array per chunk — so it stays in whole-stage codegen with zero shuffles
(row expansion happens partition-locally; parallelism = input splits).
The expansion factor is ~n_tokens/stride, so at 100 TB the caller sizes
output file counts by repartitioning AFTER the explode, never before.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import tokens


def chunk_by_tokens(
    df: DataFrame,
    text_col: str,
    chunk_size: int,
    overlap: int = 0,
    chunk_idx_col: str = "chunk_idx",
    chunk_col: str = "chunk_text",
    n_tokens_col: str = "chunk_tokens",
) -> DataFrame:
    """Explode each row into overlapping ``chunk_size``-token windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)`` with
    ``stride = chunk_size - overlap``; the final chunk may be short.
    Whitespace tokenization via ``functions.text.tokens`` (lowercased) —
    swap in a real tokenizer upstream by pre-materializing a token-count
    column and chunking on that. Deterministic: no hash, no rand.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.floor((n - 1) / stride) + 1
    out = df.withColumn("_toks", toks).withColumn(
        chunk_idx_col,
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))),
    )
    sliced: Column = F.slice(
        F.col("_toks"), F.col(chunk_idx_col) * stride + 1, chunk_size
    )
    return (
        out.withColumn(chunk_col, F.concat_ws(" ", sliced))
        .withColumn(n_tokens_col, F.size(sliced))
        .drop("_toks")
    )
