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


def content_defined_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 4,
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunking (the rolling-hash boundary technique of
    LBFS/restic-style dedup storage, applied at the token level): a
    chunk boundary falls after token *j* whenever the hash of the
    ``gram`` tokens ending at *j* is ≡ 0 mod ``divisor`` — so boundaries
    depend only on LOCAL content, and two documents that share a long
    passage at DIFFERENT offsets re-synchronize and emit identical
    chunks (fixed-window chunking never recovers from a one-token
    insertion). Expected chunk length ≈ ``divisor`` tokens.

    Emits one row per chunk: ``(id, chunk_idx, n_tokens, chunk_text,
    chunk_hash)`` — ``chunk_hash`` (md5 of the chunk text) is the
    passage-level dedup key to groupBy/anti-join on.

    Scale shape: boundary flags are per-row array algebra (codegen'd,
    zero shuffle); the only exchange is the (id)-partitioned window +
    the (id, chunk) rollup — both linear in tokens. Hashing is
    md5-prefix arithmetic, so the whole segmentation replays in SQL.
    """
    from covid_data_pipeline_spark.operators.dedup import portable_hash31

    # tokenize ONCE into a projected column: the boundary lambda below
    # slices it per position, and an inline tokens() expression would be
    # re-split per array element (HOF lambdas re-evaluate outer
    # expressions; repo-wide pitfall)
    toked = df.select(F.col(id_col), tokens(text_col).alias("_t"))
    t = F.col("_t")
    bounds = F.transform(
        F.sequence(F.lit(1), F.size(t)),
        lambda i: F.when(
            (i >= gram)
            & (
                portable_hash31(
                    F.concat_ws(" ", F.slice(t, i - gram + 1, gram))
                )
                % divisor
                == 0
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    pos = toked.select(
        F.col(id_col),
        F.posexplode(
            F.zip_with(
                t, bounds, lambda tok, b: F.struct(tok.alias("tok"), b.alias("b"))
            )
        ).alias("i", "tb"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(id_col)
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = pos.select(
        id_col,
        "i",
        F.col("tb.tok").alias("tok"),
        (F.lit(1) + F.coalesce(F.sum("tb.b").over(w), F.lit(0)))
        .cast("int")
        .alias("chunk_idx"),
    )
    chunked = seg.groupBy(id_col, "chunk_idx").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("chunk_text"),
    )
    return chunked.select(
        id_col,
        "chunk_idx",
        "n_tokens",
        "chunk_text",
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
    )
