"""Similarity search over embedding columns (array<float>).

Two paths:

* brute-force cosine top-k — the exact baseline: broadcast the query
  set, one codegen'd dot product per (candidate, query), per-group
  top-k window. Cost O(|corpus| × |queries|) — right whenever the query
  set is small, at any corpus size (the corpus side stays partitioned,
  never collected).
* random-hyperplane LSH top-k — the scale path for big query sets:
  deterministic hyperplanes bucket vectors by sign bits; candidates
  only within matching buckets (multi-probe over bit-flip neighbors
  for recall). Turns all-pairs into a bucket-equi-join.

Everything is DataFrame built-ins (zip_with/aggregate); math runs in
DOUBLE to be reproducible across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + aggregate (JVM, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; NULL when either norm is 0."""
    ad, bd = _as_double(a), _as_double(b)
    denom = l2_norm(ad) * l2_norm(bd)
    return F.when(denom > 0, dot(ad, bd) / denom)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × corpus,
    cosine, row_number ≤ k with (similarity DESC, candidate id) ordering.

    Scale: the corpus never shuffles — each partition scores its rows
    against the broadcast query block; only the tiny per-partition top-k
    survivors reach the window shuffle (WindowGroupLimit pushes the
    limit down).
    """
    from covid_data_pipeline_spark.operators.windows import top_k_per_group

    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .crossJoin(q)
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("similarity", F.round(cosine(F.col(vec_col), F.col("__qvec")), 4))
    )
    return top_k_per_group(
        scored,
        partition_by=[query_id_col],
        order_by=[F.col("similarity").desc(), F.col(id_col)],
        k=k,
    ).select(query_id_col, id_col, "similarity")


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure-python LCG —
    reproducible everywhere, no numpy state)."""
    state = seed
    planes: list[list[float]] = []
    for _ in range(num_planes):
        v = []
        for _ in range(dim):
            # Park–Miller LCG → uniform(-1, 1)
            state = (state * 48271) % 2147483647
            v.append(state / 2147483647 * 2 - 1)
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
    seed: int = 42,
) -> DataFrame:
    """Sign-bit bucket id from ``num_planes`` fixed hyperplanes. Vectors
    with high cosine similarity land in the same bucket w.h.p."""
    planes = _hyperplanes(dim, num_planes, seed)
    bucket = F.lit(0).cast("long")
    v = _as_double(F.col(vec_col))
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = (dot(v, plane) >= 0).cast("long")
        bucket = bucket + bit * F.lit(2 ** i).cast("long")
    return df.withColumn(bucket_col, bucket)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: only candidates whose bucket matches the query's
    bucket (or differs by ≤ ``multiprobe_bits`` sign bits, via probe
    expansion on the query side — the small side) are scored.

    Scale: candidate generation is an equi-join on ``bucket`` — shuffle
    keyed by bucket, work proportional to bucket sizes. Recall is tuned
    with num_planes (bucket granularity) × multiprobe_bits (probes).
    """
    from covid_data_pipeline_spark.operators.windows import top_k_per_group

    c = with_lsh_bucket(corpus, dim, num_planes, vec_col, "bucket")
    q = with_lsh_bucket(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec")),
        dim,
        num_planes,
        "__qvec",
        "bucket",
    )
    # Multi-probe: expand each query to its bucket + single-bit flips.
    probes = [F.col("bucket")]
    if multiprobe_bits >= 1:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit(2 ** i).cast("long"))
            for i in range(num_planes)
        ]
    q_probed = q.select(
        query_id_col, "__qvec", F.explode(F.array(*probes)).alias("bucket")
    )
    scored = (
        c.join(F.broadcast(q_probed), on="bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("similarity", F.round(cosine(F.col(vec_col), F.col("__qvec")), 4))
    )
    return top_k_per_group(
        scored,
        partition_by=[query_id_col],
        order_by=[F.col("similarity").desc(), F.col(id_col)],
        k=k,
    ).select(query_id_col, id_col, "similarity")


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold), candidates restricted to same LSH bucket. The embedding
    arm of the dedup suite."""
    b = with_lsh_bucket(df, dim, num_planes, vec_col, "bucket")
    l = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    r = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    return (
        l.join(r, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("similarity", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 4))
        .filter(F.col("similarity") >= threshold)
        .select("id_a", "id_b", "similarity")
        .distinct()
    )
