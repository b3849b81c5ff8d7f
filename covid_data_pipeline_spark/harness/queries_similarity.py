"""Similarity-search queries over the embeddings table (north-star
extras) plus multimodal-plumbing queries over synthesized media rows.

The brute-force cosine top-k has a DuckDB oracle (both engines compute
the dot product left-to-right in DOUBLE, then round to 4 dp and rank by
the rounded value with an id tiebreaker — bit-stable across engines).
The LSH variants are approximate vs the exact answer yet still
hash-verifiable: the hyperplanes come from a deterministic Park–Miller
LCG that ``_lsh_bucket_prefix_sql`` regenerates inside SQL, so the whole
bucket/probe/score/top-k chain replays bit-identically in DuckDB. Only
the trained-quantizer paths (IVF/PQ: float k-means over xxhash64-ordered
init) stay rows-only — recall floors asserted in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from covid_data_pipeline_spark.functions.scalar import round_stable
from covid_data_pipeline_spark.harness.registry import register, table
from covid_data_pipeline_spark.harness.tables import dim_count
from covid_data_pipeline_spark.operators.relational import size_gated_broadcast
from covid_data_pipeline_spark.operators.multimodal import (
    chunk_audio_plan,
    decode_and_featurize_images,
    frame_sample_plan,
    media_fingerprint,
)
from covid_data_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_bruteforce_np,
    cosine_topk_ivf,  # noqa: F401 — float path kept as public API
    cosine_topk_ivf_lattice,
    cosine_topk_lsh,
    embedding_neardup_pairs,
    train_centroids,  # noqa: F401 — float path kept as public API
)

EMBED_DIM = 64
N_QUERIES = 5
TOP_K = 5

_COSINE_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> x::DOUBLE) AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(
           list_dot_product(list_transform(e.embedding, x -> x::DOUBLE), q.qv)
           / (sqrt(list_dot_product(list_transform(e.embedding, x -> x::DOUBLE),
                                    list_transform(e.embedding, x -> x::DOUBLE)))
              * sqrt(list_dot_product(q.qv, q.qv))), 4) + 0 AS similarity
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, similarity FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY similarity DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= {TOP_K}
"""


@register(
    "similarity_topk_bruteforce",
    _COSINE_ORACLE,
    tags=("similarity", "ann-baseline"),
    bench=True,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_bruteforce(
        e, queries, k=TOP_K, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id",
    )


def _lsh_bucket_prefix_sql(dim: int, num_planes: int, seed: int) -> str:
    """Shared CTE prefix replaying ``_hyperplanes`` + ``with_lsh_bucket``:
    regenerates the Park–Miller LCG plane doubles (integer LCG state is
    exact; ``//`` avoids DuckDB's rounding int division) and ends in
    ``lvecs(vec_id, ve)`` + ``bucketed(vec_id, bucket)``. Embedders must
    open with ``WITH RECURSIVE``."""
    return f"""lcg(n, state) AS (
  SELECT 1, CAST({seed} * 48271 % 2147483647 AS BIGINT)
  UNION ALL
  SELECT n + 1, state * 48271 % 2147483647 FROM lcg WHERE n < {num_planes * dim}
),
rawp AS (
  SELECT (n - 1) // {dim} AS pid, (n - 1) % {dim} AS pos,
         CAST(state AS DOUBLE) / 2147483647 * 2 - 1 AS x
  FROM lcg
),
planes AS (SELECT pid, list(x ORDER BY pos) AS pv FROM rawp GROUP BY pid),
pnorm AS (
  SELECT pid, list_transform(pv, x -> x / sqrt(list_dot_product(pv, pv))) AS pn
  FROM planes
),
lvecs AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
  FROM embeddings
),
lbits AS (
  SELECT v.vec_id, p.pid,
         CASE WHEN list_dot_product(v.ve, p.pn) >= 0 THEN 1 ELSE 0 END AS bit
  FROM lvecs v, pnorm p
),
bucketed AS (
  SELECT vec_id, CAST(SUM(bit * (1::BIGINT << pid)) AS BIGINT) AS bucket
  FROM lbits GROUP BY vec_id
)"""


# Replay of ``cosine_topk_lsh`` (4 planes, 1-bit multiprobe): query-side
# probe expansion, bucket equi-join, UN-normalized cosine in the same
# ``dot / (norm_a * norm_b)`` op order as ``operators.similarity.cosine``.
_TOPK_LSH_ORACLE = f"""
WITH RECURSIVE {_lsh_bucket_prefix_sql(EMBED_DIM, 4, 42)},
q AS (
  SELECT l.vec_id AS query_id, l.ve AS qv, b.bucket
  FROM lvecs l JOIN bucketed b ON l.vec_id = b.vec_id
  WHERE l.vec_id < {N_QUERIES}
),
pmask AS (
  SELECT CAST(0 AS BIGINT) AS m
  UNION ALL
  SELECT 1::BIGINT << i FROM range(4) t(i)
),
cand AS (
  SELECT p.query_id, p.qv, c.vec_id, l.ve
  FROM (SELECT query_id, qv, xor(bucket, m) AS bucket FROM q, pmask) p
  JOIN bucketed c ON p.bucket = c.bucket
  JOIN lvecs l ON c.vec_id = l.vec_id
  WHERE c.vec_id <> p.query_id
),
scored AS (
  SELECT query_id, vec_id,
         ROUND(list_dot_product(ve, qv) /
               (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(qv, qv))),
               4) + 0 AS similarity
  FROM cand
)
SELECT query_id, vec_id, similarity FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY similarity DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= {TOP_K}
"""


@register(
    "similarity_topk_lsh",
    _TOPK_LSH_ORACLE,
    tags=("similarity", "ann-lsh"),
    bench=True,
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # 4 planes (16 buckets), 1-bit multiprobe: ~30% of the corpus scored
    # per query at ~50% top-5 recall on this weakly-clustered corpus
    # (top-5 cosine ≈ 0.3 ⇒ P(bit agree) ≈ 0.6; recall ≈ p⁴+4p³(1-p)).
    # More planes only pay off when neighbors are actually close.
    return cosine_topk_lsh(
        e, queries, dim=EMBED_DIM, k=TOP_K, num_planes=4,
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
        multiprobe_bits=1,
    )


@register(
    "similarity_topk_bruteforce_np",
    _COSINE_ORACLE,  # same exact semantics as the HOF variant
    tags=("similarity", "ann-baseline", "pandas-udf"),
    bench=True,
)
def similarity_topk_bruteforce_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy twin of the brute-force path — BLAS matmul per batch;
    must hash-match the same oracle as the HOF variant."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_bruteforce_np(
        e, queries, k=TOP_K, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id",
    )


def _ivf_oracle() -> str:
    from covid_data_pipeline_spark.operators.clustering import (
        ivf_lattice_oracle_sql,
    )

    return ivf_lattice_oracle_sql(
        n_centroids=16, iters=2, nprobe=4, top_k=TOP_K, n_queries=N_QUERIES
    )


@register(
    "similarity_topk_ivf",
    _ivf_oracle(),
    tags=("similarity", "ann-ivf", "iterative"),
    bench=True,
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold path: quantizer training + probe-limited query in one run —
    what a first index build costs. The amortized path is
    ``similarity_topk_ivf_pretrained``. Round 5 upgraded this from
    rows-only to hash-verified by swapping the float spherical k-means
    coarse quantizer for the integer-lattice Lloyd trainer
    (`operators/similarity.py::cosine_topk_ivf_lattice`): on these
    unit-norm embeddings the lattice L2 argmin IS spherical assignment,
    and the DuckDB oracle replays training, cells, probes, and the
    exact-cosine rerank — the hash certifies the approximate index
    itself, not just a recall bound. The float path
    (`cosine_topk_ivf`) remains for callers; its recall floor is
    asserted in tests/test_dedup_similarity.py."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_ivf_lattice(
        e, queries, k=TOP_K, n_centroids=16, nprobe=4, iters=2,
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
    )


_IVF_CENTROIDS: dict[str, list[tuple[int, list[int]]]] = {}


@register(
    "similarity_topk_ivf_pretrained",
    _ivf_oracle(),
    tags=("similarity", "ann-ivf", "pretrained", "iterative"),
    bench=True,
)
def similarity_topk_ivf_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amortized path: an IVF index is trained once per corpus, then
    serves every query — the integer-lattice quantizer is memoized per
    sf_dir exactly like a warehouse persists the index build (at scale:
    store the cell id as a partition column and the probe join becomes
    partition pruning). Benchmarked separately from
    ``similarity_topk_ivf`` so the headline numbers split one-time
    build cost from steady-state query cost. Same oracle as the cold
    path — memoization cannot change the exact integer centroids, which
    is itself a property the hash check proves every round."""
    from covid_data_pipeline_spark.operators.clustering import (
        train_centroids_lattice,
    )

    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    if sf_dir not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[sf_dir] = train_centroids_lattice(
            e, k=16, iters=2
        )
    return cosine_topk_ivf_lattice(
        e, queries, k=TOP_K, n_centroids=16, nprobe=4,
        centroids=_IVF_CENTROIDS[sf_dir],
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
    )


@register(
    "embedding_neardup",
    """
    WITH doubled AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
    ),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
      FROM doubled
    ),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_dot_product(a.ve, b.ve) /
                   (sqrt(list_dot_product(a.ve, a.ve)) *
                    sqrt(list_dot_product(b.ve, b.ve))), 4) + 0 AS similarity
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, similarity FROM p WHERE similarity >= 0.99
    """,
    tags=("similarity", "dedup"),
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle is exact ALL-pairs cosine; the Spark side is LSH-bucketed.
    Equality (not a recall bound) holds on this corpus because the only
    pairs ≥ 0.99 are the planted exact duplicates (measured max
    non-planted pair cosine ≈ 0.51 at sf0.01/sf0.001), and identical
    vectors always share an LSH bucket (same sign bits)."""
    e = table(spark, sf_dir, "embeddings")
    # Plant exact duplicates (vec_id+1e6) so the operator provably fires.
    doubled = e.select("vec_id", "embedding").unionByName(
        e.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    return embedding_neardup_pairs(
        doubled, dim=EMBED_DIM, threshold=0.99, num_planes=8,
        id_col="vec_id", vec_col="embedding",
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing: media rows synthesized from documents (payload =
# utf-8 bytes of the text), so sha/byte-count logic is oracle-checkable.
# ---------------------------------------------------------------------------


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


@register(
    "media_fingerprint",
    """
    SELECT doc_id AS media_id,
           sha256(text) AS payload_sha,
           octet_length(text::BLOB) AS n_bytes
    FROM documents
    """,
    tags=("multimodal", "dedup"),
)
def media_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_fingerprint(_media_df(spark, sf_dir))


@register(
    "media_frame_sample",
    """
    SELECT doc_id AS media_id,
           unnest(generate_series(0, n_chars * 10, 1000)) AS frame_ts_ms
    FROM documents
    """,
    tags=("multimodal",),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample_plan(_media_df(spark, sf_dir), every_ms=1000)


@register(
    "embeddings_label_stats",
    """
    SELECT label,
           COUNT(*) AS vecs_cnt,
           (ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 6) + 0) AS dim0_avg,
           ROUND(AVG(list_dot_product(
               list_transform(embedding, x -> x::DOUBLE),
               list_transform(embedding, x -> x::DOUBLE))), 4) AS sqnorm_avg
    FROM embeddings
    GROUP BY label
    """,
    tags=("similarity", "labels"),
)
def embeddings_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus stats (cluster cardinality + norm profile) — the
    label column is the testdata's cluster ground truth."""
    from covid_data_pipeline_spark.operators.similarity import dot, _as_double

    e = table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("vecs_cnt"),
        round_stable(F.avg(F.element_at("embedding", 1).cast("double")), 6).alias(
            "dim0_avg"
        ),
        F.round(F.avg(dot(v, v)), 4).alias("sqnorm_avg"),
    )


@register(
    "media_audio_chunks",
    """
    WITH starts AS (
      SELECT doc_id AS media_id, n_chars * 10 AS dur,
             unnest(generate_series(0, n_chars * 10 - 1, 8000)) AS chunk_start_ms
      FROM documents WHERE n_chars * 10 > 0
    )
    SELECT media_id, chunk_start_ms,
           LEAST(chunk_start_ms + 10000, dur) AS chunk_end_ms
    FROM starts
    """,
    tags=("multimodal", "audio"),
)
def media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10s chunks with 2s overlap over audio duration metadata."""
    return chunk_audio_plan(_media_df(spark, sf_dir), chunk_ms=10_000, overlap_ms=2_000)


@register(
    "media_features_fake",
    # The "fake" decode is fully deterministic (sha256-derived), so even
    # the stub path is hash-verifiable: f0 is the digest's first 4 bytes
    # as big-endian uint32 / 2^32 (k/2^32 can never land on a decimal
    # .xxxxxx5 tie, so ROUND(,6) agrees across engines).
    """
    SELECT doc_id AS media_id,
           sha256(text) AS payload_sha,
           octet_length(text::BLOB) AS n_bytes,
           ROUND(CAST(CAST(CAST(concat('0x', substr(sha256(text), 1, 8))
                                AS BIGINT) / 4294967296.0
                           AS REAL) AS DOUBLE), 6) AS f0
    FROM documents
    """,
    tags=("multimodal", "pandas-udf"),
)
def media_features_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = decode_and_featurize_images(_media_df(spark, sf_dir), fake=True)
    # Project features to scalars so the driver's hash sees stable values.
    return feats.select(
        "media_id",
        "payload_sha",
        "n_bytes",
        # features are float32 in IMAGE_FEATURES_SCHEMA — widen before
        # rounding or the result column stays float and carries ~9
        # significant digits past the ROUND(6).
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
    )


# Johnson–Lindenstrauss projection: the matrix is seeded, so the oracle
# SQL can be generated with the SAME literal values the Spark plan uses.
# Both engines compute each output dim as a left-to-right double dot
# product over identical literals — bit-stable before the ROUND(6).
JL_OUT_DIM = 16
_JL_MATRIX = None


def _jl_matrix() -> list[list[float]]:
    global _JL_MATRIX
    if _JL_MATRIX is None:
        from covid_data_pipeline_spark.operators.similarity import (
            random_projection_matrix,
        )

        _JL_MATRIX = random_projection_matrix(EMBED_DIM, JL_OUT_DIM, seed=97)
    return _JL_MATRIX


def _jl_oracle() -> str:
    cols = ",\n       ".join(
        "(ROUND(list_inner_product(v, ["
        + ", ".join(repr(x) for x in row)
        + f"]), 6) + 0) AS p{j:02d}"
        for j, row in enumerate(_jl_matrix())
    )
    return f"""
    SELECT vec_id,
       {cols}
    FROM (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    )
    """


@register(
    "embedding_random_projection",
    _jl_oracle(),
    tags=("similarity", "projection", "training"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss reduction of the embedding column (64→16
    dims, seeded Gaussian matrix) — the preprocessing step that makes
    100 TB ANN affordable. Wide rounded output so the oracle hashes
    every projected coordinate."""
    from covid_data_pipeline_spark.operators.similarity import (
        project_embeddings,
    )

    e = table(spark, sf_dir, "embeddings")
    p = project_embeddings(e, _jl_matrix(), vec_col="embedding", out_col="proj")
    return p.select(
        "vec_id",
        *[
            round_stable(F.col("proj")[j], 6).alias(f"p{j:02d}")
            for j in range(JL_OUT_DIM)
        ],
    )


@register(
    "embedding_quantize_int8",
    """
    SELECT vec_id,
           array_to_string(list_transform(embedding,
             x -> CAST(FLOOR(x * (127.0 / GREATEST(mx, 1e-30)) + 0.5)
                       AS INTEGER)), ',') AS qvec,
           127.0 / GREATEST(mx, 1e-30) AS scale
    FROM (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, y -> abs(y))) AS mx
      FROM embeddings
    )
    """,
    tags=("similarity", "embedding", "quantize"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization
    (`operators/similarity.py::quantize_int8`): 4x smaller embeddings at
    rest and on the wire, coordinate error bounded by max|x|/127. Every
    coordinate and the raw IEEE scale are hash-compared against the
    oracle — floor(x+0.5) round-half-up, never decimal round. The qvec
    is serialized via array_join at the query boundary only (the
    driver's pandas canonicalizer cannot hash top-level ArrayType)."""
    from covid_data_pipeline_spark.operators.similarity import quantize_int8

    emb = table(spark, sf_dir, "embeddings")
    return quantize_int8(emb, "embedding").select(
        "vec_id",
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec"),
        "scale",
    )


_QUANT_COSINE_ORACLE = f"""
WITH dq AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(x * (127.0 / GREATEST(mx, 1e-30)) + 0.5) AS INTEGER)
                / (127.0 / GREATEST(mx, 1e-30))) AS v
  FROM (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, y -> abs(y))) AS mx
    FROM embeddings
  )
),
q AS (
  SELECT vec_id AS query_id, v AS qv FROM dq WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(
           list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))),
           4) + 0 AS similarity
  FROM dq e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, similarity FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY similarity DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= {TOP_K}
"""


@register(
    "similarity_topk_quantized",
    _QUANT_COSINE_ORACLE,
    tags=("similarity", "ann-baseline", "quantized"),
)
def similarity_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k over int8-quantized embeddings
    (`operators/similarity.py::quantize_int8`): the search quality story
    for the 4x storage cut — scores computed on dequantized vectors so
    both engines evaluate the identical quantize→dequantize→cosine
    arithmetic end-to-end. Recall vs the exact float path is asserted
    in tests/test_dedup_similarity.py."""
    from covid_data_pipeline_spark.operators.similarity import quantize_int8

    emb = table(spark, sf_dir, "embeddings")
    deq = quantize_int8(emb, "embedding").select(
        "vec_id",
        F.transform("qvec", lambda q: q / F.col("scale")).alias("embedding"),
    )
    queries = deq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_bruteforce(
        deq, queries, k=TOP_K, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id",
    )


def _knn_edges_sql(src: str, dst: str, where: str = "") -> str:
    """Shared CTE block (``v``/``scored``/``ranked``) for every oracle
    that consumes the exact kNN edge set — ONE place owns the cosine
    rounding, tie-break, and cast conventions, so the kNN-graph and
    PageRank oracles cannot silently diverge."""
    return f"""v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS dv
  FROM embeddings{where}
),
scored AS (
  SELECT a.vec_id AS {src}, b.vec_id AS {dst},
         ROUND(
           list_dot_product(a.dv, b.dv)
           / (sqrt(list_dot_product(a.dv, a.dv))
              * sqrt(list_dot_product(b.dv, b.dv))), 4) + 0 AS similarity
  FROM v a, v b WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {src} ORDER BY similarity DESC, {dst}) AS rn
  FROM scored
)"""


_KNN_GRAPH_ORACLE = (
    "WITH "
    + _knn_edges_sql("src_id", "nbr_id")
    + "\nSELECT src_id, nbr_id, similarity FROM ranked WHERE rn <= 5"
)


def _lsh_edges_sql(
    dim: int = 64,
    num_planes: int = 8,
    seed: int = 42,
    k: int = 5,
    max_bucket: int = 10_000,
    cross_side: bool = False,
) -> str:
    """CTE block replaying ``operators/similarity.knn_graph_lsh``
    EXACTLY in DuckDB, ending in ``lsh_edges(src_id, nbr_id,
    similarity)`` — what turns the LSH family from rows-only into
    hash-verifiable:

    * the hyperplanes are a pure Park–Miller LCG
      (``operators/similarity._hyperplanes``), so a recursive CTE
      regenerates the identical plane doubles (integer LCG state is
      exact; the ``state/M*2-1`` and normalization op order matches the
      Python float-for-float);
    * bucket bits compare the SAME sequential-fold dot (Spark
      ``F.aggregate`` and DuckDB ``list_dot_product`` both reduce left
      to right in index order) against 0;
    * hot-bucket cap, single-bit multiprobe (XOR masks), pre-normalized
      similarity, ROUND(,4) and the (sim DESC, nbr) tie-break replay
      the operator line by line.

    Embedders of this block must open with ``WITH RECURSIVE``.

    ``cross_side=True`` replays the operator's ``label_col`` mode with
    side = vec_id parity (the bitext split): the different-label filter
    lands on the bucket-join output BEFORE top-k, same as the operator.
    """
    side_filter = " AND l.src_id % 2 <> r.vec_id % 2" if cross_side else ""
    return f"""{_lsh_bucket_prefix_sql(dim, num_planes, seed)},
capped AS (
  SELECT vec_id, bucket FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bsz FROM bucketed
  ) WHERE bsz <= {max_bucket}
),
normv AS (
  SELECT vec_id, list_transform(ve, x -> x / nrm) AS vn
  FROM (SELECT vec_id, ve, sqrt(list_dot_product(ve, ve)) AS nrm FROM lvecs)
),
pmask AS (
  SELECT CAST(0 AS BIGINT) AS m
  UNION ALL
  SELECT 1::BIGINT << i FROM range({num_planes}) t(i)
),
lsh_cand AS (
  SELECT l.src_id, r.vec_id AS nbr_id
  FROM (SELECT c.vec_id AS src_id, xor(c.bucket, m.m) AS bucket
        FROM capped c, pmask m) l
  JOIN capped r ON l.bucket = r.bucket
  WHERE l.src_id <> r.vec_id{side_filter}
),
lsh_scored AS (
  SELECT c.src_id, c.nbr_id,
         ROUND(list_dot_product(a.vn, b.vn), 4) + 0 AS similarity
  FROM lsh_cand c
  JOIN normv a ON c.src_id = a.vec_id
  JOIN normv b ON c.nbr_id = b.vec_id
),
lsh_edges AS (
  SELECT src_id, nbr_id, similarity FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src_id ORDER BY similarity DESC, nbr_id) AS rn
    FROM lsh_scored
  ) WHERE rn <= {k}
)"""


_LSH_GRAPH_ORACLE = (
    "WITH RECURSIVE "
    + _lsh_edges_sql()
    + "\nSELECT src_id, nbr_id, similarity FROM lsh_edges"
)


@register(
    "knn_graph_exact",
    _KNN_GRAPH_ORACLE,
    tags=("similarity", "knn-graph"),
)
def knn_graph_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-NN graph over the whole embeddings table (every item is
    a query) — the verification baseline for the kNN-graph family that
    SemDeDup-style semantic dedup and diversity sampling consume.
    Quadratic by construction; the scale path is ``knn_graph_lsh``."""
    from covid_data_pipeline_spark.operators.similarity import knn_graph_exact

    return knn_graph_exact(
        table(spark, sf_dir, "embeddings"), k=5, id_col="vec_id",
        vec_col="embedding",
    )


@register(
    "knn_graph_lsh",
    _LSH_GRAPH_ORACLE,  # exact replay: LCG planes regenerate in SQL
    tags=("similarity", "knn-graph", "ann-lsh"),
    bench=True,
)
def knn_graph_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN graph via LSH bucket collisions with single-bit
    multiprobe — the both-sides-large self-join (nothing broadcastable)
    that replaces the quadratic exact graph at corpus scale. Candidate
    work is bounded by Σ bucket² with the standard hot-bucket cap.

    APPROXIMATE vs the exact graph yet FULLY hash-verifiable: the
    hyperplanes are a deterministic LCG the oracle regenerates inside
    SQL (``_lsh_edges_sql``), so the whole bucket/probe/score/top-k
    chain replays bit-identically in DuckDB."""
    from covid_data_pipeline_spark.operators.similarity import knn_graph_lsh

    return knn_graph_lsh(
        table(spark, sf_dir, "embeddings"), dim=EMBED_DIM, k=5,
        num_planes=8, id_col="vec_id", vec_col="embedding",
    )


@register(
    "semantic_dedup_docs",
    """
    WITH RECURSIVE doubled AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
    ),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
      FROM doubled
    ),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_dot_product(a.ve, b.ve) /
                   (sqrt(list_dot_product(a.ve, a.ve)) *
                    sqrt(list_dot_product(b.ve, b.ve))), 4) + 0 AS similarity
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM p WHERE similarity >= 0.99),
    sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    reach(node, r) AS (
      SELECT vec_id, vec_id FROM doubled
      UNION
      SELECT reach.node, sym.dst FROM reach JOIN sym ON sym.src = reach.r
    )
    SELECT node AS vec_id, MIN(r) AS canonical_id,
           (node = MIN(r)) AS is_kept
    FROM reach GROUP BY node
    """,
    tags=("similarity", "dedup", "semantic", "components"),
)
def semantic_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup end-to-end in embedding space:
    LSH-bucketed cosine pairs (≥ 0.99) → connected components →
    (vec_id, canonical_id, is_kept) keep/drop map — the embedding-space
    twin of ``dedup_duplicate_groups``. Planted exact copies
    (vec_id+1e6) make every component {original, copy} collapse onto
    the original; equality with the exact all-pairs oracle holds for
    the same reason as ``embedding_neardup`` (identical vectors always
    share a bucket; no natural pair reaches 0.99).

    Scale shape: pairs from bucket equi-join (Σ bucket², hot-bucket
    capped), components in O(log n) star rounds — no all-pairs stage
    anywhere on the Spark side."""
    from covid_data_pipeline_spark.operators.graph import connected_components

    e = table(spark, sf_dir, "embeddings")
    doubled = e.select("vec_id", "embedding").unionByName(
        e.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    pairs = embedding_neardup_pairs(
        doubled, dim=EMBED_DIM, threshold=0.99, num_planes=8,
        id_col="vec_id", vec_col="embedding",
    )
    comps = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        nodes=doubled.select(F.col("vec_id").alias("node")),
    )
    return comps.select(
        F.col("node").alias("vec_id"),
        F.col("component").alias("canonical_id"),
        (F.col("node") == F.col("component")).alias("is_kept"),
    )


@register(
    "embedding_standardize",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
      FROM embeddings),
    x AS (
      SELECT vec_id, generate_subscripts(ve, 1) AS pos, unnest(ve) AS val
      FROM e),
    s AS (
      SELECT pos, ROUND(AVG(val), 6) AS mu, ROUND(STDDEV_SAMP(val), 6) AS sd
      FROM x GROUP BY pos)
    SELECT x.vec_id, CAST(x.pos - 1 AS INTEGER) AS dim_idx,
           (ROUND((x.val - s.mu) / s.sd, 4) + 0) AS z
    FROM x JOIN s USING (pos)
    """,
    tags=("similarity", "preprocess", "standardize"),
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension whitening of the embeddings table, flattened to
    (vec_id, dim_idx, z) so EVERY standardized coordinate is
    value-hashed against the oracle. Stats collect = dim x 2 scalars;
    the apply phase is a zero-shuffle map-side transform
    (operators/similarity.py::standardize_embeddings)."""
    from covid_data_pipeline_spark.operators.similarity import (
        standardize_embeddings,
    )

    z = standardize_embeddings(table(spark, sf_dir, "embeddings"))
    return z.select(
        "vec_id", F.posexplode("z_embedding").alias("dim_idx", "zv")
    ).select(
        "vec_id",
        F.col("dim_idx").cast("int").alias("dim_idx"),
        round_stable("zv", 4).alias("z"),
    )


@register(
    "label_centroid_similarity",
    """
    WITH e AS (
      SELECT label, list_transform(embedding, x -> x::DOUBLE) AS ve
      FROM embeddings),
    x AS (
      SELECT label, generate_subscripts(ve, 1) AS pos, unnest(ve) AS val
      FROM e),
    c AS (
      SELECT label, pos, CAST(ROUND(AVG(val), 6) AS DECIMAL(12,6)) AS mu
      FROM x GROUP BY label, pos),
    p AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.mu * b.mu) AS dab,
             SUM(a.mu * a.mu) AS daa,
             SUM(b.mu * b.mu) AS dbb
      FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
      GROUP BY a.label, b.label)
    SELECT label_a, label_b,
           (ROUND(CAST(dab AS DOUBLE)
                  / (sqrt(CAST(daa AS DOUBLE)) * sqrt(CAST(dbb AS DOUBLE))),
                  4) + 0) AS centroid_cos
    FROM p
    """,
    tags=("similarity", "centroid", "diagnostics"),
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-label centroid cosine matrix — the class-separability
    diagnostic ("are these label clusters semantically distinct, or
    should they merge") run before trusting labels for stratification.

    Float policy twist: the pairwise dot products are summed in
    DECIMAL over 6-dp-rounded centroid coordinates, so the 64-term
    sums are EXACT and order-independent — no distributed-summation
    drift (the repo's decimal-money pattern applied to vector math);
    only the final cosine division runs in double. All relations after
    the per-(label, pos) rollup are label²-sized — tiny at any corpus
    scale."""
    e = table(spark, sf_dir, "embeddings")
    x = e.select(
        "label",
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "pos", "val"
        ),
    )
    c = x.groupBy("label", "pos").agg(
        F.round(F.avg("val"), 6).cast("decimal(12,6)").alias("mu")
    )
    a = c.select(
        F.col("label").alias("label_a"), "pos", F.col("mu").alias("mu_a")
    )
    b = c.select(
        F.col("label").alias("label_b"), "pos", F.col("mu").alias("mu_b")
    )
    p = (
        a.join(b, on="pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("mu_a") * F.col("mu_b")).alias("dab"),
            F.sum(F.col("mu_a") * F.col("mu_a")).alias("daa"),
            F.sum(F.col("mu_b") * F.col("mu_b")).alias("dbb"),
        )
    )
    return p.select(
        "label_a",
        "label_b",
        round_stable(
            F.col("dab").cast("double")
            / (
                F.sqrt(F.col("daa").cast("double"))
                * F.sqrt(F.col("dbb").cast("double"))
            ),
            4,
        ).alias("centroid_cos"),
    )


@register(
    "media_type_sniff",
    """
    SELECT CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                           WHEN 2 THEN 'pdf' ELSE 'unknown' END AS sniffed,
           COUNT(*) AS n_media,
           CAST(SUM(octet_length(text::BLOB)
               + CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 3
                                 WHEN 2 THEN 4 ELSE 0 END)
             AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                             WHEN 2 THEN 'pdf' ELSE 'unknown' END
    """,
    tags=("multimodal", "binary", "sniff"),
)
def media_type_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-format sniffing on raw binary payloads: magic-byte
    prefixes (PNG/JPEG/PDF) detected with pure JVM binary column
    algebra — substring on BINARY + hex prefix match, NO Python and no
    decode stub — the dispatch step that routes a mixed media lake to
    per-format decoders. Payloads are planted (doc_id-keyed magic
    prefix + utf-8 text), so the oracle checks the CLASSIFICATION
    against ground truth end-to-end, not just the plumbing."""
    d = table(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 4 == 0, F.unhex(F.lit("89504E470D0A1A0A")))
        .when(F.col("doc_id") % 4 == 1, F.unhex(F.lit("FFD8FF")))
        .when(F.col("doc_id") % 4 == 2, F.unhex(F.lit("25504446")))
        .otherwise(F.unhex(F.lit("")))
    )
    media = d.select(
        F.concat(magic, F.encode("text", "UTF-8")).alias("payload")
    )
    head = F.hex(F.substring("payload", 1, 8))
    sniffed = (
        F.when(head.startswith("89504E470D0A1A0A"), "png")
        .when(head.startswith("FFD8FF"), "jpeg")
        .when(head.startswith("25504446"), "pdf")
        .otherwise("unknown")
    )
    return media.select(
        sniffed.alias("sniffed"), F.octet_length("payload").alias("nb")
    ).groupBy("sniffed").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("nb").alias("total_bytes"),
    )


def _pagerank_oracle(
    iters: int = 5,
    k: int = 5,
    scale: int = 10**12,
    edges_head: str | None = None,
) -> str:
    """Unrolled-iteration twin of ``operators.graph.pagerank_int`` over
    the exact kNN edge set: DuckDB disallows aggregates in a recursive
    CTE term, so each power-iteration step is its own CTE — iteration
    count is a query constant, which is exactly what makes the unroll
    legitimate. All arithmetic is BIGINT ``//`` (truncating division of
    non-negatives == floor), so five iterations stay bit-identical to
    Spark's ``div`` fixed point.

    ``edges_head`` swaps in an alternative WITH-body ending in a CTE
    ``e(src, dst)`` (e.g. the LSH edge replay) — the iteration SQL is
    shared so the exact- and LSH-graph PageRank oracles cannot
    diverge."""
    if edges_head is None:
        edges_head = f"""{_knn_edges_sql("src", "dst", " WHERE vec_id % 4 = 0")},
    e AS (SELECT src, dst FROM ranked WHERE rn <= {k})"""
    head = f"""
    WITH RECURSIVE {edges_head},
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    nodes AS (
      -- explicit DISTINCT: under WITH RECURSIVE, DuckDB gives the
      -- bare `a UNION b` form recursive-union semantics and the
      -- dedup is not applied to a non-self-referencing CTE
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    pr0 AS (
      SELECT node, CAST({scale} // nn.n AS BIGINT) AS rank
      FROM nodes CROSS JOIN nn
    )"""
    step = """,
    pr{t} AS (
      SELECT nd.node,
             CAST(({tele} // (100 * nn.n))
                  + COALESCE(inf.inflow, 0) AS BIGINT) AS rank
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node,
               SUM((85 * p.rank) // (100 * d.outdeg)) AS inflow
        FROM pr{p} p JOIN e ON e.src = p.node JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) inf ON inf.node = nd.node
    )"""
    body = "".join(
        step.format(t=t, p=t - 1, tele=scale * 15) for t in range(1, iters + 1)
    )
    return (
        head
        + body
        + f"\n    SELECT node AS vec_id, rank FROM pr{iters}"
    )


@register(
    "pagerank_knn_docs",
    _pagerank_oracle(),
    tags=("similarity", "graph", "pagerank", "centrality"),
)
def pagerank_knn_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-centrality corpus weighting: PageRank over the exact 5-NN
    cosine graph of the embeddings table — items central to the
    similarity graph score high (representative of dense regions),
    isolated outliers decay toward the teleport floor. Web curation
    runs the same operator on the link graph for crawl-seed quality.

    The rank is an INTEGER (parts per 10^12) from
    ``operators/graph.py::pagerank_int``'s all-BIGINT fixed point, so an
    ITERATIVE float-free algorithm is driver-verifiable hash-exactly —
    each Spark iteration is one dst-keyed shuffle; the oracle unrolls
    the same five steps as chained CTEs.

    Edge derivation runs on a deterministic 1-in-4 id subset: exact kNN
    is the QUADRATIC verification baseline (knn_graph_exact docstring),
    and the subset keeps this correctness query out of that regime at
    larger sf without touching what it proves. The scale path is
    ``pagerank_knn_lsh``."""
    from covid_data_pipeline_spark.operators.graph import pagerank_int
    from covid_data_pipeline_spark.operators.similarity import knn_graph_exact

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0)
    edges = knn_graph_exact(emb, k=5, id_col="vec_id", vec_col="embedding")
    return pagerank_int(edges, src="src_id", dst="nbr_id", iters=5).select(
        F.col("node").alias("vec_id"), "rank"
    )


@register(
    "pagerank_knn_lsh",
    _pagerank_oracle(
        edges_head=_lsh_edges_sql()
        + ",\n    e AS (SELECT src_id AS src, nbr_id AS dst FROM lsh_edges)"
    ),
    tags=("similarity", "graph", "pagerank", "centrality", "ann-lsh"),
    # not in the bench headline set: 5 iterations x ~3 jobs of sub-second
    # tasks measure scheduler overhead at sf0.1, not engine throughput
    # (iterative-graph cost is benched via graph_components_docs); the
    # co-located-edges shape is what matters at real scale
)
def pagerank_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path centrality: the same integer PageRank over the
    LSH-bucketed approximate kNN graph — edge generation is the
    hot-bucket-capped self equi-join (never all-pairs), so the whole
    chain (graph build + 5 rank iterations) survives a 100 TB corpus.
    The edge set is approximate vs the exact graph (agreement asserted
    in pytest) yet hash-verifiable: the oracle regenerates the LCG
    hyperplanes in SQL (``_lsh_edges_sql``) and unrolls the same five
    integer iterations."""
    from covid_data_pipeline_spark.operators.graph import pagerank_int
    from covid_data_pipeline_spark.operators.similarity import knn_graph_lsh

    edges = knn_graph_lsh(
        table(spark, sf_dir, "embeddings"), dim=EMBED_DIM, k=5,
        num_planes=8, id_col="vec_id", vec_col="embedding",
    )
    return pagerank_int(edges, src="src_id", dst="nbr_id", iters=5).select(
        F.col("node").alias("vec_id"), "rank"
    )


_HARD_NEG_ORACLE = """
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS dv
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
         ROUND(
           list_dot_product(a.dv, b.dv)
           / (sqrt(list_dot_product(a.dv, a.dv))
              * sqrt(list_dot_product(b.dv, b.dv))), 4) + 0 AS similarity
  FROM v a, v b
  WHERE a.vec_id <> b.vec_id AND a.label <> b.label
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY src_id ORDER BY similarity DESC, nbr_id) AS rn
  FROM scored
)
SELECT src_id, nbr_id, similarity FROM ranked WHERE rn <= 5
"""


@register(
    "hard_negatives_exact",
    _HARD_NEG_ORACLE,
    tags=("similarity", "contrastive", "hard-negatives"),
)
def hard_negatives_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for every vector,
    the 5 most-similar vectors of a DIFFERENT label — the negatives
    that carry gradient signal (easy negatives are near-orthogonal and
    teach nothing). Exact variant (the quadratic verification
    baseline); the corpus-scale path is ``knn_graph_lsh`` with the same
    ``label_col`` filter, recall-floored against this result in
    pytest."""
    from covid_data_pipeline_spark.operators.similarity import knn_graph_exact

    return knn_graph_exact(
        table(spark, sf_dir, "embeddings"), k=5, id_col="vec_id",
        vec_col="embedding", label_col="label",
    )


def _pq_oracle() -> str:
    from covid_data_pipeline_spark.operators.similarity import (
        pq_lattice_oracle_sql,
    )

    return pq_lattice_oracle_sql(
        dim=EMBED_DIM, n_sub=16, n_codes=64, iters=2, shortlist=50,
        top_k=TOP_K, n_queries=N_QUERIES,
    )


@register(
    "similarity_topk_pq",
    _pq_oracle(),
    tags=("similarity", "ann-pq", "pandas-udf", "iterative"),
    bench=True,
)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al.): per-subspace codebooks
    compress each embedding to n_sub codes (32× at 8×256 on 64-dim
    float32); queries score against the compressed corpus via
    asymmetric-distance lookup tables, then a top-50 shortlist is
    re-ranked against full-precision vectors (the FAISS pattern). The
    storage-bound 100 TB answer: every search scans only the code
    column; full vectors are fetched for the shortlist alone. Round 5
    upgraded this from rows-only to hash-verified: codebooks train on
    the micro-integer lattice (per-subspace Lloyd; int64 Arrow partial
    sums, codebook-sized shuffle) and the ADC LUT scan is exact integer
    arithmetic, so the DuckDB oracle replays training, encoding, the
    shortlist SET and the exact-cosine rerank
    (`operators/similarity.py::pq_lattice_oracle_sql`). The float
    trainer (`pq_train_codebooks`) stays as public API with recall
    floors in pytest."""
    from covid_data_pipeline_spark.operators.similarity import (
        pq_topk_rerank_lattice,
        pq_train_codebooks_lattice,
    )

    e = table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks_lattice(
        e, dim=EMBED_DIM, n_sub=16, n_codes=64, iters=2
    )
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk_rerank_lattice(
        e, queries, books, k=TOP_K, shortlist=50
    )


_PQ_BOOKS: dict[str, list] = {}


@register(
    "similarity_topk_pq_pretrained",
    _pq_oracle(),
    tags=("similarity", "ann-pq", "pretrained", "pandas-udf", "iterative"),
    bench=True,
)
def similarity_topk_pq_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amortized PQ path: codebooks are trained once per corpus (the
    warehouse persists them via save_ann_model; memoized per sf_dir
    here exactly like the IVF pretrained twin), so the benched cost is
    the steady state — encode + ADC scan + shortlist re-rank — split
    from the one-time training the cold ``similarity_topk_pq`` number
    includes. Same oracle as the cold path: memoization cannot change
    the exact integer codebooks, and the hash check proves it."""
    from covid_data_pipeline_spark.operators.similarity import (
        pq_topk_rerank_lattice,
        pq_train_codebooks_lattice,
    )

    e = table(spark, sf_dir, "embeddings")
    if sf_dir not in _PQ_BOOKS:
        _PQ_BOOKS[sf_dir] = pq_train_codebooks_lattice(
            e, dim=EMBED_DIM, n_sub=16, n_codes=64, iters=2
        )
    books = _PQ_BOOKS[sf_dir]
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk_rerank_lattice(
        e, queries, books, k=TOP_K, shortlist=50
    )


_BITEXT_MARGIN_ORACLE = """
WITH v AS (
  SELECT vec_id, vec_id % 2 AS side,
         list_transform(embedding, x -> x::DOUBLE) AS dv
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         ROUND(list_dot_product(a.dv, b.dv)
               / (sqrt(list_dot_product(a.dv, a.dv))
                  * sqrt(list_dot_product(b.dv, b.dv))), 4) AS sim
  FROM v a JOIN v b ON a.side <> b.side
),
edges AS (
  SELECT src, dst, CAST(ROUND(sim * 10000, 0) AS BIGINT) AS dot
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY sim DESC, dst) AS rn
    FROM scored
  ) WHERE rn <= 5
),
e AS (SELECT * FROM edges WHERE dot > 0),
totals AS (SELECT src, SUM(dot) AS A, COUNT(*) AS c FROM e GROUP BY src),
m AS (
  SELECT e.src, e.dst,
         (2 * e.dot * ta.c * tb.c * 10000)
           // (ta.A * tb.c + tb.A * ta.c) AS margin_bp
  FROM e
  JOIN totals ta ON e.src = ta.src
  JOIN totals tb ON e.dst = tb.src
),
best AS (
  SELECT src, dst, margin_bp FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY margin_bp DESC, dst) AS rn
    FROM m
  ) WHERE rn = 1
)
SELECT f.src AS id_a, f.dst AS id_b,
       CAST(LEAST(f.margin_bp, b.margin_bp) AS BIGINT) AS margin_bp
FROM best f
JOIN best b ON f.src < f.dst AND f.dst = b.src AND b.dst = f.src
WHERE LEAST(f.margin_bp, b.margin_bp) >= 10000
"""


@register(
    "bitext_margin_pairs",
    _BITEXT_MARGIN_ORACLE,
    tags=("similarity", "bitext", "mining"),
)
def bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCMatrix-style margin-based mutual-kNN mining
    (`operators/similarity.py::margin_mutual_pairs`): the corpus is
    split into two sides (vec_id parity stands in for the two
    languages of a bitext-mining run), each item gets its 5 nearest
    CROSS-side neighbors (knn_graph_exact's hard-negative label mode
    doubles as the cross-lingual kNN), and pairs that are each other's
    best RATIO-margin match are kept. Margin — cosine over the mean of
    the endpoints' own top-k cosines — cancels hubness; scoring is
    integer basis points end-to-end, so the mined set hash-matches the
    all-pairs DuckDB replay. The exact edge graph is the verification
    baseline; at corpus scale the same miner consumes
    ``knn_graph_lsh(label_col=...)`` edges unchanged (recall floor
    asserted in tests/test_dedup_similarity.py)."""
    from covid_data_pipeline_spark.operators.similarity import (
        knn_graph_exact,
        margin_mutual_pairs,
    )

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "side", F.pmod(F.col("vec_id"), F.lit(2))
    )
    edges = knn_graph_exact(
        emb, k=5, id_col="vec_id", vec_col="embedding", label_col="side"
    )
    return margin_mutual_pairs(edges, threshold_bp=10_000)


_BITEXT_LSH_ORACLE = (
    "WITH RECURSIVE "
    + _lsh_edges_sql(cross_side=True)
    + """,
edges AS (
  SELECT src_id AS src, nbr_id AS dst,
         CAST(ROUND(similarity * 10000, 0) AS BIGINT) AS dot
  FROM lsh_edges
),
e AS (SELECT * FROM edges WHERE dot > 0),
totals AS (SELECT src, SUM(dot) AS A, COUNT(*) AS c FROM e GROUP BY src),
m AS (
  SELECT e.src, e.dst,
         (2 * e.dot * ta.c * tb.c * 10000)
           // (ta.A * tb.c + tb.A * ta.c) AS margin_bp
  FROM e
  JOIN totals ta ON e.src = ta.src
  JOIN totals tb ON e.dst = tb.src
),
best AS (
  SELECT src, dst, margin_bp FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY margin_bp DESC, dst) AS rn
    FROM m
  ) WHERE rn = 1
)
SELECT f.src AS id_a, f.dst AS id_b,
       CAST(LEAST(f.margin_bp, b.margin_bp) AS BIGINT) AS margin_bp
FROM best f
JOIN best b ON f.src < f.dst AND f.dst = b.src AND b.dst = f.src
WHERE LEAST(f.margin_bp, b.margin_bp) >= 10000
"""
)


@register(
    "bitext_margin_pairs_lsh",
    # LSH edge graph replayed via the LCG hyperplane CTEs
    # (cross_side=True = the operator's label_col parity mode), then the
    # same integer-bp miner SQL as the exact variant — approximate vs
    # the exact miner (recall asserted in tests/test_dedup_similarity.py)
    # yet hash-verifiable.
    _BITEXT_LSH_ORACLE,
    tags=("similarity", "bitext", "mining", "ann-lsh"),
    bench=True,
)
def bitext_margin_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale twin of ``bitext_margin_pairs``: the same integer
    margin miner consuming ``knn_graph_lsh(label_col=side)`` edges —
    the bucketed cross-side kNN whose cost is Σ bucket² with the
    hot-bucket cap, instead of the |corpus|² exact graph. This is the
    number a production bitext-mining run pays; the exact-edge variant
    stays the oracle-verified baseline."""
    from covid_data_pipeline_spark.operators.similarity import (
        knn_graph_lsh,
        margin_mutual_pairs,
    )

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "side", F.pmod(F.col("vec_id"), F.lit(2))
    )
    edges = knn_graph_lsh(
        emb, dim=EMBED_DIM, k=5, num_planes=8, id_col="vec_id",
        vec_col="embedding", label_col="side",
    )
    return margin_mutual_pairs(edges, threshold_bp=10_000)


_ANN_RECALL_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS dv
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, dv FROM v WHERE vec_id < {N_QUERIES}),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             ROUND(list_dot_product(q.dv, e.dv)
                   / (sqrt(list_dot_product(q.dv, q.dv))
                      * sqrt(list_dot_product(e.dv, e.dv))), 4) DESC,
             e.vec_id) AS rn
    FROM q, v e WHERE e.vec_id <> q.query_id
  ) WHERE rn <= {TOP_K}
),
dq AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(x * (127.0 / GREATEST(mx, 1e-30)) + 0.5) AS INTEGER)
                / (127.0 / GREATEST(mx, 1e-30))) AS dv
  FROM (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, y -> abs(y))) AS mx
    FROM embeddings
  )
),
qq AS (SELECT vec_id AS query_id, dv FROM dq WHERE vec_id < {N_QUERIES}),
quant AS (
  SELECT query_id, vec_id FROM (
    SELECT qq.query_id, e.vec_id,
           row_number() OVER (PARTITION BY qq.query_id ORDER BY
             ROUND(list_dot_product(qq.dv, e.dv)
                   / (sqrt(list_dot_product(qq.dv, qq.dv))
                      * sqrt(list_dot_product(e.dv, e.dv))), 4) DESC,
             e.vec_id) AS rn
    FROM qq, dq e WHERE e.vec_id <> qq.query_id
  ) WHERE rn <= {TOP_K}
)
SELECT e.query_id,
       COUNT(qu.vec_id) AS n_common,
       COUNT(qu.vec_id) * 10000 // {TOP_K} AS recall_bp
FROM exact e
LEFT JOIN quant qu
  ON e.query_id = qu.query_id AND e.vec_id = qu.vec_id
GROUP BY e.query_id
"""


@register(
    "ann_recall_quantized",
    _ANN_RECALL_ORACLE,
    tags=("similarity", "eval", "recall"),
)
def ann_recall_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index evaluation as a first-class report: per-query
    recall@k of int8-quantized search against the exact float ranking —
    the number an index owner watches before shipping a compression
    change. Both rankings are deterministic (4dp cosine, id tiebreak),
    so recall is an exact integer and the report hash-matches the SQL
    replay. At corpus scale the same report runs with the LSH/IVF/PQ
    shortlist as the candidate side."""
    from covid_data_pipeline_spark.operators.similarity import quantize_int8

    emb = table(spark, sf_dir, "embeddings")
    deq = quantize_int8(emb, "embedding").select(
        "vec_id",
        F.transform("qvec", lambda q: q / F.col("scale")).alias("embedding"),
    )

    def topk(corpus):
        queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return cosine_topk_bruteforce(
            corpus, queries, k=TOP_K, id_col="vec_id",
            vec_col="embedding", query_id_col="query_id",
        ).select("query_id", "vec_id")

    exact = topk(emb.select("vec_id", "embedding"))
    quant = topk(deq)
    return (
        exact.join(
            quant.withColumn("__hit", F.lit(1)), ["query_id", "vec_id"], "left"
        )
        .groupBy("query_id")
        .agg(F.count("__hit").alias("n_common"))
        .select(
            "query_id",
            "n_common",
            F.expr(f"n_common * 10000 div {TOP_K}").alias("recall_bp"),
        )
    )


_LINK_PRED_ORACLE = (
    "WITH "
    + _knn_edges_sql("s", "d")
    + """,
edges AS (SELECT s, d FROM ranked WHERE rn <= 5),
sym AS (SELECT s AS a, d AS b FROM edges
        UNION
        SELECT d AS a, s AS b FROM edges),
deg AS (SELECT a, COUNT(*) AS dg FROM sym GROUP BY 1),
wedge AS (
  SELECT l.a AS u, r.a AS v, l.b AS z
  FROM sym l JOIN sym r ON l.b = r.b AND l.a < r.a),
cand AS (
  SELECT w.u, w.v, w.z FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM sym s WHERE s.a = w.u AND s.b = w.v)),
lp_scored AS (
  SELECT c.u, c.v, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         ROUND(SUM(1.0 / ln(d.dg)), 4) AS adamic_adar
  FROM cand c JOIN deg d ON c.z = d.a GROUP BY 1, 2)
SELECT u, v, common_neighbors, adamic_adar
FROM lp_scored ORDER BY adamic_adar DESC, u, v LIMIT 100"""
)


@register(
    "knn_link_prediction",
    _LINK_PRED_ORACLE,
    tags=("similarity", "knn-graph", "link-prediction"),
)
def knn_link_prediction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction over the exact 5-NN graph
    (`operators/graph.py::link_prediction`): top 100 non-adjacent pairs
    by shared-neighbor evidence — the densification step that proposes
    extra edges for a retrieval graph. Wedge self-join + degree join +
    TakeOrdered; the oracle rebuilds the identical kNN edge set via the
    shared CTE block, so the two can never silently diverge."""
    from covid_data_pipeline_spark.operators.graph import link_prediction
    from covid_data_pipeline_spark.operators.similarity import (
        knn_graph_exact,
    )

    emb = table(spark, sf_dir, "embeddings")
    edges = knn_graph_exact(emb, k=5, id_col="vec_id", vec_col="embedding")
    return link_prediction(
        edges.select(
            F.col("src_id").alias("src"), F.col("nbr_id").alias("dst")
        ),
        top=100,
    ).select(
        F.col("u"), F.col("v"), "common_neighbors", "adamic_adar"
    )


def _lpa_round_sql(i: int) -> str:
    return f"""
v{i} AS (
  SELECT s.a AS node, l.lbl, COUNT(*) AS c
  FROM sym s JOIN l{i - 1} l ON s.b = l.node GROUP BY 1, 2),
l{i} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
    FROM v{i})
  WHERE rn = 1)"""


_LPA_ORACLE = (
    "WITH "
    + _knn_edges_sql("s", "d")
    + """,
edges AS (SELECT s, d FROM ranked WHERE rn <= 5),
sym AS (SELECT s AS a, d AS b FROM edges
        UNION
        SELECT d AS a, s AS b FROM edges),
l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM sym),"""
    + ",".join(_lpa_round_sql(i) for i in (1, 2))
    + "\nSELECT node, lbl AS community FROM l2"
)


@register(
    "graph_label_propagation",
    _LPA_ORACLE,
    tags=("similarity", "knn-graph", "community", "iterative"),
)
def graph_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous label-propagation rounds over the exact 5-NN
    graph (`operators/graph.py::label_propagation`): plurality label
    with smallest-label tie-break — all-integer voting, so the
    unrolled-CTE oracle replays the communities exactly (DuckDB has no
    struct-ordered max_by; the oracle's ROW_NUMBER argmax is the same
    composite order the Spark `max_by(lbl, struct(c, -lbl))` uses)."""
    from covid_data_pipeline_spark.operators.graph import label_propagation
    from covid_data_pipeline_spark.operators.similarity import (
        knn_graph_exact,
    )

    emb = table(spark, sf_dir, "embeddings")
    edges = knn_graph_exact(emb, k=5, id_col="vec_id", vec_col="embedding")
    return label_propagation(
        edges.select(
            F.col("src_id").alias("src"), F.col("nbr_id").alias("dst")
        ),
        rounds=2,
    )


def _kcenter_step_sql(i: int) -> str:
    return f"""
md{i} AS MATERIALIZED (
  SELECT a.vec_id,
         MIN(ROUND(list_dot_product(a.dv, a.dv)
                   - 2 * list_dot_product(a.dv, b.dv)
                   + list_dot_product(b.dv, b.dv), 4)) AS mind2
  FROM kv a, kv b, cents{i - 1} c
  WHERE b.vec_id = c.vec_id
    AND a.vec_id NOT IN (SELECT vec_id FROM cents{i - 1})
  GROUP BY a.vec_id),
pick{i} AS MATERIALIZED (
  SELECT vec_id, mind2 FROM md{i} ORDER BY mind2 DESC, vec_id LIMIT 1),
cents{i} AS MATERIALIZED (
  SELECT vec_id FROM cents{i - 1} UNION ALL SELECT vec_id FROM pick{i})"""


_KCENTER_K = 8
_KCENTER_ORACLE = (
    """WITH kv AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS dv
  FROM embeddings),
cents1 AS MATERIALIZED (SELECT MIN(vec_id) AS vec_id FROM kv),"""
    + ",".join(_kcenter_step_sql(i) for i in range(2, _KCENTER_K + 1))
    + "\nSELECT 1 AS step, vec_id, CAST(NULL AS DOUBLE) AS sep_d2 FROM cents1"
    + "".join(
        f"\nUNION ALL SELECT {i} AS step, vec_id, mind2 AS sep_d2 FROM pick{i}"
        for i in range(2, _KCENTER_K + 1)
    )
)


@register(
    "embeddings_kcenter_coreset",
    _KCENTER_ORACLE,
    tags=("similarity", "coreset", "diversity", "iterative"),
)
def embeddings_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy farthest-point k-center coreset (k=8) over the embeddings
    table (`operators/sampling.py::kcenter_coreset`) — the diversity
    sampler that seeds active-learning/annotation budgets. Rounded-d²
    argmax with smallest-id tie-break makes the traversal a pure
    function of the data; the oracle unrolls the 7 greedy steps as
    chained CTEs and replays the pick sequence exactly."""
    from covid_data_pipeline_spark.operators.sampling import kcenter_coreset

    emb = table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, k=_KCENTER_K)


@register(
    "retrieval_eval_ndcg",
    """
    WITH ev AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vd
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, vd AS qv FROM ev WHERE vec_id % 25 = 0),
    truth_sc AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_dot_product(e.vd, q.qv)
                   / (sqrt(list_dot_product(e.vd, e.vd))
                      * sqrt(list_dot_product(q.qv, q.qv))), 4) AS sim
      FROM ev e, q WHERE e.vec_id <> q.query_id),
    truth AS (
      SELECT query_id, vec_id, rn FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
        FROM truth_sc) WHERE rn <= 10),
    qz AS (
      SELECT vec_id,
             list_transform(vd, x -> ROUND(x * 127.0 / mx, 0)) AS qv8
      FROM (SELECT vec_id, vd,
                   list_aggregate(list_transform(vd, x -> abs(x)), 'max')
                     AS mx
            FROM ev)),
    sysq AS (SELECT vec_id AS query_id, qv8 AS qqv FROM qz
             WHERE vec_id % 25 = 0),
    sys_sc AS (
      SELECT s.query_id, z.vec_id,
             ROUND(list_dot_product(z.qv8, s.qqv)
                   / (sqrt(list_dot_product(z.qv8, z.qv8))
                      * sqrt(list_dot_product(s.qqv, s.qqv))), 6) AS sim
      FROM qz z, sysq s WHERE z.vec_id <> s.query_id),
    sys_r AS (
      SELECT query_id, vec_id, rn FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
        FROM sys_sc) WHERE rn <= 10),
    terms AS (
      SELECT s.query_id,
             CAST(ROUND(CAST(COALESCE(11 - t.rn, 0) AS DOUBLE) * 1000000.0
                        / LOG2(s.rn + 1.0), 0) AS BIGINT) AS term
      FROM sys_r s LEFT JOIN truth t USING (query_id, vec_id)),
    dcg AS (SELECT query_id, CAST(SUM(term) AS BIGINT) AS dcg_micros
            FROM terms GROUP BY 1),
    iterms AS (
      SELECT query_id,
             CAST(ROUND(CAST(11 - rn AS DOUBLE) * 1000000.0
                        / LOG2(rn + 1.0), 0) AS BIGINT) AS term
      FROM truth),
    idcg AS (SELECT query_id, CAST(SUM(term) AS BIGINT) AS idcg_micros
             FROM iterms GROUP BY 1)
    SELECT dcg.query_id, dcg_micros, idcg_micros,
           ROUND(CAST(dcg_micros AS DOUBLE) / CAST(idcg_micros AS DOUBLE), 4)
             AS ndcg
    FROM dcg JOIN idcg USING (query_id)
    """,
    tags=("similarity", "retrieval", "evaluation", "quantization"),
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of int8-quantized cosine retrieval against exact cosine
    truth (`operators/retrieval.py::ndcg_at_k`) — the quality gate for
    swapping a cheap quantized index in: truth rank r grades to
    relevance 11-r, system docs outside the truth list score 0, and
    both DCG sums accumulate as exact BIGINT micro-units. The quantized
    scores are integer dot products of round(x*127/max_abs) codes —
    exactly replayable in SQL — so even the "approximate" system ranks
    identically on both engines."""
    from pyspark.sql.window import Window as W

    from covid_data_pipeline_spark.operators.retrieval import ndcg_at_k
    from covid_data_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
        dot,
    )

    e = table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = cosine_topk_bruteforce(
        e, queries, k=10, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id",
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("vec_id")
    )
    truth = topk.select(
        "query_id", "vec_id", F.row_number().over(w).alias("rank")
    )

    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(vd, F.abs))
    qv8 = F.transform(vd, lambda x: F.round(x * 127.0 / mx, 0))
    qz = e.select("vec_id", qv8.alias("qv8"))
    # bcast: gated query side is 1/25 of the corpus (SF-scaled);
    # metadata-count bound, keyed join past the gate limit
    sysq = size_gated_broadcast(
        qz.where(F.col("vec_id") % 25 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("qv8").alias("qqv")
        ),
        dim_count(spark, sf_dir, "embeddings") // 25 + 1,
    )
    sys_sc = (
        qz.crossJoin(sysq)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot(F.col("qv8"), F.col("qqv"))
                / (
                    F.sqrt(dot(F.col("qv8"), F.col("qv8")))
                    * F.sqrt(dot(F.col("qqv"), F.col("qqv")))
                ),
                6,
            ).alias("sim"),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    system = (
        sys_sc.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= 10)
        .select("query_id", "vec_id", "rank")
    )
    return ndcg_at_k(system, truth, k=10)


@register(
    "embeddings_dim_mutual_info",
    """
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> x::DOUBLE) AS ve
      FROM embeddings),
    x AS (
      SELECT label, generate_subscripts(ve, 1) AS pos, unnest(ve) AS val
      FROM e),
    cells AS (
      SELECT pos, label, CASE WHEN val >= 0 THEN 1 ELSE 0 END AS b,
             COUNT(*) AS n_bl
      FROM x GROUP BY 1, 2, 3),
    margb AS (
      SELECT pos, b, CAST(SUM(n_bl) AS BIGINT) AS n_b
      FROM cells GROUP BY 1, 2),
    margl AS (
      SELECT pos, label, CAST(SUM(n_bl) AS BIGINT) AS n_l
      FROM cells GROUP BY 1, 2),
    tot AS (
      SELECT pos, CAST(SUM(n_bl) AS BIGINT) AS n FROM cells GROUP BY 1),
    terms AS (
      SELECT c.pos,
             c.n_bl * CAST(ROUND(ln(
               (CAST(c.n_bl AS DOUBLE) / mb.n_b)
               * (CAST(t.n AS DOUBLE) / ml.n_l)) * 1e6, 0) AS BIGINT)
               AS micro
      FROM cells c
      JOIN margb mb ON c.pos = mb.pos AND c.b = mb.b
      JOIN margl ml ON c.pos = ml.pos AND c.label = ml.label
      JOIN tot t ON c.pos = t.pos),
    mi AS (
      SELECT t1.pos, CAST(SUM(t1.micro) AS BIGINT) AS micro_sum,
             ANY_VALUE(t2.n) AS n
      FROM terms t1 JOIN tot t2 ON t1.pos = t2.pos
      GROUP BY 1)
    SELECT CAST(pos - 1 AS INTEGER) AS dim_idx,
           ROUND(CAST(micro_sum AS DOUBLE) / (n * 1e6), 6) AS mi_nats,
           CAST(ROW_NUMBER() OVER (ORDER BY micro_sum DESC, pos)
                AS INTEGER) AS rnk
    FROM mi
    """,
    tags=("similarity", "feature-selection", "mutual-information"),
)
def embeddings_dim_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mutual information between each embedding
    coordinate's SIGN and the class label — the model-free
    feature-selection ranking ("which dimensions carry label signal")
    run before training a linear probe on frozen embeddings.

    Float policy: each of the (2 x |labels|) cells contributes
    ``n_bl * round(ln(ratio) * 1e6)`` — the micro-nat trick
    (operators/selection.py DSIR): ln over exact-integer ratios agrees
    cross-engine to <1 ulp, so the rounded BIGINT terms sum exactly and
    only the display division is float. Ranking ties break on the
    EXACT integer micro-sum, not the rounded display value. Scale:
    posexplode fans rows x dims once; everything after is
    |dims| x |labels| x 2 — constant-sized, map-side combinable, no
    single-partition stage.
    """
    e = table(spark, sf_dir, "embeddings")
    x = e.select(
        "label",
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("pos0", "val"),
    ).select("label", (F.col("pos0") + 1).alias("pos"), "val")
    cells = x.groupBy(
        "pos",
        "label",
        F.when(F.col("val") >= 0, 1).otherwise(0).alias("b"),
    ).agg(F.count(F.lit(1)).alias("n_bl"))
    margb = cells.groupBy("pos", "b").agg(F.sum("n_bl").alias("n_b"))
    margl = cells.groupBy("pos", "label").agg(F.sum("n_bl").alias("n_l"))
    tot = cells.groupBy("pos").agg(F.sum("n_bl").alias("n"))
    ratio = (F.col("n_bl").cast("double") / F.col("n_b")) * (
        F.col("n").cast("double") / F.col("n_l")
    )
    terms = (
        cells.join(margb, ["pos", "b"])
        .join(margl, ["pos", "label"])
        .join(tot, "pos")
        .select(
            "pos",
            "n",
            (
                F.col("n_bl")
                * F.round(F.log(ratio) * 1e6, 0).cast("long")
            ).alias("micro"),
        )
    )
    mi = terms.groupBy("pos").agg(
        F.sum("micro").alias("micro_sum"), F.any_value("n").alias("n")
    )
    rw = Window.orderBy(F.col("micro_sum").desc(), "pos")
    return mi.select(
        (F.col("pos") - 1).cast("int").alias("dim_idx"),
        F.round(
            F.col("micro_sum").cast("double") / (F.col("n") * 1e6), 6
        ).alias("mi_nats"),
        F.row_number().over(rw).alias("rnk"),
    )


@register(
    "embeddings_auc_eval",
    """
    WITH e AS (
      SELECT label,
             CAST(ROUND(embedding[1]::DOUBLE * 1e6, 0) AS BIGINT) AS s
      FROM embeddings),
    labels AS (SELECT DISTINCT label FROM e),
    per_s AS (
      SELECT s, label, COUNT(*) AS c FROM e GROUP BY 1, 2),
    tot_s AS (
      SELECT s, CAST(SUM(c) AS BIGINT) AS t FROM per_s GROUP BY 1),
    grid AS (
      SELECT l.label, t.s, t.t, COALESCE(p.c, 0) AS np
      FROM labels l
      CROSS JOIN tot_s t
      LEFT JOIN per_s p ON p.s = t.s AND p.label = l.label),
    cum AS (
      SELECT label, s, np, t - np AS nn,
             CAST(COALESCE(SUM(t - np) OVER (
               PARTITION BY label ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS neg_below
      FROM grid),
    agg AS (
      SELECT label,
             CAST(SUM(np) AS BIGINT) AS npos,
             CAST(SUM(nn) AS BIGINT) AS nneg,
             CAST(SUM(np * neg_below) AS BIGINT) AS wins,
             CAST(SUM(np * nn) AS BIGINT) AS ties
      FROM cum GROUP BY 1)
    SELECT label, npos, nneg,
           ROUND((2.0 * wins + ties) / (2.0 * npos * nneg), 6) AS auc,
           ROUND((2.0 * wins + ties) / (npos * nneg) - 1, 6) + 0 AS gini
    FROM agg
    """,
    tags=("similarity", "evaluation", "auc"),
)
def embeddings_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest ROC AUC of the first embedding coordinate as a
    scorer for every class label — the Mann-Whitney evaluation
    primitive behind "is this feature/classifier score actually
    separating the positives". Ships the full label sweep so the
    result is a 10-row separability profile, not a single scalar.

    Exact by construction: scores are micro-quantized to BIGINT, the
    pairwise statistic comes from integer cumulative counts
    (wins + half-ties), and the single AUC division is exact-rounded —
    no ranks, no float accumulation, ties handled exactly. Scale:
    per-score counts are a map-side-combinable rollup over distinct
    scores; the label x score grid multiplies by a CONSTANT |labels|,
    and the cumulative pass partitions by label — no all-pairs stage
    anywhere. DuckDB windowed BIGINT sums re-cast per the HUGEINT rule.
    """
    e = table(spark, sf_dir, "embeddings").select(
        "label",
        F.round(F.element_at("embedding", 1).cast("double") * 1e6, 0)
        .cast("long")
        .alias("s"),
    )
    labels = e.select("label").distinct()
    per_s = e.groupBy("s", "label").agg(F.count(F.lit(1)).alias("c"))
    tot_s = per_s.groupBy("s").agg(F.sum("c").alias("t"))
    grid = (
        labels.crossJoin(tot_s)
        .join(per_s.withColumnRenamed("c", "np"), ["s", "label"], "left")
        .select("label", "s", "t", F.coalesce("np", F.lit(0)).alias("np"))
    )
    cw = (
        Window.partitionBy("label")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "label",
        "s",
        "np",
        (F.col("t") - F.col("np")).alias("nn"),
        F.coalesce(
            F.sum(F.col("t") - F.col("np")).over(cw), F.lit(0)
        ).alias("neg_below"),
    )
    agg = cum.groupBy("label").agg(
        F.sum("np").alias("npos"),
        F.sum("nn").alias("nneg"),
        F.sum(F.col("np") * F.col("neg_below")).alias("wins"),
        F.sum(F.col("np") * F.col("nn")).alias("ties"),
    )
    return agg.select(
        "label",
        "npos",
        "nneg",
        F.round(
            (2.0 * F.col("wins") + F.col("ties"))
            / (2.0 * F.col("npos") * F.col("nneg")),
            6,
        ).alias("auc"),
        round_stable(
            (2.0 * F.col("wins") + F.col("ties"))
            / (F.col("npos") * F.col("nneg"))
            - 1,
            6,
        ).alias("gini"),
    )


def _kmeans_oracle() -> str:
    from covid_data_pipeline_spark.operators.clustering import (
        kmeans_oracle_sql,
    )

    return kmeans_oracle_sql(k=8, iters=2)


@register(
    "kmeans_cluster_embeddings",
    _kmeans_oracle(),
    tags=("similarity", "clustering", "kmeans", "iterative"),
    bench=True,
)
def kmeans_cluster_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-lattice Lloyd k-means (k=8, 2 centroid updates) over the
    embeddings table, emitting EVERY vector's final cluster assignment
    and exact integer squared distance — so the oracle hash certifies
    the entire iterative trajectory, not a summary
    (`operators/clustering.py::kmeans_lloyd`; the DuckDB side replays
    seeds, assignments, and floor-divided centroid updates as unrolled
    MATERIALIZED CTEs). The exact-arithmetic counterpart of the
    float k-means inside the IVF trainer (rows-only by nature)."""
    from covid_data_pipeline_spark.operators.clustering import kmeans_lloyd

    return kmeans_lloyd(
        table(spark, sf_dir, "embeddings"), k=8, iters=2
    )


def _kmeans_silhouette_oracle() -> str:
    from covid_data_pipeline_spark.operators.clustering import (
        kmeans_silhouette_oracle_sql,
    )

    return kmeans_silhouette_oracle_sql(k=8, iters=2)


@register(
    "kmeans_silhouette_embeddings",
    _kmeans_silhouette_oracle(),
    tags=("similarity", "clustering", "kmeans", "evaluation"),
)
def kmeans_silhouette_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-vector simplified silhouette of the final integer-lattice
    Lloyd state (k=8, 2 updates): a = distance to own centroid, b =
    nearest other centroid, s = (b-a)/max(a,b) on sqrt of the exact
    lattice distances — the O(n*k) cluster-quality score
    (`operators/clustering.py::kmeans_silhouette`), certifying both
    the trajectory AND the evaluation in one oracle hash."""
    from covid_data_pipeline_spark.operators.clustering import (
        kmeans_silhouette,
    )

    return kmeans_silhouette(
        table(spark, sf_dir, "embeddings"), k=8, iters=2
    )


@register(
    "knn_clustering_coefficient",
    "WITH "
    + _knn_edges_sql("src", "dst")
    + """,
    cc_und AS (
      SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
      FROM ranked WHERE rn <= 5),
    cc_adj AS (
      SELECT lo AS u, hi AS v FROM cc_und
      UNION ALL
      SELECT hi AS u, lo AS v FROM cc_und),
    cc_deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM cc_adj GROUP BY 1),
    cc_wedge AS (
      SELECT e1.u AS center, e1.v AS x, e2.v AS y
      FROM cc_adj e1 JOIN cc_adj e2 ON e1.u = e2.u AND e1.v < e2.v),
    cc_tri AS (
      SELECT w.center AS node, CAST(COUNT(*) AS BIGINT) AS tri
      FROM cc_wedge w JOIN cc_und e ON w.x = e.lo AND w.y = e.hi
      GROUP BY 1)
    SELECT d.node, d.deg, COALESCE(t.tri, 0) AS tri,
           CASE WHEN d.deg >= 2
                THEN ROUND(2.0 * COALESCE(t.tri, 0)
                           / (CAST(d.deg AS DOUBLE) * (d.deg - 1)), 6)
                ELSE 0.0 END AS coeff
    FROM cc_deg d LEFT JOIN cc_tri t USING (node)
    """,
    tags=("similarity", "knn-graph", "graph", "diagnostics"),
)
def knn_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watts-Strogatz local clustering coefficient of every node in the
    exact 5-NN graph (`operators/graph.py::local_clustering_coefficient`
    over the canonicalized undirected edge set): coeff -> 1 marks
    near-duplicate pockets whose neighborhoods are cliques, coeff -> 0
    marks hub spokes — the per-node refinement the SemDeDup-style
    pruning threshold is tuned against. Triangles via the oriented
    wedge join (cost sum-of-deg^2, degree capped by kNN construction)."""
    from covid_data_pipeline_spark.operators.graph import (
        local_clustering_coefficient,
    )
    from covid_data_pipeline_spark.operators.similarity import (
        knn_graph_exact,
    )

    g = knn_graph_exact(
        table(spark, sf_dir, "embeddings"), k=5, id_col="vec_id",
        vec_col="embedding",
    )
    und = g.select(
        F.least("src_id", "nbr_id").alias("lo"),
        F.greatest("src_id", "nbr_id").alias("hi"),
    ).distinct()
    return local_clustering_coefficient(und)


@register(
    "knn_degree_assortativity",
    "WITH "
    + _knn_edges_sql("src", "dst")
    + """,
    da_und AS (
      SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
      FROM ranked WHERE rn <= 5),
    da_adj AS (
      SELECT lo AS u, hi AS v FROM da_und
      UNION ALL
      SELECT hi AS u, lo AS v FROM da_und),
    da_deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM da_adj GROUP BY 1),
    da_pairs AS (
      SELECT du.deg AS x, dv.deg AS y
      FROM da_adj a
      JOIN da_deg du ON a.u = du.node
      JOIN da_deg dv ON a.v = dv.node),
    da_mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM da_pairs)
    SELECT m AS m_directed,
           ROUND(CAST(m * sxy - sx * sx AS DOUBLE)
                 / CAST(m * sxx - sx * sx AS DOUBLE), 6) + 0 AS assortativity
    FROM da_mom WHERE m * sxx - sx * sx <> 0
    """,
    tags=("similarity", "knn-graph", "graph", "diagnostics"),
)
def knn_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the exact 5-NN graph: the
    Pearson correlation of endpoint degrees over all directed edge
    orientations — positive means similar-degree nodes link (a
    core-periphery embedding space), negative means hubs attach to
    leaves (star-like semantic neighborhoods). By the symmetry of the
    orientation set the x and y marginals coincide, so r reduces to
    exact BIGINT moments (m*sxy - sx^2) / (m*sxx - sx^2) off one
    degree join — the same normal-equation integer discipline as
    events_ols_trend (a >1e9-edge regime would move the quadratic
    moments to DECIMAL(38,0)/HUGEINT per the burst_days rule)."""
    from covid_data_pipeline_spark.operators.similarity import (
        knn_graph_exact,
    )

    g = knn_graph_exact(
        table(spark, sf_dir, "embeddings"), k=5, id_col="vec_id",
        vec_col="embedding",
    )
    und = g.select(
        F.least("src_id", "nbr_id").alias("lo"),
        F.greatest("src_id", "nbr_id").alias("hi"),
    ).distinct()
    adj = und.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionAll(
        und.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    pairs = (
        adj.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("x")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("y")), "v")
        .select("x", "y")
    )
    mom = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    den = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    return mom.where(
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx") != 0
    ).select(
        F.col("m").alias("m_directed"),
        round_stable(num / den, 6).alias("assortativity"),
    )


@register(
    "embeddings_best_stump",
    """
    WITH st_x AS (
      SELECT vec_id, label, generate_subscripts(ve, 1) AS pos,
             unnest(ve) AS val
      FROM (SELECT vec_id, label,
                   list_transform(embedding, x -> x::DOUBLE) AS ve
            FROM embeddings) e),
    st_bounds AS (
      SELECT pos, tile, MAX(val) AS thr FROM (
        SELECT pos, val,
               CAST(NTILE(4) OVER (PARTITION BY pos
                 ORDER BY val, vec_id) AS INTEGER) AS tile
        FROM st_x) t
      WHERE tile <= 3 GROUP BY 1, 2),
    st_cells AS (
      SELECT x.pos, b.tile, x.label,
             CASE WHEN x.val <= b.thr THEN 0 ELSE 1 END AS side,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM st_x x JOIN st_bounds b ON x.pos = b.pos
      GROUP BY 1, 2, 3, 4),
    st_sides AS (
      SELECT pos, tile, side, CAST(SUM(c) AS BIGINT) AS ns
      FROM st_cells GROUP BY 1, 2, 3),
    st_split_h AS (
      SELECT c.pos, c.tile,
             CAST(SUM(-c.c * CAST(ROUND(
               ln(CAST(c.c AS DOUBLE) / s.ns) * 1e6, 0) AS BIGINT))
               AS BIGINT) AS h_split
      FROM st_cells c
      JOIN st_sides s
        ON c.pos = s.pos AND c.tile = s.tile AND c.side = s.side
      GROUP BY 1, 2),
    st_tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM st_cells WHERE tile = 1),
    st_h0 AS (
      SELECT CAST(SUM(-lc.c * CAST(ROUND(
               ln(CAST(lc.c AS DOUBLE) / t.n) * 1e6, 0) AS BIGINT))
               AS BIGINT) AS h_total
      FROM (SELECT label, CAST(COUNT(*) AS BIGINT) AS c
            FROM st_x WHERE pos = 1 GROUP BY 1) lc
      CROSS JOIN st_tot t),
    st_gain AS (
      SELECT s.pos, s.tile, h0.h_total - s.h_split AS gain_scaled
      FROM st_split_h s CROSS JOIN st_h0 h0),
    st_best AS (
      SELECT g2.pos, g2.tile, g2.gain_scaled, bthr.thr FROM (
        SELECT g.*, ROW_NUMBER() OVER (
          PARTITION BY g.pos
          ORDER BY g.gain_scaled DESC, g.tile) AS brn
        FROM st_gain g) g2
      JOIN st_bounds bthr
        ON g2.pos = bthr.pos AND g2.tile = bthr.tile
      WHERE g2.brn = 1)
    SELECT CAST(b.pos - 1 AS INTEGER) AS dim_idx,
           CAST(b.tile AS INTEGER) AS threshold_tile,
           ROUND(b.thr, 6) + 0 AS threshold,
           ROUND(CAST(b.gain_scaled AS DOUBLE) / (t.n * 1e6), 6)
             AS info_gain,
           CAST(ROW_NUMBER() OVER (
             ORDER BY b.gain_scaled DESC, b.pos) AS INTEGER) AS rnk
    FROM st_best b CROSS JOIN st_tot t
    """,
    tags=("similarity", "feature-selection", "decision-tree"),
)
def embeddings_best_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best decision stump per embedding dimension: each dim tries its
    three reference quartile thresholds and keeps the split with the
    highest label information gain — level 1 of a distributed decision
    tree, and the threshold-aware upgrade of embeddings_dim_mutual_info
    (which only sees the sign). The global rank says which single
    (dim, threshold) test best separates the labels.

    Exactness: n*H terms are exact BIGINT sums of c * round(ln(c/n)*1e6)
    micro-nats per (side, label) cell, so gains compare and rank as
    exact integers; thresholds come from NTILE(4) with vec_id
    tiebreaks and re-bin by pure value comparison (the PSI pattern).
    Scale: ONE posexplode fan-out of the corpus; cells are
    |dims| x 3 x 2 x |labels| — constant; the quartile NTILE runs per
    dim in parallel (swap for approx quantiles at warehouse scale)."""
    e = table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("pos0", "val"),
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "val")
    tw = Window.partitionBy("pos").orderBy("val", "vec_id")
    bounds = (
        x.select("pos", "val", F.ntile(4).over(tw).alias("tile"))
        .where(F.col("tile") <= 3)
        .groupBy("pos", "tile")
        .agg(F.max("val").alias("thr"))
    )
    cells = (
        x.join(bounds, "pos")
        .groupBy(
            "pos",
            "tile",
            "label",
            F.when(F.col("val") <= F.col("thr"), 0)
            .otherwise(1)
            .alias("side"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sides = cells.groupBy("pos", "tile", "side").agg(
        F.sum("c").alias("ns")
    )
    split_h = (
        cells.join(sides, ["pos", "tile", "side"])
        .groupBy("pos", "tile")
        .agg(
            F.sum(
                -F.col("c")
                * F.round(
                    F.log(F.col("c").cast("double") / F.col("ns")) * 1e6,
                    0,
                ).cast("long")
            ).alias("h_split")
        )
    )
    tot = cells.where(F.col("tile") == 1).agg(F.sum("c").alias("n"))
    h0 = (
        x.where(F.col("pos") == 1)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("c"))
        # bcast: const(1) scalar root-count agg
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                -F.col("c")
                * F.round(
                    F.log(F.col("c").cast("double") / F.col("n")) * 1e6,
                    0,
                ).cast("long")
            ).alias("h_total")
        )
    )
    # bcast: const(1) root entropy agg
    gain = split_h.crossJoin(F.broadcast(h0)).select(
        "pos",
        "tile",
        (F.col("h_total") - F.col("h_split")).alias("gain_scaled"),
    )
    bw = Window.partitionBy("pos").orderBy(
        F.col("gain_scaled").desc(), "tile"
    )
    best = (
        gain.select("pos", "tile", "gain_scaled", F.row_number().over(bw).alias("brn"))
        .where(F.col("brn") == 1)
        .join(bounds, ["pos", "tile"])
    )
    rw = Window.orderBy(F.col("gain_scaled").desc(), "pos")
    # bcast: const(1) scalar root-count agg
    return best.crossJoin(F.broadcast(tot)).select(
        (F.col("pos") - 1).cast("int").alias("dim_idx"),
        F.col("tile").cast("int").alias("threshold_tile"),
        round_stable("thr", 6).alias("threshold"),
        F.round(
            F.col("gain_scaled").cast("double") / (F.col("n") * 1e6), 6
        ).alias("info_gain"),
        F.row_number().over(rw).alias("rnk"),
    )


def _hits_oracle(iters: int = 4, k: int = 5, scale: int = 10**6) -> str:
    """Unrolled HITS twin of ``operators/graph.py::hits_int`` over the
    exact kNN edge set (same 1-in-4 id subset as pagerank_knn_docs).
    Each half-step normalizes by the max raw score (L-infinity) with
    BIGINT floor division, so the whole trajectory replays bit-exactly;
    every CTE is MATERIALIZED because raw/normalized relations are each
    referenced twice."""
    head = f"""
    WITH {_knn_edges_sql("src", "dst", " WHERE vec_id % 4 = 0")},
    e AS MATERIALIZED (SELECT src, dst FROM ranked WHERE rn <= {k}),
    hnodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e) t),
    h0 AS (SELECT node, CAST({scale} AS BIGINT) AS s FROM hnodes)"""
    step = """,
    ar{t} AS MATERIALIZED (
      SELECT e.dst AS node, CAST(SUM(p.s) AS BIGINT) AS raw
      FROM h{p} p JOIN e ON e.src = p.node GROUP BY 1),
    a{t} AS MATERIALIZED (
      SELECT n.node,
             CAST((COALESCE(r.raw, 0) * {scale})
                  // GREATEST((SELECT MAX(raw) FROM ar{t}), 1) AS BIGINT)
               AS s
      FROM hnodes n LEFT JOIN ar{t} r USING (node)),
    hr{t} AS MATERIALIZED (
      SELECT e.src AS node, CAST(SUM(a.s) AS BIGINT) AS raw
      FROM a{t} a JOIN e ON e.dst = a.node GROUP BY 1),
    h{t} AS MATERIALIZED (
      SELECT n.node,
             CAST((COALESCE(r.raw, 0) * {scale})
                  // GREATEST((SELECT MAX(raw) FROM hr{t}), 1) AS BIGINT)
               AS s
      FROM hnodes n LEFT JOIN hr{t} r USING (node))"""
    body = "".join(
        step.format(t=t, p=t - 1, scale=scale) for t in range(1, iters + 1)
    )
    return (
        head
        + body
        + f"""
    SELECT h.node AS vec_id, h.s AS hub, a.s AS authority
    FROM h{iters} h JOIN a{iters} a USING (node)"""
    )


@register(
    "hits_knn_docs",
    _hits_oracle(),
    tags=("similarity", "graph", "hits", "centrality", "iterative"),
)
def hits_knn_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the exact 5-NN cosine graph
    (`operators/graph.py::hits_int`) — the second centrality lens next
    to pagerank_knn_docs: authorities are the exemplar vectors many
    neighborhoods agree on (good dedup/curation representatives), hubs
    are vectors whose neighbor lists consist of those exemplars. The
    integer L-infinity-normalized power iteration makes an iterative
    spectral algorithm hash-verifiable; the oracle unrolls the same
    four double-steps as chained MATERIALIZED CTEs. Same deterministic
    1-in-4 id subset as the PageRank query (exact kNN is the quadratic
    verification baseline; the LSH graph is the scale path)."""
    from covid_data_pipeline_spark.operators.graph import hits_int
    from covid_data_pipeline_spark.operators.similarity import knn_graph_exact

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0)
    edges = knn_graph_exact(emb, k=5, id_col="vec_id", vec_col="embedding")
    return hits_int(edges, src="src_id", dst="nbr_id", iters=4).select(
        F.col("node").alias("vec_id"), "hub", "authority"
    )


@register(
    "media_neardup_phash",
    r"""
    WITH mdocs AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE length(text) > 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             substr(text, 1, 10) || 'ZZZZ' || substr(text, 15) AS text
      FROM documents WHERE length(text) > 0 AND doc_id % 7 = 0
                       AND length(text) >= 14
    ),
    mb AS MATERIALIZED (
      SELECT doc_id,
             ((p.i // 32) // 4) * 8 + ((p.i % 32) // 4) AS b,
             CAST(SUM(CAST(concat('0x',
                    substr(hx, (p.i % nb) * 2 + 1, 2)) AS BIGINT))
                  AS BIGINT) AS s
      FROM (SELECT doc_id, hex(text::BLOB) AS hx,
                   octet_length(text::BLOB) AS nb
            FROM mdocs) d,
           UNNEST(range(0, 1024)) AS p(i)
      GROUP BY 1, 2
    ),
    thr AS (
      SELECT doc_id, CAST(SUM(s) AS BIGINT) AS thr FROM (
        SELECT doc_id, s, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY s, b) AS rn
        FROM mb) t
      WHERE rn IN (32, 33) GROUP BY 1
    ),
    sigs AS MATERIALIZED (
      SELECT mb.doc_id,
             CAST(SUM(CASE WHEN 2 * mb.s > thr.thr THEN
                    CASE WHEN mb.b = 63 THEN -9223372036854775808
                         ELSE CAST(1 AS BIGINT) << CAST(mb.b AS INTEGER) END
                  ELSE 0 END) AS BIGINT) AS sig,
             CAST(SUM(CASE WHEN 2 * mb.s > thr.thr THEN
                    CASE WHEN mb.b = 63
                         THEN CAST(9223372036854775808 AS HUGEINT)
                         ELSE CAST(CAST(1 AS BIGINT) << CAST(mb.b AS INTEGER)
                                   AS HUGEINT) END
                  ELSE 0 END) AS UBIGINT) AS su
      FROM mb JOIN thr USING (doc_id) GROUP BY mb.doc_id
    ),
    chunks AS (
      SELECT doc_id, sig, c.i AS chunk_idx,
             CAST((su >> CAST(16 * c.i AS INTEGER)) & 65535 AS BIGINT)
               AS chunk_val
      FROM sigs CROSS JOIN range(4) c(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sig AS sig_a, b.sig AS sig_b
      FROM chunks a JOIN chunks b
        ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
    """,
    tags=("multimodal", "dedup", "phash", "pandas-udf"),
)
def media_neardup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal arm of the dedup stack, end-to-end HASH-VERIFIED:
    block-mean perceptual hash (`operators/multimodal.py::media_phash`,
    deterministic fake decode — payload bytes tiled to a 32x32 grid, so
    the REAL hash arithmetic runs either way) → 16-bit pigeonhole
    banding → exact Hamming ≤ 3 verify
    (`operators/dedup.py::simhash_candidate_pairs(sig_col="phash")`).
    Near-dup "images" are planted as LENGTH-PRESERVING byte edits
    (substr splice — an append would shift every tiled byte position
    and destroy locality, exactly like re-encoding shifts real pixels).

    The oracle replays the whole chain in SQL: bytes via hex(blob)
    2-char slices, block means as exact integer sums (mean_b > median
    ⟺ 2·s_b > s(32)+s(33) — all-integer), the signed signature from
    disjoint AND-masks (bit 63 = min-long), banding on the unsigned
    twin, exact Hamming. Scale shape: hash is a pure Arrow map; the
    banded self-join is the standard no-all-pairs LSH shape."""
    from covid_data_pipeline_spark.operators.dedup import (
        simhash_candidate_pairs,
    )
    from covid_data_pipeline_spark.operators.multimodal import media_phash

    d = table(spark, sf_dir, "documents").where(F.length("text") > 0)
    planted = d.where(
        (F.col("doc_id") % 7 == 0) & (F.length("text") >= 14)
    ).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 10),
            F.lit("ZZZZ"),
            F.expr("substr(text, 15)"),
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(planted)
    media = corpus.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    sigs = media_phash(media, fake=True).select(
        F.col("media_id").cast("long").alias("doc_id"), "phash"
    ).localCheckpoint(eager=False)
    return simhash_candidate_pairs(
        sigs, id_col="doc_id", sig_col="phash", max_hamming=3
    )


def _mmr_oracle(k: int = 8, shortlist: int = 20, n_queries: int = 5) -> str:
    """Unrolled greedy-MMR twin of ``operators/similarity.py::
    mmr_rerank``: the shortlist and pairwise stages snap every cosine
    to basis points with ``FLOOR(x·1e4 + 0.5)`` (round-half-up — never
    decimal-round a derived value), then each greedy step is one
    MATERIALIZED CTE (each step is referenced twice — max-to-selected
    join + exclusion anti-join — so plain CTEs would re-expand 2^k, the
    k-center lesson). λ=1/2 makes the doubled objective pure BIGINT."""
    cos = lambda a, b: (  # noqa: E731
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * "
        f"sqrt(list_dot_product({b}, {b})))"
    )
    parts = [f"""WITH mm_q AS (
  SELECT vec_id AS qid, list_transform(embedding, x -> x::DOUBLE) AS qv
  FROM embeddings WHERE vec_id < {n_queries}),
mm_v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
  FROM embeddings),
mm_cand AS MATERIALIZED (
  SELECT qid, cid, ve, sbp FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sbp DESC, cid) AS rn
    FROM (
      SELECT q.qid, v.vec_id AS cid, v.ve,
             CAST(FLOOR({cos('v.ve', 'q.qv')} * 10000 + 0.5) AS BIGINT) AS sbp
      FROM mm_v v, mm_q q WHERE v.vec_id <> q.qid) mm_s0) mm_s1
  WHERE rn <= {shortlist}),
mm_pair AS MATERIALIZED (
  SELECT a.qid, a.cid AS id_a, b.cid AS id_b,
         CAST(FLOOR({cos('a.ve', 'b.ve')} * 10000 + 0.5) AS BIGINT) AS bp
  FROM mm_cand a JOIN mm_cand b ON a.qid = b.qid AND a.cid <> b.cid),
mm_all1 AS MATERIALIZED (
  SELECT qid, cid, sbp AS mmr2, 1 AS rnk FROM (
    SELECT qid, cid, sbp,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sbp DESC, cid) AS rn
    FROM mm_cand) mm_s2 WHERE rn = 1)"""]
    for t in range(2, k + 1):
        parts.append(f""",
mm_all{t} AS MATERIALIZED (
  SELECT * FROM mm_all{t-1}
  UNION ALL
  SELECT qid, cid, mmr2, {t} AS rnk FROM (
    SELECT c.qid, c.cid, c.sbp - mx.m AS mmr2,
           ROW_NUMBER() OVER (PARTITION BY c.qid
                              ORDER BY c.sbp - mx.m DESC, c.cid) AS rn
    FROM mm_cand c
    JOIN (SELECT p.qid, p.id_a, MAX(p.bp) AS m
          FROM mm_pair p JOIN mm_all{t-1} s
            ON p.qid = s.qid AND p.id_b = s.cid
          GROUP BY p.qid, p.id_a) mx
      ON mx.qid = c.qid AND mx.id_a = c.cid
    LEFT JOIN mm_all{t-1} ex ON ex.qid = c.qid AND ex.cid = c.cid
    WHERE ex.cid IS NULL) mm_s{t} WHERE rn = 1)""")
    parts.append(f"""
SELECT qid AS query_id, CAST(rnk AS INTEGER) AS rank, cid AS vec_id,
       mmr2 AS mmr_x2_bp
FROM mm_all{k}""")
    return "".join(parts)


@register(
    "similarity_mmr_rerank",
    _mmr_oracle(),
    tags=("similarity", "rerank", "diversity", "mmr"),
    bench=True,
)
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversity rerank of each query's
    20-candidate cosine shortlist down to 8 picks (λ=1/2;
    `operators/similarity.py::mmr_rerank`) — the rerank a RAG stack
    runs so its retrieved passages aren't near-duplicates of the top
    hit. Integer basis-point scores end-to-end: the whole greedy
    trajectory (picks, ranks, doubled MMR objective) hash-matches the
    unrolled-CTE oracle."""
    from covid_data_pipeline_spark.operators.similarity import mmr_rerank

    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = mmr_rerank(e, queries, k=8, shortlist=20)
    return out.select(
        "query_id", F.col("rank").cast("int").alias("rank"),
        "vec_id", "mmr_x2_bp",
    )


# --- exact-lattice PCA (operators/clustering.py::pca_power_scores) ----
_PCA_ITERS = 6
_PCA_W = [5, 4, 3, 2] + [1] * 60  # planted anisotropy: the synthetic
# embeddings are near-isotropic (lambda2/lambda1 ~ 0.99 measured), so a
# fixed power budget can't converge on the raw covariance; integer
# post-quantization axis weights give the spectrum a dominant direction
# (power ratio ~ (4/5)^2 per step) while keeping every value exact.


def _pca_oracle_sql() -> str:
    w_list = ", ".join(str(w) for w in _PCA_W)
    steps = []
    prev = "v0"
    for k in range(1, _PCA_ITERS + 1):
        steps.append(f"""
    r{k} AS MATERIALIZED (
      SELECT cov.i AS i, SUM(cov.c * v.v) AS r
      FROM cov JOIN {prev} v ON v.i = cov.j GROUP BY 1),
    m{k} AS (SELECT MAX(ABS(r)) AS m FROM r{k}),
    v{k} AS MATERIALIZED (
      SELECT t.i,
             CASE WHEN m.m = 0 THEN p.v
                  ELSE (t.rs - (((t.rs % m.m) + m.m) % m.m)) // m.m
             END AS v
      FROM (SELECT i, r * CAST(1000000 AS HUGEINT) AS rs FROM r{k}) t
      CROSS JOIN m{k} m
      JOIN {prev} p ON p.i = t.i)""")
        prev = f"v{k}"
    steps_sql = ",".join(steps)
    return f"""
    WITH wts AS (
      SELECT UNNEST(range(1, 65)) AS i, UNNEST([{w_list}]) AS wv),
    long AS (
      SELECT vec_id, i.i AS i,
             CAST(ROUND(CAST(embedding[i.i] AS DOUBLE) * 1000000.0, 0)
                  AS BIGINT) * wt.wv AS qi
      FROM embeddings CROSS JOIN range(1, 65) i(i)
      JOIN wts wt ON wt.i = i.i),
    sums AS (SELECT i, CAST(SUM(qi) AS HUGEINT) AS s FROM long GROUP BY 1),
    nrow AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings),
    pairs AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.qi * b.qi) AS HUGEINT) AS p
      FROM long a JOIN long b USING (vec_id) GROUP BY 1, 2),
    cov AS MATERIALIZED (
      SELECT p.i, p.j, n.n * p.p - si.s * sj.s AS c
      FROM pairs p
      CROSS JOIN nrow n
      JOIN sums si ON si.i = p.i
      JOIN sums sj ON sj.i = p.j),
    v0 AS (SELECT UNNEST(range(1, 65)) AS i,
                  CAST(1000000 AS HUGEINT) AS v),
    {steps_sql}
    SELECT l.vec_id, CAST(SUM(l.qi * v.v) AS BIGINT) AS pc1_score
    FROM long l JOIN v{_PCA_ITERS} v ON v.i = l.i
    GROUP BY 1
    """


@register(
    "embeddings_pca_power",
    _pca_oracle_sql(),
    tags=("similarity", "embeddings", "pca", "spectral"),
    bench=True,
)
def embeddings_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-lattice PCA: each vector's projection on the dominant
    covariance direction (`operators/clustering.py::pca_power_scores`)
    — the spectral member of the exact-replay toolbox (k-means =
    centroids, IVF/PQ = quantizers, JL = random projections, this =
    the data's own top axis; measured 0.9997 |corr| with numpy's
    eigendecomposition PC1 on the weighted lattice at sf0.01). One
    Arrow corpus pass emits per-batch int64 X^T X (dim^2 rows per
    BATCH — a per-row explode would be 4096x); the 6-step power
    iteration runs on the collected 64x64 matrix in arbitrary-
    precision Python ints with floor-div L-inf normalization, so the
    DuckDB oracle replays the exact trajectory through HUGEINT
    MATERIALIZED step CTEs (DuckDB // truncates — the oracle writes
    floor as (a-((a%m)+m)%m)//m); scoring is a zero-shuffle codegen
    dot product."""
    from covid_data_pipeline_spark.operators.clustering import (
        pca_power_scores,
    )

    emb = table(spark, sf_dir, "embeddings")
    return pca_power_scores(
        emb, dim=64, iters=_PCA_ITERS, dim_weights=_PCA_W
    )


# --- ranking-quality eval: integer NDCG@k / AP@k ----------------------
# Positional gains as shared integer literals (micro-scaled 1/log2(i+1),
# computed once in Python and inlined into BOTH engines — no runtime
# float): the binary-relevance DCG becomes an exact BIGINT dot product.
import math as _math

_EVAL_K = TOP_K
_GAINS = [
    int(1_000_000 / _math.log2(i + 1) + 0.5) for i in range(1, _EVAL_K + 1)
]
_IDCG = sum(_GAINS)


def _ndcg_oracle() -> str:
    gains_rows = ", ".join(f"({i + 1}, {g})" for i, g in enumerate(_GAINS))
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS dv
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, dv FROM v WHERE vec_id < {N_QUERIES}),
nd_exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             ROUND(list_dot_product(q.dv, e.dv)
                   / (sqrt(list_dot_product(q.dv, q.dv))
                      * sqrt(list_dot_product(e.dv, e.dv))), 4) DESC,
             e.vec_id) AS rn
    FROM q, v e WHERE e.vec_id <> q.query_id
  ) WHERE rn <= {_EVAL_K}
),
dq AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(x * (127.0 / GREATEST(mx, 1e-30)) + 0.5) AS INTEGER)
                / (127.0 / GREATEST(mx, 1e-30))) AS dv
  FROM (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, y -> abs(y))) AS mx
    FROM embeddings
  )
),
qq AS (SELECT vec_id AS query_id, dv FROM dq WHERE vec_id < {N_QUERIES}),
nd_quant AS (
  SELECT query_id, vec_id, rn FROM (
    SELECT qq.query_id, e.vec_id,
           row_number() OVER (PARTITION BY qq.query_id ORDER BY
             ROUND(list_dot_product(qq.dv, e.dv)
                   / (sqrt(list_dot_product(qq.dv, qq.dv))
                      * sqrt(list_dot_product(e.dv, e.dv))), 4) DESC,
             e.vec_id) AS rn
    FROM qq, dq e WHERE e.vec_id <> qq.query_id
  ) WHERE rn <= {_EVAL_K}
),
nd_gain(i, g) AS (VALUES {gains_rows}),
nd_hits AS (
  SELECT qu.query_id, qu.rn,
         CASE WHEN ex.vec_id IS NULL THEN 0 ELSE 1 END AS hit
  FROM nd_quant qu
  LEFT JOIN nd_exact ex
    ON ex.query_id = qu.query_id AND ex.vec_id = qu.vec_id
),
nd_cum AS (
  SELECT query_id, rn, hit,
         SUM(hit) OVER (PARTITION BY query_id ORDER BY rn
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_hits
  FROM nd_hits
)
SELECT c.query_id,
       CAST(SUM(c.hit) AS BIGINT) AS n_common,
       CAST(SUM(c.hit * g.g) * 10000 // {_IDCG} AS BIGINT) AS ndcg_bp,
       CAST(SUM(c.hit * ((1000000 * c.cum_hits) // c.rn)) // {_EVAL_K}
            AS BIGINT) AS ap_micro
FROM nd_cum c JOIN nd_gain g ON g.i = c.rn
GROUP BY c.query_id
"""


@register(
    "ann_ndcg_map_eval",
    _ndcg_oracle(),
    tags=("similarity", "eval", "ndcg", "map"),
)
def ann_ndcg_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-aware ANN quality report — NDCG@k and AP@k of the
    int8-quantized ranking against the exact float ranking, extending
    ann_recall_quantized (recall treats rank 1 and rank k the same;
    these don't). Binary relevance = membership in the exact top-k.
    The novelty is EXACTNESS: positional gains 1/log2(i+1) are
    micro-scaled integer LITERALS shared by both engines, the running
    hit count is an integer window, per-position precision uses
    truncating integer division — so DCG, NDCG (basis points of the
    constant IDCG), and AP (micro-units) are all BIGINT and the whole
    report value-hashes against the SQL replay. Same plan shape as the
    recall eval: two broadcast-query brute-force rankings + one
    per-query k-row window."""
    from covid_data_pipeline_spark.operators.similarity import quantize_int8

    emb = table(spark, sf_dir, "embeddings")
    deq = quantize_int8(emb, "embedding").select(
        "vec_id",
        F.transform("qvec", lambda q: q / F.col("scale")).alias("embedding"),
    )

    def topk(corpus):
        queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return cosine_topk_bruteforce(
            corpus, queries, k=_EVAL_K, id_col="vec_id",
            vec_col="embedding", query_id_col="query_id",
        )

    exact = topk(emb.select("vec_id", "embedding")).select(
        "query_id", "vec_id"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("vec_id")
    )
    quant = (
        topk(deq)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .select("query_id", "vec_id", "rn")
    )
    hits = quant.join(
        exact.withColumn("__hit", F.lit(1)), ["query_id", "vec_id"], "left"
    ).withColumn("hit", F.coalesce(F.col("__hit"), F.lit(0)).cast("bigint"))
    cw = (
        Window.partitionBy("query_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hits.withColumn("cum_hits", F.sum("hit").over(cw))
    return cum.groupBy("query_id").agg(
        F.sum("hit").alias("n_common"),
        F.expr(f"CAST(SUM(hit * element_at({'array(' + ', '.join(str(g) + 'L' for g in _GAINS) + ')'}, CAST(rn AS INT))) * 10000 div {_IDCG} AS BIGINT)").alias("ndcg_bp"),
        F.expr(f"CAST(SUM(hit * ((1000000 * cum_hits) div rn)) div {_EVAL_K} AS BIGINT)").alias("ap_micro"),
    )


@register(
    "embeddings_lof_scores",
    """
    WITH lofq AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(ROUND(x::DOUBLE * 1e6, 0) AS BIGINT))
               AS qv
      FROM embeddings),
    lofs AS (
      SELECT a.vec_id AS src, b.vec_id AS nbr,
             CAST(list_sum(list_transform(
                    a.qv, (x, i) -> (x - b.qv[i]) * (x - b.qv[i])))
                  AS BIGINT) AS d2
      FROM lofq a, lofq b WHERE a.vec_id <> b.vec_id),
    lofr AS (
      SELECT *, row_number() OVER (PARTITION BY src ORDER BY d2, nbr)
               AS rn
      FROM lofs),
    lofe AS (SELECT src, nbr, d2 FROM lofr WHERE rn <= 5),
    lofkd AS (SELECT src, MAX(d2) AS kd FROM lofe GROUP BY 1),
    lofreach AS (
      SELECT e.src, e.nbr, GREATEST(n.kd, e.d2) AS r
      FROM lofe e JOIN lofkd n ON n.src = e.nbr),
    lofsum AS (
      SELECT src, CAST(SUM(r) AS BIGINT) AS ra FROM lofreach GROUP BY 1),
    lofterm AS (
      SELECT e.src,
             CAST(ROUND(CAST(GREATEST(sa.ra, 1) AS DOUBLE)
                        / CAST(GREATEST(sb.ra, 1) AS DOUBLE) * 1e6, 0)
                  AS BIGINT) AS tm
      FROM lofe e
      JOIN lofsum sa ON sa.src = e.src
      JOIN lofsum sb ON sb.src = e.nbr)
    SELECT t.src AS vec_id, k.kd AS kdist2,
           ROUND(CAST(SUM(t.tm) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS lof
    FROM lofterm t JOIN lofkd k ON k.src = t.src
    GROUP BY 1, 2
    """,
    tags=("similarity", "anomaly", "lof", "knn"),
)
def embeddings_lof_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor over the embeddings table
    (`operators/similarity.py::lof_scores` -> `lof_from_edges`,
    Breunig et al. SIGMOD'00): density-based anomaly scores on the
    micro-quantized integer lattice — exact BIGINT squared distances
    and reach sums, one quantized division per LOF term, so the scores
    hash-verify against the quadratic SQL replay. The edge-consuming
    core scales to any corpus whose kNN edges come from the LSH/IVF
    candidate paths; the brute baseline here is the verification
    contract, same as knn_graph_exact."""
    from covid_data_pipeline_spark.operators.similarity import lof_scores

    return lof_scores(
        table(spark, sf_dir, "embeddings"), k=5, quant=1e6
    )
