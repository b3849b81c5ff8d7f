"""Dedup queries over the documents table (north-star extras).

The synthetic corpus has no natural duplicates (500 distinct texts), so
these queries construct them deterministically: an exact double of every
doc (union-all) for exact dedup, and a lightly-mutated variant (one
appended token) for the near-dup families. The oracle checks exact dedup
end-to-end in SQL; MinHash/SimHash are non-SQL-expressible → rows-only
driver checks, with recall asserted in pytest against planted pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.registry import register, table
from covid_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidate_pairs,
)

MUTANT_OFFSET = 1_000_000


def _with_mutants(d: DataFrame) -> DataFrame:
    """documents ∪ near-dup mutants: same text plus one appended token,
    doc_id offset by 1e6 — planted ground truth for near-dup recall.

    Repartitions to the session's default parallelism: the documents
    parquet lands in very few input splits locally, and the downstream
    shingle/signature projections are CPU-bound — without the rebalance
    they run ~2-wide on a 32-core session. (At warehouse scale inputs
    already have enough splits; the repartition is a no-op cost-wise
    relative to the signature work.)"""
    n = d.sparkSession.sparkContext.defaultParallelism
    mutants = d.select(
        (F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    return d.select("doc_id", "text").unionByName(mutants).repartition(n)


@register(
    "dedup_exact",
    r"""
    WITH doubled AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id, text FROM documents
    ),
    keyed AS (
      SELECT doc_id, text,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM doubled
    ),
    reps AS (
      SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
      FROM keyed GROUP BY fp
    )
    SELECT DISTINCT r.doc_id, k.text, r.dup_count
    FROM reps r JOIN keyed k ON r.doc_id = k.doc_id AND r.fp = k.fp
    """,
    tags=("dedup", "exact"),
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d)  # every text exactly twice → dup_count 2
    return exact_dedup(doubled, text_col="text", id_col="doc_id")


@register(
    "dedup_minhash",
    None,  # LSH banding + jaccard verify is not SQL-expressible; pytest
    # asserts planted-pair recall (tests/test_dedup.py)
    tags=("dedup", "minhash", "lsh"),
    bench=True,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_mutants(table(spark, sf_dir, "documents"))
    # 16 hashes / 4 bands: at the planted-pair jaccard (~0.94) expected
    # recall is 1−(1−0.94⁴)⁴ ≈ 99.8% for half the signature cost; the
    # default 32/8 configuration's recall floor is pytest-asserted
    # separately (tests/test_dedup_similarity.py).
    return minhash_dedup(
        d, text_col="text", id_col="doc_id", shingle_k=3, num_hashes=16, bands=4,
        threshold=0.6,
    )


@register(
    "dedup_simhash",
    None,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _with_mutants(table(spark, sf_dir, "documents"))
    # Persist: the signature projection feeds both sides of the banded
    # self-join (at warehouse scale, stage signatures to a table instead).
    sigs = d.select("doc_id", simhash("text").alias("simhash")).persist()
    return simhash_candidate_pairs(sigs, id_col="doc_id", max_hamming=3)


@register(
    "dedup_ngram_jaccard",
    None,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact pairwise Jaccard is quadratic within posting lists — cap the
    # corpus (deterministic subset) so the verification tool stays a
    # verification tool; minhash is the scale path.
    d = _with_mutants(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    )
    return ngram_jaccard_pairs(
        d, text_col="text", id_col="doc_id", shingle_k=3, threshold=0.6
    )
