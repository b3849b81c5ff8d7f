"""Training-data curation queries: deterministic split / sample / pack
over the documents table (`operators/sampling.py`). Every query is
oracle-checked — the operators hash with portable integer arithmetic
(Knuth multiplicative), so DuckDB reproduces the exact assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import token_count
from covid_data_pipeline_spark.harness.registry import register, table
from covid_data_pipeline_spark.operators.sampling import (
    hash_split,
    knuth_hash,
    pack_greedy_bins,
    stratified_hash_sample,
)

_KHASH = "(doc_id * 2654435761) % 4294967296"


@register(
    "train_test_hash_split",
    f"""
    SELECT doc_id, lang,
           CASE WHEN {_KHASH} % 100 < 80 THEN 'train'
                WHEN {_KHASH} % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("training", "split"),
)
def train_test_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 deterministic split: stable under re-runs, repartitioning
    and incremental appends (unlike randomSplit). Narrow projection —
    no shuffle at any scale."""
    docs = table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id").select("doc_id", "lang", "split")


@register(
    "stratified_hash_sample",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_KHASH} % 10 = 0
    """,
    tags=("training", "sample"),
)
def stratified_hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% subsample; hash independence gives per-stratum
    uniformity with a pure filter (pushes to the scan)."""
    docs = table(spark, sf_dir, "documents")
    return stratified_hash_sample(docs, "doc_id", one_in=10).select(
        "doc_id", "lang", "source"
    )


@register(
    "pack_sequences_greedy",
    """
    WITH sized AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                  PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 2048.0) AS BIGINT) AS bin_id
    FROM sized
    """,
    tags=("training", "pack"),
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: docs → 2048-token greedy bins per language.
    One window = one shuffle on lang; at 100 TB the group key would be
    (lang, shard) to bound window-partition size, same plan shape."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count("text")
    )
    packed = pack_greedy_bins(
        docs, group_col="lang", order_col="doc_id", size_col="n_tokens", budget=2048
    )
    return packed.select("doc_id", "lang", "n_tokens", "bin_id")


@register(
    "weighted_sample_orders",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS weight
    FROM orders
    WHERE o_totalprice > 0
    ORDER BY ln(((o_orderkey * 2654435761) % 4294967296 + 0.5)
                / 4294967296.0) / o_totalprice DESC,
             o_orderkey
    LIMIT 200
    """,
    tags=("training", "sampling", "weighted"),
)
def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample (Efraimidis–Spirakis, operators/sampling.py):
    200 orders drawn with probability ∝ o_totalprice, reproducible
    across engines because the uniform source is the portable Knuth
    hash, not rand(). TakeOrderedAndProject — per-partition top-k,
    no global sort."""
    from covid_data_pipeline_spark.operators.sampling import weighted_sample

    o = table(spark, sf_dir, "orders")
    return weighted_sample(
        o.select("o_orderkey", "o_totalprice"), "o_orderkey", "o_totalprice", k=200
    ).select("o_orderkey", F.round("o_totalprice", 2).alias("weight"))


@register(
    "curation_pipeline_docs",
    None,  # the chain includes MinHash/LSH + star rounds (non-SQL);
    # stage semantics are pytest-asserted with planted docs
    # (tests/test_curation.py)
    tags=("training", "curation", "pipeline"),
    bench=True,
)
def curation_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-curation chain (plans/curation.py): quality gate →
    exact dedup → LSH near-dup grouping with connected-components
    canonicalization → benchmark decontamination (every 50th doc plays
    the eval set) → deterministic split → token-budget packing. Returns
    (doc_id, split, n_tokens, bin_id) for the surviving corpus."""
    from covid_data_pipeline_spark.plans.curation import curate_documents

    d = table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0).select("text")
    out = curate_documents(d.select("doc_id", "text"), benchmark=bench)
    return out.select("doc_id", "split", "n_tokens", "bin_id")
