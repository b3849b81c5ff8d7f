"""Quickstart: the engine end-to-end in one script.

    python examples/quickstart.py [testdata_dir]

Walks the main surfaces: a relational analytics query, near-dup
detection, ANN search, the covid medallion pipeline on a temp warehouse,
and a snapshot time-travel round trip.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.operators.dedup import minhash_dedup
from covid_data_pipeline_spark.operators.similarity import cosine_topk_bruteforce
from covid_data_pipeline_spark.session import get_spark
from covid_data_pipeline_spark.sources.snapshots import SnapshotWarehouse


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")

    # 1. Relational analytics: daily sales per nation with LAG deltas.
    from covid_data_pipeline_spark.harness.registry import QUERIES

    print("== mart-analytics flagship (first 5 rows) ==")
    QUERIES["mart_analytics"].fn(spark, sf_dir).show(5, truncate=False)

    # 2. Near-duplicate detection over documents.
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    )
    pairs = minhash_dedup(doubled, threshold=0.8)
    print(f"== minhash near-dup pairs: {pairs.count()} ==")

    # 3. ANN: top-3 neighbors for 3 query vectors.
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    print("== cosine top-3 ==")
    cosine_topk_bruteforce(emb, queries, k=3).show()

    # 3b. Diversity rerank + PII scrub (round-6 additions): MMR picks
    # k results that are relevant AND mutually dissimilar; pii_scrub
    # redacts emails/phones/IPs before text leaves curation.
    from covid_data_pipeline_spark.operators.quality import pii_scrub
    from covid_data_pipeline_spark.operators.similarity import mmr_rerank

    print("== MMR diversity rerank (rank, vec_id, doubled-bp score) ==")
    mmr_rerank(emb, queries, k=3, shortlist=10).show()
    scrubbed = pii_scrub(
        docs.limit(3).withColumn(
            "text", F.concat("text", F.lit(" reach me at a@b.example.com"))
        )
    )
    print("== PII scrub ==")
    scrubbed.select("doc_id", "n_emails", "redacted").show(truncate=60)

    # 4. Snapshots: write, overwrite a partition, time-travel back.
    with tempfile.TemporaryDirectory() as tmp:
        sw = SnapshotWarehouse(spark, tmp)
        day = docs.limit(10).withColumn("d", F.lit("2024-01-01"))
        sw.append(day, "demo.docs", partition_by=["d"])
        sw.overwrite_partitions(
            day.withColumn("text", F.upper("text")), "demo.docs", ["d"]
        )
        v1 = sw.read("demo.docs", version=1).select("text").first()[0]
        v2 = sw.read("demo.docs").select("text").first()[0]
        print(f"== snapshot v1 lower={v1[:20]!r} / v2 upper={v2[:20]!r} ==")

    spark.stop()


if __name__ == "__main__":
    main()
