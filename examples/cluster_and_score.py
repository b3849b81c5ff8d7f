"""Cluster an embedding corpus and score user behaviour — the round-4
analytics additions end-to-end on the driver testdata.

    python examples/cluster_and_score.py [sf_dir]

1. k-means (integer-lattice Lloyd) over the embeddings table, with the
   simplified-silhouette quality readout per cluster.
2. The smoothed Markov next-event model over the events table, and the
   per-user session-likelihood deciles built on the same transitions.
3. A governance pass: k-anonymity classes + the DP-released histogram.

Everything here is the exact code the driver verifies against DuckDB
oracles (see QUERIES.md); this script just composes it.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from covid_data_pipeline_spark.harness.registry import QUERIES  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="cluster-and-score")
    spark.sparkContext.setLogLevel("ERROR")

    assign = QUERIES["kmeans_cluster_embeddings"].fn(spark, sf_dir)
    sil = QUERIES["kmeans_silhouette_embeddings"].fn(spark, sf_dir)
    print("== cluster sizes + mean silhouette ==")
    (
        assign.join(sil.select("vec_id", "silhouette"), "vec_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("silhouette"), 4).alias("mean_silhouette"),
        )
        .orderBy("cluster_id")
        .show()
    )

    print("== top next-event predictions per state (smoothed) ==")
    QUERIES["events_markov_transitions"].fn(spark, sf_dir).where(
        F.col("rnk") <= 2
    ).orderBy("prev_type", "rnk").show()

    print("== most improbable user sessions (decile 1) ==")
    QUERIES["events_session_likelihood"].fn(spark, sf_dir).where(
        F.col("decile") == 1
    ).orderBy("avg_ll").show(5)

    print("== k-anonymity classes below k=10 ==")
    QUERIES["customers_k_anonymity"].fn(spark, sf_dir).where(
        F.col("below_k")
    ).orderBy("class_size").show(5)

    print("== DP-released daily histogram (eps=0.5, test-mode noise) ==")
    QUERIES["events_dp_released_counts"].fn(spark, sf_dir).orderBy(
        "event_type", "day"
    ).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
