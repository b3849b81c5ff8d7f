"""Round-7 operator families in one tour: spatial, interval algebra,
Bloom join pruning, and the AMS F2 sketch.

    python examples/spatial_intervals_sketches.py [testdata_dir]

Everything here is integer-exact (BIGINT micro-degrees / epoch micros /
signed hash sums), which is why each family also ships an
oracle-verified query in the driver contract (`__spark_entry__.py`).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
)
from covid_data_pipeline_spark.operators.dedup import portable_hash31
from covid_data_pipeline_spark.operators.geo import dbscan, radius_pairs
from covid_data_pipeline_spark.operators.intervals import (
    interval_coverage,
    interval_overlap_join,
    merge_intervals,
)
from covid_data_pipeline_spark.operators.sketches import (
    ams_f2_estimate,
    ams_f2_sketch,
)
from covid_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="spatial-intervals-sketches")

    # 1. Spatial: scatter customers into a 0.2-degree box (derived
    #    micro-degree points), find close pairs and density clusters.
    key = F.col("c_custkey").cast("string")
    pts = table(spark, sf_dir, "customer").select(
        "c_custkey",
        (portable_hash31(F.concat(F.lit("lat:"), key)) % 200_001).alias("x"),
        (portable_hash31(F.concat(F.lit("lon:"), key)) % 200_001).alias("y"),
    )
    near = radius_pairs(pts, "c_custkey", "x", "y", radius=5_000)
    print(f"== customer pairs within 5000 micro-deg: {near.count()} ==")
    clusters = dbscan(pts, "c_custkey", "x", "y", eps=4_000, min_pts=4)
    clusters.groupBy("role").count().show()

    # 2. Intervals: per-user activity coverage and overlap with merged
    #    error windows.
    ev = table(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    act = ev.select("user_id", s.alias("s"), (s + F.lit(7_200_000_000)).alias("e"))
    cov = interval_coverage(act, ["user_id"], "s", "e")
    print("== per-user activity coverage (top 5 by covered time) ==")
    cov.orderBy(F.desc("covered")).show(5)
    act_m = merge_intervals(act, ["user_id"], "s", "e").select(
        "user_id", F.col("s").alias("a_s"), F.col("e").alias("a_e")
    )
    err = merge_intervals(
        ev.where(F.col("event_type") == "error").select(
            F.lit(1).alias("g"),
            (s - F.lit(300_000_000)).alias("es"),
            (s + F.lit(300_000_000)).alias("ee"),
        ),
        ["g"], "es", "ee",
    ).select(F.col("es").alias("b_s"), F.col("ee").alias("b_e"))
    hits = interval_overlap_join(
        act_m, err, "a_s", "a_e", "b_s", "b_e", cell_size=3_600_000_000
    )
    print(f"== activity islands overlapping error windows: {hits.count()} ==")

    # 3. Bloom prune: orders of high-balance BUILDING customers.
    members = table(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") >= 9000)
    ).select("c_custkey")
    words = bloom_build(members, "c_custkey", m_words=8, k=3)
    orders = table(spark, sf_dir, "orders")
    maybe = orders.where(bloom_contains(F.col("o_custkey"), words, k=3))
    exact = maybe.join(
        F.broadcast(members),  # bcast: example only — members is tiny here
        maybe["o_custkey"] == members["c_custkey"],
        "left_semi",
    )
    print(
        f"== orders: {orders.count()} -> bloom {maybe.count()} "
        f"-> exact {exact.count()} =="
    )

    # 4. AMS F2: price the events self-join on user_id without running it.
    est = ams_f2_estimate(
        ams_f2_sketch(ev, "user_id", depth=16), depth=16
    ).collect()[0]["f2_est"]
    exact_f2 = (
        ev.groupBy("user_id").count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    print(f"== |events JOIN events ON user_id|: exact {exact_f2}, "
          f"AMS estimate {est:.0f} ==")

    # 5. Exact-lattice PCA: dominant-axis projection of the embeddings
    #    (planted anisotropy via integer dim weights — the synthetic
    #    corpus is near-isotropic).
    from covid_data_pipeline_spark.operators.clustering import (
        pca_power_scores,
    )

    emb = table(spark, sf_dir, "embeddings")
    scores = pca_power_scores(
        emb, dim=64, iters=6, dim_weights=[5, 4, 3, 2] + [1] * 60
    )
    print("== PC1 projection extremes ==")
    scores.orderBy(F.desc("pc1_score")).show(3)

    spark.stop()


if __name__ == "__main__":
    main()
