"""Dataset statistics report: the round-10 profiling layer end to end.

    python examples/dataset_statistics_report.py [testdata_dir]

The pre-training data audit a table should pass before joining a mix:
(1) per-column Shannon entropy (constants-in-disguise, candidate
partition keys); (2) pairwise Cramér's V (symmetric redundancy between
categorical dims); (3) Theil's U (ASYMMETRIC association — which
column is the derived one, the leakage detector); (4) Jensen-Shannon
divergence of each cohort's distribution vs the corpus mix (bounded
drift, finite on empty bins); (5) Cohen's kappa between two labeling
rules (agreement gate) and McNemar's paired test (is rule A better
than rule B on the same rows); (6) expected calibration error next to
the reliability table; (7) Dunning G² collocations (phrase-mining /
tokenizer seeding); (8) robust median/MAD anomalies and trimmed /
winsorized means (whale-proof location + outlier verdicts). Every number is an exact-integer-lattice
construction replayable in plain SQL — see
operators/{quality,experiment,calibrate,langmodel}.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import quality_score
from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.operators.calibrate import (
    expected_calibration_error,
)
from covid_data_pipeline_spark.operators.experiment import (
    cohens_kappa,
    js_divergence,
    mcnemar_test,
)
from covid_data_pipeline_spark.operators.langmodel import collocations_g2
from covid_data_pipeline_spark.operators.quality import (
    cramers_v_matrix,
    entropy_profile,
    theil_u,
)
from covid_data_pipeline_spark.operators.temporal import (
    robust_zscore,
    trimmed_stats,
)
from covid_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dataset-statistics-report")

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_suppkey",
    )
    print("-- 1. entropy profile: information content per column --")
    entropy_profile(
        li, ["l_returnflag", "l_linestatus", "qty", "l_suppkey"]
    ).orderBy("col_name").show()

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("prio"),
        F.month(F.to_date("o_orderdate")).cast("bigint").alias("omonth"),
        (F.col("o_custkey") % 7).alias("cmod"),
    )
    print("-- 2. Cramér's V: symmetric categorical association --")
    cramers_v_matrix(o, ["status", "prio", "omonth", "cmod"]).orderBy(
        "col_x", "col_y"
    ).show()

    print("-- 3. Theil's U: the derived-column / leakage detector --")
    derived = table(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).alias("digit"),
        F.col("o_orderpriority").alias("prio"),
    )
    theil_u(derived, "digit", "prio").show()

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    print("-- 4. Jensen-Shannon drift: cohorts vs the corpus mix --")
    binned = ev.select(
        "event_type",
        F.least(
            F.lit(9),
            F.greatest(F.lit(0), F.floor(F.col("value") / 50).cast("int")),
        ).alias("bin"),
    )
    js_divergence(binned, "event_type", "bin").orderBy(
        F.col("jsd_nano").desc()
    ).show()

    print("-- 5. Cohen's kappa: do two severity rules agree? --")

    def bucket(v):
        return F.when(v < 25, "low").when(v < 75, "mid").otherwise("high")

    rated = ev.select(
        bucket(F.col("value")).alias("a"),
        bucket(F.col("value") + (F.col("event_id") % 11) - 5).alias("b"),
    )
    cohens_kappa(rated, "a", "b").show()

    print("-- 5b. McNemar: is rater A better than rater B? --")
    paired = ev.select(
        (F.col("value") >= 50).alias("y"),
        (F.col("value") + (F.col("event_id") % 11) - 5 >= 50).alias("a"),
        (F.col("value") + (F.col("event_id") % 7) - 3 >= 50).alias("b"),
    )
    mcnemar_test(paired, "y", "a", "b").show()

    docs = table(spark, sf_dir, "documents")
    print("-- 6. expected calibration error of the quality score --")
    scored = docs.select(
        F.round(quality_score("text") * 1e6, 0).cast("bigint").alias("s"),
        (F.col("lang") == "en").alias("y"),
    )
    expected_calibration_error(scored, "s", "y", bins=10).show()

    print("-- 7. Dunning G² collocations: top phrases --")
    collocations_g2(docs, top_k=10, min_count=5).show(truncate=False)

    print("-- 8. robust anomalies + trimmed means on daily volume --")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    robust_zscore(daily, ["event_type"], "day", "cnt").where(
        "is_outlier"
    ).show()
    trimmed_stats(daily, ["event_type"], "cnt", 1, 10).show()

    spark.stop()


if __name__ == "__main__":
    main()
