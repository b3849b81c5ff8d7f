"""Experiment readout: the guard-then-measure flow on the events table.

    python examples/experiment_readout.py [testdata_dir]

What an experimentation platform runs, in order: (1) the SRM chi-square
guard — if assignment is broken, stop; (2) the CUPED variance-reduced
effect; (3) the difference-in-differences view for comparison; then the
hypothesis-test layer: (4) Welch's t with effect sizes next to the
Mann-Whitney rank test (mean-shift vs distribution-shift views of the
same comparison); (5) Brown-Forsythe — are the arms' spreads even
comparable; (6) Kruskal-Wallis across a k-way segmentation before any
pairwise digging; (7) the CMH year-stratified odds ratio (Simpson's
paradox guard); (8) Wasserstein-1 — how FAR the distribution moved, in
cents. All statistics are exact-integer or integer-lattice
constructions (see operators/experiment.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.operators.experiment import (
    brown_forsythe,
    cmh_stratified,
    cuped_adjusted_effect,
    diff_in_diff,
    kruskal_wallis,
    mann_whitney_u,
    srm_check,
    wasserstein_1d,
    welch_ttest,
)
from covid_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="experiment-readout")
    ev = table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("date")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    units = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(F.to_date("ts") < cut, cents)), F.lit(0)).alias("x"),
            F.coalesce(F.sum(F.when(F.to_date("ts") >= cut, cents)), F.lit(0)).alias("y"),
        )
        .withColumn("treat", F.pmod(F.col("user_id"), F.lit(2)) == 1)
    )

    print("-- 1. SRM guard (run FIRST; a broken ramp voids everything) --")
    srm = srm_check(units, "treat").collect()[0]
    print(srm.asDict())
    if srm["srm_detected"]:
        print("assignment broken: stop here in production")

    print("-- 2. CUPED variance-reduced effect --")
    print(cuped_adjusted_effect(units, "treat", "x", "y", scale=1).collect()[0].asDict())

    print("-- 3. difference-in-differences (non-randomized fallback) --")
    print(diff_in_diff(units, "treat", "x", "y", scale=1).collect()[0].asDict())

    print("-- 4. Welch t + effect size vs the Mann-Whitney rank view --")
    print(welch_ttest(units, "treat", "y").collect()[0].asDict())
    print(
        mann_whitney_u(units.withColumnRenamed("y", "value_cents"))
        .collect()[0]
        .asDict()
    )

    print("-- 5. Brown-Forsythe: are the arms' spreads comparable? --")
    print(brown_forsythe(units, "treat", "y").collect()[0].asDict())

    print("-- 6. Kruskal-Wallis across event-type segments --")
    seg = ev.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    print(kruskal_wallis(seg, "g", "v").collect()[0].asDict())

    print("-- 7. CMH: treat->high-value association, day-stratified --")
    strat = ev.filter(F.col("value").isNotNull()).select(
        F.to_date("ts").alias("s"),
        (F.pmod(F.col("user_id"), F.lit(2)) == 1).alias("t"),
        (F.col("value") >= 50).alias("y"),
    )
    print(cmh_stratified(strat, "s", "t", "y").collect()[0].asDict())

    print("-- 8. Wasserstein-1: how far did the value distribution move --")
    drift = ev.filter(F.col("value").isNotNull()).select(
        (F.pmod(F.col("user_id"), F.lit(2)) == 1).alias("a"),
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    print(wasserstein_1d(drift, "a", "v").collect()[0].asDict())
    spark.stop()


if __name__ == "__main__":
    main()
