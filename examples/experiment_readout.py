"""Experiment readout: the guard-then-measure flow on the events table.

    python examples/experiment_readout.py [testdata_dir]

What an experimentation platform runs, in order: (1) the SRM chi-square
guard — if assignment is broken, stop; (2) the CUPED variance-reduced
effect; (3) the difference-in-differences view for comparison. All
statistics are exact-integer constructions (see operators/experiment.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.operators.experiment import (
    cuped_adjusted_effect,
    diff_in_diff,
    srm_check,
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
    spark.stop()


if __name__ == "__main__":
    main()
