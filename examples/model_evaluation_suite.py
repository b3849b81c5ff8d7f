"""Model-evaluation suite: the round-9 classifier readout on documents.

    python examples/model_evaluation_suite.py [testdata_dir]

What a curation-pipeline model gate should publish, in order: (1) the
per-class classification report (thresholded counts — precision /
recall / F1 from raw counts); (2) the reliability table + Brier score
(is the score an honest probability?); (3) ROC-AUC via the exact
Mann-Whitney U (threshold-free ranking skill); (4) leave-one-out target
encoding and WOE/IV on the side, showing the supervised feature side of
the same machinery. All exact-integer constructions — see
operators/{retrieval,calibrate,experiment,features}.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import lang_id, quality_score
from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.operators.calibrate import calibration_report
from covid_data_pipeline_spark.operators.experiment import mann_whitney_u
from covid_data_pipeline_spark.operators.features import loo_target_encoding
from covid_data_pipeline_spark.operators.retrieval import (
    classification_report,
)
from covid_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="model-evaluation-suite")
    docs = table(spark, sf_dir, "documents")

    print("-- 1. classification report: lang-id heuristic vs labels --")
    preds = docs.select("lang", lang_id("text").alias("pred"))
    classification_report(preds, "lang", "pred").orderBy("class").show()

    print("-- 2. calibration of quality score as P(english) --")
    scored = docs.select(
        F.round(quality_score("text") * 1e6, 0).cast("bigint").alias("s"),
        (F.col("lang") == "en").alias("y"),
    )
    calibration_report(scored, "s", "y", bins=10).orderBy("bin").show()

    print("-- 3. ROC-AUC (exact Mann-Whitney U) --")
    mann_whitney_u(scored, "y", "s").select(
        F.col("n_treat").alias("n_pos"),
        F.col("n_ctrl").alias("n_neg"),
        "auc",
    ).show()

    print("-- 4. LOO target encoding of source against doc length --")
    enc = loo_target_encoding(
        docs.select("doc_id", "source", F.length("text").alias("len")),
        "source",
        "len",
        prior_weight=10,
    )
    enc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("enc"), 2).alias("avg_enc"),
    ).orderBy("source").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
