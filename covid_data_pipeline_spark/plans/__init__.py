"""The covid medallion pipeline: raw → ods → dds → data_mart → alerts.

Each stage is a pure function (inputs → DataFrame → sink) over a
:class:`~covid_data_pipeline_spark.sources.writers.Warehouse`, mirroring
the reference's four Spark scripts + four Trino alert SQLs as one
Spark-first engine. ``runner.run_day`` chains them like the reference's
Airflow DAG (covid_to_s3.py:169-173) without the orchestration framework.
"""

from covid_data_pipeline_spark.plans.runner import run_day  # noqa: F401
