"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``covid_data_pipeline_spark.harness`` — one
QuerySpec per implemented operator from SURVEY.md §2 (plus the
training-data extras), each built from the engine's operator modules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from covid_data_pipeline_spark.harness.registry import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (mart analytics shape: broadcast dim join →
    null-safe rollup → lag-delta window → risk bucketing) at sf0.001."""
    return QUERIES["mart_analytics"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
