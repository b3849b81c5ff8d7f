"""dds layer: the star schema — dim_location (replace) + fact_covid.

Reference: process_covid_dds.py — sha2 surrogate key over (country, year)
(:34-39), wholesale dim rebuild via createOrReplace (:41-44), composite
left join ODS×dim keeping unmatched rows with NULL key (:60-73), DQ
null-count warning (:75-77), fact partition overwrite (:81-92).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.scalar import surrogate_key
from covid_data_pipeline_spark.operators.relational import (
    dim_join,
    distinct_rows,
    is_empty,
    null_key_count,
)
from covid_data_pipeline_spark.plans import schemas as S
from covid_data_pipeline_spark.sources.writers import Warehouse

log = logging.getLogger(__name__)

FACT_COLUMNS = (
    "report_date",
    "location_key",
    "confirmed",
    "deaths",
    "recovered",
    "active",
    "ingestion_ts",
)


def build_dim_location(population: DataFrame) -> DataFrame:
    """One row per (country, population_year) with a deterministic sha2
    surrogate key — deterministic because the dim is rebuilt every run
    while fact partitions persist (SURVEY.md §7.3)."""
    return distinct_rows(
        population.select(
            surrogate_key("country", "year").alias("location_key"),
            F.col("country").alias("country_name"),
            F.col("year").alias("population_year"),
            F.col("population"),
        )
    )


def build_fact_day(ods_day: DataFrame, dim: DataFrame) -> DataFrame:
    """Left join the day's ODS slice to the dim on the composite
    (country, year) key; unmatched countries keep NULL location_key
    (deliberate — the mart's INNER join drops them later, the fact does
    not lose data)."""
    enriched = ods_day.withColumn("report_year", F.year(F.col("report_date")))
    joined = dim_join(
        enriched,
        dim,
        on=(enriched.country_region == dim.country_name)
        & (enriched.report_year == dim.population_year),
        how="left",
        broadcast_dim=True,  # dim is ~|countries|×|years| rows — tiny
    )
    return joined.select(*[F.col(c) for c in FACT_COLUMNS])


def process_dds(spark: SparkSession, wh: Warehouse, report_date: str) -> bool:
    """DDS stage: rebuild dim wholesale, build the day's fact slice,
    overwrite its partition. Returns False if the ODS day is empty."""
    population = wh.read(S.POPULATION_TABLE)
    dim = build_dim_location(population)
    wh.replace(dim, S.DIM_TABLE)

    ods_day = wh.read(S.ODS_TABLE).filter(
        F.col("report_date") == F.lit(report_date).cast("date")
    )
    if is_empty(ods_day):
        return False

    fact = build_fact_day(ods_day, wh.read(S.DIM_TABLE))
    missing = null_key_count(fact, "location_key")
    if missing:
        log.warning(
            "%d records failed to join (missing population for year)", missing
        )
    wh.overwrite_partitions(fact, S.FACT_TABLE, partition_by=["report_date"])
    return True
