"""Load the driver's synthetic testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark rejects
        # ([PARQUET_TYPE_ILLEGAL]); read nanos as long and convert to a
        # microsecond timestamp (testdata is µs-aligned so truncation is
        # lossless and matches DuckDB's µs TIMESTAMP).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every testdata table as a temp view so users can work in
    pure SQL (`spark.sql(...)`) — the engine's interactive/Thrift surface
    (SURVEY.md §3.3: the reference serves Superset through Trino/Thrift
    over the same tables)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
