"""Unit tests for the conform layer (SURVEY.md §5 item 3)."""

from __future__ import annotations

from pyspark.sql import types as T

from covid_data_pipeline_spark.functions.conform import (
    conform,
    parse_timestamp_multi,
    sanitize_column_names,
)
from covid_data_pipeline_spark.plans.raw import normalize_raw
from covid_data_pipeline_spark.plans.schemas import TARGET_RAW_SCHEMA


def test_sanitize_column_names(spark):
    df = spark.createDataFrame(
        [(1, 2, 3)], ["Province/State", " Last Update ", "a-b"]
    )
    assert sanitize_column_names(df).columns == ["Province_State", "Last_Update", "a_b"]


def test_conform_fills_missing_with_typed_nulls(spark):
    df = spark.createDataFrame([("France", "10")], ["Country/Region", "Confirmed"])
    out = normalize_raw(df)
    assert [f.name for f in out.schema.fields] == [
        f.name for f in TARGET_RAW_SCHEMA.fields
    ]
    row = out.first()
    assert row["Country_Region"] == "France"
    assert row["Confirmed"] == 10  # string → LONG cast
    assert row["FIPS"] is None and row["Lat"] is None
    assert dict(out.dtypes)["Lat"] == "double"


def test_conform_resolves_aliases(spark):
    df = spark.createDataFrame(
        [("x", 1.25, 2.5)], ["Country/Region", "Latitude", "Longitude"]
    )
    row = normalize_raw(df).first()
    assert row["Lat"] == 1.25 and row["Long_"] == 2.5


def test_multi_format_timestamp_parsing(spark):
    df = spark.createDataFrame(
        [("3/1/2021 10:05",), ("2021-03-01 10:05:00",), ("garbage",), (None,)],
        ["Last_Update"],
    )
    out = df.select(
        parse_timestamp_multi(
            "Last_Update", ("M/d/yyyy H:mm", "yyyy-MM-dd HH:mm:ss")
        ).alias("ts")
    ).collect()
    assert out[0]["ts"] is not None and out[1]["ts"] is not None
    assert out[0]["ts"] == out[1]["ts"].replace(second=0)
    assert out[2]["ts"] is None  # malformed → NULL, not ANSI error
    assert out[3]["ts"] is None


def test_conform_bad_cast_yields_null(spark):
    # ANSI mode would throw on 'notanumber' → LONG; conform must NULL it.
    df = spark.createDataFrame([("x", "notanumber")], ["Country_Region", "Confirmed"])
    assert normalize_raw(df).first()["Confirmed"] is None


def test_conform_is_case_insensitive(spark):
    df = spark.createDataFrame([("x", 5)], ["country_region", "CONFIRMED"])
    row = normalize_raw(df).first()
    assert row["Country_Region"] == "x" and row["Confirmed"] == 5
