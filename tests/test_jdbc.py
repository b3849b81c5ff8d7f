"""JDBC source/sink round-trip (SURVEY.md §2.1 S4 scan / S9 sink) against
embedded Derby — the JDBC driver Spark ships for its Hive metastore, so
the test runs with zero extra dependencies. This is the engine's
replacement for the reference's Trino↔Postgres federation
(population_to_s3.py:61-64, alert_case_spike.sql:1-19)."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.sources.readers import read_jdbc
from covid_data_pipeline_spark.sources.writers import write_jdbc

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/derby_db;create=true"


def test_jdbc_sink_then_scan_roundtrip(spark, sf_dir, tmp_path):
    url = _url(tmp_path)
    props = {"driver": DERBY_DRIVER}
    nation = table(spark, sf_dir, "nation")
    # One connection for a dim-sized write (Derby embedded is single-proc).
    write_jdbc(nation.coalesce(1), url, "nation_jdbc", mode="overwrite", properties=props)
    back = read_jdbc(spark, url, "nation_jdbc", properties=props)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_jdbc_append_is_cumulative(spark, tmp_path):
    url = _url(tmp_path)
    props = {"driver": DERBY_DRIVER}
    df = spark.range(3).select(F.col("id").alias("k"))
    write_jdbc(df.coalesce(1), url, "appender", mode="overwrite", properties=props)
    write_jdbc(df.coalesce(1), url, "appender", mode="append", properties=props)
    assert read_jdbc(spark, url, "appender", properties=props).count() == 6


def test_jdbc_pushdown_reaches_source(spark, sf_dir, tmp_path):
    """A filter on a JDBC scan must be pushed into the source query, not
    evaluated post-transfer (PushedFilters on the JDBC relation)."""
    import io
    from contextlib import redirect_stdout

    url = _url(tmp_path)
    props = {"driver": DERBY_DRIVER}
    region = table(spark, sf_dir, "region")
    write_jdbc(region.coalesce(1), url, "region_jdbc", mode="overwrite", properties=props)
    scan = read_jdbc(spark, url, "region_jdbc", properties=props).filter(
        F.col("r_regionkey") > 2
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "r_regionkey" in plan
    assert scan.count() == region.filter(F.col("r_regionkey") > 2).count()
