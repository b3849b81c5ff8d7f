"""Native Iceberg sink arm (S6/S7/S8 over DataFrameWriterV2).

The container has no iceberg-spark-runtime jar, so these tests verify
the seam honestly: the availability probe answers, the native arm
refuses to construct without the jar, and — when a jar IS present
(a real deployment running this suite) — the three verbs round-trip
with the same semantics the parquet Warehouse encodes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.sources.writers import (
    IcebergWarehouse,
    iceberg_available,
)

SF = "/root/testdata/sf0.001"


def test_probe_answers_and_gate_refuses_without_jar(spark):
    avail = iceberg_available(spark)
    assert isinstance(avail, bool)
    if not avail:
        with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
            IcebergWarehouse(spark, "local")


def test_iceberg_verbs_roundtrip(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("iceberg runtime jar absent in this environment")
    spark.conf.set("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "iwh"))
    wh = IcebergWarehouse(spark, "it")
    o = table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", F.year("o_orderdate").alias("yr")
    )
    wh.append(o.filter("yr = 1995"), "raw.orders", partition_by=["yr"])
    wh.append(o.filter("yr = 1996"), "raw.orders")
    n_95_96 = o.filter("yr in (1995, 1996)").count()
    assert wh.read("raw.orders").count() == n_95_96
    # Dynamic partition overwrite: re-writing 1995 must not touch 1996.
    wh.overwrite_partitions(o.filter("yr = 1995").limit(10), "raw.orders", ["yr"])
    got = dict(
        wh.read("raw.orders").groupBy("yr").count().rdd.collectAsMap()
    )
    assert got[1995] == 10
    assert got[1996] == o.filter("yr = 1996").count()
    # Full replace.
    wh.replace(o.filter("yr = 1997"), "raw.orders", partition_by=["yr"])
    assert wh.read("raw.orders").select("yr").distinct().collect()[0][0] == 1997
