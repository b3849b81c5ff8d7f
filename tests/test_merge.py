"""merge_upsert: keyed update/insert with partition-scoped rewrites."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_data_pipeline_spark.sources.writers import Warehouse, merge_upsert


def _rows(spark, rows):
    return spark.createDataFrame(rows, "d string, k long, v string")


def test_merge_upserts_and_inserts(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    merge_upsert(
        wh,
        _rows(spark, [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c")]),
        "ods.t",
        keys=["k"],
        partition_by=["d"],
    )
    merge_upsert(
        wh,
        _rows(spark, [("d1", 2, "B2"), ("d1", 9, "new")]),
        "ods.t",
        keys=["k"],
        partition_by=["d"],
    )
    got = {r["k"]: (r["d"], r["v"]) for r in wh.read("ods.t").collect()}
    assert got == {
        1: ("d1", "a"),  # untouched key in touched partition
        2: ("d1", "B2"),  # updated
        3: ("d2", "c"),  # untouched partition
        9: ("d1", "new"),  # inserted
    }


def test_merge_unpartitioned_full_rewrite(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    merge_upsert(wh, df, "dim.t", keys=["k"])
    merge_upsert(
        wh, spark.createDataFrame([(2, "B")], "k long, v string"), "dim.t", keys=["k"]
    )
    got = {r["k"]: r["v"] for r in wh.read("dim.t").collect()}
    assert got == {1: "a", 2: "B"}


def test_merge_is_idempotent(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    batch = _rows(spark, [("d1", 1, "x"), ("d2", 2, "y")])
    merge_upsert(wh, batch, "ods.t", keys=["k"], partition_by=["d"])
    merge_upsert(wh, batch, "ods.t", keys=["k"], partition_by=["d"])
    assert wh.read("ods.t").count() == 2
