"""SnapshotWarehouse: time travel, partition overwrite isolation,
rollback, snapshot expiry."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from covid_data_pipeline_spark.sources.snapshots import SnapshotWarehouse


@pytest.fixture
def sw(spark, tmp_path):
    return SnapshotWarehouse(spark, str(tmp_path / "snapwh"))


def _day(spark, day, values):
    return spark.createDataFrame(
        [(day, k, v) for k, v in values], "d string, k string, v long"
    )


def test_append_creates_versions_and_time_travel(spark, sw):
    v1 = sw.append(_day(spark, "d1", [("a", 1)]), "ods.t", ["d"])
    v2 = sw.append(_day(spark, "d2", [("b", 2)]), "ods.t", ["d"])
    assert (v1, v2) == (1, 2)
    assert sw.read("ods.t").count() == 2
    assert sw.read("ods.t", version=1).count() == 1
    assert {r["d"] for r in sw.read("ods.t", version=1).collect()} == {"d1"}


def test_overwrite_partitions_isolates_history(spark, sw):
    sw.append(_day(spark, "d1", [("a", 1)]), "ods.t", ["d"])
    sw.append(_day(spark, "d2", [("b", 2)]), "ods.t", ["d"])
    # Re-state day d2 (the idempotent re-run) — d1 untouched.
    sw.overwrite_partitions(_day(spark, "d2", [("b", 99), ("c", 100)]), "ods.t", ["d"])
    cur = {(r["d"], r["k"]): r["v"] for r in sw.read("ods.t").collect()}
    assert cur == {("d1", "a"): 1, ("d2", "b"): 99, ("d2", "c"): 100}
    # Time travel still sees the pre-overwrite day.
    old = {(r["d"], r["k"]): r["v"] for r in sw.read("ods.t", version=2).collect()}
    assert old == {("d1", "a"): 1, ("d2", "b"): 2}


def test_replace_and_rollback(spark, sw):
    sw.append(_day(spark, "d1", [("a", 1)]), "dim.t")
    sw.replace(_day(spark, "d1", [("a", 42)]), "dim.t")
    assert [r["v"] for r in sw.read("dim.t").collect()] == [42]
    v = sw.rollback("dim.t", 1)
    assert v == 3  # rollback is a NEW version
    assert [r["v"] for r in sw.read("dim.t").collect()] == [1]
    assert [r["v"] for r in sw.read("dim.t", version=2).collect()] == [42]


def test_partition_pruning_survives_snapshot_read(spark, sw):
    sw.append(_day(spark, "d1", [("a", 1)]), "ods.t", ["d"])
    sw.append(_day(spark, "d2", [("b", 2)]), "ods.t", ["d"])
    df = sw.read("ods.t").filter(F.col("d") == "d2")
    assert [r["k"] for r in df.collect()] == ["b"]


def test_expire_snapshots_removes_dead_files(spark, sw):
    sw.append(_day(spark, "d1", [("a", 1)]), "ods.t", ["d"])
    sw.overwrite_partitions(_day(spark, "d1", [("a", 2)]), "ods.t", ["d"])
    sw.overwrite_partitions(_day(spark, "d1", [("a", 3)]), "ods.t", ["d"])
    deleted = sw.expire_snapshots("ods.t", keep_last=1)
    assert deleted >= 2  # v1+v2's superseded files gone
    assert sw.versions("ods.t") == [3]
    assert [r["v"] for r in sw.read("ods.t").collect()] == [3]
