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


def test_pipeline_runs_on_snapshot_backend(spark, tmp_path):
    """The covid medallion pipeline runs unchanged on SnapshotWarehouse;
    the mart matches the plain-Warehouse run, and a re-run of the final
    day creates a new snapshot whose predecessor is still readable."""
    from covid_data_pipeline_spark.plans import schemas as S
    from covid_data_pipeline_spark.plans.runner import bootstrap_population, run_day
    from covid_data_pipeline_spark.sources.writers import Warehouse
    from tests.covid_fixtures import DAYS, population_df, write_day_csvs

    csv_dir = tmp_path / "csvs"
    csv_dir.mkdir()
    paths = write_day_csvs(str(csv_dir))

    wh_p = Warehouse(spark, str(tmp_path / "wh_plain"))
    wh_s = SnapshotWarehouse(spark, str(tmp_path / "wh_snap"))
    for wh in (wh_p, wh_s):
        bootstrap_population(spark, wh, population_df(spark))
        for day in DAYS:
            run_day(spark, wh, day, csv_path=paths[day], with_alerts=False)

    cols = ["report_date", "country_name", "new_cases_today", "cases_per_100k"]
    got = sorted(map(tuple, wh_s.read(S.MART_TABLE).select(*cols).collect()))
    want = sorted(map(tuple, wh_p.read(S.MART_TABLE).select(*cols).collect()))
    assert got == want and len(want) > 0

    # Idempotent re-run of the last day → same current rows, new version,
    # previous snapshot still readable (time travel across the re-run).
    v_before = wh_s.current_version(S.MART_TABLE)
    run_day(spark, wh_s, DAYS[-1], csv_path=None, with_alerts=False)
    assert wh_s.current_version(S.MART_TABLE) > v_before
    again = sorted(map(tuple, wh_s.read(S.MART_TABLE).select(*cols).collect()))
    assert again == want
    old = sorted(
        map(tuple, wh_s.read(S.MART_TABLE, version=v_before).select(*cols).collect())
    )
    assert old == want


def test_expire_snapshots_removes_dead_files(spark, sw):
    sw.append(_day(spark, "d1", [("a", 1)]), "ods.t", ["d"])
    sw.overwrite_partitions(_day(spark, "d1", [("a", 2)]), "ods.t", ["d"])
    sw.overwrite_partitions(_day(spark, "d1", [("a", 3)]), "ods.t", ["d"])
    deleted = sw.expire_snapshots("ods.t", keep_last=1)
    assert deleted >= 2  # v1+v2's superseded files gone
    assert sw.versions("ods.t") == [3]
    assert [r["v"] for r in sw.read("ods.t").collect()] == [3]
