"""Planted-case tests for operators/temporal.py: point-in-time
enrichment tie/no-match semantics, snapshot-diff change taxonomy, and
linear-interpolation arithmetic (values chosen exact in binary)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.temporal import (
    interpolate_daily,
    pit_enrich,
    snapshot_diff,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_pit_enrich_at_or_before_and_ties(spark):
    dim = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 10, "A"),
            (1, _ts("2024-01-03T00:00:00"), 11, "B"),
            # two dim rows at the SAME ts: larger tie id must win
            (1, _ts("2024-01-03T00:00:00"), 12, "C"),
            (2, _ts("2024-01-05T00:00:00"), 13, "Z"),
        ],
        "user_id long, ts timestamp, event_id long, seg string",
    ).withColumn("seg_ts", F.col("ts"))
    fact = spark.createDataFrame(
        [
            (1, _ts("2024-01-02T00:00:00"), 100),  # between A and B -> A
            (1, _ts("2024-01-03T00:00:00"), 101),  # exactly at B/C ts -> C
            (1, _ts("2024-01-04T00:00:00"), 102),  # after -> C
            (2, _ts("2024-01-04T00:00:00"), 103),  # before any dim -> NULL
            (3, _ts("2024-01-04T00:00:00"), 104),  # key absent in dim -> NULL
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = pit_enrich(
        fact,
        dim,
        keys=["user_id"],
        fact_ts="ts",
        dim_ts="ts",
        payload_cols=["seg", "seg_ts"],
        fact_tie="event_id",
        dim_tie="event_id",
    )
    got = {r["event_id"]: r["seg"] for r in out.collect()}
    assert got == {100: "A", 101: "C", 102: "C", 103: None, 104: None}
    assert out.count() == fact.count()  # PIT join never drops/dups facts


def test_pit_enrich_stable_under_repartition(spark):
    dim = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), i, f"s{i}") for i in range(20)],
        "user_id long, ts timestamp, event_id long, seg string",
    )
    fact = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), 999)],
        "user_id long, ts timestamp, event_id long",
    )
    for n in (1, 7):
        out = pit_enrich(
            fact.repartition(n),
            dim.repartition(n),
            keys=["user_id"],
            fact_ts="ts",
            dim_ts="ts",
            payload_cols=["seg"],
            fact_tie="event_id",
            dim_tie="event_id",
        )
        # all 20 dim rows tie on ts; event_id 19 must win deterministically
        assert [r["seg"] for r in out.collect()] == ["s19"]


def test_snapshot_diff_taxonomy(spark):
    old = spark.createDataFrame(
        [(1, 5, None), (2, 7, 70), (3, 9, 90)],
        "k long, a int, b int",
    )
    new = spark.createDataFrame(
        [(1, 5, None), (2, 8, 70), (4, 1, 10)],
        "k long, a int, b int",
    )
    out = snapshot_diff(old, new, keys=["k"], compare_cols=["a", "b"])
    got = {r["k"]: r["change_type"] for r in out.collect()}
    # k=1 unchanged (NULL == NULL is not a change), k=2 update,
    # k=3 delete, k=4 insert
    assert got == {1: "unchanged", 2: "update", 3: "delete", 4: "insert"}
    row4 = out.where("k = 4").first()
    assert row4["old_a"] is None and row4["new_a"] == 1


def test_interpolate_daily_exact_points(spark):
    d = dt.date
    daily = spark.createDataFrame(
        [
            ("x", d(2024, 1, 1), 100),
            # gap 2024-01-02..03 -> 100 + (400-100)*k/3
            ("x", d(2024, 1, 4), 400),
            # gap 2024-01-05 -> midpoint of 400 and 500
            ("x", d(2024, 1, 6), 500),
            ("y", d(2024, 1, 1), 7),  # singleton span: no gaps
        ],
        "key string, day date, v long",
    )
    out = interpolate_daily(daily, keys=["key"], day_col="day", val_col="v")
    rows = {(r["key"], r["day"]): r for r in out.collect()}
    assert len(rows) == 7  # 6 days for x + 1 for y
    assert rows[("x", d(2024, 1, 2))]["interp_value"] == 200.0
    assert rows[("x", d(2024, 1, 3))]["interp_value"] == 300.0
    assert rows[("x", d(2024, 1, 5))]["interp_value"] == 450.0
    assert rows[("x", d(2024, 1, 4))]["interp_value"] == 400.0
    assert rows[("x", d(2024, 1, 4))]["observed"] is True
    assert rows[("x", d(2024, 1, 5))]["observed"] is False
    assert rows[("y", d(2024, 1, 1))]["interp_value"] == 7.0


def test_pit_plan_has_no_inequality_join(spark):
    """The PIT join must not appear as a (broadcast) nested-loop join in
    the physical plan — that is the whole point of the operator."""
    dim = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 1, "A")],
        "user_id long, ts timestamp, event_id long, seg string",
    )
    fact = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), 2)],
        "user_id long, ts timestamp, event_id long",
    )
    out = pit_enrich(
        fact, dim, ["user_id"], "ts", "ts", ["seg"], "event_id", "event_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
