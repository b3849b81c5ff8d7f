"""Planted-scenario tests for the ordered-funnel operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.funnel import (
    funnel_histogram,
    funnel_stage_times,
)

STAGES = ("view", "click", "purchase")


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), t) for u, m, t in rows],
        "user_id bigint, ts timestamp, event_type string",
    )


def _times(df):
    return {
        r["user_id"]: (r["t0"], r["t1"], r["t2"])
        for r in funnel_stage_times(df, "user_id", "ts", "event_type", STAGES).collect()
    }


def test_complete_chain_takes_first_qualifying_times(spark):
    df = _ev(
        spark,
        [
            (1, 10, "view"),
            (1, 5, "view"),  # earlier view wins t0
            (1, 20, "click"),
            (1, 15, "click"),  # earlier click after t0 wins t1
            (1, 30, "purchase"),
        ],
    )
    t0, t1, t2 = _times(df)[1]
    assert (t0.minute, t1.minute, t2.minute) == (5, 15, 30)


def test_out_of_order_events_do_not_advance(spark):
    # purchase and click BEFORE the first view never count
    df = _ev(spark, [(1, 0, "purchase"), (1, 1, "click"), (1, 2, "view")])
    t0, t1, t2 = _times(df)[1]
    assert t0 is not None and t1 is None and t2 is None


def test_equal_timestamp_does_not_advance(spark):
    # click at exactly the view's timestamp fails the strict > bound
    df = _ev(spark, [(1, 0, "view"), (1, 0, "click"), (1, 1, "purchase")])
    t0, t1, t2 = _times(df)[1]
    assert t0 is not None and t1 is None and t2 is None


def test_missing_middle_stage_blocks_later_ones(spark):
    df = _ev(spark, [(1, 0, "view"), (1, 5, "purchase")])
    t0, t1, t2 = _times(df)[1]
    assert t0 is not None and t1 is None and t2 is None


def test_non_stage_events_and_entrantless_users_ignored(spark):
    df = _ev(spark, [(1, 0, "view"), (1, 1, "error"), (2, 0, "click")])
    times = _times(df)
    assert times[1][0] is not None and times[1][1] is None
    # user 2 never did stage 0: present with all-null chain kept out of histogram
    hist = funnel_histogram(df, "user_id", "ts", "event_type", STAGES)
    assert {(r["stage_reached"], r["users"]) for r in hist.collect()} == {(1, 1)}


def test_max_gap_expires_stale_steps(spark):
    df = _ev(
        spark,
        [
            (1, 0, "view"),
            (1, 90, "click"),  # 90 min > 1h gap: expired
            (2, 0, "view"),
            (2, 30, "click"),
            (2, 200, "purchase"),  # 170 min after click: expired
        ],
    )
    hist = funnel_histogram(
        df, "user_id", "ts", "event_type", STAGES, max_gap="1 HOUR"
    )
    assert {(r["stage_reached"], r["users"]) for r in hist.collect()} == {
        (1, 1),
        (2, 1),
    }


def test_partitioning_invariance(spark):
    rows = [
        (u, u * 7 + i * 13, t)
        for u in range(1, 30)
        for i, t in enumerate(["view", "click", "purchase", "view", "click"])
    ]
    df = _ev(spark, rows)
    a = funnel_histogram(df.repartition(1), "user_id", "ts", "event_type", STAGES)
    b = funnel_histogram(df.repartition(16), "user_id", "ts", "event_type", STAGES)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_codegen_fold_not_python(spark):
    df = _ev(spark, [(1, 0, "view")])
    out = funnel_stage_times(df, "user_id", "ts", "event_type", STAGES)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
