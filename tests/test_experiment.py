"""CUPED experiment analysis (operators/experiment.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.experiment import cuped_adjusted_effect


def _units(spark, rows):
    return spark.createDataFrame(
        rows, "unit long, treat boolean, x double, y double"
    )


def test_cuped_matches_reference_and_reduces_variance(spark):
    # Y = 0.8*X + noise + effect*treat: strong pre-period correlation
    rng = random.Random(42)
    true_effect = 5.0
    rows = []
    for i in range(2000):
        treat = i % 2 == 1
        x = rng.gauss(100, 20)
        y = 0.8 * x + rng.gauss(0, 4) + (true_effect if treat else 0.0)
        rows.append((i, treat, round(x, 2), round(y, 2)))
    out = cuped_adjusted_effect(
        _units(spark, rows), "treat", "x", "y"
    ).collect()[0]

    # pure-python reference on the SAME integer-cent quantization
    import math

    q = [(t, math.floor(x * 100), math.floor(y * 100)) for _, t, x, y in rows]
    n = len(q)
    sx = sum(x for _, x, _ in q); sy = sum(y for _, _, y in q)
    sxy = sum(x * y for _, x, y in q); sxx = sum(x * x for _, x, _ in q)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    t_rows = [(x, y) for t, x, y in q if t]
    c_rows = [(x, y) for t, x, y in q if not t]
    raw = sum(y for _, y in t_rows) / len(t_rows) - sum(
        y for _, y in c_rows
    ) / len(c_rows)
    dx = sum(x for x, _ in t_rows) / len(t_rows) - sum(
        x for x, _ in c_rows
    ) / len(c_rows)
    adj = raw - theta * dx

    assert out["n_treat"] == 1000 and out["n_ctrl"] == 1000
    assert abs(out["theta"] - theta) < 1e-5
    assert abs(out["effect_raw_cents"] - raw) < 1e-3
    assert abs(out["effect_cuped_cents"] - adj) < 1e-3
    # strong covariate: most variance explained, and the adjusted
    # estimate lands near the planted truth (a fixed-seed draw can't
    # assert CUPED beats raw pointwise — both are unbiased; CUPED only
    # has lower VARIANCE)
    assert out["var_reduction_pct"] > 80
    assert abs(out["effect_cuped_cents"] - true_effect * 100) < 50


def test_cuped_constant_covariate_degrades_to_raw(spark):
    rows = [(i, i % 2 == 1, 7.0, float(i % 10)) for i in range(100)]
    out = cuped_adjusted_effect(_units(spark, rows), "treat", "x", "y").collect()[0]
    assert out["theta"] is None
    assert out["effect_cuped_cents"] == out["effect_raw_cents"]
    assert out["var_reduction_pct"] == 0.0


def test_cuped_partitioning_invariant(spark):
    rng = random.Random(3)
    rows = [
        (i, rng.random() < 0.5, rng.uniform(0, 50), rng.uniform(0, 50))
        for i in range(500)
    ]
    a = cuped_adjusted_effect(_units(spark, rows), "treat", "x", "y").collect()
    b = cuped_adjusted_effect(
        _units(spark, rows).repartition(13), "treat", "x", "y"
    ).collect()
    assert a == b


def test_cuped_plan_is_single_pass(spark):
    rows = [(i, i % 2 == 0, 1.0 * i, 2.0 * i) for i in range(50)]
    df = cuped_adjusted_effect(_units(spark, rows), "treat", "x", "y")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one aggregation pass in the executed plan: exactly one
    # partial/final HashAggregate pair (AQE prints the pre-adaptive
    # plan below "== Initial Plan ==" — count only the final section)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("HashAggregate") == 2, final
    assert "BatchEvalPython" not in plan


def test_srm_check_detects_and_passes(spark):
    from covid_data_pipeline_spark.operators.experiment import srm_check

    # balanced 1:1 — tiny imbalance must NOT trigger
    ok = spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(1001)], "unit long, treat boolean"
    )
    r = srm_check(ok, "treat").collect()[0]
    assert not r["srm_detected"]
    # exact statistic: (501-500)^2 * 1000 // 1001 = 0
    assert r["chi2_milli"] == 0

    # textbook Pearson value: 60/40 observed at 1:1 → X² = 4.0 exactly
    # ((60-50)²/50 + (40-50)²/50); guards the (r_t+r_c) overstatement bug
    tb = spark.createDataFrame(
        [(i, i < 60) for i in range(100)], "unit long, treat boolean"
    )
    assert srm_check(tb, "treat").collect()[0]["chi2_milli"] == 4000

    # broken assignment (2:1 realized vs 1:1 design) must trigger
    bad = spark.createDataFrame(
        [(i, i % 3 != 0) for i in range(3000)], "unit long, treat boolean"
    )
    assert srm_check(bad, "treat").collect()[0]["srm_detected"]

    # a 9:1 design checked at its OWN ratio passes
    nine_one = spark.createDataFrame(
        [(i, i % 10 != 0) for i in range(5000)], "unit long, treat boolean"
    )
    r2 = srm_check(nine_one, "treat", ratio_treat=9, ratio_ctrl=1).collect()[0]
    assert not r2["srm_detected"]


def test_diff_in_diff_nets_out_shared_trend(spark):
    from covid_data_pipeline_spark.operators.experiment import diff_in_diff

    # everyone drifts +20; treatment adds +5 on top
    rows = []
    for i in range(1000):
        treat = i % 2 == 1
        base = 50.0 + (i % 7)
        rows.append(
            (i, treat, base, base + 20.0 + (5.0 if treat else 0.0))
        )
    df = spark.createDataFrame(rows, "unit long, treat boolean, pre double, post double")
    r = diff_in_diff(df, "treat", "pre", "post").collect()[0]
    assert r["did_cents"] == 500.0            # exactly the planted +5.00
    # the naive post-only comparison would be confounded by nothing here
    # (groups share base), but the pre->post trend (+20) is netted out:
    assert r["treat_post_cents"] - r["treat_pre_cents"] == 2500.0
    assert r["ctrl_post_cents"] - r["ctrl_pre_cents"] == 2000.0
    # partitioning invariance
    r2 = diff_in_diff(df.repartition(11), "treat", "pre", "post").collect()[0]
    assert r == r2


def test_cuped_null_units_excluded_consistently(spark):
    from covid_data_pipeline_spark.operators.experiment import (
        cuped_adjusted_effect,
    )

    clean = [(i, i % 2 == 1, 10.0 + i % 3, 20.0 + i % 5) for i in range(100)]
    dirty = clean + [
        (900, None, 10.0, 20.0),   # NULL assignment: neither arm
        (901, True, None, 20.0),   # NULL covariate
        (902, False, 10.0, None),  # NULL metric
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "unit long, treat boolean, x double, y double"
    )
    a = cuped_adjusted_effect(mk(clean), "treat", "x", "y").collect()
    b = cuped_adjusted_effect(mk(dirty), "treat", "x", "y").collect()
    assert a == b
    assert b[0]["n_treat"] == 50 and b[0]["n_ctrl"] == 50
