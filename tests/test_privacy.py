"""t-closeness (`operators/privacy.py`) on hand-computed fixtures.

The customers_t_closeness oracle row verifies cross-engine equality at
sf0.01; these pin the EMD semantics: ordered-bucket cumulative walk,
missing buckets counted as zero for the class but not globally, and
the exact-integer t verdict."""

from __future__ import annotations

import pytest

from covid_data_pipeline_spark.operators.privacy import t_closeness


def _rows(spark, rows):
    return spark.createDataFrame(rows, "g STRING, b BIGINT")


def test_emd_polarized_classes(spark):
    # global: 4x b0 + 4x b1 -> (0.5, 0.5); class A all b0 -> EMD 0.5
    rows = [("A", 0)] * 4 + [("B", 1)] * 4
    got = {
        r["g"]: (r["class_size"], r["emd"], r["meets_t"])
        for r in t_closeness(_rows(spark, rows), ["g"], "b").collect()
    }
    assert got == {"A": (4, 0.5, False), "B": (4, 0.5, False)}


def test_emd_zero_for_population_mirror(spark):
    # both classes mirror the global distribution exactly -> EMD 0
    rows = [("A", 0), ("A", 1), ("B", 0), ("B", 1)]
    got = {
        r["g"]: (r["emd"], r["meets_t"])
        for r in t_closeness(_rows(spark, rows), ["g"], "b").collect()
    }
    assert got == {"A": (0.0, True), "B": (0.0, True)}


def test_emd_ordered_distance_matters(spark):
    # m=3 buckets; global uniform (2 each). class A = all b0,
    # class B = all b1. A is FARTHER from uniform in EMD terms than B
    # (mass must travel across two bucket steps, not one) even though
    # both are single-bucket classes — the ordering-awareness that
    # variational distance misses.
    rows = [("A", 0), ("A", 0), ("B", 1), ("B", 1), ("C", 2), ("C", 2)]
    got = {r["g"]: r["emd"] for r in
           t_closeness(_rows(spark, rows), ["g"], "b").collect()}
    assert got["A"] == got["C"]  # symmetric extremes
    assert got["A"] > got["B"]
    # hand-check A: per-bucket d scaled by nc*N = 2*6 = 12:
    # d = (2*6-2*2, 0*6-2*2, 0*6-2*2) = (8, -4, -4); cums 8, 4, 0
    # emd = (8+4+0) / ((3-1)*2*6) = 12/24 = 0.5
    assert got["A"] == 0.5


def test_missing_bucket_grid_and_t_flag(spark):
    rows = [("A", 0)] * 9 + [("A", 1)] + [("B", 0)] * 8 + [("B", 1)] * 2
    out = {
        r["g"]: (r["emd"], r["meets_t"])
        for r in t_closeness(
            _rows(spark, rows), ["g"], "b", t_num=1, t_den=10
        ).collect()
    }
    # global (17, 3)/20; A (9,1)/10 -> cum d = 9*20-17*10=10 -> emd
    # 10/(1*10*20) = 0.05 <= 0.1; B (8,2)/10 -> |8*20-17*10|=10 ->
    # 0.05 as well
    assert out == {"A": (0.05, True), "B": (0.05, True)}


def test_bad_args(spark):
    df = _rows(spark, [("A", 0)])
    with pytest.raises(ValueError):
        t_closeness(df, [], "b")
    with pytest.raises(ValueError):
        t_closeness(df, ["g"], "b", t_num=1, t_den=0)
