"""Property-based as-of join: must agree with pandas.merge_asof on
arbitrary (key, time, value) inputs — both sides inclusive-backward."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from covid_data_pipeline_spark.operators.asof import asof_join

_key = st.sampled_from(["a", "b", "c"])
_t = st.integers(min_value=0, max_value=50)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _t), min_size=1, max_size=25),
    right=st.lists(st.tuples(_key, _t, st.integers(0, 100)), max_size=25),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    # Dedup right on (key, t): with duplicate right timestamps the winner
    # is unspecified in both engines — exclude that nondeterminism.
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, t long, lid long"
    )
    rdf = spark.createDataFrame(right, "k string, t long, v long")
    got = {
        r["lid"]: r["v"]
        for r in asof_join(ldf, rdf, on="t", by=["k"]).collect()
    }

    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "t", "lid"]
    ).sort_values("t", kind="stable")
    rpd = pd.DataFrame(right, columns=["k", "t", "v"]).sort_values("t", kind="stable")
    if rpd.empty:
        want = {int(lid): None for lid in lpd["lid"]}
    else:
        merged = pd.merge_asof(lpd, rpd, on="t", by="k", direction="backward")
        want = {
            int(r.lid): (None if pd.isna(r.v) else int(r.v))
            for r in merged.itertuples()
        }
    assert got == want


def test_asof_tiebreak_resolves_duplicate_right_timestamps(spark):
    # Two right rows at the same (key, t): with a tiebreak column the
    # LARGEST tiebreak wins, under any input partitioning.
    ldf = spark.createDataFrame([("a", 10), ("a", 5)], "k string, t long")
    rdf = spark.createDataFrame(
        [("a", 5, 100, 1), ("a", 5, 200, 2), ("a", 5, 150, 3)],
        "k string, t long, v long, seq long",
    )
    for parts in (1, 7):
        out = {
            r["t"]: r["v"]
            for r in asof_join(
                ldf, rdf.repartition(parts), on="t", by=["k"],
                value_cols=["v"], tiebreak="seq",
            ).collect()
        }
        # seq=3 is the last input row -> v=150 carried to both left rows.
        assert out == {5: 150, 10: 150}


def test_asof_tiebreak_outside_value_cols(spark):
    # The tiebreak column need not be attached to the output.
    ldf = spark.createDataFrame([("a", 10)], "k string, t long")
    rdf = spark.createDataFrame(
        [("a", 10, 1, 9), ("a", 10, 2, 11)], "k string, t long, v long, seq long"
    )
    out = asof_join(
        ldf, rdf, on="t", by=["k"], value_cols=["v"], tiebreak="seq"
    ).collect()
    assert [r["v"] for r in out] == [2]
    assert "seq" not in out[0].asDict() and "__tb" not in out[0].asDict()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _t), min_size=1, max_size=20),
    right=st.lists(st.tuples(_key, _t, st.integers(0, 100)), max_size=20),
)
def test_cogroup_twin_matches_column_algebra_asof(spark, left, right):
    from covid_data_pipeline_spark.operators.asof import asof_join_cogroup

    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, t long, lid long"
    )
    rdf = spark.createDataFrame(right, "k string, t long, v long")
    want = {
        (r["lid"],): r["v"]
        for r in asof_join(ldf, rdf, on="t", by=["k"]).collect()
    }
    got = {
        (r["lid"],): r["v"]
        for r in asof_join_cogroup(ldf, rdf, on="t", by=["k"]).collect()
    }
    assert got == want


def test_cogroup_twin_tolerance_and_right_only_keys(spark):
    from covid_data_pipeline_spark.operators.asof import asof_join_cogroup

    ldf = spark.createDataFrame(
        [("a", 10, 0), ("a", 100, 1)], "k string, t long, lid long"
    )
    rdf = spark.createDataFrame(
        [("a", 8, 7), ("zzz", 5, 9)], "k string, t long, v long"
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join_cogroup(
            ldf, rdf, on="t", by=["k"], tolerance=5
        ).collect()
    }
    # t=10 within 5 of 8 → match; t=100 stale → NULL; right-only key dropped
    assert got == {0: 7, 1: None}
