"""Property-based tests for the round-7 spatial/interval operators:
cell-bucketed algorithms must equal plain Python brute force on
ARBITRARY inputs — random intervals for merge/coverage/overlap (both
the keyed sweep and the hierarchical keyless variant) and random
points for the radius join — not just the hand geometries in
tests/test_geo.py / test_intervals.py."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.geo import radius_pairs
from covid_data_pipeline_spark.operators.intervals import (
    interval_overlap_join,
    merge_intervals,
    merge_intervals_global,
)

_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.integers(min_value=0, max_value=60),
    ),
    min_size=1,
    max_size=25,
)

_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=120),
        st.integers(min_value=0, max_value=120),
    ),
    min_size=1,
    max_size=25,
    unique=True,
)


def _ref_merge(rows: list[tuple[int, int]]) -> list[tuple[int, int, int]]:
    """Python sweep: (start, end, n_source) per island, start order."""
    out: list[list[int]] = []
    for s, e in sorted(rows):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return [tuple(i) for i in out]


@settings(max_examples=12, deadline=None)
@given(_intervals)
def test_merge_matches_python_sweep(spark, raw):
    rows = [("k", s, s + ln) for s, ln in raw]
    got = sorted(
        (r["s"], r["e"], r["n_source"])
        for r in merge_intervals(
            spark.createDataFrame(rows, "k STRING, s BIGINT, e BIGINT"),
            ["k"], "s", "e",
        ).collect()
    )
    assert got == _ref_merge([(s, e) for _, s, e in rows])


@settings(max_examples=8, deadline=None)
@given(_intervals, st.integers(min_value=1, max_value=97))
def test_global_merge_matches_python_sweep(spark, raw, cell):
    rows = [(s, s + ln) for s, ln in raw]
    got = sorted(
        (r["s"], r["e"], r["n_source"])
        for r in merge_intervals_global(
            spark.createDataFrame(rows, "s BIGINT, e BIGINT"),
            "s", "e", cell_size=cell,
        ).collect()
    )
    assert got == _ref_merge(rows)


@settings(max_examples=8, deadline=None)
@given(_intervals, _intervals, st.integers(min_value=1, max_value=50))
def test_overlap_join_matches_brute(spark, raw_a, raw_b, cell):
    a_rows = [(i, s, s + ln) for i, (s, ln) in enumerate(raw_a)]
    b_rows = [(j, s, s + ln) for j, (s, ln) in enumerate(raw_b)]
    a = spark.createDataFrame(a_rows, "aid BIGINT, a_s BIGINT, a_e BIGINT")
    b = spark.createDataFrame(b_rows, "bid BIGINT, b_s BIGINT, b_e BIGINT")
    got = sorted(
        (r["aid"], r["bid"], r["overlap"])
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", cell_size=cell
        ).collect()
    )
    want = sorted(
        (i, j, min(ae, be) - max(as_, bs))
        for i, as_, ae in a_rows
        for j, bs, be in b_rows
        if as_ <= be and bs <= ae
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(_points, st.integers(min_value=1, max_value=60))
def test_radius_pairs_matches_brute(spark, pts, radius):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    got = sorted(
        (r["id_a"], r["id_b"], r["dist2"])
        for r in radius_pairs(
            spark.createDataFrame(rows, "id BIGINT, x BIGINT, y BIGINT"),
            "id", "x", "y", radius=radius,
        ).collect()
    )
    r2 = radius * radius
    want = sorted(
        (i, j, (xi - xj) ** 2 + (yi - yj) ** 2)
        for i, xi, yi in rows
        for j, xj, yj in rows
        if i < j and (xi - xj) ** 2 + (yi - yj) ** 2 <= r2
    )
    assert got == want
