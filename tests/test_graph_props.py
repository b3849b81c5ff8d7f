"""Property-based tests for the round-4 graph/dedup changes: the
per-partition union-find pre-contraction must be label-invisible on
ARBITRARY graphs (not just the chain fixtures), and connected-components
labels must match a reference union-find on every random edge set."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.graph import connected_components

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=40,
)


def _reference_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Plain Python union-find ground truth: node -> component min."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(max_examples=12, deadline=None)
@given(edges=_edges)
def test_cc_matches_reference_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    expect = _reference_components([e for e in edges if e[0] != e[1]])
    # self-loop-only nodes are absent without nodes= (documented)
    assert got == expect


@settings(max_examples=12, deadline=None)
@given(edges=_edges, parts=st.sampled_from([1, 3, 7]))
def test_pre_contraction_is_label_invisible(spark, edges, parts):
    """pre_contract=True/False must produce identical labels on any
    graph under any partitioning (the contraction is union-preserving,
    so this is the invariant that makes it safe to default on)."""
    df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    with_pc = {
        (r["node"], r["component"])
        for r in connected_components(df, pre_contract=True).collect()
    }
    without_pc = {
        (r["node"], r["component"])
        for r in connected_components(df, pre_contract=False).collect()
    }
    assert with_pc == without_pc
