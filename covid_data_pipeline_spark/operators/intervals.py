"""Interval algebra: merge (union), coverage, and overlap joins.

The reference models time only as a partition-grade `report_date`
column (reference `spark/scripts/process_covid_data_mart.py:45`); a
warehouse that tracks validity windows, sessions, outage windows, or
media segments needs interval operators. Everything here works on
integer interval endpoints (epoch micros by convention) so results are
BIGINT-exact and cross-engine replayable; intervals are CLOSED on both
ends (touching intervals [a,b],[b,c] merge / overlap).

Scale notes
-----------
* :func:`merge_intervals` is the gaps-and-islands idiom: one window
  partitioning per key (running max of prior ends -> break flag ->
  running sum), then an aggregate that reuses the same shuffle — a
  single exchange per call at any scale.
* :func:`interval_overlap_join` never builds the cross product: both
  sides explode to coarse time cells (explode factor = interval length
  / cell_size — pick a cell comparable to typical interval length) and
  equi-join on the cell key. Each overlapping pair is emitted EXACTLY
  once with no distinct: the overlap region starts at
  ``greatest(start_a, start_b)``, which lies in exactly one cell both
  sides cover, and the join keeps only that cell's match. AQE handles
  hot cells like any other skewed equi-join key (or salt the cell for
  pathological single-cell data).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_intervals", "interval_coverage", "interval_overlap_join"]


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    island_col: str = "island_no",
) -> DataFrame:
    """Union overlapping/touching [start, end] intervals per key.

    Returns one row per merged island: ``key_cols + [island_col,
    start_col, end_col, n_source]`` with island_no numbered 1.. in
    start order within each key. Deterministic for any input order
    (window orders on (start, end))."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prior_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prior_max_end.isNull() | (F.col(start_col) > prior_max_end), 1
    ).otherwise(0)
    islands = df.withColumn("_brk", brk).withColumn(
        island_col,
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy(*keys, island_col).agg(
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.count(F.lit(1)).alias("n_source"),
    )


def interval_coverage(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key coverage statistics of the interval union: number of
    disjoint islands, total covered length, and the longest island.
    (Closed-interval convention: an island's length is end - start —
    zero for a degenerate point interval.)"""
    merged = merge_intervals(df, key_cols, start_col, end_col)
    length = F.col(end_col) - F.col(start_col)
    return merged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(length).alias("covered"),
        F.max(length).alias("longest"),
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    cell_size: int,
) -> DataFrame:
    """All (a, b) row pairs whose closed intervals overlap, via
    cell-bucketed equi-join (see module docstring). Column names must
    be disjoint between ``a`` and ``b`` (alias before calling). The
    result carries every column of both inputs plus ``overlap`` —
    the length of the intersection (>= 0; 0 means they touch)."""
    if cell_size <= 0:
        raise ValueError(f"cell_size must be positive, got {cell_size}")
    clash = set(a.columns) & set(b.columns)
    if clash:
        raise ValueError(f"a/b column names must be disjoint, both have: {sorted(clash)}")
    cs = int(cell_size)

    def cells(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_cell",
            F.explode(
                F.sequence(
                    F.expr(f"CAST({s} AS BIGINT) div {cs}"),
                    F.expr(f"CAST({e} AS BIGINT) div {cs}"),
                )
            ),
        )

    ae, be = cells(a, a_start, a_end), cells(b, b_start, b_end)
    joined = ae.join(be, "_cell").where(
        (F.col(b_start) <= F.col(a_end))
        & (F.col(a_start) <= F.col(b_end))
        & (
            F.col("_cell")
            == F.expr(
                f"CAST(greatest({a_start}, {b_start}) AS BIGINT) div {cs}"
            )
        )
    )
    overlap = F.least(F.col(a_end), F.col(b_end)) - F.greatest(
        F.col(a_start), F.col(b_start)
    )
    return joined.drop("_cell").withColumn("overlap", overlap)
