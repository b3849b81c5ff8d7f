"""Interval algebra: merge (union), coverage, and overlap joins.

The reference models time only as a partition-grade `report_date`
column (reference `airflow/dags/scripts/process_covid_data_mart.py:45`); a
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

__all__ = [
    "merge_intervals",
    "merge_intervals_global",
    "interval_coverage",
    "interval_overlap_join",
]


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
    salt: int = 1,
) -> DataFrame:
    """All (a, b) row pairs whose closed intervals overlap, via
    cell-bucketed equi-join (see module docstring). Column names must
    be disjoint between ``a`` and ``b`` (alias before calling). The
    result carries every column of both inputs plus ``overlap`` —
    the length of the intersection (>= 0; 0 means they touch).

    ``salt > 1`` hardens the pathological single-hot-cell case (most
    intervals in ONE cell — a key AQE's skew splitter cannot divide
    further once it is a single map-side key): side a's rows spread
    over ``salt`` sub-keys by a deterministic row hash, side b
    replicates across all of them, and the join runs on
    ``(_cell, _salt)`` — the hot cell's quadratic candidate work is
    unchanged in total but parallelizes across ``salt`` tasks. Each
    pair still meets exactly once (a has one salt, b covers all), so
    results are identical for any salt. Cost: a ``salt``× shuffle
    replication of side b — keep the default 1 for uniform data."""
    if cell_size <= 0:
        raise ValueError(f"cell_size must be positive, got {cell_size}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
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
    join_keys = ["_cell"]
    if salt > 1:
        # position-tagged xxhash64 (null-skip gotcha does not apply:
        # endpoints are non-null by contract)
        ae = ae.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(F.col(a_start), F.col(a_end), F.lit(0x5A17)),
                F.lit(int(salt)),
            ),
        )
        be = be.withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(int(salt) - 1))),
        )
        join_keys.append("_salt")
    joined = ae.join(be, join_keys).where(
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
    return joined.drop(*join_keys).withColumn("overlap", overlap)


def merge_intervals_global(
    df: DataFrame,
    start_col: str,
    end_col: str,
    cell_size: int,
    island_col: str = "island_no",
) -> DataFrame:
    """Keyless (global) interval union WITHOUT a corpus-wide window.

    :func:`merge_intervals` with a constant key funnels every interval
    through one window partition — the single-task pattern this repo
    bans at scale. This variant stays distributed:

    1. merge per START cell (``start div cell_size`` is the window
       key, so each partition sorts only its cell's intervals);
    2. per-cell islands from DIFFERENT cells that overlap/touch become
       edges (via :func:`interval_overlap_join` — cell-bucketed, no
       cross product) and connected components
       (`operators/graph.py`, O(log n) rounds) glue chains that span
       any number of cells;
    3. components roll up to final islands, and ``island_col`` is a
       distributed start-order rank over the merged relation
       (:func:`~covid_data_pipeline_spark.operators.sampling.value_order_rank`
       — range buckets over broadcast min/max + cumsum offsets), so
       even the degenerate sparse case (|islands| ≈ |input|, nothing
       merges) never funnels through a partition-less window.

    Returns ``island_col, start_col, end_col, n_source`` — identical
    rows (and numbering) to ``merge_intervals(df, [const], ...)``:
    final islands are exactly the connected components of the
    closed-interval overlap graph, and disjoint islands have distinct
    starts, so the start rank reproduces the sweep's numbering."""
    if cell_size <= 0:
        raise ValueError(f"cell_size must be positive, got {cell_size}")
    from covid_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    cs = int(cell_size)
    cells = df.withColumn(
        "_cell", F.expr(f"CAST({start_col} AS BIGINT) div {cs}")
    )
    # Lineage-cut the per-cell islands: the stride agg below plus the
    # three downstream consumers (edge sides + node list) would each
    # re-run the windowed merge otherwise.
    per_cell = merge_intervals(
        cells, ["_cell"], start_col, end_col, island_col="_i"
    ).localCheckpoint(eager=False)
    # Deterministic BIGINT node id per per-cell island: dense offsets
    # would need a global window, so use _cell * stride + _i with the
    # stride taken from the max per-cell island count (one tiny agg;
    # collected scalar is the centroid-matrix pattern).
    stride = int(
        per_cell.agg(F.max("_i").alias("m")).collect()[0]["m"] or 0
    ) + 1
    isl = per_cell.select(
        (F.col("_cell") * F.lit(stride) + F.col("_i")).alias("_id"),
        F.col(start_col),
        F.col(end_col),
        "n_source",
    )
    a = isl.select(
        F.col("_id").alias("_ida"),
        F.col(start_col).alias("_sa"),
        F.col(end_col).alias("_ea"),
    )
    b = isl.select(
        F.col("_id").alias("_idb"),
        F.col(start_col).alias("_sb"),
        F.col(end_col).alias("_eb"),
    )
    edges = interval_overlap_join(
        a, b, "_sa", "_ea", "_sb", "_eb", cell_size=cs
    ).where(F.col("_ida") != F.col("_idb")).select("_ida", "_idb")
    comps = connected_components(
        edges, src="_ida", dst="_idb", nodes=isl.select("_id")
    )
    merged = (
        isl.join(comps, isl["_id"] == comps["node"])
        .groupBy("component")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.sum("n_source").alias("n_source"),
        )
    )
    # Disjoint islands have strictly increasing starts (distinct by
    # construction), so a start-order rank reproduces the sweep's
    # numbering exactly; end_col is a never-consulted tiebreaker.
    # value_order_rank consumes its input 3x (min/max agg, bucket
    # counts, final join) — lineage-cut the compact merged relation or
    # the whole merge+CC chain re-runs per consumer.
    from covid_data_pipeline_spark.operators.sampling import (
        value_order_rank,
    )

    ranked = value_order_rank(
        merged.drop("component").localCheckpoint(eager=False),
        start_col,
        end_col,
        rank_col=island_col,
    )
    return ranked.select(island_col, start_col, end_col, "n_source")
