"""Physical-plan audits: the scale properties the engine promises must be
visible in `.explain("formatted")` — filters reach the parquet scan,
projections prune columns, small dims broadcast, hot paths stay inside
whole-stage codegen, and partitioned warehouse reads prune partitions.
A plan regression here is a 100×-scale performance bug even when results
stay correct."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.registry import QUERIES
from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.sources.writers import Warehouse


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(QUERIES["filter_project"].fn(spark, sf_dir))
    assert "PushedFilters:" in plan
    # At least one real predicate pushed (not an empty list).
    pushed = [
        line for line in plan.splitlines() if "PushedFilters:" in line
    ]
    assert any("IsNotNull" in l or "GreaterThan" in l or "EqualTo" in l for l in pushed)
    # Column pruning: the lineitem scan must not read all 11 columns.
    read_schemas = [l for l in plan.splitlines() if "ReadSchema:" in l]
    assert read_schemas and all(l.count(",") < 10 for l in read_schemas)


def test_small_dim_join_broadcasts(spark, sf_dir):
    plan = plan_of(QUERIES["join_fact_dim"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_mart_analytics_stays_codegen(spark, sf_dir):
    df = QUERIES["mart_analytics"].fn(spark, sf_dir)
    df.collect()  # AQE only annotates codegen spans in the final plan
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()  # simple mode: codegen stages print as "*(n)"
    plan = buf.getvalue()
    assert "*(" in plan
    # The flagship must not fall back to row-at-a-time Python.
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_anti_join_plans_as_hash_anti(spark, sf_dir):
    plan = plan_of(QUERIES["anti_join_customers"].fn(spark, sf_dir))
    assert "LeftAnti" in plan


def test_partition_pruning_on_warehouse_read(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("report_date"),
        F.col("id").alias("v"),
    )
    wh.append(df, "ods.t", partition_by=["report_date"])
    read = wh.read("ods.t").filter(F.col("report_date") == "3")
    plan = plan_of(read)
    # Partition filter must appear as a partition filter (pruned scan),
    # not a post-scan data filter.
    assert "PartitionFilters" in plan
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("report_date" in l for l in pf_lines)


def test_asof_join_is_single_shuffle(spark, sf_dir):
    """The as-of join must plan as union + ONE keyed exchange + window —
    never a range-condition nested-loop join."""
    plan = plan_of(QUERIES["asof_join_clicks_purchases"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # One hash-partitioning exchange on the by-key for the window
    # (formatted mode puts the operator and its arguments on separate
    # lines — count the partitioning specs).
    assert plan.count("hashpartitioning(") == 1


def test_lsh_candidates_never_nested_loop(spark, sf_dir):
    """LSH candidate generation must be an equi-join on the band hash —
    a nested-loop/cartesian plan here is the O(n²) regression the banding
    exists to prevent."""
    plan = plan_of(QUERIES["dedup_minhash"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


@pytest.mark.slow  # full-registry sweep, ~4 min (r11 fast tier)
def test_no_python_row_path_in_declarative_queries(spark, sf_dir):
    """Every query not explicitly built on Pandas UDFs must plan entirely
    JVM-side — a BatchEvalPython/ArrowEvalPython node appearing in a
    'built-ins only' query is the classic silent 10-100× regression."""
    pandas_ok = {"pandas-udf"}
    checked = 0
    for name, spec in QUERIES.items():
        if pandas_ok & set(spec.tags) or "ann-ivf" in spec.tags:
            continue
        plan = plan_of(spec.fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} fell to row-Python"
        assert "ArrowEvalPython" not in plan, f"{name} fell to Arrow-Python UDF"
        assert "MapInPandas" not in plan, f"{name} unexpectedly uses mapInPandas"
        checked += 1
    assert checked >= 50


def test_topk_uses_window_group_limit(spark, sf_dir):
    plan = plan_of(QUERIES["topk_per_group"].fn(spark, sf_dir))
    # Spark pushes row_number <= k into WindowGroupLimit, bounding the
    # sort to k rows per group — the property that makes per-group top-k
    # viable on wide groups at scale.
    assert "WindowGroupLimit" in plan


def test_range_join_is_equi_bucketed_not_nested_loop(spark, sf_dir):
    """time_range_join must plan the bucket trick as an equi hash join
    on (key, bucket) — the naive BETWEEN join would be a
    BroadcastNestedLoopJoin whose cost is |L|x|R| per key."""
    plan = plan_of(QUERIES["range_join_clicks_before_purchase"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_sessionize_reuses_one_shuffle_for_both_windows(spark, sf_dir):
    """lag-flag and running-sum windows share the user_id partitioning;
    the plan must contain exactly one hashpartitioning exchange."""
    plan = plan_of(QUERIES["events_sessionize_batch"].fn(spark, sf_dir))
    assert plan.count("hashpartitioning(") == 1


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Joining a partitioned fact to a filtered dim on the partition
    column must inject a dynamicpruning subquery into the scan's
    PartitionFilters — at warehouse scale this is the difference between
    scanning 3 date partitions and scanning all of them."""
    path = str(tmp_path / "fact_dpp")
    fact = spark.range(10_000).select(
        "id",
        (F.col("id") % 20).cast("string").alias("dt"),
        (F.col("id") * 2).alias("v"),
    )
    fact.write.partitionBy("dt").mode("overwrite").parquet(path)
    dim = spark.createDataFrame(
        [(str(i), "keep" if i < 3 else "drop") for i in range(20)],
        "dt STRING, attr STRING",
    )
    j = (
        spark.read.parquet(path)
        .join(dim.filter(F.col("attr") == "keep"), "dt")
        .agg(F.sum("v").alias("s"))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        j.explain()
    assert "dynamicpruning" in buf.getvalue().lower()


@pytest.mark.slow  # full-registry sweep, ~3.5 min (r11 fast tier)
def test_no_cartesian_product_in_any_registered_query(spark, sf_dir):
    """NO registered query may plan an unconstrained CartesianProduct —
    the one O(n·m) shape that silently survives small-scale testing and
    dies at 100 TB. (BroadcastNestedLoopJoin is allowed where a query
    deliberately crosses against a broadcast single-row/bounded relation
    — totals re-entry, query blocks; CartesianProduct has no such use.)
    Registry-wide, not bench-only: the driver's correctness window and
    any user of queries() runs the full set, so the whole set carries
    the scale guarantee."""
    checked = 0
    for name, spec in QUERIES.items():
        plan = plan_of(spec.fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian"
        checked += 1
    assert checked >= 190


def test_markov_model_reenters_by_broadcast(spark, sf_dir):
    """The |types|^2 transition model must re-enter the per-state
    totals join as a broadcast, and the LAG's user partitioning must
    be the only events-sized shuffle."""
    plan = plan_of(QUERIES["events_markov_transitions"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_assignment_broadcasts_centroids(spark, sf_dir):
    """Every Lloyd scoring pass is a broadcast of k centroids against
    the vector table — never a shuffled join, never a nested loop over
    a non-trivial side."""
    from covid_data_pipeline_spark.operators.clustering import (
        _assign,
        quantize_vectors,
        seed_centroids,
    )

    qv = quantize_vectors(table(spark, sf_dir, "embeddings"))
    cents = seed_centroids(qv, 8)
    plan = plan_of(_assign(qv, cents))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_session_likelihood_single_events_pass(spark, sf_dir):
    """After the compact (user, prev, next) rollup is checkpointed, no
    consumer may re-scan the events parquet: the executed plan must
    contain zero file scans (the one real scan happened at checkpoint
    materialization) and the model join must broadcast."""
    df = QUERIES["events_session_likelihood"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
