"""Portable HLL (operators/sketches.py): accuracy on both estimator
branches, mergeability, partitioning invariance, and DuckDB replay of
registers + estimate (the property that makes the sketch oracle-able).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.sketches import (
    hll_estimate,
    hll_estimate_sql,
    hll_merge,
    hll_oracle_ctes,
    hll_registers,
)


@pytest.fixture(scope="module")
def ids_df(spark):
    # 80k distinct ids in two halves — big enough to leave the
    # linear-counting branch at p=12 (2.5 * 4096 = 10240).
    return spark.range(0, 80_000).select(
        F.col("id"),
        (F.col("id") % 2).alias("half"),
    )


def test_raw_branch_accuracy(spark, ids_df):
    est = hll_estimate(
        hll_registers(ids_df, "id", [], p=12), [], p=12
    ).collect()[0]["distinct_est"]
    # Standard error is 1.04/sqrt(4096) ~ 1.6%; allow 5%.
    assert est > 10_240, "expected the raw-estimate branch"
    assert abs(est - 80_000) / 80_000 < 0.05


def test_small_range_branch_accuracy(spark):
    df = spark.range(0, 500)
    est = hll_estimate(
        hll_registers(df, "id", [], p=12), [], p=12
    ).collect()[0]["distinct_est"]
    # Linear counting at n << m is typically well under 2%.
    assert abs(est - 500) / 500 < 0.05


def test_merge_equals_from_scratch(spark, ids_df):
    """Union of per-half sketches == sketch of the union (mergeability,
    exactly — not approximately)."""
    per_half = hll_registers(ids_df, "id", ["half"], p=10)
    merged = hll_merge(per_half.drop("half"), [])
    direct = hll_registers(ids_df, "id", [], p=10)
    a = {(r["bucket"], r["rho"]) for r in merged.collect()}
    b = {(r["bucket"], r["rho"]) for r in direct.collect()}
    assert a == b


def test_partitioning_invariance(spark, ids_df):
    e1 = hll_estimate(hll_registers(ids_df, "id", [], p=12), [], p=12)
    e2 = hll_estimate(
        hll_registers(ids_df.repartition(23), "id", [], p=12), [], p=12
    )
    assert e1.collect()[0]["distinct_est"] == e2.collect()[0]["distinct_est"]


def test_null_keys_excluded(spark):
    df = spark.range(0, 100).select(
        F.when(F.col("id") < 10, None).otherwise(F.col("id")).alias("id")
    )
    est = hll_estimate(
        hll_registers(df, "id", [], p=12), [], p=12
    ).collect()[0]["distinct_est"]
    assert abs(est - 90) / 90 < 0.05


def test_duckdb_replays_registers_and_estimate(spark, tmp_path, ids_df):
    """The whole point: an independent engine regenerates the identical
    register relation AND the identical rounded estimate."""
    path = str(tmp_path / "ids.parquet")
    ids_df.write.mode("overwrite").parquet(path)
    reg = hll_registers(ids_df, "id", ["half"], p=12)
    est = hll_estimate(reg, ["half"], p=12)
    s_reg = {(r["half"], r["bucket"], r["rho"]) for r in reg.collect()}
    s_est = {(r["half"], r["distinct_est"]) for r in est.collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    ctes = hll_oracle_ctes("t", "id", "half", "half", p=12, prefix="tt")
    d_reg = set(con.execute(f"WITH {ctes} SELECT * FROM tt_reg").fetchall())
    d_est = set(
        con.execute(
            "WITH " + ctes + hll_estimate_sql("tt_reg", "half", p=12)
        ).fetchall()
    )
    con.close()
    assert s_reg == d_reg
    assert s_est == d_est
