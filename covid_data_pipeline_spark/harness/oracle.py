"""Local DuckDB-oracle runner — a dev-loop mirror of the driver's gate.

Runs a QuerySpec's Spark side and DuckDB side on the same parquet dir and
compares row count, column names, and values order-insensitively. Used by
tests/test_oracle_parity.py so oracle drift is caught before the driver
runs (the driver's CORRECTNESS_r{N}.json is the authoritative gate).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
from pyspark.sql import SparkSession

from covid_data_pipeline_spark.harness.registry import QuerySpec
from covid_data_pipeline_spark.harness.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str, con=None):
    """Run ``sql`` against the parquet views. A caller may pass its own
    fresh ``con`` (one per query) so it can ``con.interrupt()`` a
    runaway query from another thread — a daemon-thread timeout alone
    leaves the DuckDB query burning CPU (r6 ADVICE,
    tools/signed_zero_audit.py). An owned connection is closed here;
    a caller-supplied one is the caller's to close."""
    owned = con is None
    if owned:
        con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE OR REPLACE VIEW {name} AS"
                    f" SELECT * FROM read_parquet('{path}')"
                )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    finally:
        if owned:
            con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        # Integral Decimals (DECIMAL(38,0)/HUGEINT rollups) stay exact:
        # values above 2^53 would lose low bits through float and two
        # genuinely different huge integers could canonicalize equal
        # (r6 ADVICE). Only fractional Decimals route through the float
        # path so Spark DOUBLE vs DuckDB DECIMAL boundaries still
        # canonicalize alike.
        if v == v.to_integral_value():
            return int(v)
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # REPRESENTATION-faithful, like the driver's value hash: compare
        # the shortest repr of the 9-dp-rounded double as a STRING, so
        # -0.0 vs +0.0 (and any other repr-level divergence) fails here
        # before a driver window slot is spent. Round-5 lesson: the old
        # `round(v, 9)` float compared -0.0 == 0.0 as equal while the
        # driver's hash flagged it (embedding_standardize). The 9-dp
        # rounding itself is dev-loop slack; queries already ROUND their
        # float boundaries, so it only absorbs sub-ULP engine noise.
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def compare(spec: QuerySpec, spark: SparkSession, sf_dir: str) -> None:
    """Raise AssertionError on any row-count / schema / value mismatch."""
    assert spec.oracle is not None, f"{spec.name} has no oracle"
    sdf = spec.fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(_norm(v) for v in row) for row in sdf.collect()]

    oracle_cols, oracle_raw = run_oracle(spec.oracle, sf_dir)
    oracle_rows = [tuple(_norm(v) for v in row) for row in oracle_raw]

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"{spec.name}: column mismatch spark={spark_cols} oracle={oracle_cols}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{spec.name}: row count spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    # Order-insensitive: sort both by the name-sorted column projection,
    # like the driver's hash.
    order = [spark_cols.index(c) for c in sorted(spark_cols)]
    o_order = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    # None-safe total order (NULLs from LEAD/LAG etc. can't be compared
    # to floats directly); both sides use the identical key.
    key = lambda t: tuple((v is None, str(type(v).__name__), str(v)) for v in t)  # noqa: E731
    s_sorted = sorted((tuple(r[i] for i in order) for r in spark_rows), key=key)
    o_sorted = sorted((tuple(r[i] for i in o_order) for r in oracle_rows), key=key)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, o_sorted)) if a != b
    ]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
    )
