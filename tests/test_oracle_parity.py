"""Every QuerySpec with an oracle must match DuckDB at sf0.001 — a local
mirror of the driver's CORRECTNESS gate (row count + schema +
order-insensitive values)."""

from __future__ import annotations

import pytest

from covid_data_pipeline_spark.harness.oracle import compare
from covid_data_pipeline_spark.harness.registry import QUERIES

_WITH_ORACLE = [name for name, spec in QUERIES.items() if spec.oracle is not None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    compare(QUERIES[name], spark, sf_dir)


def test_oracle_no_hugeint_outputs(sf_dir):
    """The driver's hash layer is dtype-sensitive: DuckDB HUGEINT /
    DECIMAL128 output columns (e.g. an uncast SUM over integers) hash
    differently from Spark's BIGINT even when values are identical —
    the exact artifact behind round 2's tpch_q12 red row. Every oracle
    must CAST such aggregates, so no output column may be int128."""
    import os

    import duckdb

    from covid_data_pipeline_spark.harness.tables import TABLE_NAMES

    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
                )
        offenders = []
        for name, spec in QUERIES.items():
            if spec.oracle is None:
                continue
            schema = con.execute(spec.oracle).arrow().schema
            offenders.extend(
                (name, f.name, str(f.type))
                for f in schema
                if "decimal" in str(f.type) or "128" in str(f.type)
            )
        assert not offenders, f"HUGEINT/int128 oracle outputs: {offenders}"
    finally:
        con.close()


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            assert spec.fn(spark, sf_dir).count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0
    # queries()/oracle_sql() contract: oracle keys ⊆ query keys
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
