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
