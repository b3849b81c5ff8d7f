"""Driver/bench harness: testdata loading + the query registry."""

from covid_data_pipeline_spark.harness.registry import (  # noqa: F401
    QUERIES,
    QuerySpec,
    load_tables,
)
