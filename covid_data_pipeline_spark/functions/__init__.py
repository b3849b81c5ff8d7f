"""Column-level building blocks (pure functions over Columns/DataFrames)."""

from covid_data_pipeline_spark.functions.conform import (  # noqa: F401
    conform,
    parse_timestamp_multi,
    sanitize_column_names,
)
from covid_data_pipeline_spark.functions.scalar import (  # noqa: F401
    bucketize,
    clamped_delta,
    map_values,
    per_100k,
    rate_percent,
    surrogate_key,
)
