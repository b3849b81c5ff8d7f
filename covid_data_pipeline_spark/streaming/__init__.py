"""Structured Streaming layer.

The reference has no streaming (SURVEY.md §2.9) — daily micro-batching is
simulated by an Airflow date cursor (reference covid_to_s3.py:22-45,83-88).
This package is the promised "mechanical readStream adaptation": the same
operators and sinks driven by Structured Streaming micro-batches, plus the
stream-native pieces a large-scale pipeline needs (watermarked windows,
custom stateful processing).
"""

from covid_data_pipeline_spark.streaming.sources import file_stream
from covid_data_pipeline_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = ["file_stream", "tumbling_agg", "sliding_agg", "session_agg"]
