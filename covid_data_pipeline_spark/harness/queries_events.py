"""Event-stream queries over the events table: event-time windows
(tumbling / sliding / session) and JSON prop extraction.

These run the batch/stream-polymorphic window operators from
``streaming/windows.py`` in batch mode against the DuckDB oracle;
stream-vs-batch equivalence for the same operators is asserted in
tests/test_streaming.py. Oracle dialect: DuckDB ``time_bucket`` (with an
origin offset for the sliding variant) and gaps-and-islands SQL for
session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.registry import register, table
from covid_data_pipeline_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)


@register(
    "events_tumbling_window",
    """
    SELECT event_type,
           COUNT(*) AS events_cnt,
           ROUND(SUM(value), 2) AS value_sum,
           time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end
    FROM events
    GROUP BY event_type, time_bucket(INTERVAL '1 hour', ts)
    """,
    tags=("streaming", "window", "tumbling"),
    bench=True,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return tumbling_agg(
        e,
        ts_col="ts",
        duration="1 hour",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("events_cnt"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        ],
    )


@register(
    "events_sliding_window",
    """
    WITH assigned AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '1 hour', ts) AS window_start
      FROM events
      UNION ALL
      SELECT event_type, value,
             time_bucket(INTERVAL '1 hour', ts,
                         INTERVAL '30 minutes') AS window_start
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS events_cnt,
           ROUND(SUM(value), 2) AS value_sum,
           window_start,
           window_start + INTERVAL '1 hour' AS window_end
    FROM assigned
    GROUP BY event_type, window_start
    """,
    tags=("streaming", "window", "sliding"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return sliding_agg(
        e,
        ts_col="ts",
        duration="1 hour",
        slide="30 minutes",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("events_cnt"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        ],
    )


@register(
    "events_session_window",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL '5 minutes'
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           COUNT(*) AS events_cnt,
           MIN(ts) AS window_start,
           MAX(ts) + INTERVAL '5 minutes' AS window_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session"),
    bench=True,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return session_agg(
        e,
        ts_col="ts",
        gap="5 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("events_cnt")],
    )


@register(
    "events_json_props",
    """
    SELECT event_type,
           COUNT(*) AS events_cnt,
           ROUND(AVG(CAST(props->>'$.k' AS BIGINT)), 2) AS k_avg,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS k_max
    FROM events
    GROUP BY event_type
    """,
    tags=("functions", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (beyond the reference — SURVEY.md §2.8 notes
    no JSON functions there; a props/metadata column is table stakes for
    an events pipeline). ``get_json_object`` stays JVM-side."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events_cnt"),
        F.round(F.avg(k), 2).alias("k_avg"),
        F.max(k).alias("k_max"),
    )
