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
from pyspark.sql.window import Window

from covid_data_pipeline_spark.functions.scalar import epoch_seconds, round_stable
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


@register(
    "events_variant_props",
    """
    SELECT event_type,
           COUNT(*) AS events_cnt,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           COUNT(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS k_distinct,
           CAST(SUM(CASE WHEN CAST(props->>'$.k' AS BIGINT) > 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS k_gt50
    FROM events
    GROUP BY event_type
    """,
    tags=("functions", "json", "variant"),
    bench=True,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed JSON props (Spark 4 `parse_json` + `variant_get`).

    The scale twin of `events_json_props`: at 100 TB, re-parsing a JSON
    string per extraction (`get_json_object`) pays the full parse cost
    for every path touched. Parsing ONCE into a VARIANT column amortizes
    it — Spark stores the parsed binary form, and every `variant_get`
    is a cheap path lookup (this is the open-sourced Delta/Iceberg
    variant encoding). In a real warehouse the VARIANT column would be
    materialized at ingest; here the parse+extract happens in one
    projection so the plan demonstrates the pattern end-to-end while
    staying whole-stage-codegen'd JVM-side.
    """
    e = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("events_cnt"),
            F.sum("k").alias("k_sum"),
            F.count_distinct(F.col("k")).alias("k_distinct"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("k_gt50"),
        )
    )


@register(
    "range_join_clicks_before_purchase",
    """
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts > p.ts - INTERVAL 6 HOUR
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
      AND c.event_type = 'click'
    """,
    tags=("events", "rangejoin"),
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via `operators/rangejoin.py::time_range_join`:
    clicks in the 6 hours preceding each purchase by the same user.
    Bucketed to a shuffled hash join on (user_id, time bucket) — no
    nested loop; the naive BETWEEN join is O(|purchases| x |clicks|)
    per user and a BroadcastNestedLoopJoin in Spark."""
    from covid_data_pipeline_spark.operators.rangejoin import time_range_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    out = time_range_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="p_ts",
        right_ts="c_ts",
        lower_s=-6 * 3600,
        upper_s=0,
    )
    return out.select("purchase_id", "click_id", "user_id")


@register(
    "events_sessionize_batch",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           CAST(ROUND(EPOCH(MAX(ts) - MIN(ts)), 3) AS DOUBLE) AS duration_s
    FROM sess
    GROUP BY user_id, session_no
    """,
    tags=("events", "session"),
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap): the lag
    -> new-session flag -> running-sum pattern. Both windows share one
    partitioning (user_id), so Catalyst plans a single shuffle + sort
    reused across the two window operators and the final aggregate."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = epoch_seconds("ts")
    gap = ts_s - F.lag(ts_s).over(w)
    flagged = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.max(epoch_seconds("ts")) - F.min(epoch_seconds("ts")),
                3,
            ).alias("duration_s"),
        )
        .select("user_id", "session_no", "n_events", "duration_s")
    )


@register(
    "gapfill_daily_events",
    """
    WITH filtered AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value FROM events
      WHERE EXTRACT(DAY FROM ts) % 5 <> 0
    ),
    daily AS (
      SELECT event_type, day, COUNT(*) AS events_cnt,
             ROUND(SUM(value), 2) AS val_sum
      FROM filtered GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    cal AS (
      SELECT event_type,
             CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    )
    SELECT c.event_type, c.day,
           COALESCE(d.events_cnt, 0) AS events_cnt,
           LAST_VALUE(d.val_sum IGNORE NULLS) OVER (
             PARTITION BY c.event_type ORDER BY c.day) AS filled_value_sum
    FROM cal c LEFT JOIN daily d ON c.event_type = d.event_type AND c.day = d.day
    """,
    tags=("events", "timeseries", "gapfill"),
)
def gapfill_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + forward fill — the time-series resample the
    reference's daily-cursor pipeline implies (a skipped JHU day must
    not break LAG deltas; cf. /root/reference/airflow/dags/covid_to_s3.py
    date-cursor simulation). Gaps are planted deterministically (drop
    days divisible by 5) on both engines.

    Scale shape: the calendar is *derived per group* with
    ``sequence()`` + ``explode`` — rows generated executor-side
    proportional to (groups × days), never a driver-built calendar or a
    cross join against a global date range. The daily rollup feeds two
    subplans (calendar bounds + the fill join) and Catalyst does not
    share subtrees, so it is lineage-cut with ``localCheckpoint(
    eager=False)`` — groups × days rows — to keep the raw-events scan
    single-pass without leaking a cached relation per invocation in a
    long-lived session (a bare ``persist()`` here had no paired
    release; at warehouse scale, stage it to a table instead)."""
    ev = table(spark, sf_dir, "events").where(F.dayofmonth("ts") % 5 != 0)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("events_cnt"),
        F.round(F.sum("value"), 2).alias("val_sum"),
    ).localCheckpoint(eager=False)
    cal = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        cal.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("events_cnt", F.lit(0)).alias("events_cnt"),
            F.last("val_sum", ignorenulls=True).over(w).alias("filled_value_sum"),
        )
    )


@register(
    "moving_avg_7d",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS events_cnt,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS val_cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           ROUND(AVG(events_cnt) OVER w, 2) AS ma7_cnt,
           ROUND(SUM(val_cents) OVER w / (100.0 * COUNT(val_cents) OVER w), 4)
             AS ma7_value
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
    """,
    tags=("events", "timeseries", "window", "range-frame"),
    bench=True,
)
def moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average with a true RANGE (time-interval)
    frame — the COVID smoothing curve (reference mart computes daily
    deltas; any dashboard on top smooths them). RANGE, not ROWS: a
    missing day must shrink the window, not silently widen it to 7
    *present* rows. Spark's rangeBetween needs a numeric ordering key,
    so days become an epoch-day int (datediff) — semantics identical to
    DuckDB's INTERVAL frame. One shuffle: the window reuses the daily
    rollup's event_type partitioning.

    Money is averaged as an integer-cent moving SUM divided by the
    moving COUNT, not AVG of rounded doubles: the average of 2-decimal
    values lands exactly on a .xx5 rounding boundary routinely (e.g.
    1141.86/4 = 285.465), where Spark's HALF_UP and a C-style scaled
    round disagree. Integer cents keep the quotient either exactly on
    the 4-decimal grid or provably far from a boundary."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("events_cnt"),
        F.round(F.sum("value") * 100, 0).cast("long").alias("val_cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        F.round(F.avg("events_cnt").over(w), 2).alias("ma7_cnt"),
        F.round(
            F.sum("val_cents").over(w)
            / (F.lit(100.0) * F.count("val_cents").over(w)),
            4,
        ).alias("ma7_value"),
    )


@register(
    "cohort_retention_weekly",
    """
    WITH days AS (
      SELECT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(day) AS first_day FROM days GROUP BY user_id
    ),
    weekly AS (
      SELECT d.user_id,
             CAST(FLOOR(date_diff('day', DATE '2024-01-01', f.first_day) / 7.0) AS INT)
               AS cohort_week,
             CAST(FLOOR(date_diff('day', DATE '2024-01-01', d.day) / 7.0) AS INT)
               - CAST(FLOOR(date_diff('day', DATE '2024-01-01', f.first_day) / 7.0) AS INT)
               AS week_offset
      FROM days d JOIN firsts f USING (user_id)
    ),
    active AS (
      SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS active_users
      FROM weekly GROUP BY 1, 2
    )
    SELECT a.cohort_week, a.week_offset, a.active_users,
           ROUND(a.active_users * 1.0 / c.active_users, 4) AS retention_pct
    FROM active a
    JOIN active c
      ON c.cohort_week = a.cohort_week AND c.week_offset = 0
    """,
    tags=("events", "cohort"),
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen calendar
    week (weeks indexed from the Monday the corpus starts), retention =
    distinct actives at each week offset over the cohort's week-0 size.

    Scale shape: first-seen and the activity regroup both hash on
    user_id, so the exchange is planned once and reused across the
    aggregate and the join; the per-(cohort, offset) matrix is tiny
    (weeks²), so the week-0 denominator self-join broadcasts. Exact
    countDistinct — at extreme cardinality swap approx_count_distinct
    and drop the oracle."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    origin = F.lit("2024-01-01").cast("date")
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    week = lambda c: F.floor(F.datediff(c, origin) / 7.0).cast("int")  # noqa: E731
    weekly = ev.join(firsts, "user_id").select(
        "user_id",
        week(F.col("first_day")).alias("cohort_week"),
        (week(F.col("day")) - week(F.col("first_day"))).alias("week_offset"),
    )
    active = weekly.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("active_users")
    )
    base = (
        active.filter(F.col("week_offset") == 0)
        .select("cohort_week", F.col("active_users").alias("base_users"))
    )
    # bcast: const calendar-bounded (one row per cohort week)
    return active.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "active_users",
        F.round(F.col("active_users") / F.col("base_users"), 4).alias("retention_pct"),
    )


@register(
    "scd2_user_type_history",
    """
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_change
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, event_type, ts,
             SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS run_no
      FROM flagged
    ),
    hist AS (
      SELECT user_id, CAST(run_no AS BIGINT) AS run_no,
             ANY_VALUE(event_type) AS event_type,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, run_no
    )
    SELECT user_id, run_no, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_no)
             AS valid_to,
           n_events,
           CAST(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_no)
                  IS NULL AS BOOLEAN) AS is_current
    FROM hist
    """,
    tags=("events", "scd2"),
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: collapse each user's event-type stream
    into validity intervals (run-length compaction via the
    gaps-and-islands lag→flag→running-sum pattern), then close each
    interval with the successor's start (LEAD) — NULL/is_current marks
    the open row, exactly how a warehouse dimension records attribute
    history. All three windows and the aggregate share the user_id
    hash partitioning: one exchange, sorts reused."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "is_change",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_no",
        F.sum("is_change").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    hist = runs.groupBy("user_id", "run_no").agg(
        F.any_value("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_no")
    valid_to = F.lead("valid_from").over(w2)
    return hist.select(
        "user_id",
        "run_no",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


@register(
    "ewma_daily_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS val_cents
      FROM events GROUP BY 1, 2
    ),
    rn AS (
      SELECT event_type, day, val_cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    )
    SELECT a.event_type, a.day,
           ROUND(SUM(b.val_cents * POWER(0.5, a.rn - b.rn))
                   / (100.0 * SUM(POWER(0.5, a.rn - b.rn))), 4) AS ewma_value
    FROM rn a
    JOIN rn b ON b.event_type = a.event_type
            AND b.rn BETWEEN a.rn - 9 AND a.rn
    GROUP BY a.event_type, a.day
    """,
    tags=("events", "timeseries", "ewma"),
)
def ewma_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (decay ½, last 10 rows) of
    daily event value — the low-lag smoother next to moving_avg_7d's
    flat window. Spark side: windowed collect_list + one codegen'd
    aggregate fold (no self-join, one event_type shuffle reused from
    the rollup); the oracle states the same sum as a bounded rn
    self-join, which is formulation-independent.

    Cross-engine float safety by construction: daily values are integer
    cents, decay powers 0.5^k are exact dyadics, and every partial sum
    of cents×0.5^k fits the 53-bit significand (term span ≤ 2^9), so
    BOTH engines compute bit-identical sums in ANY order — no
    summation-order hazard even before the ROUND guard."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("long").alias("val_cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-9, Window.currentRow)
    )
    hist = daily.withColumn("hist", F.collect_list("val_cents").over(w))
    L = F.size("hist")
    idx = F.sequence(F.lit(0), L - 1)
    num = F.aggregate(
        F.zip_with(
            F.col("hist"),
            idx,
            lambda v, i: v * F.pow(F.lit(0.5), (L - 1 - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(idx, lambda i: F.pow(F.lit(0.5), (L - 1 - i).cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return hist.select(
        "event_type",
        "day",
        F.round(num / (F.lit(100.0) * den), 4).alias("ewma_value"),
    )


@register(
    "skew_profile_events",
    """
    WITH counts AS (
      SELECT user_id, COUNT(*) AS key_rows FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT SUM(key_rows) AS total_rows, COUNT(*) AS n_keys FROM counts
    )
    SELECT c.user_id, c.key_rows,
           CAST(FLOOR(c.key_rows * 10000.0 / t.total_rows) AS BIGINT)
             AS pct_bp,
           CAST(FLOOR(c.key_rows * t.n_keys * 1.0 / t.total_rows * 10000.0)
                AS BIGINT) AS skew_bp,
           (c.key_rows * t.n_keys * 1.0 / t.total_rows) >= 10.0 AS is_hot
    FROM counts c, tot t
    ORDER BY c.key_rows DESC, c.user_id
    LIMIT 20
    """,
    tags=("scale", "skew", "diagnostic"),
    bench=True,
)
def skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of the events join key
    (`operators/scale.py::skew_profile`): the measurement that decides
    between plain shuffle, AQE skew-split, and explicit salting before a
    100 TB join. Global totals re-enter as a broadcast single row — no
    full-key-set window."""
    from covid_data_pipeline_spark.operators.scale import skew_profile

    ev = table(spark, sf_dir, "events")
    return skew_profile(ev, keys=["user_id"], top_n=20, hot_multiple=10.0)


@register(
    "rolling_distinct_users_7d",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    cal AS (SELECT DISTINCT day FROM du)
    SELECT c.day, COUNT(DISTINCT d.user_id) AS users_7d
    FROM cal c
    JOIN du d ON d.day BETWEEN c.day - INTERVAL 6 DAY AND c.day
    GROUP BY c.day
    """,
    tags=("events", "window", "distinct", "rolling"),
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per active day — the sliding
    COUNT(DISTINCT) a window frame cannot express (distinct isn't
    algebraic, so no RANGE frame applies).

    Scale shape: dedupe to (day, user) pairs first (one shuffle, corpus
    collapses to active-pairs), then each pair contributes to the <= 7
    target days it covers via a bounded ``sequence`` explode — a
    fan-out of exactly the window length, NOT a self-join of the event
    table — and one distinct-aggregate per target day. The oracle
    states the declarative interval self-join; the explode form is the
    same relation with work proportional to pairs x window days.
    """
    ev = table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    cal = du.select("day").distinct()
    contrib = du.withColumn(
        "target_day",
        F.explode(F.expr("sequence(day, date_add(day, 6))")),
    )
    return (
        contrib.join(cal.withColumnRenamed("day", "target_day"), "target_day")
        .groupBy("target_day")
        .agg(F.count_distinct("user_id").alias("users_7d"))
        .select(F.col("target_day").alias("day"), "users_7d")
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    counts AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, transitions,
           CAST(ROUND(transitions * 1.0 /
                      SUM(transitions) OVER (PARTITION BY prev_type), 4)
                AS DOUBLE) AS p_next
    FROM counts
    """,
    tags=("events", "markov", "transitions"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: per-user event
    sequences (LAG over one user_id shuffle) reduced to (prev → next)
    counts and row-normalized probabilities — the Markov-chain view of
    user behavior. The normalizing window runs over the 25-row counts
    relation, not the corpus."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("transitions"))
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "transitions",
        F.round(
            F.col("transitions") * 1.0 / F.sum("transitions").over(wp), 4
        ).alias("p_next"),
    )


@register(
    "rolling_distinct_users_7d_hll",
    None,
    tags=("events", "window", "distinct", "rolling", "sketch"),
    rows_only_reason=(
        "HLL sketch state is engine-internal; the exact twin "
        "rolling_distinct_users_7d is oracle-green and the sketch's "
        "relative error is bounded against it in pytest"
    ),
)
def rolling_distinct_users_7d_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-merging twin of `rolling_distinct_users_7d`: one
    HyperLogLog sketch per day (single corpus aggregation), then the
    trailing-7-day union merges SKETCHES — seven fixed-size binary
    blobs per output day — instead of fanning out (day, user) pairs.

    This is the 100 TB path for sliding distinct: corpus touched once,
    window arithmetic on |days| x window sketch rows (KBs), and the
    same day-sketches serve any window length or calendar re-bucketing
    without another corpus pass. Mergeability is the whole point of the
    datasketches representation (`hll_union_agg` over pre-aggregated
    `hll_sketch_agg` state). Estimates are within the standard HLL
    error of the exact twin (asserted in tests); no oracle because the
    sketch binary is engine-specific.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    cal = daily.select("day")
    contrib = daily.withColumn(
        "target_day", F.explode(F.expr("sequence(day, date_add(day, 6))"))
    )
    return (
        contrib.join(cal.withColumnRenamed("day", "target_day"), "target_day")
        .groupBy("target_day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("users_7d_est"))
        .select(F.col("target_day").alias("day"), "users_7d_est")
    )


def _hll7d_oracle() -> str:
    from covid_data_pipeline_spark.operators.sketches import (
        hll_estimate_sql,
        hll_oracle_ctes,
    )

    ctes = hll_oracle_ctes(
        "events", "user_id", "CAST(ts AS DATE)", "day", p=12, prefix="h7"
    )
    est = hll_estimate_sql("h7_merged", "target_day", "users_7d_est", p=12)
    return f"""
    WITH {ctes},
    h7_cal AS (SELECT DISTINCT day FROM h7_reg),
    h7_contrib AS (
      SELECT c.day AS target_day, r.bucket, r.rho
      FROM h7_reg r JOIN h7_cal c
        ON c.day BETWEEN r.day AND r.day + INTERVAL 6 DAY
    ),
    h7_merged AS (
      SELECT target_day, bucket, MAX(rho) AS rho
      FROM h7_contrib GROUP BY target_day, bucket
    )
    SELECT target_day AS day, users_7d_est FROM ({est})
    """


@register(
    "rolling_distinct_users_7d_hll_portable",
    _hll7d_oracle(),
    tags=("events", "window", "distinct", "rolling", "sketch", "portable"),
    bench=True,
)
def rolling_distinct_users_7d_hll_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Portable-HLL twin of `rolling_distinct_users_7d_hll`: the same
    sketch-merging shape (one corpus pass builds per-day registers;
    the trailing-7-day union merges REGISTERS, never re-touching the
    corpus), but built from `operators/sketches.py` — md5-prefix
    hashing, exact-integer rho/harmonic arithmetic — so the whole
    sketch pipeline replays bit-identically in DuckDB and the driver
    VALUE-HASHES the estimates instead of recording a rows-only check.
    This upgrades distinct-sketching from "error-bounded in pytest" to
    oracle-verified, the same integer-lattice recipe that upgraded
    MinHash/IVF/PQ (r4/r5). The datasketches twin stays as the
    production binary-state path; estimates differ between the two
    only by hash family.

    Scale shape: register relation is |days| x 4096 rows max (sparse);
    the 7-day fan-out explodes registers, not (day, user) pairs — at
    100 TB the corpus is touched exactly once."""
    from covid_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = table(spark, sf_dir, "events")
    reg = hll_registers(
        ev.select(F.to_date("ts").alias("day"), "user_id"),
        "user_id",
        ["day"],
        p=12,
    )
    cal = reg.select("day").distinct()
    contrib = reg.withColumn(
        "target_day", F.explode(F.expr("sequence(day, date_add(day, 6))"))
    ).drop("day")
    merged = hll_merge(
        contrib.join(
            cal.withColumnRenamed("day", "target_day"), "target_day"
        ),
        ["target_day"],
    )
    est = hll_estimate(merged, ["target_day"], p=12, out_col="users_7d_est")
    return est.select(F.col("target_day").alias("day"), "users_7d_est")


@register(
    "users_overlap_theta",
    """
    WITH th_uh AS (
      SELECT DISTINCT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    th_rk AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rnk
      FROM th_uh
    ),
    th_sk AS (SELECT event_type, h FROM th_rk WHERE rnk <= 64),
    th_n AS (
      SELECT event_type, COUNT(*) AS n_kept FROM th_sk GROUP BY event_type
    ),
    th_theta AS (
      SELECT s.event_type,
             COALESCE(MAX(CASE WHEN n.n_kept >= 64 THEN s.h END),
                      1152921504606846976) AS theta
      FROM th_sk s JOIN th_n n USING (event_type)
      GROUP BY s.event_type
    ),
    th_common AS (
      SELECT a.event_type AS group_a, b.event_type AS group_b,
             LEAST(ta.theta, tb.theta) AS theta, COUNT(*) AS n_common
      FROM th_sk a
      JOIN th_sk b ON a.h = b.h AND a.event_type < b.event_type
      JOIN th_theta ta ON ta.event_type = a.event_type
      JOIN th_theta tb ON tb.event_type = b.event_type
      WHERE a.h < LEAST(ta.theta, tb.theta)
      GROUP BY a.event_type, b.event_type, LEAST(ta.theta, tb.theta)
    )
    SELECT group_a, group_b, n_common,
           ROUND(CAST(n_common AS DOUBLE) * 1152921504606846976.0
                 / CAST(theta AS DOUBLE), 4) AS overlap_est
    FROM th_common
    """,
    tags=("events", "sketch", "theta", "overlap", "portable"),
)
def users_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between every pair of event types from
    KMV/theta sketches (`operators/sketches.py::bottomk_hashes` +
    `theta_pair_overlap`) — the "how many users did BOTH a and b"
    audience question that exact COUNT DISTINCT needs a corpus pass
    PER PAIR to answer; the sketch answers all pairs from one corpus
    pass + |groups|^2 x k sketch-row work. k = 64 keeps the estimator
    active even at dev scale (theta below the full hash space), so
    the oracle gate verifies the estimating branch, not a degenerate
    exact path. Everything up to the final division is exact integers
    (md5-prefix hashes, order-stat theta, common-hash counts), so the
    DuckDB replay hash-matches."""
    from covid_data_pipeline_spark.operators.sketches import (
        bottomk_hashes,
        theta_pair_overlap,
    )

    ev = table(spark, sf_dir, "events")
    sk = bottomk_hashes(ev, "user_id", ["event_type"], k=64)
    return theta_pair_overlap(sk, "event_type", k=64)


@register(
    "events_value_quantiles_sketch",
    """
    WITH qs_s AS (
      SELECT event_type, event_id, value,
             CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL
    ),
    qs_rk AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY h, event_id) AS srn
      FROM qs_s
    ),
    qs_sm AS (SELECT * FROM qs_rk WHERE srn <= 2048),
    qs_vr AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS vrn,
             COUNT(*) OVER (PARTITION BY event_type) AS ns
      FROM qs_sm
    )
    SELECT event_type,
           CAST(MAX(ns) AS BIGINT) AS n_sample,
           MAX(CASE WHEN vrn = (ns * 1 + 1) // 2 THEN value END) AS p50,
           MAX(CASE WHEN vrn = (ns * 9 + 9) // 10 THEN value END) AS p90,
           MAX(CASE WHEN vrn = (ns * 99 + 99) // 100 THEN value END) AS p99
    FROM qs_vr GROUP BY event_type
    """,
    tags=("events", "sketch", "quantile", "portable"),
)
def events_value_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p90/p99 of event value from a deterministic
    bottom-k ROW sample (`operators/sketches.py::hash_sample_quantiles`)
    — the portable, oracle-verifiable counterpart of
    `approx_percentile`-style sketches (whose KLL state is
    engine-internal, see approx_sketch_stats). Sample membership is a
    pure function of the event_id hash (uniform, partition-invariant,
    mergeable by union + re-trim), quantile ranks are exact integer
    order statistics, and the estimate is a REAL data value passed
    through untouched — nothing floats, so both engines hash-match.
    Scale shape: WindowGroupLimit keeps <= k rows per group during the
    sample pass; the corpus is read once."""
    from covid_data_pipeline_spark.operators.sketches import (
        hash_sample_quantiles,
    )

    ev = table(spark, sf_dir, "events")
    return hash_sample_quantiles(
        ev, "event_id", "value", ["event_type"], k=2048
    )


@register(
    "events_cm_user_freq",
    """
    WITH cm_rows AS (
      SELECT CAST(user_id AS VARCHAR) AS k, d.d AS d
      FROM events CROSS JOIN range(4) d(d)
      WHERE user_id IS NOT NULL
    ),
    cm_sk AS (
      SELECT d,
             CAST(concat('0x', substr(md5(concat(CAST(d AS VARCHAR), ':', k)),
                                      1, 15)) AS BIGINT) % 1024 AS slot,
             COUNT(*) AS cnt
      FROM cm_rows GROUP BY d, slot
    ),
    cm_probe AS (
      SELECT DISTINCT user_id FROM events
      WHERE user_id IS NOT NULL AND user_id % 13 = 0
    ),
    cm_exact AS (
      SELECT user_id, COUNT(*) AS exact_cnt FROM events
      WHERE user_id IS NOT NULL AND user_id % 13 = 0 GROUP BY user_id
    ),
    cm_pd AS (
      SELECT p.user_id, d.d AS d,
             CAST(concat('0x', substr(md5(concat(CAST(d.d AS VARCHAR), ':',
                                                 CAST(p.user_id AS VARCHAR))),
                                      1, 15)) AS BIGINT) % 1024 AS slot
      FROM cm_probe p CROSS JOIN range(4) d(d)
    ),
    cm_est AS (
      SELECT pd.user_id, MIN(COALESCE(s.cnt, 0)) AS freq_est
      FROM cm_pd pd LEFT JOIN cm_sk s ON s.d = pd.d AND s.slot = pd.slot
      GROUP BY pd.user_id
    )
    SELECT e.user_id, x.exact_cnt, e.freq_est
    FROM cm_est e JOIN cm_exact x USING (user_id)
    """,
    tags=("events", "sketch", "countmin", "portable"),
)
def events_cm_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point-frequency estimates
    (`operators/sketches.py::cm_sketch`/`cm_lookup`) for a
    deterministic probe set of users (user_id % 13 == 0), alongside the
    exact counts — completing the oracle-verified sketch toolbox:
    HLL (distinct), KMV/theta (set overlap), bottom-k sample
    (quantiles), Misra-Gries (top-k), count-min (any-key frequency).
    Every counter and the min-over-depth lookup are exact integers with
    portable md5 hashing, so the whole sketch hash-matches the DuckDB
    replay; width=1024 keeps collisions live at dev scale so the
    CM overestimate property (freq_est >= exact, asserted in tests) is
    exercised, not degenerate. Scale shape: sketch = one
    explode(4) + map-side-combining aggregate, 4096 counter rows
    forever; probes join counters, never the corpus."""
    from covid_data_pipeline_spark.operators.sketches import (
        cm_lookup,
        cm_sketch,
    )

    ev = table(spark, sf_dir, "events")
    sk = cm_sketch(ev, "user_id", depth=4, width=1024)
    probes = (
        ev.where(F.col("user_id").isNotNull() & (F.col("user_id") % 13 == 0))
        .select("user_id")
        .distinct()
    )
    est = cm_lookup(sk, probes, "user_id", depth=4, width=1024)
    exact = (
        ev.where(F.col("user_id").isNotNull() & (F.col("user_id") % 13 == 0))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return est.join(exact, "user_id").select(
        "user_id", "exact_cnt", "freq_est"
    )


@register(
    "daily_active_buyers",
    """
    WITH per_user AS (
      SELECT CAST(ts AS DATE) AS day, user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
      FROM events
      GROUP BY 1, 2
    )
    SELECT day,
           COUNT(*) AS active_users,
           CAST(SUM(clicked) AS BIGINT) AS clickers,
           CAST(SUM(bought) AS BIGINT) AS buyers,
           CAST(SUM(clicked * bought) AS BIGINT) AS click_and_buy
    FROM per_user
    GROUP BY day
    """,
    tags=("events", "funnel", "intersection"),
)
def daily_active_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day audience intersection: users who clicked, bought, and
    did BOTH — the set-intersection metric computed as conditional
    flags in ONE (day, user) aggregation instead of two distinct sets
    joined (which would shuffle the corpus twice and intersect
    per-day). Flags reduce map-side; the second aggregate runs over
    |users x days| rows."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy(
        F.to_date("ts").alias("day"), "user_id"
    ).agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "clicked"
        ),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "bought"
        ),
    )
    return per_user.groupBy("day").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.sum("clicked").alias("clickers"),
        F.sum("bought").alias("buyers"),
        F.sum(F.col("clicked") * F.col("bought")).alias("click_and_buy"),
    )


@register(
    "funnel_ordered_steps",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL '24 hours' GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s2.t2 + INTERVAL '24 hours' GROUP BY e.user_id)
    SELECT * FROM (
      SELECT CAST(1 AS INTEGER) AS stage_reached,
             (SELECT COUNT(*) FROM s1) - (SELECT COUNT(*) FROM s2) AS users
      UNION ALL
      SELECT CAST(2 AS INTEGER),
             (SELECT COUNT(*) FROM s2) - (SELECT COUNT(*) FROM s3)
      UNION ALL
      SELECT CAST(3 AS INTEGER), (SELECT COUNT(*) FROM s3)
    ) WHERE users > 0
    """,
    tags=("events", "funnel", "sequence"),
    bench=True,
)
def funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel with a 24h max gap per
    step: users whose FURTHEST strictly-time-ordered stage is 1, 2, or
    3. Unlike ``daily_active_buyers`` (set intersection), order and
    recency matter: a purchase BEFORE the first view->click chain, or
    more than 24h after it, does not count. One filtered shuffle on
    user_id + codegen'd fold (operators/funnel.py) vs the oracle's
    k-1 stepwise self-joins — the plan that survives 100 TB."""
    from covid_data_pipeline_spark.operators.funnel import funnel_histogram

    ev = table(spark, sf_dir, "events")
    return funnel_histogram(
        ev,
        "user_id",
        "ts",
        "event_type",
        ("view", "click", "purchase"),
        max_gap="24 HOURS",
    ).filter(F.col("users") > 0)


@register(
    "events_daily_trend",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(day - DATE '1970-01-01') AS sx,
             SUM(cnt) AS sy,
             SUM((day - DATE '1970-01-01') * cnt) AS sxy,
             SUM((day - DATE '1970-01-01') * (day - DATE '1970-01-01')) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           ROUND((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0
             AS slope_per_day
    FROM m
    """,
    tags=("events", "trend", "regression"),
)
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of daily volume (events/day drift) —
    the monitoring regression a pipeline runs to catch decaying or
    exploding sources.

    Float policy: NOT `regr_slope` — both engines implement it with
    Welford-style running covariance whose accumulation order differs
    across partitionings/engines. Instead the closed form is computed
    from EXACT integer moments (epoch-day x, count y: every sum and
    product is an exactly-representable integer < 2^53), so the single
    final division is bit-identical everywhere. Two map-side-combining
    shuffles: (type, day) rollup, then 5-group moment agg."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    x = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum("cnt").alias("sy"),
        F.sum(x * F.col("cnt")).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        round_stable(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            ),
            6,
        ).alias("slope_per_day"),
    )


@register(
    "funnel_sessionized",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL '30 minutes'
                  THEN 0 ELSE 1 END AS new_session
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    s1 AS (
      SELECT user_id, session_no, MIN(ts) AS t1 FROM sess
      WHERE event_type = 'view' GROUP BY user_id, session_no),
    s2 AS (
      SELECT e.user_id, e.session_no, MIN(e.ts) AS t2 FROM sess e
      JOIN s1 ON e.user_id = s1.user_id AND e.session_no = s1.session_no
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id, e.session_no),
    s3 AS (
      SELECT e.user_id, e.session_no, MIN(e.ts) AS t3 FROM sess e
      JOIN s2 ON e.user_id = s2.user_id AND e.session_no = s2.session_no
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id, e.session_no)
    SELECT * FROM (
      SELECT CAST(1 AS INTEGER) AS stage_reached,
             (SELECT COUNT(*) FROM s1) - (SELECT COUNT(*) FROM s2) AS sessions_cnt
      UNION ALL
      SELECT CAST(2 AS INTEGER),
             (SELECT COUNT(*) FROM s2) - (SELECT COUNT(*) FROM s3)
      UNION ALL
      SELECT CAST(3 AS INTEGER), (SELECT COUNT(*) FROM s3)
    ) WHERE sessions_cnt > 0
    """,
    tags=("events", "funnel", "session"),
)
def funnel_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SESSION ordered funnel: view -> click -> purchase completed
    within one 30-min-gap session (the product-analytics default, where
    cross-day conversions are separate journeys). Sessionization is the
    gaps-and-islands pattern; the funnel fold then groups by the
    composite (user_id, session_no) key — Catalyst reuses the user_id
    hash partitioning for the composite groupBy (subset rule), so the
    corpus shuffles ONCE for windows and fold together."""
    from covid_data_pipeline_spark.operators.funnel import funnel_histogram

    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = epoch_seconds("ts")
    gap = ts_s - F.lag(ts_s).over(w)
    sess = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        funnel_histogram(
            sess,
            ["user_id", "session_no"],
            "ts",
            "event_type",
            ("view", "click", "purchase"),
        )
        .withColumnRenamed("users", "sessions_cnt")
        .filter(F.col("sessions_cnt") > 0)
    )


@register(
    "funnel_conversion_lag",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id),
    lag_s AS (
      SELECT CAST(FLOOR(date_part('epoch', s3.t3)
                        - date_part('epoch', s1.t1)) AS BIGINT) AS lag_s
      FROM s3 JOIN s1 ON s3.user_id = s1.user_id),
    by_lag AS (SELECT lag_s, COUNT(*) AS cnt FROM lag_s GROUP BY lag_s),
    cum AS (
      SELECT lag_s,
             SUM(cnt) OVER (ORDER BY lag_s ROWS UNBOUNDED PRECEDING) AS c,
             (SELECT SUM(cnt) FROM by_lag) AS total
      FROM by_lag)
    SELECT CAST((SELECT total FROM cum LIMIT 1) AS BIGINT)
             AS converted_users,
           (SELECT MIN(lag_s) FROM by_lag) AS min_lag_s,
           MIN(CASE WHEN c * 2 >= total THEN lag_s END) AS median_lag_s,
           (SELECT MAX(lag_s) FROM by_lag) AS max_lag_s
    FROM cum
    """,
    tags=("events", "funnel", "latency"),
)
def funnel_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for users completing the UNGATED view -> click ->
    purchase funnel: min / exact median / max seconds from first view
    to qualifying purchase. Integer epoch-second lags, median by the
    domain-compression pattern (group by distinct lag first, cumulative
    window over that tiny relation — never a global sort of users)."""
    from covid_data_pipeline_spark.operators.funnel import funnel_stage_times

    ev = table(spark, sf_dir, "events")
    times = funnel_stage_times(
        ev, "user_id", "ts", "event_type", ("view", "click", "purchase")
    )
    lag_s = (
        times.filter(F.col("t2").isNotNull())
        .select(
            F.floor(epoch_seconds("t2") - epoch_seconds("t0"))
            .cast("bigint")
            .alias("lag_s")
        )
    )
    by_lag = lag_s.groupBy("lag_s").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("lag_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bcast: const(1) scalar total agg
    tot = F.broadcast(by_lag.agg(F.sum("cnt").alias("total")))
    cum = by_lag.withColumn("c", F.sum("cnt").over(w)).crossJoin(tot)
    return cum.agg(
        F.max("total").alias("converted_users"),
        F.min("lag_s").alias("min_lag_s"),
        F.min(
            F.when(F.col("c") * 2 >= F.col("total"), F.col("lag_s"))
        ).alias("median_lag_s"),
        F.max("lag_s").alias("max_lag_s"),
    )


@register(
    "daily_distinct_users_bitmap",
    """
    SELECT CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS distinct_users
    FROM events WHERE ts IS NOT NULL
    GROUP BY CAST(ts AS DATE)
    """,
    tags=("events", "distinct", "bitmap"),
)
def daily_distinct_users_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT daily distinct users via bitmap aggregation — the
    fixed-size-mergeable-state alternative to both naive
    COUNT(DISTINCT) (whose expand+shuffle carries every (day, user)
    pair to the reducer) and HLL (approximate). Ids are mapped to
    (bucket, bit position); each (day, bucket) reduces to ONE ≤4 KB
    bitmap with map-side combine, popcounts sum per day. The same
    bitmaps are UNION-mergeable across incremental runs — store them
    per partition and daily refreshes never rescan history (the exact
    twin of the HLL rolling-distinct pattern)."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.select(
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("day", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("day")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users"))
    )


@register(
    "retained_users_bitmap",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events WHERE ts IS NOT NULL
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
    ret AS (
      SELECT a.day, COUNT(*) AS retained
      FROM du a JOIN du b
        ON b.user_id = a.user_id AND b.day = a.day + 1
      GROUP BY a.day
    )
    SELECT a.day, a.dau, n.dau AS dau_next,
           CAST(COALESCE(r.retained, 0) AS BIGINT) AS retained_users
    FROM dau a
    JOIN dau n ON n.day = a.day + 1
    LEFT JOIN ret r ON r.day = a.day
    """,
    tags=("events", "retention", "bitmap", "distinct"),
)
def retained_users_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT day-over-day retained users from the same mergeable bitmap
    states as ``daily_distinct_users_bitmap`` — via inclusion-exclusion:
    Spark has ``bitmap_or_agg`` but no binary AND, and none is needed,
    because |A ∩ B| = |A| + |B| − |A ∪ B| with every term a popcount of
    OR-merged fixed-size states.

    Scale shape: the corpus is touched ONCE (the (day, bucket) bitmap
    build with map-side combine); each day's ≤4 KB states then enter two
    pair-keyed OR-aggregations (each state tagged to its (d-1, d) and
    (d, d+1) pairs) — all downstream work is over |days × buckets|
    state rows, never events. The same stored states that answer DAU
    answer retention, so an incremental warehouse keeps ONE bitmap table
    for both; COUNT(DISTINCT)-based retention would re-shuffle the
    (day, user) relation per question asked."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    states = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("day", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        # localCheckpoint, not persist(): the states relation feeds three
        # consumers, but persist() registers in the session cache manager
        # and leaks a cached relation per invocation in a long-lived
        # session (bench loop); checkpoint blocks are GC'd with the plan.
        .localCheckpoint(eager=False)
    )
    dau = states.groupBy("day").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("dau")
    )
    union_pairs = (
        states.select(F.col("day").alias("p"), "bucket", "bm")
        .unionByName(
            states.select(F.date_sub("day", 1).alias("p"), "bucket", "bm")
        )
        .groupBy("p", "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("u_bm"))
        .groupBy("p")
        .agg(F.sum(F.expr("bitmap_count(u_bm)")).alias("union_users"))
    )
    return (
        dau.join(
            dau.select(
                F.date_sub("day", 1).alias("day"), F.col("dau").alias("dau_next")
            ),
            "day",
        )
        .join(union_pairs.withColumnRenamed("p", "day"), "day")
        .select(
            "day",
            "dau",
            "dau_next",
            (F.col("dau") + F.col("dau_next") - F.col("union_users")).alias(
                "retained_users"
            ),
        )
    )


@register(
    "event_type_lift",
    """
    WITH per_user AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n_users AS (SELECT COUNT(DISTINCT user_id) AS nu FROM per_user),
    singles AS (
      SELECT event_type, COUNT(*) AS n FROM per_user GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM per_user a JOIN per_user b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type)
    SELECT p.type_a, p.type_b, p.n_both,
           sa.n AS n_a, sb.n AS n_b,
           CAST(FLOOR(p.n_both * nu.nu * 10000.0 / (sa.n * sb.n)) AS BIGINT)
             AS lift_bp
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN n_users nu
    """,
    tags=("events", "association", "lift"),
)
def event_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type association (market-basket lift over users): for each
    unordered type pair, co-occurrence count and lift =
    P(a,b)/(P(a)P(b)) in integer basis points (floor of an exact
    integer product ratio — no float accumulation). The within-user
    self-join fans out ≤ |types|² per user AFTER the (user, type)
    distinct collapse; the singles and user-count relations re-enter
    as broadcasts."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.select("user_id", "event_type").distinct()
    # bcast: const(1) scalar user-count agg
    n_users = F.broadcast(
        per_user.agg(F.countDistinct("user_id").alias("nu"))
    )
    # bcast: const(|event_types|=5) per-type singles
    singles = F.broadcast(
        per_user.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    )
    a = per_user.select("user_id", F.col("event_type").alias("type_a"))
    b = per_user.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, on="user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            singles.select(
                F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
            ),
            "type_a",
        )
        .join(
            singles.select(
                F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
            ),
            "type_b",
        )
        .crossJoin(n_users)
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.floor(
                F.col("n_both") * F.col("nu") * 10000.0
                / (F.col("n_a") * F.col("n_b"))
            ).cast("bigint").alias("lift_bp"),
        )
    )


@register(
    "funnel_daily_conversion",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT CAST(s1.t1 AS DATE) AS cohort_day,
           COUNT(*) AS entrants,
           CAST(SUM(CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS converted,
           CAST(FLOOR(SUM(CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END)
                      * 10000.0 / COUNT(*)) AS BIGINT) AS conversion_bp
    FROM s1 LEFT JOIN s3 ON s1.user_id = s3.user_id
    GROUP BY CAST(s1.t1 AS DATE)
    """,
    tags=("events", "funnel", "cohort"),
)
def funnel_daily_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion by entry cohort: users grouped by the DAY of
    their first view, with the share (basis points, exact integer
    ratio) that eventually completed the ordered chain — the
    launch-impact view of the funnel. Stage times come from the
    single-shuffle fold; the per-day rollup groups its tiny per-user
    output."""
    from covid_data_pipeline_spark.operators.funnel import funnel_stage_times

    ev = table(spark, sf_dir, "events")
    times = funnel_stage_times(
        ev, "user_id", "ts", "event_type", ("view", "click", "purchase")
    )
    return (
        times.filter(F.col("t0").isNotNull())
        .groupBy(F.to_date("t0").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("entrants"),
            F.sum(
                F.when(F.col("t2").isNotNull(), 1).otherwise(0)
            ).alias("converted"),
            F.floor(
                F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0))
                * 10000.0
                / F.count(F.lit(1))
            ).cast("bigint").alias("conversion_bp"),
        )
    )


@register(
    "event_dwell_percentiles",
    """
    WITH gaps AS (
      SELECT CAST(FLOOR(date_part('epoch', ts)
                        - date_part('epoch', LAG(ts) OVER w)) AS BIGINT)
               AS gap_s
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    by_gap AS (
      SELECT gap_s, COUNT(*) AS cnt FROM gaps
      WHERE gap_s IS NOT NULL GROUP BY gap_s),
    cum AS (
      SELECT gap_s,
             SUM(cnt) OVER (ORDER BY gap_s ROWS UNBOUNDED PRECEDING) AS c,
             (SELECT SUM(cnt) FROM by_gap) AS total
      FROM by_gap)
    SELECT MIN(CASE WHEN c * 2 >= total THEN gap_s END) AS p50_s,
           MIN(CASE WHEN c * 10 >= total * 9 THEN gap_s END) AS p90_s,
           MIN(CASE WHEN c * 100 >= total * 99 THEN gap_s END) AS p99_s,
           CAST((SELECT total FROM cum LIMIT 1) AS BIGINT) AS n_gaps
    FROM cum
    """,
    tags=("events", "dwell", "percentile"),
)
def event_dwell_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event dwell-time percentiles (p50/p90/p99 seconds between
    a user's consecutive events) — the activity-cadence metric behind
    session-gap tuning (the 30-min default should sit far beyond p90).
    Integer second gaps; exact percentiles via the domain-compression
    pattern (distinct-gap relation, never a global sort of events);
    one user_id window shuffle produces the gaps."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = epoch_seconds("ts")
    gaps = ev.select(
        F.floor(ts_s - F.lag(ts_s).over(w)).cast("bigint").alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    by_gap = gaps.groupBy("gap_s").agg(F.count(F.lit(1)).alias("cnt"))
    cw = Window.orderBy("gap_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bcast: const(1) scalar total agg
    tot = F.broadcast(by_gap.agg(F.sum("cnt").alias("total")))
    cum = by_gap.withColumn("c", F.sum("cnt").over(cw)).crossJoin(tot)
    return cum.agg(
        F.min(
            F.when(F.col("c") * 2 >= F.col("total"), F.col("gap_s"))
        ).alias("p50_s"),
        F.min(
            F.when(F.col("c") * 10 >= F.col("total") * 9, F.col("gap_s"))
        ).alias("p90_s"),
        F.min(
            F.when(F.col("c") * 100 >= F.col("total") * 99, F.col("gap_s"))
        ).alias("p99_s"),
        F.max("total").alias("n_gaps"),
    )


@register(
    "event_path_trigrams",
    """
    WITH seq AS (
      SELECT event_type AS a,
             LEAD(event_type, 1) OVER w AS b,
             LEAD(event_type, 2) OVER w AS c
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (
      SELECT a, b, c, COUNT(*) AS n FROM seq
      WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY a, b, c)
    SELECT a, b, c, n FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, a, b, c) AS rn FROM tri)
    WHERE rn <= 10
    """,
    tags=("events", "path", "sequence"),
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the 10 most common 3-step event sequences across
    all user journeys — the "how do users actually move" companion to
    the funnel's "do they reach the goal". Trigrams via two LEADs on
    ONE user_id window (single shuffle+sort, reused by both); the
    count relation is ≤ |types|³ rows, so the global top-10 is a
    TakeOrderedAndProject over at most 125 rows."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    tri = seq.groupBy("a", "b", "c").agg(F.count(F.lit(1)).alias("n"))
    return (
        tri.orderBy(F.col("n").desc(), "a", "b", "c").limit(10)
    )


@register(
    "retention_matrix_daily",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE ts IS NOT NULL),
    first_seen AS (
      SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id),
    cohort_size AS (
      SELECT cohort_day, COUNT(*) AS n0 FROM first_seen GROUP BY cohort_day),
    joined AS (
      SELECT f.cohort_day, ud.day - f.cohort_day AS day_offset,
             COUNT(*) AS active
      FROM ud JOIN first_seen f ON ud.user_id = f.user_id
      WHERE ud.day - f.cohort_day IN (1, 7, 14)
      GROUP BY f.cohort_day, ud.day - f.cohort_day)
    SELECT j.cohort_day, CAST(j.day_offset AS BIGINT) AS day_offset,
           j.active, c.n0 AS cohort_users,
           CAST(FLOOR(j.active * 10000.0 / c.n0) AS BIGINT) AS retention_bp
    FROM joined j JOIN cohort_size c ON j.cohort_day = c.cohort_day
    """,
    tags=("events", "retention", "cohort"),
)
def retention_matrix_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily retention matrix at D1/D7/D14: of each day's NEW users,
    the share (basis points, exact integer ratio) active again exactly
    N days later — the product-health triangle, daily-grained where
    ``cohort_retention_weekly`` buckets by week. The corpus collapses
    to distinct (user, day) once; first-seen reuses the same user
    shuffle; cohort sizes re-enter via a tiny broadcast join."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first_seen = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    # bcast: const calendar-bounded (one row per cohort day)
    cohort_size = F.broadcast(
        first_seen.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n0"))
    )
    joined = (
        ud.join(first_seen, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", F.col("cohort_day")).alias("day_offset"),
        )
        .filter(F.col("day_offset").isin(1, 7, 14))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active"))
    )
    return joined.join(cohort_size, "cohort_day").select(
        "cohort_day",
        F.col("day_offset").cast("bigint").alias("day_offset"),
        "active",
        F.col("n0").alias("cohort_users"),
        F.floor(F.col("active") * 10000.0 / F.col("n0"))
        .cast("bigint")
        .alias("retention_bp"),
    )


_MAD_OUTLIERS_ORACLE = """
WITH q AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
vc AS (SELECT event_type, vq, COUNT(*) AS c FROM q GROUP BY 1, 2),
vcum AS (
  SELECT event_type, vq,
         SUM(c) OVER (PARTITION BY event_type ORDER BY vq
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM vc
),
med AS (
  SELECT event_type,
         MIN(CASE WHEN cum >= (n + 1) // 2 THEN vq END) AS med_q
  FROM vcum GROUP BY 1
),
dc AS (
  SELECT v.event_type, ABS(v.vq - m.med_q) AS dq, SUM(c) AS c
  FROM vc v JOIN med m ON v.event_type = m.event_type GROUP BY 1, 2
),
dcum AS (
  SELECT event_type, dq,
         SUM(c) OVER (PARTITION BY event_type ORDER BY dq
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM dc
),
mad AS (
  SELECT event_type,
         MIN(CASE WHEN cum >= (n + 1) // 2 THEN dq END) AS mad_q
  FROM dcum GROUP BY 1
)
SELECT q.event_id, q.event_type, q.vq AS value_q, m.med_q, d.mad_q
FROM q
JOIN med m ON q.event_type = m.event_type
JOIN mad d ON q.event_type = d.event_type
WHERE ABS(q.vq - m.med_q) > 3 * d.mad_q
"""


@register(
    "events_mad_outliers",
    _MAD_OUTLIERS_ORACLE,
    tags=("events", "quality", "anomaly"),
    bench=True,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type value anomalies via the median/MAD rule
    (`operators/relational.py::mad_outliers`): |v − median| > 3·MAD,
    with both medians as exact lower-median order statistics over
    integer cents — the 50%-breakdown alternative to 3σ on heavy-tailed
    value columns, computed by domain compression (medians selected
    from the distinct-value count relation, never a sort of the raw
    events)."""
    from covid_data_pipeline_spark.operators.relational import mad_outliers

    ev = table(spark, sf_dir, "events")
    flagged = mad_outliers(ev, ["event_type"], "value", k=3, scale=100)
    return flagged.filter(F.col("is_outlier")).select(
        "event_id",
        "event_type",
        F.col("__vq").alias("value_q"),
        "med_q",
        "mad_q",
    )


_CUPED_ORACLE = """
WITH units AS (
  SELECT user_id,
         user_id % 2 = 1 AS treat,
         COALESCE(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                  THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS x_cents,
         COALESCE(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                  THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS y_cents
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(x_cents AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y_cents AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x_cents AS HUGEINT) * CAST(y_cents AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x_cents AS HUGEINT) * CAST(x_cents AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y_cents AS HUGEINT) * CAST(y_cents AS HUGEINT)) AS HUGEINT) AS syy,
         CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
         CAST(SUM(CASE WHEN treat THEN CAST(x_cents AS HUGEINT) ELSE 0 END) AS HUGEINT) AS sxt,
         CAST(SUM(CASE WHEN treat THEN CAST(y_cents AS HUGEINT) ELSE 0 END) AS HUGEINT) AS syt
  FROM units
),
calc AS (
  SELECT nt, n - nt AS nc, sxt, syt, sx - sxt AS sxc, sy - syt AS syc,
         CAST(n * sxx - sx * sx AS DOUBLE) AS var_n,
         CAST(n * syy - sy * sy AS DOUBLE) AS vary_n,
         CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n
  FROM m
)
SELECT CAST(nt AS BIGINT) AS n_treat,
       CAST(nc AS BIGINT) AS n_ctrl,
       ROUND(CASE WHEN var_n > 0 THEN cov_n / var_n END, 6) + 0 AS theta,
       ROUND(CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
             - CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE), 4) + 0
         AS effect_raw_cents,
       ROUND(CASE WHEN var_n > 0 THEN
               (CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
                - CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE))
               - (cov_n / var_n)
                 * (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)
                    - CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE))
             ELSE CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
                  - CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE) END, 4) + 0
         AS effect_cuped_cents,
       ROUND(CASE WHEN var_n > 0 AND vary_n > 0
                  THEN 100.0 * cov_n * cov_n / (var_n * vary_n)
                  ELSE 0.0 END, 2) AS var_reduction_pct
FROM calc
"""


@register(
    "events_cuped_experiment",
    _CUPED_ORACLE,
    tags=("events", "experiment", "cuped"),
    bench=True,
)
def events_cuped_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout
    (`operators/experiment.py::cuped_adjusted_effect`): user-id parity
    plays the assignment, the first half of the month the pre-period
    covariate (per-user integer-cent sums — floored per EVENT, so the
    unit table is exact), the second half the experiment metric. One
    map-side-combined aggregation produces every moment; theta/effects
    are correctly-rounded double ratios of exact DECIMAL integers, so
    the report hash-matches the SQL replay."""
    from covid_data_pipeline_spark.operators.experiment import (
        cuped_adjusted_effect,
    )

    ev = table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("date")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    units = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.to_date("ts") < cut, cents)), F.lit(0)
        ).alias("x_cents"),
        F.coalesce(
            F.sum(F.when(F.to_date("ts") >= cut, cents)), F.lit(0)
        ).alias("y_cents"),
    ).withColumn("treat", F.pmod(F.col("user_id"), F.lit(2)) == 1)
    return cuped_adjusted_effect(
        units, treat_col="treat", x_col="x_cents", y_col="y_cents", scale=1
    )


@register(
    "events_srm_check",
    """
    WITH counts AS (
      SELECT SUM(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS n_treat,
             SUM(CASE WHEN user_id % 3 <> 0 THEN 1 ELSE 0 END) AS n_ctrl
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT CAST(n_treat AS BIGINT) AS n_treat,
           CAST(n_ctrl AS BIGINT) AS n_ctrl,
           CAST((CAST(n_treat - n_ctrl AS HUGEINT)
             * CAST(n_treat - n_ctrl AS HUGEINT) * 1000)
            // CAST(n_treat + n_ctrl AS HUGEINT) AS BIGINT) AS chi2_milli,
           ((CAST(n_treat - n_ctrl AS HUGEINT)
             * CAST(n_treat - n_ctrl AS HUGEINT) * 1000)
            // CAST(n_treat + n_ctrl AS HUGEINT)) > 10828 AS srm_detected
    FROM counts
    """,
    tags=("events", "experiment", "srm"),
)
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard (`operators/experiment.py::srm_check`)
    on a deliberately broken assignment (user_id % 3 vs an expected 1:1
    design): the exact-integer chi-square statistic must flag it. The
    first gate of any experiment readout — run before CUPED/DiD."""
    from covid_data_pipeline_spark.operators.experiment import srm_check

    users = table(spark, sf_dir, "events").select("user_id").distinct()
    units = users.withColumn(
        "treat", F.pmod(F.col("user_id"), F.lit(3)) == 0
    )
    return srm_check(units, "treat")


_DID_ORACLE = """
WITH units AS (
  SELECT user_id,
         user_id % 2 = 1 AS treat,
         COALESCE(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                  THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS pre_c,
         COALESCE(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                  THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS post_c
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
         CAST(SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS HUGEINT) AS nc,
         CAST(SUM(CASE WHEN treat THEN pre_c ELSE 0 END) AS HUGEINT) AS t_pre,
         CAST(SUM(CASE WHEN treat THEN post_c ELSE 0 END) AS HUGEINT) AS t_post,
         CAST(SUM(CASE WHEN NOT treat THEN pre_c ELSE 0 END) AS HUGEINT) AS c_pre,
         CAST(SUM(CASE WHEN NOT treat THEN post_c ELSE 0 END) AS HUGEINT) AS c_post
  FROM units
)
SELECT CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_ctrl,
       ROUND(CAST(t_pre AS DOUBLE) / CAST(nt AS DOUBLE), 4) AS treat_pre_cents,
       ROUND(CAST(t_post AS DOUBLE) / CAST(nt AS DOUBLE), 4) AS treat_post_cents,
       ROUND(CAST(c_pre AS DOUBLE) / CAST(nc AS DOUBLE), 4) AS ctrl_pre_cents,
       ROUND(CAST(c_post AS DOUBLE) / CAST(nc AS DOUBLE), 4) AS ctrl_post_cents,
       ROUND((CAST(t_post AS DOUBLE) / CAST(nt AS DOUBLE)
              - CAST(t_pre AS DOUBLE) / CAST(nt AS DOUBLE))
             - (CAST(c_post AS DOUBLE) / CAST(nc AS DOUBLE)
                - CAST(c_pre AS DOUBLE) / CAST(nc AS DOUBLE)), 4) + 0 AS did_cents
FROM m
"""


@register(
    "events_did_experiment",
    _DID_ORACLE,
    tags=("events", "experiment", "did"),
)
def events_did_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout
    (`operators/experiment.py::diff_in_diff`) over the same per-user
    pre/post integer-cent unit table as the CUPED query — the
    non-randomized (rollout/geo-launch) counterpart that nets out the
    shared time trend under parallel trends."""
    from covid_data_pipeline_spark.operators.experiment import diff_in_diff

    ev = table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("date")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    units = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.to_date("ts") < cut, cents)), F.lit(0)
        ).alias("pre_c"),
        F.coalesce(
            F.sum(F.when(F.to_date("ts") >= cut, cents)), F.lit(0)
        ).alias("post_c"),
    ).withColumn("treat", F.pmod(F.col("user_id"), F.lit(2)) == 1)
    return diff_in_diff(
        units, treat_col="treat", pre_col="pre_c", post_col="post_c", scale=1
    )


@register(
    "events_theilsen_trend",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) - DATE '1970-01-01' AS x,
             COUNT(*) AS y
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    slopes AS (
      SELECT a.event_type,
             b.y - a.y AS dy, b.x - a.x AS dx,
             CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s,
             a.x AS xa, b.x AS xb
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.x < b.x
    ),
    ranked AS (
      SELECT event_type, dy, dx,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY s, xa, xb) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM slopes
    )
    SELECT event_type, m AS n_pairs, dy AS slope_num, dx AS slope_den
    FROM ranked WHERE rn = (m + 1) // 2
    """,
    tags=("events", "trend", "robust"),
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily event volume: the LOWER-median
    pairwise slope per event type — up to ~29% of days can be corrupt
    (outages, backfill spikes) without moving the estimate, where the
    OLS twin (`events_daily_trend`) chases every outlier day.

    Float policy: the median is selected, never computed — pairs sort
    by their slope (one correctly-rounded double division of exact
    integer day/count deltas — identical on any engine) with (x_a, x_b)
    tiebreaks, and the chosen pair's EXACT (dy, dx) integers are the
    output, so no rounding ever happens. Scale shape: pairwise slopes
    fan out over the DOMAIN-COMPRESSED per-day rollup (days²/2 per
    type — a year is ~66k pairs), never over raw events; one window
    ranks them per type."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.y") - F.col("a.y")).alias("dy"),
        (F.col("b.x") - F.col("a.x")).alias("dx"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("s"),
        F.col("a.x").alias("xa"),
        F.col("b.x").alias("xb"),
    )
    w = Window.partitionBy("event_type").orderBy("s", "xa", "xb")
    wc = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "dy",
        "dx",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("m"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(m + 1) div 2")
    ).select(
        "event_type",
        F.col("m").alias("n_pairs"),
        F.col("dy").alias("slope_num"),
        F.col("dx").alias("slope_den"),
    )


@register(
    "events_kendall_daily",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS xa,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS xb
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    pairs AS (
      SELECT CASE
               WHEN (a.xa - b.xa) * (a.xb - b.xb) > 0 THEN 1
               WHEN (a.xa - b.xa) * (a.xb - b.xb) < 0 THEN -1
               ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON a.day < b.day
    )
    SELECT COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS concordant,
           CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS discordant,
           -- sign-safe: DuckDB // floors but Spark div truncates, so
           -- divide the ABSOLUTE numerator and reapply the sign
           CAST(CASE WHEN SUM(sgn) < 0 THEN -1 ELSE 1 END
             * ((ABS(SUM(sgn)) * 10000) // COUNT(*)) AS BIGINT) AS tau_bp
    FROM pairs
    """,
    tags=("events", "correlation", "robust"),
)
def events_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a rank correlation between two event types' daily
    volumes (do views and purchases move together?) — the
    rank-correlation answer that needs NO square roots or float
    moments: concordant minus discordant day pairs over all pairs,
    entirely integer. Tau lands in basis points through a SIGN-SAFE
    division (divide the absolute numerator, reapply the sign): Spark's
    `div` truncates toward zero while DuckDB's `//` floors, so a bare
    negative-numerator division would diverge cross-engine. Day pairs
    fan out over the DOMAIN-COMPRESSED daily rollup (days²/2), never
    raw events."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("xa"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("xb"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    prod = (F.col("a.xa") - F.col("b.xa")) * (F.col("a.xb") - F.col("b.xb"))
    sgn = F.when(prod > 0, 1).when(prod < 0, -1).otherwise(0)
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        sgn.alias("sgn")
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).alias("discordant"),
        F.expr(
            "CASE WHEN sum(sgn) < 0 THEN -1 ELSE 1 END"
            " * ((abs(sum(sgn)) * 10000) div count(*))"
        ).alias("tau_bp"),
    )


@register(
    "events_growth_accounting",
    """
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events WHERE ts IS NOT NULL),
    lagd AS (
      SELECT user_id, wk,
             lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS pw
      FROM uw),
    cls AS (
      SELECT wk,
             CASE WHEN pw IS NULL THEN 'new'
                  WHEN wk - pw = 7 THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM lagd),
    agg AS (
      SELECT wk,
             CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
                  AS BIGINT) AS new_users,
             CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                  AS BIGINT) AS retained_users,
             CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                  AS BIGINT) AS resurrected_users,
             CAST(COUNT(*) AS BIGINT) AS active_users
      FROM cls GROUP BY 1)
    SELECT a.wk AS week, a.new_users, a.retained_users,
           a.resurrected_users, a.active_users,
           CAST(COALESCE(p.active_users, 0) - a.retained_users AS BIGINT)
             AS churned_users
    FROM agg a LEFT JOIN agg p ON p.wk = a.wk - 7
    """,
    tags=("events", "growth", "retention"),
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly new/retained/resurrected/churned decomposition of the
    active-user base (`operators/temporal.py::growth_accounting`) —
    all-integer: distinct (user, week) domain compression, per-user
    LAG classification, week rollup, 7-day-shifted self-join for the
    churn identity active(w−7) − retained(w)."""
    from covid_data_pipeline_spark.operators.temporal import (
        growth_accounting,
    )

    ev = table(spark, sf_dir, "events")
    return growth_accounting(ev)


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events),
    mk_pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    mk_types AS (SELECT DISTINCT event_type AS next_type FROM events),
    mk_k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM mk_types),
    mk_tot AS (
      SELECT prev_type, CAST(SUM(cnt) AS BIGINT) AS total
      FROM mk_pairs GROUP BY 1),
    mk_grid AS (
      SELECT t.prev_type, y.next_type, t.total,
             COALESCE(p.cnt, 0) AS cnt
      FROM mk_tot t
      CROSS JOIN mk_types y
      LEFT JOIN mk_pairs p
        ON p.prev_type = t.prev_type AND p.next_type = y.next_type)
    SELECT g.prev_type, g.next_type, g.cnt,
           ROUND(CAST(g.cnt + 1 AS DOUBLE) / (g.total + k.k), 6)
             AS p_next,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY g.prev_type
             ORDER BY g.cnt DESC, g.next_type) AS INTEGER) AS rnk
    FROM mk_grid g CROSS JOIN mk_k k
    """,
    tags=("events", "sequence", "markov"),
    bench=True,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-smoothed first-order Markov PREDICTION model: P(next |
    current) with add-1 smoothing over the FULL source-state x type
    grid, ranked within each source state — unseen transitions get
    nonzero mass, which is what separates this from
    event_transition_matrix (the raw observed-MLE matrix: different
    row set, different estimator, different consumer). This is the
    model a next-action recommender actually ships; the likelihood
    scorer (events_session_likelihood) deliberately stays on the
    unsmoothed MLE since it scores only observed transitions.

    Scale shape: ONE shuffle by user_id for the LAG, then a map-side-
    combinable pair rollup whose cardinality is |types|^2 — tiny — so
    everything after (grid cross join, smoothing, ranking) runs on
    constant-size relations re-entered via broadcast; the rollup is
    localCheckpointed so its three consumers don't re-run the events
    scan (Catalyst shares no subtrees). The window ORDER BY carries
    event_id as the uniqueness tiebreaker; counts stay BIGINT and the
    single smoothed division is exact-rounded IEEE on both engines."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    pairs = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    types = ev.select(F.col("event_type").alias("next_type")).distinct()
    k = types.agg(F.count(F.lit(1)).alias("k"))
    tot = pairs.groupBy("prev_type").agg(F.sum("cnt").alias("total"))
    grid = (
        # bcast: const(|event_types|=5) type grid
        tot.crossJoin(F.broadcast(types))
        .join(pairs, ["prev_type", "next_type"], "left")
        .select(
            "prev_type",
            "next_type",
            "total",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    rw = Window.partitionBy("prev_type").orderBy(
        F.col("cnt").desc(), "next_type"
    )
    return (
        # bcast: const(1) scalar k agg
        grid.crossJoin(F.broadcast(k))
        .select(
            "prev_type",
            "next_type",
            "cnt",
            F.round(
                (F.col("cnt") + 1).cast("double")
                / (F.col("total") + F.col("k")),
                6,
            ).alias("p_next"),
            F.row_number().over(rw).alias("rnk"),
        )
    )


@register(
    "events_seasonal_decompose",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    tr AS (
      SELECT event_type, x, cnt,
             CAST(SUM(cnt) OVER w AS BIGINT) AS sum7,
             CAST(COUNT(*) OVER w AS BIGINT) AS n7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY x
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    detr AS (
      SELECT event_type, x % 7 AS dow_idx,
             7 * cnt - sum7 AS detr7
      FROM tr WHERE n7 = 7)
    SELECT event_type, dow_idx,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(detr7) AS DOUBLE) / (7 * COUNT(*)), 4) + 0
             AS seasonal_idx
    FROM detr GROUP BY 1, 2
    """,
    tags=("events", "temporal", "seasonal", "decompose"),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily event volume:
    trend = centered 7-day moving average (full windows only), seasonal
    index per (event_type, day-of-week) = mean detrended residual. The
    descriptive companion to events_holt_winters (which *forecasts* the
    seasonality this query *measures*).

    Exactness: the detrended residual is kept as the integer
    ``7*cnt - sum7`` (x7 to avoid the trend division), so the seasonal
    mean is an exact-BIGINT sum with ONE final division — no float
    accumulates across rows (registry float policy). Day-of-week is
    ``epoch_day % 7`` — pure arithmetic, immune to the Spark-vs-DuckDB
    dayofweek() origin mismatch. Scale: one shuffle to the daily
    rollup (map-side combined), one window pass per type, one tiny
    rollup; the RANGE frame over the integer day index tolerates
    calendar gaps (incomplete windows are dropped, not polluted).
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rangeBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "x",
        "cnt",
        F.sum("cnt").over(w).alias("sum7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    )
    detr = tr.where(F.col("n7") == 7).select(
        "event_type",
        (F.col("x") % 7).alias("dow_idx"),
        (F.lit(7) * F.col("cnt") - F.col("sum7")).alias("detr7"),
    )
    return detr.groupBy("event_type", "dow_idx").agg(
        F.count(F.lit(1)).alias("n_days"),
        round_stable(
            F.sum("detr7").cast("double")
            / (F.lit(7) * F.count(F.lit(1))),
            4,
        ).alias("seasonal_idx"),
    )


@register(
    "events_session_likelihood",
    """
    WITH seq AS (
      SELECT user_id, event_type AS next_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT user_id, prev_type, next_type FROM seq
      WHERE prev_type IS NOT NULL),
    trans AS (
      SELECT prev_type, next_type, COUNT(*) AS cnt
      FROM pairs GROUP BY 1, 2),
    tot AS (
      SELECT prev_type, CAST(SUM(cnt) AS BIGINT) AS total
      FROM trans GROUP BY 1),
    lp AS (
      SELECT t.prev_type, t.next_type,
             CAST(ROUND(ln(CAST(t.cnt AS DOUBLE) / o.total) * 1e6, 0)
                  AS BIGINT) AS micro
      FROM trans t JOIN tot o USING (prev_type)),
    per_user AS (
      SELECT p.user_id,
             CAST(COUNT(*) AS BIGINT) AS n_trans,
             CAST(SUM(l.micro) AS BIGINT) AS micro_sum
      FROM pairs p JOIN lp l
        ON p.prev_type = l.prev_type AND p.next_type = l.next_type
      GROUP BY 1)
    SELECT user_id, n_trans,
           ROUND(CAST(micro_sum AS DOUBLE) / (n_trans * 1e6), 6) + 0
             AS avg_ll,
           CAST(NTILE(10) OVER (
             ORDER BY CAST(micro_sum AS DOUBLE) / n_trans, user_id)
             AS INTEGER) AS decile
    FROM per_user WHERE n_trans >= 2
    """,
    tags=("events", "sequence", "markov", "anomaly"),
)
def events_session_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov log-likelihood scoring of every user's event stream under
    the corpus-wide first-order transition model — users whose behaviour
    the model finds improbable (bot loops, scripted replays) land in
    decile 1. The anomaly-detection consumer of
    events_markov_transitions' model.

    Exactness: per-transition log-probs are integer-scaled micro-nats
    (round(ln(cnt/total)*1e6) — the DSIR pattern), so each user's
    likelihood is an exact BIGINT sum over a broadcast-joined constant-
    size model; only the per-user average leaves integers, and the
    decile NTILE orders by that deterministic double with a user_id
    tiebreaker. Scale: ONE pass over events — the (user, prev, next)
    rollup rides the LAG's user_id partitioning (hash(user_id)
    satisfies the grouping's clustered distribution, so no second
    shuffle) and is localCheckpointed, letting model estimation and
    per-user scoring re-enter a compact relation instead of re-running
    the scan; the model is |types|^2 rows broadcast back. The NTILE's
    single-partition pass ranks one row per user — swap for
    approx-quantile boundaries at warehouse scale (same note as
    rfm_customer_segments)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    # ONE pass over the big relation: roll transitions up to
    # (user, prev, next, c) right after the window — at most |types|^2
    # rows per user — and localCheckpoint it, so the model estimation
    # and the per-user scoring both re-enter this compact relation
    # instead of re-running the events scan + user-window shuffle.
    upair = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("user_id", "prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    trans = upair.groupBy("prev_type", "next_type").agg(
        F.sum("c").alias("cnt")
    )
    tot = trans.groupBy("prev_type").agg(F.sum("cnt").alias("total"))
    lp = trans.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("total")) * 1e6, 0
        )
        .cast("long")
        .alias("micro"),
    )
    per_user = (
        # bcast: model(|event_types|^2=25) smoothed transition log-probs
        upair.join(F.broadcast(lp), ["prev_type", "next_type"])
        .groupBy("user_id")
        .agg(
            F.sum("c").alias("n_trans"),
            F.sum(F.col("c") * F.col("micro")).alias("micro_sum"),
        )
        .where(F.col("n_trans") >= 2)
    )
    nw = Window.orderBy(
        F.col("micro_sum").cast("double") / F.col("n_trans"), "user_id"
    )
    return per_user.select(
        "user_id",
        "n_trans",
        round_stable(
            F.col("micro_sum").cast("double") / (F.col("n_trans") * 1e6), 6
        ).alias("avg_ll"),
        F.ntile(10).over(nw).alias("decile"),
    )


@register(
    "events_dp_released_counts",
    """
    WITH dp_daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    dp_u AS (
      SELECT event_type, day, cnt,
             (CAST(concat('0x', substr(md5(
                concat('dp42|', event_type, '|', CAST(day AS VARCHAR))),
                1, 15)) AS BIGINT) + 0.5)
               / 1152921504606846976.0 AS u
      FROM dp_daily)
    SELECT event_type, day, cnt,
           ROUND(CASE WHEN u < 0.5 THEN 2.0 * ln(2.0 * u)
                      ELSE -2.0 * ln(2.0 * (1.0 - u)) END, 4) + 0 AS noise,
           CAST(FLOOR(cnt
                + (CASE WHEN u < 0.5 THEN 2.0 * ln(2.0 * u)
                        ELSE -2.0 * ln(2.0 * (1.0 - u)) END)
                + 0.5) AS BIGINT) AS released
    FROM dp_u
    """,
    tags=("events", "privacy", "differential-privacy"),
)
def events_dp_released_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism release of the daily event-type histogram
    (sensitivity-1 counts, eps = 0.5, b = 2): inverse-CDF noise
    X = b*ln(2u) / -b*ln(2(1-u)) added per cell, released as the
    nearest integer. TEST-MODE noise source: u derives from the
    portable md5-prefix hash of a fixed salt + the cell key, which
    makes the release REPLAYABLE for cross-engine verification (the
    same trick that oracles the LSH hyperplanes); a production release
    swaps the salt for a secret high-entropy seed — the mechanism,
    sensitivity, and eps accounting are unchanged. Completes the
    privacy family (masking, k-anonymity) with the third standard
    control. Zero-shuffle past the daily rollup; the noise is per-row
    column algebra."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("ts").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dp42|"),
                        F.col("event_type"),
                        F.lit("|"),
                        F.col("day").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 1152921504606846976.0
    noise = F.when(u < 0.5, 2.0 * F.log(2.0 * u)).otherwise(
        -2.0 * F.log(2.0 * (1.0 - u))
    )
    return daily.select(
        "event_type",
        "day",
        "cnt",
        round_stable(noise, 4).alias("noise"),
        F.floor(F.col("cnt") + noise + 0.5).cast("long").alias("released"),
    )


@register(
    "events_psi_drift",
    """
    WITH psi_base AS (
      SELECT event_type, event_id, value,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    psi_split AS (
      SELECT CAST(MIN(x) + (MAX(x) - MIN(x)) // 2 AS BIGINT) AS sx
      FROM psi_base),
    psi_ref AS (
      SELECT b.event_type, b.event_id, b.value
      FROM psi_base b CROSS JOIN psi_split s WHERE b.x < s.sx),
    psi_cur AS (
      SELECT b.event_type, b.event_id, b.value
      FROM psi_base b CROSS JOIN psi_split s WHERE b.x >= s.sx),
    psi_bounds AS (
      SELECT event_type, tile, MAX(value) AS b FROM (
        SELECT event_type, value,
               CAST(NTILE(10) OVER (PARTITION BY event_type
                 ORDER BY value, event_id) AS INTEGER) AS tile
        FROM psi_ref) t
      WHERE tile <= 9 GROUP BY 1, 2),
    psi_bins AS (SELECT unnest(range(1, 11)) AS bin),
    psi_rc AS (
      SELECT r.event_type, r.event_id,
             CAST(1 + COUNT(CASE WHEN r.value > bo.b THEN 1 END)
                  AS INTEGER) AS bin
      FROM psi_ref r LEFT JOIN psi_bounds bo
        ON r.event_type = bo.event_type
      GROUP BY 1, 2),
    psi_cc AS (
      SELECT c.event_type, c.event_id,
             CAST(1 + COUNT(CASE WHEN c.value > bo.b THEN 1 END)
                  AS INTEGER) AS bin
      FROM psi_cur c LEFT JOIN psi_bounds bo
        ON c.event_type = bo.event_type
      GROUP BY 1, 2),
    psi_types AS (SELECT DISTINCT event_type FROM psi_base),
    psi_grid AS (
      SELECT t.event_type, CAST(b.bin AS INTEGER) AS bin
      FROM psi_types t CROSS JOIN psi_bins b),
    psi_cnt AS (
      SELECT g.event_type, g.bin,
             CAST(COALESCE(rc.c, 0) AS BIGINT) AS rc,
             CAST(COALESCE(cc.c, 0) AS BIGINT) AS cc
      FROM psi_grid g
      LEFT JOIN (SELECT event_type, bin, COUNT(*) AS c
                 FROM psi_rc GROUP BY 1, 2) rc
        ON g.event_type = rc.event_type AND g.bin = rc.bin
      LEFT JOIN (SELECT event_type, bin, COUNT(*) AS c
                 FROM psi_cc GROUP BY 1, 2) cc
        ON g.event_type = cc.event_type AND g.bin = cc.bin),
    psi_tot AS (
      SELECT event_type, CAST(SUM(rc) AS BIGINT) AS nr,
             CAST(SUM(cc) AS BIGINT) AS nc
      FROM psi_cnt GROUP BY 1),
    psi_terms AS (
      SELECT c.event_type,
             CAST(ROUND(
               ((CAST(c.rc AS DOUBLE) + 0.5) / (t.nr + 5.0)
                - (CAST(c.cc AS DOUBLE) + 0.5) / (t.nc + 5.0))
               * ln(((CAST(c.rc AS DOUBLE) + 0.5) / (t.nr + 5.0))
                    / ((CAST(c.cc AS DOUBLE) + 0.5) / (t.nc + 5.0)))
               * 1e9, 0) AS BIGINT) AS micro
      FROM psi_cnt c JOIN psi_tot t USING (event_type))
    SELECT p.event_type, t.nr AS n_ref, t.nc AS n_cur,
           ROUND(CAST(SUM(p.micro) AS BIGINT) / 1e9, 6) AS psi,
           CAST(SUM(p.micro) AS BIGINT) > 100000000 AS drifted
    FROM psi_terms p JOIN psi_tot t USING (event_type)
    GROUP BY 1, 2, 3
    """,
    tags=("events", "monitoring", "drift", "psi"),
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the event value distribution,
    second calendar half vs first (the reference cohort): decile
    boundaries fit on the reference (NTILE with event_id tiebreaks),
    both cohorts re-binned by pure value comparison, add-0.5 smoothed,
    PSI = sum (p-q) ln(p/q) with drift flagged past the standard 0.1 —
    the production monitoring primitive behind "has this feed shifted
    since the model/filters were tuned" (complements term_drift_by_
    cohort, which monitors text; this monitors numeric distributions).

    Exactness: bin ids come from exact value comparisons against nine
    reference boundaries; every per-bin term is a deterministic IEEE
    expression over exact integer counts (+0.5 halves are binary-
    exact), integer-scaled to nano-units so the 10-term sum and the
    0.1 threshold compare in exact BIGINT. Scale: the NTILE runs per
    event_type (parallel across types; at warehouse scale swap for
    approx-quantile boundaries), the 9-boundary re-bin is a broadcast
    fan-out, and everything downstream is |types| x 10 rows."""
    ev = table(spark, sf_dir, "events")
    base = ev.where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type",
        "event_id",
        "value",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    )
    split = base.agg(
        (
            F.min("x")
            + F.floor((F.max("x") - F.min("x")) / 2).cast("long")
        ).alias("sx")
    )
    # bcast: const(1) scalar split point
    based = base.crossJoin(F.broadcast(split))
    ref = based.where(F.col("x") < F.col("sx"))
    cur = based.where(F.col("x") >= F.col("sx"))
    tw = Window.partitionBy("event_type").orderBy("value", "event_id")
    bounds = (
        ref.select("event_type", "value", F.ntile(10).over(tw).alias("tile"))
        .where(F.col("tile") <= 9)
        .groupBy("event_type", "tile")
        .agg(F.max("value").alias("b"))
    )

    def rebin(cohort):
        return (
            # bcast: const(|event_types|=5) per-type bin bounds
            cohort.join(F.broadcast(bounds), "event_type", "left")
            .groupBy("event_type", "event_id")
            .agg(
                (
                    F.lit(1)
                    + F.count(F.when(F.col("value") > F.col("b"), 1))
                )
                .cast("int")
                .alias("bin")
            )
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    rc = rebin(ref).withColumnRenamed("c", "rc")
    cc = rebin(cur).withColumnRenamed("c", "cc")
    types = base.select("event_type").distinct()
    bins = spark.range(1, 11).select(F.col("id").cast("int").alias("bin"))
    # bcast: const(10) decile bin ids
    grid = types.crossJoin(F.broadcast(bins))
    cnt = (
        grid.join(rc, ["event_type", "bin"], "left")
        .join(cc, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("rc", F.lit(0)).alias("rc"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("rc").alias("nr"), F.sum("cc").alias("nc")
    )
    p = (F.col("rc").cast("double") + 0.5) / (F.col("nr") + 5.0)
    q = (F.col("cc").cast("double") + 0.5) / (F.col("nc") + 5.0)
    terms = cnt.join(tot, "event_type").select(
        "event_type",
        F.round((p - q) * F.log(p / q) * 1e9, 0).cast("long").alias("micro"),
    )
    return (
        terms.groupBy("event_type")
        .agg(F.sum("micro").alias("micro_sum"))
        .join(tot, "event_type")
        .select(
            "event_type",
            F.col("nr").alias("n_ref"),
            F.col("nc").alias("n_cur"),
            F.round(F.col("micro_sum") / 1e9, 6).alias("psi"),
            (F.col("micro_sum") > 100000000).alias("drifted"),
        )
    )


@register(
    "events_churn_training_set",
    """
    WITH ch_base AS (
      SELECT user_id, event_id, event_type, value,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7
               AS wk,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL),
    ch_lw AS (SELECT CAST(MAX(wk) AS BIGINT) AS lw FROM ch_base),
    ch_feat AS (
      SELECT b.user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT b.x) AS BIGINT) AS n_active_days,
             CAST(COUNT(CASE WHEN b.event_type = 'purchase' THEN 1 END)
                  AS BIGINT) AS n_purchases,
             CAST(SUM(CAST(ROUND(b.value * 100, 0) AS BIGINT))
                  AS BIGINT) AS value_cents,
             CAST(MIN(l.lw * 7 - 1 - b.x) AS BIGINT)
               AS days_since_last
      FROM ch_base b CROSS JOIN ch_lw l
      WHERE b.wk < l.lw
      GROUP BY 1),
    ch_label AS (
      SELECT DISTINCT b.user_id, TRUE AS active
      FROM ch_base b CROSS JOIN ch_lw l WHERE b.wk = l.lw)
    SELECT f.user_id, f.n_events, f.n_active_days, f.n_purchases,
           f.value_cents, f.days_since_last,
           COALESCE(lb.active, FALSE) AS label_active
    FROM ch_feat f LEFT JOIN ch_label lb USING (user_id)
    """,
    tags=("events", "training-set", "features", "temporal-split"),
)
def events_churn_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn training-set assembly: per-user activity
    features computed STRICTLY BEFORE the label week (the dataset's
    last calendar week), labeled by activity inside it — the temporal
    feature/label split every behavioral model needs and the thing
    naive joins silently get wrong (features peeking past the label
    boundary). Features are exact integers (cent-summed value,
    distinct active days, recency measured to the feature-window
    edge); the label re-enters by a user-keyed left join.

    Scale: one pass builds both cohorts off the same relation
    (week predicate only), the feature rollup is one user_id shuffle
    (COUNT DISTINCT day via Spark's native expand), and the label
    relation is |active users| rows. The week boundary is a broadcast
    scalar, so the query re-runs identically as the calendar
    advances — re-materialize per label week for a panel dataset."""
    ev = table(spark, sf_dir, "events")
    base = ev.where(F.col("ts").isNotNull()).select(
        "user_id",
        "event_type",
        "value",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    ).select(
        "user_id",
        "event_type",
        "value",
        "x",
        F.floor(F.col("x") / 7).cast("long").alias("wk"),
    )
    lw = base.agg(F.max("wk").alias("lw"))
    # bcast: const(1) scalar last-week agg
    based = base.crossJoin(F.broadcast(lw))
    feat = (
        based.where(F.col("wk") < F.col("lw"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("x").alias("n_active_days"),
            F.count(
                F.when(F.col("event_type") == "purchase", 1)
            ).alias("n_purchases"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("long")
            ).alias("value_cents"),
            F.min(
                F.col("lw") * 7 - 1 - F.col("x")
            ).alias("days_since_last"),
        )
    )
    label = (
        based.where(F.col("wk") == F.col("lw"))
        .select("user_id", F.lit(True).alias("active"))
        .distinct()
    )
    return feat.join(label, "user_id", "left").select(
        "user_id",
        "n_events",
        "n_active_days",
        "n_purchases",
        "value_cents",
        "days_since_last",
        F.coalesce("active", F.lit(False)).alias("label_active"),
    )


@register(
    "events_sequential_patterns",
    """
    WITH sp_e AS (
      SELECT user_id, event_type AS t,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS BIGINT) AS rn
      FROM events),
    sp_nu AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM sp_e),
    sp_first AS (
      SELECT user_id, t AS a, CAST(MIN(rn) AS BIGINT) AS p1
      FROM sp_e GROUP BY 1, 2),
    sp_pair AS (
      SELECT f.user_id, f.a, e.t AS b, CAST(MIN(e.rn) AS BIGINT) AS p2
      FROM sp_first f JOIN sp_e e
        ON f.user_id = e.user_id AND e.rn > f.p1
      GROUP BY 1, 2, 3),
    sp_sup2 AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support2
      FROM sp_pair GROUP BY 1, 2),
    sp_keep2 AS (
      SELECT s.a, s.b, s.support2
      FROM sp_sup2 s CROSS JOIN sp_nu n
      WHERE s.support2 * 20 >= n.nu),
    sp_triple AS (
      SELECT p.user_id, p.a, p.b, e.t AS c
      FROM sp_pair p
      JOIN sp_keep2 k ON p.a = k.a AND p.b = k.b
      JOIN sp_e e ON p.user_id = e.user_id AND e.rn > p.p2
      GROUP BY 1, 2, 3, 4),
    sp_sup3 AS (
      SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS support
      FROM sp_triple GROUP BY 1, 2, 3)
    SELECT s.a, s.b, s.c, s.support,
           ROUND(CAST(s.support AS DOUBLE) / n.nu, 4) AS support_pct,
           CAST(ROW_NUMBER() OVER (
             ORDER BY s.support DESC, s.a, s.b, s.c) AS INTEGER) AS rnk
    FROM sp_sup3 s CROSS JOIN sp_nu n
    WHERE s.support * 20 >= n.nu
    """,
    tags=("events", "sequence", "pattern-mining", "gsp"),
    bench=True,
)
def events_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-step sequential patterns (GSP/PrefixSpan family):
    ordered type triples a -> b -> c supported as SUBSEQUENCES (gaps
    allowed — the non-adjacent complement of the Markov queries, which
    see only immediate successors) by >= 5% of users, grown
    Apriori-style: 2-step prefixes are counted first and only
    surviving prefixes are extended, so candidate growth is bounded by
    real support, not |types|^3. Subsequence existence uses the greedy
    earliest-occurrence chain (provably sufficient), each step one
    (user-keyed join + MIN) — never a per-user sequence scan.

    Exactness: supports are exact user counts; the 5% gate compares
    support*20 >= n_users in BIGINT (no float threshold); only the
    display percentage divides. Scale: every join is keyed by user_id
    (co-partitioned with the sessionization family), inter-step
    relations are <= users x surviving-patterns rows thanks to the MIN
    reductions, and the ordered-event relation would be staged to a
    table at warehouse scale instead of recomputed per step."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        F.col("event_type").alias("t"),
        F.row_number().over(w).cast("long").alias("rn"),
    ).localCheckpoint(eager=False)
    nu = e.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("nu")
    )
    first = e.groupBy("user_id", F.col("t").alias("a")).agg(
        F.min("rn").alias("p1")
    )
    pair = (
        first.join(e, "user_id")
        .where(F.col("rn") > F.col("p1"))
        .groupBy("user_id", "a", F.col("t").alias("b"))
        .agg(F.min("rn").alias("p2"))
    )
    sup2 = pair.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support2"))
    keep2 = (
        # bcast: const(1) scalar user-count agg
        sup2.crossJoin(F.broadcast(nu))
        .where(F.col("support2") * 20 >= F.col("nu"))
        .select("a", "b")
    )
    triple = (
        # bcast: const(<=|event_types|^2=25) support-kept type pairs
        pair.join(F.broadcast(keep2), ["a", "b"])
        .join(e, "user_id")
        .where(F.col("rn") > F.col("p2"))
        .select("user_id", "a", "b", F.col("t").alias("c"))
        .distinct()
    )
    sup3 = triple.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("support")
    )
    rw = Window.orderBy(F.col("support").desc(), "a", "b", "c")
    return (
        # bcast: const(1) scalar user-count agg
        sup3.crossJoin(F.broadcast(nu))
        .where(F.col("support") * 20 >= F.col("nu"))
        .select(
            "a",
            "b",
            "c",
            "support",
            F.round(
                F.col("support").cast("double") / F.col("nu"), 4
            ).alias("support_pct"),
            F.row_number().over(rw).alias("rnk"),
        )
    )


@register(
    "events_bootstrap_ci",
    """
    WITH bs_x AS (
      SELECT event_type, event_id,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    bs_rep AS (
      SELECT x.event_type, x.cents, r.b,
             (CAST(concat('0x', substr(md5(concat(
                'bs', CAST(r.b AS VARCHAR), '|',
                CAST(x.event_id AS VARCHAR))), 1, 15)) AS BIGINT) + 0.5)
               / 1152921504606846976.0 AS u
      FROM bs_x x CROSS JOIN (SELECT unnest(range(0, 32)) AS b) r),
    bs_w AS (
      SELECT event_type, b,
             CASE WHEN u <= 0.3678794411714423 THEN 0
                  WHEN u <= 0.7357588823428846 THEN 1
                  WHEN u <= 0.9196986029286058 THEN 2
                  WHEN u <= 0.9810118431238462 THEN 3
                  ELSE 4 END AS w,
             cents
      FROM bs_rep),
    bs_means AS (
      SELECT event_type, b,
             CAST(SUM(w * cents) AS BIGINT) AS swx,
             CAST(SUM(w) AS BIGINT) AS sw
      FROM bs_w GROUP BY 1, 2),
    bs_ranked AS (
      SELECT event_type,
             CAST(swx AS DOUBLE) / (sw * 100.0) AS mean_b,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY CAST(swx AS DOUBLE) / (sw * 100.0), b)
               AS INTEGER) AS rnk
      FROM bs_means WHERE sw > 0),
    bs_point AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS scents
      FROM bs_x GROUP BY 1)
    SELECT p.event_type, p.n,
           ROUND(CAST(p.scents AS DOUBLE) / (p.n * 100.0), 4)
             AS point_mean,
           ROUND(MAX(CASE WHEN r.rnk = 2 THEN r.mean_b END), 4) AS ci_lo,
           ROUND(MAX(CASE WHEN r.rnk = 31 THEN r.mean_b END), 4) AS ci_hi
    FROM bs_point p JOIN bs_ranked r USING (event_type)
    GROUP BY 1, 2, 3
    """,
    tags=("events", "statistics", "bootstrap", "confidence-interval"),
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean event value per type,
    via 32 POISSONIZED replicates: each (row, replicate) draws a
    Poisson(1) weight through the inverse CDF of a deterministic
    md5-derived uniform (the same replayable-noise trick as the DP
    release), so resampling is a pure column expression — one pass, no
    shuffled sampling, replicate means are single divisions over exact
    BIGINT weighted sums, and the percentile interval takes replicate
    ranks 2 and 31 (~94% coverage) with tiebroken ROW_NUMBER. The
    Poissonized bootstrap (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams") is THE distributed form:
    multinomial resampling needs global coordination, Poisson(1)
    weights don't. Scale: a constant 32x fan-out into a map-side-
    combinable (type, replicate) rollup — everything after is
    |types| x 32 rows. A production run swaps the salt for fresh
    entropy; the estimator is unchanged."""
    ev = table(spark, sf_dir, "events")
    x = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    rep = x.select(
        "event_type",
        "cents",
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bs"),
                        F.col("b").cast("string"),
                        F.lit("|"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 1152921504606846976.0
    w = (
        F.when(u <= 0.3678794411714423, 0)
        .when(u <= 0.7357588823428846, 1)
        .when(u <= 0.9196986029286058, 2)
        .when(u <= 0.9810118431238462, 3)
        .otherwise(4)
    )
    means = (
        rep.select("event_type", "b", w.alias("w"), "cents")
        .groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
    )
    mean_b = F.col("swx").cast("double") / (F.col("sw") * 100.0)
    rw = Window.partitionBy("event_type").orderBy(mean_b, "b")
    ranked = means.select(
        "event_type",
        mean_b.alias("mean_b"),
        F.row_number().over(rw).alias("rnk"),
    )
    point = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("scents")
    )
    return (
        point.join(ranked, "event_type")
        .groupBy(
            "event_type",
            "n",
            F.round(
                F.col("scents").cast("double") / (F.col("n") * 100.0), 4
            ).alias("point_mean"),
        )
        .agg(
            F.round(
                F.max(F.when(F.col("rnk") == 2, F.col("mean_b"))), 4
            ).alias("ci_lo"),
            F.round(
                F.max(F.when(F.col("rnk") == 31, F.col("mean_b"))), 4
            ).alias("ci_hi"),
        )
    )


@register(
    "events_overdispersion_index",
    """
    WITH od_daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    od_m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cnt) AS BIGINT) AS s1,
             CAST(SUM(cnt * cnt) AS BIGINT) AS s2
      FROM od_daily GROUP BY 1)
    SELECT event_type, n,
           ROUND(CAST(s1 AS DOUBLE) / n, 4) AS mean_daily,
           ROUND(CAST(n * s2 - s1 * s1 AS DOUBLE)
                 / (CAST(n - 1 AS DOUBLE) * s1), 4) AS dispersion_index,
           CAST(n * s2 - s1 * s1 AS DOUBLE)
             / (CAST(n - 1 AS DOUBLE) * s1) > 1.5 AS overdispersed
    FROM od_m WHERE n >= 2 AND s1 > 0
    """,
    tags=("events", "statistics", "diagnostics", "dispersion"),
)
def events_overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of daily event
    counts per type: ~1 means Poisson-like arrivals, >1.5 flags
    burstiness/clumping — the one-number test for "can I model this
    feed with a Poisson rate" that decides between the plain z-score
    monitors and the burst-aware ones (events_burst_days). Exact
    BIGINT moments off the daily rollup (n*s2 - s1^2 is the scaled
    sample variance numerator; products stay far under 2^63 at daily
    granularity — a per-second regime would move to DECIMAL(38,0) per
    the burst_days rule); two deterministic display divisions."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("ts").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    disp = (
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
            "double"
        )
        / ((F.col("n") - 1).cast("double") * F.col("s1"))
    )
    return m.where((F.col("n") >= 2) & (F.col("s1") > 0)).select(
        "event_type",
        "n",
        F.round(F.col("s1").cast("double") / F.col("n"), 4).alias(
            "mean_daily"
        ),
        F.round(disp, 4).alias("dispersion_index"),
        (disp > 1.5).alias("overdispersed"),
    )


@register(
    "events_acf_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    st AS (
      SELECT event_type, CAST(SUM(x) AS HUGEINT) AS s,
             CAST(COUNT(*) AS HUGEINT) AS n
      FROM daily GROUP BY 1),
    dv AS (
      SELECT d.event_type,
             ROW_NUMBER() OVER (
               PARTITION BY d.event_type ORDER BY d.day) AS rn,
             st.n * d.x - st.s AS dd,
             st.n AS n
      FROM daily d JOIN st USING (event_type)),
    den AS (
      SELECT event_type, SUM(dd * dd) AS den, ANY_VALUE(n) AS n
      FROM dv GROUP BY 1),
    num AS (
      SELECT a.event_type, CAST(b.rn - a.rn AS INTEGER) AS lag,
             SUM(a.dd * b.dd) AS num
      FROM dv a JOIN dv b
        ON a.event_type = b.event_type
       AND b.rn BETWEEN a.rn + 1 AND a.rn + 7
      GROUP BY 1, 2)
    SELECT num.event_type, num.lag,
           ROUND(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) + 0
             AS acf,
           CAST(den.n AS BIGINT) AS n_days
    FROM num JOIN den USING (event_type)
    WHERE den.den > 0
    """,
    tags=("events", "timeseries", "autocorrelation"),
)
def events_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily event counts, lags 1..7 per
    event type — the seasonality detector that tells a pipeline WHETHER
    a weekly component exists before it fits one (a strong lag-7 spike
    justifies events_seasonal_decompose's dow model; flat ACF says
    don't).

    Lag semantics: lags are OBSERVED-DAY POSITIONS (row offsets over
    the days present for the type), not calendar-day offsets — with a
    dense daily series they coincide and "lag 7" means weekly, but a
    gappy series shifts the interpretation. For sparse/gappy types,
    gap-fill the daily rollup first (interpolate_daily_events is the
    registry's gap-filler) before reading lag 7 as weekly seasonality.
    The oracle intentionally matches (rn-based join).

    Exactness: deviations are scaled by n BEFORE squaring
    (d_t = n*x_t − S, all integers), so numerator Σ d_t·d_{t+k} and
    denominator Σ d_t² are exact integer sums — decimal(38,0) here,
    HUGEINT in the oracle per the quadratic-overflow rule — and the ACF
    is ONE double division, ROUND(6)-guarded. Scale shape: one daily
    rollup (map-side combinable), one 7-lead window pass on the tiny
    per-type daily series (the lag join in the oracle is
    formulation-independent), no self-join of raw events."""
    ev = table(spark, sf_dir, "events")
    # the compact daily rollup feeds the per-type stats AND the
    # deviation join — lineage-cut so the raw-events scan is single-pass
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    ).localCheckpoint(eager=False)
    st = daily.groupBy("event_type").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    dv = daily.join(st, "event_type").select(
        "event_type",
        "day",
        "n",
        (
            F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("s")
        ).alias("dd"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    leads = dv.select(
        "event_type",
        "n",
        "dd",
        *[F.lead("dd", k).over(w).alias(f"dd{k}") for k in range(1, 8)],
    )
    agg = leads.groupBy("event_type").agg(
        F.sum(F.col("dd") * F.col("dd")).alias("den"),
        F.any_value("n").alias("n_days"),
        *[
            F.sum(F.col("dd") * F.col(f"dd{k}")).alias(f"num{k}")
            for k in range(1, 8)
        ],
    )
    stacked = agg.select(
        "event_type",
        "den",
        "n_days",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"), F.col(f"num{k}").alias("num")
                    )
                    for k in range(1, 8)
                ]
            )
        ).alias("kv"),
    )
    return (
        stacked.where(F.col("den") > 0)
        .where(F.col("kv.num").isNotNull())
        .select(
            "event_type",
            F.col("kv.lag").alias("lag"),
            round_stable(
                F.col("kv.num").cast("double") / F.col("den").cast("double"),
                6,
            ).alias("acf"),
            F.col("n_days").cast("long").alias("n_days"),
        )
    )


@register(
    "events_conformal_intervals",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS y_cents
      FROM events GROUP BY 1, 2),
    split AS (
      SELECT event_type, day, y_cents,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY day) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM daily),
    cal AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
             CAST(SUM(y_cents) AS BIGINT) AS s_cal
      FROM split WHERE rn <= nd // 2 GROUP BY 1),
    resid AS (
      SELECT s.event_type,
             ABS(s.y_cents * c.n_cal - c.s_cal) AS r
      FROM split s JOIN cal c USING (event_type)
      WHERE s.rn <= s.nd // 2),
    qhat AS (
      SELECT event_type, r AS q_scaled FROM (
        SELECT event_type, r, ROW_NUMBER() OVER (
                 PARTITION BY event_type ORDER BY r) AS k,
               COUNT(*) OVER (PARTITION BY event_type) AS n_cal
        FROM resid) t
      WHERE k = LEAST((9 * n_cal + 18) // 10, n_cal)),
    ev AS (
      SELECT s.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_eval,
             CAST(SUM(CASE WHEN ABS(s.y_cents * c.n_cal - c.s_cal)
                                <= q.q_scaled
                           THEN 1 ELSE 0 END) AS BIGINT) AS covered
      FROM split s
      JOIN cal c USING (event_type)
      JOIN qhat q USING (event_type)
      WHERE s.rn > s.nd // 2
      GROUP BY 1)
    SELECT ev.event_type, cal.n_cal, ev.n_eval, ev.covered,
           ROUND(CAST(q.q_scaled AS DOUBLE) / (100.0 * cal.n_cal), 4)
             AS q_hat,
           ROUND(CAST(ev.covered AS DOUBLE) / ev.n_eval, 4) AS coverage
    FROM ev JOIN cal USING (event_type) JOIN qhat q USING (event_type)
    """,
    tags=("events", "conformal", "uncertainty"),
)
def events_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk; Lei et al. 2018) for
    daily event value per type: calibrate on the first half of days
    (predictor = calibration mean), q-hat = the ceil(0.9·(n+1))-th
    smallest absolute residual — the distribution-free 90% interval
    radius — then the EMPIRICAL coverage of mean ± q-hat on the held-out
    second half. The uncertainty-quantification primitive modern ML
    monitoring wants where a parametric z-interval is wrong.

    Exactness: residuals are kept scaled by n_cal
    (|y·n_cal − S_cal|, pure BIGINT — the mean never materializes as a
    float), the order statistic is an integer ROW_NUMBER pick with the
    rank index computed by integer ceil ((9n+18) div 10), and coverage
    is an integer comparison count; only the two display columns
    divide. Scale: one daily rollup + per-type windows over tiny daily
    series."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("long").alias("y_cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    split = daily.select(
        "event_type",
        "day",
        "y_cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("nd"),
    ).localCheckpoint(eager=False)  # feeds cal, resid AND eval
    cal_rows = split.where(F.col("rn") <= F.expr("nd div 2"))
    cal = cal_rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cal"), F.sum("y_cents").alias("s_cal")
    )
    resid = cal_rows.join(cal, "event_type").select(
        "event_type",
        F.abs(F.col("y_cents") * F.col("n_cal") - F.col("s_cal")).alias("r"),
    )
    wr = Window.partitionBy("event_type").orderBy("r")
    qhat = (
        resid.select(
            "event_type",
            "r",
            F.row_number().over(wr).alias("k"),
            F.count(F.lit(1)).over(wall).alias("n_cal"),
        )
        .where(
            F.col("k")
            == F.least(
                F.expr("(9 * n_cal + 18) div 10"), F.col("n_cal")
            )
        )
        .select("event_type", F.col("r").alias("q_scaled"))
    )
    evh = (
        split.where(F.col("rn") > F.expr("nd div 2"))
        .join(cal, "event_type")
        .join(qhat, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                F.when(
                    F.abs(
                        F.col("y_cents") * F.col("n_cal") - F.col("s_cal")
                    )
                    <= F.col("q_scaled"),
                    1,
                ).otherwise(0)
            ).alias("covered"),
        )
    )
    return (
        evh.join(cal, "event_type")
        .join(qhat, "event_type")
        .select(
            "event_type",
            "n_cal",
            "n_eval",
            "covered",
            F.round(
                F.col("q_scaled").cast("double")
                / (F.lit(100.0) * F.col("n_cal")),
                4,
            ).alias("q_hat"),
            F.round(
                F.col("covered").cast("double") / F.col("n_eval"), 4
            ).alias("coverage"),
        )
    )


@register(
    "events_mannwhitney",
    """
    WITH mw_base AS (
      SELECT CAST(FLOOR(value * 100) AS BIGINT) AS v,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    mw_pv AS (
      SELECT v, CAST(SUM(t) AS BIGINT) AS tv,
             CAST(SUM(1 - t) AS BIGINT) AS cv
      FROM mw_base GROUP BY v),
    mw_cum AS (
      SELECT v, tv, cv,
             CAST(SUM(cv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  - cv AS BIGINT) AS cum_c_less
      FROM mw_pv),
    mw_agg AS (
      SELECT CAST(SUM(tv) AS BIGINT) AS n_treat,
             CAST(SUM(cv) AS BIGINT) AS n_ctrl,
             CAST(2 * SUM(tv * cum_c_less) + SUM(tv * cv) AS BIGINT)
               AS u2_treat,
             SUM((tv + cv)::HUGEINT * (tv + cv) * (tv + cv)
                 - (tv + cv))::HUGEINT AS tie3
      FROM mw_cum)
    SELECT n_treat, n_ctrl, u2_treat,
           (ROUND(CAST(u2_treat AS DOUBLE)
                  / (2.0 * CAST(n_treat::HUGEINT * n_ctrl AS DOUBLE)), 6)
            + 0) AS auc,
           (ROUND((CAST(u2_treat AS DOUBLE)
                   - CAST(n_treat::HUGEINT * n_ctrl AS DOUBLE))
                  / (2.0 * sqrt(
                      CAST(n_treat::HUGEINT * n_ctrl
                           * ((n_treat + n_ctrl)::HUGEINT
                              * (n_treat + n_ctrl - 1)
                              * (n_treat + n_ctrl + 1) - tie3) AS DOUBLE)
                      / CAST(12::HUGEINT * (n_treat + n_ctrl)
                             * (n_treat + n_ctrl - 1) AS DOUBLE))), 4)
            + 0) AS z
    FROM mw_agg
    """,
    tags=("events", "experiment", "nonparametric", "ranksum"),
)
def events_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U / rank-sum test of purchase value between the
    user_id-parity treatment split (`operators/experiment.py::
    mann_whitney_u`) — the nonparametric readout next to CUPED for
    whale-skewed revenue metrics, with AUC as the common-language
    effect size. U is exact integer over the value-compressed domain
    (no row ranking); the tie-corrected normal z spends floats only on
    the final division + sqrt over exact DECIMAL/HUGEINT moments."""
    from covid_data_pipeline_spark.operators.experiment import mann_whitney_u

    ev = table(spark, sf_dir, "events")
    units = ev.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
        (F.pmod(F.col("user_id"), F.lit(2)) == 1).alias("treat"),
    )
    return mann_whitney_u(units, treat_col="treat", value_col="value_cents")


@register(
    "events_conversion_ab",
    """
    WITH ab_units AS (
      SELECT user_id,
             MAX(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS t,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS c
      FROM events GROUP BY user_id),
    ab_agg AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n_treat,
             CAST(SUM(1 - t) AS BIGINT) AS n_ctrl,
             CAST(SUM(t * c) AS BIGINT) AS conv_treat,
             CAST(SUM((1 - t) * c) AS BIGINT) AS conv_ctrl
      FROM ab_units)
    SELECT n_treat, n_ctrl, conv_treat, conv_ctrl,
           CAST(CASE WHEN conv_ctrl * n_treat > 0 THEN
             (conv_treat::HUGEINT * n_ctrl - conv_ctrl::HUGEINT * n_treat)
               * 10000 // (conv_ctrl::HUGEINT * n_treat) END AS BIGINT)
             AS lift_bp,
           (ROUND(CASE WHEN conv_treat + conv_ctrl > 0
                       AND conv_treat + conv_ctrl < n_treat + n_ctrl
                       AND n_treat > 0 AND n_ctrl > 0 THEN
             CAST((conv_treat::HUGEINT * n_ctrl
                   - conv_ctrl::HUGEINT * n_treat) AS DOUBLE)
             / sqrt(
                 CAST((conv_treat + conv_ctrl)::HUGEINT
                      * (n_treat + n_ctrl - conv_treat - conv_ctrl)
                      AS DOUBLE)
                 * CAST(n_treat::HUGEINT * n_ctrl AS DOUBLE)
                 / CAST(n_treat + n_ctrl AS DOUBLE)) END, 4) + 0) AS z
    FROM ab_agg
    """,
    tags=("events", "experiment", "conversion", "ztest"),
)
def events_conversion_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion conversion z-test between the user_id-parity arms
    (`operators/experiment.py::two_proportion_ztest`): converted = the
    user logs >= 14 purchase events — the corpus median is ~13 per
    user, so the split is non-degenerate at every SF ("ever purchased"
    saturates at 100% and zeroes the pooled variance). The binary-outcome readout between srm_check
    (arm sizes) and CUPED (continuous value) — exact BIGINT counts,
    integer basis-point lift, z from one float division+sqrt over exact
    DECIMAL38/HUGEINT products."""
    from covid_data_pipeline_spark.operators.experiment import (
        two_proportion_ztest,
    )

    ev = table(spark, sf_dir, "events")
    units = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.pmod(F.col("user_id"), F.lit(2)) == 1, 1).otherwise(0)
        ).alias("t"),
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("c"),
    ).select(
        (F.col("t") == 1).alias("treat"), (F.col("c") == 1).alias("converted")
    )
    return two_proportion_ztest(units)


@register(
    "events_f2_ams",
    """
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
      WHERE user_id IS NOT NULL
    ),
    signed AS (
      SELECT j.j AS j,
             SUM(1 - 2 * (CAST(concat('0x', substr(md5(
                   concat('ams', CAST(j.j AS VARCHAR), ':', k)), 1, 15))
                 AS BIGINT) % 2)) AS s
      FROM ev CROSS JOIN range(16) j(j) GROUP BY 1
    ),
    x AS (SELECT j, CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS x FROM signed),
    exact AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2
      FROM (SELECT COUNT(*) AS c FROM ev GROUP BY k)
    ),
    est AS (SELECT CAST(SUM(x) AS DOUBLE) / 16.0 AS f2_est FROM x)
    SELECT 16 AS depth, exact_f2, f2_est,
           (ROUND((f2_est - exact_f2) / exact_f2 * 10000, 2) + 0)
             AS rel_err_bp
    FROM exact, est
    """,
    tags=("events", "sketch", "ams", "portable"),
    bench=True,
)
def events_f2_ams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war second-moment estimate
    (`operators/sketches.py::ams_f2_sketch`/`ams_f2_estimate`) vs the
    exact F2 of the per-user event counts — the sketch that prices a
    self-join (|events JOIN events ON user_id| = F2) from 16 BIGINT
    accumulators without running it. Completes the sketch toolbox's
    moment axis: F0 = HLL/theta, F1 = plain count, F2 = AMS, point
    freq = count-min, top-k = Misra-Gries, quantiles = bottom-k.
    Every signed sum is integer-exact with portable md5-parity signs;
    squares accumulate in DECIMAL(38,0)/HUGEINT (BIGINT squares
    overflow past ~3e9 rows/group), the mean over a power-of-two depth
    is dyadic, and the only signed-float output is round_stable'd.
    Scale shape: corpus touched once, map-side combine into
    depth-many accumulators per group."""
    from covid_data_pipeline_spark.operators.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
    )

    ev = table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    sk = ams_f2_sketch(ev, "user_id", depth=16)
    est = ams_f2_estimate(sk, depth=16)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("exact_f2"))
    )
    return exact.crossJoin(est).select(
        F.lit(16).alias("depth"),
        "exact_f2",
        "f2_est",
        round_stable(
            (F.col("f2_est") - F.col("exact_f2"))
            / F.col("exact_f2")
            * 10000,
            2,
        ).alias("rel_err_bp"),
    )


@register(
    "events_f2_ams_by_type",
    """
    WITH ev AS (
      SELECT event_type, CAST(user_id AS VARCHAR) AS k FROM events
      WHERE user_id IS NOT NULL
    ),
    signed AS (
      SELECT event_type, j.j AS j,
             SUM(1 - 2 * (CAST(concat('0x', substr(md5(
                   concat('ams', CAST(j.j AS VARCHAR), ':', k)), 1, 15))
                 AS BIGINT) % 2)) AS s
      FROM ev CROSS JOIN range(8) j(j) GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type, j,
             CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS x
      FROM signed),
    exact AS (
      SELECT event_type, CAST(SUM(c * c) AS BIGINT) AS exact_f2
      FROM (SELECT event_type, COUNT(*) AS c FROM ev GROUP BY event_type, k)
      GROUP BY 1
    ),
    est AS (
      SELECT event_type, CAST(SUM(x) AS DOUBLE) / 8.0 AS f2_est
      FROM x GROUP BY 1)
    SELECT e.event_type, x.exact_f2, e.f2_est
    FROM est e JOIN exact x USING (event_type)
    """,
    tags=("events", "sketch", "ams", "portable"),
)
def events_f2_ams_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped AMS: per-event-type F2 of the user frequency vector from
    ONE corpus pass (`ams_f2_sketch(group_cols=...)` — 8 accumulators
    per type in a single map-side-combining aggregate), next to each
    type's exact F2. The grouped form is how the sketch prices many
    self-joins at once — per-tenant, per-day, per-source — without
    re-scanning per group."""
    from covid_data_pipeline_spark.operators.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
    )

    ev = table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    est = ams_f2_estimate(
        ams_f2_sketch(ev, "user_id", group_cols=["event_type"], depth=8),
        group_cols=["event_type"],
        depth=8,
    )
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("event_type")
        .agg(F.sum(F.col("c") * F.col("c")).alias("exact_f2"))
    )
    return est.join(exact, "event_type").select(
        "event_type", "exact_f2", "f2_est"
    )


@register(
    "events_join_size_cm",
    """
    WITH js_ska AS (
      SELECT d.d AS d,
             CAST(concat('0x', substr(md5(concat(CAST(d.d AS VARCHAR), ':',
                    CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1024
               AS slot,
             CAST(COUNT(*) AS HUGEINT) AS cnt
      FROM events CROSS JOIN range(4) d(d)
      WHERE event_type = 'click' AND user_id IS NOT NULL
      GROUP BY 1, 2),
    js_skb AS (
      SELECT d.d AS d,
             CAST(concat('0x', substr(md5(concat(CAST(d.d AS VARCHAR), ':',
                    CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1024
               AS slot,
             CAST(COUNT(*) AS HUGEINT) AS cnt
      FROM events CROSS JOIN range(4) d(d)
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
      GROUP BY 1, 2),
    js_dot AS (
      SELECT a.d, SUM(a.cnt * b.cnt) AS dot
      FROM js_ska a JOIN js_skb b ON a.d = b.d AND a.slot = b.slot
      GROUP BY 1),
    js_est AS (
      SELECT MIN(COALESCE(dot, 0)) AS est
      FROM range(4) d(d) LEFT JOIN js_dot ON js_dot.d = d.d),
    js_exact AS (
      SELECT SUM(ca.c * cb.c) AS ex
      FROM (SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS c FROM events
            WHERE event_type = 'click' AND user_id IS NOT NULL
            GROUP BY 1) ca
      JOIN (SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS c FROM events
            WHERE event_type = 'purchase' AND user_id IS NOT NULL
            GROUP BY 1) cb USING (user_id))
    SELECT CAST(e.est AS BIGINT) AS join_size_est,
           CAST(x.ex AS BIGINT) AS exact_join_size,
           (ROUND(CAST(e.est AS DOUBLE) / CAST(x.ex AS DOUBLE), 6) + 0)
             AS over_ratio
    FROM js_est e, js_exact x
    """,
    tags=("events", "sketch", "countmin", "join-size", "portable"),
    bench=True,
)
def events_join_size_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation WITHOUT running the join
    (`operators/sketches.py::cm_inner_product`, Cormode &
    Muthukrishnan 2005 §4.2): the clicks⋈purchases-on-user_id
    cardinality priced from two count-min sketches — per depth row the
    counter dot product upper-bounds the true inner product (collisions
    only add cross terms), min over depth. This is the
    cost-based-optimizer statistic a 100 TB planner wants: two
    model-sized sketches (4x1024 integer counters each, one corpus pass
    apiece, mergeable across partitions) instead of the join itself.
    The exact join size rides along, making the never-underestimate
    guarantee visible data (est >= exact, asserted in tests); width
    1024 keeps collisions live so the overestimate is exercised.
    All-integer until the one display ratio."""
    from covid_data_pipeline_spark.operators.sketches import (
        cm_inner_product,
        cm_sketch,
    )
    from covid_data_pipeline_spark.functions.scalar import round_stable

    ev = table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    # BOTH sketches from ONE corpus pass: the grouped sketch keyed on
    # event_type produces per-type counters identical to two separate
    # cm_sketch calls over the filtered slices (same per-row md5 slots,
    # same counts — group_cols only adds the grouping key), then each
    # side is a filter over the ≤ 2·depth·width-row sketch relation.
    # One scan + one map-side-combining shuffle instead of two apiece
    # (guide §1.2: remove unnecessary passes).
    # (No lineage cut on sk: the two sides recompute in parallel stages
    # of one job — measured faster than checkpoint serialization.)
    sk = cm_sketch(
        ev.where(F.col("event_type").isin("click", "purchase")),
        "user_id",
        group_cols=["event_type"],
        depth=4,
        width=1024,
    )
    ska = sk.where(F.col("event_type") == "click").select("d", "slot", "cnt")
    skb = sk.where(F.col("event_type") == "purchase").select(
        "d", "slot", "cnt"
    )
    est = cm_inner_product(ska, skb)
    # Both per-user frequency vectors from ONE corpus pass (conditional
    # counts in a single groupBy) instead of two filtered aggregations
    # + an equi-join: Σ c·p over users with both counts positive is
    # exactly the inner join's Σ — one shuffle and no join (guide §2.3
    # "aggregate before you shuffle" / §1.2 fewer passes).
    exact = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("_c"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("_p"),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("_c") > 0) & (F.col("_p") > 0),
                    F.col("_c").cast("decimal(38,0)") * F.col("_p"),
                )
            )
            .cast("bigint")
            .alias("exact_join_size")
        )
    )
    # bcast: const(1) scalar exact size
    return est.crossJoin(F.broadcast(exact)).select(
        "join_size_est",
        "exact_join_size",
        round_stable(
            F.col("join_size_est").cast("double")
            / F.col("exact_join_size").cast("double"),
            6,
        ).alias("over_ratio"),
    )


@register(
    "events_bh_fdr_cohorts",
    """
    WITH bhq_b AS (
      SELECT concat(event_type, ':',
                    CAST((user_id // 2) % 10 AS VARCHAR)) AS hyp,
             user_id % 2 AS v,
             ((CAST(FLOOR(value * 100) AS BIGINT) % 3) + 3) % 3 AS b
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        AND value IS NOT NULL),
    bhq_obs AS (
      SELECT hyp, v, b, CAST(COUNT(*) AS DECIMAL(38,0)) AS o
      FROM bhq_b GROUP BY 1, 2, 3),
    bhq_r AS (
      SELECT hyp, v, CAST(COUNT(*) AS DECIMAL(38,0)) AS rt
      FROM bhq_b GROUP BY 1, 2),
    bhq_c AS (
      SELECT hyp, b, CAST(COUNT(*) AS DECIMAL(38,0)) AS ct
      FROM bhq_b GROUP BY 1, 2),
    bhq_n AS (
      SELECT hyp, CAST(COUNT(*) AS DECIMAL(38,0)) AS n
      FROM bhq_b GROUP BY 1),
    bhq_grid AS (
      SELECT r.hyp, r.v, c.b, r.rt, c.ct, n.n,
             COALESCE(o.o, CAST(0 AS DECIMAL(38,0))) AS o
      FROM bhq_r r
      JOIN bhq_c c ON c.hyp = r.hyp
      JOIN bhq_n n ON n.hyp = r.hyp
      LEFT JOIN bhq_obs o ON o.hyp = r.hyp AND o.v = r.v AND o.b = c.b),
    bhq_chi AS (
      SELECT hyp,
             CAST(ROUND(SUM(CAST(ROUND(
               CAST((o * n - rt * ct) * (o * n - rt * ct) AS DOUBLE)
               / CAST(n * rt * ct AS DOUBLE), 6) AS DECIMAL(18,6))), 4)
               AS DOUBLE) AS chi2,
             (COUNT(DISTINCT v) - 1) * (COUNT(DISTINCT b) - 1) AS dof,
             CAST(MAX(n) AS BIGINT) AS n
      FROM bhq_grid GROUP BY 1),
    bhq_p AS (
      SELECT hyp, chi2, n,
             CAST(ROUND(exp(-chi2 / 2) * 1e6, 0) AS BIGINT) AS p_micro
      FROM bhq_chi WHERE dof = 2),
    bhq_m AS (SELECT COUNT(*) AS m FROM bhq_p),
    bhq_rk AS (
      SELECT p.*, CAST(ROW_NUMBER() OVER (ORDER BY p_micro, hyp)
                       AS BIGINT) AS p_rank, t.m
      FROM bhq_p p CROSS JOIN bhq_m t),
    bhq_k AS (
      SELECT MAX(CASE WHEN p_micro * m * 100 <= p_rank * 5 * 1000000
                      THEN p_rank END) AS k
      FROM bhq_rk)
    SELECT r.hyp, r.chi2, r.n, r.p_micro, r.p_rank,
           r.p_rank <= COALESCE(k.k, 0) AS reject
    FROM bhq_rk r CROSS JOIN bhq_k k
    """,
    tags=("events", "experiment", "fdr", "multiple-testing"),
)
def events_bh_fdr_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a battery of 50 per-cohort
    independence tests (`operators/experiment.py::
    grouped_independence_chi2` -> `benjamini_hochberg`): for every
    (event_type x user-cohort) hypothesis — the cohort key
    (user_id div 2) mod 10 is independent of the parity being tested —
    does the event's value bucket depend on user parity? Each 2x3 chi-square is exact decimal
    cell arithmetic (zero cells via the per-group marginal cross
    join); dof=2 makes p = exp(-chi2/2) the EXACT survival function,
    quantized once to micro-p; the step-up reject set is then pure
    BIGINT inequality over distributed ranks — the full
    multiple-testing pipeline, hash-verified end to end."""
    from covid_data_pipeline_spark.operators.experiment import (
        benjamini_hochberg,
        grouped_independence_chi2,
    )

    ev = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            F.concat(
                F.col("event_type"),
                F.lit(":"),
                (F.expr("user_id div 2") % 10).cast("string"),
            ).alias("hyp"),
            (F.col("user_id") % 2).alias("_v"),
            (
                (F.floor(F.col("value") * 100).cast("bigint") % 3 + 3) % 3
            ).alias("_b"),
        )
    )
    chi = grouped_independence_chi2(ev, ["hyp"], "_v", "_b").where(
        F.col("dof") == 2
    )
    p = chi.select(
        "hyp",
        "chi2",
        "n",
        F.round(F.exp(-F.col("chi2") / 2) * 1e6, 0)
        .cast("bigint")
        .alias("p_micro"),
    )
    return benjamini_hochberg(p, "p_micro", "hyp", q_num=5, q_den=100)


@register(
    "events_seasonal_strength",
    """
    WITH sstr_d AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2),
    sstr_ph AS (
      SELECT event_type, t, v, ((t % 7) + 7) % 7 AS ph FROM sstr_d),
    sstr_rk AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
                  PARTITION BY event_type, ph ORDER BY v, t)
                AS BIGINT) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, ph) AS gn
      FROM sstr_ph),
    sstr_m AS (
      SELECT event_type, ph,
             CASE WHEN MAX(gn) % 2 = 1 THEN SUM(v) * 2 ELSE SUM(v) END
               AS m2
      FROM sstr_rk
      WHERE rn = (gn + 1) // 2 OR rn = (gn + 2) // 2
      GROUP BY 1, 2),
    sstr_r AS (
      SELECT p.event_type,
             CAST(p.v * 2 AS HUGEINT) AS w,
             CAST(p.v * 2 - m.m2 AS HUGEINT) AS r
      FROM sstr_ph p JOIN sstr_m m
        ON m.event_type = p.event_type AND m.ph = p.ph),
    sstr_a AS (
      SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(w) AS sw, SUM(w * w) AS sww,
             SUM(r) AS sr, SUM(r * r) AS srr
      FROM sstr_r GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_obs,
           CASE WHEN n * sww - sw * sw = 0 THEN NULL
                ELSE ROUND(GREATEST(
                  1.0 - CAST(n * srr - sr * sr AS DOUBLE)
                        / CAST(n * sww - sw * sw AS DOUBLE),
                  0.0), 6) END AS strength
    FROM sstr_a
    """,
    tags=("events", "temporal", "seasonality"),
)
def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonal-strength diagnostic of the daily event volume
    per type (`operators/temporal.py::seasonal_strength`): fraction of
    daily-count variance explained by the per-weekday MEDIAN profile,
    STL-free on the integer lattice — doubled-median order stats keep
    residuals integral, both sums of squares use the mean-free
    n*Sum(w^2) - Sum(w)^2 form in exact decimals, one final division.
    The day-of-week phase is epoch_day mod 7 (no engine dayofweek
    origin mismatch). Near 0 = volume is aperiodic; near 1 = strongly
    weekly."""
    from covid_data_pipeline_spark.operators.temporal import (
        seasonal_strength,
    )

    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("_t"),
        )
        .agg(F.count(F.lit(1)).alias("_v"))
    )
    return seasonal_strength(
        daily, ["event_type"], "_t", "_v", period=7
    )


@register(
    "events_ransac_trend",
    """
    WITH rns_d AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2),
    rns_p AS (
      SELECT event_type, x, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY x, y) AS BIGINT) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM rns_d),
    rns_c AS (
      SELECT p1.event_type, p1.x AS x1, p1.y AS y1,
             p2.x AS x2, p2.y AS y2, p1.n
      FROM rns_p p1 JOIN rns_p p2
        ON p2.event_type = p1.event_type AND p2.r = p1.r + p1.n // 2
      WHERE abs(p2.x - p1.x) >= 1),
    rns_s AS (
      SELECT c.event_type, c.x1, c.y1, c.x2, c.y2, c.n,
             SUM(CASE WHEN abs((d.y - c.y1) * (c.x2 - c.x1)
                              - (c.y2 - c.y1) * (d.x - c.x1))
                        <= 10 * abs(c.x2 - c.x1)
                      THEN 1 ELSE 0 END) AS inl
      FROM rns_c c JOIN rns_d d USING (event_type)
      GROUP BY 1, 2, 3, 4, 5, 6),
    rns_b AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY inl DESC, x1, x2, y1, y2) AS rn
      FROM rns_s),
    rns_n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points
      FROM rns_d GROUP BY 1)
    SELECT k.event_type, k.n_points,
           CAST(b.inl AS BIGINT) AS n_inliers,
           (ROUND(CAST(b.y2 - b.y1 AS DOUBLE)
                  / CAST(b.x2 - b.x1 AS DOUBLE), 6) + 0) AS slope,
           CAST(b.x1 AS BIGINT) AS x1, CAST(b.x2 AS BIGINT) AS x2
    FROM rns_n k LEFT JOIN (SELECT * FROM rns_b WHERE rn = 1) b
      USING (event_type)
    """,
    tags=("events", "temporal", "robust-regression", "ransac"),
)
def events_ransac_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derandomized RANSAC trend of daily event volume per type
    (`operators/temporal.py::ransac_trend`): half-offset candidate
    pairs, all-integer consensus test |(y-y1)dx - dy(x-x1)| <= eps|dx|
    at eps=10, winner by (inliers, smallest pair) — reporting not just
    a robust slope (Theil-Sen's job) but HOW MANY days the consensus
    line explains, the number an anomaly triage actually reads. Only
    the reported slope is a float division. Keys with no valid
    candidate pair surface with n_points and NULL fit columns
    (ADVICE r9) — mirrored by the oracle's LEFT JOIN."""
    from covid_data_pipeline_spark.operators.temporal import ransac_trend

    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("_x"),
        )
        .agg(F.count(F.lit(1)).alias("_y"))
    )
    return ransac_trend(
        daily, ["event_type"], "_x", "_y", eps=10, min_span=1
    )


@register(
    "events_annotator_kappa",
    """
    WITH kap_r AS (
      SELECT CASE WHEN value < 25 THEN 'low'
                  WHEN value < 75 THEN 'mid' ELSE 'high' END AS a,
             CASE WHEN value + (event_id % 11) - 5 < 25 THEN 'low'
                  WHEN value + (event_id % 11) - 5 < 75 THEN 'mid'
                  ELSE 'high' END AS b
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
    kap_c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
              FROM kap_r GROUP BY 1, 2),
    kap_n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM kap_c),
    kap_d AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS d
              FROM kap_c WHERE a = b),
    kap_ra AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra
               FROM kap_c GROUP BY 1),
    kap_rb AS (SELECT b AS a, CAST(SUM(c) AS BIGINT) AS rb
               FROM kap_c GROUP BY 1),
    kap_pe AS (
      SELECT COALESCE(SUM(ra::HUGEINT * rb), 0) AS pes
      FROM kap_ra JOIN kap_rb USING (a)),
    kap_cl AS (
      SELECT CAST(COUNT(DISTINCT cl) AS BIGINT) AS n_classes
      FROM (SELECT a AS cl FROM kap_c UNION SELECT b FROM kap_c))
    SELECT n.n, cl.n_classes,
           (ROUND(CAST(d.d AS DOUBLE) / CAST(n.n AS DOUBLE), 6) + 0)
             AS po,
           (ROUND(CAST(p.pes AS DOUBLE)
                  / CAST(n.n::HUGEINT * n.n AS DOUBLE), 6) + 0) AS pe,
           (ROUND(CAST(n.n::HUGEINT * d.d - p.pes AS DOUBLE)
                  / CAST(n.n::HUGEINT * n.n - p.pes AS DOUBLE), 6) + 0)
             AS kappa
    FROM kap_n n CROSS JOIN kap_d d CROSS JOIN kap_pe p
    CROSS JOIN kap_cl cl
    """,
    tags=("events", "evaluation", "agreement", "statistics"),
)
def events_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic event-severity raters
    (`operators/experiment.py::cohens_kappa`, Cohen 1960): rater A
    buckets raw value into low/mid/high, rater B buckets a perturbed
    reading (value + event_id mod 11 − 5) — the inter-annotator-
    agreement gate a labeling pipeline runs before trusting either
    rule. kappa is ONE integer rational (n·Σdiag − Σr·c)/(n² − Σr·c)
    over DECIMAL(38,0) counts; po/pe spend one division each."""
    from covid_data_pipeline_spark.operators.experiment import cohens_kappa

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_id").isNotNull()
    )

    def bucket(v):
        return (
            F.when(v < 25, "low").when(v < 75, "mid").otherwise("high")
        )

    rated = ev.select(
        bucket(F.col("value")).alias("_a"),
        bucket(
            F.col("value") + (F.col("event_id") % 11) - 5
        ).alias("_b"),
    )
    return cohens_kappa(rated, "_a", "_b")


@register(
    "events_js_divergence",
    """
    WITH jsd_b AS (
      SELECT event_type,
             LEAST(9, GREATEST(0, CAST(FLOOR(value / 50) AS INT)))
               AS bin
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL),
    jsd_gb AS (SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
               FROM jsd_b GROUP BY 1, 2),
    jsd_ng AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS ng
               FROM jsd_gb GROUP BY 1),
    jsd_gl AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS cb
               FROM jsd_gb GROUP BY 1),
    jsd_t AS (SELECT CAST(SUM(cb) AS BIGINT) AS nt FROM jsd_gl),
    jsd_grid AS (
      SELECT g.event_type, g.ng, b.bin, b.cb,
             CAST(COALESCE(x.c, 0) AS BIGINT) AS c, t.nt
      FROM jsd_ng g CROSS JOIN jsd_gl b
      LEFT JOIN jsd_gb x
        ON x.event_type = g.event_type AND x.bin = b.bin
      CROSS JOIN jsd_t t),
    jsd_terms AS (
      SELECT event_type, ng,
        CAST(ROUND((
          CASE WHEN c > 0
            THEN (CAST(c AS DOUBLE) / CAST(ng AS DOUBLE))
               * ln((CAST(c AS DOUBLE) / CAST(ng AS DOUBLE))
                    / ((CAST(c AS DOUBLE) / CAST(ng AS DOUBLE)
                        + CAST(cb AS DOUBLE) / CAST(nt AS DOUBLE))
                       / 2.0))
            ELSE 0.0 END
        + CASE WHEN cb > 0
            THEN (CAST(cb AS DOUBLE) / CAST(nt AS DOUBLE))
               * ln((CAST(cb AS DOUBLE) / CAST(nt AS DOUBLE))
                    / ((CAST(c AS DOUBLE) / CAST(ng AS DOUBLE)
                        + CAST(cb AS DOUBLE) / CAST(nt AS DOUBLE))
                       / 2.0))
            ELSE 0.0 END
        ) / 2.0 * 1e9, 0) AS BIGINT) AS nano
      FROM jsd_grid)
    SELECT event_type, MAX(ng) AS n,
           CAST(SUM(nano) AS BIGINT) AS jsd_nano,
           (ROUND(CAST(SUM(nano) AS BIGINT) / 1e9, 6) + 0) AS jsd
    FROM jsd_terms
    GROUP BY 1
    """,
    tags=("events", "monitoring", "drift", "statistics"),
)
def events_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each event type's value-bucket
    distribution vs the global corpus distribution
    (`operators/experiment.py::js_divergence`, Lin IEEE-IT'91) — the
    bounded symmetric drift score (0 ≤ JSD ≤ ln 2) that stays finite
    on empty bins where PSI's ratio explodes: "which cohorts deviate
    from the mix" for data-mix audits. Per-cell terms are nano-nat-
    rounded IEEE expressions over exact integer rationals summed in
    BIGINT (the PSI lattice rule); the dense grid is |types × 10|."""
    from covid_data_pipeline_spark.operators.experiment import (
        js_divergence,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    binned = ev.select(
        "event_type",
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0), F.floor(F.col("value") / 50).cast("int")
            ),
        ).alias("_bin"),
    )
    return js_divergence(binned, "event_type", "_bin")


@register(
    "events_robust_anomalies",
    """
    WITH rz_d AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2),
    rz_r AS (
      SELECT event_type, x, v,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY v, x) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM rz_d),
    rz_m AS (
      SELECT event_type,
             CAST(CASE WHEN MAX(n) % 2 = 1 THEN SUM(v) * 2
                       ELSE SUM(v) END AS BIGINT) AS med2
      FROM rz_r
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY 1),
    rz_dev AS (
      SELECT d.event_type, d.x, d.v, m.med2,
             ABS(2 * d.v - m.med2) AS dd
      FROM rz_d d JOIN rz_m m USING (event_type)),
    rz_r2 AS (
      SELECT event_type, x, dd,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY dd, x) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM rz_dev),
    rz_mad AS (
      SELECT event_type,
             CAST(CASE WHEN MAX(n) % 2 = 1 THEN SUM(dd) * 2
                       ELSE SUM(dd) END AS BIGINT) AS mad4
      FROM rz_r2
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY 1)
    SELECT d.event_type, d.x, d.v,
           (ROUND((1.349 * CAST(2 * d.v - d.med2 AS DOUBLE))
                  / NULLIF(CAST(a.mad4 AS DOUBLE), 0), 4) + 0)
             AS robust_z,
           d.dd * 1349 > a.mad4 * 1750 AS is_outlier
    FROM rz_dev d JOIN rz_mad a USING (event_type)
    """,
    tags=("events", "anomaly", "robust-statistics", "temporal"),
)
def events_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD modified z-score over daily event volume per type
    (`operators/temporal.py::robust_zscore`, Iglewicz-Hoaglin 1993) —
    the robust twin of events_zscore_anomalies: one anomalous spike
    inflates a mean/std z until it masks its own siblings; the median
    and MAD don't move. The outlier verdict 1349·|2v−med2| >
    1750·mad4 is pure BIGINT over doubled order statistics (exact for
    odd/even day counts alike, MAD=0 degenerate handled naturally);
    only the display z spends a division."""
    from covid_data_pipeline_spark.operators.temporal import robust_zscore

    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("_x"),
        )
        .agg(F.count(F.lit(1)).alias("_v"))
    )
    return robust_zscore(daily, ["event_type"], "_x", "_v")


@register(
    "events_mcnemar_raters",
    """
    WITH mcn_b AS (
      SELECT (value >= 50) AS y,
             (value + (event_id % 11) - 5 >= 50) AS a,
             (value + (event_id % 7) - 3 >= 50) AS b
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
    mcn_g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((a = y)::INT) AS BIGINT) AS na,
             CAST(SUM((b = y)::INT) AS BIGINT) AS nb,
             CAST(SUM((a = y AND b <> y)::INT) AS BIGINT) AS b,
             CAST(SUM((a <> y AND b = y)::INT) AS BIGINT) AS c
      FROM mcn_b)
    SELECT n,
           (ROUND(CAST(na AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0)
             AS acc_a,
           (ROUND(CAST(nb AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0)
             AS acc_b,
           b, c,
           (ROUND(CAST((b - c)::HUGEINT * (b - c) AS DOUBLE)
                  / NULLIF(CAST(b + c AS DOUBLE), 0), 6) + 0) AS chi2,
           (b - c)::HUGEINT * (b - c) * 1000 > 3841::HUGEINT * (b + c)
             AS significant
    FROM mcn_g
    """,
    tags=("events", "evaluation", "paired-test", "statistics"),
)
def events_mcnemar_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between two deterministic threshold
    raters against the value-derived truth (`operators/experiment.py::
    mcnemar_test`, McNemar 1947) — the statistically correct "is
    classifier A better than B on the SAME rows" readout (two
    unpaired accuracies ignore the pairing; only the discordant
    counts b and c carry information). chi² = (b−c)²/(b+c) is one
    exact integer rational; the 95% verdict 1000·(b−c)² > 3841·(b+c)
    is pure BIGINT."""
    from covid_data_pipeline_spark.operators.experiment import mcnemar_test

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_id").isNotNull()
    )
    rated = ev.select(
        (F.col("value") >= 50).alias("_y"),
        (F.col("value") + (F.col("event_id") % 11) - 5 >= 50).alias("_a"),
        (F.col("value") + (F.col("event_id") % 7) - 3 >= 50).alias("_b"),
    )
    return mcnemar_test(rated, "_y", "_a", "_b")


@register(
    "events_kruskal_wallis",
    """
    WITH kw_b AS (
      SELECT event_type AS g, CAST(FLOOR(value) AS BIGINT) AS v
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
    kw_gv AS (
      SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c FROM kw_b GROUP BY 1, 2),
    kw_v AS (
      SELECT v, CAST(SUM(c) AS BIGINT) AS nv FROM kw_gv GROUP BY 1),
    kw_r AS (
      SELECT v, nv,
             COALESCE(SUM(nv) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_less
      FROM kw_v),
    kw_g AS (
      SELECT gv.g, CAST(SUM(gv.c) AS BIGINT) AS ng,
             CAST(SUM(CAST(gv.c AS HUGEINT)
                      * (2 * r.cum_less + r.nv + 1)) AS HUGEINT) AS r2
      FROM kw_gv gv JOIN kw_r r USING (v) GROUP BY 1),
    kw_glob AS (
      SELECT CAST(SUM(nv) AS BIGINT) AS n,
             CAST(SUM(CAST(nv AS HUGEINT) * nv * nv - nv) AS HUGEINT)
               AS tie3
      FROM kw_v),
    kw_t AS (
      SELECT CAST(ROUND(3.0 * CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
               / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE)
                  * (CAST(n AS DOUBLE) + 1.0)) * 1e6, 0) AS BIGINT)
               AS micro,
             n, tie3
      FROM kw_g, kw_glob),
    kw_a AS (
      SELECT MAX(n) AS n, CAST(COUNT(*) AS INT) AS k,
             CAST(SUM(micro) AS BIGINT) AS sum_micro,
             MAX(tie3) AS tie3
      FROM kw_t)
    SELECT n, k, CAST(k - 1 AS INT) AS df,
           sum_micro - CAST(3 * (n + 1) * 1000000 AS BIGINT) AS h_micro,
           (ROUND(CAST(sum_micro AS DOUBLE) / 1e6
                  - 3.0 * (CAST(n AS DOUBLE) + 1.0), 4) + 0) AS h,
           (ROUND((CAST(sum_micro AS DOUBLE) / 1e6
                   - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                  / NULLIF(1.0 - CAST(tie3 AS DOUBLE)
                    / NULLIF(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                             * CAST(n AS DOUBLE) - CAST(n AS DOUBLE),
                             0.0), 0.0), 4) + 0) AS h_corrected
    FROM kw_a
    """,
    tags=("events", "hypothesis-test", "rank-statistics", "statistics"),
    bench=True,
)
def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five event types' floored value
    distributions (`operators/experiment.py::kruskal_wallis`, Kruskal
    & Wallis JASA 1952) — the nonparametric "do ANY cohorts differ"
    gate to run before k*(k-1)/2 pairwise Mann-Whitney tests inflate
    the false-positive rate. No row is ever ranked: doubled average
    ranks off the value-compressed domain, exact DECIMAL rank sums,
    per-group H contributions micro-rounded onto an integer lattice
    (the PSI rule) so the cross-group sum is engine-invariant."""
    from covid_data_pipeline_spark.operators.experiment import kruskal_wallis

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    binned = ev.select(
        F.col("event_type").alias("_g"),
        F.floor("value").cast("bigint").alias("_v"),
    )
    return kruskal_wallis(binned, "_g", "_v")


@register(
    "events_brown_forsythe",
    """
    WITH bf_b AS (
      SELECT event_type AS g,
             CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
    bf_r AS (
      SELECT g, v,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS gn
      FROM bf_b),
    bf_m AS (
      SELECT g,
             CAST(CASE WHEN MAX(gn) % 2 = 1 THEN SUM(v) * 2
                       ELSE SUM(v) END AS BIGINT) AS med2
      FROM bf_r
      WHERE rn = (gn + 1) // 2 OR rn = (gn + 2) // 2
      GROUP BY 1),
    bf_d AS (
      SELECT b.g, ABS(2 * b.v - m.med2) AS d
      FROM bf_b b JOIN bf_m m USING (g)),
    bf_g AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(CAST(d AS HUGEINT)) AS HUGEINT) AS s,
             CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS q
      FROM bf_d GROUP BY 1),
    bf_a AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n,
             CAST(COUNT(*) AS INT) AS k,
             CAST(SUM(CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
               / CAST(ng AS DOUBLE), 0) AS HUGEINT)) AS HUGEINT) AS a,
             CAST(SUM(s) AS HUGEINT) AS stot,
             CAST(SUM(q) AS HUGEINT) AS qtot
      FROM bf_g),
    bf_s AS (
      SELECT n, k,
             GREATEST(CAST(0 AS HUGEINT), a
               - CAST(ROUND(CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
                 / CAST(n AS DOUBLE), 0) AS HUGEINT)) AS ssb,
             GREATEST(CAST(0 AS HUGEINT), qtot - a) AS ssw
      FROM bf_a)
    SELECT n, k, CAST(k - 1 AS INT) AS df1,
           CAST(n - k AS BIGINT) AS df2,
           (ROUND((CAST(ssb AS DOUBLE)
                   / NULLIF(CAST(k - 1 AS DOUBLE), 0.0))
                  / NULLIF(CAST(ssw AS DOUBLE)
                           / NULLIF(CAST(n - k AS DOUBLE), 0.0), 0.0),
                  4) + 0) AS f_bf
    FROM bf_s
    """,
    tags=("events", "hypothesis-test", "robust-statistics", "statistics"),
)
def events_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe homogeneity-of-variance test across event types
    on integer-cent values (`operators/experiment.py::brown_forsythe`,
    Brown & Forsythe JASA 1974) — the median-centered Levene: a
    one-way ANOVA F over |v - median_g| on the doubled-order-statistic
    lattice (exact group medians, integer deviations, DECIMAL moments;
    only S_g^2/n_g crosses to the unit lattice before the
    engine-invariant sum)."""
    from covid_data_pipeline_spark.operators.experiment import brown_forsythe

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    cents = ev.select(
        F.col("event_type").alias("_g"),
        F.floor(F.col("value") * 100).cast("bigint").alias("_v"),
    )
    return brown_forsythe(cents, "_g", "_v")


@register(
    "events_wasserstein_drift",
    """
    WITH wd_b AS (
      SELECT (EXTRACT(MONTH FROM ts) <= 6) AS a,
             CAST(FLOOR(value * 100) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    wd_pv AS (
      SELECT v, CAST(SUM(a::INT) AS BIGINT) AS av,
             CAST(SUM((NOT a)::INT) AS BIGINT) AS bv
      FROM wd_b GROUP BY 1),
    wd_c AS (
      SELECT v, av, bv,
             CAST(SUM(av) OVER w AS BIGINT) AS ca,
             CAST(SUM(bv) OVER w AS BIGINT) AS cb,
             LEAD(v) OVER (ORDER BY v) - v AS dv
      FROM wd_pv
      WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
    wd_t AS (
      SELECT CAST(SUM(av) AS BIGINT) AS na,
             CAST(SUM(bv) AS BIGINT) AS nb
      FROM wd_pv),
    wd_s AS (
      SELECT MAX(na) AS na, MAX(nb) AS nb,
             CAST(SUM(ABS(CAST(ca AS HUGEINT) * nb
                          - CAST(cb AS HUGEINT) * na)
                      * COALESCE(dv, 0)) AS HUGEINT) AS num
      FROM wd_c, wd_t)
    SELECT na AS n_a, nb AS n_b,
           (ROUND(CAST(num AS DOUBLE)
                  / CAST(CAST(na AS HUGEINT) * nb AS DOUBLE), 6) + 0)
             AS w1
    FROM wd_s
    """,
    tags=("events", "monitoring", "drift", "statistics"),
)
def events_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth mover's distance between H1 and H2 event-value
    distributions in integer cents (`operators/experiment.py::
    wasserstein_1d`) — the drift readout in the VALUE'S OWN UNITS
    ("H2 values sit 3.17 cents of mass-distance from H1"), sensitive
    to how far mass moved where KS sees only the max CDF gap and
    PSI/JSD only bin ratios. The integral is exact: per-segment
    |cum_a*N_b - cum_b*N_a|*dv integers in DECIMAL(38,0) over the
    value-compressed grid, one division at the end."""
    from covid_data_pipeline_spark.operators.experiment import (
        wasserstein_1d,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    coh = ev.select(
        (F.month("ts") <= 6).alias("_a"),
        F.floor(F.col("value") * 100).cast("bigint").alias("_v"),
    )
    return wasserstein_1d(coh, "_a", "_v")


@register(
    "events_fleiss_kappa",
    """
    WITH flk_b AS (
      SELECT event_id AS i, value AS v
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
    flk_r AS (
      SELECT i, CASE WHEN v + (i % 11) - 5 < 30 THEN 'low'
                     WHEN v + (i % 11) - 5 < 70 THEN 'mid'
                     ELSE 'high' END AS c FROM flk_b
      UNION ALL
      SELECT i, CASE WHEN v + (i % 7) - 3 < 30 THEN 'low'
                     WHEN v + (i % 7) - 3 < 70 THEN 'mid'
                     ELSE 'high' END AS c FROM flk_b
      UNION ALL
      SELECT i, CASE WHEN v + (i % 13) - 6 < 30 THEN 'low'
                     WHEN v + (i % 13) - 6 < 70 THEN 'mid'
                     ELSE 'high' END AS c FROM flk_b),
    flk_ic AS (
      SELECT i, c, CAST(COUNT(*) AS BIGINT) AS nic
      FROM flk_r GROUP BY 1, 2),
    flk_m AS (
      SELECT i, CAST(SUM(nic) AS BIGINT) AS mi FROM flk_ic GROUP BY 1),
    flk_ex AS (
      SELECT CAST(SUM(CASE WHEN mi <> 3 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_excluded
      FROM flk_m),
    flk_k AS (
      SELECT ic.i, ic.c, ic.nic
      FROM flk_ic ic JOIN flk_m m ON ic.i = m.i AND m.mi = 3),
    flk_a AS (
      SELECT CAST(COUNT(DISTINCT i) AS BIGINT) AS n,
             CAST(SUM(CAST(nic AS HUGEINT) * nic) AS HUGEINT) AS a
      FROM flk_k),
    flk_bb AS (
      SELECT CAST(COUNT(*) AS INT) AS n_categories,
             CAST(SUM(CAST(tc AS HUGEINT) * tc) AS HUGEINT) AS b
      FROM (SELECT c, CAST(SUM(nic) AS HUGEINT) AS tc
            FROM flk_k GROUP BY 1)),
    flk_s AS (
      SELECT a.n, e.n_excluded, bb.n_categories,
             CAST(a.a - CAST(a.n AS HUGEINT) * 3 AS DOUBLE)
               / NULLIF(CAST(a.n AS DOUBLE) * 3.0 * 2.0, 0.0) AS p_bar,
             CAST(bb.b AS DOUBLE)
               / NULLIF((CAST(a.n AS DOUBLE) * 3.0)
                        * (CAST(a.n AS DOUBLE) * 3.0), 0.0) AS p_e
      FROM flk_a a, flk_bb bb, flk_ex e)
    SELECT n AS n_items, n_excluded, CAST(3 AS INT) AS m, n_categories,
           (ROUND(p_bar, 6) + 0) AS p_bar,
           (ROUND(p_e, 6) + 0) AS p_e,
           (ROUND((p_bar - p_e) / NULLIF(1.0 - p_e, 0.0), 6) + 0)
             AS kappa
    FROM flk_s
    """,
    tags=("events", "evaluation", "agreement", "statistics"),
)
def events_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across THREE deterministic jittered threshold
    raters bucketing each event's value into low/mid/high
    (`operators/experiment.py::fleiss_kappa`, Fleiss 1971) — the
    multi-rater agreement QA that Cohen's kappa (two fixed raters,
    events_annotator_kappa) and McNemar (paired accuracy) cannot
    give: one chance-corrected number for an m-annotator labeling
    pipeline. A, B, N are exact DECIMAL moments; kappa is one
    single-row IEEE expression."""
    from covid_data_pipeline_spark.operators.experiment import fleiss_kappa

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_id").isNotNull()
    )

    def cat(jit):
        v = F.col("value") + jit
        return (
            F.when(v < 30, "low").when(v < 70, "mid").otherwise("high")
        )

    rated = ev.select(
        "event_id",
        F.explode(
            F.array(
                cat((F.col("event_id") % 11) - 5),
                cat((F.col("event_id") % 7) - 3),
                cat((F.col("event_id") % 13) - 6),
            )
        ).alias("_c"),
    )
    return fleiss_kappa(rated, "event_id", "_c", 3)


@register(
    "events_weighted_kappa",
    """
    WITH wk_b AS (
      SELECT LEAST(9, GREATEST(0, CAST(FLOOR(
               (value + (event_id % 11) - 5) / 10) AS BIGINT))) AS a,
             LEAST(9, GREATEST(0, CAST(FLOOR(
               (value + (event_id % 7) - 3) / 10) AS BIGINT))) AS b
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
    wk_o AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM wk_b GROUP BY 1, 2),
    wk_os AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(SUM(ABS(a - b) * CAST(o AS HUGEINT)) AS HUGEINT)
               AS lo,
             CAST(SUM((a - b) * (a - b) * CAST(o AS HUGEINT))
               AS HUGEINT) AS qo
      FROM wk_o),
    wk_ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM wk_o GROUP BY 1),
    wk_cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM wk_o GROUP BY 1),
    wk_es AS (
      SELECT CAST(SUM(ABS(ra.a - cb.b)
               * (CAST(ra.r AS HUGEINT) * cb.c)) AS HUGEINT) AS le,
             CAST(SUM((ra.a - cb.b) * (ra.a - cb.b)
               * (CAST(ra.r AS HUGEINT) * cb.c)) AS HUGEINT) AS qe
      FROM wk_ra ra CROSS JOIN wk_cb cb),
    wk_k AS (
      SELECT CAST(COUNT(DISTINCT x) AS INT) AS k_classes
      FROM (SELECT a AS x FROM wk_o UNION ALL SELECT b FROM wk_o))
    SELECT os.n, k.k_classes,
           (ROUND(1.0 - CAST(CAST(os.n AS HUGEINT) * os.lo AS DOUBLE)
              / NULLIF(CAST(es.le AS DOUBLE), 0.0), 6) + 0)
             AS kappa_linear,
           (ROUND(1.0 - CAST(CAST(os.n AS HUGEINT) * os.qo AS DOUBLE)
              / NULLIF(CAST(es.qe AS DOUBLE), 0.0), 6) + 0)
             AS kappa_quadratic
    FROM wk_os os, wk_es es, wk_k k
    """,
    tags=("events", "evaluation", "agreement", "statistics"),
)
def events_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Cohen's kappa between two jittered ORDINAL decile
    raters of the event value (`operators/experiment.py::
    weighted_kappa`, Cohen 1968) — the ordinal completion of the
    agreement family (Cohen's kappa = nominal 2-rater, Fleiss =
    m-rater, weighted = ordinal): near-miss ratings (4 vs 5) cost
    less than far misses (1 vs 5), linear and quadratic conventions
    side by side. Both kappas are exact integer rationals (the E_ij
    denominator is cleared) spending ONE division each."""
    from covid_data_pipeline_spark.operators.experiment import (
        weighted_kappa,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_id").isNotNull()
    )

    def decile(jit):
        return F.least(
            F.lit(9).cast("bigint"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.floor((F.col("value") + jit) / 10).cast("bigint"),
            ),
        )

    rated = ev.select(
        decile((F.col("event_id") % 11) - 5).alias("_a"),
        decile((F.col("event_id") % 7) - 3).alias("_b"),
    )
    return weighted_kappa(rated, "_a", "_b")


@register(
    "events_friedman_daily",
    """
    WITH fr_d AS (
      SELECT CAST(ts AS DATE) AS blk, event_type AS trt,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2),
    fr_k AS (SELECT CAST(COUNT(DISTINCT trt) AS INT) AS k FROM fr_d),
    fr_pb AS (
      SELECT blk, CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(COUNT(DISTINCT trt) AS BIGINT) AS tb
      FROM fr_d GROUP BY 1),
    fr_ex AS (
      SELECT CAST(SUM(CASE WHEN NOT (nb = k AND tb = k)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded
      FROM fr_pb, fr_k),
    fr_kept AS (
      SELECT d.blk, d.trt, d.v
      FROM fr_d d JOIN fr_pb p ON d.blk = p.blk
      CROSS JOIN fr_k k
      WHERE p.nb = k.k AND p.tb = k.k),
    fr_rk AS (
      SELECT blk, trt,
             2 * (RANK() OVER (PARTITION BY blk ORDER BY v) - 1)
               + COUNT(*) OVER (PARTITION BY blk, v) + 1 AS r2,
             v
      FROM fr_kept),
    fr_tr AS (
      SELECT trt, CAST(SUM(r2) AS HUGEINT) AS r2s,
             CAST(COUNT(*) AS BIGINT) AS nblk
      FROM fr_rk GROUP BY 1),
    fr_tm AS (
      SELECT CAST(SUM(CAST(tc AS HUGEINT) * tc * tc - tc) AS HUGEINT)
        AS tie3
      FROM (SELECT blk, v, CAST(COUNT(*) AS BIGINT) AS tc
            FROM fr_kept GROUP BY 1, 2)),
    fr_a AS (
      SELECT MAX(nblk) AS n_blocks, CAST(COUNT(*) AS INT) AS k,
             CAST(SUM(r2s * r2s) AS HUGEINT) AS sr2
      FROM fr_tr),
    fr_f AS (
      SELECT a.n_blocks, e.n_excluded, a.k,
             3.0 * CAST(a.sr2 AS DOUBLE)
               / NULLIF(CAST(a.n_blocks AS DOUBLE)
                 * CAST(a.k AS DOUBLE)
                 * (CAST(a.k AS DOUBLE) + 1.0), 0.0)
               - 3.0 * CAST(a.n_blocks AS DOUBLE)
                 * (CAST(a.k AS DOUBLE) + 1.0) AS chi2,
             1.0 - CAST(t.tie3 AS DOUBLE)
               / NULLIF(CAST(a.n_blocks AS DOUBLE)
                 * CAST(a.k AS DOUBLE)
                 * (CAST(a.k AS DOUBLE) * CAST(a.k AS DOUBLE) - 1.0),
                 0.0) AS corr
      FROM fr_a a, fr_tm t, fr_ex e)
    SELECT n_blocks, n_excluded, k, CAST(k - 1 AS INT) AS df,
           (ROUND(chi2, 4) + 0) AS chi2_f,
           (ROUND(chi2 / NULLIF(corr, 0.0), 4) + 0)
             AS chi2_f_corrected
    FROM fr_f
    """,
    tags=("events", "hypothesis-test", "rank-statistics", "statistics"),
)
def events_friedman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test of the five event types' daily volumes with DAYS
    as blocks (`operators/experiment.py::friedman_test`, Friedman
    1937) — the blocked-design sibling of events_kruskal_wallis:
    ranking within each day removes the day effect (weekends,
    seasonality) that a pooled rank test would smear across
    treatments. Only complete days (all k types present) count;
    doubled within-block average ranks keep every moment exact, and
    the oracle replays the rank as RANK()-1 — an independent
    formulation of the same order statistic."""
    from covid_data_pipeline_spark.operators.experiment import (
        friedman_test,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = ev.groupBy(
        F.to_date("ts").alias("_blk"),
        F.col("event_type").alias("_trt"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
    return friedman_test(daily, "_blk", "_trt", "_v")
