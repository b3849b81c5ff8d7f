"""Temporal warehouse queries: point-in-time attribution, snapshot
CDC, linear interpolation, and trailing z-score anomaly detection.

These exercise ``operators/temporal.py`` — the generalization of the
reference's date-cursor / today-vs-yesterday comparisons
(/root/reference/airflow/dags/covid_dag.py cursor loop and the alert
delta predicate) into reusable temporal primitives. Oracle dialect
notes: the PIT join is stated as an inequality join + ROW_NUMBER in
DuckDB (formulation-independent of the union-window implementation);
interpolation states the exact same IEEE expression shape on both
sides so no round guard is needed on the lerp itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from covid_data_pipeline_spark.functions.scalar import round_stable
from covid_data_pipeline_spark.harness.registry import register, table
from covid_data_pipeline_spark.operators.temporal import (
    interpolate_daily,
    pit_enrich,
    snapshot_diff,
)


@register(
    "attribution_last_touch",
    """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    j AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
             t.event_type AS touch_type, t.ts AS touch_ts,
             t.event_id AS touch_id,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY t.ts DESC, t.event_id DESC) AS rn
      FROM p LEFT JOIN t
        ON t.user_id = p.user_id AND t.ts <= p.ts
    )
    SELECT user_id, purchase_id, purchase_ts, touch_type, touch_ts, touch_id
    FROM j WHERE rn = 1
    """,
    tags=("events", "temporal", "pit", "attribution"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined to the user's most
    recent click/view at or before purchase time — a point-in-time join.

    The implementation (``pit_enrich``) never builds a (purchase x
    touch) pair: both sides union into one per-user ordered pass and
    the last touch payload is carried forward, so cost is one hash
    shuffle + sort regardless of how many touches precede each
    purchase. The oracle states the declarative inequality-join +
    ROW_NUMBER form — fine for DuckDB at sf0.01, quadratic-per-user at
    warehouse scale, which is exactly why the operator exists. Ties
    (touch at identical ts) resolve to the largest event_id on both
    sides per the repo tiebreaker policy."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    touches = (
        ev.where(F.col("event_type").isin("click", "view"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("touch_type"),
            F.col("ts").alias("touch_ts"),
            F.col("event_id").alias("touch_id"),
        )
    )
    out = pit_enrich(
        purchases,
        touches,
        keys=["user_id"],
        fact_ts="ts",
        dim_ts="ts",
        payload_cols=["touch_type", "touch_ts", "touch_id"],
        fact_tie="event_id",
        dim_tie="event_id",
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "touch_type",
        "touch_ts",
        "touch_id",
    )


@register(
    "cdc_customer_halfyear",
    """
    WITH old AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS total_cents
      FROM orders
      WHERE o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1998-07-01'
      GROUP BY o_custkey
    ),
    new AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS total_cents
      FROM orders
      WHERE o_orderdate >= DATE '1998-07-01' AND o_orderdate < DATE '1999-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(old.o_custkey, new.o_custkey) AS o_custkey,
           CASE WHEN old.o_custkey IS NULL THEN 'insert'
                WHEN new.o_custkey IS NULL THEN 'delete'
                WHEN old.n_orders IS DISTINCT FROM new.n_orders
                  OR old.total_cents IS DISTINCT FROM new.total_cents
                  THEN 'update'
                ELSE 'unchanged' END AS change_type,
           old.n_orders AS old_n_orders, old.total_cents AS old_total_cents,
           new.n_orders AS new_n_orders, new.total_cents AS new_total_cents
    FROM old FULL OUTER JOIN new ON old.o_custkey = new.o_custkey
    """,
    tags=("temporal", "cdc", "snapshot"),
)
def cdc_customer_halfyear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot CDC: per-customer order aggregates for 1998-H1 vs
    1998-H2, classified insert/delete/update/unchanged — the changelog
    a Delta/Iceberg change-data-feed would emit, computed from plain
    snapshots with one full-outer join (``snapshot_diff``). Money is
    integer cents so the equality compare is exact on both engines.
    Scale: each snapshot aggregates map-side first, then one sort-merge
    join on the customer key; AQE splits skewed keys."""
    orders = table(spark, sf_dir, "orders")

    def half(d0: str, d1: str) -> DataFrame:
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(d0))
                & (F.col("o_orderdate") < F.lit(d1))
            )
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice") * 100, 0)
                .cast("long")
                .alias("total_cents"),
            )
        )

    return snapshot_diff(
        half("1998-01-01", "1998-07-01"),
        half("1998-07-01", "1999-01-01"),
        keys=["o_custkey"],
        compare_cols=["n_orders", "total_cents"],
    )


@register(
    "interpolate_daily_events",
    """
    WITH filtered AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value FROM events
      WHERE EXTRACT(DAY FROM ts) % 5 <> 0
    ),
    daily AS (
      SELECT event_type, day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS val_cents
      FROM filtered GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    cal AS (
      SELECT event_type,
             CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    grid AS (
      SELECT c.event_type, c.day, d.val_cents FROM cal c
      LEFT JOIN daily d ON c.event_type = d.event_type AND c.day = d.day
    ),
    nb AS (
      SELECT event_type, day, val_cents,
             LAST_VALUE(val_cents IGNORE NULLS) OVER wb AS pv,
             LAST_VALUE(CASE WHEN val_cents IS NOT NULL THEN day END
                        IGNORE NULLS) OVER wb AS pd,
             FIRST_VALUE(val_cents IGNORE NULLS) OVER wf AS nv,
             FIRST_VALUE(CASE WHEN val_cents IS NOT NULL THEN day END
                         IGNORE NULLS) OVER wf AS nd
      FROM grid
      WINDOW wb AS (PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day,
           val_cents IS NOT NULL AS observed,
           ROUND((CASE WHEN val_cents IS NOT NULL THEN CAST(val_cents AS DOUBLE)
                       WHEN pv IS NOT NULL AND nv IS NOT NULL
                         THEN pv + (nv - pv) * ((day - pd) * 1.0 / (nd - pd))
                       WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE)
                       ELSE CAST(nv AS DOUBLE) END) / 100.0, 4)
             AS value_interp
    FROM nb
    """,
    tags=("events", "timeseries", "interpolate"),
)
def interpolate_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a dense daily calendar — the numeric
    resample gap-fill's forward-fill cannot honestly provide (a missing
    day's value estimate, not yesterday's copy). Gaps are planted
    deterministically (drop days divisible by 5) as in
    ``gapfill_daily_events``.

    Float policy: operands are integer cents and integer day offsets,
    and BOTH engines evaluate the identically-associated expression
    ``pv + (nv - pv) * (offset / span)`` — every IEEE step rounds the
    same, so the lerp is bit-identical before the final display ROUND.
    """
    ev = table(spark, sf_dir, "events").where(F.dayofmonth("ts") % 5 != 0)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("long").alias("val_cents"),
    )
    out = interpolate_daily(
        daily, keys=["event_type"], day_col="day", val_col="val_cents"
    )
    return out.select(
        "event_type",
        "day",
        "observed",
        F.round(F.col("interp_value") / 100.0, 4).alias("value_interp"),
    )


@register(
    "events_zscore_anomalies",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS val_cents,
             CAST(ts AS DATE) - DATE '1970-01-01' AS day_num
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    scored AS (
      SELECT event_type, day, val_cents,
             COUNT(*) OVER w AS trailing_n,
             AVG(val_cents) OVER w AS trailing_mean,
             STDDEV_SAMP(val_cents) OVER w AS trailing_sd
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_num
                   RANGE BETWEEN 14 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day,
           ROUND(val_cents / 100.0, 2) AS value_sum,
           ROUND(trailing_mean / 100.0, 2) AS trailing_mean,
           ROUND((val_cents - trailing_mean) / trailing_sd, 2) + 0 AS z_score
    FROM scored
    WHERE trailing_n >= 7 AND trailing_sd > 0
      AND ABS((val_cents - trailing_mean) / trailing_sd) > 1.5
    """,
    tags=("events", "timeseries", "anomaly"),
)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly detection: flag days whose total value
    deviates >1.5 sigma from the prior 14-day window (current day
    EXCLUDED — the frame ends at 1 PRECEDING, so an anomaly cannot
    suppress its own detection). This is the alerting generalization of
    the reference's fixed-threshold day-over-day alerts
    (covid_alerts SQL: new_cases > threshold) into a
    level-independent signal.

    The frame is a true RANGE over epoch-day ints (missing days shrink
    the window rather than widening it to 14 present rows). Inputs are
    integer cents so mean is exact; stddev may differ across engines in
    the last ulp, guarded by ROUND(.., 2) — membership of the >1.5 cut
    is stable because z-values sit far from the boundary at all test
    SFs. One shuffle: rollup and window share the event_type hash."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("long").alias("val_cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-14, -1)
    )
    scored = daily.select(
        "event_type",
        "day",
        "val_cents",
        F.count(F.lit(1)).over(w).alias("trailing_n"),
        F.avg("val_cents").over(w).alias("trailing_mean"),
        F.stddev_samp("val_cents").over(w).alias("trailing_sd"),
    )
    z = (F.col("val_cents") - F.col("trailing_mean")) / F.col("trailing_sd")
    return scored.where(
        (F.col("trailing_n") >= 7)
        & (F.col("trailing_sd") > 0)
        & (F.abs(z) > 1.5)
    ).select(
        "event_type",
        "day",
        F.round(F.col("val_cents") / 100.0, 2).alias("value_sum"),
        F.round(F.col("trailing_mean") / 100.0, 2).alias("trailing_mean"),
        round_stable(z, 2).alias("z_score"),
    )


@register(
    "attribution_linear",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.value,
             t.event_id AS touch_id, t.event_type AS touch_type
      FROM p JOIN t
        ON t.user_id = p.user_id
       AND t.ts > p.ts - INTERVAL 6 HOUR AND t.ts <= p.ts
    )
    SELECT purchase_id, user_id, touch_id, touch_type,
           COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches,
           CAST(FLOOR(value * 1000000.0 /
                      COUNT(*) OVER (PARTITION BY purchase_id)) AS BIGINT)
             AS credit_micros
    FROM pairs
    """,
    tags=("events", "temporal", "attribution", "rangejoin"),
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click/view in the 6 hours
    before a purchase shares the purchase value equally.

    Pairs come from the bucketed `time_range_join` (equi-join on
    (user, time-bucket), never a nested loop); the per-purchase touch
    count is one window on purchase_id. Credit is an integer
    (floor(value x 1e6 / n)) computed PER ROW — identical IEEE
    arithmetic on both engines, with no cross-row float summation to
    drift (repo float policy)."""
    from covid_data_pipeline_spark.operators.rangejoin import time_range_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = time_range_join(
        purchases, touches, keys=["user_id"],
        left_ts="p_ts", right_ts="t_ts",
        lower_s=-6 * 3600.0, upper_s=0.0,
    )
    w = Window.partitionBy("purchase_id")
    n = F.count(F.lit(1)).over(w)
    return pairs.select(
        "purchase_id",
        "user_id",
        "touch_id",
        "touch_type",
        n.alias("n_touches"),
        F.floor(F.col("value") * 1000000.0 / n).cast("bigint").alias(
            "credit_micros"
        ),
    )


@register(
    "events_burst_days",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n, SUM(cnt) AS s1,
             SUM(cnt * cnt) AS s2
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, d.day, d.cnt
    FROM daily d JOIN m USING (event_type)
    WHERE m.n > 1
      AND d.cnt * m.n - m.s1 > 0
      AND (d.cnt * m.n - m.s1)::HUGEINT * (d.cnt * m.n - m.s1)
          > 4 * (m.n::HUGEINT * m.s2 - m.s1::HUGEINT * m.s1)
    """,
    tags=("temporal", "anomaly"),
)
def events_burst_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-burst days per event type (count > mean + 2σ of the
    type's own daily history). The z-test runs entirely in BIGINT
    products of exact counts — no float mean/stddev/sqrt — so the
    flagged set hash-matches any engine under any partitioning."""
    from covid_data_pipeline_spark.operators.temporal import burst_days

    return burst_days(table(spark, sf_dir, "events"), sigmas=2)


@register(
    "events_holt_linear",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    seq AS (
      SELECT event_type, CAST(cnt AS DOUBLE) AS y,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily),
    nn AS (SELECT event_type, MAX(rn) AS nmax FROM seq GROUP BY 1),
    holt(event_type, rn, lvl, trd) AS (
      SELECT a.event_type, 1, a.y, b.y - a.y
      FROM seq a JOIN seq b
        ON a.event_type = b.event_type AND a.rn = 1 AND b.rn = 2
      UNION ALL
      SELECT h.event_type, s.rn,
             0.5 * s.y + 0.5 * (h.lvl + h.trd),
             0.5 * ((0.5 * s.y + 0.5 * (h.lvl + h.trd)) - h.lvl)
               + 0.5 * h.trd
      FROM holt h JOIN seq s
        ON s.event_type = h.event_type AND s.rn = h.rn + 1)
    SELECT h.event_type, ROUND(lvl, 4) + 0 AS level, ROUND(trd, 4) + 0 AS trend,
           ROUND(lvl + 7.0 * trd, 4) + 0 AS forecast_7d
    FROM holt h JOIN nn ON h.event_type = nn.event_type AND h.rn = nn.nmax
    """,
    tags=("temporal", "timeseries", "smoothing", "iterative"),
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of each event type's daily volume +
    7-day-ahead forecast (`operators/temporal.py::holt_linear`). The
    O(days)-state recurrence folds JVM-side per type; the oracle's
    recursive CTE replays the identical IEEE update order, so the fit
    is value-hash verified, not just row-counted."""
    from covid_data_pipeline_spark.operators.temporal import holt_linear

    ev = table(spark, sf_dir, "events")
    return holt_linear(ev, alpha=0.5, beta=0.5, horizon=7)


@register(
    "events_cusum_changepoint",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    st AS (SELECT COUNT(*) AS n, SUM(cnt) AS s1, SUM(cnt * cnt) AS s2
           FROM daily),
    q AS (SELECT s1 / CAST(n AS DOUBLE) AS m, s2 / CAST(n AS DOUBLE) AS q2
          FROM st),
    stats AS (SELECT m, sqrt(q2 - m * m) AS sd FROM q),
    seq AS (
      SELECT day, cnt,
             row_number() OVER (ORDER BY day) AS rn
      FROM daily),
    cu(rn, day, sp, sn) AS (
      SELECT s.rn, s.day,
             GREATEST(0.0, 0.0 + (s.cnt - t.m - 0.5 * t.sd)),
             GREATEST(0.0, 0.0 + (t.m - s.cnt - 0.5 * t.sd))
      FROM seq s CROSS JOIN stats t WHERE s.rn = 1
      UNION ALL
      SELECT s.rn, s.day,
             GREATEST(0.0, c.sp + (s.cnt - t.m - 0.5 * t.sd)),
             GREATEST(0.0, c.sn + (t.m - s.cnt - 0.5 * t.sd))
      FROM cu c JOIN seq s ON s.rn = c.rn + 1 CROSS JOIN stats t)
    SELECT c.day, ROUND(c.sp, 4) AS cusum_pos, ROUND(c.sn, 4) AS cusum_neg,
           (c.sp > 4.0 * t.sd OR c.sn > 4.0 * t.sd) AS breach
    FROM cu c CROSS JOIN stats t
    """,
    tags=("temporal", "timeseries", "changepoint", "iterative"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detector over the global daily event count
    (`operators/temporal.py::cusum_changepoints`): per-day cumulative
    deviation sums from integer-exact μ/σ, breach-flagged at 4σ. The
    max(0, ·) recurrence is not window-expressible — it folds JVM-side
    and the oracle replays it as a recursive CTE, value-hash checked."""
    from covid_data_pipeline_spark.operators.temporal import (
        cusum_changepoints,
    )

    ev = table(spark, sf_dir, "events")
    return cusum_changepoints(ev, k_sigma=0.5, h_sigma=4.0)


@register(
    "events_holt_winters",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    seq AS (
      SELECT event_type, CAST(cnt AS DOUBLE) AS y,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily),
    init AS (
      SELECT event_type,
             SUM(CASE WHEN rn <= 7 THEN CAST(y AS BIGINT) END) AS sum1,
             SUM(CASE WHEN rn BETWEEN 8 AND 14 THEN CAST(y AS BIGINT) END)
               AS sum2,
             MAX(rn) AS nmax
      FROM seq GROUP BY 1 HAVING MAX(rn) >= 14),
    seas0 AS (
      SELECT s.event_type,
             list(s.y - CAST(i.sum1 AS DOUBLE) / 7.0 ORDER BY s.rn) AS seas
      FROM seq s JOIN init i USING (event_type) WHERE s.rn <= 7
      GROUP BY s.event_type),
    hw(event_type, rn, lvl, trd, seas) AS (
      SELECT i.event_type, 7,
             CAST(i.sum1 AS DOUBLE) / 7.0,
             CAST(i.sum2 - i.sum1 AS DOUBLE) / 49.0,
             s0.seas
      FROM init i JOIN seas0 s0 USING (event_type)
      UNION ALL
      SELECT h.event_type, s.rn,
             0.5 * (s.y - h.seas[1]) + 0.5 * (h.lvl + h.trd),
             0.5 * ((0.5 * (s.y - h.seas[1]) + 0.5 * (h.lvl + h.trd))
                    - h.lvl) + 0.5 * h.trd,
             h.seas[2:7] ||
               [0.5 * (s.y - (0.5 * (s.y - h.seas[1])
                              + 0.5 * (h.lvl + h.trd)))
                + 0.5 * h.seas[1]]
      FROM hw h JOIN seq s
        ON s.event_type = h.event_type AND s.rn = h.rn + 1)
    SELECT h.event_type, ROUND(h.lvl, 4) + 0 AS level, ROUND(h.trd, 4) + 0 AS trend,
           ROUND(h.lvl + h.trd + h.seas[1], 4) + 0 AS forecast_1,
           ROUND(h.lvl + 7.0 * h.trd + h.seas[7], 4) + 0 AS forecast_p
    FROM hw h JOIN init i
      ON h.event_type = i.event_type AND h.rn = i.nmax
    """,
    tags=("temporal", "timeseries", "smoothing", "seasonal", "iterative"),
    bench=True,
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive weekly-seasonal fit of each event type's
    daily volume (`operators/temporal.py::holt_winters_seasonal`):
    final level/trend plus seasonally-adjusted 1-day and same-weekday-
    next-week forecasts. The period-7 seasonal queue folds JVM-side in
    one F.aggregate pass; the oracle's recursive CTE carries the same
    queue as a LIST column and replays the identical IEEE updates, so
    the fit is value-hash verified, not just row-counted."""
    from covid_data_pipeline_spark.operators.temporal import (
        holt_winters_seasonal,
    )

    ev = table(spark, sf_dir, "events")
    return holt_winters_seasonal(ev, period=7, alpha=0.5, beta=0.5, gamma=0.5)


@register(
    "events_kaplan_meier",
    """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800.0
                  THEN 1 ELSE 0 END AS brk
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, e.event_id
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM e),
    ses AS (
      SELECT user_id, sid, MIN(ts) AS t0, MAX(ts) AS t1
      FROM sess GROUP BY 1, 2),
    g AS (SELECT MAX(t1) AS gmax FROM ses),
    subj AS (
      SELECT CAST(FLOOR((EPOCH(t1) - EPOCH(t0)) / 60.0) AS BIGINT)
               AS t_mins,
             (EPOCH(g.gmax) - EPOCH(t1)) > 1800.0 AS ended
      FROM ses CROSS JOIN g),
    per_t AS (
      SELECT t_mins, COUNT(*) AS n_ending,
             SUM(CASE WHEN ended THEN 1 ELSE 0 END) AS n_events
      FROM subj GROUP BY 1),
    risk AS (
      SELECT t_mins, CAST(n_events AS BIGINT) AS n_events,
             CAST(SUM(n_ending) OVER (ORDER BY t_mins
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS n_risk
      FROM per_t),
    steps AS (
      SELECT t_mins, n_risk, n_events,
             CAST(ROUND(LN(CAST(n_risk - n_events AS DOUBLE)
                           / CAST(n_risk AS DOUBLE)) * 1000000.0, 0)
                  AS BIGINT) AS micro
      FROM risk WHERE n_events > 0 AND n_risk > n_events)
    SELECT t_mins, n_risk, n_events,
           CAST(SUM(micro) OVER (ORDER BY t_mins) AS BIGINT)
             AS log_surv_micronats,
           ROUND(EXP(CAST(SUM(micro) OVER (ORDER BY t_mins) AS BIGINT)
                     / 1000000.0), 4) AS km_survival
    FROM steps
    """,
    tags=("temporal", "survival", "censoring", "session"),
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier session-length survival curve with right censoring
    (`operators/temporal.py::kaplan_meier`): subjects are 30-min-gap
    sessions, duration is whole minutes between first and last event,
    and sessions whose last event falls within one gap of the end of
    observation are CENSORED (still open), not ended — the estimator
    product-analytics "session length histograms" get wrong. The
    survival product is an exact BIGINT cumsum of micro-nat factor
    logs (DSIR integer-scaling pattern); the step relation is domain-
    compressed onto distinct minute durations."""
    from covid_data_pipeline_spark.functions.scalar import epoch_seconds
    from covid_data_pipeline_spark.operators.temporal import kaplan_meier

    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = epoch_seconds("ts")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | ((ep - epoch_seconds(F.lag("ts").over(w))) > 1800.0),
        1,
    ).otherwise(0)
    sess = ev.select("user_id", "ts", "event_id", brk.alias("brk"))
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sid = sess.withColumn("sid", F.sum("brk").over(w_cum))
    ses = sid.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    g = ses.agg(F.max("t1").alias("gmax"))
    # bcast: const(1) scalar max-ts anchor
    subj = ses.crossJoin(F.broadcast(g)).select(
        F.floor((epoch_seconds("t1") - epoch_seconds("t0")) / 60.0)
        .cast("long")
        .alias("t_mins"),
        ((epoch_seconds("gmax") - epoch_seconds("t1")) > 1800.0).alias(
            "ended"
        ),
    )
    return kaplan_meier(subj, duration_col="t_mins", event_col="ended")


@register(
    "repair_cumulative_monotone",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS inc_cents
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    cum AS (
      SELECT event_type, day,
             CAST(SUM(inc_cents) OVER (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS clean
      FROM daily),
    glitched AS (
      SELECT event_type, day,
             CASE WHEN EXTRACT(DAY FROM day) % 9 = 4
                  THEN clean - (clean // 10 + 1)
                  ELSE clean END AS reported
      FROM cum)
    SELECT event_type, day, reported,
           CAST(MAX(reported) OVER (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS repaired,
           MAX(reported) OVER (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING) <> reported AS was_corrected
    FROM glitched
    """,
    tags=("temporal", "dq", "repair", "cumulative"),
)
def repair_cumulative_monotone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone repair of a cumulative counter with planted downward
    corrections (every 9th day-of-month reports ~10% low — the JHU
    correction pattern the reference's mart GREATEST(0,·) clamp works
    around): running-max repair per series plus an audit flag
    (`operators/temporal.py::repair_cumulative_monotone`). Integer
    cents end-to-end; one window shuffle."""
    from covid_data_pipeline_spark.operators.temporal import (
        repair_cumulative_monotone as _repair,
    )

    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value") * 100, 0).cast("long").alias("inc_cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "event_type",
        "day",
        F.sum("inc_cents").over(w).cast("long").alias("clean"),
    )
    glitched = cum.select(
        "event_type",
        "day",
        F.when(
            F.dayofmonth("day") % 9 == 4,
            F.col("clean") - (F.expr("clean div 10") + 1),
        )
        .otherwise(F.col("clean"))
        .alias("reported"),
    )
    return _repair(
        glitched, keys=["event_type"], day_col="day", cum_col="reported"
    )


@register(
    "events_hw_anomalies",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    seq AS (
      SELECT event_type, day, CAST(cnt AS DOUBLE) AS y,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily),
    init AS (
      SELECT event_type,
             SUM(CASE WHEN rn <= 7 THEN CAST(y AS BIGINT) END) AS sum1,
             SUM(CASE WHEN rn BETWEEN 8 AND 14 THEN CAST(y AS BIGINT) END)
               AS sum2,
             MAX(rn) AS nmax
      FROM seq GROUP BY 1 HAVING MAX(rn) >= 14),
    seas0 AS (
      SELECT s.event_type,
             list(s.y - CAST(i.sum1 AS DOUBLE) / 7.0 ORDER BY s.rn) AS seas
      FROM seq s JOIN init i USING (event_type) WHERE s.rn <= 7
      GROUP BY s.event_type),
    hw(event_type, rn, lvl, trd, seas) AS (
      SELECT i.event_type, 7,
             CAST(i.sum1 AS DOUBLE) / 7.0,
             CAST(i.sum2 - i.sum1 AS DOUBLE) / 49.0,
             s0.seas
      FROM init i JOIN seas0 s0 USING (event_type)
      UNION ALL
      SELECT h.event_type, s.rn,
             0.5 * (s.y - h.seas[1]) + 0.5 * (h.lvl + h.trd),
             0.5 * ((0.5 * (s.y - h.seas[1]) + 0.5 * (h.lvl + h.trd))
                    - h.lvl) + 0.5 * h.trd,
             h.seas[2:7] ||
               [0.5 * (s.y - (0.5 * (s.y - h.seas[1])
                              + 0.5 * (h.lvl + h.trd)))
                + 0.5 * h.seas[1]]
      FROM hw h JOIN seq s
        ON s.event_type = h.event_type AND s.rn = h.rn + 1),
    fit AS (
      SELECT s.event_type, s.day,
             h.lvl + h.trd + h.seas[1] AS fitted,
             s.y - (h.lvl + h.trd + h.seas[1]) AS resid
      FROM seq s JOIN hw h
        ON h.event_type = s.event_type AND h.rn = s.rn - 1
      WHERE s.rn >= 8),
    ranked AS (
      SELECT event_type, day, fitted, resid,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ABS(resid), day) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM fit),
    madsel AS (
      SELECT event_type, ABS(resid) AS mad
      FROM ranked WHERE rk = (n + 1) // 2)
    SELECT r.event_type, r.day,
           ROUND(r.fitted, 4) + 0 AS fitted, ROUND(r.resid, 4) + 0 AS resid,
           (m.mad > 0 AND ABS(r.resid)
              > CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * m.mad)
             AS is_anomaly
    FROM ranked r JOIN madsel m USING (event_type)
    """,
    tags=("temporal", "timeseries", "anomaly", "seasonal", "iterative"),
)
def events_hw_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly scores: every day's one-step-ahead
    Holt-Winters forecast error per event type, flagged at 3 robust
    sigmas of the residual MAD
    (`operators/temporal.py::holt_winters_residuals`) — the weekly-
    cycle-proof upgrade of events_zscore_anomalies. The oracle extends
    the HW recursive CTE with a rn-1 state join (a true forecast — an
    anomaly can't mask itself) and selects the exact lower-median MAD;
    every scored day is emitted with its verdict so the result is
    non-degenerate on clean data."""
    from covid_data_pipeline_spark.operators.temporal import (
        holt_winters_residuals,
    )

    return holt_winters_residuals(
        table(spark, sf_dir, "events"), period=7, k_mad=3.0
    )


@register(
    "events_ols_trend",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    seq AS (
      SELECT event_type, cnt,
             CAST(day - MIN(day) OVER (PARTITION BY event_type) AS BIGINT)
               AS x
      FROM daily),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(cnt) AS BIGINT) AS sy,
             CAST(SUM(x * cnt) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM seq GROUP BY 1)
    SELECT event_type, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0 AS slope_per_day,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n, 4) + 0
             AS intercept
    FROM s WHERE n >= 2 AND n * sxx - sx * sx <> 0
    """,
    tags=("temporal", "timeseries", "regression"),
)
def events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS daily-volume trend — the parametric baseline next
    to events_theilsen_trend (which tolerates the outliers that drag
    this one around; shipping both is how you SEE the robustness gap).
    x is the integer day offset from each type's first day, so every
    normal-equation moment (Σx, Σy, Σxy, Σx²) is an exact BIGINT off
    one domain-compressed daily rollup — no float accumulates across
    rows; slope and intercept are single correctly-rounded divisions.
    At calendar spans the products stay far under 2^63 (days ~ 1e4,
    counts ~ 1e9 per day would still fit; a wider regime would move to
    DECIMAL(38,0) per the burst_days rule)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.where(F.col("ts").isNotNull()).groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        "cnt",
        F.datediff(F.col("day"), F.min("day").over(w)).cast("long").alias("x"),
    )
    s = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("cnt").alias("sy"),
        F.sum(F.col("x") * F.col("cnt")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = num / den
    return s.where(
        (F.col("n") >= 2)
        & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
    ).select(
        "event_type",
        "n",
        round_stable(slope, 6).alias("slope_per_day"),
        round_stable(
            (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"),
            4,
        ).alias("intercept"),
    )


@register(
    "events_nelson_aalen",
    """
    WITH na_e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800.0
                  THEN 1 ELSE 0 END AS brk
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    na_sess AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, na_e.event_id
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM na_e),
    na_ses AS (
      SELECT user_id, sid, MIN(ts) AS t0, MAX(ts) AS t1
      FROM na_sess GROUP BY 1, 2),
    na_g AS (SELECT MAX(t1) AS gmax FROM na_ses),
    na_subj AS (
      SELECT CAST(FLOOR((EPOCH(t1) - EPOCH(t0)) / 60.0) AS BIGINT)
               AS t_mins,
             (EPOCH(na_g.gmax) - EPOCH(t1)) > 1800.0 AS ended
      FROM na_ses CROSS JOIN na_g),
    na_per_t AS (
      SELECT t_mins, COUNT(*) AS n_ending,
             SUM(CASE WHEN ended THEN 1 ELSE 0 END) AS n_events
      FROM na_subj GROUP BY 1),
    na_risk AS (
      SELECT t_mins, CAST(n_events AS BIGINT) AS n_events,
             CAST(SUM(n_ending) OVER (ORDER BY t_mins
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS n_risk
      FROM na_per_t),
    na_steps AS (
      SELECT t_mins, n_risk, n_events,
             CAST(ROUND(1000000.0 * CAST(n_events AS DOUBLE)
                        / CAST(n_risk AS DOUBLE), 0) AS BIGINT) AS micro
      FROM na_risk WHERE n_events > 0)
    SELECT t_mins, n_risk, n_events,
           CAST(SUM(micro) OVER (ORDER BY t_mins) AS BIGINT)
             AS cum_hazard_micro,
           ROUND(EXP(-CAST(SUM(micro) OVER (ORDER BY t_mins) AS BIGINT)
                     / 1000000.0), 4) AS na_survival
    FROM na_steps
    """,
    tags=("temporal", "survival", "censoring", "hazard"),
)
def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative session-hazard curve over the SAME
    censored session subjects as events_kaplan_meier
    (`operators/temporal.py::nelson_aalen`) — the additive hazard
    scale that differences cleanly between cohorts and whose slope is
    the instantaneous churn rate; exp(-H) is the Fleming-Harrington
    survival twin (vs KM's product form). Same micro-unit BIGINT
    cumsum discipline, same domain compression onto distinct minute
    durations — and unlike KM it keeps the everyone-fails step."""
    from covid_data_pipeline_spark.functions.scalar import epoch_seconds
    from covid_data_pipeline_spark.operators.temporal import nelson_aalen

    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = epoch_seconds("ts")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | ((ep - epoch_seconds(F.lag("ts").over(w))) > 1800.0),
        1,
    ).otherwise(0)
    sess = ev.select("user_id", "ts", "event_id", brk.alias("brk"))
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sid = sess.withColumn("sid", F.sum("brk").over(w_cum))
    ses = sid.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    g = ses.agg(F.max("t1").alias("gmax"))
    # bcast: const(1) scalar max-ts anchor
    subj = ses.crossJoin(F.broadcast(g)).select(
        F.floor((epoch_seconds("t1") - epoch_seconds("t0")) / 60.0)
        .cast("long")
        .alias("t_mins"),
        ((epoch_seconds("gmax") - epoch_seconds("t1")) > 1800.0).alias(
            "ended"
        ),
    )
    return nelson_aalen(subj, duration_col="t_mins", event_col="ended")


@register(
    "attribution_position",
    """
    WITH ap_p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    ap_t AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    ap_pairs AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.value,
             t.event_id AS touch_id, t.event_type AS touch_type, t.ts
      FROM ap_p p JOIN ap_t t
        ON t.user_id = p.user_id
       AND t.ts > p.ts - INTERVAL 6 HOUR AND t.ts <= p.ts
    ),
    ap_ranked AS (
      SELECT purchase_id, user_id, value, touch_id, touch_type,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY purchase_id ORDER BY ts, touch_id) AS BIGINT)
               AS pos,
             COUNT(*) OVER (PARTITION BY purchase_id) AS n
      FROM ap_pairs
    ),
    ap_w AS (
      SELECT *,
             CASE
               WHEN n = 1 THEN 10000
               WHEN n = 2 THEN 5000
               WHEN pos = 1 OR pos = n THEN 4000
               ELSE 2000 // (n - 2)
                    + CASE WHEN pos - 1 <= 2000 % (n - 2)
                           THEN 1 ELSE 0 END
             END AS w_bp
      FROM ap_ranked
    )
    SELECT purchase_id, user_id, touch_id, touch_type,
           CAST(n AS BIGINT) AS n_touches,
           CAST(pos AS INTEGER) AS pos,
           CAST(w_bp AS INTEGER) AS w_bp,
           CAST(FLOOR(value * 1000000.0) AS BIGINT) * w_bp // 10000
             AS credit_micros
    FROM ap_w
    """,
    tags=("events", "temporal", "attribution", "rangejoin"),
)
def attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution over the same
    6-hour pre-purchase touch window as attribution_linear: first and
    last touch each get 40% of the credit, the middle touches share the
    remaining 20% (standard U/40-20-40 rule; n=1 -> 100%, n=2 ->
    50/50). The "brand discovery + closing touch matter most" model a
    marketing mart serves next to the linear one.

    Exactness: weights are integer BASIS POINTS — the middle share uses
    floor division with the remainder distributed to the EARLIEST
    middle touches (pos-1 <= 2000 mod (n-2)), so every weight is an
    exact integer on both engines and each purchase's weights sum to
    10000 exactly. Credit = floor(value*1e6) * w_bp div 10000 — one
    deterministic integer expression per row, no cross-row float
    summation (repo float policy). Scale shape: pairs from the bucketed
    time_range_join (equi-join on (user, time bucket)); position rank +
    touch count are windows on purchase_id — one shuffle."""
    from covid_data_pipeline_spark.operators.rangejoin import time_range_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = time_range_join(
        purchases, touches, keys=["user_id"],
        left_ts="p_ts", right_ts="t_ts",
        lower_s=-6 * 3600.0, upper_s=0.0,
    )
    w = Window.partitionBy("purchase_id")
    wo = Window.partitionBy("purchase_id").orderBy("t_ts", "touch_id")
    n = F.count(F.lit(1)).over(w)
    pos = F.row_number().over(wo).cast("bigint")
    ranked = pairs.select(
        "purchase_id", "user_id", "value", "touch_id", "touch_type",
        pos.alias("pos"), n.alias("n"),
    )
    w_bp = (
        F.when(F.col("n") == 1, F.lit(10000))
        .when(F.col("n") == 2, F.lit(5000))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(4000))
        .otherwise(
            F.expr("2000 div (n - 2)")
            + F.when(
                F.col("pos") - 1 <= F.lit(2000) % (F.col("n") - 2), F.lit(1)
            ).otherwise(F.lit(0))
        )
    )
    # Materialize w_bp with withColumn first: referencing a sibling
    # select alias from credit_micros would lean on Spark's
    # lateral-column-alias conf (r6 ADVICE) — with
    # spark.sql.lateralColumnAlias.enableImplicitResolution off the
    # query would fail analysis under the driver's vanilla session.
    weighted = ranked.withColumn("w_bp", w_bp.cast("int"))
    return weighted.select(
        "purchase_id",
        "user_id",
        "touch_id",
        "touch_type",
        F.col("n").cast("bigint").alias("n_touches"),
        F.col("pos").cast("int").alias("pos"),
        "w_bp",
        F.expr(
            "CAST(FLOOR(value * 1000000.0) AS BIGINT) * CAST(w_bp AS BIGINT)"
            " div 10000"
        ).alias("credit_micros"),
    )


@register(
    "events_logrank_cohorts",
    """
    WITH lr_e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800.0
                  THEN 1 ELSE 0 END AS brk
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    lr_sess AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, lr_e.event_id
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM lr_e),
    lr_ses AS (
      SELECT user_id, sid, MIN(ts) AS t0, MAX(ts) AS t1
      FROM lr_sess GROUP BY 1, 2),
    lr_g AS (SELECT MAX(t1) AS gmax FROM lr_ses),
    lr_subj AS (
      SELECT CAST(FLOOR((EPOCH(t1) - EPOCH(t0)) / 60.0) AS BIGINT)
               AS t_mins,
             (EPOCH(lr_g.gmax) - EPOCH(t1)) > 1800.0 AS ended,
             user_id % 2 = 1 AS grp
      FROM lr_ses CROSS JOIN lr_g),
    lr_per_t AS (
      SELECT t_mins,
             CAST(COUNT(*) AS BIGINT) AS n_ending,
             CAST(SUM(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ending_1,
             CAST(SUM(CASE WHEN ended THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN ended AND grp THEN 1 ELSE 0 END) AS BIGINT)
               AS d1
      FROM lr_subj GROUP BY 1),
    lr_risk AS (
      SELECT t_mins, d, d1,
             CAST(SUM(n_ending) OVER wf AS BIGINT) AS n,
             CAST(SUM(n_ending_1) OVER wf AS BIGINT) AS n1
      FROM lr_per_t
      WINDOW wf AS (ORDER BY t_mins
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
    lr_steps AS (
      SELECT d1,
             CAST(ROUND(1000000.0 * CAST(d::HUGEINT * n1 AS DOUBLE)
                        / CAST(n AS DOUBLE), 0) AS BIGINT) AS e,
             CAST(ROUND(1000000.0
                        * CAST(d::HUGEINT * n1 * (n - n1) * (n - d)
                               AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * CAST(n - 1 AS DOUBLE)), 0) AS BIGINT) AS v
      FROM lr_risk WHERE d > 0 AND n > 1),
    lr_tot AS (
      SELECT CAST(SUM(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_grp1,
             CAST(SUM(CASE WHEN grp THEN 0 ELSE 1 END) AS BIGINT)
               AS n_grp0
      FROM lr_subj),
    lr_agg AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(e) AS BIGINT) AS e1_micro,
             CAST(SUM(v) AS BIGINT) AS v_micro
      FROM lr_steps)
    SELECT t.n_grp1, t.n_grp0, a.o1, a.e1_micro, a.v_micro,
           (ROUND((CAST(a.o1 AS DOUBLE) - a.e1_micro / 1000000.0)
                  / sqrt(a.v_micro / 1000000.0), 4) + 0) AS z
    FROM lr_tot t CROSS JOIN lr_agg a
    """,
    tags=("temporal", "survival", "logrank", "experiment"),
)
def events_logrank_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test (`operators/temporal.py::logrank_test`) comparing
    censored session-survival between the user_id-parity cohorts over
    the SAME session subjects as events_kaplan_meier/_nelson_aalen —
    the inferential step after plotting those curves ("is cohort 1's
    churn hazard actually different?"). Exact integer O/E/V micro sums
    on the duration-compressed domain; z spends floats on one division
    + sqrt."""
    from covid_data_pipeline_spark.functions.scalar import epoch_seconds
    from covid_data_pipeline_spark.operators.temporal import logrank_test

    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (epoch_seconds("ts") - epoch_seconds(F.lag("ts").over(w)) > 1800.0),
        1,
    ).otherwise(0)
    sess = ev.select("user_id", "ts", "event_id", brk.alias("brk"))
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sid = sess.withColumn("sid", F.sum("brk").over(w_cum))
    ses = sid.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    g = ses.agg(F.max("t1").alias("gmax"))
    # bcast: const(1) scalar max-ts anchor
    subj = ses.crossJoin(F.broadcast(g)).select(
        F.floor((epoch_seconds("t1") - epoch_seconds("t0")) / 60.0)
        .cast("long")
        .alias("t_mins"),
        ((epoch_seconds("gmax") - epoch_seconds("t1")) > 1800.0).alias(
            "ended"
        ),
        (F.pmod(F.col("user_id"), F.lit(2)) == 1).alias("grp"),
    )
    return logrank_test(
        subj, duration_col="t_mins", event_col="ended", group_col="grp"
    )


@register(
    "customers_scd2_history",
    """
    WITH s1 AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS total_cents
      FROM orders
      WHERE o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1998-07-01'
      GROUP BY o_custkey),
    s2 AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS total_cents
      FROM orders
      WHERE o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1999-01-01'
      GROUP BY o_custkey),
    j AS (
      SELECT COALESCE(s1.o_custkey, s2.o_custkey) AS o_custkey,
             s1.o_custkey IS NOT NULL AS in_old,
             s2.o_custkey IS NOT NULL AS in_new,
             s1.n_orders AS o_n, s1.total_cents AS o_t,
             s2.n_orders AS n_n, s2.total_cents AS n_t
      FROM s1 FULL OUTER JOIN s2 ON s1.o_custkey = s2.o_custkey),
    hist AS (
      -- unchanged: the open H1 row survives
      SELECT o_custkey, o_n AS n_orders, o_t AS total_cents,
             DATE '1998-07-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
             TRUE AS is_current
      FROM j WHERE in_old AND in_new
        AND o_n IS NOT DISTINCT FROM n_n AND o_t IS NOT DISTINCT FROM n_t
      UNION ALL
      -- changed: H1 row closes at the second effective date
      SELECT o_custkey, o_n, o_t, DATE '1998-07-01', DATE '1999-01-01', FALSE
      FROM j WHERE in_old AND in_new
        AND (o_n IS DISTINCT FROM n_n OR o_t IS DISTINCT FROM n_t)
      UNION ALL
      -- changed: a new open row carries the full-year attributes
      SELECT o_custkey, n_n, n_t, DATE '1999-01-01', NULL, TRUE
      FROM j WHERE in_old AND in_new
        AND (o_n IS DISTINCT FROM n_n OR o_t IS DISTINCT FROM n_t)
      UNION ALL
      -- new key (H2-only customer): opens at the second effective date
      SELECT o_custkey, n_n, n_t, DATE '1999-01-01', NULL, TRUE
      FROM j WHERE NOT in_old AND in_new)
    SELECT * FROM hist
    """,
    tags=("temporal", "scd2", "warehouse", "dimension"),
)
def customers_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance, driver-verified end-to-end
    (`operators/temporal.py::scd2_apply` — previously pytest-only):
    build the per-customer order-profile dimension from the 1998-H1
    snapshot, then apply the full-1998 snapshot at the next effective
    date. Customers with H2 activity close their H1 row and open a new
    one; H2-only customers open fresh; customers with no H2 orders keep
    their open H1 row untouched (Kimball semantics). Exact-cent
    attributes make every change verdict an integer comparison; only the
    OPEN slice joins the snapshot — one key shuffle per application."""
    from covid_data_pipeline_spark.operators.temporal import scd2_apply
    from datetime import date as _date

    orders = table(spark, sf_dir, "orders")

    def snap(d0: str, d1: str) -> DataFrame:
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(d0))
                & (F.col("o_orderdate") < F.lit(d1))
            )
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.round(F.sum("o_totalprice") * 100, 0)
                .cast("long")
                .alias("total_cents"),
            )
        )

    h1 = scd2_apply(
        None,
        snap("1998-01-01", "1998-07-01"),
        keys=["o_custkey"],
        attrs=["n_orders", "total_cents"],
        effective=_date(1998, 7, 1),
    )
    h2 = scd2_apply(
        h1,
        snap("1998-01-01", "1999-01-01"),
        keys=["o_custkey"],
        attrs=["n_orders", "total_cents"],
        effective=_date(1999, 1, 1),
    )
    return h2.select(
        "o_custkey", "n_orders", "total_cents",
        "valid_from", "valid_to", "is_current",
    )


# --- interval algebra (operators/intervals.py) ------------------------
# Activity windows: every event opens [ts, ts+2h] for its user; error
# windows: every error event opens a global [ts-5min, ts+5min]. Both
# merged with the gaps-and-islands idiom; all endpoints are epoch
# MICROS (BIGINT) so the whole family is integer-exact.
_PAD_ACT_US = 7_200_000_000
_PAD_ERR_US = 300_000_000
_CELL_US = 3_600_000_000

_ACT_SQL = f"""
act AS (
  SELECT user_id, island_no, MIN(s) AS start_us, MAX(e) AS end_us,
         COUNT(*) AS n_source
  FROM (
    SELECT user_id, s, e,
           CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island_no
    FROM (
      SELECT user_id, s, e,
             CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS brk
      FROM (
        SELECT user_id, s, e,
               MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM (
          SELECT user_id, epoch_us(ts) AS s,
                 epoch_us(ts) + {_PAD_ACT_US} AS e
          FROM events))))
  GROUP BY 1, 2)
"""

_ERR_SQL = f"""
err AS (
  SELECT err_no, MIN(s) AS err_start_us, MAX(e) AS err_end_us
  FROM (
    SELECT s, e,
           CAST(SUM(brk) OVER (ORDER BY s, e
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS err_no
    FROM (
      SELECT s, e,
             CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS brk
      FROM (
        SELECT s, e,
               MAX(e) OVER (ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM (
          SELECT epoch_us(ts) - {_PAD_ERR_US} AS s,
                 epoch_us(ts) + {_PAD_ERR_US} AS e
          FROM events WHERE event_type = 'error'))))
  GROUP BY 1)
"""


def _activity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    return ev.select(
        "user_id", s.alias("s"), (s + F.lit(_PAD_ACT_US)).alias("e")
    )


def _error_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "error")
    s = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    return ev.select(
        (s - F.lit(_PAD_ERR_US)).alias("s"),
        (s + F.lit(_PAD_ERR_US)).alias("e"),
    )


@register(
    "interval_merge_activity",
    f"""
    WITH {_ACT_SQL}
    SELECT user_id, island_no, start_us, end_us, n_source FROM act
    """,
    tags=("temporal", "intervals"),
)
def interval_merge_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (`operators/intervals.py::merge_intervals`):
    every event opens a 2h activity window for its user; overlapping/
    touching windows merge into islands (~8.3k islands from 10k events
    at sf0.01). The lag-max -> break -> running-sum windows and the
    island aggregate all share one user_id partitioning — a single
    exchange end-to-end."""
    from covid_data_pipeline_spark.operators.intervals import merge_intervals

    merged = merge_intervals(
        _activity_intervals(spark, sf_dir), ["user_id"], "s", "e"
    )
    return merged.select(
        "user_id",
        "island_no",
        F.col("s").alias("start_us"),
        F.col("e").alias("end_us"),
        "n_source",
    )


@register(
    "interval_coverage_users",
    f"""
    WITH {_ACT_SQL}
    SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(end_us - start_us) AS BIGINT) AS covered_us,
           MAX(end_us - start_us) AS longest_us
    FROM act GROUP BY 1
    """,
    tags=("temporal", "intervals"),
)
def interval_coverage_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user coverage of the activity-interval union
    (`operators/intervals.py::interval_coverage`): disjoint island
    count, total covered micros, longest island — the "how much wall
    clock was this user active" rollup that raw event counts can't
    answer (overlapping windows must not double-count)."""
    from covid_data_pipeline_spark.operators.intervals import (
        interval_coverage,
    )

    cov = interval_coverage(
        _activity_intervals(spark, sf_dir), ["user_id"], "s", "e"
    )
    return cov.select(
        "user_id",
        "n_islands",
        F.col("covered").alias("covered_us"),
        F.col("longest").alias("longest_us"),
    )


@register(
    "interval_overlap_error_windows",
    f"""
    WITH {_ACT_SQL}, {_ERR_SQL}
    SELECT a.user_id, a.island_no, e.err_no,
           LEAST(a.end_us, e.err_end_us)
           - GREATEST(a.start_us, e.err_start_us) AS overlap_us
    FROM act a JOIN err e
      ON a.start_us <= e.err_end_us AND e.err_start_us <= a.end_us
    """,
    tags=("temporal", "intervals", "join"),
    bench=True,
)
def interval_overlap_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join
    (`operators/intervals.py::interval_overlap_join`): user activity
    islands x merged global error windows (~36k overlapping pairs at
    sf0.01). The engine explodes both sides to 1h cells and equi-joins
    on the cell key — each pair found exactly once at the cell of
    GREATEST(starts), no distinct — where the oracle states the plain
    quadratic inequality join."""
    from covid_data_pipeline_spark.operators.intervals import (
        interval_overlap_join,
        merge_intervals,
        merge_intervals_global,
    )

    act = merge_intervals(
        _activity_intervals(spark, sf_dir), ["user_id"], "s", "e"
    ).select(
        "user_id",
        "island_no",
        F.col("s").alias("start_us"),
        F.col("e").alias("end_us"),
    )
    # Keyless global merge: the hierarchical variant (per-cell merge ->
    # cross-cell CC -> rank over the |islands|-sized result) so the
    # error stream never funnels through one window partition — the
    # oracle's constant-key sweep produces the identical island set.
    err = merge_intervals_global(
        _error_intervals(spark, sf_dir),
        "s",
        "e",
        cell_size=_CELL_US,
        island_col="err_no",
    ).select(
        F.col("err_no"),
        F.col("s").alias("err_start_us"),
        F.col("e").alias("err_end_us"),
    )
    pairs = interval_overlap_join(
        act,
        err,
        "start_us",
        "end_us",
        "err_start_us",
        "err_end_us",
        cell_size=_CELL_US,
    )
    return pairs.select(
        "user_id",
        "island_no",
        "err_no",
        F.col("overlap").alias("overlap_us"),
    )


@register(
    "interval_gaps_users",
    f"""
    WITH {_ACT_SQL}
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS idle_us,
           MAX(gap_us) AS longest_gap_us
    FROM (
      SELECT user_id,
             LEAD(start_us) OVER (PARTITION BY user_id
               ORDER BY island_no) - end_us AS gap_us
      FROM act)
    WHERE gap_us IS NOT NULL
    GROUP BY 1
    """,
    tags=("temporal", "intervals"),
)
def interval_gaps_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complement of coverage: per-user downtime between activity
    islands — gap count, total idle micros, longest outage. One LEAD
    over the |islands|-sized merged relation (same user_id partitioning
    as the merge, so Catalyst reuses the exchange); gaps are strictly
    positive by construction (touching intervals already merged)."""
    from covid_data_pipeline_spark.operators.intervals import merge_intervals

    merged = merge_intervals(
        _activity_intervals(spark, sf_dir), ["user_id"], "s", "e"
    )
    w = Window.partitionBy("user_id").orderBy("island_no")
    gaps = merged.withColumn(
        "gap_us", F.lead("s").over(w) - F.col("e")
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("idle_us"),
        F.max("gap_us").alias("longest_gap_us"),
    )


@register(
    "events_sax_words",
    """
    WITH sx_daily AS (
      SELECT event_type, CAST(ts AS DATE) - DATE '1970-01-01' AS day_num,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    sx_seg AS (
      SELECT event_type, day_num // 7 AS seg, CAST(SUM(cnt) AS BIGINT) AS tot
      FROM sx_daily GROUP BY 1, 2),
    sx_rank AS (SELECT tot, ROW_NUMBER() OVER (ORDER BY tot) AS r
                FROM sx_seg),
    sx_n AS (SELECT COUNT(*) AS n FROM sx_seg),
    sx_bp AS (
      SELECT tot FROM sx_rank, sx_n
      WHERE r IN ((1*n + 3)//4, (2*n + 3)//4, (3*n + 3)//4)),
    sx_sym AS (
      SELECT s.event_type, s.seg,
             97 + (SELECT COUNT(*) FROM sx_bp b WHERE s.tot > b.tot) AS ci
      FROM sx_seg s)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_segments,
           string_agg(chr(CAST(ci AS INTEGER)), '' ORDER BY seg) AS sax_word
    FROM sx_sym GROUP BY event_type
    """,
    tags=("events", "timeseries", "sax", "symbolic"),
)
def events_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic compression (Lin/Keogh et al., DMKD 2003;
    `operators/temporal.py::sax_words`): each event type's daily-count
    series PAA-compressed into weekly segments and symbolized over an
    equi-depth 4-letter alphabet whose breakpoints are exact
    order-statistic values — the representation motif discovery and
    series-similarity grammars index instead of raw points. Everything
    is BIGINT comparisons (segment sums, order-stat breakpoints,
    strictly-greater symbol indexing), so the 5 words replay
    bit-for-bit in the oracle. Scale shape: corpus -> one rollup to
    |types x weeks|; the rank window and 3 collected breakpoints touch
    only that compact relation."""
    from covid_data_pipeline_spark.operators.temporal import sax_words

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_num"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return sax_words(
        daily, ["event_type"], "day_num", "cnt", paa_width=7, alphabet=4
    )
