"""Time-range (interval) equi-key join — the scale path.

Spark has no native range join: `l JOIN r ON key AND r.ts BETWEEN l.ts-W
AND l.ts` plans as a BroadcastNestedLoopJoin or a cartesian re-filter,
both of which die at scale. The standard fix (used by every streaming
engine's interval join and Databricks' range-join hints) is *bucketing*:
quantize time into buckets of about the window width, explode the left
side to the <= 2 buckets its window overlaps, equi-join on
(keys..., bucket) — a plain shuffled hash join — then apply the exact
range predicate. Work is proportional to true matches per bucket, not
|L| x |R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.scalar import epoch_seconds


def _seconds(df: DataFrame, name: str, ref: Column | None = None) -> Column:
    """Ordering column as DOUBLE seconds: timestamps (incl. TIMESTAMP_NTZ,
    which Spark 4 won't cast straight to numeric) go through
    epoch_seconds; numeric columns cast directly."""
    c = F.col(name) if ref is None else ref
    if dict(df.dtypes)[name].startswith("timestamp"):
        return epoch_seconds(c)
    return c.cast("double")


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    bucket_s: float | None = None,
) -> DataFrame:
    """Inner-join rows with equal ``keys`` where
    ``left_ts + lower_s < right_ts <= left_ts + upper_s``.

    ``bucket_s`` defaults to the window width, bounding the left-side
    explode factor at 2 buckets per row. One shuffle on
    (keys..., bucket); no nested-loop anywhere in the plan (asserted in
    tests/test_plans.py). Columns named like ``keys``/timestamps must be
    unambiguous across the two inputs (rename beforehand).
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    width = upper_s - lower_s
    b = bucket_s or width

    lsec = _seconds(left, left_ts)
    rsec = _seconds(right, right_ts)

    r = right.withColumn("_rj_bucket", F.floor(rsec / b))
    l = left.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor((lsec + lower_s) / b).cast("long"),
                F.floor((lsec + upper_s) / b).cast("long"),
            )
        ),
    )
    cond = [l[k] == r[k] for k in keys] + [l["_rj_bucket"] == r["_rj_bucket"]]
    joined = l.join(r, cond)
    rj_sec = _seconds(right, right_ts, r[right_ts])
    lj_sec = _seconds(left, left_ts, l[left_ts])
    exact = (rj_sec > lj_sec + lower_s) & (rj_sec <= lj_sec + upper_s)
    drop = [l["_rj_bucket"], r["_rj_bucket"]] + [r[k] for k in keys]
    out = joined.filter(exact)
    for c in drop:
        out = out.drop(c)
    return out
