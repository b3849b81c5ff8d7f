"""Ordered funnel analysis: first-completion times for a sequence of
event stages per user.

The reference's event pipeline reports per-window event counts and the
audience-intersection metric (clicked AND bought per day); an ordered
funnel is the sequential refinement — "reached stage i+1 strictly AFTER
stage i" — that a product-analytics user of the reference would expect
next (cf. /root/reference/airflow/dags/scripts/ event aggregation; the
reference has no ordered-sequence operator, so this is engine-added
surface like §2.9 streaming).

Design (100 TB posture):

- The corpus is first FILTERED to the funnel's stage types — at scale
  that predicate reaches the parquet scan, so a 3-stage funnel over a
  100-type event stream reads a fraction of the data.
- ONE hash shuffle on the user key; each user's stage events are
  collected and sorted (``sort_array`` of ``struct(ts, type)``) and the
  stage times are computed by a codegen'd ``F.aggregate`` fold — no
  per-stage self-joins (the naive plan is k-1 joins over the corpus),
  no Python in the hot path.
- Per-user list size is bounded by that user's STAGE-event count, not
  total activity. For adversarial users (bots with millions of stage
  events) cap upstream with a per-user quota sample.

Tie semantics match the stepwise-minimum SQL exactly: stage i+1 counts
only events with ``ts`` strictly greater than the stage-i time, so
equal-timestamp stage pairs never advance the funnel regardless of
sort order within the tie.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    df: DataFrame,
    user_col: str | Sequence[str],
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    max_gap: str | None = None,
) -> DataFrame:
    """Per-user first-completion time for each ordered stage.

    Returns one row per user that has at least one stage event, with
    columns ``t0 .. t{k-1}``: ``t0`` is the user's earliest ``stages[0]``
    event; ``t{i}`` is the earliest ``stages[i]`` event strictly after
    ``t{i-1}`` (NULL if the user never advanced that far). Equivalent to
    the stepwise SQL ``MIN(ts) WHERE ts > prev`` chain, in one shuffle.

    ``max_gap`` (an INTERVAL string like ``"24 hours"``) additionally
    requires ``t{i} <= t{i-1} + max_gap``. The funnel is anchored at the
    user's FIRST ``stages[0]`` event — there is no re-anchoring to later
    stage-0 events when a window expires (re-anchored "any qualifying
    chain" matching is a different, join-shaped problem).
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    gap = F.expr(f"INTERVAL {max_gap}") if max_gap is not None else None
    ts_type = df.schema[ts_col].dataType
    ev = df.filter(
        F.col(type_col).isin(list(stages)) & F.col(ts_col).isNotNull()
    )
    per_user = ev.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("ts"), F.col(type_col).alias("tp")
                )
            )
        ).alias("__evs")
    )

    init = F.struct(
        *[F.lit(None).cast(ts_type).alias(f"t{i}") for i in range(len(stages))]
    )

    def merge(acc, e):  # noqa: ANN001 — Column lambda for F.aggregate
        fields = []
        for i, stage in enumerate(stages):
            cond = acc[f"t{i}"].isNull() & (e["tp"] == stage)
            if i > 0:
                prev = acc[f"t{i - 1}"]
                cond = cond & prev.isNotNull() & (e["ts"] > prev)
                if gap is not None:
                    cond = cond & (e["ts"] <= prev + gap)
            fields.append(
                F.when(cond, e["ts"]).otherwise(acc[f"t{i}"]).alias(f"t{i}")
            )
        return F.struct(*fields)

    state = F.aggregate(F.col("__evs"), init, merge)
    return per_user.select(
        *keys,
        *[state[f"t{i}"].alias(f"t{i}") for i in range(len(stages))],
    )


def funnel_histogram(
    df: DataFrame,
    user_col: str | Sequence[str],
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    max_gap: str | None = None,
) -> DataFrame:
    """Funnel drop-off histogram: for each stage depth 1..k, how many
    funnel units (users — or user-sessions etc. when ``user_col`` is a
    composite key) reached exactly that far. Units whose furthest stage
    is 0 (never did ``stages[0]``) are excluded — the funnel population
    is entrants. Output: (stage_reached int, users bigint)."""
    times = funnel_stage_times(df, user_col, ts_col, type_col, stages, max_gap)
    reached = F.lit(0)
    for i in range(len(stages)):
        reached = F.when(F.col(f"t{i}").isNotNull(), i + 1).otherwise(reached)
    return (
        times.select(reached.cast("int").alias("stage_reached"))
        .filter(F.col("stage_reached") >= 1)
        .groupBy("stage_reached")
        .agg(F.count(F.lit(1)).alias("users"))
    )
