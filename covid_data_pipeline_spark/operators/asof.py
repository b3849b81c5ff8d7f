"""As-of (most-recent-prior) join — an operator Spark lacks natively.

For each left row (key, t), attach the latest right row with the same key
and right.t ≤ left.t (backward direction), optionally within a tolerance.
The classic time-series enrichment join (trades←quotes, events←snapshots).

Spark-first implementation (no UDF, no per-key loop): tag and UNION both
sides, then one window pass per key ordered by time — ``last(value,
ignorenulls=True)`` over rows-unbounded-preceding carries the most recent
right values forward into each left row. Cost: ONE shuffle on the key +
one sort — the same cost profile as any window aggregate, linear in
(|left| + |right|) per key, no range-explosion. This is the scale path; a
broadcast range join would be quadratic per key.

Ties (equal timestamps) resolve right-row-first, so a right row at
exactly t is visible to a left row at t (inclusive backward — matches
DuckDB/pandas ``ASOF JOIN`` semantics, which the oracle checks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join.

    Parameters
    ----------
    on: ordering column name (present in both sides; typically a
        timestamp).
    by: equi-join key columns (present in both sides).
    value_cols: right-side columns to attach (default: all non-key,
        non-``on`` columns). Attached as ``<name><suffix>`` when the name
        collides with a left column, verbatim otherwise.
    tolerance: optional max staleness as an INTERVAL string (e.g.
        ``'1 hour'``) — matches older than ``on − tolerance`` become NULL
        (pandas ``merge_asof(tolerance=...)`` semantics).
    tiebreak: optional right-side column appended to the window ORDER BY
        so duplicate right rows at the same (by, on) resolve
        deterministically — the LARGEST tiebreak value wins (analogue of
        pandas merge_asof taking the last input row). Without it, which
        duplicate wins can vary across partitionings — per the repo
        float-policy rule, any window whose result depends on order
        needs a unique tiebreaker, so pass one whenever the right side
        can hold same-timestamp duplicates per key.
    """
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, on)]
    value_cols = list(value_cols)
    left_cols = left.columns
    out_names = {
        v: (v + suffix if v in left_cols else v) for v in value_cols
    }

    # Unified relation: left rows carry NULL right-values; right rows carry
    # NULL left-extras. __side orders right (0) before left (1) at equal
    # timestamps → inclusive backward match.
    l_tagged = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols if c not in (*by, on)],
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in value_cols],
        *(
            [F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb")]
            if tiebreak is not None
            else []
        ),
    )
    r_tagged = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left_cols
            if c not in (*by, on)
        ],
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
        *([F.col(tiebreak).alias("__tb")] if tiebreak is not None else []),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Ascending tiebreak + rows-unbounded-preceding last() → the largest
    # tiebreak among same-(by, on) right rows is carried. Left rows hold
    # a NULL tiebreak; their relative order is irrelevant (each left row
    # only reads carried right values, and __side already sorts every
    # right row first at equal timestamps).
    order_by = [F.col(on), F.col("__side")]
    if tiebreak is not None:
        order_by.append(F.col("__tb").asc_nulls_last())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"__c_{v}") for v in value_cols],
        F.last(F.when(F.col("__side") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias("__matched_on"),
    )

    matched_ok = (
        F.col("__matched_on").isNotNull()
        if tolerance is None
        else F.col("__matched_on") >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
    )
    return carried.filter(F.col("__side") == 1).select(
        *by,
        F.col(on),
        *[F.col(f"__l_{c}").alias(c) for c in left_cols if c not in (*by, on)],
        *[
            F.when(matched_ok, F.col(f"__c_{v}")).alias(out_names[v])
            for v in value_cols
        ],
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Cogrouped-pandas twin of :func:`asof_join`: both sides are
    cogrouped on ``by`` (``groupBy().cogroup().applyInPandas``) and each
    key's pair of Arrow batches is joined with pandas ``merge_asof`` —
    the reference semantics the column-algebra operator is tested
    against.

    Use the column-algebra :func:`asof_join` in production plans: it
    stays JVM-side and reuses one shuffle+sort. This twin exists (a)
    as an executable spec — merge_asof IS the contract the docstring
    above cites — and (b) as the escape hatch pattern for per-key
    logic pandas has but column algebra lacks. One shuffle per side on
    ``by``; per-key data must fit a pandas frame (true for any sane
    ``by`` cardinality; a single mega-key would need salting first).
    """
    import pandas as pd

    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, on)]
    value_cols = list(value_cols)
    left_cols = left.columns
    out_names = {v: (v + suffix if v in left_cols else v) for v in value_cols}

    from pyspark.sql.types import StructType

    # StructType.add MUTATES in place — never call it on a DataFrame's
    # live schema object (it corrupts the frame's cached column list).
    out_schema = StructType(list(left.schema.fields))
    right_fields = {f.name: f for f in right.schema.fields}
    for v in value_cols:
        f = right_fields[v]
        out_schema = out_schema.add(out_names[v], f.dataType, True)

    tol = (
        pd.Timedelta(tolerance)
        if isinstance(tolerance, str)
        else tolerance  # numeric for integer `on` columns, or None
    )

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        lpdf = lpdf.sort_values(on, kind="mergesort", ignore_index=True)
        rsel = rpdf[[on, *value_cols]].rename(columns=out_names)
        rsel = rsel.sort_values(on, kind="mergesort", ignore_index=True)
        merged = pd.merge_asof(
            lpdf, rsel, on=on, direction="backward", tolerance=tol
        )
        return merged[[f.name for f in out_schema.fields]]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(fn, out_schema)
    )
