"""Privacy-risk auditing operators.

The reference egresses row-level country/day health counts into
Postgres and Superset with no disclosure review (reference
`airflow/dags/covid_alerts_dag.py:17-28` ships raw counts; the
README's dashboard exposes them directly). A governed warehouse runs
the k-anonymity → l-diversity → t-closeness ladder before any egress;
the first two audits live in `harness/queries_core.py`
(customers_k_anonymity / customers_l_diversity) — this module adds the
third (Li, Li & Venkatasubramanian, ICDE 2007): a class can be large
AND entropy-diverse while its sensitive distribution still deviates
sharply from the population's, which is what an attacker actually
learns.

Exactness: for ORDERED sensitive buckets the Earth-Mover's Distance
with unit ground distance is the mean absolute cumulative difference
``EMD = (1/(m-1)) * sum_i |CumP_i - CumQ_i|``. Scaling both
distributions by ``n_class * N`` makes every term an exact integer
(``d_i = n_class_bucket * N - N_bucket * n_class``), the cumulative
sums stay integral in DECIMAL(38,0), and the t-threshold verdict
compares integers (t dyadic-free: ``meets_t(1/5)`` is
``5 * emd_scaled <= (m-1) * n_class * N``). The single float division
renders the ROUND(6) display column — the same micro-exact pattern as
the l-diversity micro-nats.

Scale: one rollup to |classes × buckets| (map-side combinable), a
broadcast of the |buckets|-sized global marginal, one per-class
ordered window over <= m rows per class, one regroup. No corpus-sized
state anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["t_closeness"]


def t_closeness(
    df: DataFrame,
    class_cols: Sequence[str],
    bucket_col: str,
    t_num: int = 1,
    t_den: int = 5,
) -> DataFrame:
    """Per-equivalence-class t-closeness over an ORDERED sensitive
    bucket column (integral; callers bucket continuous sensitive
    values first — fixed-width or order-stat bins both work, as long
    as both engines derive the same bins).

    Returns one row per class: ``class_cols + (class_size, emd,
    meets_t)`` where ``emd`` is the unit-ground-distance EMD between
    the class's bucket distribution and the global one (0 = identical,
    1 = maximally separated), and ``meets_t`` is the exact-integer
    verdict ``emd <= t_num/t_den``."""
    keys = list(class_cols)
    if not keys:
        raise ValueError("class_cols must be non-empty")
    if t_num < 0 or t_den <= 0:
        raise ValueError(f"bad t threshold {t_num}/{t_den}")

    cb = df.groupBy(*keys, bucket_col).agg(F.count(F.lit(1)).alias("_ncb"))
    cb = cb.localCheckpoint(eager=False)  # feeds 3 rollups below
    classes = cb.groupBy(*keys).agg(F.sum("_ncb").alias("_nc"))
    buckets = cb.groupBy(bucket_col).agg(F.sum("_ncb").alias("_nb"))
    m = buckets.agg(
        F.count(F.lit(1)).alias("_m"), F.sum("_nb").alias("_n")
    )
    # Dense class x bucket grid: missing (class, bucket) cells count 0
    # for the class but not globally, and the cumulative walk needs
    # every bucket. |classes| x |buckets| rows — both rollup-sized.
    # bcast: model(|buckets|) global marginal + const(1) totals
    grid = (
        classes.crossJoin(F.broadcast(buckets))
        .crossJoin(F.broadcast(m))
        .join(cb, [*keys, bucket_col], "left")
        .withColumn("_ncb", F.coalesce(F.col("_ncb"), F.lit(0)))
    )
    d = (
        F.col("_ncb").cast("decimal(38,0)") * F.col("_n")
        - F.col("_nb").cast("decimal(38,0)") * F.col("_nc")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.withColumn("_cum", F.sum(d).over(w))
    out = cum.groupBy(*keys).agg(
        F.first("_nc").alias("class_size"),
        F.sum(F.abs(F.col("_cum"))).alias("_emd_scaled"),
        F.first("_m").alias("_m"),
        F.first("_n").alias("_n"),
    )
    scale = (
        (F.col("_m") - F.lit(1)).cast("decimal(38,0)")
        * F.col("class_size")
        * F.col("_n")
    )
    from covid_data_pipeline_spark.functions.scalar import round_stable

    return out.select(
        *keys,
        F.col("class_size").cast("bigint").alias("class_size"),
        round_stable(
            F.try_divide(
                F.col("_emd_scaled").cast("double"), scale.cast("double")
            ),
            6,
        ).alias("emd"),
        (
            F.col("_emd_scaled") * F.lit(int(t_den))
            <= scale * F.lit(int(t_num))
        ).alias("meets_t"),
    )
