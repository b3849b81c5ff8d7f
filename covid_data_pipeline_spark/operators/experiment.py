"""Experiment (A/B) analysis: CUPED variance-reduced effect estimates.

CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.,
WSDM 2013 — the industry-standard variance-reduction trick) regresses
the experiment metric on a pre-period covariate and removes the
explained component:

    theta   = cov(X, Y) / var(X)          (pooled over all units)
    Y_adj   = Y − theta · (X − mean(X))
    effect  = mean(Y_adj | treat) − mean(Y_adj | control)

Because assignment is independent of the pre-period, the adjustment is
unbiased and shrinks the effect's variance by the squared correlation
ρ² — typically 30–60% for revenue-like metrics, i.e. the same
sensitivity from half the sample.

Scale + float policy: everything reduces to ONE map-side-combined
aggregation over per-unit rows (conditional sums; no shuffle beyond the
single-row combine, nothing per-group re-enters). Metrics are floored
to integer cents and all first-order moment products are carried in
DECIMAL(38,0) — exact, partition-order independent — with the final
ratios (theta, effect, ρ²) taken as correctly-rounded double divisions
of exact integers, so the report is bit-identical across engines and
partitionings. Envelope: n·ΣXY must fit 38 digits (≈ 1e9 units of
1e6-cent metrics); past that, drop to double moments — the estimate is
statistical, only VERIFICATION needs exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = "decimal(38,0)"


def cuped_adjusted_effect(
    units: DataFrame,
    treat_col: str,
    x_col: str,
    y_col: str,
    scale: int = 100,
) -> DataFrame:
    """One-row CUPED report over per-unit rows (one row per
    randomization unit, ``treat_col`` boolean-ish, ``x_col`` the
    pre-period covariate, ``y_col`` the experiment metric).

    Returns ``n_treat, n_ctrl, theta, effect_raw_cents,
    effect_cuped_cents, var_reduction_pct``. Constant covariate
    (var(X) = 0) degrades gracefully: theta NULL, CUPED effect = raw
    effect, reduction 0."""
    t = F.col(treat_col).cast("boolean")
    xq = F.floor(F.col(x_col) * scale).cast(_D)
    yq = F.floor(F.col(y_col) * scale).cast(_D)

    m = units.agg(
        F.count(F.lit(1)).cast(_D).alias("n"),
        F.sum(xq).alias("sx"),
        F.sum(yq).alias("sy"),
        F.sum((xq * yq).cast(_D)).alias("sxy"),
        F.sum((xq * xq).cast(_D)).alias("sxx"),
        F.sum((yq * yq).cast(_D)).alias("syy"),
        F.sum(F.when(t, 1).otherwise(0)).cast(_D).alias("nt"),
        F.sum(F.when(t, xq).otherwise(F.lit(0).cast(_D))).alias("sxt"),
        F.sum(F.when(t, yq).otherwise(F.lit(0).cast(_D))).alias("syt"),
    )

    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nc = F.col("n") - F.col("nt")
    sxc = F.col("sx") - F.col("sxt")
    syc = F.col("sy") - F.col("syt")
    # exact integer second moments (DECIMAL), ratios in double
    var_n = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vary_n = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    theta = F.when(var_n > 0, cov_n / var_n)
    raw = d("syt") / d("nt") - syc.cast("double") / nc.cast("double")
    dx = d("sxt") / d("nt") - sxc.cast("double") / nc.cast("double")
    adj = F.when(theta.isNotNull(), raw - theta * dx).otherwise(raw)
    rho2 = F.when(
        (var_n > 0) & (vary_n > 0), cov_n * cov_n / (var_n * vary_n)
    ).otherwise(F.lit(0.0))

    return m.select(
        F.col("nt").cast("bigint").alias("n_treat"),
        nc.cast("bigint").alias("n_ctrl"),
        F.round(theta, 6).alias("theta"),
        F.round(raw, 4).alias("effect_raw_cents"),
        F.round(adj, 4).alias("effect_cuped_cents"),
        F.round(F.lit(100.0) * rho2, 2).alias("var_reduction_pct"),
    )
