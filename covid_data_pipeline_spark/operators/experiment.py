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

from covid_data_pipeline_spark.functions.scalar import round_stable

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
    effect, reduction 0.

    Units with a NULL assignment, covariate, or metric are EXCLUDED up
    front: every moment then ranges over the same population (counting
    a NULL-metric unit in n while its sum skips it would bias the
    means, and a NULL assignment belongs to neither arm — the same
    drop policy as :func:`srm_check`)."""
    t = F.col(treat_col).cast("boolean")
    units = units.filter(
        t.isNotNull() & F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
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
        round_stable(theta, 6).alias("theta"),
        round_stable(raw, 4).alias("effect_raw_cents"),
        round_stable(adj, 4).alias("effect_cuped_cents"),
        F.round(F.lit(100.0) * rho2, 2).alias("var_reduction_pct"),
    )


def srm_check(
    units: DataFrame,
    treat_col: str,
    ratio_treat: int = 1,
    ratio_ctrl: int = 1,
) -> DataFrame:
    """Sample-ratio-mismatch guard — the first thing an experimentation
    platform checks before reading ANY metric: if the realized
    treatment/control split deviates from the design ratio, assignment
    is broken (bot filtering, logging loss, redirect bugs) and every
    downstream readout is invalid.

    Chi-square goodness-of-fit on the two observed counts against
    expected ``ratio_treat : ratio_ctrl``. With ``D = O_t·r_c − O_c·r_t``
    the two Pearson terms telescope — ``(O_t−E_t)²/E_t + (O_c−E_c)²/E_c``
    with ``E_t = n·r_t/(r_t+r_c)`` collapses to an exact integer
    rational::

        X² = (O_t·r_c − O_c·r_t)² / (n · r_t · r_c)

    (e.g. 60/40 observed at a 1:1 design: E = 50/50, X² = 100/50·2 = 4)

    reported in milli-units (``chi2_milli = num·1000 div den`` —
    positive operands, floor-stable on any engine) and flagged against
    the α = 0.001 critical value 10.828 (SRM convention: an experiment
    triggers only on overwhelming evidence, since n is huge and tiny
    imbalances are real but harmless at α = 0.05). One count aggregate,
    single-row output."""
    t = F.col(treat_col).cast("boolean")
    m = units.agg(
        F.sum(F.when(t, 1).otherwise(0)).cast("bigint").alias("n_treat"),
        F.sum(F.when(~t, 1).otherwise(0)).cast("bigint").alias("n_ctrl"),
    )
    d = lambda c: c.cast(_D)  # noqa: E731
    diff = d(F.col("n_treat") * ratio_ctrl - F.col("n_ctrl") * ratio_treat)
    num = diff * diff
    den = (
        d(F.col("n_treat") + F.col("n_ctrl"))
        * F.lit(ratio_treat).cast(_D)
        * F.lit(ratio_ctrl).cast(_D)
    )
    chi2_milli = F.expr("CAST((__num * 1000) div __den AS BIGINT)")
    return (
        m.withColumn("__num", num)
        .withColumn("__den", den)
        .select(
            "n_treat",
            "n_ctrl",
            chi2_milli.alias("chi2_milli"),
            (chi2_milli > F.lit(10_828)).alias("srm_detected"),
        )
    )


def diff_in_diff(
    units: DataFrame,
    treat_col: str,
    pre_col: str,
    post_col: str,
    scale: int = 100,
) -> DataFrame:
    """Difference-in-differences effect — the readout when assignment
    is NOT randomized (a staged rollout, a geo launch): the treated
    group's pre→post change minus the control group's, which nets out
    any shared trend under the parallel-trends assumption::

        DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)

    Input is one row per unit with its pre- and post-period metric.
    Four conditional integer-cent sums in one map-side-combined
    aggregate; the estimate is a correctly-rounded double combination
    of exact DECIMAL ratios. Returns the four group means (cents) and
    ``did_cents``. Units with NULL assignment or NULL period metrics
    are excluded up front (same population for every moment — the
    :func:`cuped_adjusted_effect` policy)."""
    t = F.col(treat_col).cast("boolean")
    units = units.filter(
        t.isNotNull()
        & F.col(pre_col).isNotNull()
        & F.col(post_col).isNotNull()
    )
    pre = F.floor(F.col(pre_col) * scale).cast(_D)
    post = F.floor(F.col(post_col) * scale).cast(_D)
    zero = F.lit(0).cast(_D)
    m = units.agg(
        F.sum(F.when(t, 1).otherwise(0)).cast(_D).alias("nt"),
        F.sum(F.when(~t, 1).otherwise(0)).cast(_D).alias("nc"),
        F.sum(F.when(t, pre).otherwise(zero)).alias("t_pre"),
        F.sum(F.when(t, post).otherwise(zero)).alias("t_post"),
        F.sum(F.when(~t, pre).otherwise(zero)).alias("c_pre"),
        F.sum(F.when(~t, post).otherwise(zero)).alias("c_post"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mt_pre, mt_post = d("t_pre") / d("nt"), d("t_post") / d("nt")
    mc_pre, mc_post = d("c_pre") / d("nc"), d("c_post") / d("nc")
    return m.select(
        F.col("nt").cast("bigint").alias("n_treat"),
        F.col("nc").cast("bigint").alias("n_ctrl"),
        F.round(mt_pre, 4).alias("treat_pre_cents"),
        F.round(mt_post, 4).alias("treat_post_cents"),
        F.round(mc_pre, 4).alias("ctrl_pre_cents"),
        F.round(mc_post, 4).alias("ctrl_post_cents"),
        round_stable((mt_post - mt_pre) - (mc_post - mc_pre), 4).alias("did_cents"),
    )


def independence_chi2(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Pearson chi-square test of independence for an R×C contingency
    table (does behavior distribution differ across segments?) — the
    R×C generalization of :func:`srm_check`'s two-cell statistic.

    Each cell's term is the exact rational ``(O·n − R·C)² / (n·R·C)``
    (O observed, R/C marginal totals, n grand total — all BIGINT-exact
    counts carried in DECIMAL(38,0)), evaluated with one
    correctly-rounded double division, rounded once to 6dp and summed
    in DECIMAL — so the statistic is bit-stable on any engine or
    partitioning (the BM25 term-sum pattern applied to a test
    statistic). ZERO cells contribute their expected mass (R·C/n):
    the cell grid is the cross join of the marginals, not just the
    observed pairs. Returns one row: ``chi2``, ``dof`` =
    (R−1)(C−1), ``n``. NULL categories are excluded (they belong to
    no cell). Compare chi2 against the caller's critical value for
    ``dof`` — at warehouse n even tiny real dependences are
    "significant", so effect size (e.g. Cramér's V = sqrt(chi2/(n·
    min(R,C)−1))) should gate decisions, not p alone."""
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(row_col).alias("__r"), F.col(col_col).alias("__c")
    ).filter(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
    obs = base.groupBy("__r", "__c").agg(
        F.count(F.lit(1)).cast(d38).alias("__o")
    )
    rows = base.groupBy("__r").agg(F.count(F.lit(1)).cast(d38).alias("__rt"))
    cols = base.groupBy("__c").agg(F.count(F.lit(1)).cast(d38).alias("__ct"))
    n_row = base.agg(F.count(F.lit(1)).cast(d38).alias("__n"))
    grid = (
        # bcast: const(|categories|) per-column marginals
        rows.crossJoin(F.broadcast(cols))
        .join(obs, ["__r", "__c"], "left")
        # bcast: const(1) scalar n agg
        .crossJoin(F.broadcast(n_row))
        .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0).cast(d38)))
    )
    diff = (F.col("__o") * F.col("__n") - F.col("__rt") * F.col("__ct")).cast(
        d38
    )
    term = F.round(
        (diff * diff).cast(d38).cast("double")
        / (F.col("__n") * F.col("__rt") * F.col("__ct")).cast(d38).cast(
            "double"
        ),
        6,
    ).cast("decimal(18,6)")
    return grid.agg(
        F.round(F.sum(term), 4).cast("double").alias("chi2"),
        (
            (F.countDistinct("__r") - 1) * (F.countDistinct("__c") - 1)
        ).alias("dof"),
        F.max("__n").cast("bigint").alias("n"),
    )


def mann_whitney_u(
    units: DataFrame,
    treat_col: str = "treat",
    value_col: str = "value_cents",
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) comparing the treatment and
    control value distributions — the NONPARAMETRIC sibling of
    :func:`cuped_adjusted_effect` for skewed metrics where a mean
    difference is dominated by whales.

    Exactness: U is computed without ranking rows at all —
    ``U = #pairs(t > c) + ties/2`` over the VALUE-compressed domain:
    one groupBy(value) rollup to (v, n_treat_v, n_ctrl_v), a cumulative
    control count over distinct values (window over the compressed
    domain, same trick as quantile_normalize — |distinct values| rows,
    never |rows|), then exact integer products. Doubling removes the
    half: ``u2 = 2·Σ tv·cum_c_less + Σ tv·cv``. The normal
    approximation carries the tie correction with every moment exact in
    DECIMAL(38,0)/HUGEINT (t³ sums overflow BIGINT at realistic scales)
    and spends floats only on the final sqrt/division — bit-identical
    cross-engine. AUC = U/(n_t·n_c) is the probability a random treated
    value beats a random control value (common-language effect size).

    Returns one row: (n_treat, n_ctrl, u2_treat, auc, z).
    """
    d = _D
    per_v = (
        units.select(
            F.col(value_col).alias("__v"),
            F.when(F.col(treat_col), 1).otherwise(0).alias("__t"),
        )
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(
            F.sum("__t").cast("long").alias("tv"),
            F.sum(1 - F.col("__t")).cast("long").alias("cv"),
        )
    )
    from pyspark.sql.window import Window

    wcum = (
        Window.orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_v.withColumn(
        "cum_c_leq", F.sum("cv").over(wcum).cast("long")
    ).withColumn("cum_c_less", (F.col("cum_c_leq") - F.col("cv")))
    t_tot = F.col("tv") + F.col("cv")
    agg = cum.agg(
        F.sum("tv").cast("long").alias("n_treat"),
        F.sum("cv").cast("long").alias("n_ctrl"),
        (
            F.lit(2) * F.sum(F.col("tv") * F.col("cum_c_less"))
            + F.sum(F.col("tv") * F.col("cv"))
        )
        .cast("long")
        .alias("u2_treat"),
        F.sum((t_tot * t_tot * t_tot - t_tot).cast(d))
        .cast(d)
        .alias("__tie3"),
    )
    n = (F.col("n_treat") + F.col("n_ctrl")).cast(d)
    nt = F.col("n_treat").cast(d)
    nc = F.col("n_ctrl").cast(d)
    # var(U) = nt·nc/12 · ((n+1) − Σ(t³−t)/(n(n−1))); exact numerator /
    # denominator, one float division + sqrt at the end.
    var_num = (
        nt * nc * ((n * (n - 1) * (n + 1)).cast(d) - F.col("__tie3"))
    ).cast(d)
    var_den = (F.lit(12).cast(d) * n * (n - 1)).cast(d)
    z = (
        (F.col("u2_treat").cast("double") - (nt * nc).cast("double"))
        / (
            F.lit(2.0)
            * F.sqrt(var_num.cast("double") / var_den.cast("double"))
        )
    )
    return agg.select(
        "n_treat",
        "n_ctrl",
        "u2_treat",
        round_stable(
            F.col("u2_treat").cast("double")
            / (F.lit(2.0) * (nt * nc).cast("double")),
            6,
        ).alias("auc"),
        round_stable(z, 4).alias("z"),
    )


def two_proportion_ztest(
    units: DataFrame,
    treat_col: str = "treat",
    converted_col: str = "converted",
) -> DataFrame:
    """Two-proportion z-test on conversion rates — the binary-outcome
    staple between :func:`srm_check` (are the ARMS sized right?) and
    :func:`cuped_adjusted_effect` (continuous value): did treatment
    change the conversion RATE? Pooled-variance z over per-unit
    booleans, plus the integer-exact lift in basis points.

    Exactness: the four counts are exact BIGINTs from one
    map-side-combined aggregation; lift_bp is integer floor division
    (xt·nc−xc·nt scaled against xc·nt); z spends floats on one
    division+sqrt over exact integer products (DECIMAL(38,0) — n³-scale
    numerators outgrow BIGINT at ~2M units). Returns one row:
    (n_treat, n_ctrl, conv_treat, conv_ctrl, lift_bp, z).
    """
    d = _D
    t = F.when(F.col(treat_col), 1).otherwise(0)
    c = F.when(F.col(converted_col), 1).otherwise(0)
    agg = units.agg(
        F.sum(t).cast("long").alias("n_treat"),
        F.sum(1 - t).cast("long").alias("n_ctrl"),
        F.sum(t * c).cast("long").alias("conv_treat"),
        F.sum((1 - t) * c).cast("long").alias("conv_ctrl"),
    )
    nt, nc = F.col("n_treat").cast(d), F.col("n_ctrl").cast(d)
    xt, xc = F.col("conv_treat").cast(d), F.col("conv_ctrl").cast(d)
    x, n = (xt + xc).cast(d), (nt + nc).cast(d)
    # z = (xt/nt − xc/nc) / sqrt(p̂(1−p̂)(1/nt + 1/nc)), all moments
    # exact: numerator (xt·nc − xc·nt)·n, denom² = x(n−x)(nt+nc)·nt·nc/n...
    # expressed as one division of exact integer products:
    # z² = (xt·nc − xc·nt)² · n / (x·(n−x)·nt·nc)
    diff = (xt * nc - xc * nt).cast(d)
    # degenerate designs (nobody / everybody converted, or an empty
    # arm) have zero pooled variance: z is undefined — NULL, not an
    # ANSI divide-by-zero (bit us: "ever purchased" saturates at 100%)
    z = F.when(
        (x > 0) & (x < n) & (nt > 0) & (nc > 0),
        diff.cast("double")
        / F.sqrt(
            (x * (n - x)).cast(d).cast("double")
            * (nt * nc).cast(d).cast("double")
            / n.cast("double")
        ),
    )
    lift_bp = F.expr(
        "CAST(CASE WHEN conv_ctrl * n_treat > 0 THEN "
        "(CAST(conv_treat AS DECIMAL(38,0)) * n_ctrl "
        " - CAST(conv_ctrl AS DECIMAL(38,0)) * n_treat) * 10000 "
        "div (CAST(conv_ctrl AS DECIMAL(38,0)) * n_treat) END AS BIGINT)"
    )
    return agg.select(
        "n_treat",
        "n_ctrl",
        "conv_treat",
        "conv_ctrl",
        lift_bp.alias("lift_bp"),
        round_stable(z, 4).alias("z"),
    )


def grouped_independence_chi2(
    df: DataFrame,
    group_cols: "Sequence[str] | list[str]",
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Per-group Pearson chi-square of independence — one R×C test PER
    hypothesis group (a cohort, a segment, a day), the batched form of
    :func:`independence_chi2` that a multiple-testing pass
    (:func:`benjamini_hochberg`) consumes.

    Same exactness contract as the global version: every cell term is
    the exact rational ``(O·n − R·C)² / (n·R·C)`` over BIGINT counts
    carried in DECIMAL(38,0), one correctly-rounded division per cell,
    rounded once and summed in DECIMAL. Zero cells contribute via the
    per-group marginal cross join (equi-join on the group key — never
    a global cross product). Returns one row per group:
    ``group_cols + (chi2, dof, n)`` with ``dof = (R−1)(C−1)`` from
    that group's OWN marginals — callers filter to the dof their
    p-value transform assumes. NULL categories are excluded.

    Scale shape: three map-side-combining rollups + two equi-joins on
    the group key; everything after the first rollup is
    |groups × categories|-sized."""
    keys = list(group_cols)
    if not keys:
        raise ValueError("group_cols must be non-empty")
    d38 = _D
    base = df.select(
        *keys,
        F.col(row_col).alias("__r"),
        F.col(col_col).alias("__c"),
    ).filter(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
    obs = base.groupBy(*keys, "__r", "__c").agg(
        F.count(F.lit(1)).cast(d38).alias("__o")
    )
    rows = base.groupBy(*keys, "__r").agg(
        F.count(F.lit(1)).cast(d38).alias("__rt")
    )
    cols = base.groupBy(*keys, "__c").agg(
        F.count(F.lit(1)).cast(d38).alias("__ct")
    )
    grid = (
        rows.join(cols, keys)  # per-group marginal cross product
        .join(obs, [*keys, "__r", "__c"], "left")
        .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0).cast(d38)))
    )
    # per-group n comes from base directly (each row marginal appears C
    # times in the grid, so summing there would overcount)
    ng = base.groupBy(*keys).agg(F.count(F.lit(1)).cast(d38).alias("__n"))
    grid = grid.join(ng, keys)
    diff = (
        F.col("__o") * F.col("__n") - F.col("__rt") * F.col("__ct")
    ).cast(d38)
    term = F.round(
        (diff * diff).cast(d38).cast("double")
        / (F.col("__n") * F.col("__rt") * F.col("__ct"))
        .cast(d38)
        .cast("double"),
        6,
    ).cast("decimal(18,6)")
    return grid.groupBy(*keys).agg(
        F.round(F.sum(term), 4).cast("double").alias("chi2"),
        (
            (F.countDistinct("__r") - 1) * (F.countDistinct("__c") - 1)
        ).alias("dof"),
        F.max("__n").cast("bigint").alias("n"),
    )


def benjamini_hochberg(
    df: DataFrame,
    p_col: str,
    tiebreak_col: str,
    q_num: int = 5,
    q_den: int = 100,
    scale: int = 1_000_000,
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control (JRSS-B 1995) over a
    battery of hypotheses: rank p-values ascending, find the largest
    rank k with ``p_(k) <= (k/m)·q``, reject ranks 1..k. The decision
    inequality is evaluated ENTIRELY in BIGINT —
    ``p_micro·m·q_den <= rank·q_num·scale`` — so the reject set is
    exact on any engine (``p_col`` is an integral micro-p in
    [0, scale]; callers produce it with one deterministic transform).

    Ranking uses the distributed
    :func:`~covid_data_pipeline_spark.operators.sampling.value_order_rank`
    (no partition-less window even though a hypothesis battery is
    usually model-sized — batteries of per-(cohort × segment × metric)
    tests grow multiplicatively). Appends ``p_rank`` and ``reject``;
    NULL p rows are dropped (no decision without a p-value).

    Step-up subtlety: a hypothesis can be rejected even when its OWN
    inequality fails, as long as a LARGER rank passes — hence the
    two-phase max-k broadcast, not a per-row filter."""
    if not (q_num > 0 and q_den > 0 and q_num <= q_den):
        raise ValueError(f"bad FDR level {q_num}/{q_den}")
    from covid_data_pipeline_spark.operators.sampling import (
        value_order_rank,
    )

    base = df.filter(F.col(p_col).isNotNull())
    m = base.agg(F.count(F.lit(1)).alias("__m"))
    ranked = value_order_rank(
        base, p_col, tiebreak_col, rank_col="p_rank"
    # bcast: const(1) scalar hypothesis count
    ).crossJoin(F.broadcast(m))
    ok = F.col(p_col).cast("bigint") * F.col("__m") * q_den <= F.col(
        "p_rank"
    ) * q_num * scale
    kstar = ranked.agg(
        F.max(F.when(ok, F.col("p_rank"))).alias("__k")
    )
    return (
        # bcast: const(1) scalar step-up threshold rank
        ranked.crossJoin(F.broadcast(kstar))
        .withColumn(
            "reject",
            F.col("p_rank") <= F.coalesce(F.col("__k"), F.lit(0)),
        )
        .drop("__m", "__k")
    )


def cohens_kappa(
    df: DataFrame,
    rater1_col: str,
    rater2_col: str,
) -> DataFrame:
    """Cohen's kappa (Cohen, Educ. Psychol. Meas. 1960) — chance-
    corrected inter-annotator agreement over a (rater1, rater2)
    labeled relation: the acceptance gate for LLM-judge vs human, or
    two labeling heuristics, before either is trusted to filter a
    corpus. kappa = (p_o − p_e)/(1 − p_e) with p_o the observed
    agreement rate and p_e the chance rate from the raters' marginals.

    Exactness: clearing denominators gives ONE integer rational

        kappa = (n·Σ_c diag_c − Σ_c r_c·c_c) / (n² − Σ_c r_c·c_c)

    over exact BIGINT counts carried in DECIMAL(38,0) (n² overflows
    BIGINT past ~3·10⁹ rows), so kappa, p_o and p_e each spend exactly
    one correctly-rounded division — engine- and partition-invariant.
    Rows with a NULL label on either side are excluded (no agreement
    question to ask). Returns one row: ``(n, n_classes, po, pe,
    kappa)``; kappa is NULL (try_divide) in the degenerate case where
    both raters emit a single identical class (p_e = 1).

    Scale shape: one map-side-combining rollup to |classes²| cells,
    then |classes|-sized regroups — nothing corpus-sized survives the
    first aggregate."""
    d38 = _D
    base = df.select(
        F.col(rater1_col).alias("__a"), F.col(rater2_col).alias("__b")
    ).filter(F.col(rater1_col).isNotNull() & F.col(rater2_col).isNotNull())
    cells = base.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    cells = cells.localCheckpoint(eager=False)  # feeds 3 rollups
    n = cells.agg(F.sum("__c").cast(d38).alias("__n"))
    diag = cells.where(F.col("__a") == F.col("__b")).agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast(d38).alias("__d")
    )
    ra = cells.groupBy("__a").agg(F.sum("__c").alias("__ra"))
    rb = cells.groupBy(F.col("__b").alias("__a")).agg(
        F.sum("__c").alias("__rb")
    )
    # chance mass Σ r_c·c_c over the UNION of class labels; a class one
    # rater never uses contributes 0 (inner join would drop it — fine,
    # 0·x = 0 — but the class count needs the union)
    pe_sum = ra.join(rb, "__a").agg(
        F.coalesce(
            F.sum((F.col("__ra").cast(d38) * F.col("__rb").cast(d38))),
            F.lit(0),
        ).cast(d38).alias("__pe")
    )
    nclasses = cells.select(
        F.explode(F.array("__a", "__b")).alias("__cl")
    ).agg(F.countDistinct("__cl").alias("n_classes"))
    j = (
        # bcast: const(1) scalars (counts/moments)
        n.crossJoin(F.broadcast(diag))
        .crossJoin(F.broadcast(pe_sum))
        .crossJoin(F.broadcast(nclasses))
    )
    nn = F.col("__n") * F.col("__n")
    return j.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("n_classes").cast("bigint").alias("n_classes"),
        round_stable(
            F.try_divide(F.col("__d").cast("double"),
                         F.col("__n").cast("double")), 6
        ).alias("po"),
        round_stable(
            F.try_divide(F.col("__pe").cast("double"),
                         nn.cast("double")), 6
        ).alias("pe"),
        round_stable(
            F.try_divide(
                (F.col("__n") * F.col("__d") - F.col("__pe"))
                .cast(d38).cast("double"),
                (nn - F.col("__pe")).cast(d38).cast("double"),
            ),
            6,
        ).alias("kappa"),
    )


def js_divergence(
    df: DataFrame,
    group_col: str,
    bin_col: str,
) -> DataFrame:
    """Per-group Jensen–Shannon divergence (Lin, IEEE IT 1991) of each
    group's bin distribution against the GLOBAL bin distribution — the
    bounded, symmetric drift metric (0 ≤ JSD ≤ ln 2) that complements
    PSI (which explodes on empty bins): "which cohorts' distributions
    deviate from the corpus" for data-mix audits.

    JSD(P‖Q) = ½·Σ_b [p_b·ln(p_b/m_b) + q_b·ln(q_b/m_b)] with
    m = (p+q)/2 and the 0·ln(0) = 0 convention (a bin the group never
    hits contributes only its q-side term). Exactness follows the PSI
    lattice rule: p, q, m are exact integer rationals of BIGINT
    counts, each per-bin term is ONE deterministic IEEE expression
    rounded to nano-units, and the sum + output live in exact BIGINT
    ``jsd_nano`` (plus a display ``jsd`` division). The dense
    group × bin grid comes from an equi-join-free cross of the two
    rollups (|groups|·|bins| rows — model-sized).

    Scale shape: one map-side-combining rollup to |groups × bins|,
    one |bins|-sized global regroup, broadcast joins — nothing
    corpus-sized survives the first aggregate. NULL group or bin rows
    are excluded."""
    base = df.select(
        F.col(group_col).alias("__g"), F.col(bin_col).alias("__b")
    ).filter(F.col(group_col).isNotNull() & F.col(bin_col).isNotNull())
    gb = base.groupBy("__g", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    gb = gb.localCheckpoint(eager=False)  # feeds grid + group totals
    ng = gb.groupBy("__g").agg(F.sum("__c").cast("bigint").alias("__ng"))
    glob = gb.groupBy("__b").agg(F.sum("__c").cast("bigint").alias("__cb"))
    tot = glob.agg(F.sum("__cb").cast("bigint").alias("__nt"))
    grid = (
        # bcast: model(|bins|) global bin histogram — bin domains are
        # caller-bounded (deciles etc.), never corpus-sized
        ng.crossJoin(F.broadcast(glob))
        .join(gb, ["__g", "__b"], "left")
        .withColumn("__c", F.coalesce(F.col("__c"), F.lit(0)))
        # bcast: const(1) scalar corpus count
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("__c").cast("double") / F.col("__ng").cast("double")
    q = F.col("__cb").cast("double") / F.col("__nt").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(F.col("__c") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("__cb") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / F.lit(2.0)
    nano = F.round(term * F.lit(1e9), 0).cast("bigint")
    return (
        grid.groupBy("__g")
        .agg(
            F.max("__ng").alias("n"),
            F.sum(nano).alias("jsd_nano"),
        )
        .select(
            F.col("__g").alias(group_col),
            F.col("n").cast("bigint").alias("n"),
            F.col("jsd_nano").cast("bigint").alias("jsd_nano"),
            round_stable(
                F.col("jsd_nano") / F.lit(1e9), 6
            ).alias("jsd"),
        )
    )


def mcnemar_test(
    df: DataFrame,
    label_col: str,
    pred_a_col: str,
    pred_b_col: str,
) -> DataFrame:
    """McNemar's paired test (Psychometrika 1947) — the statistically
    correct way to compare TWO classifiers evaluated on the SAME rows
    (two independent accuracy numbers ignore the pairing; McNemar
    tests only the discordant pairs): b = rows A gets right and B gets
    wrong, c = the reverse, chi² = (b − c)²/(b + c) on 1 dof.

    Exactness: b and c are exact BIGINT counts off one aggregation
    pass; chi² is ONE integer rational (DECIMAL(38,0) numerator —
    (b−c)² overflows int64 past ~3·10⁹ discordant rows), and the 95%
    VERDICT clears the denominator entirely:

        significant ⟺ 1000·(b − c)² > 3841·(b + c)

    (3.841 = chi²₀.₀₅,₁ scaled ×1000) — pure BIGINT, engine- and
    partition-invariant. Returns one row: ``(n, acc_a, acc_b, b, c,
    chi2, significant)``; chi² is NULL via try_divide when b + c = 0
    (identical predictions — nothing to test, significant false).
    Rows with any NULL among label/preds are excluded.

    Scale shape: one map-side-combining scalar aggregate — nothing
    survives the first pass."""
    d38 = _D
    base = df.select(
        F.col(label_col).alias("__y"),
        F.col(pred_a_col).alias("__a"),
        F.col(pred_b_col).alias("__b"),
    ).filter(
        F.col(label_col).isNotNull()
        & F.col(pred_a_col).isNotNull()
        & F.col(pred_b_col).isNotNull()
    )
    a_ok = F.col("__a") == F.col("__y")
    b_ok = F.col("__b") == F.col("__y")
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(a_ok.cast("long")).cast("bigint").alias("__na"),
        F.sum(b_ok.cast("long")).cast("bigint").alias("__nb"),
        F.sum((a_ok & ~b_ok).cast("long")).cast("bigint").alias("b"),
        F.sum((~a_ok & b_ok).cast("long")).cast("bigint").alias("c"),
    )
    diff = (F.col("b") - F.col("c")).cast(d38)
    disc = (F.col("b") + F.col("c")).cast(d38)
    return agg.select(
        "n",
        round_stable(
            F.try_divide(
                F.col("__na").cast("double"), F.col("n").cast("double")
            ),
            6,
        ).alias("acc_a"),
        round_stable(
            F.try_divide(
                F.col("__nb").cast("double"), F.col("n").cast("double")
            ),
            6,
        ).alias("acc_b"),
        "b",
        "c",
        round_stable(
            F.try_divide(
                (diff * diff).cast("double"), disc.cast("double")
            ),
            6,
        ).alias("chi2"),
        (
            (diff * diff).cast(d38) * F.lit(1000).cast(d38)
            > F.lit(3841).cast(d38) * disc
        ).alias("significant"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Kruskal–Wallis H test (JASA 1952) — the k-group generalization
    of :func:`mann_whitney_u`: "do ANY of these cohorts' value
    distributions differ?" without assuming normality, the gate to run
    before k·(k−1)/2 pairwise rank tests inflate the false-positive
    rate.

    Exactness follows the Mann–Whitney value-compression trick: no row
    is ever ranked. One rollup to the (value, group) grid with
    per-value totals, a cumulative count over the DISTINCT-value domain
    (the only flat window — |distinct values| rows, never |rows|),
    and the DOUBLED average rank ``r2_v = 2·cum_less + n_v + 1``
    (integer for any tie pattern). Per-group doubled rank sums
    ``R2_g = Σ c_{v,g}·r2_v`` and the tie moment ``Σ(t³−t)`` are exact
    DECIMAL(38,0). The per-group H contribution folds the global
    denominator in — ``term_g = 3·R2_g²/(n_g·N·(N+1))`` — and is
    micro-rounded onto an integer lattice (the PSI/JSD rule) so the
    cross-group sum is partition- and engine-invariant;
    ``H = Σ term_g − 3(N+1)`` and the tie correction
    ``H' = H / (1 − Σ(t³−t)/(N³−N))`` spend floats only on one-row
    scalar expressions. Lattice envelope: term_g ≈ 3·n_g ≤ 3N keeps
    micro-units inside BIGINT to N ≈ 10¹² rows.

    Returns one row: ``(n, k, df, h_micro, h, h_corrected)`` — h is
    NULL-safe via try_divide when N ≤ 1 or every value ties. NULL
    group or value rows are excluded.

    Scale shape: one map-side-combining rollup to |values × groups|,
    one compressed-domain window, one |groups|-row regroup — nothing
    corpus-sized survives the first aggregate."""
    d = _D
    base = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    gv = base.groupBy("__v", "__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    gv = gv.localCheckpoint(eager=False)  # feeds per-value + per-group
    per_v = gv.groupBy("__v").agg(
        F.sum("__c").cast("bigint").alias("__nv")
    )
    from pyspark.sql.window import Window

    wcum = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    ranked_v = per_v.withColumn(
        "__cum_less", F.coalesce(F.sum("__nv").over(wcum), F.lit(0))
    ).withColumn(
        "__r2", (F.lit(2) * F.col("__cum_less") + F.col("__nv") + 1)
    )
    per_g = (
        # bcast: model(|distinct values|) compressed rank table (bounded
        # domain, same contract as mann_whitney_u's value compression)
        gv.join(F.broadcast(ranked_v.select("__v", "__r2")), "__v")
        .groupBy("__g")
        .agg(
            F.sum("__c").cast("bigint").alias("__ng"),
            F.sum(F.col("__c").cast(d) * F.col("__r2").cast(d))
            .cast(d)
            .alias("__R2"),
        )
    )
    glob = ranked_v.agg(
        F.sum("__nv").cast("bigint").alias("__N"),
        F.sum(
            (
                F.col("__nv").cast(d) * F.col("__nv").cast(d)
                * F.col("__nv").cast(d)
                - F.col("__nv").cast(d)
            )
        )
        .cast(d)
        .alias("__tie3"),
    )
    # bcast: const(1) scalar N / tie moment
    grid = per_g.crossJoin(F.broadcast(glob))
    nd = F.col("__N").cast("double")
    term = (
        F.lit(3.0)
        * F.col("__R2").cast("double")
        * F.col("__R2").cast("double")
        / (F.col("__ng").cast("double") * nd * (nd + F.lit(1.0)))
    )
    micro = F.round(term * F.lit(1e6), 0).cast("bigint")
    agg = grid.groupBy().agg(
        F.max("__N").alias("n"),
        F.count(F.lit(1)).cast("int").alias("k"),
        F.sum(micro).cast("bigint").alias("__sum_micro"),
        F.max("__tie3").alias("__tie3"),
    )
    n_ = F.col("n").cast("double")
    h = (
        F.col("__sum_micro").cast("double") / F.lit(1e6)
        - F.lit(3.0) * (n_ + F.lit(1.0))
    )
    tie_corr = F.lit(1.0) - F.try_divide(
        F.col("__tie3").cast("double"),
        (n_ * n_ * n_ - n_),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        "k",
        (F.col("k") - 1).cast("int").alias("df"),
        (
            F.col("__sum_micro")
            - (F.lit(3) * (F.col("n") + 1) * F.lit(1000000)).cast("bigint")
        ).alias("h_micro"),
        round_stable(h, 4).alias("h"),
        round_stable(F.try_divide(h, tie_corr), 4).alias("h_corrected"),
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Brown–Forsythe test (JASA 1974) — Levene's homogeneity-of-
    variance test with the MEDIAN center: a one-way ANOVA F on the
    absolute deviations from each group's median. The robust
    pre-flight for any pooled-variance analysis ("are these cohorts'
    spreads even comparable?") that the mean-centered Levene gets
    wrong under skew.

    Exactness on the doubled-order-statistic lattice (the
    robust_zscore machinery): values must be integral; each group's
    exact median is the doubled order statistic ``med2_g``, the
    deviations ``d = |2v − med2_g|`` stay integer, and the ANOVA
    moments ``S_g = Σd``, ``Q_g = Σd²``, ``n_g`` are exact
    DECIMAL(38,0). The between/within sums of squares need the
    rational ``S_g²/n_g`` — each is ONE deterministic IEEE expression
    rounded onto the unit lattice (round-to-integer, the PSI rule) so
    the cross-group sums are partition- and engine-invariant:
    ``SSB = Σ⌈S_g²/n_g⌋ − ⌈S²/N⌋`` and ``SSW = ΣQ_g − Σ⌈S_g²/n_g⌋``
    live in DECIMAL(38,0), clamped at 0 (lattice noise of up to k/2
    units can push a true-zero sum of squares negative);
    ``F = (SSB/(k−1)) / (SSW/(N−k))`` spends floats on one single-row
    expression (NULL via try_divide for the degenerate SSW = 0 or
    N ≤ k cases).

    Returns one row: ``(n, k, df1, df2, f_bf)``. NULL group or value
    rows are excluded.

    Scale shape: two per-group order-statistic windows (partitioned by
    group — parallel across groups, never global) + one map-side-
    combining moment rollup to |groups| rows."""
    d = _D
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("bigint").alias("__v"),
    ).filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    base = base.localCheckpoint(eager=False)  # feeds median + deviations
    from pyspark.sql.window import Window

    w = Window.partitionBy("__g").orderBy("__v")
    ranked = base.withColumn("__rn", F.row_number().over(w))
    gsz = base.groupBy("__g").agg(F.count(F.lit(1)).alias("__gn"))
    med = (
        ranked.join(gsz, "__g")
        .where(
            (F.col("__rn") == F.expr("(__gn + 1) div 2"))
            | (F.col("__rn") == F.expr("(__gn + 2) div 2"))
        )
        .groupBy("__g")
        .agg(
            F.when(F.max("__gn") % 2 == 1, F.sum("__v") * 2)
            .otherwise(F.sum("__v"))
            .alias("__med2")
        )
    )
    devs = base.join(med, "__g").withColumn(
        "__d", F.abs(F.col("__v") * 2 - F.col("__med2"))
    )
    per_g = devs.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ng"),
        F.sum(F.col("__d").cast(d)).cast(d).alias("__S"),
        F.sum(F.col("__d").cast(d) * F.col("__d").cast(d))
        .cast(d)
        .alias("__Q"),
    )
    # ⌈S_g²/n_g⌋ on the unit lattice: one IEEE expression per group row
    a_g = F.round(
        F.col("__S").cast("double") * F.col("__S").cast("double")
        / F.col("__ng").cast("double"),
        0,
    ).cast(d)
    agg = per_g.groupBy().agg(
        F.sum("__ng").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("int").alias("k"),
        F.sum(a_g).cast(d).alias("__A"),
        F.sum("__S").cast(d).alias("__Stot"),
        F.sum("__Q").cast(d).alias("__Qtot"),
    )
    grand = F.round(
        F.col("__Stot").cast("double") * F.col("__Stot").cast("double")
        / F.col("n").cast("double"),
        0,
    ).cast(d)
    # SSB/SSW are >= 0 by definition; the unit lattice can push a
    # true zero a few units negative (|error| <= k/2), so clamp.
    zero = F.lit(0).cast(d)
    ssb = F.greatest(zero, (F.col("__A") - grand).cast(d)).cast("double")
    ssw = F.greatest(
        zero, (F.col("__Qtot") - F.col("__A")).cast(d)
    ).cast("double")
    df1 = (F.col("k") - 1).cast("int")
    df2 = (F.col("n") - F.col("k")).cast("bigint")
    f_stat = F.try_divide(
        F.try_divide(ssb, df1.cast("double")),
        F.try_divide(ssw, df2.cast("double")),
    )
    return agg.select(
        "n",
        "k",
        df1.alias("df1"),
        df2.alias("df2"),
        round_stable(f_stat, 4).alias("f_bf"),
    )


def welch_ttest(
    df: DataFrame,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """Welch's unequal-variance t-test (Biometrika 1947) with
    Welch–Satterthwaite degrees of freedom, plus Cohen's d and the
    Hedges-g small-sample correction — the parametric complement to
    :func:`mann_whitney_u` that reports EFFECT SIZE, not just
    significance (a 10⁹-row experiment makes trivial effects
    "significant"; d says whether anyone should care).

    Exactness: values are integral (floor to cents upstream); the six
    sufficient statistics (n, Σv, Σv² per arm) are exact
    DECIMAL(38,0) off ONE map-side-combined aggregation — partition-
    order invariant. Every derived quantity (means, the unbiased
    variance numerators ``n·Σv² − (Σv)²``, t, the W-S df, d, g) is a
    single-row IEEE expression over those exact scalars, so the
    report is bit-identical across engines. Degenerate arms (n ≤ 1 or
    zero variance in both) yield NULL t/df via try_divide.

    Returns one row: ``(n_treat, n_ctrl, mean_treat, mean_ctrl,
    t_welch, df_welch, cohens_d, hedges_g)``. NULL treat/value rows
    are excluded.

    Scale shape: one scalar aggregate — nothing survives the first
    pass."""
    d = _D
    base = df.select(
        F.col(treat_col).cast("boolean").alias("__t"),
        F.col(value_col).cast("bigint").alias("__v"),
    ).filter(F.col(treat_col).isNotNull() & F.col(value_col).isNotNull())
    vd = F.col("__v").cast(d)
    agg = base.agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_treat"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_ctrl"),
        F.sum(F.when(F.col("__t"), vd).otherwise(F.lit(0).cast(d)))
        .cast(d)
        .alias("__s1"),
        F.sum(F.when(~F.col("__t"), vd).otherwise(F.lit(0).cast(d)))
        .cast(d)
        .alias("__s0"),
        F.sum(F.when(F.col("__t"), vd * vd).otherwise(F.lit(0).cast(d)))
        .cast(d)
        .alias("__q1"),
        F.sum(F.when(~F.col("__t"), vd * vd).otherwise(F.lit(0).cast(d)))
        .cast(d)
        .alias("__q0"),
    )
    n1 = F.col("n_treat").cast("double")
    n0 = F.col("n_ctrl").cast("double")
    m1 = F.try_divide(F.col("__s1").cast("double"), n1)
    m0 = F.try_divide(F.col("__s0").cast("double"), n0)
    # unbiased variance: (n·Σv² − (Σv)²) / (n·(n−1)); numerator exact
    v1num = (
        F.col("n_treat").cast(d) * F.col("__q1") - F.col("__s1") * F.col("__s1")
    ).cast("double")
    v0num = (
        F.col("n_ctrl").cast(d) * F.col("__q0") - F.col("__s0") * F.col("__s0")
    ).cast("double")
    var1 = F.try_divide(v1num, n1 * (n1 - F.lit(1.0)))
    var0 = F.try_divide(v0num, n0 * (n0 - F.lit(1.0)))
    se2_1 = F.try_divide(var1, n1)
    se2_0 = F.try_divide(var0, n0)
    se2 = se2_1 + se2_0
    t = F.try_divide(m1 - m0, F.sqrt(se2))
    df_ws = F.try_divide(
        se2 * se2,
        F.try_divide(se2_1 * se2_1, n1 - F.lit(1.0))
        + F.try_divide(se2_0 * se2_0, n0 - F.lit(1.0)),
    )
    pooled = F.sqrt(
        F.try_divide(
            (n1 - F.lit(1.0)) * var1 + (n0 - F.lit(1.0)) * var0,
            n1 + n0 - F.lit(2.0),
        )
    )
    d_eff = F.try_divide(m1 - m0, pooled)
    g_corr = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (n1 + n0) - F.lit(9.0)
    )
    return agg.select(
        "n_treat",
        "n_ctrl",
        round_stable(m1, 4).alias("mean_treat"),
        round_stable(m0, 4).alias("mean_ctrl"),
        round_stable(t, 4).alias("t_welch"),
        round_stable(df_ws, 2).alias("df_welch"),
        round_stable(d_eff, 6).alias("cohens_d"),
        round_stable(d_eff * g_corr, 6).alias("hedges_g"),
    )


def wasserstein_1d(
    df: DataFrame,
    cohort_col: str,
    value_col: str,
) -> DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between two cohorts'
    value distributions: ``W₁ = ∫ |F_a(v) − F_b(v)| dv`` — the drift
    metric that, unlike KS (max gap) or PSI/JSD (bin ratios), is in
    the UNITS OF THE VALUE ("the distributions are $3.17 apart"), and
    grows with how FAR mass moved, not just how much.

    Exactness: the integral is exact over the value-compressed domain.
    One rollup to (v, a_v, b_v), one cumulative window over the
    DISTINCT-value grid, and each segment contributes the exact
    integer ``|cum_a·N_b − cum_b·N_a| · (v_next − v)`` in
    DECIMAL(38,0) — the common-denominator form of |F_a − F_b|·Δv, so
    the sum never sees a float. ``W₁ = Σ / (N_a·N_b)`` spends ONE
    division at the end. Returns one row: ``(n_a, n_b, w1)`` — NULL
    via try_divide when either cohort is empty. NULL cohort/value
    rows are excluded.

    Envelope: cum·N ≤ N², ×Δv ≤ value range — 38 digits holds to
    ~10¹² rows × 10¹⁰-unit ranges. Scale shape: one map-side-combining
    rollup to |distinct values| (quantize upstream), one compressed-
    domain window, one scalar regroup."""
    d = _D
    base = df.select(
        F.col(cohort_col).cast("boolean").alias("__a"),
        F.col(value_col).cast("bigint").alias("__v"),
    ).filter(F.col(cohort_col).isNotNull() & F.col(value_col).isNotNull())
    per_v = base.groupBy("__v").agg(
        F.sum(F.when(F.col("__a"), 1).otherwise(0))
        .cast("bigint")
        .alias("__av"),
        F.sum(F.when(~F.col("__a"), 1).otherwise(0))
        .cast("bigint")
        .alias("__bv"),
    )
    from pyspark.sql.window import Window

    wcum = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wlead = Window.orderBy("__v")
    cum = (
        per_v.withColumn("__ca", F.sum("__av").over(wcum).cast("bigint"))
        .withColumn("__cb", F.sum("__bv").over(wcum).cast("bigint"))
        .withColumn("__dv", F.lead("__v").over(wlead) - F.col("__v"))
    )
    tot = per_v.agg(
        F.sum("__av").cast("bigint").alias("n_a"),
        F.sum("__bv").cast("bigint").alias("n_b"),
    )
    # bcast: const(1) scalar cohort sizes
    grid = cum.crossJoin(F.broadcast(tot))
    seg = (
        F.abs(
            F.col("__ca").cast(d) * F.col("n_b").cast(d)
            - F.col("__cb").cast(d) * F.col("n_a").cast(d)
        )
        * F.coalesce(F.col("__dv"), F.lit(0)).cast(d)
    ).cast(d)
    agg = grid.groupBy().agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(seg).cast(d).alias("__num"),
    )
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        round_stable(
            F.try_divide(
                F.col("__num").cast("double"),
                (F.col("n_a").cast(d) * F.col("n_b").cast(d)).cast(
                    "double"
                ),
            ),
            6,
        ).alias("w1"),
    )


def tv_hellinger_distance(
    df: DataFrame,
    group_col: str,
    bin_col: str,
) -> DataFrame:
    """Per-group total-variation and Hellinger distance of each
    group's bin distribution against the GLOBAL bin distribution —
    :func:`js_divergence`'s grid machinery with the two metrics that
    bracket it: TV = ½Σ|p − q| (the worst-case probability an event
    distinguishes the distributions — EXACT here) and
    H² = ½Σ(√p − √q)² (the metric that tensorizes across independent
    features, ``H² ≤ TV ≤ H·√2``).

    Exactness: TV clears its denominators — ``tv_num =
    Σ_b |c_gb·n_t − c_b·n_g|`` is an exact DECIMAL(38,0) integer and
    ``TV = tv_num/(2·n_g·n_t)`` spends one division. The Hellinger
    per-cell term ``(√p − √q)²/2`` is irrational, so it follows the
    PSI/JSD nano-lattice rule: one IEEE expression per cell, rounded
    to nano-units, exact BIGINT sum; ``hellinger = √(h2_nano/1e9)``
    is a one-row display expression.

    Returns one row per group: ``(group, n, tv, h2_nano, hellinger)``.
    NULL group/bin rows are excluded. Scale shape: identical to
    js_divergence — one rollup to |groups × bins|, broadcast joins,
    nothing corpus-sized survives the first aggregate."""
    d = _D
    base = df.select(
        F.col(group_col).alias("__g"), F.col(bin_col).alias("__b")
    ).filter(F.col(group_col).isNotNull() & F.col(bin_col).isNotNull())
    gb = base.groupBy("__g", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    gb = gb.localCheckpoint(eager=False)  # feeds grid + group totals
    ng = gb.groupBy("__g").agg(F.sum("__c").cast("bigint").alias("__ng"))
    glob = gb.groupBy("__b").agg(F.sum("__c").cast("bigint").alias("__cb"))
    tot = glob.agg(F.sum("__cb").cast("bigint").alias("__nt"))
    grid = (
        # bcast: model(|bins|) global bin histogram — caller-bounded
        ng.crossJoin(F.broadcast(glob))
        .join(gb, ["__g", "__b"], "left")
        .withColumn("__c", F.coalesce(F.col("__c"), F.lit(0)))
        # bcast: const(1) scalar corpus count
        .crossJoin(F.broadcast(tot))
    )
    tv_cell = F.abs(
        F.col("__c").cast(d) * F.col("__nt").cast(d)
        - F.col("__cb").cast(d) * F.col("__ng").cast(d)
    ).cast(d)
    p = F.col("__c").cast("double") / F.col("__ng").cast("double")
    q = F.col("__cb").cast("double") / F.col("__nt").cast("double")
    sq = F.sqrt(p) - F.sqrt(q)
    h_nano = F.round(sq * sq / F.lit(2.0) * F.lit(1e9), 0).cast("bigint")
    return (
        grid.groupBy("__g")
        .agg(
            F.max("__ng").alias("n"),
            F.max("__nt").alias("__nt"),
            F.sum(tv_cell).cast(d).alias("__tvnum"),
            F.sum(h_nano).cast("bigint").alias("h2_nano"),
        )
        .select(
            F.col("__g").alias(group_col),
            F.col("n").cast("bigint").alias("n"),
            round_stable(
                F.col("__tvnum").cast("double")
                / (
                    F.lit(2).cast(d) * F.col("n").cast(d)
                    * F.col("__nt").cast(d)
                ).cast("double"),
                6,
            ).alias("tv"),
            "h2_nano",
            round_stable(
                F.sqrt(F.col("h2_nano").cast("double") / F.lit(1e9)), 6
            ).alias("hellinger"),
        )
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    category_col: str,
    n_raters: int,
) -> DataFrame:
    """Fleiss' kappa (Psych. Bulletin 1971) — chance-corrected
    agreement for m ≥ 2 raters per item, the multi-rater
    generalization of :func:`cohens_kappa` (which only pairs two
    FIXED raters): the standard QA readout for annotation pipelines
    where each example is labeled by m interchangeable annotators.

    Input is one row per (item, assigned category). Items whose
    rating count differs from ``n_raters`` are EXCLUDED (Fleiss
    assumes a constant m; partially-labeled items would bias P̄) and
    reported in ``n_excluded``.

    Exactness: with ``A = Σ_i Σ_c n_ic²``, ``B = Σ_c (Σ_i n_ic)²``,
    N = kept items — all exact DECIMAL(38,0) — the observed and
    expected agreements are ``P̄ = (A − N·m)/(N·m·(m−1))`` and
    ``P̄e = B/(N·m)²``, and ``kappa = (P̄ − P̄e)/(1 − P̄e)``; every
    emitted value is a single-row IEEE expression over those exact
    scalars (NULL kappa via try_divide when P̄e = 1 — a single shared
    category, nothing to correct for). NULL item/category rows are
    excluded before counting.

    Scale shape: one rollup to |items × categories|, an m-filter
    join, then a scalar aggregate (plus the |categories|-sized B
    rollup) — nothing corpus-sized survives the first aggregate."""
    d = _D
    base = df.select(
        F.col(item_col).alias("__i"), F.col(category_col).alias("__c")
    ).filter(F.col(item_col).isNotNull() & F.col(category_col).isNotNull())
    ic = base.groupBy("__i", "__c").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    ic = ic.localCheckpoint(eager=False)  # feeds m-filter + B rollup
    per_item = ic.groupBy("__i").agg(
        F.sum("__n").cast("bigint").alias("__m")
    )
    kept_items = per_item.filter(F.col("__m") == n_raters).select("__i")
    excluded = per_item.filter(F.col("__m") != n_raters).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_excluded")
    )
    kept = ic.join(kept_items, "__i")
    a_row = kept.agg(
        F.count_distinct("__i").cast("bigint").alias("__N"),
        F.sum(F.col("__n").cast(d) * F.col("__n").cast(d))
        .cast(d)
        .alias("__A"),
    )
    b_row = (
        kept.groupBy("__c")
        .agg(F.sum("__n").cast(d).alias("__tc"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_categories"),
            F.sum(F.col("__tc") * F.col("__tc")).cast(d).alias("__B"),
        )
    )
    # bcast: const(1) scalar rows
    row = a_row.crossJoin(F.broadcast(b_row)).crossJoin(
        F.broadcast(excluded)
    )
    nd = F.col("__N").cast("double")
    m = F.lit(float(n_raters))
    p_bar = F.try_divide(
        (F.col("__A") - F.col("__N").cast(d) * F.lit(n_raters).cast(d))
        .cast("double"),
        nd * m * (m - F.lit(1.0)),
    )
    p_e = F.try_divide(
        F.col("__B").cast("double"), (nd * m) * (nd * m)
    )
    return row.select(
        F.col("__N").alias("n_items"),
        F.coalesce(F.col("n_excluded"), F.lit(0)).alias("n_excluded"),
        F.lit(n_raters).cast("int").alias("m"),
        "n_categories",
        round_stable(p_bar, 6).alias("p_bar"),
        round_stable(p_e, 6).alias("p_e"),
        round_stable(
            F.try_divide(p_bar - p_e, F.lit(1.0) - p_e), 6
        ).alias("kappa"),
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols: list[str],
) -> DataFrame:
    """Cronbach's alpha (Psychometrika 1951) — internal-consistency
    reliability of a k-item score: do the k sub-scores measure the
    same underlying construct? The QA gate before anyone averages k
    heuristic quality signals into one "quality score" — a low alpha
    says the composite is noise, not a scale.

        α = k/(k−1) · (1 − Σ_i var(itemᵢ) / var(Σ_i itemᵢ))

    Exactness: the variance RATIO is scale-free, so both numerator and
    denominator are carried as the exact integer moments
    ``n·Σx² − (Σx)²`` in DECIMAL(38,0) (the shared 1/(n(n−1)) factor
    cancels). One map-side-combined aggregate computes all 2k+2 sums;
    alpha is a single-row IEEE expression (NULL via try_divide when
    the total score is constant). Rows with ANY NULL item are
    excluded (a null sub-score would silently shrink one item's
    moment population and bias the ratio).

    Scale shape: one scalar aggregate — nothing survives the first
    pass. Values must be integral (quantize upstream); k is a literal.
    """
    if len(item_cols) < 2:
        raise ValueError("cronbach_alpha needs >= 2 items")
    d = _D
    k = len(item_cols)
    cond = F.lit(True)
    for c in item_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(
        *[F.col(c).cast("bigint").alias(f"__x{i}") for i, c in enumerate(item_cols)]
    )
    total = None
    for i in range(k):
        total = F.col(f"__x{i}") if total is None else total + F.col(f"__x{i}")
    base = base.withColumn("__t", total)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for i in range(k):
        xd = F.col(f"__x{i}").cast(d)
        aggs.append(F.sum(xd).cast(d).alias(f"__s{i}"))
        aggs.append(F.sum(xd * xd).cast(d).alias(f"__q{i}"))
    td = F.col("__t").cast(d)
    aggs.append(F.sum(td).cast(d).alias("__st"))
    aggs.append(F.sum(td * td).cast(d).alias("__qt"))
    row = base.agg(*aggs)
    nd_ = F.col("n").cast(d)
    item_var_num = None
    for i in range(k):
        v = (nd_ * F.col(f"__q{i}") - F.col(f"__s{i}") * F.col(f"__s{i}")).cast(d)
        item_var_num = v if item_var_num is None else (item_var_num + v).cast(d)
    tot_var_num = (nd_ * F.col("__qt") - F.col("__st") * F.col("__st")).cast(d)
    alpha = (
        F.lit(float(k)) / F.lit(float(k - 1))
    ) * (
        F.lit(1.0)
        - F.try_divide(
            item_var_num.cast("double"), tot_var_num.cast("double")
        )
    )
    return row.select(
        "n",
        F.lit(k).cast("int").alias("k"),
        round_stable(alpha, 6).alias("alpha"),
    )


def cmh_stratified(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran–Mantel–Haenszel stratified 2×2 analysis (Mantel &
    Haenszel, JNCI 1959) — the confounder-adjusted association
    readout: a pooled odds ratio and test across strata, immune to
    Simpson's paradox where a marginal 2×2 (``two_proportion_ztest``)
    flips sign because the strata mix differs between arms.

    Per stratum i with table (a=treat·outcome, b=treat·¬outcome,
    c=¬treat·outcome, d=¬treat·¬outcome), n_i = a+b+c+d::

        OR_MH  = Σ a_i·d_i/n_i  /  Σ b_i·c_i/n_i
        χ²_MH  = (|Σa_i − ΣE_i| − ½)² / ΣV_i          (continuity-corr.)
        E_i    = (a+b)(a+c)/n_i
        V_i    = (a+b)(c+d)(a+c)(b+d) / (n_i²(n_i−1))

    Exactness: the four cell counts per stratum are exact BIGINT off
    ONE rollup. Each per-stratum rational (a·d/n, b·c/n, E, V) is ONE
    deterministic IEEE expression rounded to nano-units (the PSI
    lattice rule), summed in exact BIGINT — so the cross-stratum sums
    are partition- and engine-invariant; OR and χ² are single-row
    expressions over those lattice sums (NULL OR via try_divide when
    no stratum has a discordant b·c pair; single-class strata
    contribute V = 0 naturally). Envelope: E_i ≤ n_i keeps nano-units
    in BIGINT to ~10⁹ rows per stratum sum.

    Returns one row: ``(n, k_strata, or_mh, chi2_mh)``. NULL
    stratum/treat/outcome rows are excluded.

    Scale shape: one map-side-combining rollup to |strata| rows, then
    a scalar aggregate — nothing corpus-sized survives the first
    pass."""
    base = df.select(
        F.col(stratum_col).alias("__s"),
        F.col(treat_col).cast("boolean").alias("__t"),
        F.col(outcome_col).cast("boolean").alias("__y"),
    ).filter(
        F.col(stratum_col).isNotNull()
        & F.col(treat_col).isNotNull()
        & F.col(outcome_col).isNotNull()
    )
    per_s = base.groupBy("__s").agg(
        F.sum((F.col("__t") & F.col("__y")).cast("long"))
        .cast("bigint")
        .alias("__a"),
        F.sum((F.col("__t") & ~F.col("__y")).cast("long"))
        .cast("bigint")
        .alias("__b"),
        F.sum((~F.col("__t") & F.col("__y")).cast("long"))
        .cast("bigint")
        .alias("__c"),
        F.sum((~F.col("__t") & ~F.col("__y")).cast("long"))
        .cast("bigint")
        .alias("__d"),
    )
    a = F.col("__a").cast("double")
    b = F.col("__b").cast("double")
    c = F.col("__c").cast("double")
    dd = F.col("__d").cast("double")
    n_i = a + b + c + dd
    num = F.round(a * dd / n_i * F.lit(1e9), 0).cast("bigint")
    den = F.round(b * c / n_i * F.lit(1e9), 0).cast("bigint")
    e_i = F.round((a + b) * (a + c) / n_i * F.lit(1e9), 0).cast("bigint")
    v_i = F.round(
        (a + b) * (c + dd) * (a + c) * (b + dd)
        / (n_i * n_i * (n_i - F.lit(1.0)))
        * F.lit(1e9),
        0,
    ).cast("bigint")
    agg = per_s.agg(
        F.sum(F.col("__a") + F.col("__b") + F.col("__c") + F.col("__d"))
        .cast("bigint")
        .alias("n"),
        F.count(F.lit(1)).cast("int").alias("k_strata"),
        F.sum("__a").cast("bigint").alias("__sa"),
        F.sum(num).cast("bigint").alias("__num"),
        F.sum(den).cast("bigint").alias("__den"),
        F.sum(e_i).cast("bigint").alias("__se"),
        F.sum(F.when(n_i > 1, v_i)).cast("bigint").alias("__sv"),
    )
    dev = F.abs(
        F.col("__sa").cast("double")
        - F.col("__se").cast("double") / F.lit(1e9)
    ) - F.lit(0.5)
    dev_c = F.greatest(dev, F.lit(0.0))  # |Σa−ΣE| < ½ → χ² = 0
    return agg.select(
        "n",
        "k_strata",
        round_stable(
            F.try_divide(
                F.col("__num").cast("double"), F.col("__den").cast("double")
            ),
            6,
        ).alias("or_mh"),
        round_stable(
            F.try_divide(
                dev_c * dev_c,
                F.col("__sv").cast("double") / F.lit(1e9),
            ),
            4,
        ).alias("chi2_mh"),
    )


def weighted_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Weighted Cohen's kappa (Cohen, Psych. Bulletin 1968) for
    ORDINAL labels — :func:`cohens_kappa` treats "rated 1 vs rated 5"
    and "rated 4 vs rated 5" as equally wrong; the weighted form
    charges disagreements by distance, in both the linear (|i−j|) and
    quadratic ((i−j)², ≈ an ICC) conventions.

    With observed counts O_ij, marginals R_i, C_j, N and a
    DISagreement weight d::

        κ_w = 1 − (N · Σ d_ij·O_ij) / (Σ d_ij·R_i·C_j)

    Exactness: labels must be integers; both numerator and
    denominator are EXACT DECIMAL(38,0) integers (the E_ij = R_i·C_j/N
    denominator is cleared), so each kappa spends exactly ONE
    division. The expected-disagreement grid is the k×k marginal
    cross — model-sized (label cardinality), never corpus-sized.
    Returns one row: ``(n, k_classes, kappa_linear, kappa_quadratic)``
    — NULL via try_divide when the expected disagreement is 0 (a
    single shared class; nothing to correct for). NULL-label rows are
    excluded.

    Scale shape: one rollup to the observed k×k grid + two marginal
    rollups + a broadcast cross — nothing corpus-sized survives the
    first aggregate."""
    d = _D
    base = df.select(
        F.col(rater_a_col).cast("bigint").alias("__a"),
        F.col(rater_b_col).cast("bigint").alias("__b"),
    ).filter(
        F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    )
    obs = base.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__o")
    )
    obs = obs.localCheckpoint(eager=False)  # feeds marginals + sums
    ra = obs.groupBy("__a").agg(F.sum("__o").cast("bigint").alias("__r"))
    cb = obs.groupBy("__b").agg(F.sum("__o").cast("bigint").alias("__c"))
    diff_o = (F.col("__a") - F.col("__b")).cast(d)
    o_sums = obs.agg(
        F.sum("__o").cast("bigint").alias("n"),
        F.sum(F.abs(diff_o) * F.col("__o").cast(d)).cast(d).alias("__lo"),
        F.sum(diff_o * diff_o * F.col("__o").cast(d)).cast(d).alias("__qo"),
    )
    # bcast: model(k) column-marginal table — label cardinality
    grid = ra.crossJoin(F.broadcast(cb))
    diff_e = (F.col("__a") - F.col("__b")).cast(d)
    rc = (F.col("__r").cast(d) * F.col("__c").cast(d)).cast(d)
    e_sums = grid.agg(
        F.sum(F.abs(diff_e) * rc).cast(d).alias("__le"),
        F.sum(diff_e * diff_e * rc).cast(d).alias("__qe"),
    )
    k_union = (
        obs.select(F.col("__a").alias("__x"))
        .unionAll(obs.select(F.col("__b").alias("__x")))
        .agg(F.count_distinct("__x").cast("int").alias("k_classes"))
    )
    # bcast: const(1) scalar expected-disagreement sums
    row = o_sums.crossJoin(F.broadcast(e_sums)).crossJoin(
        # bcast: const(1) scalar union class count
        F.broadcast(k_union)
    )
    nl = (F.col("n").cast(d) * F.col("__lo")).cast(d)
    nq = (F.col("n").cast(d) * F.col("__qo")).cast(d)
    return row.select(
        "n",
        "k_classes",
        round_stable(
            F.lit(1.0)
            - F.try_divide(nl.cast("double"), F.col("__le").cast("double")),
            6,
        ).alias("kappa_linear"),
        round_stable(
            F.lit(1.0)
            - F.try_divide(nq.cast("double"), F.col("__qe").cast("double")),
            6,
        ).alias("kappa_quadratic"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman test (JASA 1937) — the BLOCKED-design sibling of
    :func:`kruskal_wallis`: "do the k treatments differ when each
    block (day, user, site) sees all of them?" Ranking WITHIN blocks
    removes the block effect that would drown the treatment signal in
    a pooled rank test.

    Only COMPLETE blocks count (exactly one row per treatment —
    Friedman's design assumption); incomplete or duplicated blocks
    are excluded and reported. Within each block the doubled average
    rank ``r2 = 2·rank_less + ties + 1`` is exact for any tie
    pattern; the per-treatment doubled rank sums R2_j and the tie
    moment Σ(t³−t) are exact DECIMAL(38,0), so with N blocks::

        χ²_F = 3·Σ_j R2_j² / (N·k·(k+1)) − 3·N·(k+1)

    is a single-row expression over exact integers (ONE float
    division), and the tie correction divides by
    ``C = 1 − Σ(t³−t)/(N·k·(k²−1))`` (NULL via try_divide when every
    block is all-ties). Returns one row: ``(n_blocks, n_excluded, k,
    df, chi2_f, chi2_f_corrected)``. NULL block/treatment/value rows
    are excluded first.

    Scale shape: per-block rank windows (partitioned by block —
    parallel across blocks, each window is k rows), one rollup to k
    treatments, one scalar combine."""
    d = _D
    base = df.select(
        F.col(block_col).alias("__blk"),
        F.col(treatment_col).alias("__trt"),
        F.col(value_col).cast("bigint").alias("__v"),
    ).filter(
        F.col(block_col).isNotNull()
        & F.col(treatment_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    k_row = base.agg(
        F.count_distinct("__trt").cast("int").alias("__k")
    )
    per_blk = base.groupBy("__blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nb"),
        F.count_distinct("__trt").cast("bigint").alias("__tb"),
    )
    # bcast: const(1) scalar treatment count
    per_blk = per_blk.crossJoin(F.broadcast(k_row))
    complete = per_blk.filter(
        (F.col("__nb") == F.col("__k").cast("bigint"))
        & (F.col("__tb") == F.col("__k").cast("bigint"))
    ).select("__blk")
    excluded = per_blk.filter(
        ~(
            (F.col("__nb") == F.col("__k").cast("bigint"))
            & (F.col("__tb") == F.col("__k").cast("bigint"))
        )
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_excluded"))
    kept = base.join(complete, "__blk")
    kept = kept.localCheckpoint(eager=False)  # feeds ranks + ties
    from pyspark.sql.window import Window

    w_less = Window.partitionBy("__blk").orderBy("__v").rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_ties = Window.partitionBy("__blk", "__v")
    ranked = kept.withColumn(
        "__less", F.coalesce(F.count(F.lit(1)).over(w_less), F.lit(0))
    ).withColumn("__t", F.count(F.lit(1)).over(w_ties))
    # doubled average rank: 2·(#less) + (#ties) + 1 — integer always
    ranked = ranked.withColumn(
        "__r2", F.lit(2) * F.col("__less") + F.col("__t") + 1
    )
    per_trt = ranked.groupBy("__trt").agg(
        F.sum(F.col("__r2").cast(d)).cast(d).alias("__R2"),
        F.count(F.lit(1)).cast("bigint").alias("__nblk"),
    )
    ties = (
        kept.groupBy("__blk", "__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tc"))
        .agg(
            F.sum(
                F.col("__tc").cast(d) * F.col("__tc").cast(d)
                * F.col("__tc").cast(d)
                - F.col("__tc").cast(d)
            )
            .cast(d)
            .alias("__tie3")
        )
    )
    agg = per_trt.agg(
        F.max("__nblk").alias("n_blocks"),
        F.count(F.lit(1)).cast("int").alias("k"),
        F.sum(F.col("__R2") * F.col("__R2")).cast(d).alias("__sr2"),
    )
    # bcast: const(1) scalar tie moment / excluded count
    row = agg.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(excluded))
    nb = F.col("n_blocks").cast("double")
    kd = F.col("k").cast("double")
    chi2 = F.try_divide(
        F.lit(3.0) * F.col("__sr2").cast("double"),
        nb * kd * (kd + F.lit(1.0)),
    ) - F.lit(3.0) * nb * (kd + F.lit(1.0))
    corr = F.lit(1.0) - F.try_divide(
        F.col("__tie3").cast("double"),
        nb * kd * (kd * kd - F.lit(1.0)),
    )
    return row.select(
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.coalesce(F.col("n_excluded"), F.lit(0)).alias("n_excluded"),
        "k",
        (F.col("k") - 1).cast("int").alias("df"),
        round_stable(chi2, 4).alias("chi2_f"),
        round_stable(F.try_divide(chi2, corr), 4).alias(
            "chi2_f_corrected"
        ),
    )


def jonckheere_terpstra(
    df: DataFrame,
    group_order_col: str,
    value_col: str,
) -> DataFrame:
    """Jonckheere–Terpstra test (Biometrika 1954) for ORDERED
    alternatives — :func:`kruskal_wallis` asks "do any groups
    differ?"; JT asks the sharper "do values shift MONOTONICALLY with
    the group order?" (dose, priority tier, severity grade), gaining
    power exactly when the ordering hypothesis is real. JT is the sum
    of all k·(k−1)/2 pairwise Mann–Whitney counts between
    lower-ordered and higher-ordered groups.

    Exactness (value-compression, twice): with per-(value, group)
    counts c_{v,g} and group order g, the DOUBLED statistic::

        JT2 = Σ_{v,j} c_{v,j} · ( 2·Σ_{i<j, v'<v} c_{v',i}
                                  + Σ_{i<j} c_{v,i} )

    needs only two chained prefix windows over the DENSE
    |values|×|groups| grid (a left join against the value×group cross) (groups within value, then values within group) — no row is
    ever paired. The null moments use the exact tie-corrected
    variance (Lehmann; the StatXact/SciPy form)::

        E2  = (N² − Σn_j²) / 2
        Var = A/72 + B/(36·N(N−1)(N−2)) + C/(8·N(N−1))
        A   = N(N−1)(2N+5) − Σn(n−1)(2n+5) − Σt(t−1)(2t+5)
        B   = [Σn(n−1)(n−2)]·[Σt(t−1)(t−2)]
        C   = [Σn(n−1)]·[Σt(t−1)]

    with n over group sizes and t over pooled tie-group sizes — every
    moment an exact DECIMAL(38,0) integer; the final
    ``z = (JT2 − E2) / (2·√Var)`` spends floats on one single-row
    expression (NULL via try_divide when Var = 0 — all values tied or
    a single group). Returns one row: ``(n, k, jt2, z)``. NULL
    group/value rows are excluded.

    Scale shape: one map-side-combining rollup to the compressed
    grid, two grid windows, one scalar combine — nothing corpus-sized
    survives the first aggregate."""
    d = _D
    base = df.select(
        F.col(group_order_col).cast("bigint").alias("__g"),
        F.col(value_col).cast("bigint").alias("__v"),
    ).filter(
        F.col(group_order_col).isNotNull() & F.col(value_col).isNotNull()
    )
    gv = base.groupBy("__v", "__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    gv = gv.localCheckpoint(eager=False)  # feeds grid windows + moments
    from pyspark.sql.window import Window

    # densify to the |values| x |groups| grid: a group's values-prefix
    # must include values it never observed (sparse rows would skip
    # other groups' mass below them)
    vals = gv.select("__v").distinct()
    grps = gv.select("__g").distinct()
    dense = (
        # bcast: model(k) ordered-group list
        vals.crossJoin(F.broadcast(grps))
        .join(gv, ["__v", "__g"], "left")
        .withColumn("__c", F.coalesce(F.col("__c"), F.lit(0)).cast("bigint"))
    )
    # S(v, j) = Σ_{i<j} c_{v,i}: groups-prefix within each value
    w_g = Window.partitionBy("__v").orderBy("__g").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    grid = dense.withColumn(
        "__s", F.coalesce(F.sum("__c").over(w_g), F.lit(0)).cast("bigint")
    )
    # CumLess(v, j) = Σ_{v'<v} S(v', j): values-prefix within each group
    w_v = Window.partitionBy("__g").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    grid = grid.withColumn(
        "__cl", F.coalesce(F.sum("__s").over(w_v), F.lit(0)).cast("bigint")
    )
    jt_row = grid.agg(
        F.sum(
            F.col("__c").cast(d)
            * (F.lit(2).cast(d) * F.col("__cl").cast(d) + F.col("__s").cast(d))
        )
        .cast(d)
        .alias("__jt2")
    )
    ng = gv.groupBy("__g").agg(F.sum("__c").cast("bigint").alias("__n"))
    nd_ = F.col("__n").cast(d)
    g_mom = ng.agg(
        F.sum("__n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("int").alias("k"),
        F.sum(nd_ * nd_).cast(d).alias("__sn2"),
        F.sum(nd_ * (nd_ - 1) * (F.lit(2).cast(d) * nd_ + 5))
        .cast(d)
        .alias("__sn25"),
        F.sum(nd_ * (nd_ - 1)).cast(d).alias("__sn1"),
        F.sum(nd_ * (nd_ - 1) * (nd_ - 2)).cast(d).alias("__sn12"),
    )
    tv = gv.groupBy("__v").agg(F.sum("__c").cast("bigint").alias("__t"))
    td = F.col("__t").cast(d)
    t_mom = tv.agg(
        F.sum(td * (td - 1) * (F.lit(2).cast(d) * td + 5))
        .cast(d)
        .alias("__st25"),
        F.sum(td * (td - 1)).cast(d).alias("__st1"),
        F.sum(td * (td - 1) * (td - 2)).cast(d).alias("__st12"),
    )
    # bcast: const(1) scalar moment rows
    row = g_mom.crossJoin(F.broadcast(t_mom)).crossJoin(
        F.broadcast(jt_row)
    )
    nD = F.col("n").cast(d)
    a_term = (
        nD * (nD - 1) * (F.lit(2).cast(d) * nD + 5)
        - F.col("__sn25")
        - F.col("__st25")
    ).cast("double")
    b_term = (F.col("__sn12") * F.col("__st12")).cast("double")
    c_term = (F.col("__sn1") * F.col("__st1")).cast("double")
    n_f = F.col("n").cast("double")
    var = (
        a_term / F.lit(72.0)
        + F.try_divide(
            b_term,
            F.lit(36.0) * (n_f * (n_f - 1) * (n_f - 2)),
        )
        + F.try_divide(c_term, F.lit(8.0) * (n_f * (n_f - 1)))
    )
    # even by construction (N² − Σn² = 2·Σ_{i<j} n_i·n_j) — one
    # double halving replays exactly on any engine
    e2 = (nD * nD - F.col("__sn2")).cast("double") / F.lit(2.0)
    z = F.try_divide(
        F.col("__jt2").cast("double") - e2,
        F.lit(2.0) * F.sqrt(var),
    )
    return row.select(
        "n",
        "k",
        # BIGINT output: JT2 <= N^2 — safe to ~3e9 rows
        F.col("__jt2").cast("bigint").alias("jt2"),
        round_stable(z, 4).alias("z"),
    )
