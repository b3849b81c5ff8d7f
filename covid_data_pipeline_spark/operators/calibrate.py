"""Cross-group score calibration.

A curation pipeline scores documents per SOURCE (different crawls,
different eras, different heuristics), then wants one global keep/drop
threshold — but each source's score distribution is shifted, so a raw
global cut over- or under-prunes whole sources. The fix used in
genomics (microarray normalization) and ML feature pipelines alike is
QUANTILE NORMALIZATION: replace each value by the value at the same
quantile of a reference (here: the pooled global) distribution, making
every source's distribution identical while preserving within-source
order. The reference's mart ranks countries on raw metric columns
(/root/reference/airflow/dags/covid_dag.py mart ORDER BY); this is the
cross-population calibration that makes such rankings comparable.

Scale design — no global sort anywhere:

- The reference distribution is DOMAIN-COMPRESSED (the repo's exact
  order-statistics idiom): counts per distinct value (tiny relation),
  cumulative offsets over it, so "the value at global position p" is a
  broadcast RANGE lookup ``lo < p <= hi`` against the distinct-value
  table — never a row_number() over the corpus in one task.
- Per-group ranks are one hash-partitioned window on the group key.
- Position arithmetic is exact BIGINT: ``pos = 1 + (r-1)·(N-1) div
  (n_g-1)`` — integer floor division on both engines, no float in the
  mapping (a group's min maps to global position 1, its max to N).
  At 2^53-breaking scales swap the product into DECIMAL(38,0); at any
  tested SF the BIGINT product is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    val_col: str,
    id_col: str,
    out_col: str = "norm_value",
) -> DataFrame:
    """Map each row's ``val_col`` onto the pooled distribution of ALL
    rows: a row at within-group rank r of n_g gets the pooled value at
    global position ``1 + (r-1)(N-1) div (n_g-1)`` (ties and order
    broken by ``id_col``; a singleton group gets the pooled median).

    Output: the input columns plus ``out_col`` (same type as
    ``val_col``). Within-group order of ``out_col`` equals the order of
    ``val_col``; across groups the normalized distributions coincide.

    Join shape matters at scale: the pooled value is fetched by an
    EQUI-join ``pos == gidx`` against the corpus tagged with its global
    sorted index — never an interval/range join, which Spark can only
    plan as a broadcast nested loop (measured catastrophic past ~10k
    distinct values). The global index itself needs no global sort:
    per-distinct-value offsets (one cumulative window over the
    domain-compressed counts relation) plus a within-value rank."""
    # global sorted index: offset(value) + rank within value
    counts = df.groupBy(F.col(val_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_off = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__v", F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off")
    )
    ref = (
        df.select(F.col(val_col).alias("__ref_val"), F.col(id_col))
        .join(offsets, F.col("__ref_val") == F.col("__v"))
        .select(
            "__ref_val",
            (F.col("__off") + F.row_number().over(
                Window.partitionBy("__ref_val").orderBy(id_col)
            ).cast("long")).alias("__gidx"),
        )
    )
    total = df.agg(F.count(F.lit(1)).alias("__n_total"))

    w_grp = Window.partitionBy(group_col).orderBy(val_col, id_col)
    ranked = (
        df.withColumn("__r", F.row_number().over(w_grp).cast("long"))
        .withColumn(
            "__n_g", F.count(F.lit(1)).over(Window.partitionBy(group_col))
        )
        # bcast: const(1) scalar total agg
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__pos",
            F.when(
                F.col("__n_g") == 1,
                F.lit(1) + F.expr("(__n_total - 1) div 2"),
            ).otherwise(
                F.lit(1)
                + F.expr("((__r - 1) * (__n_total - 1)) div (__n_g - 1)")
            ),
        )
    )
    out = ranked.join(
        ref, F.col("__pos") == F.col("__gidx")
    ).withColumn(out_col, F.col("__ref_val"))
    return out.drop(
        "__r", "__n_g", "__n_total", "__pos", "__ref_val", "__gidx"
    )


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    s_col: str,
    w_col: str,
    out_col: str = "iso_value",
) -> DataFrame:
    """Isotonic regression per group by Pool-Adjacent-Violators (PAV,
    Ayer et al. 1955; the calibration step behind isotonic classifier
    calibration, Zadrozny & Elkan KDD'02): given per-bucket integer
    ``(s_col, w_col)`` success/weight counts ordered by ``x_col``, fit
    the least-squares NON-DECREASING rate curve. Appends ``out_col``
    (the pooled rate, raw double — callers round JVM-side per repo
    float policy) to the input rows.

    PAV's inner merge cascade is data-dependent (a stack machine, not a
    fixed-order fold), so this is the sanctioned Arrow path: one
    ``applyInPandas`` over groups, exact PYTHON-INT pool arithmetic
    (violation test ``s_a·w_b < s_b·w_a`` — no float compare anywhere),
    O(buckets) state. Buckets per group are domain-compressed (a
    calibration curve has dozens of points however big the corpus), so
    group payloads stay tiny while the corpus-sized count aggregation
    happens BEFORE this operator in plain DataFrame ops. The oracle
    replays the same machine as a PDA-style recursive CTE (one push or
    one merge per step) — PAV's solution is unique, so merge scheduling
    cannot diverge."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [*df.schema.fields, StructField(out_col, DoubleType(), False)]
    )

    def _pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col, kind="mergesort").reset_index(drop=True)
        ss = [int(v) for v in pdf[s_col]]
        ws = [int(v) for v in pdf[w_col]]
        stack: list[tuple[int, int, int]] = []
        for s, w in zip(ss, ws):
            cs, cw, cn = s, w, 1
            while stack and cs * stack[-1][1] < stack[-1][0] * cw:
                ps, pw, pn = stack.pop()
                cs, cw, cn = cs + ps, cw + pw, cn + pn
            stack.append((cs, cw, cn))
        fitted: list[float] = []
        for cs, cw, cn in stack:
            fitted.extend([cs / cw] * cn)
        pdf[out_col] = fitted
        return pdf

    return df.groupBy(group_col).applyInPandas(_pav, schema)


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reliability table + Brier score — the calibration diagnostic
    (DeGroot & Fienberg 1983; Niculescu-Mizil & Caruana ICML'05) every
    probabilistic gate in a curation pipeline should publish next to
    its precision/recall: per equal-width probability bin, how often
    did the positive class actually occur vs what the model predicted,
    plus the mean squared probability error overall.

    ``score_col`` is an INTEGRAL micro-probability in [0, scale]
    (callers quantize once, the k-means/WOE lattice rule);
    ``label_col`` is boolean. Bin k covers [k/bins, (k+1)/bins) with
    the top bin closed — assignment is exact integer ``least(bins-1,
    s*bins div scale)``. Per bin: ``n``, ``n_pos``, ``mean_score``
    (one division for display), ``frac_pos`` (one division). The
    global ``brier`` column is an exact DECIMAL(38,0) sum of integer
    squared errors ``(s - y*scale)^2`` with ONE final division — so
    every emitted value is engine- and partition-independent. NULL
    label or score rows are excluded.

    Scale shape: one map-side-combining rollup to <= ``bins`` rows +
    one broadcast scalar; nothing corpus-sized survives the first
    aggregate."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    d38 = "decimal(38,0)"
    s = F.col(score_col).cast("bigint")
    y = F.col(label_col).cast("boolean").cast("int")
    base = df.select(s.alias("__s"), y.alias("__y")).filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    binned = base.withColumn(
        "bin",
        F.least(
            F.lit(bins - 1),
            F.expr(f"__s * {int(bins)} div {int(scale)}"),
        ).cast("bigint"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").cast("bigint").alias("n_pos"),
        F.sum("__s").cast("bigint").alias("__ssum"),
    )
    err = (F.col("__s") - F.col("__y") * scale).cast(d38)
    tot = base.agg(
        F.sum(err * err).cast(d38).alias("__se"),
        F.count(F.lit(1)).alias("__n"),
    )
    brier = F.round(
        F.col("__se").cast("double")
        / (F.col("__n").cast("double") * float(scale) * float(scale)),
        6,
    )
    return (
        # bcast: const(1) scalar squared-error agg
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(
                F.col("__ssum").cast("double")
                / (F.col("n").cast("double") * float(scale)),
                6,
            ).alias("mean_score"),
            F.round(
                F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
            ).alias("frac_pos"),
            brier.alias("brier"),
        )
    )


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Expected calibration error (Naeini et al., AAAI 2015) — the
    single-number summary of :func:`calibration_report`'s reliability
    table: ECE = Σ_k (n_k/n)·|acc_k − conf_k|, the bin-weighted gap
    between observed accuracy and mean predicted confidence.

    Exactness: NEVER composed from the report's rounded per-bin
    columns (the never-round-a-rounded-value rule). With integral
    micro-prob scores s ∈ [0, scale] and boolean labels, each bin's
    gap clears denominators to the exact BIGINT
    ``|n_pos_k·scale − Σ_k s|`` and

        ECE = Σ_k |n_pos_k·scale − ssum_k| / (n·scale)

    spends ONE division. Same binning as the report (bin = least(
    bins−1, s·bins div scale)). Returns one row ``(n, ece)``; NULL
    score/label rows are excluded.

    Scale shape: one map-side-combining rollup to ≤ bins rows, then a
    scalar fold — nothing corpus-sized survives the first aggregate."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    s = F.col(score_col).cast("bigint")
    y = F.col(label_col).cast("boolean").cast("int")
    base = df.select(s.alias("__s"), y.alias("__y")).filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    binned = base.withColumn(
        "__bin",
        F.least(
            F.lit(bins - 1),
            F.expr(f"__s * {int(bins)} div {int(scale)}"),
        ),
    )
    per_bin = binned.groupBy("__bin").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").cast("bigint").alias("__pos"),
        F.sum("__s").cast("bigint").alias("__ssum"),
    )
    d38 = "decimal(38,0)"
    gap = F.abs(
        F.col("__pos").cast(d38) * F.lit(int(scale)).cast(d38)
        - F.col("__ssum").cast(d38)
    )
    agg = per_bin.agg(
        F.coalesce(F.sum(gap), F.lit(0).cast(d38)).alias("__num"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n"),
    )
    return agg.select(
        "n",
        F.round(
            F.col("__num").cast("double")
            / (F.col("n").cast("double") * F.lit(float(scale))),
            6,
        ).alias("ece"),
    )
