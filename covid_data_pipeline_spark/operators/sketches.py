"""Portable HyperLogLog: distinct-count sketches an oracle can replay.

Spark's datasketches functions (``hll_sketch_agg`` /
``hll_union_agg``) are the production path for sliding/mergeable
distinct counts (see ``rolling_distinct_users_7d_hll``), but their
binary state is engine-internal — a different engine cannot reproduce
it, so those queries are rows-only in the correctness ledger. This
module is the repo's integer-lattice recipe applied to sketches: the
SAME HLL algorithm built from portable primitives, so the register
relation and the estimate are bit-identical on any md5-capable engine
(DuckDB replays them exactly — the sketch itself becomes
hash-verifiable, not just error-bounded).

Construction (classic Flajolet–Fuser–Gandouet–Meunier HLL):

- 60-bit hash: first 15 hex chars of md5 (the repo's portable-hash
  contract, `operators/features.py::portable_token_hash`).
- bucket = top ``p`` bits (``h >> (60-p)``); the remaining
  ``w = 60-p`` bits feed rho = leading zeros + 1, computed EXACTLY as
  ``w - LENGTH(BIN(rest)) + 1`` (both engines' ``bin()`` renders
  without leading zeros; rest = 0 means all-zeros → rho = w+1).
- register = MAX(rho) per bucket — a plain groupBy, so a "sketch" is
  a (group, bucket, rho) relation of at most m = 2^p rows per group,
  sparse where empty. Merging sketches is MAX over the union — the
  same mergeability contract as the binary datasketches, expressed
  relationally.
- estimate: alpha_m * m^2 / sum_j 2^(-M_j). The harmonic sum is kept
  EXACT by scaling to integers: sum 2^(61-M_j) over present registers
  (BIGINT per term, DECIMAL(38,0)/HUGEINT accumulation) plus
  z * 2^61 for the z empty registers; the only float op is the final
  division, one deterministic IEEE expression on both engines. The
  small-range (linear-counting) branch ``m * ln(m/z)`` fires exactly
  when ``z > 0 AND e_raw <= 2.5 m`` — same branch, same expression,
  both engines.

Scale shape: the corpus is touched ONCE (hash + bucket are pure
projections, register max is one map-side-combining aggregate); every
re-windowing/merge afterwards works on |groups| x m register rows
(KBs), never the corpus. That is the 100 TB point of sketching — and
unlike the binary blobs, these registers are also the VERIFICATION
artifact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.features import portable_token_hash

_TWO61 = 1 << 61


def _rho(rest: Column, w: int) -> Column:
    """Leading-zero count + 1 of a ``w``-bit word, exactly: bin()
    renders without leading zeros on both engines, so
    rho = w - bit_length(rest) + 1 (all-zero word → w + 1)."""
    return (
        F.when(rest == 0, F.lit(w + 1))
        .otherwise(F.lit(w) - F.length(F.bin(rest)) + F.lit(1))
        .cast("int")
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """Per-group HLL register relation: ``group_cols + (bucket, rho)``.

    NULL keys are excluded (COUNT DISTINCT semantics). One map-side-
    combining aggregate over the corpus; output is at most m = 2^p rows
    per group (sparse: empty registers are absent, the estimator
    accounts for them)."""
    assert 4 <= p <= 18, "p outside the supported register range"
    w = 60 - p
    mask = (1 << w) - 1
    h = portable_token_hash(F.col(key_col).cast("string"))
    keyed = df.where(F.col(key_col).isNotNull()).select(
        *group_cols,
        F.shiftright(h, w).alias("bucket"),
        _rho(h.bitwiseAND(F.lit(mask)), w).alias("__rho"),
    )
    return keyed.groupBy(*group_cols, "bucket").agg(
        F.max("__rho").alias("rho")
    )


def hll_merge(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Union sketches: MAX per (group, bucket) over any number of
    register relations already stacked into one DataFrame. Reassigning
    ``group_cols`` before the merge re-windows the sketch (day →
    trailing window, day → month) without touching the corpus."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str],
    p: int = 12,
    out_col: str = "distinct_est",
    decimals: int = 4,
) -> DataFrame:
    """Estimate per group from a register relation.

    The harmonic mean is computed in exact integers (sum of
    2^(61-rho) as DECIMAL(38,0), empty registers as z * 2^61); the
    raw-estimate numerator alpha_m * m^2 * 2^61 is inlined as ONE
    double literal so both engines evaluate the identical
    division. Small-range branch: m * ln(m/z) when z > 0 and
    e_raw <= 2.5 m (ln agrees to <1 ulp cross-engine)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(_TWO61)
    pres = F.count(F.lit(1))
    # SQL-form shiftleft: the Python wrapper only takes a literal shift
    s_pres = F.sum(
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - rho)"
               " AS DECIMAL(38,0))")
    )
    est = registers.groupBy(*group_cols).agg(
        pres.alias("__pres"), s_pres.alias("__s")
    )
    z = F.lit(m) - F.col("__pres")
    s_full = (
        F.col("__s")
        + z.cast("decimal(38,0)") * F.lit(_TWO61).cast("decimal(38,0)")
    )
    e_raw = F.lit(num) / s_full.cast("double")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / z.cast("double"))
    e = F.when((z > 0) & (e_raw <= F.lit(2.5 * m)), small).otherwise(e_raw)
    return est.select(
        *group_cols, F.round(e, decimals).alias(out_col)
    )


def bottomk_hashes(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    k: int = 512,
) -> DataFrame:
    """KMV / theta sketch: the ``k`` smallest DISTINCT md5-prefix
    hashes of ``key_col`` per group, plus the group's retained count.

    Output: ``group_cols + (h, rank, n_kept)``. The sketch is a pure
    function of the key SET (dedup first, then order-stat trim), so it
    is partition-invariant, mergeable (union then re-trim), and
    SQL-replayable. Distinct-count estimate: ``(k-1) * 2^60 / h_k``
    when the sketch is full, exact ``n_kept`` otherwise. Scale shape:
    one distinct aggregate over (group, hash) with map-side combine,
    then a WindowGroupLimit rank — each task keeps at most k rows per
    group during the sort."""
    h = portable_token_hash(F.col(key_col).cast("string"))
    uh = (
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    ranked = uh.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    n = ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_kept"))
    return ranked.join(n, list(group_cols))


def theta_pair_overlap(
    sketch: DataFrame,
    group_col: str,
    k: int = 512,
    hash_space: int = 1 << 60,
) -> DataFrame:
    """Pairwise distinct-intersection estimates from a
    :func:`bottomk_hashes` sketch relation — the theta-sketch set
    operation ("how many users did BOTH a and b") that exact COUNT
    DISTINCT can only answer with a corpus-squared pass per pair.

    theta = min(theta_a, theta_b) where a full sketch's theta is its
    k-th smallest hash and a partial sketch's is the full hash space;
    common hashes below theta are an exact sample of the intersection
    at sampling rate theta/space, so
    ``est = |common < theta| * space / theta`` — all-integer inputs,
    one float division. Works on sketch rows only: cost is
    |groups|^2 x k at worst, never the corpus."""
    theta = sketch.groupBy(group_col, "n_kept").agg(
        F.max(F.when(F.col("n_kept") >= k, F.col("h"))).alias("__hk")
    ).select(
        group_col,
        "n_kept",
        F.coalesce("__hk", F.lit(hash_space)).alias("theta"),
    )
    a = sketch.select(
        F.col(group_col).alias("ga"), F.col("h").alias("h")
    )
    b = sketch.select(
        F.col(group_col).alias("gb"), F.col("h").alias("h")
    )
    ta = theta.select(
        F.col(group_col).alias("ga"),
        F.col("theta").alias("theta_a"),
        F.col("n_kept").alias("n_a"),
    )
    tb = theta.select(
        F.col(group_col).alias("gb"),
        F.col("theta").alias("theta_b"),
        F.col("n_kept").alias("n_b"),
    )
    common = (
        a.join(b, "h")
        .where(F.col("ga") < F.col("gb"))
        .join(F.broadcast(ta), "ga")  # bcast: model(|groups|) sketch thetas
        .join(F.broadcast(tb), "gb")  # bcast: model(|groups|) sketch thetas
        .withColumn("__theta", F.least("theta_a", "theta_b"))
        .where(F.col("h") < F.col("__theta"))
        .groupBy("ga", "gb", "__theta")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    est = (
        F.col("n_common").cast("double")
        * F.lit(float(hash_space))
        / F.col("__theta").cast("double")
    )
    return common.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        "n_common",
        F.round(est, 4).alias("overlap_est"),
    )


def hash_sample_quantiles(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: Sequence[str],
    k: int = 2048,
    quantiles: Sequence[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
) -> DataFrame:
    """Mergeable quantile sketch from a deterministic bottom-k ROW
    sample: keep the ``k`` rows with the smallest md5-prefix hash of
    ``id_col`` per group (a uniform sample of rows, reproducible on any
    partitioning/engine — the same KMV idea applied to rows instead of
    key sets), then estimate quantile q as the sample's exact order
    statistic at rank ``ceil(q * n_s)``.

    Rank arithmetic is all-integer (``(n*num + den - 1) div den``), the
    value order carries ``id_col`` as tiebreaker, and the output is a
    real data value — nothing to float-drift, so the sketch estimate
    hash-matches an oracle replay exactly. Standard sample-quantile
    error is O(1/sqrt(k)) in rank space. Scale shape: one
    WindowGroupLimit pass to sample (tasks keep <= k rows per group),
    one tiny window over the <= k-row sample per group."""
    from pyspark.sql.window import Window

    h = portable_token_hash(F.col(id_col).cast("string"))
    ws = Window.partitionBy(*group_cols).orderBy("__h", id_col)
    sample = (
        df.where(F.col(id_col).isNotNull() & F.col(value_col).isNotNull())
        .select(*group_cols, id_col, value_col, h.alias("__h"))
        .withColumn("__srn", F.row_number().over(ws))
        .where(F.col("__srn") <= k)
    )
    wv = Window.partitionBy(*group_cols).orderBy(value_col, id_col)
    wn = Window.partitionBy(*group_cols)
    ranked = sample.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.row_number().over(wv).alias("__vrn"),
        F.count(F.lit(1)).over(wn).alias("__ns"),
    )
    aggs = [F.max("__ns").alias("n_sample")]
    for name, num, den in quantiles:
        # ceil(q * n_s) in exact integers: (n*num + den-1) div den
        rank = F.expr(f"(__ns * {num} + {den - 1}) div {den}")
        aggs.append(
            F.max(F.when(F.col("__vrn") == rank, F.col("__v"))).alias(name)
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


def cm_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Portable count-min sketch: point-frequency estimates for ANY key
    from ``depth x width`` integer counters — the frequency complement
    of the Misra-Gries top-k (`operators/heavyhitters.py`), mergeable
    by counter addition.

    Row hash per depth d is the md5 prefix of ``d ':' key`` (portable,
    so an oracle regenerates every counter exactly); counters are plain
    COUNT aggregates. Output: ``group_cols + (d, slot, cnt)`` —
    at most depth*width rows per group regardless of corpus size.
    Scale shape: one explode(depth) + one map-side-combining aggregate;
    the corpus is read once."""
    ds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    rows = df.where(F.col(key_col).isNotNull()).select(
        *group_cols, F.col(key_col).cast("string").alias("__k"), ds
    )
    h = portable_token_hash(
        F.concat(F.col("d").cast("string"), F.lit(":"), F.col("__k"))
    )
    return (
        rows.withColumn("slot", F.pmod(h, F.lit(width)))
        .groupBy(*group_cols, "d", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 4,
    width: int = 8192,
    out_col: str = "freq_est",
) -> DataFrame:
    """Point-frequency estimate for each probe key: min over the
    ``depth`` counters the key hashes to. Never underestimates
    (CM guarantee: est >= true count; overestimate bounded by
    collisions ~ n/width per row, min over rows). All-integer — the
    whole lookup hash-verifies against an oracle replay. Probes join
    the sketch on (d, slot): |probes| x depth rows against the
    depth*width-row sketch."""
    pr = probes.where(F.col(key_col).isNotNull()).select(
        *group_cols,
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    h = portable_token_hash(
        F.concat(
            F.col("d").cast("string"),
            F.lit(":"),
            F.col(key_col).cast("string"),
        )
    )
    pr = pr.withColumn("slot", F.pmod(h, F.lit(width)))
    joined = pr.join(sketch, [*group_cols, "d", "slot"], "left").select(
        *group_cols,
        key_col,
        F.coalesce(F.col("cnt"), F.lit(0)).alias("__c"),
    )
    return joined.groupBy(*group_cols, key_col).agg(
        F.min("__c").alias(out_col)
    )


def hll_oracle_ctes(
    source_sql: str,
    key_expr: str,
    group_expr: str,
    group_alias: str,
    p: int = 12,
    prefix: str = "hll",
) -> str:
    """DuckDB CTE block replaying :func:`hll_registers` →
    per-(group, bucket) registers as ``{prefix}_reg(group_alias,
    bucket, rho)``. The caller composes merge/estimate SQL on top (see
    :func:`hll_estimate_sql`)."""
    w = 60 - p
    mask = (1 << w) - 1
    return f"""
    {prefix}_h AS (
      SELECT {group_expr} AS {group_alias},
             CAST(concat('0x', substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM {source_sql}
      WHERE {key_expr} IS NOT NULL
    ),
    {prefix}_br AS (
      SELECT {group_alias}, h >> {w} AS bucket,
             CAST(CASE WHEN (h & {mask}) = 0 THEN {w + 1}
                  ELSE {w} - LENGTH(BIN(h & {mask})) + 1 END AS INTEGER)
               AS rho
      FROM {prefix}_h
    ),
    {prefix}_reg AS (
      SELECT {group_alias}, bucket, MAX(rho) AS rho
      FROM {prefix}_br GROUP BY {group_alias}, bucket
    )"""


def hll_estimate_sql(
    reg_sql: str,
    group_alias: str,
    out_col: str = "distinct_est",
    p: int = 12,
    decimals: int = 4,
) -> str:
    """DuckDB SELECT replaying :func:`hll_estimate` over a register
    relation ``reg_sql(group_alias, bucket, rho)`` — identical integer
    harmonic sum (HUGEINT) and the same single-division float tail."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(_TWO61)
    return f"""
    SELECT {group_alias},
           ROUND(CASE WHEN ({m} - pres) > 0
                       AND {num!r} / CAST(s_pres
                           + CAST({m} - pres AS HUGEINT)
                             * CAST({_TWO61} AS HUGEINT) AS DOUBLE)
                           <= {2.5 * m!r}
                  THEN {float(m)!r} * LN({float(m)!r}
                                         / CAST({m} - pres AS DOUBLE))
                  ELSE {num!r} / CAST(s_pres
                           + CAST({m} - pres AS HUGEINT)
                             * CAST({_TWO61} AS HUGEINT) AS DOUBLE)
                  END, {decimals}) AS {out_col}
    FROM (
      SELECT {group_alias}, COUNT(*) AS pres,
             SUM(CAST((CAST(1 AS BIGINT) << (61 - rho)) AS HUGEINT)) AS s_pres
      FROM {reg_sql} GROUP BY {group_alias}
    )"""


def ams_f2_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 16,
) -> DataFrame:
    """AMS tug-of-war sketch of the second frequency moment
    (Alon-Matias-Szegedy, STOC'96): estimator j folds every row into
    ``sum_keys sign_j(key) * cnt(key)`` where sign_j is ±1 from the
    parity of the portable md5 hash of ``'ams' j ':' key`` — one
    map-side-combining aggregate per pass, ``depth`` BIGINT
    accumulators per group, corpus touched once.

    Returns ``group_cols + (j, x)`` with ``x = (signed sum)^2`` in
    DECIMAL(38,0): the signed sum is BIGINT-exact, and the square —
    which overflows BIGINT once a group holds ~3e9 rows — stays exact
    in decimal (HUGEINT on DuckDB). E[x] = F2; averaging the depth
    estimators (:func:`ams_f2_estimate`) tightens variance by 1/depth.
    Self-join size estimation is the classic use: |R join R on k| = F2
    of R.k, so the sketch prices a join without running it."""
    rows = df.where(F.col(key_col).isNotNull()).select(
        *group_cols, F.col(key_col).cast("string").alias("__k")
    )

    def _sign(j: int) -> Column:
        return (
            F.lit(1)
            - F.lit(2)
            * (
                portable_token_hash(
                    F.concat(F.lit(f"ams{j}:"), F.col("__k"))
                )
                % 2
            )
        ).cast("bigint")

    # depth accumulators in ONE map-side-combining aggregate — no
    # depth-x row explode; each estimator is its own SUM column,
    # unpivoted to (j, x) on the |groups|-sized result afterwards.
    wide = rows.groupBy(*group_cols).agg(
        *[F.sum(_sign(j)).alias(f"__s{j}") for j in range(depth)]
    )
    long = wide.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), F.col(f"__s{j}").alias("__s")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__e"),
    ).select(
        *group_cols, F.col("__e.j").alias("j"), F.col("__e.__s").alias("__s")
    )
    x = (
        F.col("__s").cast("decimal(38,0)")
        * F.col("__s").cast("decimal(38,0)")
    ).alias("x")
    return long.select(*group_cols, "j", x)


def ams_f2_estimate(
    sketch: DataFrame,
    group_cols: Sequence[str] = (),
    depth: int | None = None,
    out_col: str = "f2_est",
) -> DataFrame:
    """Mean of the tug-of-war estimators: ``sum_j x_j / depth``. The
    sum stays DECIMAL(38,0)-exact; with a power-of-two depth the final
    division is dyadic, so the double is the exact value whenever the
    sum fits 2^53 (true at every test scale — at real scale the
    estimate is approximate anyway).

    The divisor is the sketch's OWN per-group estimator count
    (``count(j)``), so a depth mismatch with :func:`ams_f2_sketch`
    cannot silently scale the estimate (ADVICE r7). Passing ``depth``
    turns the contract into a hard check: any group whose row count
    differs raises at action time."""
    agg = sketch.groupBy(*group_cols).agg(
        F.sum("x").alias("__xs"),
        F.count("j").alias("__d"),
    )
    if depth is not None:
        # ANSI mode: raise_error aborts the job on the first mismatch.
        agg = agg.withColumn(
            "__d",
            F.when(F.col("__d") == int(depth), F.col("__d")).otherwise(
                F.raise_error(
                    F.format_string(
                        "ams_f2_estimate: sketch has %d estimators per "
                        f"group, expected {int(depth)}",
                        F.col("__d"),
                    )
                ).cast("long")
            ),
        )
    return agg.select(
        *group_cols,
        (F.col("__xs").cast("double") / F.col("__d").cast("double")).alias(
            out_col
        ),
    )


def cm_inner_product(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    group_cols: Sequence[str] = (),
    out_col: str = "join_size_est",
) -> DataFrame:
    """Equi-join size estimate from two count-min sketches (Cormode &
    Muthukrishnan, J. Algorithms 2005, §4.2): per depth row ``d`` the
    dot product of the two counter vectors upper-bounds the true inner
    product ``|A JOIN B on k| = sum_k cnt_A(k) * cnt_B(k)`` (hash
    collisions only ADD cross terms); the estimate is the min over
    depth rows — never an underestimate, expected overestimate
    ~ n_a*n_b/width per row. This prices a join WITHOUT running it
    from two model-sized sketches (depth x width counters each), the
    planner-statistics use the AMS F2 sketch covers for self-joins.

    Inputs are :func:`cm_sketch` outputs built with the SAME depth and
    width (slots only collide meaningfully under one hash family).
    Dot products accumulate in DECIMAL(38,0) (counter products
    overflow BIGINT once both sides exceed ~3e9 rows per slot pair);
    depth rows whose counter vectors share no occupied slot contribute
    a true zero dot (re-attached via the depth frame, not dropped by
    the inner join)."""
    keys = list(group_cols)
    a = sketch_a.select(
        *keys, "d", "slot", F.col("cnt").alias("_ca")
    )
    b = sketch_b.select(
        *keys, "d", "slot", F.col("cnt").alias("_cb")
    )
    dots = (
        a.join(b, [*keys, "d", "slot"])
        .groupBy(*keys, "d")
        .agg(
            F.sum(
                F.col("_ca").cast("decimal(38,0)") * F.col("_cb")
            ).alias("_dot")
        )
    )
    frame = sketch_a.select(*keys, "d").distinct()
    full = frame.join(dots, [*keys, "d"], "left").withColumn(
        "_dot", F.coalesce(F.col("_dot"), F.lit(0).cast("decimal(38,0)"))
    )
    return full.groupBy(*keys).agg(
        F.min("_dot").cast("bigint").alias(out_col)
    )
