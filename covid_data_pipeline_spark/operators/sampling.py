"""Deterministic sampling / splitting / packing for training-data curation.

These are the dataset-assembly verbs a 100 TB pretraining pipeline runs
after dedup and quality filtering: carve reproducible train/valid/test
splits, draw stratified subsamples, and pack documents into
fixed-token-budget sequences. All three are pure narrow/window
transformations — no Python row path, no shuffle beyond the declared
window partitioning — so they scale linearly with input splits.

Determinism contract: every operator keys off a *multiplicative integer
hash* of a caller-named id column (Knuth's 2654435761 scheme), not
Spark's `rand()`/`sample()`. The same row lands in the same split on any
cluster, any partitioning, any engine — which is what makes the result
reproducible AND lets DuckDB verify it (`(id * 2654435761) % 2^32` is
portable integer arithmetic, unlike Murmur3 seeds).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KNUTH_MULT = 2654435761  # 2^32 / golden ratio, Knuth TAOCP vol 3 §6.4
HASH_MOD = 4294967296  # 2^32


_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _require_integral_id(df: DataFrame, id_col: str) -> None:
    """Boundary validation: the determinism contract needs a non-null
    integral id. A string id would cast('bigint')-throw mid-job under
    Spark 4 ANSI; catching it here fails fast with a usable message."""
    dt = df.schema[id_col].dataType.simpleString()
    if dt not in _INTEGRAL_TYPES:
        raise TypeError(
            f"{id_col!r} must be an integral column for deterministic "
            f"hashing, got {dt} — cast or surrogate-key it first "
            "(e.g. xxhash64 of the natural key)"
        )


def knuth_hash(id_col: Column | str) -> Column:
    """Multiplicative hash of an integer id into [0, 2^32).

    ``pmod``, not ``%``: Spark's ``%`` keeps the dividend's sign, so a
    negative id would hash negative and fall through every split
    predicate. NULL ids hash to NULL (callers surface that as a NULL
    split/filter-out rather than a silent default bucket)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(c.cast("bigint") * F.lit(KNUTH_MULT), F.lit(HASH_MOD))


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    valid_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a deterministic train/valid/test split label.

    The hash is uniform over ids, so split sizes converge to the
    requested percentages; membership is stable under re-runs,
    repartitioning, and incremental appends (new rows never move old
    rows between splits — the property `randomSplit` lacks).

    NULL ids get a NULL split (explicit, auditable) instead of being
    silently routed to a default bucket.
    """
    _require_integral_id(df, id_col)
    pct = knuth_hash(id_col) % 100
    return df.withColumn(
        split_col,
        F.when(pct < train_pct, "train")
        .when(pct < train_pct + valid_pct, "valid")
        .when(pct.isNotNull(), "test"),
    )


def stratified_hash_sample(
    df: DataFrame, id_col: str, one_in: int = 10
) -> DataFrame:
    """Keep a deterministic 1/``one_in`` of rows (hash-gated filter).

    Stratification is implicit: the hash is independent of every other
    column, so the kept fraction holds within any stratum (language,
    source, ...) without a per-stratum pass. Pure filter — pushes to the
    scan, no shuffle, no state. NULL ids are filtered out (NULL
    comparison is never true).
    """
    _require_integral_id(df, id_col)
    return df.filter(knuth_hash(id_col) % one_in == 0)


def pack_greedy_bins(
    df: DataFrame,
    group_col: str | Sequence[str],
    order_col: str,
    size_col: Column | str,
    budget: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign rows to fixed-budget bins by running size within each group.

    Greedy cumulative packing: rows are taken in ``order_col`` order and
    ``bin_id = floor(preceding_cumulative_size / budget)`` — the standard
    sequence-packing pass that turns variable-length documents into
    ~budget-token training sequences. One window (= one shuffle on the
    group key(s)); a document longer than the budget claims bins by
    itself. Deterministic given the ordering column, which must be unique
    within a group. ``group_col`` may be a single column or a composite
    (e.g. ``(lang, length_bucket)`` for padding-aware packing).
    """
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (
        Window.partitionBy(*groups)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size).over(w), F.lit(0))
    return df.withColumn(bin_col, F.floor(cum_before / budget))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    k: int,
    key_col: str = "_es_key",
) -> DataFrame:
    """Deterministic weighted sample without replacement, size ``k``
    (Efraimidis–Spirakis A-Res): each row gets key ``ln(u)/w`` with
    ``u`` derived from the id hash, and the global top-k keys win —
    inclusion probability ∝ weight, membership reproducible on any
    cluster/partitioning (same hash contract as :func:`hash_split`).

    ``orderBy().limit(k)`` plans as TakeOrderedAndProject: per-partition
    top-k then a driver merge of k×partitions rows — no global sort
    shuffle, so this is one scan at any corpus size. Rows with
    non-positive weight are excluded (they'd have probability 0).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (knuth_hash(id_col) + F.lit(0.5)) / F.lit(HASH_MOD)
    key = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), F.col(id_col))
        .limit(k)
        .drop(key_col)
    )


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    n: int,
    rank_col: str = "_sample_rank",
) -> DataFrame:
    """Deterministic fixed-size sample per group: the ``n`` rows with the
    smallest id hash within each group (uniform over ids, same hash
    contract as :func:`hash_split` — reproducible on any partitioning
    and verifiable by an oracle engine).

    This is the per-stratum quota the implicit stratification of
    :func:`stratified_hash_sample` can't give you (a *rate* holds per
    stratum; a *count* doesn't). One window (= one shuffle on the group
    key); Spark plans the rank filter as WindowGroupLimit, so each task
    keeps only n rows per group during the sort — no full-group
    materialization. Ties are impossible (hash then id as tiebreaker).
    """
    _require_integral_id(df, id_col)
    w = Window.partitionBy(*group_cols).orderBy(
        knuth_hash(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
        .drop(rank_col)
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    target_rows: int,
    id_col: str,
) -> DataFrame:
    """Resample to a target group mixture (the training-data "data
    mixture" step: rebalance sources toward prescribed weights).

    Group ``g`` keeps ``min(1, target_rows * w_g / n_g)`` of its rows by
    deterministic hash threshold (same Knuth-hash contract as
    :func:`hash_split` — reproducible on any partitioning, verifiable by
    an oracle engine). An under-represented group caps at keep-all
    (upsampling/replication is a separate, explicit step). Groups absent
    from ``weights`` are dropped — pass an explicit weight for every
    group you want kept.

    Scale shape: one map-side-combined count per group (|groups| rows),
    broadcast back as per-group rates, then a pushable hash filter —
    the corpus itself never shuffles.
    """
    _require_integral_id(df, id_col)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    wmap = F.create_map(
        *[F.lit(x) for k, v in weights.items() for x in (k, float(v))]
    )
    rates = (
        counts.withColumn("__w", wmap[F.col(group_col)])
        .filter(F.col("__w").isNotNull())
        .withColumn(
            "__rate",
            F.least(
                F.lit(1.0), F.lit(float(target_rows)) * F.col("__w") / F.col("__n")
            ),
        )
        .select(group_col, "__rate")
    )
    return (
        # bcast: const(|weights|) mixture-group rates
        df.join(F.broadcast(rates), group_col)
        .filter(knuth_hash(id_col) < F.col("__rate") * F.lit(HASH_MOD))
        .drop("__rate")
    )


def mixture_resample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    target_rows: int,
    id_col: str,
    replica_col: str = "replica_idx",
) -> DataFrame:
    """Mixture resampling in BOTH directions: hit ``target_rows * w_g``
    rows per group by deterministic replication (epoch mixing) and/or
    hash-thinning.

    Each row's replica count is ``floor(f_g)`` plus one more when its
    Knuth hash falls under ``frac(f_g)``, where ``f_g = target_rows *
    w_g / n_g`` — so expected output is exactly the target and the
    realized set is a pure function of ids (reproducible across runs,
    partitionings, and engines). Replicas are distinguished by
    ``replica_col`` (0-based). With ``f_g <= 1`` everywhere this
    degrades to :func:`mixture_sample`'s thinning — prefer that
    operator for downsample-only mixtures (a pushable filter, no row
    expansion in the plan).

    Scale shape: tiny per-group counts broadcast back as factors; the
    explode happens partition-locally after a pushable ``reps > 0``
    pre-filter, so the corpus never shuffles and dropped groups never
    expand.
    """
    _require_integral_id(df, id_col)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    wmap = F.create_map(
        *[F.lit(x) for k, v in weights.items() for x in (k, float(v))]
    )
    factors = (
        counts.withColumn("__w", wmap[F.col(group_col)])
        .filter(F.col("__w").isNotNull())
        .withColumn("__f", F.lit(float(target_rows)) * F.col("__w") / F.col("__n"))
        .select(group_col, "__f")
    )
    full = F.floor(F.col("__f")).cast("long")
    frac = F.col("__f") - F.floor(F.col("__f"))
    reps = full + F.when(
        knuth_hash(id_col) < frac * F.lit(HASH_MOD), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        # bcast: const(|weights|) mixture-group factors
        df.join(F.broadcast(factors), group_col)
        .withColumn("__reps", reps)
        .filter(F.col("__reps") > 0)
        .withColumn(
            replica_col,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__reps") - 1)),
        )
        .drop("__f", "__reps")
    )


def global_hash_order(
    df: DataFrame,
    id_col: str,
    rank_col: str = "train_order",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic training-order shuffle: a dense 1-based global rank
    over ``(knuth_hash(id), id)`` — the reproducible "random" order a
    training run reads the corpus in (same hash contract as
    :func:`hash_split`, so the order survives re-runs, appends of other
    partitions, and any cluster layout).

    The scale point is HOW the global rank is computed: a naive
    ``row_number() OVER (ORDER BY ...)`` is a single-partition window —
    one task sorts the universe. Instead the hash key's uniformity is
    exploited directly: bucket = ``floor(hash / (2^32 / n))`` — a pure
    expression, so bucket boundaries are contiguous, deterministic, and
    data-independent (no sampled range exchange, no
    ``spark_partition_id``, both of which shift under AQE coalescing
    and would corrupt the offsets — caught by a 16M-row stress run).
    Count rows per bucket (tiny), cumsum the counts into per-bucket
    offsets, broadcast them back, and add each row's within-bucket
    row_number. Global rank = offset + local rank, exact because
    buckets partition the key space in order and (hash, id) is a total
    order. Cost: ONE exchange of the corpus (the bucket window) plus a
    |buckets|-row offset table — no single-task sort anywhere, balance
    guaranteed by hash uniformity rather than sampling.
    """
    _require_integral_id(df, id_col)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    bucket_width = HASH_MOD // n + 1
    keyed = df.withColumn("__k", knuth_hash(id_col)).withColumn(
        "__b", (F.col("__k") / F.lit(bucket_width)).cast("long")
    )
    counts = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__b", "__off")
    w_local = Window.partitionBy("__b").orderBy(F.col("__k"), F.col(id_col))
    return (
        # bcast: const(num_buckets) offset table
        keyed.join(F.broadcast(offsets), "__b")
        .withColumn(rank_col, F.col("__off") + F.row_number().over(w_local))
        .drop("__k", "__b", "__off")
    )


def value_order_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    rank_col: str = "value_rank",
    num_buckets: int = 256,
) -> DataFrame:
    """Exact dense 1-based global rank over ``(value, tiebreak)`` —
    :func:`global_hash_order`'s two-level construction generalized from
    a uniform hash key to an arbitrary integral value column, so
    NTILE/percentile arithmetic can be rebuilt from rank + count
    without the single-partition global-sort window.

    Buckets are contiguous value ranges from the broadcast min/max
    (``(v - vmin) div width``) — a pure expression, so boundaries are
    deterministic and AQE-safe. Per-bucket counts cumsum into offsets
    (the ONLY global window, over the <= ``num_buckets``-row compressed
    relation), broadcast back; within-bucket ``row_number`` ordered by
    ``(value, tiebreak)`` completes the rank. Global rank = offset +
    local rank, exact because range buckets tile the value space in
    order and (value, tiebreak) is a total order. Unlike the hash
    variant, bucket balance follows the VALUE distribution — heavy
    skew concentrates tasks but never breaks correctness."""
    vm = df.agg(
        F.min(value_col).alias("__vmin"), F.max(value_col).alias("__vmax")
    )
    keyed = (
        # bcast: const(1) scalar min/max agg
        df.crossJoin(F.broadcast(vm))
        .withColumn(
            "__b",
            F.expr(
                f"CAST(({value_col} - __vmin) div"
                f" ((__vmax - __vmin) div {num_buckets} + 1) AS BIGINT)"
            ),
        )
        .drop("__vmin", "__vmax")
    )
    counts = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__b", "__off")
    w_local = Window.partitionBy("__b").orderBy(
        F.col(value_col), F.col(tiebreak_col)
    )
    return (
        # bcast: const(num_buckets) offset table
        keyed.join(F.broadcast(offsets), "__b")
        .withColumn(
            rank_col,
            (F.col("__off") + F.row_number().over(w_local)).cast("long"),
        )
        .drop("__b", "__off")
    )


def string_group_hash(col: Column | str) -> Column:
    """Portable 32-bit hash of a STRING key: first 8 hex digits of md5,
    parsed as an integer — both engines (and any md5-capable oracle)
    compute the identical value, unlike engine-native string hashes.
    NULL propagates (callers decide the NULL-group policy)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def group_aware_split(
    df: DataFrame,
    group_col: str,
    train_pct: int = 80,
    valid_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-preventing split: assignment is a pure function of the
    GROUP key, so every row of a group (a source/domain, a near-dup
    cluster, a user) lands in the same split — the guard against
    train/test contamination through near-identical group members that
    row-level :func:`hash_split` cannot give. Same determinism
    contract: stable under re-runs, repartitioning, and appends of new
    groups. Zero shuffle — a pure projection."""
    pct = string_group_hash(group_col) % 100
    return df.withColumn(
        split_col,
        F.when(pct < train_pct, "train")
        .when(pct < train_pct + valid_pct, "valid")
        .when(pct.isNotNull(), "test"),
    )


def token_budget_select(
    df: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    group_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Budget-constrained corpus selection: per group, keep documents in
    deterministic Knuth-hash priority order until the group's TOKEN
    budget is exhausted (first doc that would overflow is cut, as is
    everything after it). The curation step for "give me ~N tokens per
    source, stably across reruns" — doc-count quotas can't hit a token
    target when doc lengths vary by orders of magnitude.

    Adds ``cum_tokens`` (the running total INCLUDING the row) so the
    consumer can audit how full each budget ran. Groups absent from
    ``budgets`` are dropped.

    Scale: ONE shuffle on the group key; the running sum is a streaming
    window frame (no buffering beyond the sort). Selection order is
    hash-of-id: reruns over the same id set are bit-identical. Appends
    keep every doc's PRIORITY stable but can move the cut line (a new
    doc that hashes early pushes later picks over budget) — freeze the
    id set first if an immutable selection is required."""
    _require_integral_id(df, id_col)
    budget = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )[F.col(group_col)]
    w = (
        Window.partitionBy(group_col)
        .orderBy(knuth_hash(id_col), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(tokens_col).over(w))
        .filter(F.col("cum_tokens") <= budget)
    )


def kfold_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: ``fold = knuth_hash(id) mod k``
    ∈ [0, k). Folds are disjoint, jointly exhaustive, and a pure
    function of the id — cross-validation rotations (train on k−1
    folds, eval on 1) reproduce bit-identically on any cluster, any
    partitioning, any engine, and appends never reshuffle existing
    rows between folds (the failure mode of randomized fold tools).
    Zero shuffle — a projection."""
    _require_integral_id(df, id_col)
    return df.withColumn(fold_col, F.pmod(knuth_hash(id_col), F.lit(k)))


def label_balanced_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    rank_col: str = "__rank",
) -> DataFrame:
    """Class-balanced downsample: every label keeps exactly
    ``min(class count)`` rows, chosen in deterministic Knuth-hash
    priority order — the classifier-training rebalance that never
    upsamples (no duplicated rows, no synthetic data) and reproduces
    bit-identically across runs and partitionings.

    Scale: ONE shuffle on the label key for the ranking window; the
    global min count re-enters as a broadcast single row (never a
    window over the corpus). Skewed label distributions are exactly the
    input this is for — the output is |labels| × min-count rows."""
    _require_integral_id(df, id_col)
    min_cnt = (
        df.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .agg(F.min("__cnt").alias("__min_cnt"))
    )
    w = Window.partitionBy(label_col).orderBy(knuth_hash(id_col), F.col(id_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        # bcast: const(1) scalar min-count agg
        .join(F.broadcast(min_cnt))
        .filter(F.col(rank_col) <= F.col("__min_cnt"))
        .drop(rank_col, "__min_cnt")
    )


def temperature_rebalance(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    alpha: float = 0.5,
    rate_col: str = "keep_rate_bp",
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-smoothed source rebalance by DOWNSAMPLING: group g
    keeps ``rate_bp(g) = floor(10000 · (min_count / count_g)^α)`` basis
    points of its rows (hash-thresholded, deterministic), flattening
    the source distribution toward uniform as α→1 while never
    upsampling. This is the multilingual/multi-source α-sampling of
    mBERT/XLM-R (exponent-smoothed sampling probabilities), expressed
    as exact per-group keep rates: the smallest group keeps 100%, a
    group 100× larger keeps 10^(−2α) of itself.

    ``weight_col`` switches group mass from row COUNT to an integer SUM
    (token counts — the usual α-sampling denominator: a source of few
    huge documents is as over-represented as one of many small ones).
    Must be an integral column so the mass stays an exact integer.

    α is restricted to {1, 0.5, 0.25} so the power is an exact chain of
    IEEE-correctly-rounded ops (identity / sqrt / sqrt∘sqrt) — the
    rate, and therefore the kept SET, is bit-identical on any engine.
    No float SUM anywhere: the only inputs are the two exact integer
    counts of the group-count relation.

    Scale: one count aggregation (map-side combined); counts and the
    broadcast min re-enter as a tiny dimension joined back by group
    key — the corpus itself never shuffles. Keep/drop is
    ``knuth_hash(id) mod 10000 < rate_bp``."""
    _require_integral_id(df, id_col)
    if alpha == 1.0:
        powered = F.col("__ratio")
    elif alpha == 0.5:
        powered = F.sqrt(F.col("__ratio"))
    elif alpha == 0.25:
        powered = F.sqrt(F.sqrt(F.col("__ratio")))
    else:
        raise ValueError(
            f"alpha must be one of 1, 0.5, 0.25 for cross-engine exact "
            f"powers, got {alpha}"
        )
    mass = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    )
    if weight_col is not None:
        _require_integral_id(df, weight_col)
    counts = df.groupBy(group_col).agg(mass.alias("__cnt"))
    min_cnt = counts.agg(F.min("__cnt").alias("__min_cnt"))
    rates = (
        # bcast: const(1) scalar min-count agg
        counts.join(F.broadcast(min_cnt))
        .withColumn(
            "__ratio", F.col("__min_cnt").cast("double") / F.col("__cnt")
        )
        .select(
            group_col,
            F.floor(F.lit(10_000) * powered).cast("bigint").alias(rate_col),
        )
    )
    # bcast: model(|groups|) mixture-domain rates (caller contract: low-cardinality group domain)
    return df.join(F.broadcast(rates), group_col).filter(
        F.pmod(knuth_hash(id_col), F.lit(10_000)) < F.col(rate_col)
    )


def kcenter_coreset(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset over an embedding column (farthest-point
    traversal — the diversity-sampling construction of Sener &
    Savarese 2018's Core-Set active learning, and the classic 2-approx
    to the k-center objective): seed with the smallest id, then k−1
    times add the point whose distance to its nearest chosen center is
    LARGEST (rounded-d² argmax, smallest-id tie-break — fully
    deterministic, so an unrolled-CTE oracle replays the selection).

    Returns ``(step, vec_id, sep_d2)`` — the selection order and each
    pick's squared separation from the previously-chosen set (NULL for
    the seed). d² expands as ``v·v − 2 v·c + c·c`` with left-to-right
    fold dots, the same IEEE op order DuckDB's ``list_dot_product``
    uses.

    Scale shape: each of the k−1 steps is one broadcast join of the
    ≤k-row center set against the corpus + a map-side-combined min/
    argmax reduce — k linear passes, no |V|² anywhere; the per-step
    1-row collect is the O(k) driver re-entry every greedy traversal
    needs. Meant for coreset/diversity probes where k is tens-to-
    hundreds; at 100 TB you'd run it over the IVF/LSH-shortlisted
    candidate pool, not the raw corpus.
    """
    from covid_data_pipeline_spark.operators.similarity import dot

    spark = df.sparkSession
    v = df.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("dv"),
    )
    seed = v.agg(F.min("__id").alias("m")).collect()[0]["m"]
    chosen: list[tuple[int, int, float | None]] = [(1, seed, None)]
    for step in range(2, k + 1):
        ids = [c[1] for c in chosen]
        cents = v.where(F.col("__id").isin(ids)).select(
            F.col("dv").alias("c_dv")
        )
        d2 = F.round(
            dot(F.col("dv"), F.col("dv"))
            - 2 * dot(F.col("dv"), F.col("c_dv"))
            + dot(F.col("c_dv"), F.col("c_dv")),
            4,
        )
        pick = (
            v.where(~F.col("__id").isin(ids))
            # bcast: model(k) centroid set
            .crossJoin(F.broadcast(cents))
            .groupBy("__id")
            .agg(F.min(d2).alias("mind2"))
            .orderBy(F.col("mind2").desc(), F.col("__id"))
            .limit(1)
            .collect()[0]
        )
        chosen.append((step, pick["__id"], pick["mind2"]))
    return spark.createDataFrame(
        chosen, "step int, vec_id long, sep_d2 double"
    ).withColumnsRenamed({"vec_id": id_col})
