"""Feature hashing (the "hashing trick", Weinberger et al. ICML'09):
project a variable vocabulary into a FIXED-dimension vector with a hash
— no vocabulary dictionary to build, broadcast, or keep consistent
across training runs, which is exactly what makes it the featurizer of
choice for streaming/appended corpora at warehouse scale (a dictionary
featurizer needs a global vocab pass + a broadcast that grows with the
corpus; the hash needs neither).

Each token t lands in slot ``h(t) mod dim`` with sign ``±1`` drawn from
an independent hash bit; signed collisions cancel in expectation, which
bounds the inner-product distortion (the paper's unbiasedness result).

Hash portability (the repo's cross-engine contract): ``h(t)`` is the
first 15 hex chars of md5 as an integer — Spark
``conv(substring(md5(x),1,15),16,10)`` equals DuckDB
``CAST('0x' || substr(md5(x),1,15) AS BIGINT)`` — so the exact same
vectors are derivable in plain SQL, and the oracle hash-verifies every
coordinate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import tokens


def portable_token_hash(col: Column | str) -> Column:
    """First 15 md5 hex chars as a non-negative BIGINT (fits signed 64;
    same value as the DuckDB expression above)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

def feature_hash_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 32,
) -> DataFrame:
    """Hash each document's whitespace tokens into a ``dim``-dimensional
    signed-count vector: slot ``h mod dim``, sign ``+1/-1`` from the
    next hash bit (``(h div dim) mod 2``), coordinate = Σ sign·count.

    Returns (id_col, n_tokens, features array<double> — integer-valued,
    so cross-engine exact).

    Scale shape: explode → ONE (doc, slot) hash-shuffle aggregate with
    map-side combine (at most ``dim`` rows survive per doc however long
    the doc), then one per-doc regroup assembles the dense array via a
    slot->value map lookup over ``sequence(0, dim-1)`` — no vocabulary
    relation, no broadcast, nothing proportional to vocab size
    anywhere."""
    toks = df.select(
        id_col, F.explode(tokens(text_col)).alias("tok")
    )
    h = portable_token_hash("tok")
    slotted = toks.select(
        id_col,
        (h % dim).alias("slot"),
        # (h div dim) mod 2 without float division: for h >= 0 the
        # parity of floor(h/dim) equals [h mod 2*dim >= dim]
        F.when((h % (2 * dim)) >= dim, F.lit(-1))
        .otherwise(F.lit(1))
        .alias("sign"),
    )
    per_slot = slotted.groupBy(id_col, "slot").agg(
        F.sum("sign").cast("double").alias("val"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_slot.groupBy(id_col)
        .agg(
            F.sum("n").alias("n_tokens"),
            F.map_from_entries(
                F.collect_list(F.struct("slot", "val"))
            ).alias("__m"),
        )
        .select(
            id_col,
            "n_tokens",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i.cast("long")), F.lit(0.0)
                ),
            ).alias("features"),
        )
    )


def woe_encoding(
    df: DataFrame,
    cat_col: str,
    label_col: str,
) -> DataFrame:
    """Weight-of-Evidence encoding + Information Value — the
    credit-scoring / feature-engineering primitive that turns a
    categorical column into a supervised log-odds score and ranks the
    column's predictive power (Siddiqi, *Credit Risk Scorecards*):

        WOE_v = ln( P(v | good) / P(v | bad) )
        IV    = sum_v (P(v|good) - P(v|bad)) * WOE_v

    Exactness: per-value good/bad counts are one map-side-combining
    rollup; with Laplace smoothing each WOE is ONE IEEE
    ``ln(int_product / int_product)`` rounded to integer micro-nats
    (the DSIR/Fellegi-Sunter construction), and the IV term combines
    the same integers in a single deterministic expression. NULL
    category is its own value (a half-null feature must not look
    predictive by accident).

    Returns one row per category value: ``(cat_col, n_good, n_bad,
    woe_micro, iv_term)`` — ``sum(iv_term)`` is the column's IV; the
    model is |values|-sized, never corpus-sized."""
    lab = F.col(label_col).cast("boolean")
    # NULL label rows count toward neither class (WHEN null -> otherwise)
    rolled = df.groupBy(cat_col).agg(
        F.sum(F.when(lab, 1).otherwise(0)).alias("n_good"),
        F.sum(F.when(~lab, 1).otherwise(0)).alias("n_bad"),
    )
    tot = rolled.agg(
        F.sum("n_good").alias("_g"), F.sum("n_bad").alias("_b")
    )
    # bcast: const(1) scalar totals
    j = rolled.crossJoin(F.broadcast(tot))
    num = (F.col("n_good") + 1) * (F.col("_b") + 2)
    den = (F.col("n_bad") + 1) * (F.col("_g") + 2)
    woe_micro = F.round(
        F.log(num.cast("double") / den.cast("double")) * 1e6, 0
    ).cast("bigint")
    from covid_data_pipeline_spark.functions.scalar import round_stable

    # (g_v/G - b_v/B) * woe — one deterministic IEEE expression over
    # the exact integers; signed, so round_stable. try_divide: a
    # single-class input (_g or _b = 0) must yield NULL iv_term, not
    # Infinity/NaN (ADVICE r8; same policy as t_closeness).
    iv_term = round_stable(
        (
            F.try_divide(
                F.col("n_good").cast("double"), F.col("_g").cast("double")
            )
            - F.try_divide(
                F.col("n_bad").cast("double"), F.col("_b").cast("double")
            )
        )
        * (woe_micro.cast("double") / 1e6),
        6,
    )
    return j.select(
        cat_col,
        F.col("n_good").cast("bigint").alias("n_good"),
        F.col("n_bad").cast("bigint").alias("n_bad"),
        woe_micro.alias("woe_micro"),
        iv_term.alias("iv_term"),
    )


def loo_target_encoding(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    prior_weight: int = 10,
    out_col: str = "enc",
) -> DataFrame:
    """Leave-one-out target encoding with additive prior smoothing
    (Micci-Barreca, SIGKDD Expl. 2001) — the supervised categorical
    encoder that, unlike plain mean encoding, cannot leak a row's own
    label into its feature:

        enc_i = (S_v - y_i + w * GM) / (n_v - 1 + w)

    for row i in value group v, with S_v/n_v the group's target
    sum/count, GM the global target mean, and w the prior weight
    (w > 0 also makes singleton groups well-defined: they encode to
    exactly GM). ``target_col`` must be INTEGRAL (cents, micro-units,
    0/1 labels — the caller scales), so S_v, y_i, n_v are exact BIGINT
    and the encoding is ONE deterministic IEEE expression over exact
    integers plus the single shared division GM — bit-replayable in
    any SQL engine (the WOE/DSIR lattice rule). Appends ``out_col``
    (4dp, round_stable: a signed target can round to -0.0).

    NULL-category contract (ADVICE r9): rows whose ``cat_col`` is NULL
    are NOT dropped — NULL is a first-class category (the groupBy
    already forms a NULL group; the join back is null-safe), so all
    NULL-category rows are leave-one-out encoded against each other,
    exactly as an unseen-but-shared level should be.

    Scale shape: one map-side-combining rollup to |values| + one
    broadcast scalar + one co-partitioned equi-join back to the rows;
    no window over the corpus. The null-safe equality (``<=>``) keeps
    the same shuffle hash-partitioning as plain ``=`` (NULL hashes to
    one partition like any other key)."""
    if prior_weight <= 0:
        raise ValueError(f"prior_weight must be > 0, got {prior_weight}")
    from covid_data_pipeline_spark.functions.scalar import round_stable

    y = F.col(target_col).cast("bigint")
    per_v = df.groupBy(cat_col).agg(
        F.sum(y).alias("_sv"), F.count(y).alias("_nv")
    ).withColumnRenamed(cat_col, "_loo_cat")
    tot = df.agg(
        F.sum(y).alias("_st"), F.count(y).alias("_nt")
    )
    gm = F.col("_st").cast("double") / F.col("_nt").cast("double")
    w = int(prior_weight)
    enc = (
        (F.col("_sv") - y).cast("double") + F.lit(float(w)) * gm
    ) / (F.col("_nv") - 1 + w).cast("double")
    return (
        # eqNullSafe: the NULL-category group joins back to its rows
        # instead of silently vanishing through `=`'s NULL-inequality.
        df.join(per_v, F.col(cat_col).eqNullSafe(F.col("_loo_cat")), "left")
        # bcast: const(1) scalar global-mean agg
        .crossJoin(F.broadcast(tot))
        .withColumn(out_col, round_stable(enc, 4))
        .drop("_loo_cat", "_sv", "_nv", "_st", "_nt")
    )
