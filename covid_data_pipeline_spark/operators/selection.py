"""Targeted data selection via hashed n-gram importance weights (DSIR).

Implements the importance-resampling selector of Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"
(NeurIPS 2023, public): score every raw document by how much more
likely it is under a bag-of-hashed-n-grams model of a small *target*
corpus than under the same model of the raw corpus, then keep the
top-weighted documents. This is the standard recipe for steering a
100 TB crawl toward a quality domain (Wikipedia+books in the paper)
without training a classifier.

Scale posture — every stage is bounded by design:

* feature extraction is a narrow explode (tokens + bigrams) followed by
  ONE partial-aggregated shuffle whose key space is ``n_buckets``
  (default 4096), not the vocabulary;
* both n-gram models are ``n_buckets`` rows — broadcast back to the
  per-document feature table, so scoring is a map-side join plus a
  groupBy(doc) sum;
* no Python row path anywhere: hashing is md5-prefix arithmetic
  (portable across engines), log-probs are JVM built-ins.

Determinism contract (what makes the DuckDB oracle possible): bucket
ids come from :func:`operators.dedup.portable_hash31`, and log-probs
are scaled to BIGINT micro-nats (``round(ln(p) * 1e6)``) *before* the
per-document weighted sum — so the hot-path accumulation is exact
integer arithmetic, immune to cross-engine float summation order. Only
the final display division is floating point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.scalar import round_stable

from covid_data_pipeline_spark.functions.text import tokens
from covid_data_pipeline_spark.operators.dedup import portable_hash31

LOG_SCALE = 1_000_000  # micro-nats: BIGINT-exact log-prob accumulation


def _grams(text_col: Column) -> Column:
    """Unigrams + space-joined bigrams of the whitespace tokens, as one
    array — the hashed feature space of DSIR §3.1 (they use unigrams and
    bigrams of words)."""
    t = tokens(text_col)
    n = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(t, F.lit(1), n),
        F.slice(t, F.lit(2), n),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(t, bigrams)


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    carry: Column | None = None,
) -> DataFrame:
    """Per-document hashed n-gram bucket counts: ``(id, bucket, cnt)``.

    One explode + one count shuffle; downstream consumers aggregate the
    same relation, so a 100 TB run computes features once and reuses
    them for both model fitting and scoring.

    ``carry`` (r11): an optional per-document column (e.g. the DSIR
    ``is_target`` flag) carried through the pass as ``is_t`` — it rides
    the same grouping key (constant within a document, so groups are
    unchanged), which lets :func:`dsir_weights` fit its models off this
    relation directly instead of scanning the corpus a second time just
    to re-derive the flag.
    """
    cols = [F.col(id_col)]
    keys = [id_col, "bucket"]
    if carry is not None:
        cols.append(carry.alias("is_t"))
        keys.append("is_t")
    return (
        df.select(*cols, F.explode(_grams(F.col(text_col))).alias("g"))
        .withColumn("bucket", portable_hash31(F.col("g")) % n_buckets)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_log_prob_models(
    feats: DataFrame,
    is_target: Column,
    n_buckets: int = 4096,
) -> DataFrame:
    """Fit BOTH bag-of-buckets models in one pass over the feature
    table: add-one-smoothed log-probs of each bucket under the target
    slice (rows where ``is_target``) and under the full raw corpus.

    Returns ``n_buckets`` rows ``(bucket, lpt, lpr)`` where the
    log-probs are BIGINT micro-nats. Every bucket of the domain is
    present (smoothing gives absent buckets mass too), via a
    ``spark.range`` left join — a metadata-only relation, no data scan.
    """
    spark = feats.sparkSession
    per_bucket = (
        feats.withColumn("is_t", is_target)
        .groupBy("bucket")
        .agg(
            F.sum("cnt").alias("raw_cnt"),
            F.sum(
                F.when(F.col("is_t"), F.col("cnt")).otherwise(F.lit(0))
            ).alias("tgt_cnt"),
        )
        # ≤ n_buckets rows, but it feeds BOTH the totals aggregate and
        # the domain join, and each reference re-runs the full feature
        # pass upstream (Catalyst shares no subtrees) — cut the lineage
        # so the corpus-sized aggregation happens once.
        .localCheckpoint(eager=False)
    )
    totals = per_bucket.agg(
        F.sum("raw_cnt").alias("raw_tot"), F.sum("tgt_cnt").alias("tgt_tot")
    )
    domain = spark.range(n_buckets).select(F.col("id").alias("bucket"))

    def _lp(cnt: Column, tot: Column) -> Column:
        # identical op order to the oracle SQL: (cnt+1)/(tot+B) then ln
        p = (cnt + F.lit(1.0)) / (tot + F.lit(float(n_buckets)))
        return F.round(F.log(p) * LOG_SCALE, 0).cast("long")

    return (
        domain.join(per_bucket, "bucket", "left")
        # bcast: const(1) scalar totals agg
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            _lp(F.coalesce(F.col("tgt_cnt"), F.lit(0)), F.col("tgt_tot")).alias(
                "lpt"
            ),
            _lp(F.coalesce(F.col("raw_cnt"), F.lit(0)), F.col("raw_tot")).alias(
                "lpr"
            ),
        )
    )


def dsir_log_weights(
    feats: DataFrame,
    models: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance log-weight ``log p_target(x) − p_raw(x)``
    under the hashed n-gram models: ``(id, weight_micro)`` with the
    weight in exact BIGINT micro-nats. Broadcast join (models are
    ``n_buckets`` rows) + one groupBy(id) integer sum."""
    return (
        # bcast: model(n_buckets) hashed n-gram models
        feats.join(F.broadcast(models), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * (F.col("lpt") - F.col("lpr"))).alias(
                "weight_micro"
            )
        )
    )


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """End-to-end DSIR scoring: hashed features → one-pass dual model →
    per-document log importance weight (``dsir_log_weight``, DOUBLE,
    rounded to 4 — the display value; selection should use it with the
    id as tie-break). Input rows where ``is_target`` holds define the
    target distribution; all rows define the raw distribution."""
    # The feature relation feeds both model fitting and scoring; cut the
    # lineage so the n-gram explode + count shuffle runs once (the reuse
    # the docstring above promises — Catalyst alone re-executes the
    # subtree per consumer). Compact (id, is_t, bucket, cnt) rows.
    # The is_target flag is CARRIED THROUGH the feature pass (r11,
    # VERDICT r10 ask #5): it is constant per document, so adding it to
    # the grouping key changes no group — and model fitting no longer
    # needs a second corpus scan + join just to re-derive the flag
    # (after-plan: documents scanned once, was twice).
    feats = hashed_ngram_counts(
        df, id_col, text_col, n_buckets, carry=is_target
    ).localCheckpoint(eager=False)
    models = ngram_log_prob_models(
        feats.select("bucket", "cnt", "is_t"),
        F.col("is_t"),
        n_buckets,
    )
    w = dsir_log_weights(feats, models, id_col)
    return w.select(
        id_col,
        round_stable(F.col("weight_micro") / F.lit(float(LOG_SCALE)), 4).alias(
            "dsir_log_weight"
        ),
    )


def dsir_select_topk(
    df: DataFrame,
    is_target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Keep the ``k`` raw documents most target-like by DSIR weight
    (deterministic tie-break on id — the paper's Gumbel-noise variant
    is a cheap extension but breaks reproducibility). TakeOrdered
    top-k, not a global sort: no full shuffle at any scale."""
    w = dsir_weights(df, is_target, id_col, text_col, n_buckets)
    picked = w.orderBy(F.col("dsir_log_weight").desc(), F.col(id_col)).limit(k)
    return df.join(picked, id_col)
