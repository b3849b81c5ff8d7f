"""Dataset card: the one-page documentation artifact a training run
ships with its corpus (Gebru et al., "Datasheets for Datasets", 2018 —
the numbers section).

`build_dataset_card` computes every headline statistic in TWO corpus
passes — one projection-and-aggregate pass for all scalar signals
(token counts, language/source distributions, quality, PII, length
percentiles ride a single groupBy ladder), plus one exact-dup pass
(normalized-fingerprint groupBy) — and collects only final aggregates
(a few hundred scalars). No per-document data ever reaches the driver,
so the same call documents a 500-row fixture or a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import (
    PII_PATTERNS,
    lang_id,
    normalized_text,
    quality_score,
    token_count,
)


def build_dataset_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
) -> dict:
    """Return the card as a JSON-shaped dict:

    ``totals`` (docs, tokens, chars), ``by_lang`` / ``by_source``
    (declared-metadata doc/token shares), ``detected_lang_agreement``
    (share of docs whose heuristic language id matches the declared
    one), ``length_tokens`` (min/p25/p50/p75/max), ``quality``
    (mean/min/max score, share below 0.5), ``pii_docs_pct`` (docs with
    ≥1 PII pattern hit), ``exact_dup_pct`` (docs whose normalized text
    occurs more than once).
    """
    pii_hit = F.lit(False)
    for pat, _repl in PII_PATTERNS:
        pii_hit = pii_hit | (F.regexp_count(F.col(text_col), F.lit(pat)) > 0)

    enriched = docs.select(
        F.col(id_col),
        F.col(lang_col),
        F.col(source_col),
        token_count(F.col(text_col)).alias("__tok"),
        F.length(F.col(text_col)).alias("__chars"),
        quality_score(F.col(text_col)).alias("__q"),
        (lang_id(F.col(text_col)) == F.col(lang_col)).alias("__lang_ok"),
        pii_hit.alias("__pii"),
        normalized_text(F.col(text_col)).alias("__norm"),
    )

    total = enriched.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("__tok").alias("tokens"),
        F.sum("__chars").alias("chars"),
        F.min("__tok").alias("tok_min"),
        F.expr("percentile(__tok, array(0.25, 0.5, 0.75))").alias("tok_pcts"),
        F.max("__tok").alias("tok_max"),
        F.round(F.avg("__q"), 4).alias("q_mean"),
        F.round(F.min("__q"), 4).alias("q_min"),
        F.round(F.max("__q"), 4).alias("q_max"),
        F.sum(F.when(F.col("__q") < 0.5, 1).otherwise(0)).alias("q_low"),
        F.sum(F.col("__pii").cast("long")).alias("pii_docs"),
        F.sum(F.col("__lang_ok").cast("long")).alias("lang_ok"),
    ).collect()[0]

    def _dist(col: str) -> dict:
        rows = (
            enriched.groupBy(col)
            .agg(F.count(F.lit(1)).alias("docs"), F.sum("__tok").alias("tokens"))
            .collect()
        )
        return {
            r[col]: {"docs": r["docs"], "tokens": r["tokens"]} for r in rows
        }

    dup_docs = (
        enriched.groupBy("__norm")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("d"))
        .collect()[0]["d"]
    )

    n = total["docs"] or 1
    return {
        "totals": {
            "docs": total["docs"],
            "tokens": total["tokens"],
            "chars": total["chars"],
        },
        "by_lang": _dist(lang_col),
        "by_source": _dist(source_col),
        "detected_lang_agreement_pct": round(100 * total["lang_ok"] / n, 2),
        "length_tokens": {
            "min": total["tok_min"],
            "p25": total["tok_pcts"][0],
            "p50": total["tok_pcts"][1],
            "p75": total["tok_pcts"][2],
            "max": total["tok_max"],
        },
        "quality": {
            "mean": total["q_mean"],
            "min": total["q_min"],
            "max": total["q_max"],
            "below_0_5_pct": round(100 * total["q_low"] / n, 2),
        },
        "pii_docs_pct": round(100 * total["pii_docs"] / n, 2),
        "exact_dup_pct": round(100 * dup_docs / n, 2),
    }
