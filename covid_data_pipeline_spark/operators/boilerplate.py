"""Inter-document boilerplate detection (C4/RefinedWeb-style).

Web-scale corpora carry phrases repeated across thousands of pages —
navigation chrome, cookie banners, license footers. Intra-document
repetition (``functions.text.repetition_fraction``) cannot see them;
the signal here is CORPUS document-frequency of word k-grams: a
document whose k-grams are mostly corpus-frequent is boilerplate even
if each line appears once in that document (C4 dropped such lines;
Gopher/RefinedWeb gate on the fraction).

Spark-first shape (one corpus pass + one cheap regroup):

- distinct per-doc k-grams via ``word_shingles`` (array built-ins,
  let-bound token split, no UDF) → explode;
- document frequency is a plain ``count(*)`` — the per-doc distinct
  makes it countDistinct(doc) without the distinct-aggregate expand;
- the threshold is an ABSOLUTE document count (C4 dropped any line
  occurring ≥3 times in the corpus — boilerplate is "this exact
  phrasing recurs", not "recurs in a fixed fraction": a footer shared
  by 10k pages is boilerplate whether the corpus is 1M or 1B docs).
  The hot set is bounded by total-gram-mass / min_df, so with a
  production-scale min_df it stays broadcast-able; cap or pre-filter
  if a tiny min_df is ever used at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import word_shingles


def boilerplate_fraction(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_df: int = 3,
) -> DataFrame:
    """Per-document ``(n_grams, boilerplate_frac)``: the fraction of the
    document's distinct word k-grams found in ≥ ``min_df`` documents
    corpus-wide. 0.0 = fully original text, 1.0 = pure boilerplate;
    filter or downweight the high tail.

    ``boilerplate_frac`` is a ratio of small integers (hot / distinct) —
    cross-engine exact; rounded to 4 per float policy anyway.
    """
    grams = docs.select(
        id_col, F.explode(word_shingles(text_col, k)).alias("g")
    )
    hot = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("g")
    )
    # No broadcast hint: the hot set is usually tiny (auto-broadcast),
    # but a degenerate corpus + small min_df can make it gram-mass-sized,
    # where a forced broadcast would OOM the driver — let AQE decide.
    hit = grams.join(hot.withColumn("hot", F.lit(1)), "g", "left")
    return hit.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.round(
            F.sum(F.coalesce(F.col("hot"), F.lit(0)))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("boilerplate_frac"),
    )
