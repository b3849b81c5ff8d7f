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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import let, tokens, word_shingles


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


def _positional_shingles(col: Column | str, k: int) -> Column:
    """Word k-grams WITH their 1-based start position — the positional
    twin of :func:`word_shingles` (same short-doc rule: fewer than ``k``
    tokens collapse to one whole-text gram at position 1). Returns
    ``array<struct<pos:int, g:string>>``."""

    def _grams(t: Column) -> Column:
        n = F.size(t)
        idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
        return F.transform(
            idx,
            lambda i: F.struct(
                i.alias("pos"),
                F.when(n >= k, F.concat_ws(" ", F.slice(t, i, k)))
                .otherwise(F.concat_ws(" ", t))
                .alias("g"),
            ),
        )

    return let(tokens(col), _grams)


def strip_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Cut corpus-repeated token spans OUT of the text (the removal
    counterpart of :func:`boilerplate_fraction`'s scorer — C4 dropped
    repeated lines; Lee et al. 2022 showed span-level dedup beats
    doc-level drops for LM training).

    A word k-gram is *hot* when it occurs in ≥ ``min_df`` DISTINCT
    documents (inter-document repetition only — a phrase repeated inside
    one document is that document's own content and is left alone; see
    ``functions.text.repetition_fraction`` for the intra-doc signal).
    Every occurrence of a hot gram marks its k-token interval; per doc,
    overlapping intervals merge into maximal spans and the surviving
    tokens are re-joined with single spaces (output text is therefore
    whitespace/case-normalized — the same normalization the gram match
    itself uses). Removing ALL occurrences (not keep-first) is the
    deliberate distributed-friendly policy: keep-first needs a global
    occurrence order, i.e. a corpus-wide sort, for marginal benefit on
    web boilerplate, which is noise in every copy.

    Spark-first shape — two corpus-key shuffles, rest map-side:

    - positional grams explode (array built-ins, let-bound split);
    - hot set = count over the distinct (gram, doc) collapse (bounded by
      gram-mass / min_df; no forced broadcast — AQE decides, same
      rationale as :func:`boilerplate_fraction`);
    - hot start positions regroup to one sorted int array per doc, then
      interval merge + token filtering run INSIDE the row as
      higher-order functions (no per-token rows ever shuffle).

    The gram projection is computed twice (hot-set build + position
    join) by design: re-tokenizing is a cheap codegen'd map pass,
    while materializing the exploded gram relation (corpus token mass)
    would cost more in storage/shuffle than it saves — the same
    recompute-over-persist call the plan audit confirms.

    Returns ``(id, clean_text, n_tokens, n_removed, n_spans)``; docs
    with no hot span pass through with normalized text and zeros.
    """
    grams = docs.select(
        id_col, F.explode(_positional_shingles(text_col, k)).alias("x")
    ).select(id_col, F.col("x.pos").alias("pos"), F.col("x.g").alias("g"))
    hot = (
        grams.select("g", id_col)
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("g")
    )
    hot_starts = (
        grams.join(hot, "g")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("pos")).alias("__starts"))
    )
    joined = docs.join(hot_starts, id_col, "left").withColumn(
        "__starts",
        F.coalesce(F.col("__starts"), F.array().cast("array<int>")),
    )

    def _clean(t: Column) -> Column:
        # short docs (< k tokens) have one whole-doc gram: width = n
        def _with_width(w: Column) -> Column:
            removed = F.array_distinct(
                F.flatten(
                    F.transform(
                        F.col("__starts"),
                        lambda s: F.sequence(s, s + w - F.lit(1)),
                    )
                )
            )

            def _assemble(r: Column) -> Column:
                # uniform width ⇒ merged-span count = starts opening past
                # the running end: fold (prev_end, n_spans) over sorted
                # starts (positions are ≥1, so prev_end=0 seeds cleanly)
                n_spans = F.aggregate(
                    F.col("__starts"),
                    F.struct(
                        F.lit(0).alias("prev_end"), F.lit(0).alias("cnt")
                    ),
                    lambda acc, s: F.struct(
                        F.greatest(acc.prev_end, s + w - F.lit(1)).alias(
                            "prev_end"
                        ),
                        (
                            acc.cnt
                            + F.when(s > acc.prev_end, F.lit(1)).otherwise(
                                F.lit(0)
                            )
                        ).alias("cnt"),
                    ),
                    lambda acc: acc.cnt,
                )
                return F.struct(
                    F.concat_ws(
                        " ",
                        F.filter(
                            t,
                            lambda tok, i: ~F.array_contains(
                                r, i + F.lit(1)
                            ),
                        ),
                    ).alias("clean_text"),
                    F.size(t).alias("n_tokens"),
                    F.size(r).alias("n_removed"),
                    n_spans.alias("n_spans"),
                )

            return let(removed, _assemble)

        return let(F.least(F.lit(k), F.size(t)), _with_width)

    return joined.select(
        id_col, let(tokens(text_col), _clean).alias("__o")
    ).select(id_col, "__o.clean_text", "__o.n_tokens", "__o.n_removed", "__o.n_spans")
