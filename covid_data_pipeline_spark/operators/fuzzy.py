"""Fuzzy (edit-distance) self-join — entity resolution's core operator.

Finding all string pairs within Levenshtein distance k is quadratic if
done naively and Spark has no native fuzzy join. The scale path here is
the symmetric-delete (SymSpell) scheme: if ``lev(a, b) <= k`` then the
sets of strings obtainable by deleting up to k characters from ``a``
and from ``b`` intersect — so generating each string's
deletion neighborhood (O(n^k) short variants, n = string length),
equi-joining on the variants, and verifying survivors with the exact
``levenshtein`` built-in finds EVERY qualifying pair while only ever
executing hash joins. Work is proportional to true near-matches per
bucket, not |S|^2.

The deletion neighborhood is built entirely in column algebra
(``sequence``/``transform``/``filter`` + ``substring``), so candidate
generation stays in whole-stage codegen — no UDF. Degenerate inputs
(many very short strings collapsing onto the same variant) are bounded
by the same hot-bucket cap policy as the LSH dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _deletion_variants(s: Column, k: int) -> Column:
    """All strings obtainable from ``s`` by deleting up to ``k`` (0, 1
    or 2 supported) characters, as a distinct array. Pure column
    algebra; ``filter`` guards the descending-``sequence`` trap when a
    range is empty."""
    if k not in (1, 2):
        raise ValueError("edit distance k of 1 or 2 supported")
    n = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
    del1 = F.transform(
        idx,
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1), F.substring(s, i + 1, n)
        ),
    )
    parts = [F.array(s), del1]
    if k == 2:
        del2 = F.flatten(
            F.transform(
                idx,
                lambda i: F.transform(
                    F.filter(idx, lambda j: j > i),
                    lambda j: F.concat(
                        F.substring(s, F.lit(1), i - 1),
                        F.substring(s, i + 1, j - i - 1),
                        F.substring(s, j + 1, n),
                    ),
                ),
            )
        )
        parts.append(del2)
    return F.array_distinct(F.concat(*parts))


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    k: int = 2,
    max_bucket: int = 10_000,
) -> DataFrame:
    """All distinct pairs of ``text_col`` values with
    ``levenshtein <= k``, as ``(name_a, name_b, dist)`` with
    ``name_a < name_b``.

    Plan shape: variant explode (bounded, O(len^k) per string) →
    self-equi-join on the variant (hash join) → distinct candidate
    pairs → exact ``levenshtein`` verify. ``max_bucket`` drops
    pathological variant buckets (e.g. thousands of 1-char strings all
    deleting to "") the same way the LSH band join caps hot buckets —
    correctness on planted pairs is tested, and the cap only bites on
    degenerate corpora.
    """
    names = df.select(F.col(text_col).alias("name")).distinct()
    exploded = names.select(
        "name", F.explode(_deletion_variants(F.col("name"), k)).alias("variant")
    )
    w = Window.partitionBy("variant")
    capped = (
        exploded.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("__bucket_n") <= max_bucket)
        .drop("__bucket_n")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    cand = (
        a.join(b, on="variant")
        .where(F.col("a.name") < F.col("b.name"))
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.withColumn("dist", dist).filter(F.col("dist") <= k)
