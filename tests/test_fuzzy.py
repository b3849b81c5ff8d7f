"""Edit-distance join (operators/fuzzy.py): symmetric-delete
completeness vs brute force, planted typos, and the hot-bucket cap."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.fuzzy import (
    _deletion_variants,
    edit_distance_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_matches_bruteforce_on_random_corpus(spark):
    """Every pair within distance 2 of a random word corpus must be
    found — the lossless-candidate property of symmetric deletes."""
    rng = random.Random(7)
    base = ["spark", "shuffle", "parquet", "catalyst", "tungsten", "arrow"]
    words = set(base)
    for w in base:  # typo'd variants: substitutions, deletes, inserts
        for _ in range(4):
            i = rng.randrange(len(w))
            words.add(w[:i] + rng.choice("abcxyz") + w[i + 1 :])
            words.add(w[:i] + w[i + 1 :])
            words.add(w[:i] + rng.choice("abcxyz") + w[i:])
    words = sorted(words)
    expected = {
        (a, b, _lev(a, b))
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if _lev(a, b) <= 2
    }
    df = spark.createDataFrame([(w,) for w in words], "name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(df, "name", k=2).collect()
    }
    assert got == expected and len(expected) > 20


def test_k1_finds_only_distance_one(spark):
    df = spark.createDataFrame(
        [("cat",), ("cut",), ("cart",), ("dog",)], "name string"
    )
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(df, "name", k=1).collect()
    }
    assert got == {("cat", "cut", 1), ("cart", "cat", 1)}


def test_variant_counts_bounded(spark):
    """Deletion neighborhood of an n-char string has <= 1 + n + C(n,2)
    distinct members."""
    df = spark.createDataFrame([("abcdefgh",)], "s string")
    n_var = df.select(
        F.size(_deletion_variants(F.col("s"), 2)).alias("n")
    ).first()["n"]
    assert n_var <= 1 + 8 + 8 * 7 // 2


def test_hot_bucket_cap_bounds_degenerate_corpus(spark):
    """1-char strings all delete to '': without the cap that bucket is
    quadratic; with a tiny cap the join stays bounded and correct pairs
    among longer strings still surface."""
    rows = [(c,) for c in "abcdefghijklmnopqrstuvwxyz"] + [
        ("shuffle",),
        ("shuffl",),
    ]
    df = spark.createDataFrame(rows, "name string")
    out = edit_distance_pairs(df, "name", k=2, max_bucket=5).collect()
    assert ("shuffl", "shuffle", 1) in {
        (r["name_a"], r["name_b"], r["dist"]) for r in out
    }
    # single chars are pairwise distance<=2 but their '' bucket (26 rows)
    # is over the cap; pairs can still appear via 1-char variants, so
    # just assert the result stayed far below the 325 all-pairs blowup
    assert len(out) < 200
