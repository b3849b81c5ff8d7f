"""Property tests pinning word_shingles' value semantics against a pure
Python reference (written for the r11 zip_with-doubling experiment —
the swap itself was REVERTED on measurement, 2.18x slower at k=8, see
the in-code note in functions/text.py — but the exhaustive NULL /
short-string / duplicate pins stay: five operators share word_shingles
(minhash dedup ×3, decontaminate, strip_duplicate_spans) and any future
rewrite must hold these)."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import word_shingles


def _py_shingles(text: str | None, k: int) -> list[str]:
    """Reference semantics, modelling tokens() EXACTLY:
    split(trim(lower(text)), '\\s+') where trim strips SPACES only (so
    a trailing tab/newline leaves an empty trailing token — the real,
    pinned behavior) and split keeps empty fields; < k tokens → one
    whole-document gram; else distinct k-grams in first-occurrence
    order."""
    import re

    s = (text or "").lower().strip(" ")
    toks = re.split(r"\s+", s)
    if len(toks) < k:
        return [" ".join(toks)]
    seen: list[str] = []
    have = set()
    for i in range(len(toks) - k + 1):
        g = " ".join(toks[i : i + k])
        if g not in have:
            have.add(g)
            seen.append(g)
    return seen


def _spark_shingles(spark, texts: list[str | None], k: int):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = (
        df.select("i", word_shingles(F.col("t"), k).alias("sh"))
        .orderBy("i")
        .collect()
    )
    return [r["sh"] for r in rows]


# word-ish and adversarial fragments: unicode, punctuation, repeats,
# lone spaces, tabs/newlines (tokens() splits on whitespace runs)
_frag = st.one_of(
    st.text(alphabet="ab λ√", min_size=0, max_size=4),
    st.sampled_from(["the", "the the", "  ", "\t", "\n", "a-b.c", "ß", ""]),
)
_texts = st.lists(
    st.one_of(st.none(), st.lists(_frag, max_size=12).map(" ".join)),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts, k=st.integers(min_value=1, max_value=9))
def test_word_shingles_matches_python_reference(spark, texts, k):
    got = _spark_shingles(spark, texts, k)
    for t, sh in zip(texts, got):
        assert sh == _py_shingles(t, k)


@pytest.mark.parametrize("k", [2, 3, 5, 8])
def test_edges_null_empty_short_exact(spark, k):
    """The named edge classes, deterministically: NULL text, empty text,
    whitespace-only, exactly k-1 / k / k+1 tokens, and duplicate grams
    (array_distinct first-occurrence order)."""
    texts = [
        None,
        "",
        "   ",
        " ".join(f"w{i}" for i in range(k - 1)),
        " ".join(f"w{i}" for i in range(k)),
        " ".join(f"w{i}" for i in range(k + 1)),
        " ".join(["x"] * (3 * k)),  # all-duplicate grams
        "a " * (2 * k) + "b",
    ]
    got = _spark_shingles(spark, texts, k)
    for t, sh in zip(texts, got):
        assert sh == _py_shingles(t, k)
