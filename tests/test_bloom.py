"""Portable Bloom prefilter (`operators/bloom.py`).

The bloom_prefilter_orders oracle row verifies the exact cross-engine
bit behavior; these tests pin the operator guarantees: zero false
negatives (for ANY member set), a shuffle-free probe plan, and the
dense word layout.
"""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    bloom_prefilter,
)


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "k BIGINT")


def test_no_false_negatives(spark):
    members = list(range(0, 500, 7))  # 72 keys
    words = bloom_build(_keys(spark, members), "k", m_words=8, k=3)
    got = (
        _keys(spark, members)
        .where(bloom_contains(F.col("k"), words, k=3))
        .count()
    )
    assert got == len(members)  # every member MUST pass


def test_nonmembers_mostly_rejected(spark):
    members = list(range(100))
    words = bloom_build(_keys(spark, members), "k", m_words=32, k=3)
    probe = _keys(spark, range(10_000, 20_000))
    passed = probe.where(bloom_contains(F.col("k"), words, k=3)).count()
    # 2016 bits / 100 keys / k=3 -> fp ~ 0.3%; generous determinstic cap
    assert passed < 300


def test_word_layout_dense_and_bounded(spark):
    words = bloom_build(_keys(spark, range(10)), "k", m_words=4, k=2)
    assert len(words) == 4
    assert all(isinstance(w, int) and w >= 0 for w in words)
    assert any(w != 0 for w in words)


def test_prefilter_flag_matches_contains(spark):
    members = _keys(spark, [1, 2, 3])
    probe = _keys(spark, range(10)).withColumnRenamed("k", "pk")
    flagged = bloom_prefilter(probe, "pk", members, "k", m_words=4, k=2)
    words = bloom_build(members, "k", m_words=4, k=2)
    expect = {
        r["pk"]: r["m"]
        for r in probe.select(
            "pk", bloom_contains(F.col("pk"), words, k=2).alias("m")
        ).collect()
    }
    got = {r["pk"]: r["bloom_maybe"] for r in flagged.collect()}
    assert got == expect
    assert all(got[k] for k in (1, 2, 3))


def test_probe_plan_is_shuffle_free(spark):
    members = _keys(spark, range(20))
    words = bloom_build(members, "k", m_words=8, k=3)
    probe = _keys(spark, range(1000)).where(
        bloom_contains(F.col("k"), words, k=3)
    )
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side filter


def test_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        bloom_build(_keys(spark, [1]), "k", m_words=0, k=3)
    with pytest.raises(ValueError):
        bloom_build(_keys(spark, [1]), "k", m_words=4, k=0)


def test_no_false_negatives_property(spark):
    """Hypothesis over arbitrary member sets: EVERY member must pass —
    the operator contract that makes the exact post-join optional-only
    for semantics, mandatory only for precision."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**40), max_value=2**40),
            min_size=1,
            max_size=60,
            unique=True,
        ),
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=5),
    )
    def inner(ids, m_words, k):
        from covid_data_pipeline_spark.operators.bloom import (
            bloom_build,
            bloom_contains,
        )

        members = _keys(spark, ids)
        words = bloom_build(members, "k", m_words=m_words, k=k)
        passed = members.where(
            bloom_contains(F.col("k"), words, k=k)
        ).count()
        assert passed == len(ids)

    inner()
