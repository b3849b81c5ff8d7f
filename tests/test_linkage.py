"""Fellegi-Sunter linkage scoring (`operators/linkage.py`) on
hand-checkable labeled pairs.

The linkage_fs_scores oracle row verifies cross-engine equality at
sf0.01; these pin the semantics: Laplace-smoothed m/u from the labels,
agreement weights positive for discriminative fields, disagreement
weights negative, score = exact integer sum."""

from __future__ import annotations

import math

import pytest

from covid_data_pipeline_spark.operators.linkage import fs_linkage_scores


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "id_a BIGINT, id_b BIGINT, f1 BOOLEAN, f2 BOOLEAN, m BOOLEAN"
    )


def test_weights_match_python_reference(spark):
    rows = [
        # matches mostly agree on f1; non-matches mostly disagree
        (1, 2, True, True, True),
        (3, 4, True, False, True),
        (5, 6, True, True, True),
        (7, 8, False, False, False),
        (9, 10, False, True, False),
        (11, 12, False, False, False),
        (13, 14, True, False, False),
    ]
    out = {
        (r["id_a"], r["id_b"]): r["score_micro"]
        for r in fs_linkage_scores(
            _pairs(spark, rows), "m", ["f1", "f2"]
        ).collect()
    }

    nm = sum(1 for r in rows if r[4])
    nu = len(rows) - nm

    def w(cm, cu, agree):
        if agree:
            return round(math.log((cm + 1) * (nu + 2) / ((nm + 2) * (cu + 1))) * 1e6)
        return round(
            math.log((nm + 1 - cm) * (nu + 2) / ((nm + 2) * (nu + 1 - cu))) * 1e6
        )

    cm1 = sum(1 for r in rows if r[4] and r[2])
    cu1 = sum(1 for r in rows if not r[4] and r[2])
    cm2 = sum(1 for r in rows if r[4] and r[3])
    cu2 = sum(1 for r in rows if not r[4] and r[3])
    for ia, ib, f1, f2, m in rows:
        want = w(cm1, cu1, f1) + w(cm2, cu2, f2)
        assert out[(ia, ib)] == want, (ia, ib)
    # discriminative field: agreeing must beat disagreeing
    assert w(cm1, cu1, True) > 0 > w(cm1, cu1, False)


def test_all_agree_field_stays_finite(spark):
    rows = [(1, 2, True, True, True), (3, 4, True, False, False)]
    out = fs_linkage_scores(_pairs(spark, rows), "m", ["f1", "f2"]).collect()
    assert all(r["score_micro"] is not None for r in out)

    with pytest.raises(ValueError):
        fs_linkage_scores(_pairs(spark, rows), "m", [])
