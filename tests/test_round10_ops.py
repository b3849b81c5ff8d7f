"""Hand-value tests for the round-10 statistics/evaluation operators:
Cohen's kappa, Jensen-Shannon divergence, Cramér's V matrix, entropy
profile, expected calibration error, Dunning G² collocations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_cohens_kappa_textbook(spark):
    """Classic 2x2: confusion [[20,5],[10,15]] -> po=0.7, pe=0.5,
    kappa=0.4 exactly."""
    from covid_data_pipeline_spark.operators.experiment import cohens_kappa

    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert (r["n"], r["n_classes"]) == (50, 2)
    assert r["po"] == 0.7 and r["pe"] == 0.5 and r["kappa"] == 0.4


def test_cohens_kappa_degenerate_and_nulls(spark):
    """Single shared class: pe=1 -> kappa NULL via try_divide; NULL
    labels excluded."""
    from covid_data_pipeline_spark.operators.experiment import cohens_kappa

    df = spark.createDataFrame(
        [("x", "x"), ("x", "x"), ("x", None)], "a STRING, b STRING"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 2 and r["po"] == 1.0 and r["kappa"] is None


def test_js_divergence_zero_and_hand_value(spark):
    """A group distributed exactly like the corpus scores 0; a
    disjoint-bin pair scores the hand-computed JSD."""
    from covid_data_pipeline_spark.operators.experiment import js_divergence

    # two groups with IDENTICAL distributions -> global == each -> 0
    same = [("a", b) for b in (1, 1, 2)] + [("b", b) for b in (1, 1, 2)]
    df = spark.createDataFrame(same, "g STRING, bin INT")
    out = {r["g"]: r for r in js_divergence(df, "g", "bin").collect()}
    assert out["a"]["jsd_nano"] == 0 and out["b"]["jsd"] == 0.0

    # group a: all bin 1; group b: all bin 2 (equal sizes)
    df2 = spark.createDataFrame(
        [("a", 1)] * 4 + [("b", 2)] * 4, "g STRING, bin INT"
    )
    out2 = {r["g"]: r for r in js_divergence(df2, "g", "bin").collect()}

    def ref(group_bins, glob, ng, nt):
        total = 0
        for b in glob:
            p = group_bins.get(b, 0) / ng
            q = glob[b] / nt
            m = (p + q) / 2.0
            t = (
                (p * math.log(p / m) if p > 0 else 0.0)
                + (q * math.log(q / m) if q > 0 else 0.0)
            ) / 2.0
            total += int(round(t * 1e9))
        return total

    glob = {1: 4, 2: 4}
    want_a = ref({1: 4}, glob, 4, 8)
    assert out2["a"]["jsd_nano"] == want_a
    assert out2["a"]["jsd"] == round(want_a / 1e9, 6)
    assert out2["a"]["jsd_nano"] == out2["b"]["jsd_nano"]


def test_cramers_v_matrix_hand_values(spark):
    """Perfect association -> V=1; a constant column -> V NULL with
    dof 0."""
    from covid_data_pipeline_spark.operators.quality import cramers_v_matrix

    rows = [(str(i % 2), str(i % 2), "const") for i in range(40)]
    df = spark.createDataFrame(rows, "x STRING, y STRING, k STRING")
    got = {(r["col_x"], r["col_y"]): r.asDict()
           for r in cramers_v_matrix(df, ["x", "y", "k"]).collect()}
    xy = got[("x", "y")]
    # chi2 for a perfect 2x2 association == n
    assert xy["n"] == 40 and xy["chi2"] == 40.0 and xy["dof"] == 1
    assert xy["v"] == 1.0
    xk = got[("x", "k")]
    assert xk["dof"] == 0 and xk["v"] is None
    with pytest.raises(ValueError):
        cramers_v_matrix(df, ["x"])


def test_entropy_profile_hand_values(spark):
    """Uniform over 4 values -> ln 4 and norm 1; constant -> 0 with
    norm NULL; NULLs count as a category."""
    from covid_data_pipeline_spark.operators.quality import entropy_profile

    rows = [(str(i % 4), "c", None if i % 2 == 0 else "v")
            for i in range(8)]
    df = spark.createDataFrame(rows, "u STRING, k STRING, h STRING")
    got = {r["col_name"]: r.asDict()
           for r in entropy_profile(df, ["u", "k", "h"]).collect()}
    u = got["u"]
    assert u["n"] == 8 and u["n_distinct"] == 4
    assert u["entropy"] == round(math.log(4), 6)
    assert u["norm_entropy"] == 1.0
    k = got["k"]
    assert k["n_distinct"] == 1 and k["entropy"] == 0.0
    assert k["norm_entropy"] is None
    h = got["h"]  # NULL is a category: {NULL: 4, 'v': 4} -> ln 2
    assert h["n"] == 8 and h["n_distinct"] == 2
    assert h["entropy"] == round(math.log(2), 6)
    with pytest.raises(ValueError):
        entropy_profile(df, [])


def test_expected_calibration_error_hand_values(spark):
    """Perfectly calibrated scores -> 0; a known one-bin gap -> the
    exact integer rational."""
    from covid_data_pipeline_spark.operators.calibrate import (
        expected_calibration_error,
    )

    perfect = [(1_000_000, True)] * 3 + [(0, False)] * 5
    df = spark.createDataFrame(perfect, "s LONG, y BOOLEAN")
    r = expected_calibration_error(df, "s", "y").collect()[0]
    assert r["n"] == 8 and r["ece"] == 0.0

    # 4 rows, all score 500000 (bin 5), 1 positive:
    # gap = |1*1e6 - 4*500000| = 1e6; ece = 1e6/(4*1e6) = 0.25
    df2 = spark.createDataFrame(
        [(500_000, True), (500_000, False), (500_000, False),
         (500_000, False)],
        "s LONG, y BOOLEAN",
    )
    r2 = expected_calibration_error(df2, "s", "y").collect()[0]
    assert r2["ece"] == 0.25
    with pytest.raises(ValueError):
        expected_calibration_error(df2, "s", "y", bins=1)


def test_theil_u_derived_column(spark):
    """A column that is a pure function of another has
    U(derived|source) = 1 exactly; a constant column yields NULL U;
    hand-check MI against the entropy identity."""
    from covid_data_pipeline_spark.operators.quality import theil_u

    # y in {a1, a2, b1}; x = first char (derived from y)
    rows = [("a", "a1")] * 3 + [("a", "a2")] * 3 + [("b", "b1")] * 2
    df = spark.createDataFrame(rows, "x STRING, y STRING")
    r = theil_u(df, "x", "y").collect()[0]
    assert r["n"] == 8
    assert r["u_x_given_y"] == 1.0          # x is derivable from y
    assert 0 < r["u_y_given_x"] < 1.0       # y is NOT derivable from x
    # H(X,Y) == H(Y) when x is a function of y
    assert r["h_xy"] == r["h_y"]
    assert r["mi"] == r["h_x"]

    const = spark.createDataFrame(
        [("k", "v1"), ("k", "v2")], "x STRING, y STRING"
    )
    rc = theil_u(const, "x", "y").collect()[0]
    assert rc["h_x"] == 0.0 and rc["u_x_given_y"] is None


def test_trimmed_stats_hand_values(spark):
    """10 values with one whale: 10% trim drops exactly the min and
    max; winsorized clamps them to the boundary order statistics; an
    over-trimmed key yields NULL means."""
    from covid_data_pipeline_spark.operators.temporal import trimmed_stats

    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
    df = spark.createDataFrame(
        [("k", v) for v in vals] + [("tiny", 5), ("tiny", 7)],
        "g STRING, v BIGINT",
    )
    got = {r["g"]: r.asDict()
           for r in trimmed_stats(df, ["g"], "v", 1, 10).collect()}
    k = got["k"]
    assert k["n"] == 10 and k["n_cut_each_side"] == 1
    # kept: 2..9 -> sum 44, mean 5.5
    assert k["trimmed_mean"] == 5.5
    # winsorized: 44 + 1*(2 + 9) = 55 over n=10
    assert k["winsorized_mean"] == 5.5
    tiny = got["tiny"]  # n=2, g=0 -> nothing cut, plain mean
    assert tiny["n_cut_each_side"] == 0 and tiny["trimmed_mean"] == 6.0

    # 50% trim on n=2: g=1, kept 0 -> NULL means
    over = trimmed_stats(
        spark.createDataFrame([("x", 1), ("x", 3)], "g STRING, v BIGINT"),
        ["g"], "v", 1, 2,
    ).collect()[0]
    assert over["trimmed_mean"] is None
    assert over["winsorized_mean"] is None
    with pytest.raises(ValueError):
        trimmed_stats(df, ["g"], "v", 5, 5)


def test_mcnemar_hand_values(spark):
    """Textbook discordant table: b=10, c=2 -> chi2 = 64/12; identical
    predictions -> NULL chi2, not significant."""
    from covid_data_pipeline_spark.operators.experiment import mcnemar_test

    # truth always True; A right/B wrong x10, A wrong/B right x2,
    # both right x8 -> n=20, acc_a=18/20, acc_b=10/20
    rows = (
        [(True, True, False)] * 10
        + [(True, False, True)] * 2
        + [(True, True, True)] * 8
    )
    df = spark.createDataFrame(rows, "y BOOLEAN, a BOOLEAN, b BOOLEAN")
    r = mcnemar_test(df, "y", "a", "b").collect()[0]
    assert (r["n"], r["b"], r["c"]) == (20, 10, 2)
    assert r["acc_a"] == 0.9 and r["acc_b"] == 0.5
    assert r["chi2"] == round(64 / 12, 6)
    assert r["significant"] is True  # 64000 > 3841*12

    same = spark.createDataFrame(
        [(True, True, True), (False, True, True)],
        "y BOOLEAN, a BOOLEAN, b BOOLEAN",
    )
    rs = mcnemar_test(same, "y", "a", "b").collect()[0]
    assert rs["chi2"] is None and rs["significant"] is False


def test_robust_zscore_hand_values(spark):
    """One gross spike among steady values: modified z flags only the
    spike (a mean/std z would be inflated by it); MAD=0 degenerate
    flags any deviation; even/odd medians exact."""
    from covid_data_pipeline_spark.operators.temporal import robust_zscore

    # key a: 9 steady values 10..18 plus one spike 1000
    a = [("a", i, 10 + i) for i in range(9)] + [("a", 99, 1000)]
    # key b: majority-constant (MAD = 0) with one deviant
    b = [("b", i, 5) for i in range(5)] + [("b", 9, 6)]
    df = spark.createDataFrame(a + b, "k STRING, x BIGINT, v BIGINT")
    out = {(r["k"], r["x"]): r.asDict()
           for r in robust_zscore(df, ["k"], "x", "v").collect()}
    assert len(out) == 16
    # key a: n=10 even -> med2 = v(5)+v(6) = 14+15 = 29
    # d values: |2v-29| for 10..18 = 9,7,5,3,1,1,3,5,7; spike 1971
    # sorted d: 1,1,3,3,5,5,7,7,9,1971 -> mad4 = 5+5 = 10
    spike = out[("a", 99)]
    assert spike["is_outlier"] is True
    assert spike["robust_z"] == round(1.349 * 1971 / 10, 4)
    steady = out[("a", 4)]  # v=14, 2v-29 = -1
    assert steady["is_outlier"] is False
    assert steady["robust_z"] == round(1.349 * -1 / 10, 4)
    n_flagged = sum(1 for (k, _), r in out.items()
                    if k == "a" and r["is_outlier"])
    assert n_flagged == 1  # the spike does not mask or drag others
    # key b: med2 = 10, d = 0 x5 and 2; mad4 = 0 -> z NULL, deviant
    # still flagged by the integer verdict
    assert out[("b", 9)]["robust_z"] is None
    assert out[("b", 9)]["is_outlier"] is True
    assert out[("b", 0)]["is_outlier"] is False
    with pytest.raises(ValueError):
        robust_zscore(df, [], "x", "v")


def test_collocations_g2_planted(spark):
    """A bigram that always co-occurs ranks first with the exact
    hand-computed G²; min_count prunes hapaxes."""
    from covid_data_pipeline_spark.operators.langmodel import (
        collocations_g2,
    )

    # "new york" appears 8 times; filler bigrams share tokens broadly
    docs = [(i, "new york is big and new york is old") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = collocations_g2(df, top_k=5, min_count=5).collect()
    top = out[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    assert top["c12"] == 8

    # exact reference with the same per-term nano rounding
    # bigram stream per doc: new,york / york,is / is,big / big,and /
    # and,new / new,york / york,is / is,old  -> N = 32 over 4 docs
    def g2(c12, c1, c2, nn):
        def term(o, r, c):
            if o <= 0:
                return 0
            return int(round(o * math.log((o * nn) / (r * c)) * 1e9))

        return 2 * (
            term(c12, c1, c2)
            + term(c1 - c12, c1, nn - c2)
            + term(c2 - c12, nn - c1, c2)
            + term(nn - c1 - c2 + c12, nn - c1, nn - c2)
        )

    want = g2(8, 8, 8, 32)  # new: c1=8 (always left of york), york: c2=8
    assert top["g2_nano"] == want
    with pytest.raises(ValueError):
        collocations_g2(df, top_k=0)
