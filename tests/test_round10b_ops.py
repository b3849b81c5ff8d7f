"""Hand-value tests for the round-10 batch-B statistics operators:
Kruskal-Wallis H, Brown-Forsythe variance homogeneity, Welch's t-test
with effect sizes."""

from __future__ import annotations

import math

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow


def test_kruskal_wallis_textbook_no_ties(spark):
    """Three disjoint groups 1-3 / 4-6 / 7-9: rank sums 6/15/24,
    H = 12/90*(12+75+192) - 30 = 7.2 exactly; no ties so the
    correction is the identity."""
    from covid_data_pipeline_spark.operators.experiment import kruskal_wallis

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (4, 5, 6)] + [
        ("c", v) for v in (7, 8, 9)
    ]
    df = spark.createDataFrame(rows, "g STRING, v INT")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert (r["n"], r["k"], r["df"]) == (9, 3, 2)
    assert r["h"] == pytest.approx(7.2, abs=1e-4)
    assert r["h_corrected"] == pytest.approx(7.2, abs=1e-4)


def test_kruskal_wallis_tie_correction(spark):
    """a=[1,1], b=[2,2]: H=2.4, tie moment 12 of N3-N=60 -> H'=3.0."""
    from covid_data_pipeline_spark.operators.experiment import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 2)], "g STRING, v INT"
    )
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r["h"] == pytest.approx(2.4, abs=1e-4)
    assert r["h_corrected"] == pytest.approx(3.0, abs=1e-4)
    # everything ties on one value -> variance degenerate, NULL corrected
    df2 = spark.createDataFrame(
        [("a", 5), ("b", 5), ("b", 5)], "g STRING, v INT"
    )
    r2 = kruskal_wallis(df2, "g", "v").collect()[0]
    assert r2["h_corrected"] is None  # tie_corr == 0 -> try_divide NULL


def test_kruskal_wallis_partition_invariance(spark):
    """Same data through 1 vs 13 shuffle partitions hashes identically
    (the micro-lattice makes the cross-group sum order-free)."""
    from covid_data_pipeline_spark.operators.experiment import kruskal_wallis

    rows = [(f"g{i % 5}", (i * 7919) % 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "g STRING, v INT")
    a = kruskal_wallis(df.coalesce(1), "g", "v").collect()[0]
    b = kruskal_wallis(df.repartition(13), "g", "v").collect()[0]
    assert a.asDict() == b.asDict()


def test_brown_forsythe_hand_values(spark):
    """a=[1,2,3,4,10] (median 3), b=[1]*5 (zero spread): doubled
    deviations give SSB=49, SSW=123 on the unit lattice ->
    F = 49/(123/8) = 392/123."""
    from covid_data_pipeline_spark.operators.experiment import brown_forsythe

    rows = [("a", v) for v in (1, 2, 3, 4, 10)] + [("b", 1)] * 5
    df = spark.createDataFrame(rows, "g STRING, v INT")
    r = brown_forsythe(df, "g", "v").collect()[0]
    assert (r["n"], r["k"], r["df1"], r["df2"]) == (10, 2, 1, 8)
    assert r["f_bf"] == pytest.approx(392.0 / 123.0, abs=1e-4)


def test_brown_forsythe_identical_spreads_and_degenerate(spark):
    """Identical spreads -> F == 0; all-constant data -> SSW == 0 ->
    NULL via try_divide."""
    from covid_data_pipeline_spark.operators.experiment import brown_forsythe

    same = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (11, 12, 13)]
    r = brown_forsythe(
        spark.createDataFrame(same, "g STRING, v INT"), "g", "v"
    ).collect()[0]
    assert r["f_bf"] == 0.0
    const = [("a", 5)] * 3 + [("b", 5)] * 3
    r2 = brown_forsythe(
        spark.createDataFrame(const, "g STRING, v INT"), "g", "v"
    ).collect()[0]
    assert r2["f_bf"] is None


def test_welch_ttest_hand_values(spark):
    """treat=[1..4] vs ctrl=[2,4,6,8,10]: closed-form Welch t, W-S df,
    Cohen's d, Hedges g computed in-test from the definitions."""
    from covid_data_pipeline_spark.operators.experiment import welch_ttest

    rows = [(True, v) for v in (1, 2, 3, 4)] + [
        (False, v) for v in (2, 4, 6, 8, 10)
    ]
    df = spark.createDataFrame(rows, "t BOOLEAN, v INT")
    r = welch_ttest(df, "t", "v").collect()[0]
    n1, n0, m1, m0 = 4, 5, 2.5, 6.0
    var1, var0 = 5.0 / 3.0, 10.0
    se2 = var1 / n1 + var0 / n0
    t = (m1 - m0) / math.sqrt(se2)
    dfw = se2 * se2 / ((var1 / n1) ** 2 / (n1 - 1) + (var0 / n0) ** 2 / (n0 - 1))
    pooled = math.sqrt(((n1 - 1) * var1 + (n0 - 1) * var0) / (n1 + n0 - 2))
    d = (m1 - m0) / pooled
    g = d * (1 - 3.0 / (4 * (n1 + n0) - 9))
    assert (r["n_treat"], r["n_ctrl"]) == (4, 5)
    assert r["mean_treat"] == 2.5 and r["mean_ctrl"] == 6.0
    assert r["t_welch"] == pytest.approx(t, abs=1e-4)
    assert r["df_welch"] == pytest.approx(dfw, abs=1e-2)
    assert r["cohens_d"] == pytest.approx(d, abs=1e-6)
    assert r["hedges_g"] == pytest.approx(g, abs=1e-6)


def test_welch_ttest_degenerate_single_row_arm(spark):
    """An arm with n=1 has no variance estimate -> NULL t/df; means
    still report."""
    from covid_data_pipeline_spark.operators.experiment import welch_ttest

    df = spark.createDataFrame(
        [(True, 7), (False, 1), (False, 3)], "t BOOLEAN, v INT"
    )
    r = welch_ttest(df, "t", "v").collect()[0]
    assert r["mean_treat"] == 7.0 and r["mean_ctrl"] == 2.0
    assert r["t_welch"] is None and r["df_welch"] is None


def test_average_precision_hand_values(spark):
    """Ranked (1,0,1,0) -> AP = 0.5*1 + 0.5*(2/3) = 0.833333; tie
    block forms one threshold; no-positive input -> NULL AP."""
    from covid_data_pipeline_spark.operators.retrieval import (
        average_precision,
    )

    df = spark.createDataFrame(
        [(90, True), (80, False), (70, True), (60, False)],
        "s BIGINT, y BOOLEAN",
    )
    r = average_precision(df, "s", "y").collect()[0]
    assert (r["n"], r["n_pos"]) == (4, 2)
    assert r["average_precision"] == pytest.approx(5.0 / 6.0, abs=1e-6)

    tied = spark.createDataFrame(
        [(10, True), (10, False), (5, True)], "s BIGINT, y BOOLEAN"
    )
    r2 = average_precision(tied, "s", "y").collect()[0]
    assert r2["average_precision"] == pytest.approx(0.25 + 1.0 / 3.0, abs=1e-6)

    nopos = spark.createDataFrame([(1, False), (2, False)], "s BIGINT, y BOOLEAN")
    r3 = average_precision(nopos, "s", "y").collect()[0]
    assert r3["average_precision"] is None and r3["n_pos"] == 0


def test_score_lift_deciles_hand_values(spark):
    """20 rows, positives at ranks 1,2,3,11: decile 1 lift 5.0,
    decile 2 cumulative lift 3.75, capture rates 0.5 / 0.75."""
    from covid_data_pipeline_spark.operators.retrieval import (
        score_lift_deciles,
    )

    pos_ranks = {1, 2, 3, 11}
    rows = [(21 - i, i in pos_ranks, i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "s BIGINT, y BOOLEAN, id BIGINT")
    out = {r["decile"]: r for r in score_lift_deciles(df, "s", "y", "id").collect()}
    assert len(out) == 10 and all(out[d]["n"] == 2 for d in out)
    assert out[1]["n_pos"] == 2 and out[1]["lift"] == 5.0
    assert out[1]["capture_rate"] == 0.5
    assert out[2]["n_pos"] == 1 and out[2]["cum_pos"] == 3
    assert out[2]["cum_lift"] == 3.75 and out[2]["capture_rate"] == 0.75
    assert out[6]["n_pos"] == 1 and out[10]["cum_lift"] == 1.0


def test_score_lift_deciles_partition_invariance(spark):
    """Identical table under 1 vs 17 partitions (value_order_rank's
    determinism carries through the decile assignment)."""
    from covid_data_pipeline_spark.operators.retrieval import (
        score_lift_deciles,
    )

    rows = [((i * 7919) % 1000, (i % 7) == 0, i) for i in range(5000)]
    df = spark.createDataFrame(rows, "s BIGINT, y BOOLEAN, id BIGINT")
    a = [r.asDict() for r in score_lift_deciles(df.coalesce(1), "s", "y", "id").collect()]
    b = [r.asDict() for r in score_lift_deciles(df.repartition(17), "s", "y", "id").collect()]
    assert a == b


def test_wasserstein_1d_hand_values(spark):
    """W1({0,2},{1,3}) = 1 exactly; W1({0},{10}) = 10; empty cohort
    -> NULL."""
    from covid_data_pipeline_spark.operators.experiment import wasserstein_1d

    df = spark.createDataFrame(
        [(True, 0), (True, 2), (False, 1), (False, 3)], "a BOOLEAN, v INT"
    )
    r = wasserstein_1d(df, "a", "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2) and r["w1"] == 1.0

    far = spark.createDataFrame([(True, 0), (False, 10)], "a BOOLEAN, v INT")
    assert wasserstein_1d(far, "a", "v").collect()[0]["w1"] == 10.0

    onesided = spark.createDataFrame([(True, 1), (True, 5)], "a BOOLEAN, v INT")
    assert wasserstein_1d(onesided, "a", "v").collect()[0]["w1"] is None


def test_wasserstein_identical_distributions_zero(spark):
    from covid_data_pipeline_spark.operators.experiment import wasserstein_1d

    rows = [(c, v) for c in (True, False) for v in (1, 5, 5, 9)]
    df = spark.createDataFrame(rows, "a BOOLEAN, v INT")
    assert wasserstein_1d(df, "a", "v").collect()[0]["w1"] == 0.0


def test_tv_hellinger_hand_values(spark):
    """Point mass on bin 1 vs a uniform {1,2} corpus: TV = 0.5 exact,
    H^2 = 1 - sqrt(0.5), Hellinger = sqrt(H^2)."""
    from covid_data_pipeline_spark.operators.experiment import (
        tv_hellinger_distance,
    )

    rows = [("a", 1)] * 4 + [("b", 2)] * 4
    df = spark.createDataFrame(rows, "g STRING, b INT")
    out = {r["g"]: r for r in tv_hellinger_distance(df, "g", "b").collect()}
    assert out["a"]["tv"] == 0.5 and out["b"]["tv"] == 0.5
    h2 = 1.0 - math.sqrt(0.5)
    assert out["a"]["h2_nano"] == pytest.approx(h2 * 1e9, abs=2)
    assert out["a"]["hellinger"] == pytest.approx(math.sqrt(h2), abs=1e-6)

    # a group distributed exactly like the corpus scores 0 on both
    same = [("x", b) for b in (1, 1, 2)] + [("y", b) for b in (1, 1, 2)]
    out2 = {
        r["g"]: r
        for r in tv_hellinger_distance(
            spark.createDataFrame(same, "g STRING, b INT"), "g", "b"
        ).collect()
    }
    assert out2["x"]["tv"] == 0.0 and out2["x"]["h2_nano"] == 0
    assert out2["y"]["hellinger"] == 0.0


def test_tv_hellinger_partition_invariance(spark):
    from covid_data_pipeline_spark.operators.experiment import (
        tv_hellinger_distance,
    )

    rows = [(f"g{i % 4}", (i * 31) % 10) for i in range(3000)]
    df = spark.createDataFrame(rows, "g STRING, b INT")
    key = lambda r: r["g"]  # noqa: E731
    a = sorted((r.asDict() for r in tv_hellinger_distance(df.coalesce(1), "g", "b").collect()), key=lambda x: x["g"])
    b = sorted((r.asDict() for r in tv_hellinger_distance(df.repartition(11), "g", "b").collect()), key=lambda x: x["g"])
    assert a == b


def test_fleiss_kappa_hand_values(spark):
    """2 raters: {i1:[A,A], i2:[A,B]} -> p_bar=0.5, p_e=0.625,
    kappa=-1/3; an item with a third rating is excluded; perfect
    agreement across different categories -> kappa=1; unanimous single
    category -> p_e=1 -> NULL."""
    from covid_data_pipeline_spark.operators.experiment import fleiss_kappa

    rows = [("i1", "A"), ("i1", "A"), ("i2", "A"), ("i2", "B"),
            ("i3", "A"), ("i3", "A"), ("i3", "B")]
    r = fleiss_kappa(
        spark.createDataFrame(rows, "i STRING, c STRING"), "i", "c", 2
    ).collect()[0]
    assert (r["n_items"], r["n_excluded"], r["m"]) == (2, 1, 2)
    assert r["p_bar"] == 0.5 and r["p_e"] == 0.625
    assert r["kappa"] == pytest.approx(-1.0 / 3.0, abs=1e-6)

    perfect = [("i1", "A"), ("i1", "A"), ("i2", "B"), ("i2", "B")]
    r2 = fleiss_kappa(
        spark.createDataFrame(perfect, "i STRING, c STRING"), "i", "c", 2
    ).collect()[0]
    assert r2["kappa"] == 1.0

    unan = [("i1", "A"), ("i1", "A"), ("i2", "A"), ("i2", "A")]
    r3 = fleiss_kappa(
        spark.createDataFrame(unan, "i STRING, c STRING"), "i", "c", 2
    ).collect()[0]
    assert r3["p_e"] == 1.0 and r3["kappa"] is None


def test_cronbach_alpha_hand_values(spark):
    """Duplicated item -> alpha=1; anti-correlated items -> constant
    total -> NULL; a hand-computed independent-ish case -> -1."""
    from covid_data_pipeline_spark.operators.experiment import cronbach_alpha

    dup = spark.createDataFrame(
        [(v, v) for v in (1, 2, 3, 4)], "x1 INT, x2 INT"
    )
    r = cronbach_alpha(dup, ["x1", "x2"]).collect()[0]
    assert (r["n"], r["k"], r["alpha"]) == (4, 2, 1.0)

    ind = spark.createDataFrame(
        list(zip((1, 2, 3, 4), (2, 1, 2, 1))), "x1 INT, x2 INT"
    )
    r2 = cronbach_alpha(ind, ["x1", "x2"]).collect()[0]
    assert r2["alpha"] == -1.0

    anti = spark.createDataFrame(
        list(zip((1, 2, 3, 4), (4, 3, 2, 1))), "x1 INT, x2 INT"
    )
    assert cronbach_alpha(anti, ["x1", "x2"]).collect()[0]["alpha"] is None

    # NULL rows are excluded entirely
    withnull = spark.createDataFrame(
        [(1, 1), (2, 2), (3, None)], "x1 INT, x2 INT"
    )
    assert cronbach_alpha(withnull, ["x1", "x2"]).collect()[0]["n"] == 2


def test_log_odds_keywords_hand_values(spark):
    """Two groups over terms x/y with known counts: z matches the
    Monroe formula computed in-test; x characterizes group a."""
    from covid_data_pipeline_spark.operators.langmodel import (
        log_odds_keywords,
    )

    rows = (
        [("a", "x")] * 6 + [("a", "y")] * 4
        + [("b", "x")] * 2 + [("b", "y")] * 8
    )
    df = spark.createDataFrame(rows, "g STRING, w STRING")
    out = {
        (r["g"], r["w"]): r
        for r in log_odds_keywords(
            df, "g", "w", alpha0=1.0, min_count=1, top_k=10
        ).collect()
    }

    def zref(ygw, ng, yw, n, a0=1.0):
        aw = a0 * yw / n
        yrw, nr = yw - ygw, n - ng
        delta = math.log((ygw + aw) / ((ng + a0) - (ygw + aw))) - math.log(
            (yrw + aw) / ((nr + a0) - (yrw + aw))
        )
        return delta / math.sqrt(1.0 / (ygw + aw) + 1.0 / (yrw + aw))

    assert out[("a", "x")]["z"] == pytest.approx(
        zref(6, 10, 8, 20), abs=1e-4
    )
    assert out[("b", "y")]["z"] == pytest.approx(
        zref(8, 10, 12, 20), abs=1e-4
    )
    assert out[("a", "x")]["rank"] == 1 and out[("b", "y")]["rank"] == 1
    assert out[("a", "x")]["y_count"] == 6


def test_log_odds_keywords_min_count_prunes(spark):
    from covid_data_pipeline_spark.operators.langmodel import (
        log_odds_keywords,
    )

    rows = [("a", "common")] * 10 + [("a", "rare")] + [("b", "common")] * 10
    df = spark.createDataFrame(rows, "g STRING, w STRING")
    out = log_odds_keywords(df, "g", "w", min_count=5).collect()
    assert all(r["w"] == "common" for r in out)


def test_cmh_stratified_hand_values(spark):
    """Two balanced strata with E_i == a_i -> chi2 clamps to 0 and
    OR_MH = 1; a single associated stratum (30/10/10/30) gives
    OR = 9 and the continuity-corrected chi2 = 9.5^2 / V."""
    from covid_data_pipeline_spark.operators.experiment import cmh_stratified

    def rows(s, a, b, c, d):
        return (
            [(s, True, True)] * a + [(s, True, False)] * b
            + [(s, False, True)] * c + [(s, False, False)] * d
        )

    null_case = rows("s1", 10, 10, 10, 10) + rows("s2", 20, 10, 10, 5)
    r = cmh_stratified(
        spark.createDataFrame(null_case, "s STRING, t BOOLEAN, y BOOLEAN"),
        "s", "t", "y",
    ).collect()[0]
    assert (r["n"], r["k_strata"]) == (85, 2)
    assert r["or_mh"] == 1.0 and r["chi2_mh"] == 0.0

    assoc = rows("s1", 30, 10, 10, 30)
    r2 = cmh_stratified(
        spark.createDataFrame(assoc, "s STRING, t BOOLEAN, y BOOLEAN"),
        "s", "t", "y",
    ).collect()[0]
    assert r2["or_mh"] == 9.0
    v = (40 * 40 * 40 * 40) / (80 * 80 * 79)
    assert r2["chi2_mh"] == pytest.approx(9.5 * 9.5 / v, abs=1e-4)

    # no discordant pairs anywhere -> OR NULL
    nodisc = rows("s1", 5, 0, 0, 5)
    r3 = cmh_stratified(
        spark.createDataFrame(nodisc, "s STRING, t BOOLEAN, y BOOLEAN"),
        "s", "t", "y",
    ).collect()[0]
    assert r3["or_mh"] is None


def _wkappa_ref(pairs):
    """Reference weighted kappa from the textbook definition."""
    from collections import Counter

    obs = Counter(pairs)
    n = len(pairs)
    classes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)

    def kap(d):
        num = n * sum(d(a, b) * o for (a, b), o in obs.items())
        den = sum(
            d(i, j) * ra.get(i, 0) * cb.get(j, 0)
            for i in classes for j in classes
        )
        return None if den == 0 else 1.0 - num / den

    return kap(lambda i, j: abs(i - j)), kap(lambda i, j: (i - j) ** 2)


def test_weighted_kappa_hand_values(spark):
    """Binary table [[20,5],[10,15]] collapses to the unweighted 0.4;
    a 3-class ordinal table separates linear from quadratic; single
    shared class -> NULL."""
    from covid_data_pipeline_spark.operators.experiment import weighted_kappa

    pairs = (
        [(0, 0)] * 20 + [(0, 1)] * 5 + [(1, 0)] * 10 + [(1, 1)] * 15
    )
    df = spark.createDataFrame(pairs, "a INT, b INT")
    r = weighted_kappa(df, "a", "b").collect()[0]
    assert (r["n"], r["k_classes"]) == (50, 2)
    assert r["kappa_linear"] == 0.4 and r["kappa_quadratic"] == 0.4

    ordinal = (
        [(0, 0)] * 10 + [(1, 1)] * 10 + [(2, 2)] * 10
        + [(0, 1)] * 4 + [(0, 2)] * 2 + [(2, 1)] * 3
    )
    lin, quad = _wkappa_ref(ordinal)
    df2 = spark.createDataFrame(ordinal, "a INT, b INT")
    r2 = weighted_kappa(df2, "a", "b").collect()[0]
    assert r2["k_classes"] == 3
    assert r2["kappa_linear"] == pytest.approx(lin, abs=1e-6)
    assert r2["kappa_quadratic"] == pytest.approx(quad, abs=1e-6)
    assert r2["kappa_linear"] != r2["kappa_quadratic"]

    const = spark.createDataFrame([(1, 1)] * 5, "a INT, b INT")
    r3 = weighted_kappa(const, "a", "b").collect()[0]
    assert r3["kappa_linear"] is None and r3["kappa_quadratic"] is None


def test_friedman_hand_values(spark):
    """Perfectly consistent ordering over 3 blocks x 3 treatments ->
    chi2 = 6 exactly; an all-tied block contributes average ranks and
    the tie correction; incomplete blocks are excluded."""
    from covid_data_pipeline_spark.operators.experiment import friedman_test

    rows = []
    for blk in ("b1", "b2", "b3"):
        for j, trt in enumerate(("t0", "t1", "t2")):
            rows.append((blk, trt, 10 + j))
    df = spark.createDataFrame(rows, "blk STRING, trt STRING, v INT")
    r = friedman_test(df, "blk", "trt", "v").collect()[0]
    assert (r["n_blocks"], r["n_excluded"], r["k"], r["df"]) == (3, 0, 3, 2)
    assert r["chi2_f"] == 6.0 and r["chi2_f_corrected"] == 6.0

    # add an all-tied block (r2 = 4 for each) and an incomplete block
    rows2 = rows + [("b4", t, 7) for t in ("t0", "t1", "t2")] + [
        ("b5", "t0", 1), ("b5", "t1", 2)
    ]
    df2 = spark.createDataFrame(rows2, "blk STRING, trt STRING, v INT")
    r2 = friedman_test(df2, "blk", "trt", "v").collect()[0]
    assert (r2["n_blocks"], r2["n_excluded"]) == (4, 1)
    # R2 per treatment: (2,4,6)*3 blocks + 4 each = (10, 16, 22)
    # chi2 = 3*(100+256+484)/(4*3*4) - 3*4*4 = 2520/48 - 48 = 4.5
    assert r2["chi2_f"] == 4.5
    # tie moment: one block of t=3 -> 24; C = 1 - 24/(4*3*8) = 0.75
    assert r2["chi2_f_corrected"] == 6.0

    # every block all-ties -> C = 0 -> NULL corrected
    allt = [(b, t, 5) for b in ("x", "y") for t in ("t0", "t1", "t2")]
    r3 = friedman_test(
        spark.createDataFrame(allt, "blk STRING, trt STRING, v INT"),
        "blk", "trt", "v",
    ).collect()[0]
    assert r3["chi2_f"] == 0.0 and r3["chi2_f_corrected"] is None


def test_friedman_partition_invariance(spark):
    from covid_data_pipeline_spark.operators.experiment import friedman_test

    rows = [
        (f"b{i}", f"t{j}", ((i * 31 + j * 17) % 23))
        for i in range(500) for j in range(4)
    ]
    df = spark.createDataFrame(rows, "blk STRING, trt STRING, v INT")
    a = friedman_test(df.coalesce(1), "blk", "trt", "v").collect()[0]
    b = friedman_test(df.repartition(13), "blk", "trt", "v").collect()[0]
    assert a.asDict() == b.asDict()


def test_jonckheere_terpstra_hand_values(spark):
    """Perfectly ordered groups [1,2]<[3,4]<[5,6]: JT2=24 (max), z =
    12/(2*sqrt(456/72)); tied case [1,1] vs [1,2]: JT2=6, Var=1.0
    exactly -> z=1.0; single group -> Var=0 -> NULL z."""
    from covid_data_pipeline_spark.operators.experiment import (
        jonckheere_terpstra,
    )

    rows = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (2, 6)]
    r = jonckheere_terpstra(
        spark.createDataFrame(rows, "g INT, v INT"), "g", "v"
    ).collect()[0]
    assert (r["n"], r["k"], r["jt2"]) == (6, 3, 24)
    assert r["z"] == pytest.approx(12.0 / (2.0 * math.sqrt(456.0 / 72.0)), abs=1e-4)

    tied = [(0, 1), (0, 1), (1, 1), (1, 2)]
    r2 = jonckheere_terpstra(
        spark.createDataFrame(tied, "g INT, v INT"), "g", "v"
    ).collect()[0]
    assert r2["jt2"] == 6 and r2["z"] == 1.0

    single = [(0, v) for v in (1, 2, 3)]
    r3 = jonckheere_terpstra(
        spark.createDataFrame(single, "g INT, v INT"), "g", "v"
    ).collect()[0]
    assert r3["jt2"] == 0 and r3["z"] is None


def test_jonckheere_partition_invariance_and_direction(spark):
    """A planted monotone shift gives z >> 0; reversing the group
    order flips the sign; exact outputs survive a prime repartition."""
    from pyspark.sql import functions as F

    from covid_data_pipeline_spark.operators.experiment import (
        jonckheere_terpstra,
    )

    rows = [(i % 4, (i * 7919) % 100 + 10 * (i % 4)) for i in range(4000)]
    df = spark.createDataFrame(rows, "g INT, v INT")
    a = jonckheere_terpstra(df.coalesce(1), "g", "v").collect()[0]
    b = jonckheere_terpstra(df.repartition(13), "g", "v").collect()[0]
    assert a.asDict() == b.asDict() and a["z"] > 5
    rev = df.select((3 - F.col("g")).alias("g"), "v")
    c = jonckheere_terpstra(rev, "g", "v").collect()[0]
    assert c["z"] == -a["z"]
