"""Round-9 operator additions: leave-one-out target encoding,
per-class classification report, calibration bins + Brier score,
grouped chi-square + Benjamini-Hochberg FDR control."""

from __future__ import annotations

import math

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F


def test_loo_target_encoding_hand_values(spark):
    """Hand-computed LOO encodings incl. the singleton-regresses-to-GM
    property (w > 0 makes n_v = 1 well-defined)."""
    from covid_data_pipeline_spark.operators.features import (
        loo_target_encoding,
    )

    rows = [(1, "a", 100), (2, "a", 200), (3, "a", 300), (4, "b", 1000)]
    df = spark.createDataFrame(rows, "id BIGINT, cat STRING, y BIGINT")
    out = {
        r["id"]: r["enc"]
        for r in loo_target_encoding(
            df, "cat", "y", prior_weight=10
        ).collect()
    }
    gm = 1600 / 4  # 400.0
    # row 1: (600-100 + 10*400) / (3-1+10) = 4500/12 = 375
    assert out[1] == round((500 + 10 * gm) / 12, 4)
    assert out[2] == round((400 + 10 * gm) / 12, 4)
    assert out[3] == round((300 + 10 * gm) / 12, 4)
    # singleton: (1000-1000 + 10*400)/(0+10) = exactly GM
    assert out[4] == 400.0

    with pytest.raises(ValueError):
        loo_target_encoding(df, "cat", "y", prior_weight=0)


def test_classification_report_hand_counts(spark):
    """3-class fixture with one never-predicted class: NULL precision
    via try_divide, F1 from raw counts (2tp/(2tp+fp+fn))."""
    from covid_data_pipeline_spark.operators.retrieval import (
        classification_report,
    )

    #            y     pred
    rows = [("a", "a"), ("a", "a"), ("a", "b"),
            ("b", "b"), ("b", "a"),
            ("c", "a"),            # class c never predicted
            (None, "a"), ("a", None)]  # excluded
    df = spark.createDataFrame(rows, "y STRING, p STRING")
    got = {r["class"]: r.asDict() for r in
           classification_report(df, "y", "p").collect()}
    a, b, c = got["a"], got["b"], got["c"]
    assert (a["tp"], a["fp"], a["fn"], a["support"]) == (2, 2, 1, 3)
    assert (b["tp"], b["fp"], b["fn"], b["support"]) == (1, 1, 1, 2)
    assert (c["tp"], c["fp"], c["fn"], c["support"]) == (0, 0, 1, 1)
    assert a["prec"] == 0.5 and a["rec"] == round(2 / 3, 6)
    assert a["f1"] == round(4 / 7, 6)  # 2*2/(4+2+1)
    assert c["prec"] is None and c["rec"] == 0.0 and c["f1"] == 0.0


def test_calibration_report_exact_bins_and_brier(spark):
    """Equal-width bins with the top bin closed; Brier from exact
    integer squared errors."""
    from covid_data_pipeline_spark.operators.calibrate import (
        calibration_report,
    )

    #        score_micro, label
    rows = [(100_000, False), (150_000, False),   # bin 1
            (950_000, True), (1_000_000, True),   # bin 9 (top closed)
            (500_000, True), (500_000, False)]    # bin 5
    df = spark.createDataFrame(rows, "s BIGINT, y BOOLEAN")
    out = {r["bin"]: r.asDict() for r in
           calibration_report(df, "s", "y", bins=10).collect()}
    assert set(out) == {1, 5, 9}
    assert out[1]["n"] == 2 and out[1]["n_pos"] == 0
    assert out[1]["mean_score"] == 0.125 and out[1]["frac_pos"] == 0.0
    assert out[9]["n"] == 2 and out[9]["frac_pos"] == 1.0
    assert out[5]["frac_pos"] == 0.5
    # brier: mean of (.1)^2 (.15)^2 (.05)^2 0^2 (.5)^2 (.5)^2 = .5325/6
    want = round((0.01 + 0.0225 + 0.0025 + 0.0 + 0.25 + 0.25) / 6, 6)
    assert all(r["brier"] == want for r in out.values())

    with pytest.raises(ValueError):
        calibration_report(df, "s", "y", bins=1)


def test_benjamini_hochberg_step_up(spark):
    """The defining step-up behavior: rank 1's own inequality FAILS
    (.013 > .0125) but rank 3 passes (.036 <= .0375), so ranks 1-3 are
    all rejected; rank 4 is not."""
    from covid_data_pipeline_spark.operators.experiment import (
        benjamini_hochberg,
    )

    rows = [("h1", 13_000), ("h2", 24_000), ("h3", 36_000),
            ("h4", 300_000)]
    df = spark.createDataFrame(rows, "hyp STRING, p_micro BIGINT")
    got = {r["hyp"]: (r["p_rank"], r["reject"]) for r in
           benjamini_hochberg(df, "p_micro", "hyp", 5, 100).collect()}
    assert got == {"h1": (1, True), "h2": (2, True),
                   "h3": (3, True), "h4": (4, False)}

    # no rank qualifies -> empty reject set (coalesce k* to 0)
    allbig = spark.createDataFrame(
        [("h1", 900_000), ("h2", 950_000)], "hyp STRING, p_micro BIGINT"
    )
    got2 = benjamini_hochberg(allbig, "p_micro", "hyp", 5, 100).collect()
    assert all(not r["reject"] for r in got2)

    with pytest.raises(ValueError):
        benjamini_hochberg(df, "p_micro", "hyp", q_num=0)


def test_grouped_chi2_matches_global_on_one_group(spark):
    """A single-group battery must reproduce independence_chi2's
    statistic exactly (same cell arithmetic, same rounding)."""
    from covid_data_pipeline_spark.operators.experiment import (
        grouped_independence_chi2,
        independence_chi2,
    )

    rows = [(i, i % 2, (i * 7) % 3) for i in range(300)]
    df = spark.createDataFrame(rows, "id BIGINT, r BIGINT, c BIGINT")
    want = independence_chi2(df, "r", "c").collect()[0]
    got = grouped_independence_chi2(
        df.withColumn("g", F.lit("only")), ["g"], "r", "c"
    ).collect()[0]
    assert got["chi2"] == want["chi2"]
    assert got["dof"] == want["dof"] == 2
    assert got["n"] == want["n"] == 300


def test_grouped_chi2_zero_cells_counted(spark):
    """A (r, c) combination absent from one group still contributes
    its expected mass via the per-group marginal cross join."""
    from covid_data_pipeline_spark.operators.experiment import (
        grouped_independence_chi2,
    )

    # group g1: cell (1, 1) never occurs -> strong dependence
    rows = [("g1", 0, 0)] * 10 + [("g1", 0, 1)] * 10 + \
           [("g1", 1, 0)] * 10 + \
           [("g2", 0, 0)] * 5 + [("g2", 0, 1)] * 5 + \
           [("g2", 1, 0)] * 5 + [("g2", 1, 1)] * 5
    df = spark.createDataFrame(rows, "g STRING, r BIGINT, c BIGINT")
    got = {r["g"]: r.asDict() for r in
           grouped_independence_chi2(df, ["g"], "r", "c").collect()}
    # g1 exact: chi2 = 30*(10*30-20*20)^2/(30*20*20)=.. per-cell terms
    n, cells = 30, [(10, 20, 20), (10, 20, 10), (10, 10, 20), (0, 10, 10)]
    want = round(sum(round((o * n - rt * ct) ** 2 / (n * rt * ct), 6)
                     for o, rt, ct in cells), 4)
    assert math.isclose(got["g1"]["chi2"], want, rel_tol=0, abs_tol=1e-12)
    assert got["g2"]["chi2"] == 0.0 and got["g2"]["dof"] == 1


def test_fk_audit_plants_orphans(spark):
    from covid_data_pipeline_spark.operators.quality import fk_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id BIGINT, fk BIGINT"
    )
    parent = spark.createDataFrame(
        [(10,), (10,), (20,)], "pk BIGINT"  # duplicate parent key
    )
    got = {r["fk"]: r.asDict() for r in fk_audit(
        [("child.fk -> parent", child, "fk", parent, "pk")]
    ).collect()}
    r = got["child.fk -> parent"]
    assert (r["n_child"], r["n_null_fk"], r["n_orphans"], r["holds"]) == (
        4, 1, 1, False,   # only fk=99 is an orphan; dup parent no double
    )
    with pytest.raises(ValueError):
        fk_audit([])


def test_corr_matrix_hand_values(spark):
    """Perfect positive, perfect negative, and zero-variance columns."""
    from covid_data_pipeline_spark.operators.quality import corr_matrix

    rows = [(float(i), 2.0 * i + 3, -1.5 * i, 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "a DOUBLE, b DOUBLE, c DOUBLE, d DOUBLE")
    got = {(r["col_x"], r["col_y"]): r["r"] for r in
           corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("b", "c")] == -1.0
    # zero-variance column -> NULL via try_divide
    assert got[("a", "d")] is None
    with pytest.raises(ValueError):
        corr_matrix(df, ["a"])


def test_seasonal_strength_planted_weekly(spark):
    """A pure weekly pattern scores ~1; iid-ish noise scores low; a
    constant series yields NULL (zero total variance)."""
    from covid_data_pipeline_spark.operators.temporal import (
        seasonal_strength,
    )

    weekly = [("w", t, 100 + 50 * (t % 7)) for t in range(56)]
    noisy = [("n", t, 100 + ((t * 37) % 11)) for t in range(56)]
    const = [("c", t, 42) for t in range(56)]
    df = spark.createDataFrame(
        weekly + noisy + const, "k STRING, t BIGINT, v BIGINT"
    )
    got = {r["k"]: r["strength"] for r in
           seasonal_strength(df, ["k"], "t", "v", period=7).collect()}
    assert got["w"] == 1.0          # residuals exactly 0
    assert got["n"] < 0.5, got["n"]
    assert got["c"] is None
    with pytest.raises(ValueError):
        seasonal_strength(df, ["k"], "t", "v", period=1)
    with pytest.raises(ValueError):
        seasonal_strength(df, [], "t", "v")


def test_spearman_monotone_nonlinear_and_ties(spark):
    """A perfectly monotone but nonlinear relation scores rho = 1
    (where Pearson < 1); reversing scores -1; ties use exact average
    ranks (doubled integers)."""
    from covid_data_pipeline_spark.operators.quality import (
        corr_matrix,
        spearman_corr,
    )

    rows = [(float(i), float(i) ** 3) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "a DOUBLE, b DOUBLE")
    got = spearman_corr(df, "a", "b", quant=1.0).collect()[0]
    assert got["rho"] == 1.0 and got["n"] == 20
    pearson = corr_matrix(df, ["a", "b"], quant=1.0).collect()[0]["r"]
    assert pearson < 1.0  # cubic is monotone, not linear

    rev = spark.createDataFrame(
        [(float(i), float(-i) ** 3) for i in range(1, 21)],
        "a DOUBLE, b DOUBLE",
    )
    assert spearman_corr(rev, "a", "b", quant=1.0).collect()[0]["rho"] == -1.0

    # ties: scipy-checkable fixture x=[1,1,2,3], y=[10,20,20,30]
    tied = spark.createDataFrame(
        [(1.0, 10.0), (1.0, 20.0), (2.0, 20.0), (3.0, 30.0)],
        "a DOUBLE, b DOUBLE",
    )
    # avg ranks x: [1.5,1.5,3,4]; y: [1,2.5,2.5,4]
    # cov = 3.75, var_x = var_y = 4.5 -> rho = 3.75/4.5 = 0.833333
    assert spearman_corr(tied, "a", "b", quant=1.0).collect()[0][
        "rho"
    ] == 0.833333


def test_bh_rank_is_distributed(spark):
    """The BH battery rank must come from value_order_rank: every
    row_number Window in the executed plan carries a partition spec
    (same guard as merge_intervals_global / sax_words)."""
    from covid_data_pipeline_spark.operators.experiment import (
        benjamini_hochberg,
    )

    df = spark.createDataFrame(
        [(f"h{i}", (i * 37) % 1000 + 1) for i in range(500)],
        "hyp STRING, p_micro BIGINT",
    )
    out = benjamini_hochberg(df, "p_micro", "hyp", 5, 100)
    out.collect()  # AQE: execute before reading the final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "row_number" in line and "Window" in line:
            groups = line.count("], [")
            assert groups >= 2, f"partition-less row_number window: {line}"


def test_ransac_trend_planted_line(spark):
    """20 points on y = 3x + 7 plus 8 wild outliers: the consensus
    line must capture exactly the 20 colinear points with slope 3.0;
    a no-line blob reports a small consensus."""
    from covid_data_pipeline_spark.operators.temporal import ransac_trend

    line = [("l", x, 3 * x + 7) for x in range(20)]
    wild = [("l", 100 + i, 10_000 * (i + 1) * (-1) ** i) for i in range(8)]
    # cubic-mod-prime y: linear-congruential blobs are secretly
    # PIECEWISE LINEAR (constant diffs between wraps) and RANSAC
    # correctly finds those runs — a cubic residue has no such runs
    blob = [("b", i, (i ** 3 + 17) % 991) for i in range(20)]
    df = spark.createDataFrame(
        line + wild + blob, "k STRING, x BIGINT, y BIGINT"
    )
    got = {r["k"]: r.asDict() for r in
           ransac_trend(df, ["k"], "x", "y", eps=0).collect()}
    l = got["l"]
    assert l["n_points"] == 28 and l["n_inliers"] == 20
    assert l["slope"] == 3.0
    b = got["b"]
    assert b["n_inliers"] <= 3, b  # no line explains the blob

    with pytest.raises(ValueError):
        ransac_trend(df, [], "x", "y")
    with pytest.raises(ValueError):
        ransac_trend(df, ["k"], "x", "y", eps=-1)


def test_ransac_trend_degenerate_keys_surface(spark):
    """ADVICE r9: keys with no valid candidate pair must NOT vanish —
    a single-point key and an all-same-x key (every pair below
    min_span) both surface with true n_points and NULL fit columns."""
    from covid_data_pipeline_spark.operators.temporal import ransac_trend

    rows = (
        [("solo", 5, 42)]                          # one point: no pair
        + [("flat_x", 7, y) for y in range(4)]     # span 0 < min_span
        + [("ok", x, 2 * x) for x in range(6)]     # healthy control
    )
    df = spark.createDataFrame(rows, "k STRING, x BIGINT, y BIGINT")
    got = {r["k"]: r.asDict() for r in
           ransac_trend(df, ["k"], "x", "y", eps=0).collect()}
    assert set(got) == {"solo", "flat_x", "ok"}
    assert got["solo"]["n_points"] == 1
    assert got["solo"]["n_inliers"] is None
    assert got["solo"]["slope"] is None
    assert got["flat_x"]["n_points"] == 4
    assert got["flat_x"]["slope"] is None and got["flat_x"]["x1"] is None
    assert got["ok"]["slope"] == 2.0 and got["ok"]["n_inliers"] == 6


def test_ransac_trend_max_candidates_thinning(spark):
    """The deterministic stride cap keeps at most max_candidates
    hypotheses per key, still recovers a clean planted line exactly,
    and rejects a non-positive cap."""
    from covid_data_pipeline_spark.operators.temporal import ransac_trend

    line = [("l", x, 4 * x + 1) for x in range(200)]
    df = spark.createDataFrame(line, "k STRING, x BIGINT, y BIGINT")
    r = ransac_trend(
        df, ["k"], "x", "y", eps=0, max_candidates=8
    ).collect()[0]
    assert r["slope"] == 4.0 and r["n_inliers"] == 200
    # thinned == unthinned on a clean line (both find full consensus)
    full = ransac_trend(df, ["k"], "x", "y", eps=0).collect()[0]
    assert (r["n_inliers"], r["slope"]) == (full["n_inliers"],
                                            full["slope"])
    with pytest.raises(ValueError):
        ransac_trend(df, ["k"], "x", "y", max_candidates=0)


def test_fk_audit_single_pass_and_empty_child(spark):
    """ADVICE r9 shape fix: the per-edge plan carries exactly ONE scan
    of the child (per-FK rollup, then distinct-vs-distinct join); an
    empty child reports zeros, not NULL sums."""
    from covid_data_pipeline_spark.operators.quality import fk_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id BIGINT, fk BIGINT"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk BIGINT")
    audit = fk_audit([("e", child, "fk", parent, "pk")])
    plan = audit._jdf.queryExecution().optimizedPlan().toString()
    # one child scan: LocalRelation for `child` appears once
    assert plan.count("LocalRelation [id#") <= 1, plan

    empty = spark.createDataFrame([], "id BIGINT, fk BIGINT")
    r = fk_audit([("e", empty, "fk", parent, "pk")]).collect()[0]
    assert (r["n_child"], r["n_null_fk"], r["n_orphans"], r["holds"]) == (
        0, 0, 0, True,
    )


def test_loo_target_encoding_null_category_is_a_group(spark):
    """ADVICE r9: NULL categories are a first-class LOO group — rows
    are kept and encoded against the other NULL-category rows, not
    dropped by the join back."""
    from covid_data_pipeline_spark.operators.features import (
        loo_target_encoding,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), (None, 30), (None, 50), (None, 70)],
        "cat STRING, y BIGINT",
    )
    out = loo_target_encoding(df, "cat", "y", prior_weight=10)
    rows = out.collect()
    assert len(rows) == 5, "NULL-category rows must not drop"
    gm = (10 + 20 + 30 + 50 + 70) / 5  # 36.0
    by = {}
    for r in rows:
        by.setdefault(r["cat"], []).append((r["y"], r["enc"]))
    # NULL group, row y=30: (S_v - y + w*GM)/(n_v - 1 + w)
    #   = (150 - 30 + 360)/(3 - 1 + 10) = 480/12 = 40.0
    null_enc = {y: e for y, e in by[None]}
    assert null_enc[30] == round((150 - 30 + 10 * gm) / 12, 4)
    assert null_enc[50] == round((150 - 50 + 10 * gm) / 12, 4)
    a_enc = {y: e for y, e in by["a"]}
    assert a_enc[10] == round((30 - 10 + 10 * gm) / 11, 4)
