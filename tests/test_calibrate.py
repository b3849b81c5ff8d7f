"""quantile_normalize: within-group order preserved, normalized
distributions coincide across groups, singleton maps to pooled median."""

from __future__ import annotations

from covid_data_pipeline_spark.operators.calibrate import quantile_normalize


def test_quantile_normalize_contract(spark):
    rows = (
        # group a: low-shifted scores
        [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
        # group b: high-shifted, same size
        + [("b", 10 + i, float(v)) for i, v in enumerate([11, 12, 13, 14, 15])]
        # group c: singleton
        + [("c", 99, 7.0)]
    )
    df = spark.createDataFrame(rows, "src string, id long, score double")
    out = quantile_normalize(
        df, group_col="src", val_col="score", id_col="id", out_col="norm"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append((r["score"], r["norm"]))
    for src in ("a", "b"):
        vals = sorted(by_src[src])
        norms = [n for _, n in vals]
        # order preserved
        assert norms == sorted(norms)
    # equal-size groups land on identical normalized distributions
    assert [n for _, n in sorted(by_src["a"])] == [
        n for _, n in sorted(by_src["b"])
    ]
    # min of every group -> pooled min; max -> pooled max
    pooled = sorted(x[2] for x in rows)
    assert sorted(by_src["a"])[0][1] == pooled[0]
    assert sorted(by_src["a"])[-1][1] == pooled[-1]
    # singleton -> pooled median position 1 + (N-1)//2 = 6th of 11
    assert by_src["c"][0][1] == pooled[5]
    # row count preserved (range join hit exactly one interval per row)
    assert len(out) == len(rows)


def test_quantile_normalize_partitioning_invariant(spark):
    rows = [("g%d" % (i % 3), i, float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "src string, id long, score double")
    a = quantile_normalize(df.repartition(1), "src", "score", "id")
    b = quantile_normalize(df.repartition(13), "src", "score", "id")
    ra = sorted((r["id"], r["norm_value"]) for r in a.collect())
    rb = sorted((r["id"], r["norm_value"]) for r in b.collect())
    assert ra == rb


def test_isotonic_fit_hand_case_and_monotone(spark):
    """PAV pools adjacent violators into weighted means; output is
    non-decreasing and matches the hand-solved case."""
    from covid_data_pipeline_spark.operators.calibrate import isotonic_fit

    rows = [
        ("g", 1, 1, 10),
        ("g", 2, 5, 10),
        ("g", 3, 3, 10),
        ("g", 4, 2, 10),
        ("g", 5, 8, 10),
    ]
    df = spark.createDataFrame(rows, "grp string, x int, s long, w long")
    got = {
        r["x"]: r["iso_value"]
        for r in isotonic_fit(df, "grp", "x", "s", "w").collect()
    }
    assert got[1] == 0.1
    assert got[2] == got[3] == got[4] == 10 / 30
    assert got[5] == 0.8
    vals = [got[x] for x in sorted(got)]
    assert vals == sorted(vals)


def test_isotonic_fit_already_monotone_is_identity(spark):
    from covid_data_pipeline_spark.operators.calibrate import isotonic_fit

    rows = [("g", i, i, 10) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "grp string, x int, s long, w long")
    got = {
        r["x"]: r["iso_value"]
        for r in isotonic_fit(df, "grp", "x", "s", "w").collect()
    }
    assert got == {i: i / 10 for i in range(1, 6)}
