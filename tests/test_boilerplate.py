"""Inter-document boilerplate fraction: planted-document behavior."""

from __future__ import annotations

from covid_data_pipeline_spark.operators.boilerplate import boilerplate_fraction


def test_boilerplate_discriminates(spark):
    footer = "subscribe to our newsletter for updates"
    rows = [(f"b{i}", f"article number {i} " + footer) for i in range(10)]
    rows.append(("u0", "entirely original musings on ocelots and quasars"))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r for r in boilerplate_fraction(df, k=3, min_df=5).collect()}
    # the shared footer's 3-grams are hot (df=10 ≥ 5); the per-article
    # prefix ('article number <i>') grams are not
    assert got["u0"].boilerplate_frac == 0.0
    assert got["b0"].boilerplate_frac > 0.4
    assert got["b3"].n_grams == got["b0"].n_grams


def test_short_doc_whole_text_shingle(spark):
    # docs shorter than k collapse to one whole-text shingle (same rule
    # as word_shingles): two identical short docs + min_df=2 → hot
    df = spark.createDataFrame(
        [("a", "hi"), ("b", "hi"), ("c", "yo")], "doc_id string, text string"
    )
    got = {r.doc_id: r for r in boilerplate_fraction(df, k=3, min_df=2).collect()}
    assert got["a"].boilerplate_frac == 1.0 and got["a"].n_grams == 1
    assert got["c"].boilerplate_frac == 0.0
