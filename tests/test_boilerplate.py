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


def _span_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_strip_removes_shared_footer_keeps_unique(spark):
    from covid_data_pipeline_spark.operators.boilerplate import (
        strip_duplicate_spans,
    )

    footer = "subscribe to our newsletter for updates"
    rows = [(f"b{i}", f"original thought number{i} stands alone {footer}") for i in range(5)]
    rows.append(("u0", "entirely original musings on ocelots and quasars"))
    got = {
        r.doc_id: r
        for r in strip_duplicate_spans(
            _span_docs(spark, rows), k=5, min_df=2
        ).collect()
    }
    # each article keeps its unique head; the footer span is cut
    assert got["b0"].clean_text.startswith("original thought number0")
    assert "newsletter" not in got["b0"].clean_text
    assert got["b0"].n_spans == 1
    # untouched doc passes through normalized with zero counters
    assert got["u0"].clean_text == "entirely original musings on ocelots and quasars"
    assert got["u0"].n_removed == 0 and got["u0"].n_spans == 0


def test_strip_intra_doc_repetition_untouched(spark):
    from covid_data_pipeline_spark.operators.boilerplate import (
        strip_duplicate_spans,
    )

    # a phrase repeated INSIDE one doc is that doc's content: df counts
    # distinct documents, so min_df=2 never fires on a single doc
    rows = [("r1", "repeat me now " * 6), ("u1", "some other unrelated words here")]
    got = {
        r.doc_id: r
        for r in strip_duplicate_spans(
            _span_docs(spark, rows), k=5, min_df=2
        ).collect()
    }
    assert got["r1"].n_removed == 0


def test_strip_short_identical_docs_fully_removed(spark):
    from covid_data_pipeline_spark.operators.boilerplate import (
        strip_duplicate_spans,
    )

    # docs shorter than k collapse to one whole-text gram (word_shingles
    # rule): two identical short docs -> whole text is the hot span
    rows = [("s1", "tiny doc"), ("s2", "tiny doc"), ("s3", "other text")]
    got = {
        r.doc_id: r
        for r in strip_duplicate_spans(
            _span_docs(spark, rows), k=5, min_df=2
        ).collect()
    }
    assert got["s1"].clean_text == "" and got["s1"].n_removed == 2
    assert got["s1"].n_spans == 1
    assert got["s3"].clean_text == "other text"


def test_strip_overlapping_spans_merge(spark):
    from covid_data_pipeline_spark.operators.boilerplate import (
        strip_duplicate_spans,
    )

    # two docs share a 7-token run -> three overlapping hot 5-grams per
    # doc merge into ONE maximal span of 7 tokens
    shared = "alpha beta gamma delta epsilon zeta eta"
    rows = [("a", f"first unique prefix {shared}"), ("b", f"second head words {shared}")]
    got = {
        r.doc_id: r
        for r in strip_duplicate_spans(
            _span_docs(spark, rows), k=5, min_df=2
        ).collect()
    }
    assert got["a"].n_spans == 1 and got["a"].n_removed == 7
    assert got["a"].clean_text == "first unique prefix"


def test_strip_disjoint_spans_counted_separately(spark):
    from covid_data_pipeline_spark.operators.boilerplate import (
        strip_duplicate_spans,
    )

    head = "one two three four five"
    tail = "six seven eight nine ten"
    rows = [
        ("a", f"{head} aaa bbb ccc ddd eee fff {tail}"),
        ("b", f"{head} ggg hhh iii jjj kkk lll {tail}"),
    ]
    got = {
        r.doc_id: r
        for r in strip_duplicate_spans(
            _span_docs(spark, rows), k=5, min_df=2
        ).collect()
    }
    assert got["a"].n_spans == 2 and got["a"].n_removed == 10
    assert got["a"].clean_text == "aaa bbb ccc ddd eee fff"
