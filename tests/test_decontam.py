"""Decontamination, PII scrub, and repetition-signal unit behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_data_pipeline_spark.functions.text import (
    repetition_fraction,
    scrub_pii,
)
from covid_data_pipeline_spark.operators.decontam import (
    contaminated_ids,
    decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


BENCH_SENT = "the quick brown fox jumps over the lazy dog tonight"


def test_mid_document_overlap_is_caught(spark):
    corpus = _docs(
        spark,
        [
            (1, f"intro words then {BENCH_SENT} and a long tail of filler"),
            (2, "completely unrelated content about spark partitions and shuffles"),
            (3, "short doc"),
        ],
    )
    bench = _docs(spark, [(100, BENCH_SENT)])
    dirty = {r["doc_id"] for r in contaminated_ids(corpus, bench, ngram=8).collect()}
    assert dirty == {1}
    clean = {r["doc_id"] for r in decontaminate(corpus, bench, ngram=8).collect()}
    assert clean == {2, 3}


def test_short_docs_fall_back_to_whole_gram(spark):
    # Benchmark doc shorter than the ngram: exact short copies in the
    # corpus must still be caught via the whole-document gram.
    corpus = _docs(spark, [(1, "tiny eval answer"), (2, "tiny eval answer plus")])
    bench = _docs(spark, [(100, "tiny eval answer")])
    dirty = {r["doc_id"] for r in contaminated_ids(corpus, bench, ngram=8).collect()}
    assert dirty == {1}  # doc 2's whole-gram differs — no overlap


def test_hashed_and_raw_gram_paths_agree(spark):
    rows = [(i, f"document {i} body {BENCH_SENT if i % 3 == 0 else 'clean text here'} end") for i in range(12)]
    corpus = _docs(spark, rows)
    bench = _docs(spark, [(100, BENCH_SENT)])
    hashed = {r["doc_id"] for r in contaminated_ids(corpus, bench, hash_grams=True).collect()}
    raw = {r["doc_id"] for r in contaminated_ids(corpus, bench, hash_grams=False).collect()}
    assert hashed == raw == {0, 3, 6, 9}


def test_scrub_pii_redacts_emails_and_ids(spark):
    df = spark.createDataFrame(
        [(1, "Mail Bob.Smith+x@Sub.Example.ORG or ssn 123-45-6789 ok")],
        "doc_id LONG, text STRING",
    )
    out = df.select(scrub_pii("text").alias("t")).first()["t"]
    assert out == "Mail [EMAIL] or ssn [ID] ok"


def test_repetition_fraction_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 trigrams, 3 distinct
            (2, "all distinct words in this one sentence"),
            (3, "two words"),  # shorter than k → 0.0
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: r["f"]
        for r in df.select("doc_id", F.round(repetition_fraction("text"), 4).alias("f")).collect()
    }
    assert got[1] == round(1 - 3 / 7, 4)
    assert got[2] == 0.0
    assert got[3] == 0.0
