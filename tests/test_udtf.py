"""Python UDTF surface (operators/udtf_ops.py): row-for-row parity with
the codegen'd chunker, SQL LATERAL usage, and argument validation."""

from __future__ import annotations

import pytest

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.operators.chunking import chunk_by_tokens
from covid_data_pipeline_spark.operators.udtf_ops import register_udtfs


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_udtfs(spark)


def test_udtf_matches_native_chunker(spark, sf_dir):
    """The UDTF and the explode+slice chunker produce the identical
    (doc_id, chunk_idx, chunk_text, chunk_tokens) set — proving the
    column-algebra path (the 100 TB one) computes the same thing the
    imperative description says."""
    docs = table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("udtf_docs")

    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.chunk_tokens
        FROM udtf_docs d, LATERAL chunk_tokens_udtf(d.text, 40, 8) c
        """
    )
    native = chunk_by_tokens(
        docs.select("doc_id", "text"), "text", chunk_size=40, overlap=8
    ).select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")

    assert via_udtf.count() == native.count() > 50
    assert via_udtf.exceptAll(native).isEmpty()
    assert native.exceptAll(via_udtf).isEmpty()


def test_udtf_short_doc_single_chunk(spark):
    rows = spark.sql(
        "SELECT * FROM chunk_tokens_udtf('Alpha Beta  Gamma', 40, 8)"
    ).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "alpha beta gamma"
    assert rows[0].chunk_tokens == 3


def test_udtf_overlap_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))
    rows = spark.sql(
        f"SELECT * FROM chunk_tokens_udtf('{text}', 4, 2)"
    ).collect()
    # stride 2 over 10 tokens -> chunks start at 0,2,4,6,8
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t2 t3 t4 t5"
    assert rows[4].chunk_text == "t8 t9"  # final short chunk


def test_udtf_bad_args_raise(spark):
    with pytest.raises(Exception, match="overlap"):
        spark.sql("SELECT * FROM chunk_tokens_udtf('x y z', 4, 4)").collect()


def test_polymorphic_udtf_schema_follows_constant_args(spark):
    from covid_data_pipeline_spark.operators.udtf_ops import TopTokensUDTF

    spark.udtf.register("top_tokens_t", TopTokensUDTF)
    flat = spark.sql("SELECT * FROM top_tokens_t('b a a c b a', 2, true)")
    assert flat.columns == ["rank", "token", "cnt"]
    assert [tuple(r) for r in flat.collect()] == [(1, "a", 3), (2, "b", 2)]

    wide = spark.sql("SELECT * FROM top_tokens_t('b a a c b a', 3, false)")
    assert wide.columns == [
        "token_1", "cnt_1", "token_2", "cnt_2", "token_3", "cnt_3"
    ]
    assert [tuple(r) for r in wide.collect()] == [("a", 3, "b", 2, "c", 1)]

    # fewer distinct tokens than k: wide row null-pads deterministically
    short = spark.sql("SELECT * FROM top_tokens_t('x x', 2, false)")
    assert [tuple(r) for r in short.collect()] == [("x", 2, None, None)]


def test_polymorphic_udtf_lateral_join(spark, sf_dir):
    from covid_data_pipeline_spark.harness.tables import table
    from covid_data_pipeline_spark.operators.udtf_ops import TopTokensUDTF

    spark.udtf.register("top_tokens_t2", TopTokensUDTF)
    table(spark, sf_dir, "documents").limit(20).createOrReplaceTempView(
        "docs_sample"
    )
    out = spark.sql(
        """SELECT d.doc_id, t.rank, t.token, t.cnt
           FROM docs_sample d, LATERAL top_tokens_t2(d.text, 3, true) t"""
    )
    rows = out.collect()
    assert len(rows) == 60  # 20 docs x top-3
    assert all(1 <= r["rank"] <= 3 and r["cnt"] >= 1 for r in rows)
