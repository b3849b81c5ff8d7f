"""DSIR importance-weighting selector (`operators/selection.py`)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _toy_corpus(spark):
    # 4 "wiki-like" docs (the target slice), 4 "spam-like", 2 mixed.
    rows = []
    for i in range(4):
        rows.append((i, f"the quick brown fox jumps over the lazy dog {i}", "wiki"))
    for i in range(4, 8):
        rows.append((i, f"buy cheap pills now click here win money {i}", "spam"))
    rows.append((8, "the quick brown fox buy cheap pills", "raw"))
    rows.append((9, "lazy dog click here", "raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_dsir_weights_separate_target_from_offtarget(spark):
    from covid_data_pipeline_spark.operators.selection import dsir_weights

    docs = _toy_corpus(spark)
    w = dsir_weights(docs, F.col("kind") == "wiki", n_buckets=256)
    scores = {r["doc_id"]: r["dsir_log_weight"] for r in w.collect()}
    assert len(scores) == 10
    # every wiki doc must outscore every spam doc under the wiki target
    assert min(scores[i] for i in range(4)) > max(scores[i] for i in range(4, 8))
    # the mixed docs sit strictly between the two blocks
    for mid in (8, 9):
        assert max(scores[i] for i in range(4, 8)) < scores[mid]
        assert scores[mid] < min(scores[i] for i in range(4))


def test_dsir_weights_deterministic_under_repartition(spark):
    from covid_data_pipeline_spark.operators.selection import dsir_weights

    docs = _toy_corpus(spark)
    a = dsir_weights(docs, F.col("kind") == "wiki", n_buckets=256).collect()
    b = dsir_weights(
        docs.repartition(7), F.col("kind") == "wiki", n_buckets=256
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dsir_select_topk_picks_target_like_docs(spark):
    from covid_data_pipeline_spark.operators.selection import dsir_select_topk

    docs = _toy_corpus(spark)
    picked = dsir_select_topk(docs, F.col("kind") == "wiki", k=5, n_buckets=256)
    ids = {r["doc_id"] for r in picked.collect()}
    assert len(ids) == 5
    assert set(range(4)) <= ids  # all wiki docs make the cut
    # the 5th slot goes to a mixed doc, never to pure spam
    assert ids - set(range(4)) <= {8, 9}


def test_dsir_single_token_and_whitespace_docs_do_not_crash(spark):
    from covid_data_pipeline_spark.operators.selection import dsir_weights

    docs = spark.createDataFrame(
        [(0, "one", "t"), (1, "  ", "r"), (2, "a b", "r")],
        "doc_id long, text string, kind string",
    )
    got = dsir_weights(docs, F.col("kind") == "t", n_buckets=64).collect()
    assert len(got) == 3
