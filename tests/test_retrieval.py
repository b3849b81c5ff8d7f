"""BM25 + reciprocal-rank fusion (operators/retrieval.py)."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.retrieval import bm25_topk, rrf_fuse


def _docs(spark):
    rows = [
        (1, "spark spark spark join"),          # heavy on 'spark'
        (2, "spark join hash table"),            # one of each
        (3, "window agg batch window"),          # no query terms
        (4, "spark"),                            # short doc, one hit
        (5, "the the the the the the spark"),    # long, diluted
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_by_relevance(spark):
    q = spark.createDataFrame([(1, "spark join")], "query_id long, qtext string")
    out = bm25_topk(_docs(spark), q, k=10).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: -r["bm25"])]
    # doc 3 has no query term: absent
    assert 3 not in ranked
    # docs with both terms beat single-term docs
    assert set(ranked[:2]) == {1, 2}
    # short exact hit (4) beats the diluted long doc (5): length norm
    assert ranked.index(4) < ranked.index(5)
    # scores positive (Lucene idf is non-negative)
    assert all(r["bm25"] > 0 for r in out)


def test_bm25_partitioning_invariant(spark, sf_dir):
    from covid_data_pipeline_spark.harness.tables import table

    d = table(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(1, "spark hash join"), (2, "slow scan")],
        "query_id long, qtext string",
    )
    a = {(r["query_id"], r["doc_id"], r["bm25"]) for r in bm25_topk(d, q).collect()}
    b = {
        (r["query_id"], r["doc_id"], r["bm25"])
        for r in bm25_topk(d.repartition(13), q, k=10).collect()
    }
    assert a == b and len(a) > 0


def test_rrf_fusion_prefers_agreement(spark):
    # system A and B agree doc 10 is best; disagree on the rest.
    a = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7)],
        "query_id long, doc_id long, score double",
    )
    b = spark.createDataFrame(
        [(1, 10, 5.0), (1, 13, 4.0), (1, 12, 3.0)],
        "query_id long, doc_id long, score double",
    )
    out = rrf_fuse([a, b], k=4).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: -r["rrf_score"])]
    assert ranked[0] == 10                     # both rank-1
    assert ranked[1] == 12                     # ranked by both (3rd+3rd)
    # single-system docs score exactly one reciprocal contribution
    scores = {r["doc_id"]: r["rrf_score"] for r in out}
    assert scores[11] == 1_000_000_000 // 62
    assert scores[13] == 1_000_000_000 // 62
    assert scores[10] == 2 * (1_000_000_000 // 61)


def test_rrf_score_cols_validation(spark):
    a = spark.createDataFrame([(1, 1, 1.0)], "query_id long, doc_id long, s double")
    with pytest.raises(ValueError, match="score_cols"):
        rrf_fuse([a, a], score_cols=["s"])


def test_bm25_plan_stays_jvm_side(spark, sf_dir):
    from covid_data_pipeline_spark.harness.tables import table

    d = table(spark, sf_dir, "documents")
    q = spark.createDataFrame([(1, "spark join")], "query_id long, qtext string")
    df = bm25_topk(d, q, k=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no Python evaluation anywhere in the scoring path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # query-side joins are broadcast: the posting relation is not
    # shuffled for the match
    assert "BroadcastHashJoin" in plan


def test_bm25_max_df_stopword_valve(spark):
    rows = [(i, "the common filler spark" if i % 2 else "the common filler join")
            for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame(
        [(1, "the spark"), (2, "the common filler")],
        "query_id long, qtext string",
    )
    capped = bm25_topk(docs, q, k=5, max_df_frac=0.9).collect()
    # 'the'/'common'/'filler' hit every doc (df=100 > 90): dropped.
    # query 1 still scores via 'spark'; query 2 was ALL stopwords -> empty
    by_q = {}
    for r in capped:
        by_q.setdefault(r["query_id"], []).append(r)
    assert 1 in by_q and 2 not in by_q
    assert all(r["doc_id"] % 2 == 1 for r in by_q[1])  # only 'spark' docs
    # surviving-term scores unchanged vs an uncapped run restricted to
    # the same term
    uncapped = {
        (r["query_id"], r["doc_id"]): r["bm25"]
        for r in bm25_topk(
            docs,
            spark.createDataFrame([(1, "spark")], "query_id long, qtext string"),
            k=5,
        ).collect()
    }
    for r in by_q[1]:
        assert uncapped[(1, r["doc_id"])] == r["bm25"]


def test_phrase_search_overlaps_and_three_tokens(spark):
    """Adjacency join counts every occurrence, including overlapping
    runs, and generalizes past 2 tokens."""
    from covid_data_pipeline_spark.operators.retrieval import phrase_search

    docs = [
        (1, "x table hash y table hash"),   # 2 matches
        (2, "table x hash"),                # 0 (not adjacent)
        (3, "a a a a"),                     # overlapping runs
        (4, "table hash table hash table"), # 2 matches of 3-gram below
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    two = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "table hash").collect()
    }
    assert two == {1: (2, 2), 4: (2, 1)}
    aa = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "a a").collect()
    }
    assert aa == {3: (3, 1)}
    three = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "table hash table").collect()
    }
    assert three == {4: (2, 1)}
    import pytest

    with pytest.raises(ValueError):
        phrase_search(df, "solo")


def test_ndcg_perfect_reversed_and_disjoint(spark):
    """NDCG@k is 1 for a perfect ranking, the hand-computed value for a
    reversed one, and 0 for a system sharing nothing with truth."""
    import math

    from covid_data_pipeline_spark.operators.retrieval import ndcg_at_k

    k = 3
    truth = spark.createDataFrame(
        [(1, 101, 1), (1, 102, 2), (1, 103, 3)],
        "query_id long, vec_id long, rank int",
    )
    perfect = truth
    reverse = spark.createDataFrame(
        [(1, 103, 1), (1, 102, 2), (1, 101, 3)],
        "query_id long, vec_id long, rank int",
    )
    disjoint = spark.createDataFrame(
        [(1, 901, 1), (1, 902, 2), (1, 903, 3)],
        "query_id long, vec_id long, rank int",
    )
    assert ndcg_at_k(perfect, truth, k).first()["ndcg"] == 1.0
    assert ndcg_at_k(disjoint, truth, k).first()["dcg_micros"] == 0
    got = ndcg_at_k(reverse, truth, k).first()
    rel = {101: 3, 102: 2, 103: 1}
    dcg = sum(
        round(rel[d] * 1e6 / math.log2(p + 1))
        for p, d in enumerate([103, 102, 101], start=1)
    )
    idcg = sum(
        round(rel[d] * 1e6 / math.log2(p + 1))
        for p, d in enumerate([101, 102, 103], start=1)
    )
    assert got["dcg_micros"] == dcg
    assert got["idcg_micros"] == idcg
    assert got["ndcg"] == round(dcg / idcg, 4)
