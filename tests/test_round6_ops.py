"""Round-6 operator additions: MMR rerank, Naive Bayes confusion,
Mann-Whitney U, RAKE keywords, position-based attribution weights."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): slow tier; full suite
# runs per round via `pytest tests/ -m ""`.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F


def test_mmr_rerank_diversifies(spark):
    """Three near-identical vectors + one orthogonal: plain top-3 keeps
    the clones; MMR's second pick must be the orthogonal vector."""
    from covid_data_pipeline_spark.operators.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0]),          # query
        (1, [0.999, 0.01, 0.0]),       # clone a
        (2, [0.998, 0.02, 0.0]),       # clone b
        (3, [0.997, 0.03, 0.0]),       # clone c
        (4, [0.2, 0.0, 1.0]),          # off-axis but query-relevant
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = mmr_rerank(df, queries, k=3, shortlist=4)
    got = {r["rank"]: r["vec_id"] for r in out.collect()}
    assert got[1] == 1  # most similar first
    assert got[2] == 4  # diversity pick beats the remaining clones
    # scores are integer bp and ranks are a permutation of 1..3
    assert sorted(got) == [1, 2, 3]


def test_mmr_rerank_partitioning_invariant(spark):
    from covid_data_pipeline_spark.operators.similarity import mmr_rerank

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = df.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, mmr_rerank(df, queries, k=5).collect()))
    b = sorted(
        map(tuple, mmr_rerank(df.repartition(13), queries, k=5).collect())
    )
    assert a == b


def test_naive_bayes_separates_planted_classes(spark):
    """Two vocab-disjoint classes must classify perfectly held-out."""
    from covid_data_pipeline_spark.operators.classifier import (
        naive_bayes_confusion,
    )

    rows = [
        (i, "apple banana cherry apple", "fruit") for i in range(40)
    ] + [(100 + i, "bolt nut washer bolt", "hardware") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    conf = {
        (r["lang"], r["pred_lang"]): r["n_docs"]
        for r in naive_bayes_confusion(df).collect()
    }
    assert conf == {("fruit", "fruit"): 20, ("hardware", "hardware"): 20}


def test_mann_whitney_detects_shift(spark):
    """Treatment values strictly above control: AUC = 1, big positive z;
    identical distributions: AUC = 0.5, z = 0."""
    from covid_data_pipeline_spark.operators.experiment import mann_whitney_u

    shifted = spark.createDataFrame(
        [(i, True) for i in range(100, 150)]
        + [(i, False) for i in range(50)],
        "value_cents long, treat boolean",
    )
    r = mann_whitney_u(shifted).collect()[0]
    assert (r["n_treat"], r["n_ctrl"]) == (50, 50)
    assert r["auc"] == 1.0 and r["u2_treat"] == 2 * 50 * 50
    assert r["z"] > 5

    flat = spark.createDataFrame(
        [(i % 10, i < 50) for i in range(100)],
        "value_cents long, treat boolean",
    )
    r2 = mann_whitney_u(flat).collect()[0]
    assert r2["auc"] == 0.5 and r2["z"] == 0.0


def test_rake_prefers_high_degree_cooccurring_words(spark):
    from covid_data_pipeline_spark.operators.retrieval import rake_keywords

    rows = [
        (0, "deep learning is the best of deep learning"),
        (1, "deep learning and shallow parsing"),
        (2, "the cat sat on a mat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rake_keywords(
        df,
        stopwords=("the", "a", "and", "of", "is", "on"),
        max_phrase_len=3,
        k=5,
    ).collect()
    by_phrase = {r["phrase"]: r for r in out}
    dl = by_phrase["deep learning"]
    # deg/freq: each member word scores 2000 milli -> phrase 4000; the
    # 2-word phrases tie at the top and singletons score strictly lower
    assert dl["score_milli"] == 4000
    assert dl["phrase_freq"] == 3  # two docs, three phrase occurrences
    assert dl["score_milli"] == max(r["score_milli"] for r in out)
    assert by_phrase["mat"]["score_milli"] < dl["score_milli"]


def test_attribution_position_weights_sum_to_10000(spark, sf_dir):
    from covid_data_pipeline_spark.harness.registry import QUERIES

    out = QUERIES["attribution_position"].fn(spark, sf_dir)
    bad = (
        out.groupBy("purchase_id")
        .agg(F.sum("w_bp").alias("s"), F.max("n_touches").alias("n"))
        .where(F.col("s") != 10000)
        .count()
    )
    assert bad == 0
    # first and last of any 3+ journey carry 4000 bp each
    edge = out.where(
        (F.col("n_touches") >= 3)
        & ((F.col("pos") == 1) | (F.col("pos") == F.col("n_touches")))
        & (F.col("w_bp") != 4000)
    ).count()
    assert edge == 0


def test_pii_scrub_counts_and_redacts(spark):
    from covid_data_pipeline_spark.operators.quality import pii_scrub

    rows = [
        (0, "mail me at jo.doe@corp.example.org or call 415-555-0199"),
        (1, "server at 192.168.0.12 answered"),
        (2, "nothing sensitive here"),
        (3, "two mails a@b.io c@d.ai and ip 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[0]["n_emails"], got[0]["n_phones"], got[0]["n_ips"]) == (1, 1, 0)
    assert got[0]["redacted"] == "mail me at <EMAIL> or call <PHONE>"
    assert got[1]["redacted"] == "server at <IP> answered"
    assert got[2]["redacted"] == rows[2][1]
    assert got[3]["n_emails"] == 2 and got[3]["n_ips"] == 1
    assert got[3]["redacted"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_mmr_rerank_matches_reference_greedy(spark):
    """The distributed MMR must equal an independent driver-side greedy
    reference on the same integer-bp similarities (deterministic
    pseudo-random vectors; no Spark machinery in the reference)."""
    import math

    from covid_data_pipeline_spark.operators.similarity import mmr_rerank

    def vec(i):
        return [((i * 37 + j * 11) % 19) / 19.0 - 0.4 for j in range(8)]

    rows = [(i, vec(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        map(tuple, mmr_rerank(df, queries, k=6, shortlist=12).collect())
    )

    def bp(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(d / (na * nb) * 10000 + 0.5)

    expect = []
    for qid in (0, 1):
        qv = dict(rows)[qid]
        sq = {i: bp(v, qv) for i, v in rows if i != qid}
        short = sorted(sq, key=lambda i: (-sq[i], i))[:12]
        sel = []
        for rank in range(1, 7):
            best = None
            for d in short:
                if d in sel:
                    continue
                mx = max((bp(dict(rows)[d], dict(rows)[s]) for s in sel),
                         default=0)
                cand = (-(sq[d] - mx), d)
                if best is None or cand < best:
                    best = cand
            sel.append(best[1])
            expect.append((qid, rank, best[1], -best[0]))
    assert got == sorted(expect)


def test_hits_int_rejects_zero_iters(spark):
    """ADVICE r5: iters=0 used to dereference an unbound authority
    relation; now it's a loud contract error."""
    import pytest

    from covid_data_pipeline_spark.operators.graph import hits_int

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="iters >= 1"):
        hits_int(edges, iters=0)
    # and one legitimate iteration still works end-to-end
    out = {r["node"]: r for r in hits_int(edges, iters=1).collect()}
    assert set(out) == {1, 2, 3}


def test_two_proportion_ztest_basics(spark):
    from covid_data_pipeline_spark.operators.experiment import (
        two_proportion_ztest,
    )

    # planted: treat converts 60/100, ctrl 40/100
    rows = [(True, i < 60) for i in range(100)] + [
        (False, i < 40) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "treat boolean, converted boolean")
    r = two_proportion_ztest(df).collect()[0]
    assert (r["conv_treat"], r["conv_ctrl"]) == (60, 40)
    assert r["lift_bp"] == 5000  # +50%
    assert 2.5 < r["z"] < 3.2  # classic 0.6-vs-0.4 at n=100: z ~ 2.83

    # degenerate (everybody converts): z is NULL, not a crash
    sat = spark.createDataFrame(
        [(i % 2 == 0, True) for i in range(50)],
        "treat boolean, converted boolean",
    )
    r2 = two_proportion_ztest(sat).collect()[0]
    assert r2["z"] is None
