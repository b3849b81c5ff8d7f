"""Bigram-LM perplexity operator: planted-document behavior, pruned-model
smoothing fallback, and bigram extraction edge cases."""

from __future__ import annotations

from covid_data_pipeline_spark.operators.langmodel import (
    bigram_perplexity,
    doc_bigrams,
    score_bigram_perplexity,
    train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_doc_bigrams_edges(spark):
    df = _docs(
        spark,
        [
            ("d1", "a b c"),
            ("d2", "solo"),
            ("d3", ""),
            ("d4", None),
            ("d5", "  x   y  "),  # ragged whitespace collapses
        ],
    )
    got = {(r.doc_id, r.w1, r.w2) for r in doc_bigrams(df).collect()}
    assert got == {("d1", "a", "b"), ("d1", "b", "c"), ("d5", "x", "y")}


def test_boilerplate_scores_lower_perplexity(spark):
    # 20 near-identical boilerplate docs + 1 doc of corpus-unique tokens:
    # the repeated phrasing dominates the model, so boilerplate bigrams
    # are high-probability and the unique doc sits far in the tail.
    boiler = [(f"b{i}", "click here to subscribe to our newsletter today") for i in range(20)]
    rare = [("r0", "zygote quasar bismuth ocelot fjord plinth")]
    scored = bigram_perplexity(_docs(spark, boiler + rare)).collect()
    by_id = {r.doc_id: r for r in scored}
    assert by_id["r0"].perplexity > by_id["b0"].perplexity * 3
    assert by_id["b0"].n_bigrams == 7
    # every boilerplate doc scores identically (same text)
    assert len({by_id[f"b{i}"].perplexity for i in range(20)}) == 1


def test_pruned_model_unseen_fallback(spark):
    # min_count=2 prunes every bigram of the singleton doc; scoring it
    # against the pruned model must hit the ln(1/V)-floor path
    # (coalesce cb→0) rather than dropping rows or raising.
    corpus = _docs(
        spark,
        [(f"c{i}", "the cat sat on the mat") for i in range(3)] + [("c9", "lone pair")],
    )
    cb, cu, v = train_bigram_lm(corpus, min_count=2)
    assert cb.filter("w1 = 'lone'").count() == 0  # pruned
    target = _docs(spark, [("t0", "lone pair"), ("t1", "the cat")])
    scored = {r.doc_id: r for r in score_bigram_perplexity(target, cb, cu, v).collect()}
    assert scored["t0"].n_bigrams == 1
    # unseen/pruned bigram ('lone','pair'): floor prob (0+1)/(cu+V) is
    # far below the well-attested ('the','cat') probability
    assert scored["t0"].perplexity > scored["t1"].perplexity


def test_external_reference_corpus(spark):
    # Score web-docs against a clean reference corpus: a doc phrased
    # like the reference beats a doc the reference never saw.
    ref = _docs(spark, [(f"r{i}", "the quick brown fox jumps over the lazy dog") for i in range(5)])
    docs = _docs(spark, [("in", "the quick brown fox"), ("out", "qwerty azerty dvorak colemak")])
    scored = {r.doc_id: r for r in bigram_perplexity(docs, reference=ref).collect()}
    assert scored["in"].perplexity < scored["out"].perplexity


def test_kneser_ney_matches_hand_formula(spark):
    """KN probabilities equal the hand-computed formula on a tiny
    corpus, and per-context mass (seen part + backoff over ALL types)
    sums to 1."""
    from collections import Counter

    from covid_data_pipeline_spark.operators.langmodel import (
        kneser_ney_bigrams,
    )

    docs = [(1, "a b a b a c"), (2, "b a b c a b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n_pairs"], r["p_kn"])
        for r in kneser_ney_bigrams(df, top_n=100).collect()
    }
    # reference counts
    cb = Counter()
    for _, t in docs:
        w = t.split()
        for i in range(len(w) - 1):
            cb[(w[i], w[i + 1])] += 1
    cl = Counter()
    nl = Counter()
    nr = Counter()
    for (w1, w2), c in cb.items():
        cl[w1] += c
        nl[w1] += 1
        nr[w2] += 1
    T = len(cb)
    d = 0.75
    for (w1, w2), c in cb.items():
        p = (c - d) / cl[w1] + ((d * nl[w1]) / cl[w1]) * (nr[w2] / T)
        assert got[(w1, w2)] == (c, round(p, 6)), (w1, w2)
    # mass identity per context w1: seen + lambda * (unseen continuation
    # mass) == 1, where summing nr/T over ALL bigram-type w2 gives 1
    for w1 in cl:
        seen = sum(
            (c - d) / cl[w1] for (a, _), c in cb.items() if a == w1
        )
        lam = (d * nl[w1]) / cl[w1]
        total = seen + lam * sum(nr[w2] / T for w2 in nr)
        assert abs(total - 1.0) < 1e-12
