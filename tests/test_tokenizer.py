"""BPE merge learning (operators/tokenizer.py): planted-corpus merges,
greedy left-to-right application, histogram scale shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid_data_pipeline_spark.operators.tokenizer import (
    apply_bpe_merges,
    bpe_compression_curve,
    learn_bpe_merges,
    word_histogram,
)


def _corpus(spark):
    # 'abab' x3 + 'abc' x2 + 'cc' x1: char pairs -> (a,b): 2*3+1*2 = 8,
    # (b,a): 1*3 = 3, (b,c): 2, (c,c): 1. Merge 1 must be (a,b)->ab.
    # After it: 'ab ab' / 'ab c' / 'c c': pairs (ab,ab)=3, (ab,c)=2,
    # (c,c)=1 -> merge 2 = (ab,ab)->abab.
    rows = [("abab abab abab",), ("abc abc",), ("cc",)]
    return spark.createDataFrame(rows, "text string")


def test_learn_bpe_merges_planted(spark):
    merges = learn_bpe_merges(_corpus(spark), num_merges=2).collect()
    assert [(r["step"], r["left_sym"], r["right_sym"], r["merged"]) for r in merges] == [
        (1, "a", "b", "ab"),
        (2, "ab", "ab", "abab"),
    ]
    assert merges[0]["pair_count"] == 8  # 2 per 'abab' x3 + 1 per 'abc' x2


def test_merge_application_is_greedy_left_to_right(spark):
    # 'aaa' with merge (a,a): greedy non-overlapping -> [aa, a], never
    # [a, aa] and never a double-count
    df = spark.createDataFrame([("aaa",)], "text string")
    out = apply_bpe_merges(df, [("a", "a")]).first()["bpe_tokens"]
    assert out == ["aa", "a"]


def test_apply_bpe_merges_roundtrip(spark):
    corpus = _corpus(spark)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in learn_bpe_merges(corpus, num_merges=2).collect()
    ]
    toks = apply_bpe_merges(corpus, merges).select("bpe_tokens").collect()
    flat = [t for r in toks for t in r["bpe_tokens"]]
    # every learned merge token appears; concatenation restores the corpus
    assert "abab" in flat
    joined = ["".join(r["bpe_tokens"]) for r in toks]
    assert joined == ["abababababab", "abcabc", "cc"]


def test_compression_curve_monotone(spark, sf_dir):
    from covid_data_pipeline_spark.harness.registry import table

    docs = table(spark, sf_dir, "documents")
    curve = {
        r["step"]: r["corpus_tokens"]
        for r in bpe_compression_curve(docs, num_merges=3).collect()
    }
    assert sorted(curve) == [0, 1, 2, 3]
    # each merge strictly reduces the corpus token count (the argmax
    # pair always has positive count on this corpus)
    for k in range(1, 4):
        assert curve[k] < curve[k - 1]


def test_word_histogram_filters_and_counts(spark):
    df = spark.createDataFrame(
        [("the the THE x-y 99 !!",), (None,), ("",)], "text string"
    )
    hist = {r["word"]: r["freq"] for r in word_histogram(df).collect()}
    # lowercased, ASCII-alnum only ('x-y' and '!!' dropped)
    assert hist == {"the": 3, "99": 1}


def test_histogram_iteration_is_vocab_sized(spark):
    """The corpus is touched once: every BPE iteration plans over the
    aggregated histogram, so the pair-count input row count equals the
    VOCABULARY size, not the corpus token count."""
    df = spark.createDataFrame(
        [("w%d" % (i % 7),) for i in range(1000)], "text string"
    )
    hist = word_histogram(df)
    assert hist.count() == 7  # 1000 corpus tokens -> 7 histogram rows


def test_local_fast_path_equals_distributed(spark, sf_dir):
    """learn_bpe_merges_local (collect-the-histogram large-K path) must
    produce the EXACT merge table of the distributed loop when the vocab
    cap does not bind — same pair counting, tiebreak, and greedy merge."""
    from covid_data_pipeline_spark.harness.registry import table
    from covid_data_pipeline_spark.operators.tokenizer import (
        learn_bpe_merges_local,
    )

    docs = table(spark, sf_dir, "documents")
    dist = [tuple(r) for r in learn_bpe_merges(docs, num_merges=6).collect()]
    local = [
        tuple(r) for r in learn_bpe_merges_local(docs, num_merges=6).collect()
    ]
    assert dist == local
    # and the local path reaches large K quickly — or terminates early
    # when every word has collapsed to a single symbol (no pairs left)
    many = learn_bpe_merges_local(docs, num_merges=200).collect()
    assert len(many) >= 50
    assert len({r["merged"] for r in many}) == len(many)  # no dup rules
