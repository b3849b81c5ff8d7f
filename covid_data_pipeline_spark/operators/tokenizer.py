"""Distributed BPE merge learning — tokenizer training as a Spark plan.

The reference pipeline stops at consuming text; a training-data engine
also has to PRODUCE the tokenizer: byte-pair-encoding merge rules
learned from the corpus (Sennrich et al. 2016, the construction behind
GPT/Llama-family vocabularies). The classic formulation is
histogram-based, which is exactly what makes it scale-right on Spark:

1. ONE pass over the corpus builds the word histogram ``(word, freq)``
   — a hash aggregation with map-side combine, the only corpus-sized
   shuffle in the whole algorithm.
2. Every merge iteration then runs on the HISTOGRAM (vocabulary-sized,
   millions of rows at web scale — not the 100 TB corpus): count
   adjacent symbol pairs weighted by word frequency, take the global
   argmax, rewrite the symbol strings with the merged pair.
3. The per-iteration driver traffic is ONE row (the winning pair) —
   the same legitimate metadata-collect pattern as k-means centroids.

Symbol strings keep an invariant of exactly TWO spaces in every gap and
at both ends (``"  h  e  l  l  o  "``); a merge application is then the
plain substring replace of ``" l  r "`` with ``" lr "`` — each match
consumes ONE space from each flanking gap, so (a) the two-space
invariant is restored around the merged symbol and (b) two merge sites
sharing a gap can BOTH match in one left-to-right pass, which makes a
single engine-native ``replace`` EXACTLY the greedy non-overlapping
merge of textbook BPE (with single-space gaps, adjacent sites share the
boundary space and every other occurrence is missed). Spark
(`F.replace`) and DuckDB (`replace`) scan identically, which makes the
whole training loop value-hash ORACLE-ABLE by unrolling iterations as
chained CTEs (the PageRank-unroll pattern). Ties on pair count break
deterministically (count DESC, left ASC, right ASC).

Words are restricted to ``[a-z0-9]+`` so the per-character split is
byte/rune-agnostic on both engines (Java regex walks UTF-16 units,
RE2 walks runes — they only agree on ASCII; real multilingual BPE
would pre-encode to bytes, which is a representation choice, not an
algorithm change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_histogram", "learn_bpe_merges", "apply_bpe_merges"]

WORD_RE = "^[a-z0-9]+$"


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens of the lowercased corpus,
    filtered to ASCII alnum words. The single corpus-sized aggregation
    BPE training needs; everything downstream is vocabulary-sized."""
    from covid_data_pipeline_spark.functions.text import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _to_symbols(word) -> F.Column:
    """``"  h  e  l  l  o  "`` — one symbol per character with the
    two-space gap/end invariant the greedy merge replace relies on."""
    return F.concat(F.lit("  "), F.regexp_replace(word, "(.)", "$1  "))


def _merge_expr(sym, l: str, r: str) -> F.Column:
    """Apply merge (l, r) to a symbol string: consumes one space per
    flanking gap, restores the invariant around the merged symbol."""
    return F.replace(sym, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))


def _bpe_train(
    df: DataFrame, text_col: str, num_merges: int
) -> tuple[list[tuple[int, str, str, str, int]], list[tuple[int, int]]]:
    """Shared training loop: returns (merge rules, per-step corpus token
    counts including step 0 = character tokenization)."""
    hist = (
        word_histogram(df, text_col)
        .select(_to_symbols(F.col("word")).alias("w"), F.col("freq").alias("f"))
        # the histogram feeds every iteration's pair count AND the next
        # rewrite — cut lineage once so iteration N does not replan 1..N-1
        .localCheckpoint(eager=False)
    )

    def corpus_tokens(rel: DataFrame) -> int:
        return rel.agg(
            F.sum(F.size(F.split(F.trim(F.col("w")), "  ")) * F.col("f"))
        ).collect()[0][0] or 0

    merges: list[tuple[int, str, str, str, int]] = []
    curve: list[tuple[int, int]] = [(0, corpus_tokens(hist))]
    w = hist
    for step in range(1, num_merges + 1):
        arr = F.split(F.trim(F.col("w")), "  ")
        pairs = (
            w.select(
                F.col("f"),
                F.explode(
                    F.zip_with(
                        F.slice(arr, 1, F.size(arr) - 1),
                        F.slice(arr, 2, F.size(arr) - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("f").alias("cnt"))
        )
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("l"), F.col("r")
        ).limit(1).collect()
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merges.append((step, l, r, l + r, cnt))
        w = w.select(
            _merge_expr(F.col("w"), l, r).alias("w"), "f"
        ).localCheckpoint(eager=False)
        curve.append((step, corpus_tokens(w)))
    return merges, curve


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 4,
) -> DataFrame:
    """Learn ``num_merges`` BPE merge rules; returns a small DataFrame
    ``(step, left_sym, right_sym, merged, pair_count)`` with step
    1..num_merges in learning order.

    Scale shape: iteration cost is a pair-count aggregation over the
    word histogram (vocab-sized; pairs explode ≤ word-length-fold) plus
    a 1-row collect. At 100 TB the histogram is a few GB — every
    iteration is seconds, and the corpus is touched exactly once."""
    merges, _ = _bpe_train(df, text_col, num_merges)
    return df.sparkSession.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, merged string, "
        "pair_count bigint",
    )


def bpe_compression_curve(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 4,
) -> DataFrame:
    """(step, corpus_tokens): total corpus token count after each merge,
    step 0 = pure character tokenization — the compression curve that
    tells a tokenizer build when merges stop paying for vocab slots."""
    _, curve = _bpe_train(df, text_col, num_merges)
    return df.sparkSession.createDataFrame(
        curve, "step int, corpus_tokens bigint"
    )


def learn_bpe_merges_local(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_vocab: int = 1_000_000,
) -> DataFrame:
    """Large-K BPE training: the distributed loop costs two Spark jobs
    PER MERGE — right for few merges over an unboundedly large vocab,
    wrong for the thousands of merges a real tokenizer needs. This path
    collects the word histogram (vocab-sized — the ONLY corpus-derived
    state BPE training ever needs; capped at ``max_vocab`` words by
    frequency with a deterministic (freq DESC, word ASC) cut, exactly
    how production BPE trainers bound memory) and runs the merge loop
    driver-side with indexed pair updates.

    Semantics are IDENTICAL to :func:`learn_bpe_merges` when the cap
    does not bind: same adjacent-pair counting, same (count DESC,
    left ASC, right ASC) tiebreak, same greedy left-to-right merge —
    equality is pytest-asserted. The Spark cluster does what it is good
    at (the one corpus-sized aggregation + top-k); the driver does the
    sequential part that is inherently iterative."""
    hist_rows = (
        word_histogram(df, text_col)
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_vocab)
        .collect()
    )
    # word -> (symbols tuple, freq)
    words: dict[str, tuple[tuple[str, ...], int]] = {
        r["word"]: (tuple(r["word"]), r["freq"]) for r in hist_rows
    }

    def pair_counts() -> dict[tuple[str, str], int]:
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        return counts

    def merge_word(syms: tuple[str, ...], l: str, r: str) -> tuple[str, ...]:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2  # greedy left-to-right, non-overlapping
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, num_merges + 1):
        counts = pair_counts()
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, cnt))
        words = {
            w: (merge_word(syms, l, r), f) if l in syms and r in syms
            else (syms, f)
            for w, (syms, f) in words.items()
        }

    return df.sparkSession.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, merged string, "
        "pair_count bigint",
    )


def apply_bpe_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, split
    to characters and apply every merge in learning order (the standard
    BPE inference, expressed as a chain of substring replaces — pure
    codegen'd projection, zero shuffle, no UDF). Adds ``out_col`` as
    array<string> of the document's BPE tokens in order."""
    from covid_data_pipeline_spark.functions.text import let, tokens

    def encode_word(word) -> F.Column:
        sym = _to_symbols(word)
        for l, r in merges:
            sym = _merge_expr(sym, l, r)
        return F.split(F.trim(sym), "  ")

    toks = F.filter(tokens(F.col(text_col)), lambda t: t.rlike(WORD_RE))
    return df.withColumn(
        out_col, let(toks, lambda ts: F.flatten(F.transform(ts, encode_word)))
    )
