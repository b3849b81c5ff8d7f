"""Distributed n-gram language-model scoring (CCNet-style quality signal).

The reference pipeline scores document quality with cheap heuristics
(SURVEY §2 text rows); large-scale curation pipelines add a model-based
signal: train a smoothed bigram LM on a reference corpus and rank
documents by perplexity (CCNet, Wenzek et al. 2020 — low-perplexity
documents read like the reference corpus; the high tail is noise).

Spark-first shape:

- Bigram extraction is a zero-shuffle projection: ``zip_with`` over the
  token array and its shift — no posexplode self-join.
- Counts are one ``groupBy`` each; the context (unigram) counts are
  derived FROM the bigram counts (``sum(cb) GROUP BY w1``) so the corpus
  is tokenized and shuffled once, not twice.
- The vocabulary size rides a broadcast cross join (1-row aggregate) —
  no driver-side collect, same pattern as the TF-IDF corpus count.
- Scoring joins the exploded bigrams to the model. At 100 TB the model
  relation is corpus-bounded (distinct bigrams), so the joins are plain
  shuffle hash joins on (w1, w2) / (w1); prune with ``min_count`` to get
  a broadcast-able model, unseen bigrams fall back to the smoothing
  floor.

Float policy: Laplace smoothing keeps every per-bigram probability a
ratio of integers — ``ln((cb + 1) / (cu + V))`` is bit-identical across
engines; only the per-document mean needs the usual ROUND guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from covid_data_pipeline_spark.functions.scalar import round_stable

from covid_data_pipeline_spark.functions.text import let, tokens


def doc_bigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Explode each document into its consecutive whitespace-token pairs
    ``(id_col, w1, w2)``. Pure projection + explode — no shuffle. A
    single-token or empty document contributes no rows (the zip_with
    null-padding on the shifted array is filtered out)."""

    def _pairs(toks: Column) -> Column:
        shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
        return F.zip_with(
            toks,
            shifted,
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )

    return (
        df.select(id_col, F.explode(let(tokens(text_col), _pairs)).alias("p"))
        .select(id_col, "p.w1", "p.w2")
        .filter(F.col("w2").isNotNull())
    )


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count-based bigram LM from a reference corpus.

    Returns ``(bigram_counts, context_counts, vocab)``:

    - ``bigram_counts``: (w1, w2, cb) — pairs with fewer than
      ``min_count`` occurrences are pruned (at scale this is what makes
      the model broadcast-able; scoring treats pruned pairs as unseen).
    - ``context_counts``: (w1, cu) — derived from the UNPRUNED bigram
      counts by a map-side ``sum`` regroup, so pruning never skews the
      denominator and the corpus shuffles once.
    - ``vocab``: 1-row (vocab_size) for the Laplace denominator.
    """
    pairs = doc_bigrams(corpus, text_col, id_col)
    # cb_all feeds both the context regroup and the model, but a
    # lineage cut here measured SLOWER in an isolated sf0.1 A/B (the
    # two consumers recompute in PARALLEL stages of one job, while the
    # cut serializes the DAG and pays block materialization) — left
    # uncut deliberately (r10 optimization round).
    cb_all = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    context = cb_all.groupBy("w1").agg(F.sum("cb").alias("cu"))
    cb = cb_all.filter(F.col("cb") >= min_count) if min_count > 1 else cb_all
    vocab = (
        corpus.select(F.explode(tokens(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    return cb, context, vocab


def score_bigram_perplexity(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Laplace-smoothed bigram log-likelihood:

    ``lp(w1, w2) = ln((cb + 1) / (cu + V))``

    Unseen bigrams (absent from a pruned model, or w1 itself unseen)
    coalesce to cb=0 / cu=0 — the smoothing floor ``ln(1 / V)``.

    Returns (id_col, n_bigrams, avg_logprob, perplexity); documents with
    no bigram (≤1 token) drop out. avg_logprob is rounded to 4 and
    perplexity (``exp(-avg lp)``) to 2 per the cross-engine float
    policy — each lp is a ratio of integers, so only summation order
    needs the guard.
    """
    pairs = doc_bigrams(docs, text_col, id_col)
    lp = (
        pairs.join(bigram_counts, ["w1", "w2"], "left")
        .join(context_counts, ["w1"], "left")
        # bcast: const(1) scalar vocab-size agg
        .join(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("vocab_size"))
            ).alias("lp"),
        )
    )
    avg_lp = F.avg("lp")
    return lp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        round_stable(avg_lp, 4).alias("avg_logprob"),
        F.round(F.exp(-avg_lp), 2).alias("perplexity"),
    )


def bigram_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference: DataFrame | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Train on ``reference`` (default: the documents themselves —
    self-perplexity, the usual boilerplate/outlier detector) and score
    every document. One tokenize+shuffle for the model, one for the
    scoring join."""
    cb, cu, v = train_bigram_lm(
        reference if reference is not None else docs, text_col, id_col, min_count
    )
    return score_bigram_perplexity(docs, cb, cu, v, text_col, id_col)


def kneser_ney_bigrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    top_n: int = 200,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    the absolute-discounting smoother that backs off to CONTINUATION
    counts — "how many contexts does w2 follow" — rather than raw
    unigram frequency, which is what makes it the standard n-gram LM
    smoother and the natural upgrade of :func:`train_bigram_lm`'s
    Laplace floor):

        P(w2|w1) = (c(w1,w2) − d)/c(w1·)
                 + [d·N1+(w1·)/c(w1·)] · [N1+(·w2)/T]

    with d = ``discount``, N1+ the distinct-continuation counts and T
    the total distinct bigram types. Returns the ``top_n`` bigrams by
    (count desc, w1, w2) with ``n_pairs`` and ``p_kn``.

    Scale shape: the corpus tokenizes and shuffles ONCE into bigram
    counts; left/right continuation relations are regroupings OF the
    count relation (corpus-bounded, never corpus-sized); T rides a
    broadcast cross join; the top-n is a distributed TakeOrdered
    (orderBy + limit), not a single-partition window. Every count is
    exact BIGINT; P is a fixed per-row IEEE expression over those ints
    (the oracle states the identical association), ROUND(6)-guarded.
    """
    big = doc_bigrams(df, text_col=text_col, id_col=id_col)
    # cb feeds four subplans (left/right continuation counts, the type
    # total, and the scored join) — cut the lineage so the corpus
    # tokenize + bigram count shuffle runs ONCE, as the scale-shape
    # note below promises. |bigram types|-bounded.
    cb = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    lft = cb.groupBy("w1").agg(
        F.sum("c").alias("cl"), F.count(F.lit(1)).alias("nl")
    )
    rgt = cb.groupBy("w2").agg(F.count(F.lit(1)).alias("nr"))
    tt = cb.agg(F.count(F.lit(1)).alias("t_types"))
    d = F.lit(float(discount))
    scored = (
        cb.join(lft, "w1")
        .join(rgt, "w2")
        # bcast: const(1) scalar totals agg
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            F.col("c").alias("n_pairs"),
            (
                (F.col("c").cast("double") - d) / F.col("cl").cast("double")
                + ((d * F.col("nl").cast("double"))
                   / F.col("cl").cast("double"))
                * (F.col("nr").cast("double")
                   / F.col("t_types").cast("double"))
            ).alias("p"),
        )
    )
    return (
        scored.orderBy(F.col("n_pairs").desc(), "w1", "w2")
        .limit(top_n)
        .select("w1", "w2", "n_pairs", F.round("p", 6).alias("p_kn"))
    )


def collocations_g2(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 15,
    min_count: int = 5,
) -> DataFrame:
    """Dunning log-likelihood (G²) collocation ranking (Dunning, CL
    1993) — the statistically-sound replacement for raw-count or PMI
    bigram ranking (PMI explodes on hapaxes; G² is the likelihood-
    ratio test of "w2 follows w1 more than independence allows"),
    the standard phrase-mining / tokenizer-seeding primitive.

    Per bigram with count c12, marginals c1 (w1 as left token), c2
    (w2 as right token) and N total bigrams, the 2×2 table is O11=c12,
    O12=c1−c12, O21=c2−c12, O22=N−c1−c2+c12 and

        G² = 2·Σ_ij O_ij · ln( O_ij·N / (R_i·C_j) ),   0·ln(0) = 0.

    Exactness (micro-nats lattice): every O, R, C, N is an exact
    BIGINT; each of the four terms is ONE deterministic IEEE
    expression rounded to nano-units; ``g2_nano`` sums them in exact
    BIGINT (display ``g2`` spends one division). Ranking and the
    top-k cut order by (g2_nano DESC, w1, w2) — total order, engine-
    invariant. Pairs with c12 < ``min_count`` are pruned first (the
    broadcast-ability guard: surviving pairs are model-sized).

    Scale shape: one bigram rollup (map-side combining) + two
    |vocab|-sized marginal regroups joined back by key + a scalar N
    broadcast; the top-k is TakeOrderedAndProject, never a global
    sort."""
    if top_k < 1 or min_count < 1:
        raise ValueError(f"bad top_k/min_count {top_k}/{min_count}")
    big = doc_bigrams(df, text_col=text_col, id_col=id_col)
    cb = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    cb = cb.localCheckpoint(eager=False)  # feeds marginals + scoring
    c1 = cb.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    c2 = cb.groupBy("w2").agg(F.sum("c12").cast("bigint").alias("c2"))
    nn = cb.agg(F.sum("c12").cast("bigint").alias("nn"))
    scored = (
        cb.where(F.col("c12") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        # bcast: const(1) scalar bigram total
        .crossJoin(F.broadcast(nn))
    )

    def term(o: Column, r: Column, c: Column) -> Column:
        ratio = (
            o.cast("double") * F.col("nn").cast("double")
        ) / (r.cast("double") * c.cast("double"))
        return F.when(
            o > 0,
            F.round(o.cast("double") * F.log(ratio) * F.lit(1e9), 0)
            .cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))

    o11 = F.col("c12")
    o12 = F.col("c1") - F.col("c12")
    o21 = F.col("c2") - F.col("c12")
    o22 = F.col("nn") - F.col("c1") - F.col("c2") + F.col("c12")
    r1, r2 = F.col("c1"), F.col("nn") - F.col("c1")
    cc1, cc2 = F.col("c2"), F.col("nn") - F.col("c2")
    g2_nano = (
        F.lit(2).cast("bigint")
        * (
            term(o11, r1, cc1)
            + term(o12, r1, cc2)
            + term(o21, r2, cc1)
            + term(o22, r2, cc2)
        )
    )
    ranked = scored.select(
        "w1",
        "w2",
        "c12",
        g2_nano.alias("g2_nano"),
    ).orderBy(F.col("g2_nano").desc(), "w1", "w2").limit(top_k)
    return ranked.select(
        "w1",
        "w2",
        "c12",
        "g2_nano",
        round_stable(F.col("g2_nano") / F.lit(1e9), 4).alias("g2"),
    )


def log_odds_keywords(
    df: DataFrame,
    group_col: str,
    term_col: str,
    alpha0: float = 100.0,
    min_count: int = 5,
    top_k: int = 10,
) -> DataFrame:
    """Monroe–Colaresi–Quinn weighted log-odds with an informative
    Dirichlet prior ("Fightin' Words", Political Analysis 2008) — the
    statistically-sound "which terms characterize this group vs the
    rest" ranking: raw frequency surfaces stopwords, TF-IDF and PMI
    explode on hapaxes, while the z-scored log-odds shrinks rare
    terms toward the corpus prior and normalizes by the variance of
    the estimate.

    Per (group g, term w) with count ``y_gw``, group total ``n_g``,
    corpus term count ``y_w``, corpus total ``n`` and the prior
    ``α_w = α₀·y_w/n``::

        δ  = ln( (y_gw+α_w) / (n_g+α₀ − y_gw−α_w) )
           − ln( (y_rw+α_w) / (n_r+α₀ − y_rw−α_w) )     (rest side r)
        σ² ≈ 1/(y_gw+α_w) + 1/(y_rw+α_w)
        z  = δ / √σ²

    Determinism: no float ever accumulates — z is ONE IEEE expression
    per observed (g, w) pair over exact BIGINT counts, quantized to
    ``z_micro = round(z·10⁶)`` so the per-group ranking and top-k cut
    order by the total order (z_micro DESC, term ASC) — engine-
    invariant. Terms with ``y_gw < min_count`` are pruned before
    scoring (they cannot rank: the prior dominates them) — also the
    skew guard: the ranking window partitions by group over the
    PRUNED vocabulary. A non-positive log argument (only reachable
    when one group holds the entire corpus) yields NULL z rather
    than ±inf.

    Returns ``(group, term, y_count, z_micro, z, rank)``, rank ≤
    ``top_k`` per group. NULL group/term rows are excluded.

    Scale shape: one (group, term) rollup (map-side combining), two
    model-sized rollups (group totals; corpus term counts — broadcast
    under min_count pruning is NOT applied to y_w, which stays a
    shuffle join on term), one per-group ranking window over the
    pruned candidate set."""
    base = df.select(
        F.col(group_col).alias("__g"), F.col(term_col).alias("__w")
    ).filter(F.col(group_col).isNotNull() & F.col(term_col).isNotNull())
    gt = base.groupBy("__g", "__w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ygw")
    )
    gt = gt.localCheckpoint(eager=False)  # feeds totals + term counts
    ngs = gt.groupBy("__g").agg(F.sum("__ygw").cast("bigint").alias("__ng"))
    yw = gt.groupBy("__w").agg(F.sum("__ygw").cast("bigint").alias("__yw"))
    tot = ngs.agg(F.sum("__ng").cast("bigint").alias("__n"))
    cand = (
        gt.filter(F.col("__ygw") >= min_count)
        .join(yw, "__w")
        # bcast: model(|groups|) group totals
        .join(F.broadcast(ngs), "__g")
        # bcast: const(1) corpus total
        .crossJoin(F.broadcast(tot))
    )
    a0 = F.lit(float(alpha0))
    aw = a0 * F.col("__yw").cast("double") / F.col("__n").cast("double")
    ygw = F.col("__ygw").cast("double")
    yrw = (F.col("__yw") - F.col("__ygw")).cast("double")
    ng = F.col("__ng").cast("double")
    nr = (F.col("__n") - F.col("__ng")).cast("double")
    num1 = ygw + aw
    den1 = (ng + a0) - (ygw + aw)
    num2 = yrw + aw
    den2 = (nr + a0) - (yrw + aw)
    delta = F.log(num1 / den1) - F.log(num2 / den2)
    sigma2 = F.lit(1.0) / num1 + F.lit(1.0) / num2
    z = F.when(
        (den1 > 0) & (den2 > 0), delta / F.sqrt(sigma2)
    )
    scored = cand.withColumn(
        "__zmicro", F.round(z * F.lit(1e6), 0).cast("bigint")
    )
    w = Window.partitionBy("__g").orderBy(
        F.col("__zmicro").desc(), F.col("__w")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("__g").alias(group_col),
            F.col("__w").alias(term_col),
            F.col("__ygw").alias("y_count"),
            F.col("__zmicro").alias("z_micro"),
            round_stable(
                F.col("__zmicro").cast("double") / F.lit(1e6), 4
            ).alias("z"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
