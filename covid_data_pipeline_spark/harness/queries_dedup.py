"""Dedup queries over the documents table (north-star extras).

The synthetic corpus has no natural duplicates (500 distinct texts), so
these queries construct them deterministically: an exact double of every
doc (union-all) for exact dedup, and a lightly-mutated variant (one
appended token) for the near-dup families. The oracle checks exact dedup
end-to-end in SQL; MinHash/SimHash are non-SQL-expressible → rows-only
driver checks, with recall asserted in pytest against planted pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from covid_data_pipeline_spark.harness.registry import register, table
from covid_data_pipeline_spark.harness.tables import dim_count
from covid_data_pipeline_spark.operators.relational import size_gated_broadcast
from covid_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    jaccard_join_prefix,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidate_pairs,
)
from covid_data_pipeline_spark.operators.graph import connected_components

MUTANT_OFFSET = 1_000_000


def _shingle_ctes(where: str = "TRUE") -> str:
    """DuckDB CTEs ``base → toks → sh``: the doubled corpus
    (``_with_mutants``) tokenized and shingled. The list-slicing shingle
    construction mirrors ``functions/text.word_shingles`` exactly
    (distinct 3-grams of whitespace tokens; short texts collapse to one
    whole-text shingle). Shared by the exact-Jaccard, MinHash, and
    SimHash oracles so all three replay the identical shingle/token
    universe."""
    return rf"""
    base AS (
      SELECT doc_id, text FROM documents WHERE {where}
      UNION ALL
      SELECT doc_id + {MUTANT_OFFSET} AS doc_id, text || ' zq' AS text
      FROM documents WHERE {where}
    ),
    toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM base
    ),
    sh AS (
      SELECT doc_id,
        CASE WHEN len(t) >= 3
          THEN list_distinct(list_transform(range(1, len(t) - 1),
                                            i -> array_to_string(t[i:i+2], ' ')))
          ELSE [array_to_string(t, ' ')] END AS shingles
      FROM toks
    )"""


def _shingle_pairs_sql(where: str = "TRUE") -> str:
    """DuckDB twin of the doubled-corpus exact-Jaccard pipeline:
    ``_shingle_ctes`` → posting-list candidate join → exact Jaccard.
    Produces CTE ``j(id_a, id_b, jac)``; callers append the final SELECT.
    """
    return rf"""{_shingle_ctes(where)},
    grams AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    j AS (
      SELECT id_a, id_b,
             len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
             len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jac
      FROM cand
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
    )"""


def _with_mutants(d: DataFrame) -> DataFrame:
    """documents ∪ near-dup mutants: same text plus one appended token,
    doc_id offset by 1e6 — planted ground truth for near-dup recall.

    Repartitions to the session's default parallelism: the documents
    parquet lands in very few input splits locally, and the downstream
    shingle/signature projections are CPU-bound — without the rebalance
    they run ~2-wide on a 32-core session. (At warehouse scale inputs
    already have enough splits; the repartition is a no-op cost-wise
    relative to the signature work.)"""
    n = d.sparkSession.sparkContext.defaultParallelism
    mutants = d.select(
        (F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    return d.select("doc_id", "text").unionByName(mutants).repartition(n)


def _mutant_ids(d: DataFrame) -> DataFrame:
    """The doubled corpus' node-id relation WITHOUT `_with_mutants`'s
    round-robin repartition: every doc mutates, so the id set is exactly
    ids ∪ (ids + MUTANT_OFFSET). Passing this as the CC ``nodes`` side
    skips a full corpus shuffle the id roll never needed (the
    repartition exists to spread the CPU-bound signature projections,
    not the ids — r10 optimization round; same values, one less
    Exchange in every consumer's plan)."""
    ids = d.select("doc_id")
    return ids.unionByName(
        ids.select((F.col("doc_id") + MUTANT_OFFSET).alias("doc_id"))
    )


@register(
    "dedup_exact",
    r"""
    WITH doubled AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id, text FROM documents
    ),
    keyed AS (
      SELECT doc_id, text,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM doubled
    ),
    reps AS (
      SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
      FROM keyed GROUP BY fp
    )
    SELECT DISTINCT r.doc_id, k.text, r.dup_count
    FROM reps r JOIN keyed k ON r.doc_id = k.doc_id AND r.fp = k.fp
    """,
    tags=("dedup", "exact"),
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d)  # every text exactly twice → dup_count 2
    return exact_dedup(doubled, text_col="text", id_col="doc_id")


@register(
    "dedup_minhash",
    f"""
    WITH {_shingle_ctes()},
    hs AS (
      SELECT doc_id,
             list_distinct(list_transform(shingles,
               s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
                    % 2147483647)) AS hs
      FROM sh
    ),
    g AS (SELECT doc_id, unnest(hs) AS h FROM hs),
    perm AS (
      SELECT i,
             (1103515245 * (i + 1) + 12345) % 2147483647 AS a,
             (1103515245 * (i + 101) + 12345) % 2147483647 AS b
      FROM range(16) t(i)
    ),
    sig AS (
      SELECT g.doc_id, p.i, MIN((p.a * g.h + p.b) % 2147483647) AS mh
      FROM g CROSS JOIN perm p
      GROUP BY g.doc_id, p.i
    ),
    band AS (
      SELECT doc_id, i // 4 AS band_idx,
             list_reduce(
               list_prepend(CAST(i // 4 AS BIGINT), list(mh ORDER BY i)),
               (acc, v) -> (acc * 31 + v) % 288230376151711717
             ) AS band_hash
      FROM sig GROUP BY doc_id, i // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM band a JOIN band b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    jac AS (
      SELECT id_a, id_b,
             len(list_intersect(ha.hs, hb.hs))::DOUBLE /
             len(list_distinct(list_concat(ha.hs, hb.hs))) AS j
      FROM cand
      JOIN hs ha ON ha.doc_id = id_a
      JOIN hs hb ON hb.doc_id = id_b
    )
    SELECT id_a, id_b, ROUND(j, 4) AS jaccard FROM jac WHERE j >= 0.6
    """,
    tags=("dedup", "minhash", "lsh"),
    bench=True,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, FULLY oracle-replayed (r3 VERDICT ask
    #4): with ``portable=True`` the shingle hashes are md5-prefix ints,
    the 16 permutations are affine maps mod 2^31-1, and the 4 band
    buckets are list_reduce folds — so DuckDB regenerates the exact
    candidate set and the exact-Jaccard verify, and the driver value-
    hashes the result instead of a rows-only count. The xxhash64
    production path keeps its planted-pair recall proof in
    tests/test_dedup_similarity.py."""
    d = _with_mutants(table(spark, sf_dir, "documents"))
    # 16 hashes / 4 bands: at the planted-pair jaccard (~0.94) expected
    # recall is 1−(1−0.94⁴)⁴ ≈ 99.8% for half the signature cost; the
    # default 32/8 configuration's recall floor is pytest-asserted
    # separately (tests/test_dedup_similarity.py).
    pairs = minhash_dedup(
        d, text_col="text", id_col="doc_id", shingle_k=3, num_hashes=16, bands=4,
        threshold=0.6, portable=True,
    )
    return pairs.withColumn("jaccard", F.round(F.col("jaccard"), 4))


@register(
    "dedup_minhash_native",
    None,
    tags=("dedup", "minhash", "lsh", "bench-twin"),
    bench=True,
    rows_only_reason=(
        "bench-only production-path twin of dedup_minhash: portable=False "
        "uses engine-native xxhash64 shingle hashing, which no SQL oracle "
        "can replay — correctness is covered by dedup_minhash's full "
        "oracle replay (same operator, same parameters, only the hash "
        "family differs) plus the planted-pair recall proof in "
        "tests/test_dedup_similarity.py"
    ),
)
def dedup_minhash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-hash MinHash+LSH twin (VERDICT r6 ask #3): benches the
    ``portable=False`` xxhash64 path callers actually run, so the bench
    record separates the md5 oracle-replay cost from real engine drift
    (r6's dedup_minhash vs_r1 1.431x is the portable-hash price, not a
    plan regression — this twin makes that visible every round)."""
    d = _with_mutants(table(spark, sf_dir, "documents"))
    pairs = minhash_dedup(
        d, text_col="text", id_col="doc_id", shingle_k=3, num_hashes=16, bands=4,
        threshold=0.6, portable=False,
    )
    return pairs.withColumn("jaccard", F.round(F.col("jaccard"), 4))


@register(
    "dedup_simhash",
    f"""
    WITH {_shingle_ctes()},
    tokh AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS u
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
    ),
    votes AS (
      SELECT doc_id, b.b AS bit,
             SUM(CAST((u >> CAST(b.b AS INTEGER)) & 1 AS BIGINT)) AS ones,
             COUNT(*) AS n
      FROM tokh CROSS JOIN range(64) b(b)
      GROUP BY doc_id, b.b
    ),
    sigs AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN 2 * ones > n THEN
                    CASE WHEN bit = 63 THEN -9223372036854775808
                         ELSE CAST(1 AS BIGINT) << CAST(bit AS INTEGER) END
                  ELSE 0 END) AS BIGINT) AS sig,
             CAST(SUM(CASE WHEN 2 * ones > n THEN
                    CASE WHEN bit = 63 THEN CAST(9223372036854775808 AS HUGEINT)
                         ELSE CAST(CAST(1 AS BIGINT) << CAST(bit AS INTEGER)
                                   AS HUGEINT) END
                  ELSE 0 END) AS UBIGINT) AS su
      FROM votes GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, sig, c.i AS chunk_idx,
             CAST((su >> CAST(16 * c.i AS INTEGER)) & 65535 AS BIGINT) AS chunk_val
      FROM sigs CROSS JOIN range(4) c(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sig AS sig_a, b.sig AS sig_b
      FROM chunks a JOIN chunks b
        ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, FULLY oracle-replayed (r3 VERDICT ask #4):
    with ``portable=True`` every token hash is an md5-prefix signed-64
    int, so DuckDB regenerates the per-bit majority vote (64 bit-columns
    over the token stream), reassembles the signed signature from the
    same AND-masks Spark ORs together (disjoint bits ⇒ OR == SUM, with
    bit 63's mask = min-long), replays the 16-bit pigeonhole banding on
    the unsigned view, and value-hashes the verified Hamming pairs. The
    xxhash64 production path keeps its planted-mutant distance bounds in
    tests/test_dedup_similarity.py."""
    d = _with_mutants(table(spark, sf_dir, "documents"))
    # localCheckpoint, not persist(): the signature projection feeds both
    # sides of the banded self-join, but persist() would leak a cached
    # relation per invocation in a long-lived session (bench loop). At
    # warehouse scale, stage signatures to a table instead.
    sigs = d.select(
        "doc_id", simhash("text", portable=True).alias("simhash")
    ).localCheckpoint(eager=False)
    return simhash_candidate_pairs(sigs, id_col="doc_id", max_hamming=3)


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_shingle_pairs_sql(where="doc_id < 100")}
    SELECT id_a, id_b, ROUND(jac, 4) AS jaccard FROM j WHERE jac >= 0.6
    """,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard pairs — both engines run the full exact
    semantics (posting-list candidates → set Jaccard), so the oracle is
    an equality check, not an approximation bound. Jaccard is a ratio of
    small ints (identical IEEE division both sides); rounded to 4 per
    float policy anyway."""
    # Exact pairwise Jaccard is quadratic within posting lists — cap the
    # corpus (deterministic subset) so the verification tool stays a
    # verification tool; minhash is the scale path.
    d = _with_mutants(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    )
    pairs = ngram_jaccard_pairs(
        d, text_col="text", id_col="doc_id", shingle_k=3, threshold=0.6
    )
    return pairs.withColumn("jaccard", F.round(F.col("jaccard"), 4))


@register(
    "graph_components_docs",
    """
    WITH RECURSIVE
    e0 AS (
      SELECT doc_id AS src, (doc_id * 7) % 500 AS dst FROM documents
    ),
    sym AS (
      SELECT src, dst FROM e0 WHERE src <> dst
      UNION
      SELECT dst, src FROM e0 WHERE src <> dst
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.node, sym.dst FROM reach JOIN sym ON sym.src = reach.r
    )
    SELECT node AS doc_id, MIN(r) AS component_id
    FROM reach GROUP BY node
    """,
    tags=("graph", "dedup", "components"),
    bench=True,
)
def graph_components_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components on a deterministic multi-hop graph: edges
    doc_id → (doc_id·7) mod 500 form a union of long cycles (7 is a unit
    mod 500), so a correct answer REQUIRES transitive propagation — the
    star rounds converge in O(log n) shuffles where naive label
    propagation would need cycle-length rounds. Oracle is DuckDB's
    recursive-CTE transitive closure over the same edge list; nodes 0
    and 250 are self-loop fixed points and must survive as singleton
    components (exercises the `nodes=` path)."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    edges = d.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * F.lit(7)) % F.lit(500)).alias("dst"),
    )
    comps = connected_components(edges, nodes=d)
    return comps.select(
        F.col("node").alias("doc_id"), F.col("component").alias("component_id")
    )


@register(
    "dedup_duplicate_groups",
    f"""
    WITH RECURSIVE {_shingle_pairs_sql()},
    e AS (SELECT id_a AS src, id_b AS dst FROM j WHERE jac >= 0.9),
    sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM base
      UNION
      SELECT reach.node, sym.dst FROM reach JOIN sym ON sym.src = reach.r
    )
    SELECT node AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY node
    """,
    tags=("graph", "dedup", "minhash"),
    bench=True,
)
def dedup_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup chain: MinHash/LSH candidate pairs → exact-Jaccard
    verify → connected components → (doc_id, canonical_id) keep/drop
    mapping. Each planted mutant pairs with its original, so components
    collapse {orig, mutant} onto min(doc_id) = the original.

    Oracle is EXACT Jaccard pairs + recursive-CTE closure — equality
    (not just a recall bound) holds because the LSH band config is sized
    for ~certain recall at the qualifying threshold: 16 hashes in 8
    bands of 2 rows gives per-pair candidate probability
    1-(1-J²)⁸ ≥ 1-1.7e-6 at J ≥ 0.9 (the corpus' minimum qualifying
    Jaccard — measured: ~590 qualifying pairs at sf0.01, none in
    [0.85, 0.9) closer than 0.85+). The exact-Jaccard verify then
    discards every sub-threshold candidate, so both engines see the
    same edge set. At threshold 0.6 this equality would NOT hold
    (1-(1-0.36)⁸ ≈ 0.97 → deterministic misses on the corpus' natural
    J≈0.6 pairs) — which is why the chain dedups at 0.9."""
    d = _with_mutants(table(spark, sf_dir, "documents"))
    pairs = minhash_dedup(
        d, text_col="text", id_col="doc_id", shingle_k=3, num_hashes=16,
        bands=8, threshold=0.9,
    )
    comps = connected_components(pairs, src="id_a", dst="id_b", nodes=_mutant_ids(table(spark, sf_dir, "documents")))
    return comps.select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
    )


@register(
    "dedup_groups_keep_best",
    f"""
    WITH RECURSIVE {_shingle_pairs_sql()},
    e AS (SELECT id_a AS src, id_b AS dst FROM j WHERE jac >= 0.9),
    sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM base
      UNION
      SELECT reach.node, sym.dst FROM reach JOIN sym ON sym.src = reach.r
    ),
    comp AS (SELECT node, MIN(r) AS c FROM reach GROUP BY node),
    lens AS (SELECT doc_id, length(text) AS l FROM base),
    best AS (
      SELECT c, node AS best_id FROM (
        SELECT comp.c, comp.node,
               row_number() OVER (PARTITION BY comp.c
                                  ORDER BY lens.l DESC, comp.node) AS rn
        FROM comp JOIN lens ON lens.doc_id = comp.node
      ) WHERE rn = 1
    )
    SELECT comp.node AS doc_id, best.best_id AS canonical_id,
           comp.node = best.best_id AS is_kept
    FROM comp JOIN best ON best.c = comp.c
    """,
    tags=("graph", "dedup", "minhash", "keep-best"),
)
def dedup_groups_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonicalization over LSH duplicate groups — the
    production dedup policy: within each near-dup component keep the
    BEST document (longest text, ties -> smallest doc_id), not the
    min-id one. The planted mutants are one token LONGER than their
    base doc, so every 2-doc component provably selects the mutant —
    the policy demonstrably diverges from ``dedup_duplicate_groups``.

    Same chain as ``dedup_duplicate_groups`` (LSH pairs at threshold
    0.9 -> exact-Jaccard verify -> connected components; identical
    equality argument for the oracle) plus one component-keyed
    ``max_by(node, struct(len, -node))`` aggregate — a map-side-
    combining argmax, no window over the corpus. At scale the length
    column generalizes to any quality score carried on the doc."""
    d = _with_mutants(table(spark, sf_dir, "documents"))
    pairs = minhash_dedup(
        d, text_col="text", id_col="doc_id", shingle_k=3, num_hashes=16,
        bands=8, threshold=0.9,
    )
    comps = connected_components(
        pairs, src="id_a", dst="id_b", nodes=_mutant_ids(table(spark, sf_dir, "documents"))
    )
    lens = d.select("doc_id", F.length("text").alias("__len"))
    best = (
        comps.join(lens, comps["node"] == lens["doc_id"])
        .groupBy("component")
        .agg(
            F.max_by(
                F.col("node"), F.struct(F.col("__len"), (-F.col("node")).alias("__neg"))
            ).alias("best_id")
        )
    )
    return comps.join(best, "component").select(
        F.col("node").alias("doc_id"),
        F.col("best_id").alias("canonical_id"),
        (F.col("node") == F.col("best_id")).alias("is_kept"),
    )


@register(
    "graph_component_sizes",
    """
    WITH RECURSIVE
    e0 AS (
      SELECT doc_id AS src, (doc_id * 7) % 500 AS dst FROM documents
    ),
    sym AS (
      SELECT src, dst FROM e0 WHERE src <> dst
      UNION
      SELECT dst, src FROM e0 WHERE src <> dst
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.node, sym.dst FROM reach JOIN sym ON sym.src = reach.r
    ),
    labels AS (
      SELECT node, MIN(r) AS component FROM reach GROUP BY node
    )
    SELECT component, COUNT(*) AS size
    FROM labels GROUP BY component
    ORDER BY size DESC, component
    LIMIT 10
    """,
    tags=("graph", "dedup", "audit"),
)
def graph_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size head (operators/graph.largest_components) — the
    dedup-audit view answering 'which boilerplate cluster is eating the
    corpus'. Agg + TakeOrderedAndProject on top of the star-round
    labels; deterministic (component, size) ordering."""
    from covid_data_pipeline_spark.operators.graph import largest_components

    d = table(spark, sf_dir, "documents").select("doc_id")
    edges = d.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * F.lit(7)) % F.lit(500)).alias("dst"),
    )
    return largest_components(connected_components(edges, nodes=d), top_k=10)


@register(
    "dedup_passages_global",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id,
             unnest(generate_series(0,
               CAST(FLOOR((len(t) - 1) / 10.0) AS INT))) AS passage_idx,
             t
      FROM toks
    ),
    hashed AS (
      SELECT doc_id, passage_idx,
             array_to_string(t[passage_idx * 10 + 1 : passage_idx * 10 + 10], ' ')
               AS passage
      FROM spans
    ),
    ranked AS (
      SELECT doc_id, passage_idx, passage,
             row_number() OVER (PARTITION BY md5(passage)
                                ORDER BY doc_id, passage_idx) AS rn
      FROM hashed
    )
    SELECT doc_id,
           COUNT(CASE WHEN rn = 1 THEN 1 END) AS kept_passages,
           COUNT(*) AS total_passages,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN passage END, ' '
                               ORDER BY passage_idx), '') AS clean_text
    FROM ranked
    GROUP BY doc_id
    """,
    tags=("dedup", "passages", "training"),
    bench=True,
)
def dedup_passages_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact passage dedup (keep first occurrence), with the
    cleaned text reassembled per document — the passage-level variant of
    Lee et al. 2021's exact substring dedup. The oracle states the same
    semantics with a windowed row_number; the Spark side uses a
    min-struct aggregation instead so hot passages stay in map-side
    combine (see operators/dedup.py:passage_dedup)."""
    from covid_data_pipeline_spark.operators.dedup import passage_dedup

    d = table(spark, sf_dir, "documents")
    return passage_dedup(d, id_col="doc_id", text_col="text", passage_words=10)


@register(
    "dedup_keep_best",
    r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || '  ' FROM documents
      UNION ALL
      SELECT doc_id + 2000000, '  ' || text FROM documents),
    scored AS (
      SELECT doc_id, text,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM corpus),
    ranked AS (
      SELECT fp, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY fp ORDER BY length(text), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY fp) AS n_docs,
             MIN(length(text)) OVER (PARTITION BY fp) AS min_len
      FROM scored)
    SELECT fp, doc_id AS keep_doc_id, n_docs, min_len
    FROM ranked WHERE rn = 1
    """,
    tags=("dedup", "keep-best", "canonicalize"),
    bench=True,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST exact-dedup policy: within each normalized-text cluster
    keep the most compact raw form (min char length, then min doc_id) —
    the canonicalization rule when duplicates differ only in
    case/whitespace formatting and you want one clean survivor, not
    merely the first-seen row.

    The planted corpus triples every doc (original, trailing-pad,
    leading-pad): the pads tie on length so BOTH ordering dimensions
    of the composite key decide a winner.

    Scale shape: ONE hash-shuffle aggregation with map-side combine —
    ``max_by(doc_id, struct(-length, -doc_id))`` reduces each cluster
    to its argmax without the oracle's windowed ROW_NUMBER (which
    must SORT every cluster's rows after the shuffle). At 100 TB the
    agg ships one struct per cluster per map task; the window ships
    every row."""
    from covid_data_pipeline_spark.functions.text import normalized_text

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = (
        docs.unionByName(
            docs.select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit("  ")).alias("text"),
            )
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.concat(F.lit("  "), F.col("text")).alias("text"),
            )
        )
    )
    scored = corpus.select(
        "doc_id",
        F.md5(normalized_text("text")).alias("fp"),
        F.length("text").alias("len"),
    )
    return scored.groupBy("fp").agg(
        F.max_by(
            "doc_id", F.struct(-F.col("len"), -F.col("doc_id"))
        ).alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
        F.min("len").cast("bigint").alias("min_len"),
    )


@register(
    "graph_triangle_count",
    """
    WITH raw AS (
      SELECT doc_id AS a, (doc_id * 7) % 500 AS b FROM documents
      UNION ALL
      SELECT doc_id, (doc_id * 49) % 500 FROM documents),
    e AS (
      SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
      FROM raw WHERE a <> b)
    SELECT COUNT(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.lo = e1.hi
    JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    """,
    tags=("graph", "triangles"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on a deterministic doc graph (edges a—7a and
    a—49a mod 500, so every node closes the {a, 7a, 49a} triangle) —
    the clustering-coefficient primitive for dedup-graph diagnostics
    (dense triangle neighborhoods = near-dup cliques; sparse = chains
    of borderline pairs).

    Canonicalized (lo < hi) undirected edges make each triangle count
    exactly once via the two-hop join + closing-edge check — the
    standard distributed formulation: both joins are EDGE-keyed hash
    joins (no node-degree blowup beyond real wedges), which is the
    shape that survives a 100 TB edge list; skew from high-degree hubs
    is the documented AQE/salting case."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    raw = d.select(
        F.col("doc_id").alias("a"),
        ((F.col("doc_id") * 7) % 500).alias("b"),
    ).unionByName(
        d.select(
            F.col("doc_id").alias("a"),
            ((F.col("doc_id") * 49) % 500).alias("b"),
        )
    )
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
    )
    e1 = e.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = e.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    e3 = e.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    return (
        e1.join(e2, on="y")
        .join(e3, on=["x", "z"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@register(
    "dedup_token_savings",
    r"""
    WITH corpus AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, source, text || '  ' FROM documents
      WHERE doc_id % 2 = 0),
    scored AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM corpus),
    kept AS (
      SELECT fp, MIN(doc_id) AS keep_id FROM scored GROUP BY fp)
    SELECT s.source,
           CAST(SUM(s.n_tokens) AS BIGINT) AS raw_tokens,
           CAST(SUM(CASE WHEN k.keep_id = s.doc_id THEN s.n_tokens ELSE 0 END)
             AS BIGINT) AS kept_tokens,
           CAST(FLOOR((SUM(s.n_tokens)
                 - SUM(CASE WHEN k.keep_id = s.doc_id THEN s.n_tokens
                            ELSE 0 END)) * 10000.0 / SUM(s.n_tokens))
                AS BIGINT) AS savings_bp
    FROM scored s JOIN kept k ON s.fp = k.fp
    GROUP BY s.source
    """,
    tags=("dedup", "tokens", "report"),
)
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-dataset-size report: token mass before vs after
    keep-first exact dedup, per source (planted: every even doc has a
    whitespace variant, so half of each source carries ~50% redundant
    mass) — the number that justifies a dedup stage's cost in a
    curation budget review. One fingerprint shuffle; the keep-first
    relation joins back on fp (same key, exchange reuse)."""
    from covid_data_pipeline_spark.functions.text import (
        normalized_text,
        token_count,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "source",
            F.concat("text", F.lit("  ")).alias("text"),
        )
    )
    scored = corpus.select(
        "doc_id",
        "source",
        token_count("text").alias("n_tokens"),
        F.md5(normalized_text("text")).alias("fp"),
    )
    kept = scored.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    joined = scored.join(kept, "fp")
    kept_tok = F.when(
        F.col("keep_id") == F.col("doc_id"), F.col("n_tokens")
    ).otherwise(0)
    return joined.groupBy("source").agg(
        F.sum("n_tokens").alias("raw_tokens"),
        F.sum(kept_tok).alias("kept_tokens"),
        F.floor(
            (F.sum("n_tokens") - F.sum(kept_tok))
            * 10000.0
            / F.sum("n_tokens")
        ).cast("bigint").alias("savings_bp"),
    )


@register(
    "dedup_jaccard_prefix",
    f"""
    WITH {_shingle_pairs_sql(where="doc_id < 150")}
    SELECT id_a, id_b, ROUND(jac, 4) AS jaccard FROM j WHERE jac >= 0.6
    """,
    tags=("dedup", "jaccard", "prefix-filter"),
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard join (operators/dedup.py::
    jaccard_join_prefix, AllPairs/PPJoin) — the scale path for
    exact-threshold near-dup detection: candidates come from a
    rarest-first PREFIX posting join (≈ (1−t) of the shingle mass),
    never the full inverted index that makes ngram_jaccard_pairs
    quadratic within hot posting lists, and never MinHash's recall
    loss. The oracle is the same full exact-Jaccard SQL the quadratic
    query uses — the two Spark physical strategies must produce the
    IDENTICAL pair set, which is precisely the prefix-filter theorem."""
    d = _with_mutants(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    )
    return jaccard_join_prefix(
        d, text_col="text", id_col="doc_id", shingle_k=3, threshold=0.6
    )


QUOTE_OFFSET = 2_000_000

_CONTAINMENT_ORACLE = r"""
WITH orig AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 100
),
ot AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM orig
),
base AS (
  SELECT doc_id, text FROM orig
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         array_to_string(t[1:greatest((len(t) * 3) // 5, 1)], ' ') AS text
  FROM ot
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM base
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 3
      THEN list_distinct(list_transform(range(1, len(t) - 1),
                                        i -> array_to_string(t[i:i+2], ' ')))
      ELSE [array_to_string(t, ' ')] END AS shingles
  FROM toks
),
grams AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ((i * 10000) // len(sa.shingles))::BIGINT AS containment_bp,
       len(sa.shingles)::BIGINT AS n_a
FROM inter JOIN sh sa ON sa.doc_id = id_a
WHERE (i * 10000) // len(sa.shingles) >= 6000
"""


@register(
    "containment_quotes",
    _CONTAINMENT_ORACLE,
    tags=("dedup", "containment"),
)
def containment_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment (asymmetric Jaccard) pairs over a corpus
    with planted QUOTES: each doc < 100 gains a derived doc holding its
    first 60% of tokens — the "tweet pasted into an article" shape that
    symmetric Jaccard under-scores (the union denominator drowns the
    overlap) but containment catches at ~10000 bp. Both engines run the
    identical exact pipeline: distinct 3-shingle sets → inverted-index
    intersection counts → integer floor-div containment gate ≥ 6000 bp.
    No float crosses an engine boundary."""
    from covid_data_pipeline_spark.operators.dedup import containment_pairs
    from covid_data_pipeline_spark.functions.text import tokens

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    t = tokens(F.col("text"))
    quotes = d.select(
        (F.col("doc_id") + F.lit(QUOTE_OFFSET)).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(
                t,
                F.lit(1),
                F.greatest(
                    F.floor(F.size(t) * F.lit(3) / F.lit(5)).cast("int"),
                    F.lit(1),
                ),
            ),
        ).alias("text"),
    )
    corpus = d.unionByName(quotes)
    return containment_pairs(
        corpus, text_col="text", id_col="doc_id", shingle_k=3,
        threshold_bp=6000,
    )


@register(
    "graph_bfs_distances",
    """
    WITH RECURSIVE
    e0 AS (
      SELECT doc_id AS src, (doc_id * 7) % 500 AS dst FROM documents
    ),
    sym AS (
      SELECT src, dst FROM e0 WHERE src <> dst
      UNION
      SELECT dst, src FROM e0 WHERE src <> dst
    ),
    walk(node, dist) AS (
      SELECT doc_id, 0 FROM documents WHERE doc_id < 5
      UNION ALL
      SELECT sym.dst, walk.dist + 1
      FROM walk JOIN sym ON sym.src = walk.node
      WHERE walk.dist < 6
    )
    SELECT node AS doc_id, MIN(dist) AS dist FROM walk GROUP BY node
    """,
    tags=("graph", "bfs", "lineage"),
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS levels (`operators/graph.py::bfs_distances`)
    over the same deterministic multi-hop cycle graph as
    `graph_components_docs`, sources = doc_id < 5, 6-hop horizon — the
    blast-radius/lineage query ("everything within k hops of these
    nodes"). Levels are partitioning-independent; the oracle walks all
    bounded paths recursively and takes per-node MIN."""
    from covid_data_pipeline_spark.operators.graph import bfs_distances

    d = table(spark, sf_dir, "documents").select("doc_id")
    edges = d.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * F.lit(7)) % F.lit(500)).alias("dst"),
    )
    srcs = d.filter(F.col("doc_id") < 5)
    return bfs_distances(edges, srcs, max_hops=6).select(
        F.col("node").alias("doc_id"), F.col("dist").cast("int").alias("dist")
    )


@register(
    "split_leakage_audit",
    f"""
    WITH {_shingle_pairs_sql()},
    splits AS (
      SELECT doc_id,
             CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
                  THEN 'train'
                  WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90
                  THEN 'valid'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id FROM documents
            UNION ALL
            SELECT doc_id + {MUTANT_OFFSET} FROM documents)
    )
    SELECT LEAST(sa.split, sb.split) AS split_a,
           GREATEST(sa.split, sb.split) AS split_b,
           COUNT(*) AS leaked_pairs
    FROM j
    JOIN splits sa ON j.id_a = sa.doc_id
    JOIN splits sb ON j.id_b = sb.doc_id
    WHERE j.jac >= 0.9 AND sa.split <> sb.split
    GROUP BY 1, 2
    """,
    tags=("dedup", "split", "leakage", "audit"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: near-duplicate pairs (exact
    Jaccard ≥ 0.9 via the prefix-filtered AllPairs join — zero false
    negatives) that STRADDLE split boundaries under the plain per-doc
    hash split, counted per split pair. The doubled-mutant corpus
    plants the leakage a naive split creates (a mutant hashes
    independently of its original), which is exactly why
    `cluster_aware_split_docs` / `group_aware_split_docs` exist — this
    query is the auditor that proves a split needs them. Cost is the
    exact-Jaccard join (prefix-filtered) + two id-keyed joins against
    the narrow split projection."""
    from covid_data_pipeline_spark.operators.dedup import jaccard_join_prefix
    from covid_data_pipeline_spark.operators.sampling import hash_split

    corpus = _with_mutants(table(spark, sf_dir, "documents"))
    pairs = jaccard_join_prefix(
        corpus, text_col="text", id_col="doc_id", shingle_k=3, threshold=0.9
    )
    splits = hash_split(corpus.select("doc_id"), "doc_id").select(
        "doc_id", "split"
    )
    return (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .groupBy(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).alias("leaked_pairs"))
    )


@register(
    "graph_shortest_paths",
    """
    WITH RECURSIVE
    e0 AS (
      SELECT doc_id AS src, (doc_id * 7) % 500 AS dst,
             (doc_id % 7) + 1 AS w
      FROM documents
    ),
    sym AS (
      SELECT a, b, MIN(w) AS w FROM (
        SELECT src AS a, dst AS b, w FROM e0 WHERE src <> dst
        UNION ALL
        SELECT dst AS a, src AS b, w FROM e0 WHERE src <> dst
      ) GROUP BY a, b
    ),
    walk(node, d, hops) AS (
      SELECT doc_id, CAST(0 AS BIGINT), 0 FROM documents WHERE doc_id < 3
      UNION ALL
      SELECT sym.b, walk.d + sym.w, hops + 1
      FROM walk JOIN sym ON sym.a = walk.node
      WHERE hops < 4
    )
    SELECT node AS doc_id, MIN(d) AS dist FROM walk GROUP BY node
    """,
    tags=("graph", "shortest-path", "weighted"),
)
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded weighted shortest distances
    (`operators/graph.py::shortest_paths`, level-synchronous
    Bellman–Ford) over the deterministic cycle graph with integer edge
    weights ((doc_id mod 7)+1), sources doc_id < 3, 4-hop horizon —
    the bounded-radius cost query. Integer min-sums are bit-identical
    everywhere; the oracle walks all ≤4-edge paths recursively and
    takes the per-node MIN."""
    from covid_data_pipeline_spark.operators.graph import shortest_paths

    d = table(spark, sf_dir, "documents").select("doc_id")
    edges = d.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * F.lit(7)) % F.lit(500)).alias("dst"),
        ((F.col("doc_id") % F.lit(7)) + F.lit(1)).alias("weight"),
    )
    srcs = d.filter(F.col("doc_id") < 3)
    return shortest_paths(edges, srcs, max_hops=4).select(
        F.col("node").alias("doc_id"), "dist"
    )


def _ppr_oracle(iters: int = 5, scale: int = 10**12) -> str:
    """Unrolled personalized-PageRank twin (same construction as the
    uniform `_pagerank_oracle` in queries_similarity.py): teleport and
    init restricted to the seed set, BIGINT `//` throughout."""
    head = f"""
    WITH e0 AS (
      SELECT doc_id AS src, (doc_id * 7) % 500 AS dst FROM documents
    ),
    e AS (SELECT src, dst FROM e0 WHERE src <> dst),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    ns AS (SELECT 3 AS n),
    pr0 AS (
      SELECT nd.node,
             CAST(CASE WHEN nd.node IN (1, 2, 3)
                  THEN {scale} // ns.n ELSE 0 END AS BIGINT) AS rank
      FROM nodes nd CROSS JOIN ns
    )"""
    step = """,
    pr{t} AS (
      SELECT nd.node,
             CAST(CASE WHEN nd.node IN (1, 2, 3)
                  THEN {tele} // (100 * ns.n) ELSE 0 END
                  + COALESCE(inf.inflow, 0) AS BIGINT) AS rank
      FROM nodes nd CROSS JOIN ns
      LEFT JOIN (
        SELECT e.dst AS node,
               SUM((85 * p.rank) // (100 * d.outdeg)) AS inflow
        FROM pr{p} p JOIN e ON e.src = p.node JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) inf ON inf.node = nd.node
    )"""
    body = "".join(
        step.format(t=t, p=t - 1, tele=scale * 15) for t in range(1, iters + 1)
    )
    return head + body + f"\n    SELECT node AS doc_id, rank FROM pr{iters} WHERE rank > 0"


@register(
    "pagerank_personalized_docs",
    _ppr_oracle(),
    tags=("graph", "pagerank", "personalized", "centrality"),
)
def pagerank_personalized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (`operators/graph.py::pagerank_int` with
    ``sources``, Haveliwala's topic-sensitive construction): teleport
    mass restarts at seeds {1,2,3} of the deterministic cycle graph, so
    rank measures centrality RELATIVE to the seeds (similar-to-my-seed
    discovery / blast-radius importance). Same BIGINT parts-per-10¹²
    fixed point as the uniform variant — 5 iterations hash-match the
    unrolled SQL replay; only reached nodes (rank > 0) are emitted."""
    from covid_data_pipeline_spark.operators.graph import pagerank_int

    d = table(spark, sf_dir, "documents").select("doc_id")
    edges = d.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * F.lit(7)) % F.lit(500)).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    seeds = d.filter(F.col("doc_id").isin(1, 2, 3))
    ranks = pagerank_int(edges, iters=5, sources=seeds)
    return ranks.filter(F.col("rank") > 0).select(
        F.col("node").alias("doc_id"), "rank"
    )


def _kcore_unrolled_sql(k: int, rounds: int) -> str:
    """Synchronous k-core peeling unrolled as chained MATERIALIZED step
    CTEs (each round references the prior edge set three times — degree
    union twice + join back — so without MATERIALIZED DuckDB re-expands
    the chain exponentially; see the k-center oracle note)."""
    ctes = [
        """e0 AS MATERIALIZED (
      WITH d AS (SELECT doc_id FROM documents),
      raw AS (
        SELECT doc_id % 500 AS a, (doc_id % 500) // 2 AS b FROM d
        UNION ALL SELECT doc_id % 500, (doc_id * 7) % 500 FROM d
        UNION ALL SELECT doc_id % 500, (doc_id * 49) % 500 FROM d)
      SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
      FROM raw WHERE a <> b)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT lo AS node FROM e{p} UNION ALL SELECT hi FROM e{p})
      GROUP BY 1)"""
        )
        ctes.append(
            f"""e{i} AS MATERIALIZED (
      SELECT e.lo, e.hi FROM e{p} e
      JOIN d{i} a ON a.node = e.lo AND a.deg >= {k}
      JOIN d{i} b ON b.node = e.hi AND b.deg >= {k})"""
        )
    final = f"""
    SELECT node, deg AS core_degree FROM (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT lo AS node FROM e{rounds}
        UNION ALL SELECT hi FROM e{rounds})
      GROUP BY 1)
    WHERE deg >= {k}"""
    return "WITH " + ",\n    ".join(ctes) + final


@register(
    "graph_kcore_docs",
    _kcore_unrolled_sql(k=4, rounds=8),
    tags=("graph", "kcore", "iterative"),
    bench=True,
)
def graph_kcore_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of a planted doc graph (binary-tree edges a—a//2 give
    layered peel cascades; the two mod-500 multiplier edges give a
    dense surviving core): surviving nodes with their in-core degree
    (`operators/graph.py::kcore`). The engine peels to the edge-count
    fixpoint with semi-joins + localCheckpoint per round; the oracle
    unrolls 8 synchronous peel rounds as MATERIALIZED step CTEs —
    fixpoint lands by round 3 at every test SF, so both sides agree
    value-for-value."""
    from covid_data_pipeline_spark.operators.graph import kcore

    # One scan + explode instead of the original 3x unionByName (which
    # read documents three times): all three rule edges materialize in
    # the same pass, and the single edge distinct stays the only
    # shuffle. (Measured A/B warm at sf0.1: explode ~1.49s median vs
    # ~1.74s for 3x union and ~1.74s for a distinct-residues-first
    # variant whose extra shuffle cost more than the saved scans.)
    d = table(spark, sf_dir, "documents").select("doc_id")
    raw = d.select(
        (F.col("doc_id") % 500).alias("a"),
        F.explode(
            F.array(
                F.expr("(doc_id % 500) div 2"),
                (F.col("doc_id") * 7) % 500,
                (F.col("doc_id") * 49) % 500,
            )
        ).alias("b"),
    )
    edges = (
        raw.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
    )
    return kcore(edges, k=4)


def _ktruss_unrolled_sql(k: int, rounds: int) -> str:
    """Synchronous k-truss peeling unrolled as MATERIALIZED step CTEs:
    per round a triangle enumeration (two-hop join over the canonical
    lo<hi edge set, each triangle once as x<y<z), a 3-way edge
    projection counted into per-edge support, and an inner join that
    drops edges with support < k-2 (triangle-less edges vanish via the
    inner join)."""
    sup_min = k - 2
    ctes = [
        """e0 AS MATERIALIZED (
      WITH d AS (SELECT doc_id FROM documents),
      raw AS (
        SELECT doc_id % 500 AS a, (doc_id % 500) // 2 AS b FROM d
        UNION ALL SELECT doc_id % 500, (doc_id * 7) % 500 FROM d
        UNION ALL SELECT doc_id % 500, (doc_id * 49) % 500 FROM d)
      SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
      FROM raw WHERE a <> b)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""t{i} AS MATERIALIZED (
      SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM e{p} e1 JOIN e{p} e2 ON e2.lo = e1.hi
      JOIN e{p} e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)"""
        )
        ctes.append(
            f"""s{i} AS MATERIALIZED (
      SELECT lo, hi, COUNT(*) AS sup FROM (
        SELECT x AS lo, y AS hi FROM t{i}
        UNION ALL SELECT y, z FROM t{i}
        UNION ALL SELECT x, z FROM t{i}) GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""e{i} AS MATERIALIZED (
      SELECT e.lo, e.hi FROM e{p} e JOIN s{i} s USING (lo, hi)
      WHERE s.sup >= {sup_min})"""
        )
    r = rounds
    final = f"""
    SELECT e.lo, e.hi, CAST(s.sup AS BIGINT) AS support
    FROM e{r} e JOIN (
      SELECT lo, hi, COUNT(*) AS sup FROM (
        SELECT e1.lo, e1.hi FROM e{r} e1
        JOIN e{r} e2 ON e2.lo = e1.hi
        JOIN e{r} e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
        UNION ALL
        SELECT e1.hi, e2.hi FROM e{r} e1
        JOIN e{r} e2 ON e2.lo = e1.hi
        JOIN e{r} e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
        UNION ALL
        SELECT e1.lo, e2.hi FROM e{r} e1
        JOIN e{r} e2 ON e2.lo = e1.hi
        JOIN e{r} e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)
      GROUP BY 1, 2) s USING (lo, hi)
    WHERE s.sup >= {sup_min}"""
    return "WITH " + ",\n    ".join(ctes) + final


@register(
    "graph_ktruss_docs",
    _ktruss_unrolled_sql(k=4, rounds=6),
    tags=("graph", "ktruss", "iterative"),
)
def graph_ktruss_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss of the planted doc graph (`operators/graph.py::ktruss`):
    surviving edges with their in-truss triangle support — the
    triangle-corroborated tightening of graph_kcore_docs on the same
    edge recipe (bridge chains that survive coreness die here). The
    engine peels to the edge-count fixpoint; the oracle unrolls 6
    synchronous rounds as MATERIALIZED CTEs (fixpoint lands by round 2
    at every test SF)."""
    from covid_data_pipeline_spark.operators.graph import ktruss

    d = table(spark, sf_dir, "documents").select("doc_id")
    a = (F.col("doc_id") % 500).alias("a")
    raw = (
        d.select(a, F.expr("(doc_id % 500) div 2").alias("b"))
        .unionByName(d.select(a, ((F.col("doc_id") * 7) % 500).alias("b")))
        .unionByName(d.select(a, ((F.col("doc_id") * 49) % 500).alias("b")))
    )
    edges = (
        raw.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
    )
    return ktruss(edges, k=4)


@register(
    "minhash_recall_eval",
    f"""
    WITH {_shingle_pairs_sql()},
    truth AS (SELECT id_a, id_b FROM j WHERE jac >= 0.6),
    mh_hs AS (
      SELECT doc_id,
             list_distinct(list_transform(shingles,
               s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
                    % 2147483647)) AS hs
      FROM sh
    ),
    mh_g AS (SELECT doc_id, unnest(hs) AS h FROM mh_hs),
    perm AS (
      SELECT i,
             (1103515245 * (i + 1) + 12345) % 2147483647 AS a,
             (1103515245 * (i + 101) + 12345) % 2147483647 AS b
      FROM range(16) t(i)
    ),
    sig AS (
      SELECT g.doc_id, p.i, MIN((p.a * g.h + p.b) % 2147483647) AS mh
      FROM mh_g g CROSS JOIN perm p
      GROUP BY g.doc_id, p.i
    ),
    band AS (
      SELECT doc_id, i // 4 AS band_idx,
             list_reduce(
               list_prepend(CAST(i // 4 AS BIGINT), list(mh ORDER BY i)),
               (acc, v) -> (acc * 31 + v) % 288230376151711717
             ) AS band_hash
      FROM sig GROUP BY doc_id, i // 4
    ),
    mh_cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM band a JOIN band b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    hit AS (
      SELECT COUNT(*) AS n FROM truth t
      JOIN mh_cand c ON t.id_a = c.id_a AND t.id_b = c.id_b),
    nt AS (SELECT COUNT(*) AS n FROM truth),
    nc AS (SELECT COUNT(*) AS n FROM mh_cand)
    SELECT CAST(nt.n AS BIGINT) AS n_truth,
           CAST(nc.n AS BIGINT) AS n_candidates,
           CAST(hit.n AS BIGINT) AS n_hits,
           CAST(hit.n * 10000 // nt.n AS BIGINT) AS recall_bp,
           CAST(hit.n * 10000 // nc.n AS BIGINT) AS precision_bp
    FROM nt, nc, hit
    """,
    tags=("dedup", "minhash", "lsh", "evaluation"),
)
def minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-stage recall/precision of banded MinHash-LSH (16
    hashes / 4 bands, portable) against EXACT prefix-filtered Jaccard
    >= 0.6 ground truth on the planted-mutant corpus — the measured
    quality gate for the approximation itself (the verify stage makes
    the final output exact; THIS is the number that says how much the
    banding misses and how much it over-nominates). Both pipelines are
    the same driver-verified machinery as dedup_jaccard_prefix and
    dedup_minhash; the metrics are exact integer basis points, so the
    whole evaluation hash-matches in SQL."""
    from covid_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        with_minhash,
    )

    corpus = _with_mutants(table(spark, sf_dir, "documents"))
    truth = jaccard_join_prefix(
        corpus, text_col="text", id_col="doc_id", shingle_k=3, threshold=0.6
    ).select("id_a", "id_b")
    signed = with_minhash(
        corpus, text_col="text", shingle_k=3, num_hashes=16, portable=True
    )
    cand = lsh_candidate_pairs(
        signed, id_col="doc_id", num_hashes=16, bands=4, portable=True
    ).select("id_a", "id_b")
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    hit = truth.join(cand, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        nt.crossJoin(nc)
        .crossJoin(hit)
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.expr("n_hits * 10000 div n_truth").alias("recall_bp"),
            F.expr("n_hits * 10000 div n_candidates").alias("precision_bp"),
        )
    )


@register(
    "dedup_winnowing",
    r"""
    WITH wdocs AS MATERIALIZED (
      SELECT doc_id, lower(text) AS text FROM documents
      WHERE length(text) >= 16 AND doc_id < 300
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, lower(text) || ' zq' AS text
      FROM documents WHERE length(text) >= 16 AND doc_id < 300
                       AND doc_id % 5 = 0
    ),
    wg AS MATERIALIZED (
      SELECT doc_id, p.i AS pos,
             CAST(concat('0x',
                  substr(md5(substr(text, p.i, 8)), 1, 15)) AS BIGINT) AS h
      FROM wdocs, UNNEST(range(1, length(text) - 8 + 2)) AS p(i)
    ),
    wpick AS (
      SELECT doc_id, h, pos FROM (
        SELECT a.doc_id, a.pos AS j, b.h, b.pos,
               ROW_NUMBER() OVER (
                 PARTITION BY a.doc_id, a.pos
                 ORDER BY b.h, b.pos DESC) AS rn
        FROM wg a JOIN wg b
          ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos AND a.pos + 3
        WHERE a.pos + 3 <= (SELECT MAX(pos) FROM wg g2
                            WHERE g2.doc_id = a.doc_id)) t
      WHERE rn = 1
    ),
    wfp AS MATERIALIZED (
      SELECT DISTINCT doc_id, h FROM wpick
    ),
    wcnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nfp FROM wfp
             GROUP BY 1),
    wpair AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS shared_fp
      FROM wfp a JOIN wfp b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT p.id_a, p.id_b, p.shared_fp,
           ROUND(CAST(p.shared_fp AS DOUBLE)
                 / LEAST(ca.nfp, cb.nfp), 4) AS containment
    FROM wpair p
    JOIN wcnt ca ON ca.doc_id = p.id_a
    JOIN wcnt cb ON cb.doc_id = p.id_b
    WHERE CAST(p.shared_fp AS DOUBLE) / LEAST(ca.nfp, cb.nfp) >= 0.5
    """,
    tags=("dedup", "winnowing", "fingerprint"),
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winnowing document fingerprints (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003 — the MOSS algorithm): per position, hash the
    8-char gram (portable md5-prefix int); per 4-gram window keep the
    RIGHTMOST MINIMUM hash; the distinct selected hashes are the doc's
    fingerprints. Guarantees: any shared substring of length ≥
    w + k − 1 = 11 chars yields at least one shared fingerprint, at a
    ~2/(w+1) sampling rate — the local-similarity detector (plagiarism,
    quote containment) that whole-doc MinHash can't give. Pairs with
    fingerprint containment ≥ 0.5 are reported (planted append-mutants
    share almost all fingerprints; the 'zq' tail only perturbs the
    final windows).

    Spark shape: gram hashing is one HOF projection; the
    rightmost-min-per-window is ONE window pass (min over
    struct(h, −pos) on a 4-row frame — the oracle's per-window
    ROW_NUMBER pick is formulation-independent); the pair join is an
    inverted index on fingerprint hash, never all-pairs. Corpus capped
    to a deterministic id subset: fingerprints-per-doc ~ len/2.5 makes
    the exact pair recount the verification regime; the MinHash/LSH
    stack is the scale path."""
    d = table(spark, sf_dir, "documents").where(
        (F.length("text") >= 16) & (F.col("doc_id") < 300)
    )
    mut = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lower("text"), F.lit(" zq")).alias("text"),
    )
    docs = d.select("doc_id", F.lower("text").alias("text")).unionByName(mut)
    from covid_data_pipeline_spark.operators.features import (
        portable_token_hash,
    )

    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 8 + 1),
                lambda i: portable_token_hash(
                    F.col("text").substr(i, F.lit(8))
                ),
            )
        ).alias("pos0", "h"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-3, 0)
    )
    sel = (
        grams.withColumn(
            "m",
            F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(w),
        )
        .where(F.col("pos") >= 4)
        .select("doc_id", F.col("m.h").alias("h"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds counts AND the pair join
    )
    cnt = sel.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nfp"))
    a, b = sel.alias("a"), sel.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fp"))
    )
    ca = cnt.select(F.col("doc_id").alias("id_a"), F.col("nfp").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("id_b"), F.col("nfp").alias("nb"))
    # bcast: gated per-doc fingerprint counts are corpus-sized
    # (metadata-count bound; keyed join past the gate limit)
    n_docs = dim_count(spark, sf_dir, "documents")
    out = (
        pairs.join(size_gated_broadcast(ca, n_docs), "id_a")
        .join(size_gated_broadcast(cb, n_docs), "id_b")
        .withColumn(
            "containment",
            F.round(
                F.col("shared_fp").cast("double")
                / F.least("na", "nb"),
                4,
            ),
        )
        .where(
            F.col("shared_fp").cast("double") / F.least("na", "nb") >= 0.5
        )
    )
    return out.select("id_a", "id_b", "shared_fp", "containment")


@register(
    "dedup_sorted_neighborhood",
    f"""
    WITH {_shingle_ctes(where="doc_id < 150")},
    sn_key AS (
      SELECT doc_id,
             CAST(concat('0x', hex(rpad(substr(
               regexp_replace(trim(regexp_replace(lower(text),
                 '[^a-z0-9 ]', '', 'g')), '\\s+', ' ', 'g'),
               1, 7), 7, ' '))) AS BIGINT) AS k
      FROM base),
    sn_rank AS (
      SELECT doc_id, k, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS r
      FROM sn_key),
    sn_cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, b.r - a.r AS rank_gap
      FROM sn_rank a JOIN sn_rank b ON b.r > a.r AND b.r - a.r <= 10),
    sn_j AS (
      SELECT c.id_a, c.id_b, c.rank_gap,
             len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
             len(list_distinct(list_concat(sa.shingles, sb.shingles)))
               AS jac
      FROM sn_cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b)
    SELECT id_a, id_b, CAST(rank_gap AS BIGINT) AS rank_gap,
           ROUND(jac, 4) AS jaccard
    FROM sn_j WHERE jac >= 0.6
    """,
    tags=("dedup", "blocking", "snm"),
    bench=True,
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-Neighborhood blocking (Hernández & Stolfo, SIGMOD'95) —
    the third blocking scheme next to LSH banding and prefix filtering:
    a lexicographic 7-byte sort key (`operators/dedup.py::
    sortkey_prefix7`), an exact DISTRIBUTED global rank
    (value_order_rank — no single-partition sort; the oracle's plain
    ROW_NUMBER replays it), window-10 neighborhoods via the 1-D
    cell-bucket exactly-once join, then exact shingle-Jaccard verify at
    0.6. The planted mutants (same text + one appended token) sort
    adjacent to their originals — the property SNM exists to exploit.
    O(n·w) candidates at any scale."""
    from covid_data_pipeline_spark.functions.text import word_shingles
    from covid_data_pipeline_spark.operators.dedup import (
        jaccard_verify,
        sorted_neighborhood_pairs,
        sortkey_prefix7,
    )

    d = _with_mutants(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    )
    keyed = d.withColumn("_k", sortkey_prefix7("text"))
    cand = sorted_neighborhood_pairs(keyed, "doc_id", "_k", window=10)
    sh = d.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("shingles")
    )
    verified = jaccard_verify(
        cand.select("id_a", "id_b"), sh, id_col="doc_id",
        threshold=0.6, shingle_col="shingles",
    )
    return verified.join(cand, ["id_a", "id_b"]).select(
        "id_a", "id_b", "rank_gap", F.round("jaccard", 4).alias("jaccard")
    )


_SNM_CAND_SQL = r"""
    sn_key AS (
      SELECT doc_id,
             CAST(concat('0x', hex(rpad(substr(
               regexp_replace(trim(regexp_replace(lower(text),
                 '[^a-z0-9 ]', '', 'g')), '\s+', ' ', 'g'),
               1, 7), 7, ' '))) AS BIGINT) AS k
      FROM base),
    sn_rank AS (
      SELECT doc_id, k, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS r
      FROM sn_key),
    sn_cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, b.r - a.r AS rank_gap
      FROM sn_rank a JOIN sn_rank b ON b.r > a.r AND b.r - a.r <= 10)"""


def _fs_weight_sql(agree: str, i: int) -> str:
    num_a = f"(cm{i}+1)*(nu+2)"
    den_a = f"(nm+2)*(cu{i}+1)"
    num_d = f"(nm+1-cm{i})*(nu+2)"
    den_d = f"(nm+2)*(nu+1-cu{i})"
    return (
        f"CASE WHEN {agree} THEN "
        f"ROUND(ln(CAST({num_a} AS DOUBLE)/CAST({den_a} AS DOUBLE))*1e6, 0) "
        f"ELSE "
        f"ROUND(ln(CAST({num_d} AS DOUBLE)/CAST({den_d} AS DOUBLE))*1e6, 0) "
        f"END"
    )


def _fs_pairs_ctes() -> str:
    """Shared blocking+fields+model CTE chain for the Fellegi-Sunter
    queries (candidates -> agreement fields -> m/u counters)."""
    return f"""{_shingle_ctes(where="doc_id < 150")},
    {_SNM_CAND_SQL},
    fs_attr AS (
      SELECT doc_id, LENGTH(text) AS ln,
             substr(regexp_replace(trim(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g')), '\\s+', ' ', 'g'), 1, 5) AS pf
      FROM base),
    fs_pairs AS (
      SELECT c.id_a, c.id_b,
             ABS(a.ln - b.ln) <= 3 AS f_len,
             a.pf = b.pf AS f_prefix,
             2 * len(list_intersect(sa.shingles, sb.shingles))
               >= len(list_distinct(list_concat(sa.shingles, sb.shingles)))
               AS f_jac,
             ABS(c.id_a - c.id_b) = {MUTANT_OFFSET} AS is_match
      FROM sn_cand c
      JOIN fs_attr a ON a.doc_id = c.id_a
      JOIN fs_attr b ON b.doc_id = c.id_b
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b),
    fs_model AS (
      SELECT CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS nm,
             CAST(SUM(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT) AS nu,
             CAST(SUM(CASE WHEN is_match AND f_len THEN 1 ELSE 0 END)
                  AS BIGINT) AS cm0,
             CAST(SUM(CASE WHEN NOT is_match AND f_len THEN 1 ELSE 0 END)
                  AS BIGINT) AS cu0,
             CAST(SUM(CASE WHEN is_match AND f_prefix THEN 1 ELSE 0 END)
                  AS BIGINT) AS cm1,
             CAST(SUM(CASE WHEN NOT is_match AND f_prefix THEN 1 ELSE 0 END)
                  AS BIGINT) AS cu1,
             CAST(SUM(CASE WHEN is_match AND f_jac THEN 1 ELSE 0 END)
                  AS BIGINT) AS cm2,
             CAST(SUM(CASE WHEN NOT is_match AND f_jac THEN 1 ELSE 0 END)
                  AS BIGINT) AS cu2
      FROM fs_pairs)"""



@register(
    "linkage_fs_scores",
    f"""
    WITH {_fs_pairs_ctes()}
    SELECT p.id_a, p.id_b, p.is_match, p.f_len, p.f_prefix, p.f_jac,
           CAST({_fs_weight_sql("p.f_len", 0)}
                + {_fs_weight_sql("p.f_prefix", 1)}
                + {_fs_weight_sql("p.f_jac", 2)} AS BIGINT) AS score_micro
    FROM fs_pairs p CROSS JOIN fs_model
    """,
    tags=("dedup", "linkage", "fellegi-sunter"),
)
def linkage_fs_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage
    (`operators/linkage.py::fs_linkage_scores`) — the decision layer on
    top of blocking: the sorted-neighborhood candidates are scored by
    the log-likelihood ratio of their per-field agreement pattern
    (length-within-3, normalized 5-char prefix, Jaccard >= 1/2 — the
    last an INTEGER comparison, 2·|∩| >= |∪|). m/u probabilities are
    Laplace-smoothed integer count ratios estimated from the planted
    mutant labels; each weight is one IEEE ln of an exact rational in
    micro-nats, and a pair's score is their BIGINT sum — so the whole
    scored relation hash-matches the SQL replay. Model = one 1-row
    broadcast aggregate; scoring is pure codegen over O(n·w)
    candidates."""
    from covid_data_pipeline_spark.functions.text import word_shingles
    from covid_data_pipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
        sortkey_prefix7,
    )
    from covid_data_pipeline_spark.operators.linkage import (
        fs_linkage_scores,
    )

    d = _with_mutants(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    )
    keyed = d.withColumn("_k", sortkey_prefix7("text"))
    cand = sorted_neighborhood_pairs(keyed, "doc_id", "_k", window=10)
    norm = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", "")),
        r"\s+",
        " ",
    )
    attr = d.select(
        "doc_id",
        F.length("text").alias("_ln"),
        F.substring(norm, 1, 5).alias("_pf"),
        word_shingles(F.col("text"), 3).alias("_sh"),
    )
    a = attr.select(
        F.col("doc_id").alias("id_a"),
        F.col("_ln").alias("_ln_a"),
        F.col("_pf").alias("_pf_a"),
        F.col("_sh").alias("_sh_a"),
    )
    b = attr.select(
        F.col("doc_id").alias("id_b"),
        F.col("_ln").alias("_ln_b"),
        F.col("_pf").alias("_pf_b"),
        F.col("_sh").alias("_sh_b"),
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size(F.array_union("_sh_a", "_sh_b"))
    pairs = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.abs(F.col("_ln_a") - F.col("_ln_b")) <= 3).alias("f_len"),
            (F.col("_pf_a") == F.col("_pf_b")).alias("f_prefix"),
            (inter * 2 >= union).alias("f_jac"),
            (
                F.abs(F.col("id_a") - F.col("id_b")) == MUTANT_OFFSET
            ).alias("is_match"),
        )
    )
    scored = fs_linkage_scores(
        pairs, "is_match", ["f_len", "f_prefix", "f_jac"]
    )
    return scored.select(
        "id_a", "id_b", "is_match", "f_len", "f_prefix", "f_jac",
        "score_micro",
    )


@register(
    "dedup_snm_edit_distance",
    f"""
    WITH {_shingle_ctes(where="doc_id < 150")},
    {_SNM_CAND_SQL}
    SELECT c.id_a, c.id_b, CAST(c.rank_gap AS BIGINT) AS rank_gap,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
    FROM sn_cand c
    JOIN base a ON a.doc_id = c.id_a
    JOIN base b ON b.doc_id = c.id_b
    WHERE levenshtein(a.text, b.text) <= 5
    """,
    tags=("dedup", "blocking", "edit-distance"),
)
def dedup_snm_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verify over the sorted-neighborhood candidates —
    the third pairwise metric axis next to set Jaccard and simhash
    Hamming: exact Levenshtein (a JVM built-in; DuckDB computes the
    identical Wagner-Fischer metric, so the whole relation
    hash-matches) keeps pairs within 5 edits. The planted mutants
    (' zq' suffix) sit at exactly distance 3; organic near-identical
    docs surface alongside. Cost: O(len_a * len_b) per CANDIDATE only
    — blocking keeps the quadratic metric off the corpus; at scale the
    verify stays proportional to O(n * w) candidates."""
    from covid_data_pipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
        sortkey_prefix7,
    )

    d = _with_mutants(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    )
    keyed = d.withColumn("_k", sortkey_prefix7("text"))
    cand = sorted_neighborhood_pairs(keyed, "doc_id", "_k", window=10)
    a = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_ta"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_tb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "edit_dist", F.levenshtein("_ta", "_tb").cast("bigint")
        )
        .where(F.col("edit_dist") <= 5)
        .select("id_a", "id_b", "rank_gap", "edit_dist")
    )


@register(
    "entity_resolution_docs",
    f"""
    WITH RECURSIVE
    {_fs_pairs_ctes()},
    er_acc AS (
      SELECT id_a AS src, id_b AS dst FROM (
        SELECT p.id_a, p.id_b,
               {_fs_weight_sql("p.f_len", 0)}
               + {_fs_weight_sql("p.f_prefix", 1)}
               + {_fs_weight_sql("p.f_jac", 2)} AS sc
        FROM fs_pairs p CROSS JOIN fs_model) t
      WHERE sc > 0),
    er_sym AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM er_acc
        UNION ALL
        SELECT dst AS src, src AS dst FROM er_acc) u),
    er_reach(node, r) AS (
      SELECT doc_id, doc_id FROM base
      UNION
      SELECT er_reach.node, er_sym.dst
      FROM er_reach JOIN er_sym ON er_sym.src = er_reach.r)
    SELECT node AS doc_id, MIN(r) AS entity_id
    FROM er_reach GROUP BY node
    """,
    tags=("dedup", "linkage", "entity-resolution"),
)
def entity_resolution_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution — the full linkage stack as ONE
    dataflow: sorted-neighborhood blocking (O(n·w) candidates) →
    Fellegi–Sunter agreement scoring (micro-nat log-likelihood ratios)
    → accept score > 0 → large-star/small-star connected components
    assign every document an entity id (min member id; singletons keep
    their own). The oracle replays blocking, fields, the m/u model,
    the integer scores, AND the transitive closure (recursive CTE), so
    the final entity assignment — not just the pair scores — is
    hash-verified. Scale shape: every stage is a keyed shuffle bounded
    by candidates or accepted edges; CC is O(log n) rounds."""
    from covid_data_pipeline_spark.functions.text import word_shingles
    from covid_data_pipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
        sortkey_prefix7,
    )
    from covid_data_pipeline_spark.operators.graph import (
        connected_components,
    )
    from covid_data_pipeline_spark.operators.linkage import (
        fs_linkage_scores,
    )

    d = _with_mutants(
        table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    ).localCheckpoint(eager=False)  # feeds blocking, attrs, and nodes
    keyed = d.withColumn("_k", sortkey_prefix7("text"))
    cand = sorted_neighborhood_pairs(keyed, "doc_id", "_k", window=10)
    norm = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", "")),
        r"\s+",
        " ",
    )
    attr = d.select(
        "doc_id",
        F.length("text").alias("_ln"),
        F.substring(norm, 1, 5).alias("_pf"),
        word_shingles(F.col("text"), 3).alias("_sh"),
    )
    a = attr.select(
        F.col("doc_id").alias("id_a"), F.col("_ln").alias("_ln_a"),
        F.col("_pf").alias("_pf_a"), F.col("_sh").alias("_sh_a"),
    )
    b = attr.select(
        F.col("doc_id").alias("id_b"), F.col("_ln").alias("_ln_b"),
        F.col("_pf").alias("_pf_b"), F.col("_sh").alias("_sh_b"),
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size(F.array_union("_sh_a", "_sh_b"))
    pairs = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.abs(F.col("_ln_a") - F.col("_ln_b")) <= 3).alias("f_len"),
            (F.col("_pf_a") == F.col("_pf_b")).alias("f_prefix"),
            (inter * 2 >= union).alias("f_jac"),
            (
                F.abs(F.col("id_a") - F.col("id_b")) == MUTANT_OFFSET
            ).alias("is_match"),
        )
    )
    edges = (
        fs_linkage_scores(pairs, "is_match", ["f_len", "f_prefix", "f_jac"])
        .where(F.col("score_micro") > 0)
        .select("id_a", "id_b")
    )
    comps = connected_components(
        # d is the FILTERED doubled corpus and already checkpointed —
        # its id slice is the right (and cheap) node list here.
        edges, src="id_a", dst="id_b", nodes=d.select("doc_id")
    )
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("entity_id"),
    )
