"""Properties of the deterministic split / sample / pack operators."""

from __future__ import annotations

import pytest

# r11 fast-tier marking (VERDICT r10 ask #3): the full suite runs ~52
# min, which times out the driver's verify window; this module's tests
# are in the SLOW tier (fast tier = `pytest tests/` with the default
# addopts, full suite = `pytest tests/ -m ""` — run per round).
pytestmark = pytest.mark.slow

from pyspark.sql import Window
from pyspark.sql import functions as F

from covid_data_pipeline_spark.harness.tables import table
from covid_data_pipeline_spark.operators.sampling import (
    hash_split,
    pack_greedy_bins,
    stratified_hash_sample,
)

SF = "/root/testdata/sf0.001"


def test_hash_split_is_stable_under_repartition_and_append(spark):
    docs = table(spark, SF, "documents")
    base = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    # Repartitioning must not move any row between splits.
    shuffled = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(13), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert shuffled == base
    # Splitting a subset assigns the same labels (append-stability).
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {
        r["doc_id"]: r["split"]
        for r in hash_split(subset, "doc_id").select("doc_id", "split").collect()
    }
    assert all(base[k] == v for k, v in sub.items())


def test_hash_split_proportions_roughly_hold(spark):
    docs = table(spark, "/root/testdata/sf0.01", "documents")
    counts = dict(
        hash_split(docs, "doc_id").groupBy("split").count().collect()
    )
    total = sum(counts.values())
    assert 0.7 <= counts["train"] / total <= 0.9
    assert counts.get("valid", 0) > 0 and counts.get("test", 0) > 0


def test_stratified_sample_is_subset_and_deterministic(spark):
    docs = table(spark, SF, "documents")
    s1 = {r["doc_id"] for r in stratified_hash_sample(docs, "doc_id", 10).collect()}
    s2 = {r["doc_id"] for r in stratified_hash_sample(docs, "doc_id", 10).collect()}
    assert s1 == s2
    assert 0 < len(s1) < docs.count()


def test_pack_bins_respect_budget_for_small_docs(spark):
    docs = (
        table(spark, SF, "documents")
        .withColumn("n", F.least(F.col("n_chars"), F.lit(500)))
    )
    packed = pack_greedy_bins(
        docs, group_col="lang", order_col="doc_id", size_col="n", budget=2000
    )
    fills = (
        packed.groupBy("lang", "bin_id")
        .agg(F.sum("n").alias("fill"), F.max("n").alias("biggest"))
        .collect()
    )
    # Every doc here is <= 500, so no bin can exceed budget + one doc.
    assert all(r["fill"] <= 2000 + 500 for r in fills)
    # Bins are dense per group: ids 0..max with no gaps.
    for lang_row in packed.select("lang").distinct().collect():
        ids = sorted(
            r["bin_id"]
            for r in packed.filter(F.col("lang") == lang_row["lang"])
            .select("bin_id")
            .distinct()
            .collect()
        )
        assert ids == list(range(len(ids)))


def test_weighted_sample_is_stable_and_weight_biased(spark):
    from covid_data_pipeline_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id LONG, w DOUBLE")
    picked = {r["id"] for r in weighted_sample(df, "id", "w", k=100).collect()}
    # 50 rows carry 100x the weight of the other 950: they hold ~51% of
    # total mass, so a 100-row sample must include most of them.
    assert len(picked & set(range(50))) >= 35
    # Deterministic under repartitioning.
    again = {r["id"] for r in weighted_sample(df.repartition(17), "id", "w", k=100).collect()}
    assert picked == again


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0), (4, 2.0)], "id LONG, w DOUBLE"
    )
    from covid_data_pipeline_spark.operators.sampling import weighted_sample

    assert {r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()} == {3, 4}


def test_hash_split_negative_and_null_ids(spark):
    import pytest

    df = spark.createDataFrame(
        [(-5,), (-4,), (-3,), (-2,), (-1,), (1,), (None,)], "doc_id long"
    )
    out = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    # pmod keeps negative ids inside the named splits (plain % would
    # hash them negative and fall through every predicate to 'test').
    assert all(
        out[i] in ("train", "valid", "test") for i in (-5, -4, -3, -2, -1, 1)
    )
    # NULL ids surface as NULL split, never a silent default bucket.
    assert out[None] is None
    # Non-integral id columns fail fast at the operator boundary
    # (string would cast-throw mid-job under ANSI instead).
    sdf = spark.createDataFrame([("a",)], "doc_id string")
    with pytest.raises(TypeError, match="integral"):
        hash_split(sdf, "doc_id")
    with pytest.raises(TypeError, match="integral"):
        stratified_hash_sample(sdf, "doc_id")


def test_stratified_sample_drops_null_ids(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(100)] + [(None,)], "doc_id long"
    )
    kept = stratified_hash_sample(df, "doc_id", one_in=2).collect()
    assert all(r["doc_id"] is not None for r in kept)
    assert 30 <= len(kept) <= 70


def test_sample_per_group_quota_and_determinism(spark, sf_dir):
    from pyspark.sql import functions as F

    from covid_data_pipeline_spark.operators.sampling import sample_per_group
    from covid_data_pipeline_spark.harness.registry import table

    d = table(spark, sf_dir, "documents").select("lang", "doc_id")
    s = sample_per_group(d, ["lang"], "doc_id", n=5)
    sizes = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    orig = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in orig.items():
        assert sizes[lang] == min(5, n)
    # subset + stable under repartitioning
    picked = {(r["lang"], r["doc_id"]) for r in s.collect()}
    all_ids = {(r["lang"], r["doc_id"]) for r in d.collect()}
    assert picked <= all_ids
    again = {
        (r["lang"], r["doc_id"])
        for r in sample_per_group(d.repartition(7), ["lang"], "doc_id", n=5).collect()
    }
    assert again == picked


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    from covid_data_pipeline_spark.harness.tables import table
    from covid_data_pipeline_spark.operators.sampling import mixture_sample

    docs = table(spark, sf_dir, "documents")
    weights = {f"src{i}": (0.2 if i < 2 else 0.1 / 18) for i in range(20)}
    out = mixture_sample(docs, "source", weights, target_rows=60, id_col="doc_id")

    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_src0 = docs.filter(F.col("source") == "src0").count()
    # heavy sources want 60*0.2=12 of ~25 rows: rate<1, roughly half kept
    assert 0 < by_src.get("src0", 0) < n_src0
    # light sources want 60*0.0055≈0.33 rows: mostly empty, never many
    assert all(by_src.get(f"src{i}", 0) <= 3 for i in range(2, 20))

    # deterministic under repartitioning
    again = mixture_sample(
        docs.repartition(13), "source", weights, target_rows=60, id_col="doc_id"
    )
    assert out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty()
    assert again.select("doc_id").exceptAll(out.select("doc_id")).isEmpty()


def test_mixture_sample_caps_at_keep_all_and_drops_unlisted(spark, sf_dir):
    from covid_data_pipeline_spark.harness.tables import table
    from covid_data_pipeline_spark.operators.sampling import mixture_sample

    docs = table(spark, sf_dir, "documents")
    out = mixture_sample(
        docs, "source", {"src3": 1.0}, target_rows=10_000, id_col="doc_id"
    )
    # src3 wants 10000 rows but only has ~25: keep-all cap, no inflation
    assert out.count() == docs.filter(F.col("source") == "src3").count()
    assert {r["source"] for r in out.select("source").distinct().collect()} == {"src3"}


def test_mixture_resample_replicates_toward_target(spark, sf_dir):
    from covid_data_pipeline_spark.harness.tables import table
    from covid_data_pipeline_spark.operators.sampling import mixture_resample

    docs = table(spark, sf_dir, "documents")
    weights = {f"src{i}": 0.05 for i in range(20)}  # uniform, 2x upsample
    out = mixture_resample(docs, "source", weights, target_rows=1000, id_col="doc_id")
    total = out.count()
    # expectation is exactly 1000; hash realization stays close
    assert 900 <= total <= 1100
    # every row appears at least floor(2.0)=2 times, replicas tagged 0..k
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("replica_idx").alias("mx")
    )
    bad = per_doc.filter((F.col("n") < 2) | (F.col("mx") != F.col("n") - 1))
    assert bad.isEmpty()

    # deterministic under repartitioning
    again = mixture_resample(
        docs.repartition(7), "source", weights, target_rows=1000, id_col="doc_id"
    )
    key = ["doc_id", "replica_idx"]
    assert out.select(*key).exceptAll(again.select(*key)).isEmpty()
    assert again.select(*key).exceptAll(out.select(*key)).isEmpty()


def test_global_hash_order_dense_and_deterministic(spark, sf_dir):
    from covid_data_pipeline_spark.harness.tables import table
    from covid_data_pipeline_spark.operators.sampling import (
        global_hash_order,
        knuth_hash,
    )

    docs = table(spark, sf_dir, "documents")
    n = docs.count()
    out = global_hash_order(docs, "doc_id", num_partitions=7)
    ranks = [r[0] for r in out.select("train_order").collect()]
    assert sorted(ranks) == list(range(1, n + 1))  # dense, 1..N, no ties

    # agrees with the naive single-partition global sort
    naive = docs.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(knuth_hash("doc_id"), F.col("doc_id")))
        .alias("train_order"),
    )
    joined = out.select("doc_id", "train_order").join(
        naive.withColumnRenamed("train_order", "naive_order"), "doc_id"
    )
    assert joined.filter(F.col("train_order") != F.col("naive_order")).isEmpty()

    # stable under input repartitioning and different partition counts
    again = global_hash_order(docs.repartition(3), "doc_id", num_partitions=13)
    j2 = out.select("doc_id", "train_order").join(
        again.withColumnRenamed("train_order", "o2").select("doc_id", "o2"), "doc_id"
    )
    assert j2.filter(F.col("train_order") != F.col("o2")).isEmpty()


def test_global_hash_order_dense_at_1m_rows(spark):
    """Regression for the AQE-coalescing rank corruption: at small
    scale every plan coalesces identically and the bug hid; at millions
    of rows the sampled-range/pid variant produced non-dense ranks.
    The bucket-expression implementation must stay exact."""
    from covid_data_pipeline_spark.operators.sampling import global_hash_order
    from covid_data_pipeline_spark.sources.pyds import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("numPartitions", 16)
        .option("rowsPerPartition", 62_500)
        .load()
        .select("event_id")
    )
    out = global_hash_order(df, "event_id", num_partitions=16)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("train_order").alias("mn"),
        F.max("train_order").alias("mx"),
        F.count_distinct("train_order").alias("d"),
    ).first()
    assert (stats.n, stats.mn, stats.mx, stats.d) == (1_000_000, 1, 1_000_000, 1_000_000)


def test_group_aware_split_keeps_groups_whole(spark, sf_dir):
    from covid_data_pipeline_spark.harness.tables import table
    from covid_data_pipeline_spark.operators.sampling import group_aware_split

    docs = table(spark, sf_dir, "documents")
    out = group_aware_split(docs, "source")
    # leakage property: every group maps to exactly one split
    per_group = out.groupBy("source").agg(
        F.count_distinct("split").alias("k")
    )
    assert per_group.filter(F.col("k") != 1).isEmpty()
    # stability under repartitioning
    again = group_aware_split(docs.repartition(9), "source")
    j = out.select("doc_id", "split").join(
        again.select("doc_id", F.col("split").alias("s2")), "doc_id"
    )
    assert j.filter(F.col("split") != F.col("s2")).isEmpty()
    # NULL group -> NULL split, never a silent bucket
    null_df = spark.createDataFrame([(1, None)], "doc_id long, source string")
    assert group_aware_split(null_df, "source").first()["split"] is None


def test_token_budget_select_cuts_at_budget_and_is_deterministic(spark):
    from covid_data_pipeline_spark.operators.sampling import (
        token_budget_select,
    )

    rows = [(i, "a", 10) for i in range(100)] + [(i + 100, "b", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = token_budget_select(df, {"a": 95})  # 9 docs of 10 fit; "b" dropped
    got = out.collect()
    assert {r["source"] for r in got} == {"a"}
    assert len(got) == 9 and max(r["cum_tokens"] for r in got) == 90
    again = token_budget_select(df.repartition(13), {"a": 95}).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_token_budget_first_overflowing_doc_is_cut(spark):
    from covid_data_pipeline_spark.operators.sampling import (
        token_budget_select,
    )

    df = spark.createDataFrame(
        [(1, "a", 60), (2, "a", 60), (3, "a", 60)],
        "doc_id long, source string, n_tokens long",
    )
    out = token_budget_select(df, {"a": 100}).collect()
    # only the hash-first doc fits; the one that would overflow is cut
    assert len(out) == 1 and out[0]["cum_tokens"] == 60


def test_stress_synthetic_docs_globally_unique(spark):
    """Regression for the curation-stress fixture bug: a modular token
    generator (id * mult % p) aliases ids p apart into EXACT duplicates
    (every token collides simultaneously), which the curation chain then
    correctly collapses — failing the planted-survivor count. The
    xxhash-derived generator must produce globally unique base docs and
    longer mutants."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "")
    )
    from tools.stress_report import _synthetic_docs

    from pyspark.sql import functions as F

    n = 2_000
    docs = _synthetic_docs(spark, n)
    assert docs.count() == 2 * n
    base = docs.filter(F.col("doc_id") < n)
    assert base.select("text").distinct().count() == n  # no aliasing
    # every mutant is its base text + one token (strictly longer)
    joined = (
        base.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"))
        .join(
            docs.filter(F.col("doc_id") >= n).select(
                (F.col("doc_id") - n).alias("b_id"), F.col("text").alias("m_text")
            ),
            "b_id",
        )
    )
    bad = joined.filter(
        ~F.col("m_text").startswith(F.col("b_text"))
        | (F.length("m_text") <= F.length("b_text"))
    ).count()
    assert bad == 0


def test_kcenter_coreset_farthest_point_order_and_ties(spark):
    from covid_data_pipeline_spark.operators.sampling import kcenter_coreset

    # 1-D points: 0, 1, 10, 11, 100 — greedy from the min id (0):
    # step2 -> 100 (d²=10000), step3 -> 11 (min(121, 7921)=121),
    # step4: both 1 and 10 sit at min-d²=1 -> smallest id (1) wins
    df = spark.createDataFrame(
        [(i, [float(x)]) for i, x in enumerate([0, 1, 10, 11, 100])],
        "vec_id long, embedding array<float>",
    )
    out = sorted(
        (r["step"], r["vec_id"], r["sep_d2"])
        for r in kcenter_coreset(df, k=4).collect()
    )
    assert out == [(1, 0, None), (2, 4, 10000.0), (3, 3, 121.0), (4, 1, 1.0)]


def test_kcenter_coreset_deterministic_under_repartition(spark):
    from covid_data_pipeline_spark.operators.sampling import kcenter_coreset

    df = spark.createDataFrame(
        [(i, [float((i * 13) % 29), float((i * 7) % 31)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    a = sorted(map(tuple, kcenter_coreset(df, k=6).collect()))
    b = sorted(map(tuple, kcenter_coreset(df.repartition(9), k=6).collect()))
    assert a == b
